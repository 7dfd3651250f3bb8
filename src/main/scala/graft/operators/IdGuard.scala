package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared id guard for the operators whose packed state or portable
  * draws key on `cast(idCol as long)`.
  *
  * Two silent-corruption classes motivate it:
  *  - a NON-NUMERIC id NULLs out under the (non-ANSI) long cast —
  *    every row collapses into one NULL group or falls through every
  *    comparison (total data loss, not an error);
  *  - a FRACTIONAL numeric id (double/float/decimal) TRUNCATES under
  *    the same cast — distinct ids 1.2 and 1.7 silently collapse into
  *    one packed owner / share one MINSTD draw, the corruption the
  *    guard exists to prevent, just quieter.
  * So the contract is integral (byte/short/int/long), not merely
  * numeric. */
private[graft] object IdGuard {
  def requireIntegralId(df: DataFrame, idCol: String, op: String,
      consequence: String): Unit = {
    val dt = df.schema(idCol).dataType
    val ok = dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType
    require(ok, s"$op needs an integral (byte/short/int/long) id column; " +
      s"'$idCol' is ${dt.simpleString} ($consequence)")
  }
}
