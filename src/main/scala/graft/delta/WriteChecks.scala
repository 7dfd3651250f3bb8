package graft.delta

import graft.core.GraftError
import graft.util.Jsons
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Write-side enforcement of the Delta protocol's data-quality writer
  * features — the obligations behind three entries in the engine's
  * supported-writer-feature set (see `DeltaLogReader.checkWriteProtocol`):
  *
  *  - CHECK constraints (`checkConstraints`, legacy writer v3): every
  *    `delta.constraints.<name>` SQL expression in the table
  *    configuration must hold on every written row.
  *  - Column invariants (`invariants`, legacy writer v2 — i.e. implied by
  *    the BASE protocol this engine writes): per-field
  *    `delta.invariants` metadata carries
  *    `{"expression":{"expression":"<sql>"}}` that must hold.
  *  - Generated columns (`generatedColumns`, legacy writer v4): a field
  *    with `delta.generationExpression` metadata is COMPUTED when the
  *    incoming frame omits it, and VALIDATED (null-safe equality) when
  *    the frame provides it — a provided value that disagrees with the
  *    expression would silently diverge from what every other engine
  *    computes.
  *
  * Enforcement is an inline guard riding the write projection — a
  * `raise_error` branch on the first output column — NOT a second pass
  * over the data: at 100 TB a validate-then-write double scan doubles the
  * write's read cost, while this shape validates each row in the same
  * whole-stage-codegen pipeline that serializes it. A violation aborts
  * the write job BEFORE the commit, so the table is untouched (the
  * orphaned part files are never referenced and vacuum reclaims them).
  * NULL semantics follow SQL CHECK: a constraint evaluating to NULL
  * passes; only FALSE violates. delta-spark's CheckDeltaInvariant does
  * the same (`delta-spark` `schema/InvariantViolationException`).
  */
private[graft] object WriteChecks {

  private val ConstraintPrefix = "delta.constraints."

  /** (constraint name, SQL text) pairs from the table configuration. */
  def constraintsOf(configJson: Option[String]): Seq[(String, String)] =
    configJson.map(Jsons.parse).toSeq.flatMap(c =>
      Jsons.fields(c).collect {
        case (k, v) if k.startsWith(ConstraintPrefix) =>
          k.stripPrefix(ConstraintPrefix) -> v.asText()
      }).sortBy(_._1)

  /** (column name, SQL text) for every field carrying the protocol's
    * `delta.invariants` metadata (nested JSON: expression.expression). */
  def invariantsOf(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains("delta.invariants")) None
      else {
        val raw = f.metadata.getString("delta.invariants")
        Jsons.optField(Jsons.parse(raw), "expression")
          .flatMap(e => Jsons.optStr(e, "expression"))
          .map(f.name -> _)
      }
    }

  /** (column name, generation SQL) for every generated column. */
  def generatedOf(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      if (f.metadata.contains("delta.generationExpression"))
        Some(f.name -> f.metadata.getString("delta.generationExpression"))
      else None
    }

  /** SQL CHECK violation: expression is FALSE (NULL passes). */
  private def violates(sql: String): Column =
    !coalesce(expr(sql), lit(true))

  /** Wrap `df` (already aligned to the table's LOGICAL schema) with the
    * table's CHECK-constraint / invariant / generated-column guards.
    * `providedCols` are the columns the caller's original frame actually
    * supplied — a generated column the aligner null-filled is computed,
    * not validated. Returns `df` untouched when the table declares
    * nothing (the common path costs nothing). */
  def enforce(df: DataFrame, tableSchema: StructType,
      configJson: Option[String], providedCols: Set[String]): DataFrame = {
    val checks: Seq[(String, Column)] =
      constraintsOf(configJson).map { case (name, sql) =>
        s"CHECK constraint $name ($sql)" -> violates(sql)
      } ++
      invariantsOf(tableSchema).map { case (colName, sql) =>
        s"column invariant on $colName ($sql)" -> violates(sql)
      } ++
      generatedOf(tableSchema).collect {
        case (colName, sql) if providedCols.contains(colName) =>
          s"generated column $colName provided a value disagreeing with " +
            s"its expression ($sql)" ->
            !(col(colName) <=> expr(sql))
      }
    if (checks.isEmpty) return df
    // first failing check's message, null when the row passes everything
    val firstViolation = checks.foldRight(lit(null).cast("string")) {
      case ((msg, bad), acc) => when(bad, lit(msg)).otherwise(acc)
    }
    // the guard rides the FIRST output column so it can't be pruned away
    // (every table column is written); raise_error's NullType branch
    // coerces to the column's type
    val f0 = df.schema.fields.head
    val guarded = when(firstViolation.isNotNull,
      raise_error(concat(
        lit("delta write rejected: "), firstViolation,
        lit(" violated by row "),
        to_json(struct(df.columns.map(col).toSeq: _*))))
        .cast(f0.dataType))
      .otherwise(col(f0.name))
      .as(f0.name, f0.metadata)
    df.select(guarded +: df.columns.toSeq.drop(1).map(c => col(s"`$c`")): _*)
  }

  /** Validate `sql` holds on every EXISTING row of `current` — the gate
    * for ADD CONSTRAINT (delta-spark scans the table the same way). One
    * distributed pass; surfaces a violating row in the error. */
  def requireHolds(current: DataFrame, name: String, sql: String): Unit = {
    val bad = current.filter(violates(sql)).limit(1).collect()
    if (bad.nonEmpty)
      throw new GraftError(
        s"cannot add CHECK constraint $name ($sql): existing data " +
        s"violates it, e.g. row ${bad.head.toString}")
  }
}
