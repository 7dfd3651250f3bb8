package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.core.{SchemaEvolutionError, WriteAheadLog}
import graft.util.Jsons
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Evolution policies (reference `src/polars_incremental/schema.py:13-17`). */
sealed trait SchemaPolicy
object SchemaPolicy {
  /** Any drift is an error. */
  case object Strict extends SchemaPolicy
  /** New columns are appended to the schema; missing columns null-filled. */
  case object AddNewColumns extends SchemaPolicy
  /** Cast batch columns to the stored type (non-strict: failures → null,
    * optionally rescued). */
  case object Coerce extends SchemaPolicy
  /** Widen the stored type via the numeric lattice when the batch type is
    * wider; new columns also appended. */
  case object TypeWiden extends SchemaPolicy
}

/** Schema evolution engine: diff each batch's schema against the persisted
  * (or explicit) one and reconcile per policy, with an optional rescue
  * column collecting coercion failures.
  *
  * Re-expresses reference `schema.py:286-495` on Spark: `StructType` is the
  * schema object (serialized with its built-in JSON serde, replacing the
  * reference's hand-rolled dtype parser `schema.py:24-151`); the rewrite is
  * pure `Column` DSL so it stays inside whole-stage codegen and scales to
  * any batch size — no row-level callbacks.
  */
class SchemaEvolution(
    val policy: SchemaPolicy = SchemaPolicy.Strict,
    val explicitSchema: Option[StructType] = None,
    val rescueColumn: Option[String] = None) {

  /** Numeric widening lattice (reference `schema.py:154-243`):
    * int×int → max width; float mix → double; bool → numeric;
    * numeric/bool × string → string (string absorbs); else error. */
  def widen(a: DataType, b: DataType): DataType = {
    def intWidth(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(1); case ShortType => Some(2)
      case IntegerType => Some(4); case LongType => Some(8); case _ => None
    }
    def isFloat(dt: DataType) = dt == FloatType || dt == DoubleType
    def isNumericOrBool(dt: DataType) =
      intWidth(dt).isDefined || isFloat(dt) || dt == BooleanType || dt.isInstanceOf[DecimalType]
    (a, b) match {
      case (x, y) if x == y => x
      case (StringType, y) if isNumericOrBool(y) => StringType
      case (x, StringType) if isNumericOrBool(x) => StringType
      case (x, y) if isFloat(x) || isFloat(y) =>
        if (isNumericOrBool(x) && isNumericOrBool(y)) DoubleType
        else throw new SchemaEvolutionError(s"cannot widen $x with $y")
      case (BooleanType, y) if isNumericOrBool(y) => y
      case (x, BooleanType) if isNumericOrBool(x) => x
      case (x: DecimalType, y: DecimalType) =>
        DecimalType(math.max(x.precision, y.precision), math.max(x.scale, y.scale))
      case (x, y) =>
        (intWidth(x), intWidth(y)) match {
          case (Some(wx), Some(wy)) => if (wx >= wy) x else y
          case _ => throw new SchemaEvolutionError(s"cannot widen $x with $y")
        }
    }
  }

  private[graft] def reconcile(stored: StructType, batch: StructType):
      (StructType, Seq[String]) = {
    val storedMap = stored.fields.map(f => f.name -> f).toMap
    val newCols = batch.fields.filterNot(f => storedMap.contains(f.name))
    val changed = Seq.newBuilder[String]
    val merged = policy match {
      case SchemaPolicy.Strict =>
        if (newCols.nonEmpty)
          throw new SchemaEvolutionError(
            s"strict: new columns ${newCols.map(_.name).mkString(", ")}")
        val typeDrift = batch.fields.filter(f =>
          storedMap.get(f.name).exists(_.dataType != f.dataType))
        if (typeDrift.nonEmpty)
          throw new SchemaEvolutionError(
            s"strict: type drift on ${typeDrift.map(_.name).mkString(", ")}")
        stored
      case SchemaPolicy.AddNewColumns =>
        val typeDrift = batch.fields.filter(f =>
          storedMap.get(f.name).exists(_.dataType != f.dataType))
        if (typeDrift.nonEmpty)
          throw new SchemaEvolutionError(
            s"add_new_columns: type drift on ${typeDrift.map(_.name).mkString(", ")}")
        if (newCols.nonEmpty) changed += "added"
        StructType(stored.fields ++ newCols.map(_.copy(nullable = true)))
      case SchemaPolicy.Coerce =>
        // stored types win; batch gets cast
        StructType(stored.fields ++ newCols.map(_.copy(nullable = true)))
      case SchemaPolicy.TypeWiden =>
        val widened = stored.fields.map { f =>
          storedMap(f.name) // keep order
          batch.fields.find(_.name == f.name) match {
            case Some(bf) if bf.dataType != f.dataType =>
              val w = widen(f.dataType, bf.dataType)
              if (w != f.dataType) changed += s"widened:${f.name}"
              f.copy(dataType = w, nullable = true)
            case _ => f
          }
        }
        if (newCols.nonEmpty) changed += "added"
        StructType(widened ++ newCols.map(_.copy(nullable = true)))
    }
    (merged, changed.result())
  }

  /** Rewrite `df` to `target`: missing cols → typed nulls; present cols cast
    * non-strict; cast failures optionally rescued into a struct column;
    * columns reordered to schema order (reference `schema.py:286-386`). */
  private[graft] def conform(df: DataFrame, target: StructType): DataFrame = {
    val batchCols = df.columns.toSet
    val rescued = rescueColumn.flatMap { rc =>
      val failing = target.fields.filter { f =>
        batchCols.contains(f.name) &&
          df.schema(f.name).dataType != f.dataType
      }
      if (failing.isEmpty) None
      else Some(rc -> struct(failing.map { f =>
        when(col(f.name).isNotNull && col(f.name).cast(f.dataType).isNull,
          col(f.name).cast(StringType)).alias(f.name)
      }.toSeq: _*))
    }
    val cols = target.fields.map { f =>
      if (batchCols.contains(f.name)) col(f.name).cast(f.dataType).alias(f.name)
      else lit(null).cast(f.dataType).alias(f.name)
    }.toSeq
    val base = df.select(cols ++ rescued.map { case (rc, c) => c.alias(rc) }: _*)
    base
  }

  /** Full apply: resolve stored schema from the checkpoint metadata
    * (explicit > stored > inferred; reference `docs/schema-evolution.md:81`),
    * reconcile, conform, and persist if changed. */
  def applyTo(df: DataFrame, wal: WriteAheadLog): DataFrame = {
    val storedOpt = wal.readMetadata()
      .flatMap(m => Jsons.optField(m, "schema"))
      .map(n => DataType.fromJson(Jsons.render(n)).asInstanceOf[StructType])
    val reference = explicitSchema.orElse(storedOpt)
    reference match {
      case None =>
        // First batch: persist the inferred schema (reference schema.py:296-298).
        persist(wal, df.schema)
        df
      case Some(stored) =>
        val (target, changed) = reconcile(stored, df.schema)
        val out = conform(df, target)
        if (changed.nonEmpty || storedOpt.forall(_ != target)) persist(wal, target)
        out
    }
  }

  private def persist(wal: WriteAheadLog, schema: StructType): Unit =
    wal.updateMetadata("schema", Jsons.parse(schema.json))
}
