package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** ANALYZE-style data profiling — the first thing run against any new
  * source before it enters a pipeline: per column, row/null counts,
  * distinct cardinality, lexical min/max of the string form, and mean
  * string length. One long-format row per column so the report is
  * stable as schemas evolve (a wide one-row layout re-shapes on every
  * added column).
  *
  * All in ONE aggregation pass: every per-column statistic is an
  * aggregate expression over the same scan, reduced map-side, and the
  * single result row unpivots to long format with `stack` (no second
  * scan, no per-column job). Nested columns (array/map/struct) profile
  * their null/row counts but skip distinct/min/max/len — their string
  * forms are not cross-engine portable.
  *
  * Exact-vs-approx is the scale dial: `exactNdv = true` uses
  * `count(distinct c)`, which Spark plans as ONE pass with an Expand
  * fan-out of (#distinct-columns + 1) — fine for profiling runs, but
  * at 100 TB that multiplies the shuffle by the column count, so
  * `exactNdv = false` swaps in `approx_count_distinct` (HyperLogLog++,
  * mergeable, no Expand — the whole profile stays one narrow pass).
  * The report is oracle-checkable only in exact mode.
  *
  * Determinism: counts are exact longs; min/max compare the CAST(c AS
  * STRING) form lexically (integers and strings render identically in
  * ANSI engines — floats do NOT, so float columns should be profiled
  * with `exactNdv` counts only or pre-cast to decimal by the caller);
  * `avg_len` divides two exact longs once. */
object Profile {

  /** A declarative data-quality rule over one column — the
    * expectation-suite pattern (Great Expectations / dbt tests): gates
    * are DATA, so a pipeline validates every batch against the same
    * versioned rule set and alerts on `pass = false` rows instead of
    * discovering corruption downstream. */
  sealed trait Expectation { def column: String; def label: String }
  /** No NULLs in `column` (checks ALL rows). */
  final case class ExpectNotNull(column: String) extends Expectation {
    def label = "not_null"
  }
  /** `column` is a key: violations = duplicate copies beyond the first
    * (n non-null minus n distinct). */
  final case class ExpectUnique(column: String) extends Expectation {
    def label = "unique"
  }
  /** Non-null values >= `bound`. */
  final case class ExpectMin(column: String, bound: Long) extends Expectation {
    def label = s"min_$bound"
  }
  /** Non-null values <= `bound`. */
  final case class ExpectMax(column: String, bound: Long) extends Expectation {
    def label = s"max_$bound"
  }
  /** Non-null values drawn from a fixed set. */
  final case class ExpectInSet(column: String, values: Seq[String])
    extends Expectation { def label = "in_set" }
  /** Non-null values fully matching a regex (Java/RE2 common subset —
    * the q_regexp_extract_all portability rule). */
  final case class ExpectRegex(column: String, pattern: String)
    extends Expectation { def label = "regex" }

  /** SQL-string-literal escape for the stack() unpivot: backslashes
    * FIRST (Spark string literals treat `\` as an escape — a name
    * ending in one would swallow the closing quote), then quotes. */
  private def q(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** Resolve a top-level column even when its NAME contains dots (bare
    * col("a.b") would parse as a struct path). */
  private def topCol(name: String) =
    col("`" + name.replace("`", "``") + "`")

  /** Validate a batch against an expectation suite in ONE aggregation
    * pass: every rule is a pair of aggregate expressions over the same
    * scan (reduced map-side — the batch never shuffles; `ExpectUnique`
    * alone adds a count-distinct Expand), and the single result row
    * unpivots to one row per rule: `(expectation, column_name,
    * n_checked, n_violations, pass)`. Value rules check non-null cells
    * only — nullness is `ExpectNotNull`'s job, so one bad cell never
    * double-counts across rules. A non-null cell the rule cannot even
    * interpret — a string that fails the numeric cast under
    * `ExpectMin`/`ExpectMax` — IS a violation (the comparison coerces
    * to NULL there; letting it pass would green-light a corrupted
    * column against a numeric bound). Exact longs throughout; an empty
    * batch passes every rule (0 checked, 0 violations). */
  def validateExpectations(df: DataFrame,
      rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "validateExpectations: empty rule set")
    rules.foreach(r => require(df.columns.contains(r.column),
      s"validateExpectations: no column '${r.column}' " +
        s"(rule ${r.label}); batch has ${df.columns.mkString(", ")}"))
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      val c = topCol(r.column)
      val (checked, viol) = r match {
        case ExpectNotNull(_) =>
          (count(lit(1)), sum(when(c.isNull, 1L).otherwise(0L)))
        case ExpectUnique(_) =>
          (count(c), count(c) - countDistinct(c))
        case ExpectMin(_, b) =>
          // coalesce(…, true) on non-null cells: a failed numeric cast
          // makes the comparison NULL — count it as a violation, not a
          // silent pass
          (count(c), sum(when(c.isNotNull && coalesce(c < b, lit(true)),
            1L).otherwise(0L)))
        case ExpectMax(_, b) =>
          (count(c), sum(when(c.isNotNull && coalesce(c > b, lit(true)),
            1L).otherwise(0L)))
        case ExpectInSet(_, vs) =>
          (count(c), sum(when(c.isNotNull && !c.isin(vs: _*), 1L)
            .otherwise(0L)))
        case ExpectRegex(_, p) =>
          // rlike is substring search; anchor to honor the full-match
          // contract whatever the caller's pattern (nested ^$ are fine)
          (count(c), sum(when(c.isNotNull && !c.rlike(s"^(?:$p)$$"), 1L)
            .otherwise(0L)))
      }
      Seq(checked.cast("long").as(s"__c$i"),
        coalesce(viol.cast("long"), lit(0L)).as(s"__v$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) =>
        s"'${q(r.label)}', '${q(r.column)}', __c$i, __v$i"
      }
      .mkString(", ")
    one
      .select(expr(s"stack(${rules.length}, $stackArgs) AS " +
        "(expectation, column_name, n_checked, n_violations)"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  def tableProfile(df: DataFrame, exactNdv: Boolean = true): DataFrame = {
    require(df.schema.nonEmpty, "tableProfile: empty schema")
    val fields = df.schema.fields
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = topCol(f.name)
      val nested = f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
      val s = c.cast("string")
      Seq(
        count(c).as(s"__nn$i"),
        (if (nested) lit(null).cast("long")
         else if (exactNdv) countDistinct(c)
         else approx_count_distinct(c)).as(s"__nd$i"),
        (if (nested) lit(null).cast("string") else min(s)).as(s"__mn$i"),
        (if (nested) lit(null).cast("string") else max(s)).as(s"__mx$i"),
        (if (nested) lit(null).cast("long")
         else sum(length(s).cast("long"))).as(s"__sl$i"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = fields.zipWithIndex
      .map { case (f, i) =>
        s"'${q(f.name)}', __nn$i, __nd$i, __mn$i, __mx$i, __sl$i"
      }
      .mkString(", ")
    one
      .select(col("__n"), expr(
        s"stack(${fields.length}, $stackArgs) AS " +
          "(column_name, __nn, n_distinct, min_s, max_s, __sl)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"),
        when(col("__nn") > 0L,
          round(col("__sl").cast("double") / col("__nn"), 4))
          .otherwise(lit(0d)).as("avg_len"))
  }

  /** Per-column drift of a batch against a STAMPED reference profile —
    * the drift discipline ([[Curation.vocabDrift]],
    * [[Similarity.quantizerDrift]], the PSI pattern) applied to the
    * profile family: [[tableProfile]] is a snapshot; pipelines need
    * "has this table's shape moved since the profile was stamped"
    * before a batch enters them. Inputs are two PROFILES (the persisted
    * reference is O(columns) rows — model-sized state, so the drift
    * check never rescans the reference data).
    *
    * One output row per column (full outer on `column_name`):
    *  - `status`: `ok` / `new_column` / `missing_column` — schema
    *    movement is drift by definition;
    *  - `null_rate_ref` / `null_rate_batch` / `null_delta` (abs);
    *  - `ndv_ref` / `ndv_batch` and `ndv_ratio`, the DENSITY ratio
    *    `(ndv_b/rows_b) / (ndv_r/rows_r)` — density, not raw NDV, so
    *    differently-sized batches compare (a key-like column holds
    *    density ~1 at any size; note a bounded categorical's density
    *    shrinks as rows grow, so compare like-sized batches or widen
    *    `maxNdvRatio` for such columns); NULL when either side can't
    *    say (nested column, zero reference);
    *  - `range_widened`: the batch's lexical min/max stepped outside
    *    the reference envelope (new categories / out-of-range values;
    *    reported, NOT folded into `drifted` — ranges legitimately grow
    *    on append-style columns);
    *  - `len_ratio`: avg string length movement (reported);
    *  - `drifted`: schema moved, `null_delta > maxNullDelta`, or
    *    `ndv_ratio` outside `[1/maxNdvRatio, maxNdvRatio]`.
    *
    * Exact doubles: every ratio is ONE rounded double tree over exact
    * longs, so an ANSI engine replays the report bit-for-bit (profiles
    * must come from `exactNdv = true`; the approx mode's HLL estimates
    * are not comparable across engines — at 100 TB, approx profiles
    * still drift-check fine, they just aren't oracle-checkable).
    * Empty-batch contract: zero rows is not drift evidence — rates read
    * 0, ratios NULL, `drifted` only fires on schema movement. */
  def profileDrift(batchProfile: DataFrame, refProfile: DataFrame,
      maxNullDelta: Double, maxNdvRatio: Double): DataFrame = {
    require(maxNullDelta >= 0, s"maxNullDelta must be >= 0, got $maxNullDelta")
    require(maxNdvRatio >= 1, s"maxNdvRatio must be >= 1, got $maxNdvRatio")
    val need = Seq("column_name", "n_rows", "n_null", "n_distinct",
      "min_s", "max_s", "avg_len")
    Seq("batch" -> batchProfile, "reference" -> refProfile).foreach {
      case (side, p) => need.foreach(c => require(p.columns.contains(c),
        s"profileDrift: $side profile is missing '$c' — not a " +
          "tableProfile output"))
    }
    def rate(nNull: Column, nRows: Column) =
      when(nRows > 0L, round(nNull.cast("double") / nRows, 4))
        .otherwise(lit(0d))
    val b = batchProfile.select(col("column_name"),
      col("n_rows").as("__rb"), col("n_null").as("__ub"),
      col("n_distinct").as("ndv_batch"), col("min_s").as("__mnb"),
      col("max_s").as("__mxb"), col("avg_len").as("__lb"))
    val r = refProfile.select(col("column_name"),
      col("n_rows").as("__rr"), col("n_null").as("__ur"),
      col("n_distinct").as("ndv_ref"), col("min_s").as("__mnr"),
      col("max_s").as("__mxr"), col("avg_len").as("__lr"))
    val status = when(col("__rr").isNull, lit("new_column"))
      .when(col("__rb").isNull, lit("missing_column"))
      .otherwise(lit("ok"))
    val nullRef = rate(col("__ur"), col("__rr"))
    val nullBatch = rate(col("__ub"), col("__rb"))
    // gated on a NON-EMPTY batch, like ndv_ratio: an empty batch's
    // null rate reads 0, and |0 - ref| would flip `drifted` whenever the
    // reference column holds nulls — zero rows is not drift evidence
    val nullDelta = when(status === "ok" && col("__rb") > 0L,
      round(abs(nullBatch - nullRef), 4))
    val ndvRatio = when(status === "ok" && col("ndv_batch").isNotNull &&
        col("ndv_ref").isNotNull && col("ndv_ref") > 0L &&
        col("__rb") > 0L && col("__rr") > 0L,
      round((col("ndv_batch").cast("double") * col("__rr").cast("double")) /
        (col("__rb").cast("double") * col("ndv_ref").cast("double")), 6))
    val rangeWidened = status === "ok" && coalesce(
      col("__mnb") < col("__mnr") || col("__mxb") > col("__mxr"),
      lit(false))
    val lenRatio = when(status === "ok" && col("__lr") > 0d &&
        col("__rb") > 0L,
      round(col("__lb") / col("__lr"), 4))
    b.join(r, Seq("column_name"), "full_outer")
      .select(col("column_name"), status.as("status"),
        when(col("__rr").isNotNull, nullRef).as("null_rate_ref"),
        when(col("__rb").isNotNull, nullBatch).as("null_rate_batch"),
        nullDelta.as("null_delta"),
        col("ndv_ref"), col("ndv_batch"), ndvRatio.as("ndv_ratio"),
        rangeWidened.as("range_widened"), lenRatio.as("len_ratio"),
        (status =!= "ok" ||
          coalesce(nullDelta > maxNullDelta, lit(false)) ||
          coalesce(ndvRatio > maxNdvRatio ||
            ndvRatio * maxNdvRatio < 1.0d, lit(false))).as("drifted"))
  }

  /** [[profileDrift]] against a profile persisted with [[saveProfile]] —
    * the path-taking probe enforces the
    * [[graft.state.HistoryFormat.TableProfile]] marker. */
  def profileDriftTable(batchProfile: DataFrame, refPath: String,
      maxNullDelta: Double, maxNdvRatio: Double): DataFrame =
    profileDrift(batchProfile,
      graft.state.HistoryTables.readChecked(batchProfile.sparkSession,
        refPath, graft.state.HistoryFormat.TableProfile),
      maxNullDelta, maxNdvRatio)

  /** Persist a [[tableProfile]] snapshot as the stamped reference for
    * [[profileDriftTable]] — tiny (O(columns)) marker-stamped parquet,
    * the same save discipline as the vocab/quantizer/clf models. */
  def saveProfile(profile: DataFrame, path: String): Unit = {
    profile.coalesce(1).write.mode("overwrite").parquet(path)
    graft.state.HistoryFormat.stamp(
      profile.sparkSession.sparkContext.hadoopConfiguration, path,
      graft.state.HistoryFormat.TableProfile)
  }
}
