package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the graft engine.
  *
  * Centralizes the settings every entry point (tests, Verify, Bench, demos)
  * needs:
  *  - `nanosAsLong`: the driver-generated `events` table stores
  *    TIMESTAMP(NANOS), which Spark's parquet reader rejects by default;
  *    reading them as nano-epoch longs keeps the scan vectorized and we
  *    convert explicitly where a timestamp is needed.
  *  - low shuffle partitions for the local[32] regime (overridable); AQE
  *    coalesces further at runtime and would re-split on a real cluster.
  */
object GraftSession {
  def builderDefaults(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // Polars-style permissive semantics: cast failure -> null (schema
      // evolution's non-strict coerce), wrapping 64-bit arithmetic (hash
      // mixing in minhash/simhash), no div-by-zero errors.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // parquet field-id resolution for columnMapping.mode=id Delta
      // tables. A SESSION default, deliberately: Spark ignores the key
      // as a per-read option (FieldIdProbeSuite pins this), and a read
      // path silently flipping session conf is the foreachBatch
      // protocol-swap bug class. Only request schemas CARRYING
      // parquet.field.id metadata are affected — name-mode reads are
      // untouched (also suite-pinned).
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      // generated-code cache sized for a multi-query session: the
      // default 100 entries thrash on a workload that plans hundreds of
      // distinct codegen units (every re-run re-Janino-compiles classes
      // the driver just evicted — pure driver fixed cost, any scale)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      // explicit, not just default-true: several operators' 100 TB
      // stories LEAN on AQE skew-splitting their join-side shuffles
      // (ngram-Jaccard join-back, tf⋈df in tfidf, span join-back) — a
      // deployment that disables it inherits hot-key stragglers
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def local(threads: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = builderDefaults(
      SparkSession.builder().master(s"local[$threads]").appName(appName),
      shufflePartitions = math.max(threads, 8))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // graft_* SQL functions (codegen'd Catalyst expressions) ride every
    // engine session; external sessions opt in via
    // spark.sql.extensions=graft.GraftExtensions
    GraftExtensions.register(s)
    s
  }
}
