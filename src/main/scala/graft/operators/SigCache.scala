package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import CacheDirs.{CacheChunk, ChunkMeta}

/** Persisted rep-signature cache for the composed near-dup fold's
  * history probe — the "store signatures here instead" lever the fold
  * scaladoc names for extreme state sizes, made real.
  *
  * THE PROBLEM: the production pair family's cross-batch probe derives
  * the HISTORY side's 8-byte poly-simhash signatures from the reps'
  * TEXT on every fold (`polySimhash` over every accumulated
  * representative, then a lineage cut) — per-fold work linear in the
  * state's text bytes, the single remaining O(state · text) term in
  * the composed fold. The signatures are a pure per-row derivation
  * over an append-only table: deriving each rep's signature ONCE, when
  * it first enters the state, and reading 16-byte rows thereafter is
  * strictly less work.
  *
  * THE FIX: persist `(doc_id, sh)` rows as append-only CHUNKS (one
  * O(batch) chunk per fold — the batch's fresh-rep signatures, which
  * the family has already computed for its own pair stage), committed
  * by one atomically-replaced meta pointer naming the chunk list (with
  * per-chunk row accounting), the folded row count, and the modulus
  * pair — the [[CacheDirs]] meta discipline, shared with
  * [[Hash64Counts]].
  *
  * DERIVED CACHE, SELF-HEALING: a row-count tripwire compares the
  * stored n against the reps table's actual count per fold. The COMMON
  * crash window — the cache chunk committed, the fold's epoch swap
  * lost, the batch replayed — leaves the cache exactly a chunk-suffix
  * AHEAD of the committed reps; that case heals by dropping the
  * uncommitted-side surplus from the meta ([[CacheDirs.aheadKeepPrefix]]
  * — one meta rewrite + prune, NO Spark job, no text re-read; the
  * replayed fold re-derives and re-appends the dropped signatures
  * itself). Every OTHER mismatch (a lost chunk, a stale marker, a
  * surplus that does not align on chunk boundaries) heals with the
  * lossless full re-derivation from the reps' text — O(state ·
  * text-bytes), the cost the un-cached probe paid every fold, paid
  * once per detected inconsistency. A modulus-pair mismatch REFUSES
  * (configuration error, never clobber); a directory holding another
  * format refuses ([[CacheDirs.guardOwnership]]). Chunk lists compact
  * at the START of a fold past the threshold — before the fold plans
  * its history read, so a returned signature frame never reads files
  * the same fold prunes.
  *
  * PURE CACHE: signatures can only ever change probe COST, never probe
  * results (the derivation is deterministic per text; a suite law pins
  * the cached fold's resolution == the uncached fold's bit for bit,
  * and ahead-heal == full-rebuild bit for bit). */
object SigCache {
  private val MetaFile = "_graft_sigcache_meta.json"
  private val ParamKeys = Seq("mod1", "mod2")

  /** Same compaction policy as [[Hash64Counts]]: reads union the chunk
    * list, so it must stay bounded; compaction is one read+write over
    * O(reps) 16-byte rows every ~16 folds. */
  private val CompactAfterChunks = 16

  private def fmt = graft.state.HistoryFormat.PolySimhashSigCache

  private def readMeta(conf: Configuration, dir: String): Option[ChunkMeta] =
    CacheDirs.readChunkMeta(conf, dir, MetaFile, ParamKeys,
      fmt.rebuildRemedy)

  private def writeMeta(conf: Configuration, dir: String,
      m: ChunkMeta): Unit =
    CacheDirs.writeChunkMeta(conf, dir, MetaFile, ParamKeys, m)

  /** Whether a committed signature cache exists at `dir`. */
  def exists(conf: Configuration, dir: String): Boolean =
    graft.util.Fs.exists(
      new org.apache.hadoop.fs.Path(dir, MetaFile), conf)

  /** Rows folded so far (the tripwire's stored side). */
  def foldedRows(conf: Configuration, dir: String): Option[Long] =
    readMeta(conf, dir).map(_.n)

  /** The cache's signature derivation — ONE definition, shared with
    * [[Dedup.nearDupWideSimhashFamily]]'s own `sigs` (the marker pins
    * it: poly-31 modular simhash under `(mod1, mod2)`). `reps` exposes
    * `(id, text)`. */
  private def derive(reps: DataFrame, mod1: Long, mod2: Long): DataFrame =
    reps.select(col("id").as("doc_id"),
      graft.functions.FusedMinHashFunctions
        .polySimhash(col("text"), mod1, mod2).as("sh"))

  private def checkParams(m: ChunkMeta, dir: String, mod1: Long,
      mod2: Long): Unit =
    require(m.params("mod1") == mod1 && m.params("mod2") == mod2,
      s"signature cache at $dir was derived under " +
        s"mod1=${m.params("mod1")}/mod2=${m.params("mod2")}, got " +
        s"$mod1/$mod2 — a different modulus pair is a different " +
        "signature; use a separate cache directory per " +
        s"parameterization, or ${fmt.rebuildRemedy}")

  /** The committed signature table `(doc_id, sh)` — a plain union of
    * the chunks (one row per rep; no aggregation needed). `schema`,
    * when the caller already knows the chunks' schema (the per-fold
    * path holds the batch's `freshSigs`, and every committed chunk is
    * the SAME derivation by the cache's contract), skips the per-read
    * footer schema-inference job. */
  def read(spark: SparkSession, dir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = readMeta(conf, dir).getOrElse(throw new IllegalStateException(
      s"no signature cache at $dir — fold or rebuild it first"))
    graft.state.HistoryFormat.ensure(conf, dir, fmt, hasData = true)
    if (!CacheDirs.chunksExist(conf, dir, m.chunkNames))
      throw new IllegalStateException(
        s"signature-cache meta at $dir lists chunks that are missing on " +
          s"disk (${m.chunkNames.mkString(",")}) — ${fmt.rebuildRemedy}")
    if (m.chunks.isEmpty) emptySigs(spark)
    else schema.fold(spark.read)(spark.read.schema)
      .parquet(m.chunkNames.map(c => s"$dir/$c"): _*)
  }

  private def emptySigs(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType, nullable = true),
        StructField("sh", LongType, nullable = true))))
  }

  /** Lossless full re-derivation from the reps table `(id, text)` —
    * the heal path for every inconsistency the cheap AHEAD heal cannot
    * cover, and the bootstrap for existing state. Cost = what the
    * un-cached probe paid every fold (O(state · text-bytes)), paid
    * once. */
  def rebuild(spark: SparkSession, dir: String, reps: DataFrame,
      mod1: Long, mod2: Long): Unit =
    rebuildWithN(spark, dir, reps, mod1, mod2,
      graft.util.PlanCounts.rowCount(reps))

  private def rebuildWithN(spark: SparkSession, dir: String,
      reps: DataFrame, mod1: Long, mod2: Long, repsN: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    CacheDirs.guardOwnership(conf, dir, fmt, "signature cache")
    graft.state.HistoryFormat.stamp(conf, dir, fmt)
    val params = Map("mod1" -> mod1, "mod2" -> mod2)
    val seq = readMeta(conf, dir).map(_.seq).getOrElse(0L) + 1
    if (repsN == 0) {
      writeMeta(conf, dir, ChunkMeta(0L, seq, Nil, params))
      CacheDirs.prune(conf, dir, Nil)
    } else {
      val chunk = s"c$seq"
      derive(reps, mod1, mod2)
        .write.mode("overwrite").parquet(s"$dir/$chunk")
      writeMeta(conf, dir, ChunkMeta(repsN, seq,
        Seq(CacheChunk(chunk, repsN)), params))
      CacheDirs.prune(conf, dir, Seq(chunk))
    }
  }

  /** The tripwire's heal dispatch: params refuse on mismatch (never
    * clobber); a consistent cache passes untouched; the chunk-aligned
    * AHEAD window heals by suffix truncation (one meta rewrite, no
    * Spark job — see the object scaladoc); everything else heals with
    * the lossless full re-derivation. Both heals log + surface as
    * structured events. */
  private def healIfStale(spark: SparkSession, dir: String,
      reps: DataFrame, mod1: Long, mod2: Long, repsN: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = readMeta(conf, dir)
    meta.foreach(checkParams(_, dir, mod1, mod2))
    val markerOk = graft.state.HistoryFormat.read(conf, dir)
      .contains((fmt.name, fmt.version.toLong))
    CacheDirs.healDispatch(conf, dir, MetaFile, ParamKeys, meta, markerOk,
      repsN, "sigcache", "reps_rows") {
      rebuildWithN(spark, dir, reps, mod1, mod2, repsN)
    }
  }

  /** The per-fold fast path: validate (or heal — see [[healIfStale]])
    * the cache against EXACTLY this reps table, compact-at-start when
    * the chunk list is long (BEFORE planning the returned read, so the
    * frame never reads files this fold prunes), return the committed
    * history signatures, and append the batch's fresh-rep signatures
    * as one O(batch) chunk. `freshSigs` must be `(doc_id, sh)` rows of
    * EXACTLY the reps the caller is appending this fold under the same
    * `(mod1, mod2)` (the tripwire holds the caller to it — any drift
    * heals on the next fold). `repsN` is the CURRENT (pre-fold) reps
    * row count the caller already measured. */
  def ensureAndFold(spark: SparkSession, dir: String, reps: DataFrame,
      freshSigs: DataFrame, mod1: Long, mod2: Long,
      repsN: Long): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    healIfStale(spark, dir, reps, mod1, mod2, repsN)
    var m = readMeta(conf, dir).get
    // compact BEFORE the read below plans its file list — never prune
    // what a frame returned from this fold still reads
    if (m.chunks.size >= CompactAfterChunks) {
      val merged = s"m${m.seq + 1}"
      spark.read.schema(freshSigs.select(col("doc_id"), col("sh")).schema)
        .parquet(m.chunkNames.map(c => s"$dir/$c"): _*)
        .write.mode("overwrite").parquet(s"$dir/$merged")
      writeMeta(conf, dir, ChunkMeta(m.n, m.seq + 1,
        Seq(CacheChunk(merged, m.n)), m.params))
      CacheDirs.prune(conf, dir, Seq(merged))
      m = readMeta(conf, dir).get
    }
    val hs = read(spark, dir,
      Some(freshSigs.select(col("doc_id"), col("sh")).schema))
    // append the batch's signatures: Δn from the WRITTEN chunk's parquet
    // FOOTERS, so the committed n is a pure function of committed bytes
    // — driver-side metadata I/O, not the read-back count job this paid
    // per fold before
    val chunk = s"c${m.seq + 1}"
    freshSigs.select(col("doc_id"), col("sh"))
      .write.mode("overwrite").parquet(s"$dir/$chunk")
    val deltaRows = graft.util.Fs.parquetRowCount(
      new org.apache.hadoop.fs.Path(s"$dir/$chunk"), conf)
    val grown = m.chunks :+ CacheChunk(chunk, deltaRows)
    writeMeta(conf, dir, ChunkMeta(m.n + deltaRows, m.seq + 1, grown,
      m.params))
    CacheDirs.prune(conf, dir, grown.map(_.name))
    hs
  }
}
