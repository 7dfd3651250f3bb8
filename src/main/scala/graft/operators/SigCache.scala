package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * by one atomically-replaced meta pointer naming the chunk list, the
  * folded row count, and the modulus pair. The probe then reads
  * persisted signatures; history TEXT is never re-read and never
  * re-hashed.
  *
  * DERIVED CACHE, SELF-HEALING — the [[Hash64Counts]] discipline
  * exactly: a row-count tripwire compares the stored n against the
  * reps table's actual count per fold and heals ANY mismatch (a crash
  * between the cache commit and the fold's epoch commit, a lost chunk,
  * a stale marker) with a lossless re-derivation from the reps' text;
  * a modulus-pair mismatch REFUSES (configuration error, never
  * clobber); a directory holding another format refuses
  * ([[CacheDirs.guardOwnership]]). Chunk lists compact at the START of
  * a fold past the threshold — before the fold plans its history read,
  * so a returned signature frame never reads files the same fold
  * prunes.
  *
  * PURE CACHE: signatures can only ever change probe COST, never probe
  * results (the derivation is deterministic per text; a suite law pins
  * the cached fold's resolution == the uncached fold's bit for bit). */
object SigCache {
  private val MetaFile = "_graft_sigcache_meta.json"

  /** Same compaction policy as [[Hash64Counts]]: reads union the chunk
    * list, so it must stay bounded; compaction is one read+write over
    * O(reps) 16-byte rows every ~16 folds. */
  private val CompactAfterChunks = 16

  private[operators] case class Meta(n: Long, mod1: Long, mod2: Long,
      seq: Long, chunks: Seq[String])

  private def metaPath(dir: String) = new Path(dir, MetaFile)

  private def readMeta(conf: Configuration, dir: String): Option[Meta] = {
    val p = metaPath(dir)
    if (!graft.util.Fs.exists(p, conf)) None
    else {
      val node = graft.util.Fs.readJson(p, conf)
      def corrupt(what: String): Nothing = throw new IllegalStateException(
        s"signature-cache meta at $dir is malformed ($what) — " +
          graft.state.HistoryFormat.PolySimhashSigCache.rebuildRemedy)
      Some(Meta(
        graft.util.Jsons.optLong(node, "n").getOrElse(corrupt("no n")),
        graft.util.Jsons.optLong(node, "mod1").getOrElse(corrupt("no mod1")),
        graft.util.Jsons.optLong(node, "mod2").getOrElse(corrupt("no mod2")),
        graft.util.Jsons.optLong(node, "seq").getOrElse(corrupt("no seq")),
        graft.util.Jsons.optField(node, "chunks")
          .map(a => graft.util.Jsons.elems(a).map(_.asText()).toSeq)
          .getOrElse(corrupt("no chunks"))))
    }
  }

  private def writeMeta(conf: Configuration, dir: String, m: Meta): Unit = {
    val o = graft.util.Jsons.obj()
    o.put("n", m.n)
    o.put("mod1", m.mod1)
    o.put("mod2", m.mod2)
    o.put("seq", m.seq)
    val a = o.putArray("chunks"); m.chunks.foreach(a.add)
    graft.util.Fs.atomicWriteJson(metaPath(dir), o, conf)
  }

  /** Whether a committed signature cache exists at `dir`. */
  def exists(conf: Configuration, dir: String): Boolean =
    graft.util.Fs.exists(metaPath(dir), conf)

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

  private def checkParams(m: Meta, dir: String, mod1: Long,
      mod2: Long): Unit =
    require(m.mod1 == mod1 && m.mod2 == mod2,
      s"signature cache at $dir was derived under mod1=${m.mod1}/" +
        s"mod2=${m.mod2}, got $mod1/$mod2 — a different modulus pair is " +
        "a different signature; use a separate cache directory per " +
        "parameterization, or " +
        graft.state.HistoryFormat.PolySimhashSigCache.rebuildRemedy)

  /** The committed signature table `(doc_id, sh)` — a plain union of
    * the chunks (one row per rep; no aggregation needed). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = readMeta(conf, dir).getOrElse(throw new IllegalStateException(
      s"no signature cache at $dir — fold or rebuild it first"))
    graft.state.HistoryFormat.ensure(conf, dir,
      graft.state.HistoryFormat.PolySimhashSigCache, hasData = true)
    if (!CacheDirs.chunksExist(conf, dir, m.chunks))
      throw new IllegalStateException(
        s"signature-cache meta at $dir lists chunks that are missing on " +
          s"disk (${m.chunks.mkString(",")}) — " +
          graft.state.HistoryFormat.PolySimhashSigCache.rebuildRemedy)
    if (m.chunks.isEmpty) emptySigs(spark)
    else spark.read.parquet(m.chunks.map(c => s"$dir/$c"): _*)
  }

  private def emptySigs(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType, nullable = true),
        StructField("sh", LongType, nullable = true))))
  }

  /** Lossless full re-derivation from the reps table `(id, text)` —
    * the heal path for every detected inconsistency and the bootstrap
    * for existing state. Cost = what the un-cached probe paid every
    * fold, paid once. */
  def rebuild(spark: SparkSession, dir: String, reps: DataFrame,
      mod1: Long, mod2: Long): Unit =
    rebuildWithN(spark, dir, reps, mod1, mod2, reps.count())

  private def rebuildWithN(spark: SparkSession, dir: String,
      reps: DataFrame, mod1: Long, mod2: Long, repsN: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    CacheDirs.guardOwnership(conf, dir,
      graft.state.HistoryFormat.PolySimhashSigCache, "signature cache")
    graft.state.HistoryFormat.stamp(conf, dir,
      graft.state.HistoryFormat.PolySimhashSigCache)
    val seq = readMeta(conf, dir).map(_.seq).getOrElse(0L) + 1
    if (repsN == 0) {
      writeMeta(conf, dir, Meta(0L, mod1, mod2, seq, Nil))
      CacheDirs.prune(conf, dir, Nil)
    } else {
      val chunk = s"c$seq"
      derive(reps, mod1, mod2)
        .write.mode("overwrite").parquet(s"$dir/$chunk")
      writeMeta(conf, dir, Meta(repsN, mod1, mod2, seq, Seq(chunk)))
      CacheDirs.prune(conf, dir, Seq(chunk))
    }
  }

  /** The per-fold fast path: validate (or losslessly heal) the cache
    * against EXACTLY this reps table, compact-at-start when the chunk
    * list is long (BEFORE planning the returned read, so the frame
    * never reads files this fold prunes), return the committed
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
    val meta = readMeta(conf, dir)
    meta.foreach(checkParams(_, dir, mod1, mod2))
    val ok = meta.exists(m =>
      m.n == repsN && CacheDirs.chunksExist(conf, dir, m.chunks) &&
        graft.state.HistoryFormat.read(conf, dir).contains(
          (graft.state.HistoryFormat.PolySimhashSigCache.name,
            graft.state.HistoryFormat.PolySimhashSigCache.version.toLong)))
    if (!ok) {
      val detail = s"dir=$dir reps_rows=$repsN stored=${meta.map(_.n)}"
      Dedup.selectorLog.info(s"event=sigcache_rebuild $detail")
      graft.core.StageMetadata.put("sigcache_rebuild", detail)
      rebuildWithN(spark, dir, reps, mod1, mod2, repsN)
    }
    var m = readMeta(conf, dir).get
    // compact BEFORE the read below plans its file list — never prune
    // what a frame returned from this fold still reads
    if (m.chunks.size >= CompactAfterChunks) {
      val merged = s"m${m.seq + 1}"
      spark.read.parquet(m.chunks.map(c => s"$dir/$c"): _*)
        .write.mode("overwrite").parquet(s"$dir/$merged")
      writeMeta(conf, dir, Meta(m.n, mod1, mod2, m.seq + 1, Seq(merged)))
      CacheDirs.prune(conf, dir, Seq(merged))
      m = readMeta(conf, dir).get
    }
    val hs = read(spark, dir)
    // append the batch's signatures: Δn from the WRITTEN chunk, so the
    // committed n is a pure function of committed bytes
    val chunk = s"c${m.seq + 1}"
    freshSigs.select(col("doc_id"), col("sh"))
      .write.mode("overwrite").parquet(s"$dir/$chunk")
    val deltaRows = spark.read.parquet(s"$dir/$chunk").count()
    val grown = m.chunks :+ chunk
    writeMeta(conf, dir, Meta(m.n + deltaRows, mod1, mod2, m.seq + 1,
      grown))
    CacheDirs.prune(conf, dir, grown)
    hs
  }
}
