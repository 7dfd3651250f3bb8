package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared disciplines of the chunked derived-cache directories
  * ([[Hash64Counts]], [[SigCache]]): the `c|m<digits>` chunk namespace,
  * the `Meta(n, seq, chunks+rows, params)` atomic-meta pattern,
  * post-commit pruning, chunk-existence tripwires, the cheap
  * AHEAD-heal arithmetic, and the heal-path ownership guard. ONE
  * definition — a divergent copy of the pruning, meta, or ownership
  * rules between caches would let one cache's heal path damage
  * another's table, and a third derived cache cannot fork the
  * discipline. */
private[operators] object CacheDirs {

  /** One committed chunk: its directory name and its contribution to
    * the meta's folded row count `n` (for a per-row cache this is the
    * chunk's parquet rows; for an aggregated cache like the bucket
    * counts it is the SOURCE rows the chunk folded). Per-chunk
    * accounting is what makes the cheap AHEAD heal possible: a cache
    * exactly k committed chunks ahead of its source table heals by
    * dropping that suffix from the meta — no Spark job, no source
    * re-scan. */
  final case class CacheChunk(name: String, rows: Long)

  /** The shared chunked-cache meta: total folded source rows, the
    * commit sequence (chunk names only ever move forward — a crashed
    * fold's stray chunk carries the name the retry overwrites), the
    * chunk list with per-chunk row accounting, and the cache's
    * parameter identity (a different parameterization is a different
    * derivation — callers REFUSE on mismatch, never clobber). */
  final case class ChunkMeta(n: Long, seq: Long, chunks: Seq[CacheChunk],
      params: Map[String, Long]) {
    def chunkNames: Seq[String] = chunks.map(_.name)
  }

  /** Read a chunk-cache meta. `paramKeys` names the cache's parameter
    * fields in canonical order; a missing core field is malformed (the
    * message carries `remedy`). `chunk_rows` may be ABSENT (a meta
    * written before per-chunk accounting): the chunks then read as
    * rows = −1 = unknown, which disables the cheap AHEAD heal but
    * nothing else — the row-count tripwire still catches every
    * inconsistency and the lossless rebuild still heals it. */
  def readChunkMeta(conf: Configuration, dir: String, metaFile: String,
      paramKeys: Seq[String], remedy: String): Option[ChunkMeta] = {
    val p = new Path(dir, metaFile)
    if (!graft.util.Fs.exists(p, conf)) None
    else {
      val node = graft.util.Fs.readJson(p, conf)
      def corrupt(what: String): Nothing = throw new IllegalStateException(
        s"cache meta at $dir is malformed ($what) — $remedy")
      val names = graft.util.Jsons.optField(node, "chunks")
        .map(a => graft.util.Jsons.elems(a).map(_.asText()).toSeq)
        .getOrElse(corrupt("no chunks"))
      val rows = graft.util.Jsons.optField(node, "chunk_rows")
        .map(a => graft.util.Jsons.elems(a).map(_.asLong()).toSeq)
        .getOrElse(names.map(_ => -1L))
      if (rows.size != names.size)
        corrupt(s"chunk_rows has ${rows.size} entries for ${names.size} " +
          "chunks")
      Some(ChunkMeta(
        graft.util.Jsons.optLong(node, "n").getOrElse(corrupt("no n")),
        graft.util.Jsons.optLong(node, "seq").getOrElse(corrupt("no seq")),
        names.zip(rows).map { case (nm, r) => CacheChunk(nm, r) },
        paramKeys.map(k => k -> graft.util.Jsons.optLong(node, k)
          .getOrElse(corrupt(s"no $k"))).toMap))
    }
  }

  /** Atomically replace a chunk-cache meta (the cache's single commit
    * point). Always writes `chunk_rows`. */
  def writeChunkMeta(conf: Configuration, dir: String, metaFile: String,
      paramKeys: Seq[String], m: ChunkMeta): Unit = {
    val o = graft.util.Jsons.obj()
    o.put("n", m.n)
    paramKeys.foreach(k => o.put(k, m.params(k)))
    o.put("seq", m.seq)
    val a = o.putArray("chunks"); m.chunks.foreach(c => a.add(c.name))
    val r = o.putArray("chunk_rows"); m.chunks.foreach(c => r.add(c.rows))
    graft.util.Fs.atomicWriteJson(new Path(dir, metaFile), o, conf)
  }

  /** The cheap AHEAD-heal arithmetic: when the cache's folded count is
    * ahead of the source table (the common crash window — the cache
    * chunk committed, the source's own commit was lost, the batch
    * replays), the surplus is by construction a SUFFIX of the chunk
    * list; if per-chunk accounting is available (no −1 rows) and some
    * strict prefix sums exactly to `targetN`, return that prefix — the
    * heal is then one meta rewrite plus a prune, no Spark job and no
    * source re-scan (the replayed fold re-derives and re-appends the
    * dropped rows itself). Returns None when the surplus does not
    * align on chunk boundaries (or accounting is unknown): that is NOT
    * the replay window, and the caller falls back to the lossless full
    * rebuild. Soundness rests on the same append-only + single-writer
    * contract as the row-count tripwire itself. `targetN == 0` is
    * deliberately EXCLUDED: an empty source with a non-empty cache is
    * indistinguishable from an out-of-band reset (the rebuild-remedy
    * misuse: source recreated, cache dir forgotten), so it reports
    * through the rebuild path — which at n = 0 is a free meta write
    * anyway — keeping the structured event stream's
    * ahead-heal-means-replay-window semantics honest. */
  def aheadKeepPrefix(m: ChunkMeta, targetN: Long)
      : Option[Seq[CacheChunk]] = {
    if (targetN <= 0 || m.n <= targetN || m.chunks.exists(_.rows < 0))
      return None
    var sum = 0L
    var i = 0
    while (i < m.chunks.size && sum < targetN) {
      sum += m.chunks(i).rows
      i += 1
    }
    if (sum == targetN && i < m.chunks.size) Some(m.chunks.take(i))
    else None
  }

  /** Post-commit cleanup, best-effort: chunk dirs the committed meta no
    * longer (or never) lists — crashed-fold strays and compacted-away
    * chunks. Owns only the `c|m<digits>` namespace. */
  def prune(conf: Configuration, dir: String, keep: Seq[String]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val keepSet = keep.toSet
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.matches("[cm]\\d+") && !keepSet.contains(n))
        fs.delete(st.getPath, true)
    }
  }

  /** All chunks the meta lists are on disk (part of each cache's
    * tripwire: a lost chunk is an inconsistency the heal paths rebuild
    * over, and the bare readers refuse on with the remedy). */
  def chunksExist(conf: Configuration, dir: String,
      chunks: Seq[String]): Boolean = {
    val fs = new Path(dir).getFileSystem(conf)
    chunks.forall(c => fs.exists(new Path(dir, c)))
  }

  /** THE tripwire heal dispatch, shared by both caches' `healIfStale`
    * (one definition — the ordering of the marker/chunk checks and the
    * ahead-vs-rebuild split must not drift between caches): a
    * consistent cache passes untouched; the chunk-aligned AHEAD window
    * heals by suffix truncation (one meta rewrite + prune, no Spark
    * job — see [[aheadKeepPrefix]]); everything else runs the caller's
    * lossless `rebuild`. Both paths log and surface structured events
    * (`<eventPrefix>_ahead_heal` / `<eventPrefix>_rebuild`);
    * `targetLabel` names the source-row count in the detail string. */
  def healDispatch(conf: Configuration, dir: String, metaFile: String,
      paramKeys: Seq[String], meta: Option[ChunkMeta], markerOk: Boolean,
      targetN: Long, eventPrefix: String, targetLabel: String)
      (rebuild: => Unit): Unit = {
    val ok = meta.exists(m =>
      m.n == targetN && markerOk && chunksExist(conf, dir, m.chunkNames))
    if (ok) return
    val ahead = meta
      .filter(_ => markerOk)
      .filter(m => chunksExist(conf, dir, m.chunkNames))
      .flatMap(m => aheadKeepPrefix(m, targetN).map((m, _)))
    ahead match {
      case Some((m, keep)) =>
        val detail = s"dir=$dir $targetLabel=$targetN stored=${m.n} " +
          s"dropped=${m.chunks.size - keep.size}"
        Dedup.selectorLog.info(s"event=${eventPrefix}_ahead_heal $detail")
        graft.core.StageMetadata.put(s"${eventPrefix}_ahead_heal", detail)
        writeChunkMeta(conf, dir, metaFile, paramKeys,
          ChunkMeta(targetN, m.seq, keep, m.params))
        prune(conf, dir, keep.map(_.name))
      case None =>
        val detail = s"dir=$dir $targetLabel=$targetN " +
          s"stored=${meta.map(_.n)}"
        Dedup.selectorLog.info(s"event=${eventPrefix}_rebuild $detail")
        graft.core.StageMetadata.put(s"${eventPrefix}_rebuild", detail)
        rebuild
    }
  }

  /** Heal-path ownership guard: a rebuild may overwrite a directory
    * holding OUR cache format (any version — it is derived state), but
    * NEVER one that is something else — a marker naming another format
    * (the classic misuse: pointing a cache dir at the table it caches
    * FOR) or data with no marker at all refuses loudly instead of
    * being stamped over. */
  def guardOwnership(conf: Configuration, dir: String,
      fmt: graft.state.HistoryFormat.Format, what: String): Unit =
    graft.state.HistoryFormat.read(conf, dir) match {
      case Some((name, _)) if name != fmt.name =>
        throw new IllegalStateException(
          s"$dir is a '$name' table, not a $what — refusing to rebuild " +
            "over it; give the cache its own directory")
      case Some(_) => ()
      case None =>
        val p = new Path(dir)
        val fs = p.getFileSystem(conf)
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          throw new IllegalStateException(
            s"$dir holds data but no format marker — not a $what this " +
              "engine can verify; use an empty directory or remove the " +
              "foreign data")
    }
}
