package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Shared disciplines of the chunked derived-cache directories
  * ([[Hash64Counts]], [[SigCache]]): the `c|m<digits>` chunk namespace,
  * post-commit pruning, chunk-existence tripwires, and the heal-path
  * ownership guard. ONE definition — a divergent copy of the pruning
  * or ownership rules between caches would let one cache's heal path
  * damage another's table. */
private[operators] object CacheDirs {

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
