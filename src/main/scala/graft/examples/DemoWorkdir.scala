package graft.examples

import java.io.File

/** Workdir hygiene for the runnable demos.
  *
  * Every demo stages input files and a pipeline checkpoint under a
  * work directory. Running against a LEFTOVER directory from a prior
  * run is a silent footgun: the staged files' paths are already
  * committed in the stale checkpoint, so every batch goes idle, the
  * demo's crash-replay never happens, and downstream checks read
  * stale-but-complete tables — plausible output, misattributed FAIL.
  * (The engine's exactly-once machinery is doing exactly its job; the
  * demo's premise — "these files are new" — is what's violated.)
  *
  * Policy, per the two ways a demo gets its workdir:
  *  - DEFAULT dir (no CLI arg): it is this demo's own named scratch
  *    under /tmp, so a leftover is always OUR leftover — wipe it and
  *    start fresh. A re-run of the demo then always measures what it
  *    claims to.
  *  - EXPLICIT dir (CLI arg): never delete data we did not create.
  *    Refuse a non-empty directory loudly, naming the remedy.
  */
object DemoWorkdir {

  /** Resolve the demo workdir from `args`, guaranteed fresh. */
  def fresh(args: Array[String], default: String): String =
    args.headOption match {
      case None =>
        wipe(default)
        default
      case Some(dir) =>
        val f = new File(dir)
        if (f.exists()) {
          // a regular file (or an unreadable directory) returns null from
          // list() — treating null as "empty" would pass the guard and
          // fail later with an opaque not-a-directory error, or let a
          // stale checkpoint behind an unreadable dir recreate the very
          // idle-batch footgun this guard exists to prevent
          require(f.isDirectory,
            s"workdir $dir exists and is not a directory. Pass a fresh " +
              s"path or remove it first: rm -f $dir")
          val children = Option(f.list())
          require(children.nonEmpty,
            s"workdir $dir exists but cannot be listed (permissions?) — " +
              "refusing to run against state this process cannot inspect. " +
              "Pass a fresh path.")
          require(children.get.isEmpty,
            s"workdir $dir already exists and is non-empty (likely a " +
              "prior run's checkpoint — a stale checkpoint makes every " +
              s"batch go idle). Pass a fresh path or delete it first: " +
              s"rm -rf $dir")
        }
        dir
    }

  private def wipe(dir: String): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm)
      f.delete(): Unit
    }
    val f = new File(dir)
    if (f.exists()) rm(f)
  }
}
