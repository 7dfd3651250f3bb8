package graft

import graft.examples.DemoWorkdir
import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.Files

/** The stale-workdir guard every runnable demo routes through: a
  * leftover checkpoint makes each staged file "already committed", so
  * batches go idle and the demo measures nothing — the guard must make
  * that state unreachable (wipe our own default scratch; refuse an
  * explicit dir we did not create).
  */
class DemoWorkdirSuite extends AnyFunSuite {

  private def tmp(): File =
    Files.createTempDirectory("graft-dw-").toFile

  test("default dir: wiped to fresh, path returned") {
    val dir = tmp()
    val stale = new File(dir, "checkpoint/offsets")
    stale.mkdirs()
    Files.writeString(new File(stale, "0.json").toPath, "{\"v\":1}")
    val got = DemoWorkdir.fresh(Array.empty, dir.getPath)
    assert(got == dir.getPath)
    assert(!new File(dir, "checkpoint").exists(),
      "stale checkpoint must be gone after fresh()")
  }

  test("default dir: absent is fine") {
    val dir = new File(tmp(), "never-created")
    assert(DemoWorkdir.fresh(Array.empty, dir.getPath) == dir.getPath)
  }

  test("explicit dir: empty or absent accepted, never deleted") {
    val empty = tmp()
    assert(DemoWorkdir.fresh(Array(empty.getPath), "/tmp/unused") == empty.getPath)
    assert(empty.exists(), "an accepted explicit dir must survive")
    val absent = new File(empty, "sub")
    assert(DemoWorkdir.fresh(Array(absent.getPath), "/tmp/unused") == absent.getPath)
  }

  test("explicit non-empty dir: refused loudly, contents untouched") {
    val dir = tmp()
    val marker = new File(dir, "checkpoint")
    marker.mkdirs()
    val e = intercept[IllegalArgumentException] {
      DemoWorkdir.fresh(Array(dir.getPath), "/tmp/unused")
    }
    assert(e.getMessage.contains("non-empty"))
    assert(e.getMessage.contains(dir.getPath))
    assert(marker.exists(), "refusal must not delete the user's data")
  }

  test("explicit path that is a regular file: refused with the remedy, " +
    "not passed through as 'empty'") {
    // File.list() on a regular file returns null — treating null as an
    // empty directory would pass the guard and fail later with an opaque
    // not-a-directory error (or clobber the file)
    val f = new File(tmp(), "leftover.log")
    Files.writeString(f.toPath, "old log")
    val e = intercept[IllegalArgumentException] {
      DemoWorkdir.fresh(Array(f.getPath), "/tmp/unused")
    }
    assert(e.getMessage.contains("not a directory"))
    assert(f.exists(), "refusal must not delete the user's file")
  }
}
