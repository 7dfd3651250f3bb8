package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The AHEAD-heal arithmetic as algebra — [[CacheDirs.aheadKeepPrefix]]
  * is the pure function both caches' crash-window classification rides
  * (suffix drop vs lossless rebuild), so its boundary behavior is
  * pinned exhaustively here, Spark-free. */
class CacheDirsSpec extends AnyFunSuite {
  import CacheDirs.{CacheChunk, ChunkMeta}

  private def forAllSampled[T](gen: Gen[T], n: Int = 60)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).foreach(body)
    }

  private def meta(rows: Seq[Long]): ChunkMeta =
    ChunkMeta(rows.sum, rows.size.toLong,
      rows.zipWithIndex.map { case (r, i) => CacheChunk(s"c${i + 1}", r) },
      Map.empty)

  test("aheadKeepPrefix algebra: exactly the chunk-boundary surpluses " +
    "heal, everything else classifies as rebuild") {
    val rowsGen = Gen.nonEmptyListOf(Gen.choose(1L, 9L)).map(_.take(8))
    forAllSampled(Gen.zip(rowsGen, Gen.choose(0, 8))) { case (rows, k0) =>
      val m = meta(rows)
      val k = math.min(k0, rows.size)
      val boundary = rows.take(k).sum
      val got = CacheDirs.aheadKeepPrefix(m, boundary)
      if (k < rows.size && boundary > 0)
        // a strict-prefix boundary with a positive target: heal keeps
        // exactly that prefix
        assert(got.map(_.map(_.name)) ===
          Some((1 to k).map(i => s"c$i")), s"rows=$rows k=$k")
      else
        // target == total (not ahead) or target == 0 (the out-of-band
        // reset, deliberately a rebuild): never the ahead window
        assert(got === None, s"rows=$rows k=$k")
      // a target strictly inside chunk k+1 never heals (chunks have
      // rows >= 1, so boundary+1 is inside the next chunk when it has
      // more than one row; generate that case explicitly)
      if (k < rows.size && rows(k) > 1)
        assert(CacheDirs.aheadKeepPrefix(m, boundary + 1) === None,
          s"mid-chunk target must rebuild: rows=$rows k=$k")
    }
    // unknown per-chunk accounting (a v1 meta) disables the heal
    val unknown = ChunkMeta(10L, 2L,
      Seq(CacheChunk("c1", 4L), CacheChunk("c2", -1L)), Map.empty)
    assert(CacheDirs.aheadKeepPrefix(unknown, 4L) === None)
    // a target above the stored total is stale-BEHIND, never ahead
    assert(CacheDirs.aheadKeepPrefix(meta(Seq(3L, 4L)), 9L) === None)
  }
}
