package graft

import graft.sources.{FileSourceOptions, FileStreamCheckpoint}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Property-based invariants (SURVEY §5.2): widening lattice laws, CDC
  * merge composition, planner exactly-once coverage. */
class PropertySuite extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling harness over scalacheck Gen (the
    * scalatest-scalacheck bridge isn't on the classpath). */
  private def forAllSampled[T](gen: Gen[T], n: Int = 30)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val latticeTypes: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType, StringType)

  test("widening lattice: commutative, idempotent, absorbing on strings") {
    val se = new SchemaEvolution(SchemaPolicy.TypeWiden)
    forAllSampled(Gen.zip(latticeTypes, latticeTypes), 50) { case (a, b) =>
      val ab = try Some(se.widen(a, b)) catch { case _: Exception => None }
      val ba = try Some(se.widen(b, a)) catch { case _: Exception => None }
      assert(ab === ba)
      ab.foreach { w =>
        assert(se.widen(w, w) === w)
        // widening is monotone: widening with the result is a no-op
        assert(se.widen(w, a) === w || a == BooleanType)
      }
    }
  }

  test("CDC merge composition: applying two batches sequentially equals applying their union") {
    val changeGen = for {
      key <- Gen.choose(1L, 6L)
      value <- Gen.choose(0L, 100L)
      kind <- Gen.oneOf("insert", "update_postimage", "delete")
    } yield (key, value, kind)

    forAllSampled(Gen.listOfN(12, changeGen), 10) { changes =>
      if (changes.nonEmpty) {
        // assign strictly increasing versions to fix the order
        val versioned = changes.zipWithIndex.map { case ((k, v, t), i) =>
          (k, v, t, i.toLong)
        }
        val (first, second) = versioned.splitAt(versioned.size / 2)
        def df(rows: Seq[(Long, Long, String, Long)]) =
          rows.toDF("id", "value", Cdc.ChangeTypeCol, Cdc.CommitVersionCol)
        val allAtOnce = Cdc.applyCdc(df(versioned), None, Seq("id"))
        val sequential = Cdc.applyCdc(df(second),
          if (first.isEmpty) None else Some(Cdc.applyCdc(df(first), None, Seq("id"))),
          Seq("id"))
        val a = allAtOnce.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
        val b = sequential.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(a.toSeq === b.toSeq)
      }
    }
  }

  test("planner covers every file exactly once across batches") {
    forAllSampled(Gen.zip(Gen.choose(1, 12), Gen.choose(1, 4)), 8) { case (nFiles, maxPer) =>
      withTmpDir { tmp =>
        val in = s"$tmp/in"
        Files.createDirectories(Paths.get(in))
        val names = (0 until nFiles).map(i => f"f$i%03d.txt")
        names.foreach { n =>
          Files.write(Paths.get(in, n), "x".getBytes, StandardOpenOption.CREATE)
        }
        val ckpt = new FileStreamCheckpoint(s"$tmp/cp", new Configuration())
        val opts = FileSourceOptions(maxFilesPerTrigger = Some(maxPer))
        val planned = Iterator.continually(ckpt.planBatch(in, opts))
          .takeWhile(_.isDefined).map(_.get)
          .map { b => ckpt.commitBatch(b, Map.empty, opts); b.paths }
          .toSeq
        val all = planned.flatten.map(p => Paths.get(p).getFileName.toString)
        assert(all.sorted === names.sorted, "every file exactly once")
        assert(planned.forall(_.size <= maxPer), "cap respected")
      }
    }
  }

  test("delta tailing covers every dataChange add exactly once across batches") {
    import graft.sources.{DeltaSourceOptions, DeltaStartOffset, DeltaTableCheckpoint}
    forAllSampled(Gen.zip(Gen.choose(1, 6), Gen.choose(1, 3), Gen.choose(1, 3)), 6) {
      case (nVersions, addsPerVersion, maxPer) =>
        withTmpDir { tmp =>
          val table = s"$tmp/table"
          val logDir = Paths.get(table, "_delta_log")
          Files.createDirectories(logDir)
          val allFiles = (0 until nVersions).flatMap { v =>
            val adds = (0 until addsPerVersion).map(i => s"f$v-$i.parquet")
            val lines = Seq(s"""{"commitInfo": {"timestamp": ${v * 10}}}""") ++
              (if (v == 0) Seq("""{"metaData": {"id": "t"}}""") else Nil) ++
              adds.map(p => s"""{"add": {"path": "$p", "size": 1, "dataChange": true}}""")
            Files.write(logDir.resolve(f"$v%020d.json"),
              lines.mkString("\n").getBytes, StandardOpenOption.CREATE)
            adds
          }
          val ckpt = new DeltaTableCheckpoint(s"$tmp/cp", new Configuration())
          val opts = DeltaSourceOptions(startOffset = DeltaStartOffset.Earliest,
            maxFilesPerTrigger = Some(maxPer))
          val planned = Iterator.continually(ckpt.planBatch(table, opts))
            .takeWhile(_.isDefined).map(_.get)
            .map { b => ckpt.commitBatch(b, Map.empty); b.paths }
            .toSeq
          val names = planned.flatten.map(p => Paths.get(p).getFileName.toString)
          assert(names.sorted === allFiles.sorted, "every add exactly once")
          assert(planned.forall(_.size <= maxPer))
        }
    }
  }
}
