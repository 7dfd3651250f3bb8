package graft

import graft.core.{GraftError, WriteAheadLog}
import graft.sources._
import graft.state.JobState
import graft.streaming.Patterns
import graft.util.Jsons
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class CatalogSuite extends SparkSpec {

  test("resolve, missing name, and files-source construction with options") {
    withTmpDir { tmp =>
      val cat = LocalCatalog(Map(
        "events" -> DatasetSpec("parquet", s"$tmp/in", Map(
          "pattern" -> "*.parquet", "max_files_per_trigger" -> "2",
          "start_offset" -> "latest", "clean_source" -> "archive"))))
      val spec = cat.resolve("events")
      assert(spec.format === "parquet")
      intercept[GraftError](cat.resolve("nope"))
      val src = spec.toSource(s"$tmp/cp", conf).asInstanceOf[FileSource]
      assert(src.options.maxFilesPerTrigger === Some(2))
      assert(src.options.startOffset === FileStartOffset.Latest)
      assert(src.cleanSource === CleanSource.Archive)
    }
  }

  test("auto format infers delta from _delta_log presence") {
    withTmpDir { tmp =>
      Files.createDirectories(Paths.get(s"$tmp/table/_delta_log"))
      val spec = DatasetSpec("auto", s"$tmp/table",
        Map("read_change_feed" -> "true", "starting_version" -> "3"))
      val src = spec.toSource(s"$tmp/cp", conf)
      assert(src.isInstanceOf[DeltaSource])
      val ds = src.asInstanceOf[DeltaSource]
      assert(ds.options.readChangeFeed)
      assert(ds.options.startOffset === DeltaStartOffset.StartingVersion(3))
    }
  }

  test("catalog loads from JSON file") {
    withTmpDir { tmp =>
      Files.write(Paths.get(s"$tmp/catalog.json"),
        s"""{"raw": {"format": "csv", "path": "$tmp/raw",
           |  "options": {"pattern": "*.csv"}}}""".stripMargin.getBytes)
      val cat = LocalCatalog.fromJsonFile(s"$tmp/catalog.json", conf)
      assert(cat.resolve("raw").format === "csv")
      assert(cat.resolve("raw").options("pattern") === "*.csv")
    }
  }

  test("catalog loads from TOML file (reference fixture shape)") {
    withTmpDir { tmp =>
      // mirror of reference tests/test_catalog.py:141-144 plus the
      // normalization rules: datasets wrapper, aliases, extras -> options
      Files.write(Paths.get(s"$tmp/catalog.toml"),
        s"""# training-data catalog
           |[datasets.one]
           |format = "parquet"
           |path = "$tmp/one"
           |
           |[datasets.raw]
           |type = 'csv'              # format alias, literal string
           |location = "$tmp/raw"     # path alias
           |recursive = true          # extra key -> options
           |max_files_per_trigger = 25
           |[datasets.raw.options]
           |pattern = "*.csv"
           |""".stripMargin.getBytes)
      val cat = LocalCatalog.fromFile(s"$tmp/catalog.toml", conf)
      assert(cat.resolve("one").format === "parquet")
      assert(cat.resolve("one").path === s"$tmp/one")
      val raw = cat.resolve("raw")
      assert(raw.format === "csv")
      assert(raw.path === s"$tmp/raw")
      assert(raw.options === Map("pattern" -> "*.csv", "recursive" -> "true",
        "max_files_per_trigger" -> "25"))
      val src = raw.toSource(s"$tmp/cp", conf).asInstanceOf[FileSource]
      assert(src.options.recursive && src.options.maxFilesPerTrigger === Some(25))
    }
  }

  test("TOML without wrapper and JSON with wrapper both resolve") {
    withTmpDir { tmp =>
      Files.write(Paths.get(s"$tmp/flat.toml"),
        s"""[events]
           |format = "parquet"
           |path = "$tmp/e"
           |""".stripMargin.getBytes)
      assert(LocalCatalog.fromFile(s"$tmp/flat.toml", conf)
        .resolve("events").format === "parquet")
      Files.write(Paths.get(s"$tmp/wrapped.json"),
        s"""{"datasets": {"events": {"format": "parquet", "path": "$tmp/e"}}}""".getBytes)
      assert(LocalCatalog.fromFile(s"$tmp/wrapped.json", conf)
        .resolve("events").format === "parquet")
      intercept[GraftError](LocalCatalog.fromFile(s"$tmp/catalog.yaml", conf))
    }
  }

  test("TOML parser rejects unsupported syntax with line numbers") {
    import graft.util.Toml
    assert(Toml.parse("a = 1\nb = \"x # not a comment\"\n") ===
      Map("a" -> 1L, "b" -> "x # not a comment"))
    assert(Toml.parse("[t]\nflag = false\narr = [\"a\", \"b\"]\nf = 1.5") ===
      Map("t" -> Map("flag" -> false, "arr" -> Seq("a", "b"), "f" -> 1.5)))
    val e = intercept[GraftError](Toml.parse("a = 1\nbroken line"))
    assert(e.getMessage.contains("line 2"))
    intercept[GraftError](Toml.parse("[[tables]]\n"))
  }
}

class MaintenanceSuite extends SparkSpec {

  private def seedBatches(cp: String, n: Int, committed: Int): WriteAheadLog = {
    val wal = new WriteAheadLog(cp, conf)
    (0 until n).foreach { i =>
      wal.writeOffset(graft.core.BatchInfo(i.toLong, Seq.empty, Jsons.obj()))
      if (i < committed) wal.commit(i.toLong, Map.empty)
    }
    wal
  }

  test("cleanup keeps last N committed and never touches pending") {
    withTmpDir { tmp =>
      val wal = seedBatches(s"$tmp/cp", 6, 5) // batch 5 pending
      val deleted = Maintenance.cleanupCheckpoint(s"$tmp/cp", conf, keepLastN = 2)
      assert(deleted === Seq(0L, 1L, 2L))
      assert(wal.listCommitIds() === Seq(3L, 4L))
      assert(wal.pendingBatchIds() === Seq(5L))
    }
  }

  test("truncate drops batches above keepThrough") {
    withTmpDir { tmp =>
      val wal = seedBatches(s"$tmp/cp", 5, 5)
      val removed = Maintenance.truncateCheckpoint(s"$tmp/cp", conf, keepThrough = 2)
      assert(removed === Seq(3L, 4L))
      assert(wal.listOffsetIds() === Seq(0L, 1L, 2L))
      assert(wal.nextBatchId() === 3L)
    }
  }

  test("truncate forgets truncated files so the file source replans them") {
    withTmpDir { tmp =>
      val in = s"$tmp/in"; val cp = s"$tmp/cp"
      Files.createDirectories(Paths.get(in))
      def put(name: String) = Files.write(Paths.get(in, name), "x".getBytes)
      put("a.txt")
      val ckpt = new FileStreamCheckpoint(cp, conf)
      val opts = FileSourceOptions(pattern = "*.txt")
      val b0 = ckpt.planBatch(in, opts).get
      ckpt.commitBatch(b0, Map.empty, opts)
      put("b.txt")
      val b1 = ckpt.planBatch(in, opts).get
      assert(b1.files.map(f => new java.io.File(f.path).getName) === Seq("b.txt"))
      ckpt.commitBatch(b1, Map.empty, opts)
      assert(ckpt.planBatch(in, opts).isEmpty)
      // rewind past b1: its files leave the committed index and replan
      Maintenance.truncateCheckpoint(cp, conf, keepThrough = b0.batchId)
      val b2 = ckpt.planBatch(in, opts).get
      assert(b2.files.map(f => new java.io.File(f.path).getName) === Seq("b.txt"))
    }
  }

  test("inspect reports ids, pending, metadata; resets drop metadata keys") {
    withTmpDir { tmp =>
      val wal = seedBatches(s"$tmp/cp", 3, 2)
      wal.updateMetadata("start_offset", Jsons.parse("""{"kind":"latest"}"""))
      wal.updateMetadata("schema", Jsons.parse("""{"type":"struct","fields":[]}"""))
      val info = Maintenance.inspectCheckpoint(s"$tmp/cp", conf)
      assert(info.lastOffsetId === Some(2L))
      assert(info.lastCommitId === Some(1L))
      assert(info.pendingIds === Seq(2L))
      assert(info.totalBatches === 3)
      Maintenance.resetStartOffset(s"$tmp/cp", conf)
      Maintenance.resetSchema(s"$tmp/cp", conf)
      val m = wal.readMetadata().get
      assert(!m.has("start_offset") && !m.has("schema"))
    }
  }
}

class JobStateSuite extends SparkSpec {
  import spark.implicits._

  test("json and parquet state round-trip with atomic replace") {
    withTmpDir { tmp =>
      val state = new JobState(s"$tmp/state", conf, spark)
      state.saveValue("watermark", "12345")
      assert(state.loadValue("watermark") === Some("12345"))
      state.saveValue("watermark", "99999")
      assert(state.loadValue("watermark") === Some("99999"))

      state.saveParquet("seen", Seq(1L, 2L).toDF("id"))
      assert(state.loadParquet("seen").get.count() === 2)
      state.saveParquet("seen", Seq(1L, 2L, 3L).toDF("id"))
      assert(state.loadParquet("seen").get.count() === 3)

      assert(state.exists("seen") && state.exists("watermark"))
      state.delete("seen")
      assert(!state.exists("seen"))
      assert(state.loadParquet("missing").isEmpty)
    }
  }

  test("interrupted saveParquet swaps self-heal losslessly at every " +
    "crash point (the table is never observable as silently absent)") {
    withTmpDir { tmp =>
      val state = new JobState(s"$tmp/state", conf, spark)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
      def p(s: String) = new org.apache.hadoop.fs.Path(s"$tmp/state/$s")
      state.saveParquet("seen", Seq(1L, 2L).toDF("id"))

      // crash point: between rename-aside and rename-in — tmp is a
      // COMPLETE new table (the aside rename only happens after the tmp
      // write returns), target is gone. Heal must finish the swap
      // forward, not restore the aside.
      Seq(1L, 2L, 3L).toDF("id").write.parquet(
        p(".seen.tmp.parquet").toString)
      assert(fs.rename(p("seen.parquet"), p(".seen.old.parquet")))
      assert(state.loadParquet("seen").get.count() === 3,
        "heal must complete the interrupted swap to the NEW table")
      assert(!fs.exists(p(".seen.old.parquet")) &&
        !fs.exists(p(".seen.tmp.parquet")))

      // crash point: after the swap, before aside cleanup — both target
      // and aside present. READS must not mutate (the target is live;
      // debris is harmless and read-only consumers must keep working);
      // the next SAVE cleans the aside.
      Seq(9L).toDF("id").write.parquet(p(".seen.old.parquet").toString)
      assert(state.loadParquet("seen").get.count() === 3)
      assert(fs.exists(p(".seen.old.parquet")),
        "reads must not mutate while the target is live")
      state.saveParquet("seen", Seq(1L, 2L, 3L).toDF("id"))
      assert(!fs.exists(p(".seen.old.parquet")))

      // degenerate: aside alone (no tmp, no target) — restore it; the
      // aside is the last committed state
      assert(fs.rename(p("seen.parquet"), p(".seen.old.parquet")))
      assert(state.loadParquet("seen").get.count() === 3,
        "a lone aside must restore, never read as a fresh (empty) state")

      // a save over a crash layout heals first, then swaps normally
      Seq(1L, 2L, 3L, 4L).toDF("id").write.parquet(
        p(".seen.tmp.parquet").toString)
      assert(fs.rename(p("seen.parquet"), p(".seen.old.parquet")))
      state.saveParquet("seen", Seq(5L).toDF("id"))
      assert(state.loadParquet("seen").get.count() === 1)
      assert(!fs.exists(p(".seen.old.parquet")) &&
        !fs.exists(p(".seen.tmp.parquet")))

      // delete removes swap debris along with the table (debris-first
      // ordering, so a crash mid-delete can never leave a lone aside
      // that a later read resurrects)
      Seq(9L).toDF("id").write.parquet(p(".seen.old.parquet").toString)
      state.delete("seen")
      assert(!state.exists("seen") && !fs.exists(p(".seen.old.parquet")))
      assert(state.loadParquet("seen").isEmpty)

      // crash DURING the tmp write itself (partial tmp, no aside): the
      // live table reads untouched and unmutated; the next save clears
      // the debris through its own overwrite
      state.saveParquet("s2", Seq(1L).toDF("id"))
      fs.mkdirs(p(".s2.tmp.parquet"))
      assert(state.loadParquet("s2").get.count() === 1)
      assert(fs.exists(p(".s2.tmp.parquet")),
        "reads must not mutate while the target is live")
      state.saveParquet("s2", Seq(1L, 2L).toDF("id"))
      assert(state.loadParquet("s2").get.count() === 2)
      assert(!fs.exists(p(".s2.tmp.parquet")) &&
        !fs.exists(p(".s2.old.parquet")))
    }
  }
}

class PatternsSuite extends SparkSpec {
  import spark.implicits._

  test("watermark split: watermark advances across batches, late rows split") {
    withTmpDir { tmp =>
      val state = new JobState(s"$tmp/state", conf, spark)
      val b1 = Seq((1L, 1000L), (2L, 2000L)).toDF("id", "ts")
      val s1 = Patterns.watermarkSplit(b1, "ts", allowedLatenessMs = 500, state)
      assert(s1.watermark === Some(2000L))
      // cutoff = 2000-500: ts=1000 is already late within the first batch
      assert(s1.onTime.count() === 1 && s1.late.count() === 1)
      // next batch: watermark stays at 2000 even though batch max is lower
      val b2 = Seq((3L, 900L), (4L, 1800L)).toDF("id", "ts")
      val s2 = Patterns.watermarkSplit(b2, "ts", allowedLatenessMs = 500, state)
      assert(s2.watermark === Some(2000L))
      assert(s2.late.select("id").head().getLong(0) === 3L) // 900 < 1500
      assert(s2.onTime.count() === 1)
    }
  }

  test("cross-batch dedup via parquet seen-keys state") {
    withTmpDir { tmp =>
      val state = new JobState(s"$tmp/state", conf, spark)
      // baseline BEFORE the calls: the session is shared across suites
      // and other suites' localCheckpoint RDDs are released by the
      // ContextCleaner asynchronously — this test owns only its own
      // delta, not the whole session's cache set
      val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      assert(Patterns.dedupAcrossBatches(b1, Seq("id"), state).count() === 2)
      val b2 = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
      val out2 = Patterns.dedupAcrossBatches(b2, Seq("id"), state)
      assert(out2.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(3L))
      // all-duplicate batch: empty fresh set round-trips through the state
      // store and the seen set is unchanged
      val b3 = Seq((1L, "a"), (3L, "c")).toDF("id", "v")
      assert(Patterns.dedupAcrossBatches(b3, Seq("id"), state).count() === 0)
      val b4 = Seq((4L, "d")).toDF("id", "v")
      assert(Patterns.dedupAcrossBatches(b4, Seq("id"), state)
        .select("id").head().getLong(0) === 4L)
      // no cached RDDs leaked by THESE calls (set delta, not emptiness)
      val leaked =
        spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
      assert(leaked.isEmpty, s"leaked caches: $leaked")
    }
  }

  test("incremental aggregation merges partials across batches") {
    withTmpDir { tmp =>
      val state = new JobState(s"$tmp/state", conf, spark)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      def merge(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.unionByName(b).groupBy("k").agg(sum("n").as("n"), sum("s").as("s"))
      val b1 = Seq(("x", 1L), ("x", 2L), ("y", 10L)).toDF("k", "v")
      Patterns.incrementalAgg(b1, state, "agg", partial, merge)
      val b2 = Seq(("x", 3L), ("z", 100L)).toDF("k", "v")
      val out = Patterns.incrementalAgg(b2, state, "agg", partial, merge)
        .orderBy("k").collect()
      assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq(("x", 3L, 6L), ("y", 1L, 10L), ("z", 1L, 100L)))
    }
  }
}
