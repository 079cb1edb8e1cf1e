package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.model.IngestConfig
import graft.stream.CdcIngestJob
import graft.wal.TranscriptWal

/** End-to-end Structured Streaming ingest: WAL dir tail → foreachBatch →
  * idempotent merge; checkpoint resume mid-stream; schema evolution
  * mid-stream. Mirrors SURVEY.md §7.2's minimum slice.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def workDirs(): (String, IngestConfig) = {
    val work = Files.createTempDirectory("stream").toString
    val conf = IngestConfig(
      tablePath = s"$work/table", checkpointPath = s"$work/cp",
      numBuckets = 8, enforceWatermark = false, maxFilesPerTrigger = 2)
    (s"$work/wal", conf)
  }

  private def writeWalFiles(walDir: String, parts: Seq[org.apache.spark.sql.DataFrame]): Unit =
    parts.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("append").parquet(walDir)
    }

  test("stream ingest applies a multi-file WAL and matches the batch oracle") {
    val (walDir, conf) = workDirs()
    val wal = TranscriptWal.synthetic(spark, 600, 10, deleteFraction = 0.1).cache()
    writeWalFiles(walDir, Seq(
      wal.where($"lsn" < 200), wal.where($"lsn" >= 200 && $"lsn" < 400),
      wal.where($"lsn" >= 400)))
    val q = CdcIngestJob.start(spark, walDir, conf)
    q.awaitTermination()

    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  test("kill and resume from checkpoint: no loss, no double-apply") {
    val (walDir, conf) = workDirs()
    val wal = TranscriptWal.synthetic(spark, 600, 10).cache()
    // phase 1: two files, run to completion (AvailableNow terminates)
    writeWalFiles(walDir, Seq(wal.where($"lsn" < 200),
      wal.where($"lsn" >= 200 && $"lsn" < 400)))
    val q1 = CdcIngestJob.start(spark, walDir, conf)
    q1.awaitTermination()
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    val midCount = t.read().count()

    // phase 2: two more files, resume from the same checkpoint
    writeWalFiles(walDir, Seq(wal.where($"lsn" >= 400 && $"lsn" < 500),
      wal.where($"lsn" >= 500)))
    val q2 = CdcIngestJob.start(spark, walDir, conf)
    q2.awaitTermination()

    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(t.read().count() >= midCount)
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)

    // phase 3: restart once more with NO new data — must be a no-op
    val v = t.latestVersion.get
    val q3 = CdcIngestJob.start(spark, walDir, conf)
    q3.awaitTermination()
    assert(t.latestVersion.get == v)
  }

  test("schema evolution mid-stream: tool column appears in later files") {
    val (walDir, conf) = workDirs()
    val v0 = TranscriptWal.synthetic(spark, 200, 5, withTool = false).drop("tool")
    v0.coalesce(1).write.mode("append").parquet(s"$walDir-v0")
    val q1 = CdcIngestJob.start(spark, s"$walDir-v0", conf, withTool = false)
    q1.awaitTermination()
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    assert(!t.read().columns.contains("tool"))

    // later stream (separate dir+checkpoint namespace) carries the new column
    val v1 = TranscriptWal.synthetic(spark, 100, 5, withTool = true,
      lsnOffset = 10000000L)
    v1.coalesce(1).write.mode("append").parquet(s"$walDir-v1")
    val conf2 = conf.copy(checkpointPath = conf.checkpointPath + "2")
    val q2 = CdcIngestJob.start(spark, s"$walDir-v1", conf2)
    q2.awaitTermination()
    assert(t.read().columns.contains("tool"))
    assert(t.read().where($"tool".isNotNull).count() > 0)
  }

  test("flatMapGroupsWithState carries conversation state across batches AND restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("state").toString
    val walDir = s"$work/wal"
    val wal = TranscriptWal.synthetic(spark, 400, 6, deleteFraction = 0.1).cache()
    val outDir = s"$work/out"

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(graft.model.Schemas.changeEvent)
        .option("maxFilesPerTrigger", 1).parquet(walDir)
      val q = graft.stream.StatefulTracker.track(stream).toDF()
        .writeStream
        .option("checkpointLocation", s"$work/cp")
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
    }

    // phase 1: two files, one per micro-batch → state must span batches
    wal.where($"lsn" < 150).coalesce(1).write.mode("append").parquet(walDir)
    wal.where($"lsn" >= 150 && $"lsn" < 300).coalesce(1).write.mode("append").parquet(walDir)
    runOnce()
    // phase 2: kill/resume — state store must survive the restart
    wal.where($"lsn" >= 300).coalesce(1).write.mode("append").parquet(walDir)
    runOnce()

    val updates = spark.read.parquet(outDir)
    // each conv's LAST update (max running total) must equal the batch truth
    val finalPerConv = updates.groupBy("conv_id")
      .agg(max("n_events").as("n_events"), max("n_deletes").as("n_deletes"),
        max("max_lsn").as("max_lsn"))
    val truth = wal.groupBy("conv_id").agg(
      count(lit(1)).as("n_events"),
      count(when($"op" === "D", 1)).as("n_deletes"),
      max("lsn").as("max_lsn"))
    assert(finalPerConv.exceptAll(truth).count() == 0 &&
      truth.exceptAll(finalPerConv).count() == 0)
    // state genuinely accumulated across >1 batch: some conv has an update
    // row with running total > its batch_events (i.e. carried prior state)
    assert(updates.where($"n_events" > $"batch_events").count() > 0)
  }

  test("watermark enforcement counts and drops late events (IngestMetrics)") {
    val work = Files.createTempDirectory("late").toString
    val conf = IngestConfig(
      tablePath = s"$work/table", checkpointPath = s"$work/cp",
      numBuckets = 8, enforceWatermark = true, watermarkDelay = "1 hour",
      maxFilesPerTrigger = 1)
    val walDir = s"$work/wal"
    // synthetic commit_ts = epoch + 2s*lsn: high-lsn file first establishes a
    // high-water mark; the low-lsn file is then ~11 days too old.
    val recent = TranscriptWal.synthetic(spark, 300, 5, lsnOffset = 500000L)
    val stale = TranscriptWal.synthetic(spark, 200, 5)
    recent.coalesce(1).write.mode("append").parquet(walDir)
    val (q1, m1) = CdcIngestJob.startWithMetrics(spark, walDir, conf)
    q1.awaitTermination()
    assert(m1.lateDrops == 0)

    stale.coalesce(1).write.mode("append").parquet(walDir)
    val (q2, m2) = CdcIngestJob.startWithMetrics(spark, walDir, conf)
    q2.awaitTermination()
    assert(m2.lateDrops == 200, s"expected all stale events counted, got ${m2.lateDrops}")
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    assert(t.readWithLsn().where($"_lsn" < 500000L).count() == 0,
      "late events must not reach the table")
  }

  test("streaming event-time session_window aggregates with watermark") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("sess").toString
    val wal = TranscriptWal.synthetic(spark, 400, 6).cache()
    wal.coalesce(1).write.mode("append").parquet(s"$work/wal")
    val outDir = s"$work/out"
    def runOnce(): Unit = {
      val q = spark.readStream.schema(graft.model.Schemas.changeEvent)
        .parquet(s"$work/wal")
        .withWatermark("ts", "1 hour")
        .groupBy($"conv_id", session_window($"ts", "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select($"conv_id", $"session_window.start".as("w_start"), $"n")
        .writeStream
        .option("checkpointLocation", s"$work/cp")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    // Append mode emits a session only once the WATERMARK passes its end —
    // a "flush" event 2h past everything advances it, and the state store
    // (restored from the checkpoint) emits all closed sessions on run 2.
    val maxTs = wal.agg(max($"ts")).collect()(0).getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 2 * 3600 * 1000L)
    Seq(("U", 99999999L, flushTs, "flushconv", 0, "user", "flush", null: String, flushTs))
      .toDF("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .coalesce(1).write.mode("append").parquet(s"$work/wal")
    runOnce()

    val got = spark.read.parquet(outDir)
    val expected = wal.groupBy($"conv_id", session_window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"conv_id", $"session_window.start".as("w_start"), $"n")
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "emitted sessions equal the batch session_window computation")
  }

  test("streaming WAL source counts corrupt records (warn-and-continue)") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("corrupt-stream").toString
    val walDir = s"$work/wal"
    val good = TranscriptWal.synthetic(spark, 120, 4).where($"lsn" < 100)
    val nGood = good.count()
    good.coalesce(1).write.mode("overwrite").json(walDir)
    val bad = Seq("{broken json", """{"op":"U"}""", """{"lsn":7}""")
    Files.write(java.nio.file.Paths.get(s"$walDir/zz-corrupt.json"),
      bad.mkString("\n").getBytes)

    val listener = new graft.stream.MetricsListener
    spark.streams.addListener(listener)
    try {
      val q = graft.wal.WalSource.readJsonStream(spark, walDir)
        .writeStream
        .queryName("ws_clean")
        .format("memory")
        .option("checkpointLocation", s"$work/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener events are async — give the bus a moment to drain
      def observedSum(field: String): Long = listener.batches
        .flatMap(_.observed.get("wal_source_stream"))
        .map(_.getOrElse(field, 0L).asInstanceOf[Long]).sum
      val deadline = System.nanoTime() + 10_000_000_000L
      while (observedSum("corrupt_records") < bad.size && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(observedSum("corrupt_records") == bad.size,
        s"planted ${bad.size} corrupt rows, observed ${observedSum("corrupt_records")}")
      assert(observedSum("clean_records") == nGood)
      assert(spark.table("ws_clean").count() == nGood,
        "clean rows pass through, corrupt rows are filtered")
    } finally spark.streams.removeListener(listener)
  }

  test("JSON WAL ingest end-to-end: corrupt rows counted, clean rows applied") {
    val work = Files.createTempDirectory("json-ingest").toString
    val conf = IngestConfig(tablePath = s"$work/table",
      checkpointPath = s"$work/cp", numBuckets = 8,
      enforceWatermark = false, walFormat = "json", maxFilesPerTrigger = 2)
    val wal = TranscriptWal.synthetic(spark, 400, 8, deleteFraction = 0.1).cache()
    wal.coalesce(2).write.mode("overwrite").json(s"$work/wal")
    Files.write(java.nio.file.Paths.get(s"$work/wal/zz-bad.json"),
      Seq("{oops", """{"op":"U"}""").mkString("\n").getBytes)

    val listener = CdcIngestJob.attachListener(spark)
    try {
      val (q, m) = CdcIngestJob.startWithMetrics(spark, s"$work/wal", conf)
      q.awaitTermination()
      assert(m.eventsApplied == wal.count())
      val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
      val got = t.read().select("conv_id", "turn_idx", "text")
      val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
      assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
      // the planted corrupt rows surface on the progress bus
      def corrupt: Long = listener.batches
        .flatMap(_.observed.get("wal_source_stream"))
        .map(_.getOrElse("corrupt_records", 0L).asInstanceOf[Long]).sum
      val deadline = System.nanoTime() + 10_000_000_000L
      while (corrupt < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(corrupt == 2, s"expected 2 corrupt rows observed, got $corrupt")
    } finally spark.streams.removeListener(listener)
  }

  test("duplicate WAL file content does not double-apply rows") {
    val (walDir, conf) = workDirs()
    val wal = TranscriptWal.synthetic(spark, 300, 5).cache()
    // same events written twice (at-least-once source) — dedup by (key,lsn)
    writeWalFiles(walDir, Seq(wal, wal))
    val q = CdcIngestJob.start(spark, walDir, conf)
    q.awaitTermination()
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  test("change-feed stream: readStream tails lake commits into a derived lake exactly-once") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("cdf").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4)
    val dst = new LakeTable(spark, s"$work/dst", numBuckets = 4)
    val wal = TranscriptWal.synthetic(spark, 600, 8, deleteFraction = 0.1).cache()
    src.merge(wal.where($"lsn" < 200), "t", 1)

    val feed = spark.readStream.format("graftlake").option("path", src.path)
      .option("startingVersion", "0").load()
    assert(feed.isStreaming && feed.columns.contains("_commit_version"))
    def apply(b: DataFrame, id: Long): Unit = {
      src.asInstanceOf[Any] // silence unused-capture warnings in closures
      dst.merge(b.withColumnRenamed("_lsn", "lsn")
        .withColumn("commit_ts", col("ts")).drop("_commit_version"), "cdf", id)
      ()
    }
    val q = feed.writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch(apply _)
      .start()
    q.processAllAvailable()
    // a LATER commit to the source lake flows through the live stream
    src.merge(wal.where($"lsn" >= 200 && $"lsn" < 400), "t", 2)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    def state(t: LakeTable) = t.read().select("conv_id", "turn_idx", "text")
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0)
    assert(state(dst).count() > 0)

    // restart from checkpoint: only the NEW commit replays (exactly-once)
    src.merge(wal.where($"lsn" >= 400), "t", 3)
    val applied = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = spark.readStream.format("graftlake").option("path", src.path)
      .option("startingVersion", "0").load()
      .writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        applied.addAndGet(b.count()) // count BEFORE merge consumes it
        apply(b, id)
      }
      .start()
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()
    assert(applied.get() == wal.where($"lsn" >= 400).count(),
      "restart replays only commit 3, not history")
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0)
    wal.unpersist()
  }

  test("change-feed stream survives additive schema evolution mid-stream") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("cdf-evo").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4)
    val wal = TranscriptWal.synthetic(spark, 300, 6).cache()
    src.merge(wal.drop("tool").where($"lsn" < 150), "t", 1) // pre-evolution
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("graftlake").option("path", src.path)
      .option("startingVersion", "0").load()
      .writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        assert(!b.columns.contains("tool"), "schema pinned at stream start")
        seen.addAndGet(b.count()); ()
      }
      .start()
    q.processAllAvailable()
    val afterFirst = seen.get()
    // the evolving commit (tool column appears) flows WITHOUT breaking the
    // running query — projected to the pinned schema until a restart
    src.merge(wal.where($"lsn" >= 150), "t", 2)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    assert(afterFirst > 0 && seen.get() == wal.count())
    // a restarted stream picks up the evolved schema for NEW commits
    val feed2 = spark.readStream.format("graftlake").option("path", src.path)
      .option("startingVersion", "0").load()
    assert(feed2.columns.contains("tool"))
    wal.unpersist()
  }

  test("follow mode tails the WAL dir across triggers and stops gracefully") {
    val (walDir, conf0) = workDirs()
    val conf = conf0.copy(followInterval = Some("150 milliseconds"))
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    val first = wal.where($"lsn" < 200)
    val second = wal.where($"lsn" >= 200)
    writeWalFiles(walDir, Seq(first))
    val q = CdcIngestJob.start(spark, walDir, conf)
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < deadline) {
        if (cond) return true
        Thread.sleep(100)
      }
      cond
    }
    assert(eventually(30000)(t.latestVersion.exists(_ >= 1)),
      "follow query applies the initial batch without stop/start")
    // a LATER file arrives while the query is live — the ProcessingTime
    // trigger must pick it up (AvailableNow would have exited already)
    writeWalFiles(walDir, Seq(second))
    assert(eventually(30000)(
      t.currentSnapshot.exists(_.metrics("total_events") == wal.count())),
      "follow trigger ingests files that arrive after start")
    q.stop() // graceful: in-flight epoch completes
    q.awaitTermination()
    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    // and AvailableNow semantics are unchanged: a catch-up run over the same
    // checkpoint applies nothing new and exits on its own
    val q2 = CdcIngestJob.start(spark, walDir, conf.copy(followInterval = None))
    q2.awaitTermination()
    assert(t.read().count() == got.count())
    wal.unpersist()
  }

  test("DSv2 change-feed stream: version offsets honor maxVersionsPerTrigger") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("mbs").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4,
      maxDeltasPerBucket = 1000)
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    (0 until 4).foreach(i =>
      src.merge(wal.where($"lsn" % 4 === i), "t", i.toLong)) // versions 1..4
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Set[Long])]()
    val q = spark.readStream.format("graftlake")
      .option("path", src.path)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val versions = b.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet
        batches.add((id, b.count(), versions)); ()
      }
      .start()
    q.awaitTermination()
    val seen = batches.toArray(Array.empty[(Long, Long, Set[Long])]).toSeq
    val nonEmpty = seen.filter(_._2 > 0)
    assert(nonEmpty.size == 4, s"one micro-batch per version: $seen")
    assert(nonEmpty.forall(_._3.size == 1), "admission bound: ≤1 version per batch")
    assert(nonEmpty.flatMap(_._3).toSet == Set(1L, 2L, 3L, 4L))
    assert(nonEmpty.map(_._2).sum == wal.count(), "every change row exactly once")
    wal.unpersist()
  }

  test("ingest survives concurrent compaction: commit races retry, never kill the query") {
    val (walDir, conf) = workDirs()
    val wal = TranscriptWal.synthetic(spark, 600, 10, deleteFraction = 0.1).cache()
    // many small files → many micro-batches (maxFilesPerTrigger=2) → many
    // commit windows for the maintenance thread to collide with
    writeWalFiles(walDir, (0 until 6).map(i =>
      wal.where($"lsn" % 6 === i)))
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    val q = CdcIngestJob.start(spark, walDir, conf)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val maint = new Thread(() => {
      while (!stop.get()) {
        try t.compactAll()
        catch {
          case _: graft.lake.CommitConflictException => () // lost race: fine
          case e: Throwable => maintErrors.add(e)
        }
        Thread.sleep(50)
      }
    })
    maint.start()
    try q.awaitTermination()
    finally { stop.set(true); maint.join() }
    assert(q.exception.isEmpty,
      s"a commit race must cost a retry, not the query: ${q.exception}")
    assert(maintErrors.isEmpty, s"maintenance failed: ${maintErrors.toArray.mkString(", ")}")
    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    wal.unpersist()
  }

  test("legacy hashed epoch namespace still suppresses a crash-replayed batch") {
    val (walDir, conf) = workDirs()
    val wal = TranscriptWal.synthetic(spark, 200, 5).cache()
    writeWalFiles(walDir, Seq(wal)) // ONE file ⇒ one micro-batch, batchId 0
    // simulate a pre-upgrade table: batch 0 already committed under the
    // old 32-bit-hashed checkpoint namespace
    val legacyNs = "cdc-" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(conf.checkpointPath).toLong & 0xffffffffL)
    val t = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    t.merge(wal, legacyNs, 0L)
    val rows = t.read().count()
    val v = t.latestVersion.get
    // the resumed stream replays batch 0 (fresh checkpoint dir, same id):
    // the legacy manifest entry must make it a metadata no-op
    val q = CdcIngestJob.start(spark, walDir, conf)
    q.awaitTermination()
    assert(t.latestVersion.get == v, "replayed batch must not commit again")
    assert(t.read().count() == rows)
    wal.unpersist()
  }

  test("change-feed `select` option narrows the stream schema (no pruning rule runs on streams)") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("cdf-sel").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 2)
    val wal = TranscriptWal.synthetic(spark, 200, 4).cache()
    src.merge(wal, "t", 1)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream.format("graftlake").option("path", src.path)
      .option("startingVersion", "0")
      .option("select", "conv_id,_lsn") // drops _commit_version too
      .load()
      .writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(b.columns.toSeq == Seq("conv_id", "_lsn"),
          s"narrowed schema expected, got ${b.columns.mkString(",")}")
        seen ++= b.collect().map(r => (r.getString(0), r.getLong(1))); ()
      }
      .start()
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    val exp = wal.select("conv_id", "lsn").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(seen.sorted.toSeq == exp, "same rows, fewer columns")
    // unknown column fails loudly at load
    val e = intercept[Exception] {
      spark.readStream.format("graftlake").option("path", src.path)
        .option("startingVersion", "0").option("select", "conv_id,nope").load()
    }
    assert(e.getMessage.contains("nope"))
    wal.unpersist()
  }

  test("streaming read without startingVersion: actionable error, not the capability error") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("cdf-noopt").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 2)
    val wal = TranscriptWal.synthetic(spark, 50, 2).cache()
    src.merge(wal, "t", 1)
    src.compactAll() // compacted = columnar-eligible: the build() path that
                     // previously had NO route to the helpful message
    // analysis passes (MICRO_BATCH_READ is advertised without the option)...
    val feed = spark.readStream.format("graftlake").option("path", src.path).load()
    assert(feed.isStreaming)
    // ...and the stream START surfaces the "pass startingVersion" guidance
    val err = intercept[Throwable] {
      val q = feed.writeStream
        .option("checkpointLocation", s"$work/cp")
        .trigger(Trigger.ProcessingTime("50 milliseconds"))
        .format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("startingVersion")),
      s"expected the actionable startingVersion message, got: ${messages(err).mkString(" | ")}")
    wal.unpersist()
  }

  test("catalog-backed streaming SINK clusters by bucket: O(buckets) delta files per epoch") {
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("sink-dist").toString
    spark.conf.set("spark.sql.catalog.gsink", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink.root", s"$work/lake")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsink.ns")
    spark.sql("CREATE TABLE gsink.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4)
    val wal = TranscriptWal.synthetic(spark, 400, 50).cache()
    src.merge(wal, "t", 1)
    // a deliberately many-partition stream: WITHOUT the write's declared
    // bucket clustering every task writes a file per bucket it sees
    // (~16 tasks × 4 buckets); the catalog-resolved bucket(4, conv_id)
    // distribution shuffles the batch once so each bucket lands in ONE task
    val q = spark.readStream.format("graftlake")
      .option("path", src.path).option("startingVersion", "0").load()
      .select("conv_id", "turn_idx", "text")
      .repartition(16)
      .writeStream
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.AvailableNow()).toTable("gsink.ns.t")
    q.awaitTermination()
    val t = LakeTable.open(spark, s"$work/lake/ns/t")
    val deltas = t.currentSnapshot.get.buckets.values.map(_.deltas.size).sum
    assert(deltas > 0 && deltas <= 4,
      s"clustered streaming write must land ≤1 delta file per bucket per epoch, got $deltas")
    assert(t.read().count() == src.read().count(),
      "clustering must not change sink semantics")
    wal.unpersist()
  }

  test("DSv2 streaming SINK: lake→lake via writeStream.format, restart no-dup") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = Files.createTempDirectory("sink").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4)
    val dst = new LakeTable(spark, s"$work/dst", numBuckets = 4)
    val wal = TranscriptWal.synthetic(spark, 600, 8, deleteFraction = 0.1).cache()
    src.merge(wal.where($"lsn" < 200), "t", 1)
    // the sink appends to an EXISTING table: declare dst's schema first
    // (the same empty schema-carrying merge CREATE TABLE performs)
    val envelope = StructType(
      StructField("op", StringType) +: StructField("lsn", LongType) +:
        StructField("commit_ts", TimestampType) +:
        src.currentSnapshot.get.schema.fields)
    dst.merge(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], envelope), "create", 0)

    def startSink() = spark.readStream.format("graftlake")
      .option("path", src.path).option("startingVersion", "0").load()
      .withColumnRenamed("_lsn", "lsn")
      .withColumn("commit_ts", col("ts"))
      .drop("_commit_version")
      .writeStream.format("graftlake")
      .option("path", dst.path)
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    val q = startSink()
    q.processAllAvailable()
    src.merge(wal.where($"lsn" >= 200 && $"lsn" < 400), "t", 2)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    def state(t: LakeTable) = t.read().select("conv_id", "turn_idx", "text")
    assert(state(dst).count() > 0)
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0,
      "sinked lake must equal the source lake's live state")

    // kill/resume: only commit 3 replays; total_events proves no double-apply
    src.merge(wal.where($"lsn" >= 400), "t", 3)
    val q2 = startSink()
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0)
    assert(dst.currentSnapshot.get.metrics("total_events") == wal.count(),
      "every source row applied EXACTLY once across restarts")
    // tombstones flowed as real deletes, not as live rows
    assert(wal.where($"op" === "D").count() > 0)
    wal.unpersist()
  }

  test("DSv2 streaming SINK: envelope-less stream gets synthesized upsert lsns") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = Files.createTempDirectory("sink-plain").toString
    val dst = new LakeTable(spark, s"$work/dst", numBuckets = 2)
    val payload = StructType(Seq(StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType), StructField("text", StringType)))
    val envelope = StructType(
      StructField("op", StringType) +: StructField("lsn", LongType) +:
        StructField("commit_ts", TimestampType) +: payload.fields)
    dst.merge(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], envelope), "create", 0)
    val in = s"$work/in"
    Seq(("a", 0, "v1"), ("b", 0, "v1")).toDF("conv_id", "turn_idx", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val q = spark.readStream.schema(payload)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("graftlake")
      .option("path", dst.path)
      .option("checkpointLocation", s"$work/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    q.processAllAvailable()
    // a later batch UPDATES key (a,0): its synthesized lsn (base+batch+1)
    // must beat batch 0's — last batch wins deterministically
    Seq(("a", 0, "v2"), ("c", 0, "v1")).toDF("conv_id", "turn_idx", "text")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val got = dst.read().select("conv_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "v2"), ("b", "v1"), ("c", "v1")))
  }
}
