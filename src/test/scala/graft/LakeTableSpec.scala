package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.wal.TranscriptWal

class LakeTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshTable(buckets: Int = 8) =
    new LakeTable(spark, Files.createTempDirectory("lake").toString, buckets)

  test("merge then read returns the arbitrated batch state") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 500, 10)
    t.merge(wal, "t", 1)
    val expected = TranscriptWal.expectedState(wal)
      .select("conv_id", "turn_idx", "role", "text", "tool")
    val got = t.read().select("conv_id", "turn_idx", "role", "text", "tool")
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0)
  }

  test("re-applying the same epoch is a no-op") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 200, 5)
    val r1 = t.merge(wal, "t", 1)
    val v1 = t.latestVersion.get
    val r2 = t.merge(wal, "t", 1)
    assert(r1.applied && !r2.applied)
    assert(t.latestVersion.get == v1)
  }

  test("equal-batch re-application with a NEW epoch id is still idempotent state-wise") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 200, 5)
    t.merge(wal, "t", 1)
    val before = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    t.merge(wal, "t", 2) // same rows, same lsns — LWW must not change state
    val after = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    assert(before == after)
  }

  test("stale (lower-lsn) events never overwrite newer state") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 300, 5)
    t.merge(wal, "t", 1)
    val stale = wal.withColumn("lsn", $"lsn" - 1000000L)
      .withColumn("text", lit("STALE"))
    t.merge(stale, "t", 2)
    assert(t.read().where($"text" === "STALE").count() == 0)
  }

  test("deletes remove rows; delete of a missing key is a no-op") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 300, 5)
    t.merge(wal, "t", 1)
    val n0 = t.read().count()
    val dels = wal.where($"turn_idx" === 1)
      .withColumn("op", lit("D")).withColumn("lsn", $"lsn" + 1000000L)
    val missing = Seq(("D", 9999999L, new java.sql.Timestamp(0), "ghost", 0,
      "user", "x", null: String, new java.sql.Timestamp(0)))
      .toDF("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    t.merge(dels.unionAll(missing), "t", 2)
    assert(t.read().where($"turn_idx" === 1).count() == 0)
    assert(t.read().where($"conv_id" === "ghost").count() == 0)
    assert(t.read().count() < n0)
  }

  test("copy-on-write: untouched bucket files survive unchanged across merges") {
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 800, 20)
    t.merge(wal, "t", 1)
    val s1 = t.currentSnapshot.get
    // Second merge touches exactly one conversation => one bucket.
    val one = wal.where($"conv_id" === "c3").withColumn("lsn", $"lsn" + 1000000L)
    val r = t.merge(one, "t", 2)
    val s2 = t.currentSnapshot.get
    assert(r.touchedBuckets == 1)
    val touched = s2.buckets.filter { case (b, fs) => s1.buckets.get(b) != Some(fs) }.keys
    assert(touched.size == 1)
    // untouched buckets: identical file lists (no rewrite)
    s1.buckets.keys.filterNot(touched.toSet).foreach { b =>
      assert(s2.buckets(b) == s1.buckets(b))
    }
  }

  test("additive schema evolution: new column appears, old rows read null") {
    val t = freshTable()
    val v0 = TranscriptWal.synthetic(spark, 200, 5, withTool = false).drop("tool")
    t.merge(v0, "t", 1)
    assert(!t.read().columns.contains("tool"))
    val v1 = TranscriptWal.synthetic(spark, 100, 5, withTool = true, lsnOffset = 10000000L)
    t.merge(v1, "t", 2)
    val cols = t.read().columns
    assert(cols.contains("tool"))
    // rows written before evolution read as null tool
    val oldRows = t.readWithLsn().where($"_lsn" < 10000000L)
    assert(oldRows.where($"tool".isNotNull).count() == 0)
  }

  test("batch splitting is merge-equivalent: k epochs == one epoch") {
    val wal = TranscriptWal.synthetic(spark, 600, 8, deleteFraction = 0.1)
    val whole = freshTable(); whole.merge(wal, "t", 1)
    val split = freshTable()
    // three deterministic slices by lsn ranges, applied in order
    split.merge(wal.where($"lsn" < 200), "t", 1)
    split.merge(wal.where($"lsn" >= 200 && $"lsn" < 400), "t", 2)
    split.merge(wal.where($"lsn" >= 400), "t", 3)
    val a = whole.read().select("conv_id", "turn_idx", "text")
    val b = split.read().select("conv_id", "turn_idx", "text")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("out-of-order batch application converges to the same state") {
    val wal = TranscriptWal.synthetic(spark, 600, 8)
    val inOrder = freshTable()
    inOrder.merge(wal.where($"lsn" < 300), "t", 1)
    inOrder.merge(wal.where($"lsn" >= 300), "t", 2)
    val reversed = freshTable()
    reversed.merge(wal.where($"lsn" >= 300), "t", 1)
    reversed.merge(wal.where($"lsn" < 300), "t", 2)
    val a = inOrder.read().select("conv_id", "turn_idx", "text")
    val b = reversed.read().select("conv_id", "turn_idx", "text")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("per-bucket MOR: dirty read windows ONLY the deltas; base broadcast-joins, never shuffles") {
    import org.apache.spark.sql.catalyst.plans.logical.{Union, Window => LWindow}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val t = freshTable(buckets = 8)
    t.merge(TranscriptWal.synthetic(spark, 800, 20), "t", 1)
    t.compactAll() // all buckets clean
    val one = TranscriptWal.synthetic(spark, 800, 20)
      .where($"conv_id" === "c3").withColumn("lsn", $"lsn" + 1000000L)
    val r = t.merge(one, "t", 2)
    assert(r.touchedBuckets == 1)
    val snap = t.currentSnapshot.get
    val deltaFiles = snap.buckets.values.flatMap(_.deltas).toSet
    assert(deltaFiles.nonEmpty)
    val lp = t.read().queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.size == 1, "exactly one arbitration window")
    assert(lp.collect { case u: Union => u }.nonEmpty, "clean ∪ dirty union")
    // the ONLY shuffled+sorted rows are the DELTA rows: the window subtree
    // scans exactly the delta files — base bytes reach the result through a
    // broadcast join, with zero exchange (the 100 TB steady-ingest shape)
    val windowFiles = windows.head.collect {
      case LogicalRelation(rel: HadoopFsRelation, _, _, _, _) => rel.location.inputFiles.toSeq
    }.flatten.map(f => f.substring(f.indexOf("data/"))).toSet
    assert(windowFiles == deltaFiles,
      s"window must cover ONLY delta files, saw ${windowFiles.size} vs ${deltaFiles.size}")
    val pp = t.read().queryExecution.executedPlan.toString
    assert(pp.contains("BroadcastHashJoin"), "base arbitration is a broadcast join")
    assert(!pp.contains("SortMergeJoin"), "no base-side shuffle join")
    // and correctness is unchanged
    val expect = TranscriptWal.expectedState(
      TranscriptWal.synthetic(spark, 800, 20).unionAll(one))
      .select("conv_id", "turn_idx", "text")
    val got = t.read().select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)
  }

  test("MOR broadcast arbitration ≡ window arbitration (fallback) across update/delete/new-key/evolution") {
    val t = freshTable(buckets = 4)
    val wal = TranscriptWal.synthetic(spark, 400, 10).cache()
    t.merge(wal, "t", 1)
    t.compactAll()
    // updates to existing keys + deletes + BRAND-NEW keys, all as deltas
    val updates = wal.where($"turn_idx" === 1)
      .withColumn("lsn", $"lsn" + 500000L)
      .withColumn("text", concat(lit("edited:"), $"text"))
    val deletes = wal.where($"turn_idx" === 2)
      .withColumn("lsn", $"lsn" + 600000L).withColumn("op", lit("D"))
    val newKeys = wal.where($"turn_idx" === 0)
      .withColumn("conv_id", concat(lit("new_"), $"conv_id"))
      .withColumn("lsn", $"lsn" + 700000L)
    t.merge(updates.unionByName(deletes).unionByName(newKeys), "t", 2)
    // additive evolution mid-stream: a delta carrying a column bases lack
    val evolved = wal.where($"turn_idx" === 3)
      .withColumn("lsn", $"lsn" + 800000L)
      .withColumn("review", concat(lit("r:"), $"conv_id"))
    t.merge(evolved, "t", 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("conv_id", "turn_idx", "text", "review")
    val joined = rows(t.read()).collect().toSet
    assert(joined.nonEmpty)
    // threshold 0 forces the proven window fallback — results must be identical
    spark.conf.set("spark.graft.mor.deltaBroadcastBytes", "0")
    try {
      val pp = t.read().queryExecution.executedPlan.toString
      assert(!pp.contains("BroadcastHashJoin"), "fallback must not broadcast")
      assert(rows(t.read()).collect().toSet == joined)
    } finally spark.conf.unset("spark.graft.mor.deltaBroadcastBytes")
    // new keys actually came through the anti-join leg
    assert(t.read().where($"conv_id".startsWith("new_")).count() > 0)
    wal.unpersist()
  }

  test("MOR arbitration: a LATER-COMMITTED delta with a LOWER lsn loses to the compacted row") {
    // lsns arbitrate, not commit order: two sources writing the same key
    // resolve by lsn even when the lower-lsn write commits later — the
    // broadcast pick must COMPARE lsns, never blanket-prefer the delta
    val t = freshTable(buckets = 2)
    val row = Seq(("c1", 0, "assistant", "winner", null: String, 100L))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "lsn")
      .withColumn("op", lit("U"))
      .withColumn("commit_ts", timestamp_micros(lit(1000L)))
    t.merge(row, "a", 1)
    t.compactAll() // lsn=100 row is now the BASE
    val late = row.withColumn("lsn", lit(50L)).withColumn("text", lit("loser"))
    t.merge(late, "b", 1) // other namespace, later commit, LOWER lsn
    assert(t.currentSnapshot.get.buckets.values.exists(_.deltas.nonEmpty))
    val got = t.read().where($"conv_id" === "c1").select("text")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("winner"), s"base lsn=100 must beat delta lsn=50, got $got")
  }

  test("compacted bases are KEY-SORTED inside each file (row-group/page pruning contract)") {
    val t = freshTable(buckets = 2)
    t.merge(TranscriptWal.synthetic(spark, 2000, 40), "t", 1)
    t.compactAll()
    val base = t.currentSnapshot.get.buckets.values.flatMap(_.base)
    assert(base.nonEmpty)
    base.foreach { f =>
      // one small file = one scan partition: collect preserves file order
      val rows = spark.read.parquet(s"${t.path}/$f")
        .select("conv_id", "turn_idx").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(rows == rows.sorted,
        s"base file $f must be (conv_id, turn_idx)-sorted so parquet " +
          "row-group and column-index stats prune keyed reads inside a bucket")
    }
  }

  test("compaction cadence counts delta EPOCHS, not salted files") {
    // AQE off so the salted write really lands multiple files per bucket per
    // epoch (AQE coalesces these tiny test batches to one partition), and
    // the size-adaptive salt pinned ON (tiny test batches would drop it).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.graft.write.saltMinBytes", "0")
    try {
      val t = freshTable(buckets = 4) // maxDeltasPerBucket = 4
      t.merge(TranscriptWal.synthetic(spark, 1000, 16), "t", 1)
      t.compactAll()
      // 4 touch-all epochs: salted writes land >1 file per bucket per epoch,
      // but no bucket may compact before its 5th delta EPOCH.
      val results = (2 to 5).map { e =>
        t.merge(TranscriptWal.synthetic(spark, 200, 16, lsnOffset = e * 1000000L), "t", e)
      }
      assert(results.forall(_.compactedBuckets == 0),
        s"epoch-counted cadence must not compact within $results")
      val filesPerBucket = t.currentSnapshot.get.buckets.values.map(_.deltas.size)
      assert(filesPerBucket.exists(_ > 4), "salting produced more files than epochs")
      // 5th delta epoch crosses the bound → compaction fires, state stays right
      val r6 = t.merge(TranscriptWal.synthetic(spark, 200, 16, lsnOffset = 9000000L), "t", 6)
      assert(r6.compactedBuckets > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.graft.write.saltMinBytes")
    }
  }

  test("vacuum removes superseded files and orphans; read unchanged") {
    val t = freshTable(buckets = 4)
    val wal = TranscriptWal.synthetic(spark, 1000, 10)
    t.merge(wal, "t", 1)
    (2 to 8).foreach { e =>
      t.merge(TranscriptWal.synthetic(spark, 300, 10, lsnOffset = e * 1000000L), "t", e)
    }
    t.compactAll() // supersedes every delta
    val root = java.nio.file.Paths.get(t.path)
    // plant an orphan from a LOST COMMIT RACE: its epoch dir encodes a
    // version the winner has already committed (≤ latest) — eligible for GC.
    // (A FUTURE-version dir would be an in-flight writer and is protected —
    // covered by the dedicated vacuum-vs-writer race test.)
    val orphanDir = root.resolve("data/e0000000002-deadbeef/b=0")
    Files.createDirectories(orphanDir)
    Files.writeString(orphanDir.resolve("part-orphan.parquet"), "junk")
    val before = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    def countFiles() = {
      val s = java.nio.file.Files.walk(root.resolve("data"))
      try s.filter(p => java.nio.file.Files.isRegularFile(p)).count()
      finally s.close()
    }
    val nBefore = countFiles()
    val (snapsGone, filesGone) = t.vacuum(keepSnapshots = 1)
    assert(filesGone > 0 && snapsGone > 0)
    assert(countFiles() < nBefore)
    // every surviving file is referenced by the latest snapshot
    val referenced = t.currentSnapshot.get.buckets.values.flatMap(_.allFiles).toSet
    val s2 = java.nio.file.Files.walk(root.resolve("data"))
    val remaining = try {
      import scala.jdk.CollectionConverters._
      s2.iterator().asScala.filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => root.relativize(p).toString.replace('\\', '/')).toSet
    } finally s2.close()
    assert(remaining == referenced)
    val after = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    assert(after == before)
  }

  test("readConv bucket hash agrees with the writer expression for many ids") {
    val ids = (0 until 200).map(i => s"c$i") ++ Seq("hot", "", "日本語", "a b c")
    val viaSpark = ids.toDF("conv_id")
      .select($"conv_id", pmod(xxhash64($"conv_id"), lit(64)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(LakeTable.bucketOf(id, 64) == viaSpark(id), s"mismatch for '$id'")
    }
  }

  test("tombstone GC: compaction under an lsn horizon drops dead tombstones") {
    val t = freshTable(buckets = 4)
    val wal = TranscriptWal.synthetic(spark, 500, 8, deleteFraction = 0.2)
    t.merge(wal, "t", 1)
    val before = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    def tombstones(): Long = {
      val s = t.currentSnapshot.get
      val files = s.buckets.values.flatMap(_.allFiles).toSeq
      spark.read.parquet(files.map(f => s"${t.path}/$f"): _*)
        .where($"op" === "D").count()
    }
    t.compactAll() // retention default: tombstones survive compaction
    assert(tombstones() > 0)
    // horizon above every seen lsn: all winning tombstones are GC-able
    t.compactAll(dropTombstonesBelowLsn = Some(10000000L))
    assert(tombstones() == 0)
    val after = t.read().orderBy("conv_id", "turn_idx").collect().toSeq
    assert(after == before, "live state unchanged by tombstone GC")
    // a later higher-lsn upsert recreates a deleted key normally
    val revive = wal.where($"op" === "D").limit(1)
      .withColumn("op", lit("U")).withColumn("lsn", $"lsn" + 20000000L)
      .withColumn("text", lit("revived"))
    t.merge(revive, "t", 2)
    assert(t.read().where($"text" === "revived").count() == 1)
  }

  test("bucket-count mismatch is rejected; rebucket() migrates correctly") {
    val path = Files.createTempDirectory("lake").toString
    val t16 = new LakeTable(spark, path, numBuckets = 16)
    val wal = TranscriptWal.synthetic(spark, 600, 12, deleteFraction = 0.1)
    t16.merge(wal, "t", 1)
    val before = t16.read().orderBy("conv_id", "turn_idx").collect().toSeq

    // opening with a different bucket count must fail loudly, not mis-bucket
    val wrong = new LakeTable(spark, path, numBuckets = 8)
    intercept[IllegalArgumentException] { wrong.read().collect() }
    intercept[IllegalArgumentException] { wrong.merge(wal, "t", 2) }

    // migration: same state, new layout, point lookups use the new hash
    val t4 = t16.rebucket(Files.createTempDirectory("lake4").toString, 4)
    val after = t4.read().orderBy("conv_id", "turn_idx").collect().toSeq
    assert(after == before)
    assert(t4.currentSnapshot.get.numBuckets == 4)
    val conv = before.head.getString(0)
    val pruned = t4.readConv(conv).select("conv_id", "turn_idx").collect().toSet
    val full = t4.read().where($"conv_id" === conv)
      .select("conv_id", "turn_idx").collect().toSet
    assert(pruned == full && pruned.nonEmpty)
    // later-lsn writes continue normally on the migrated table
    val more = wal.where($"op" =!= "D").limit(5)
      .withColumn("lsn", $"lsn" + 1000000L).withColumn("text", lit("post-migration"))
    t4.merge(more, "m", 1)
    assert(t4.read().where($"text" === "post-migration").count() == 5)
  }

  test("salted writes spread a hot conversation across writer tasks") {
    // 90% of events hit ONE conversation = one bucket. Without salt the
    // bucket's delta is written by a single task; with salt=4 the shuffle
    // key (b, salt) fans it out — visible as multiple files for that bucket
    // from one epoch. Structural evidence (file counts), not flaky timings.
    spark.conf.set("spark.sql.adaptive.enabled", "false") // no small-batch coalesce
    spark.conf.set("spark.graft.write.saltMinBytes", "0") // pin adaptive salt ON
    try {
      val hotWal = TranscriptWal.synthetic(spark, 4000, 4, hotConvShare = 0.9)
      def hotFiles(salt: Int): Int = {
        val t = new LakeTable(spark,
          Files.createTempDirectory("skew").toString, numBuckets = 8,
          writeSalt = salt)
        t.merge(hotWal, "t", 1)
        val hotBucket = LakeTable.bucketOf("hot", 8)
        t.currentSnapshot.get.buckets(hotBucket).deltas.size
      }
      assert(hotFiles(salt = 1) == 1, "unsalted: hot bucket = one writer task")
      assert(hotFiles(salt = 4) >= 3, "salted: hot bucket spread across tasks")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.graft.write.saltMinBytes")
    }
  }

  test("snapshot publish is CAS: same-version double-commit raises, winner intact") {
    val t = freshTable()
    t.merge(TranscriptWal.synthetic(spark, 100, 4), "t", 1)
    val s = t.currentSnapshot.get
    // two writers that both computed version N+1: first publish wins…
    val winner = s.copy(version = s.version + 1,
      metrics = s.metrics + ("winner" -> 1L))
    t.writeSnapshot(winner)
    // …second MUST fail loudly (never a silent rename-over)
    val loser = s.copy(version = s.version + 1,
      metrics = s.metrics + ("winner" -> 2L))
    intercept[graft.lake.CommitConflictException] { t.writeSnapshot(loser) }
    assert(t.currentSnapshot.get.metrics("winner") == 1L, "winner's commit intact")
  }

  test("two concurrent writers with retry-on-conflict lose no commit") {
    val path = Files.createTempDirectory("lake").toString
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def writer(ns: String): Runnable = () => {
      val t = new LakeTable(spark, path, numBuckets = 8)
      start.await()
      (1 to 4).foreach { e =>
        val batch = TranscriptWal.synthetic(spark, 50, 3, lsnOffset = e * 100000L)
          .withColumn("conv_id", concat(lit(ns + "-"), $"conv_id"))
        t.mergeWithRetry(batch, ns, e) // retry exhaustion propagates → test fails
      }
    }
    val f1 = pool.submit(writer("w1")); val f2 = pool.submit(writer("w2"))
    start.countDown()
    f1.get(300, TimeUnit.SECONDS); f2.get(300, TimeUnit.SECONDS)
    pool.shutdown()
    val t = new LakeTable(spark, path, numBuckets = 8)
    val snap = t.currentSnapshot.get
    // every epoch of BOTH writers committed — no silent clobber
    assert(snap.committedEpochs.get("w1").contains(4L))
    assert(snap.committedEpochs.get("w2").contains(4L))
    assert(t.read().where($"conv_id".startsWith("w1-")).count() > 0)
    assert(t.read().where($"conv_id".startsWith("w2-")).count() > 0)
    // version log is gapless despite any conflicts
    assert(snap.version == 8L)
  }

  test("legacy highWaterMillis snapshots open via the micros fallback") {
    val t = freshTable()
    t.merge(TranscriptWal.synthetic(spark, 100, 4), "t", 1)
    val hwMicros = t.currentSnapshot.get.highWaterMicros
    assert(hwMicros > 0)
    val snapFile = java.nio.file.Paths.get(t.path, "snapshots")
    val latest = Files.list(snapFile).iterator().next()
    val legacy = Files.readString(latest)
      .replace("\"highWaterMicros\" : " + hwMicros,
        "\"highWaterMillis\" : " + (hwMicros / 1000L))
    Files.writeString(latest, legacy)
    val reopened = LakeTable.open(spark, t.path)
    assert(reopened.currentSnapshot.get.highWaterMicros == (hwMicros / 1000L) * 1000L)
  }

  test("table files are written with the configured codec (zstd default)") {
    val t = freshTable()
    t.merge(TranscriptWal.synthetic(spark, 200, 5), "t", 1)
    val files = t.currentSnapshot.get.buckets.values.flatMap(_.allFiles)
    assert(files.nonEmpty && files.forall(_.endsWith(".zstd.parquet")))
    t.compactAll()
    val compacted = t.currentSnapshot.get.buckets.values.flatMap(_.allFiles)
    assert(compacted.forall(_.endsWith(".zstd.parquet")))
  }

  test("asView registers the MOR state for SQL access") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 300, 6)
    t.merge(wal, "t", 1)
    t.asView("graft_state")
    val viaSql = spark.sql(
      "SELECT conv_id, count(*) AS n FROM graft_state GROUP BY conv_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = t.read().groupBy("conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("multi-key lookup arbitrates only the dirty bucket's rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 800, 20)
    t.merge(wal, "t", 1)
    t.compactAll()
    // dirty exactly one conversation's bucket
    val delta = wal.where($"conv_id" === "c3").withColumn("lsn", $"lsn" + 1000000L)
      .withColumn("text", lit("dirtied"))
    t.merge(delta, "t", 2)
    // pick a second key living in a CLEAN bucket
    val cleanKey = (0 until 20).map(i => s"c$i").find(c =>
      c != "c3" && LakeTable.bucketOf(c, 8) != LakeTable.bucketOf("c3", 8)).get
    val snap = t.currentSnapshot.get
    val dirtyFiles = snap.buckets.values.filter(_.deltas.nonEmpty)
      .flatMap(_.allFiles).toSet
    val lookup = t.readConvs(Seq("c3", cleanKey))
    val lp = lookup.queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.size == 1)
    val windowFiles = windows.head.collect {
      case LogicalRelation(rel: HadoopFsRelation, _, _, _, _) => rel.location.inputFiles.toSeq
    }.flatten.map(f => f.substring(f.indexOf("data/"))).toSet
    assert(windowFiles == dirtyFiles, "window scoped to the dirty bucket only")
    // correctness: equals the filtered full read
    val expect = t.read().where($"conv_id".isin("c3", cleanKey))
      .collect().map(_.toString).sorted.toSeq
    val got = lookup.collect().map(_.toString).sorted.toSeq
    assert(got == expect && got.nonEmpty)
  }

  test("BucketPrune: read().where(conv_id = 'x') scans only that key's bucket") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 1200, 20)
    t.merge(wal, "t", 1)
    t.compactAll()
    // a delta so BOTH branches (clean fast path + dirty window) exist
    t.merge(wal.where($"conv_id" === "c7").withColumn("lsn", $"lsn" + 1000000L), "t", 2)

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case LogicalRelation(rel: HadoopFsRelation, _, _, _, _) =>
          rel.location.inputFiles.toSeq
      }.flatten.map(f => f.substring(f.indexOf("data/"))).toSet

    val allFiles = scannedFiles(t.read())
    val keyBucket = LakeTable.bucketOf("c3", 8)
    val expectFiles = t.currentSnapshot.get.buckets(keyBucket).allFiles.toSet

    // plain DataFrame filter — no bespoke lookup API — prunes to one bucket
    val q = t.read().where($"conv_id" === "c3")
    assert(scannedFiles(q) == expectFiles, "scan restricted to c3's bucket")
    assert(expectFiles.size < allFiles.size)
    // IN-lists prune to the union of the keys' buckets
    val q2 = t.read().where($"conv_id".isin("c3", "c7"))
    val expect2 = Set("c3", "c7").map(LakeTable.bucketOf(_, 8))
      .flatMap(b => t.currentSnapshot.get.buckets(b).allFiles)
    assert(scannedFiles(q2) == expect2)
    // keyed lookup on the DIRTY key: the broadcast arbitration sides (delta
    // aggregate/window, beaten-key scan) prune too — still a ONE-bucket read
    val qd = t.read().where($"conv_id" === "c7")
    val dirtyBucket = LakeTable.bucketOf("c7", 8)
    assert(scannedFiles(qd) ==
      t.currentSnapshot.get.buckets(dirtyBucket).allFiles.toSet,
      "dirty-key lookup must stay a one-bucket read under the join shape")
    val viaFilterD = qd.collect().map(_.toString).sorted.toSeq
    val viaApiD = t.readConv("c7").collect().map(_.toString).sorted.toSeq
    assert(viaFilterD == viaApiD && viaFilterD.nonEmpty)
    // correctness unchanged vs. the unpruned plan and the bespoke API
    val viaFilter = q.collect().map(_.toString).sorted.toSeq
    val viaApi = t.readConv("c3").collect().map(_.toString).sorted.toSeq
    assert(viaFilter == viaApi && viaFilter.nonEmpty)
    // non-literal / disjunctive predicates are untouched (no wrong pruning)
    val qOr = t.read().where($"conv_id" === "c3" || $"turn_idx" === 0)
    assert(scannedFiles(qOr) == allFiles)
    assert(qOr.count() == t.read().where($"conv_id" === "c3" || $"turn_idx" === 0)
      .collect().length)
  }

  test("time travel: readAsOf returns each retained version's exact state") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 600, 10, deleteFraction = 0.1).cache()
    val b1 = wal.where($"lsn" < 300); val b2 = wal.where($"lsn" >= 300)
    t.merge(b1, "t", 1)
    t.merge(b2, "t", 2)
    val v1 = t.readAsOf(1).select("conv_id", "turn_idx", "text")
    val e1 = TranscriptWal.expectedState(b1).select("conv_id", "turn_idx", "text")
    assert(v1.exceptAll(e1).count() == 0 && e1.exceptAll(v1).count() == 0)
    val v2 = t.readAsOf(2).select("conv_id", "turn_idx", "text")
    val now = t.read().select("conv_id", "turn_idx", "text")
    assert(v2.exceptAll(now).count() == 0 && now.exceptAll(v2).count() == 0)
    intercept[IllegalArgumentException] { t.readAsOf(99) }
  }

  test("changesSince: incremental feed replays to the current state") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 900, 10, deleteFraction = 0.1).cache()
    val parts = Seq(wal.where($"lsn" < 200),
      wal.where($"lsn" >= 200 && $"lsn" < 500), wal.where($"lsn" >= 500))
    parts.zipWithIndex.foreach { case (b, i) => t.merge(b, "t", i + 1) }
    // feed after v1 = exactly the raw rows of commits 2 and 3
    val feed = t.changesSince(1)
    assert(feed.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    val feedRows = feed.select($"conv_id", $"turn_idx", $"op", $"_lsn".as("lsn"))
    val expRows = parts(1).unionAll(parts(2))
      .select("conv_id", "turn_idx", "op", "lsn")
    assert(feedRows.exceptAll(expRows).count() == 0 &&
      expRows.exceptAll(feedRows).count() == 0)
    // a consumer holding v1 state applies the feed and lands on current state
    val t2 = freshTable()
    t2.merge(parts(0), "c", 1)
    val batch = feed.drop("_commit_version")
      .withColumnRenamed("_lsn", "lsn")
      .withColumn("commit_ts", $"ts")
    t2.merge(batch, "c", 2)
    val a = t.read().select("conv_id", "turn_idx", "text")
    val b = t2.read().select("conv_id", "turn_idx", "text")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // compaction adds no phantom changes; vacuumed history fails loudly
    t.compactAll()
    val afterCompact = t.changesSince(1)
      .select($"conv_id", $"turn_idx", $"op", $"_lsn".as("lsn"))
    assert(afterCompact.exceptAll(expRows).count() == 0 &&
      expRows.exceptAll(afterCompact).count() == 0)
    t.vacuum(keepSnapshots = 1)
    intercept[IllegalArgumentException] { t.changesSince(1).count() }
  }

  test("graftlake data source: format/SQL surface with pruned lookups") {
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 600, 12).cache()
    val b1 = wal.where($"lsn" < 300); val b2 = wal.where($"lsn" >= 300)
    t.merge(b1, "t", 1); t.merge(b2, "t", 2)

    val viaFormat = spark.read.format("graftlake").load(t.path)
    assert(viaFormat.count() == t.read().count())
    // literal conv_id filter routes through the bucket-pruned lookup
    val one = viaFormat.where($"conv_id" === "c3").select("conv_id", "turn_idx")
    val exp = t.readConv("c3").select("conv_id", "turn_idx")
    assert(one.exceptAll(exp).count() == 0 && exp.exceptAll(one).count() == 0)

    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW lake_sql " +
      s"USING graftlake OPTIONS (path '${t.path}')")
    assert(spark.sql("SELECT count(*) FROM lake_sql").collect()(0).getLong(0) ==
      t.read().count())
    assert(spark.sql("SELECT count(DISTINCT conv_id) FROM lake_sql WHERE conv_id IN ('c1','c2')")
      .collect()(0).getLong(0) == 2)

    // time travel + change feed through options
    val asOf = spark.read.format("graftlake")
      .option("asOfVersion", "1").load(t.path)
    assert(asOf.count() == t.readAsOf(1).count())
    val feed = spark.read.format("graftlake")
      .option("changesSince", "1").load(t.path)
    assert(feed.count() == b2.count())
    assert(feed.columns.contains("_commit_version"))

    // time travel ACROSS schema evolution: v1 predates the evolved column,
    // so the source must expose v1's narrower schema, not the current one
    val t2 = freshTable()
    t2.merge(wal.drop("tool").where($"lsn" < 300), "t", 1)
    t2.merge(wal.where($"lsn" >= 300), "t", 2)
    assert(spark.read.format("graftlake").load(t2.path).columns.contains("tool"))
    val old = spark.read.format("graftlake").option("asOfVersion", "1").load(t2.path)
    assert(!old.columns.contains("tool"))
    assert(old.count() == t2.readAsOf(1).count() && old.count() > 0)
  }

  test("history() reports retained commits newest-first with lineage") {
    val t = freshTable(buckets = 4)
    t.merge(TranscriptWal.synthetic(spark, 300, 6, deleteFraction = 0.1), "t", 1)
    t.merge(TranscriptWal.synthetic(spark, 100, 6, seed = 9L,
      lsnOffset = 1000000L), "t", 2)
    t.compactAll()
    val h = t.history().collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L), "newest first")
    val v2 = h.find(_.getLong(0) == 2L).get
    assert(v2.getAs[Long]("last_events") == 100L)
    assert(v2.getAs[Long]("total_events") == 400L)
    val v3 = h.find(_.getLong(0) == 3L).get
    assert(v3.getAs[Long]("n_change_files") == 0L, "compaction adds no changes")
    t.vacuum(keepSnapshots = 1)
    assert(t.history().collect().map(_.getLong(0)).toSeq == Seq(3L),
      "history is bounded by retention")
  }

  test("lineage metrics accumulate in snapshots") {
    val t = freshTable()
    val wal = TranscriptWal.synthetic(spark, 200, 5, deleteFraction = 0.2)
    val r = t.merge(wal, "t", 1)
    val snap = t.currentSnapshot.get
    assert(snap.metrics("last_events") == r.events)
    assert(snap.metrics("last_deletes") == r.deletes)
    assert(r.events == r.upserts + r.deletes)
    assert(snap.metrics("total_events") == r.events)
  }

  test("changesSince survives inline compaction of its own commit") {
    // maxDeltasPerBucket=1 + few convs ⇒ merges regularly trip INLINE
    // compaction, which folds the just-written deltas into a new base within
    // the same snapshot. The change manifest must still serve those rows —
    // a state diff would return nothing for that commit (lost tombstones ⇒
    // downstream resurrection).
    val t = new LakeTable(spark, Files.createTempDirectory("lake").toString,
      numBuckets = 2, maxDeltasPerBucket = 1)
    val batches = (1 to 5).map { i =>
      i -> TranscriptWal.synthetic(spark, 150, 3, deleteFraction = 0.2,
        lsnOffset = i * 1000000L).cache()
    }
    var sawInlineCompaction = false
    batches.foreach { case (i, b) =>
      val r = t.merge(b, "t", i)
      if (r.compactedBuckets > 0) sawInlineCompaction = true
      val feed = t.changesSince(r.version - 1)
        .select($"conv_id", $"turn_idx", $"op", $"_lsn".as("lsn"))
      val exp = b.select("conv_id", "turn_idx", "op", "lsn")
      assert(feed.exceptAll(exp).count() == 0 && exp.exceptAll(feed).count() == 0,
        s"commit $i changed rows lost from the feed (compacted=${r.compactedBuckets})")
    }
    assert(sawInlineCompaction, "fixture must actually trip inline compaction")
    // tombstones specifically survive into the feed
    assert(t.changesSince(0).where($"op" === "D").count() > 0)
    batches.foreach(_._2.unpersist())
  }

  test("changesSince plan stays O(1) scans over a deep commit history") {
    val t = freshTable(buckets = 2)
    val n = 55
    (1 to n).foreach { i =>
      t.merge(TranscriptWal.synthetic(spark, 8, 2, lsnOffset = i * 1000L), "t", i)
    }
    val feed = t.changesSince(0)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = feed.queryExecution.optimizedPlan.collect {
      case LogicalRelation(_: HadoopFsRelation, _, _, _, _) => 1
    }.sum
    assert(scans == 1, s"deep catch-up must plan ONE scan, got $scans")
    assert(feed.count() == n * 8L)
    val versions = feed.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(versions == (1L to n.toLong).toSet,
      "commit versions recovered from file paths for every commit")
  }

  test("vacuum retains by AGE: retain_age_ms keeps recent snapshots beyond the count floor") {
    val t = freshTable(buckets = 2)
    val wal = TranscriptWal.synthetic(spark, 200, 4).cache()
    (0 until 4).foreach(i =>
      t.merge(wal.where($"lsn" % 4 === i), "t", i.toLong))
    assert(t.latestVersion.get == 4L)
    // keep=1, but all four versions committed within the hour: age wins
    val (aged, _) = t.vacuum(keepSnapshots = 1, retainAgeMs = Some(3600L * 1000))
    assert(aged == 0, "age retention must keep every recent snapshot")
    assert(t.readAsOf(1).count() > 0, "v1 still time-travelable")
    // without the age clause the count floor applies as before
    val (counted, _) = t.vacuum(keepSnapshots = 1)
    assert(counted == 3)
    intercept[Exception] { t.readAsOf(1) }
    assert(t.read().count() > 0)
    wal.unpersist()
  }

  test("vacuum never deletes an in-flight writer's files; lost racers age out") {
    val t = freshTable(buckets = 4)
    t.merge(TranscriptWal.synthetic(spark, 400, 8), "t", 1)
    t.merge(TranscriptWal.synthetic(spark, 400, 8, lsnOffset = 1000000L), "t", 2)
    val root = java.nio.file.Paths.get(t.path)
    def plant(rel: String): java.nio.file.Path = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, "junk")
      p
    }
    // In-flight writer: delta dir targets version 3 — NOT yet committed
    // (latest is 2). Vacuum must leave it alone, else the writer's imminent
    // CAS commit would reference deleted files.
    val inFlight = plant("data/e0000000003-aaaaaaaa/b=0/part-inflight.parquet")
    // Lost racer: dir encodes version 2, which a WINNER already committed —
    // a true orphan, eligible.
    val lostRacer = plant("data/e0000000002-bbbbbbbb/b=0/part-loser.parquet")
    val (_, _) = t.vacuum(keepSnapshots = 1)
    assert(Files.exists(inFlight), "in-flight writer's files must survive vacuum")
    assert(!Files.exists(lostRacer), "lost racer's orphans are reclaimed")
    // mtime grace: an old-version orphan written moments ago survives when a
    // grace window is configured (crashed-writer protection)
    val fresh = plant("data/e0000000001-cccccccc/b=0/part-fresh.parquet")
    t.vacuum(keepSnapshots = 1, inFlightGraceMs = 3600L * 1000L)
    assert(Files.exists(fresh), "grace window protects recently-written files")
    t.vacuum(keepSnapshots = 1)
    assert(!Files.exists(fresh), "without grace the orphan is reclaimed")
    // and the in-flight commit can still complete: readers see v3 cleanly
    // (files were not deleted under it) — simulate by checking the dir intact
    assert(Files.exists(inFlight))
  }

  test("live merge ‖ vacuum interleaving: maintenance never eats an in-flight commit") {
    // A writer thread commits epochs while a maintenance thread vacuums in a
    // loop. The version guard must protect every not-yet-published epoch's
    // files — any hole shows up as a snapshot referencing deleted files and
    // a failed read below.
    val t = freshTable(buckets = 4)
    t.merge(TranscriptWal.synthetic(spark, 200, 6, seed = 1L,
      lsnOffset = 1000000L), "t", 1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val epochs = 6
    val applied = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Boolean, Long)]()
    val writer = new Thread(() =>
      try {
        (2 to epochs).foreach { i =>
          val r = t.mergeWithRetry(TranscriptWal.synthetic(spark, 200, 6, seed = i.toLong,
            lsnOffset = i * 1000000L), "t", i)
          applied.add((i, r.applied, r.version))
        }
      } catch { case e: Throwable => failures.add(e) })
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vacuumer = new Thread(() =>
      try while (!stop.get()) { t.vacuum(keepSnapshots = 2); Thread.sleep(5) }
      catch { case e: Throwable => failures.add(e) })
    writer.start(); vacuumer.start()
    writer.join(300000)
    stop.set(true); vacuumer.join(60000)
    assert(failures.isEmpty, s"concurrent merge/vacuum raised: ${failures.peek()}")
    // every epoch landed and the full state reads back (no dangling files)
    assert(t.latestVersion.get >= epochs,
      s"latest=${t.latestVersion}, merges=${applied.toArray.toList}, " +
        s"epochs=${t.currentSnapshot.map(_.committedEpochs)}")
    val expected = TranscriptWal.expectedState(
      (1 to epochs).map(i => TranscriptWal.synthetic(spark, 200, 6, seed = i.toLong,
        lsnOffset = i * 1000000L)).reduce(_ unionAll _))
    val got = t.read().select("conv_id", "turn_idx", "text")
    val exp = expected.select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  test("BucketPrune survives delete-and-recreate at the same path with a new bucket count") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val path = Files.createTempDirectory("lake-recreate").toString
    val wal = TranscriptWal.synthetic(spark, 800, 20).cache()
    // pick a key whose bucket DIFFERS between the two layouts, so a stale
    // cached count provably prunes the wrong bucket
    val key = (0 until 20).map(i => s"c$i")
      .find(k => LakeTable.bucketOf(k, 8) != LakeTable.bucketOf(k, 4)).get
    val t8 = new LakeTable(spark, path, numBuckets = 8)
    t8.merge(wal, "t", 1)
    // prime the rule's cache with the 8-bucket layout
    val r1 = t8.read().where($"conv_id" === key).count()
    assert(r1 > 0)
    // delete-and-recreate the table at the SAME path with 4 buckets
    scala.util.Using.resource(Files.walk(java.nio.file.Paths.get(path))) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.toVector.sortBy(-_.getNameCount).foreach(Files.delete)
    }
    val t4 = new LakeTable(spark, path, numBuckets = 4)
    t4.merge(wal, "t", 1)
    val q = t4.read().where($"conv_id" === key)
    val expected = t4.read().collect().count(_.getString(0) == key)
    assert(q.count() == expected && expected > 0,
      "stale cached bucket count must not silently drop rows")
    // and pruning is STILL ACTIVE for the live layout (not just disabled)
    val scanned = q.queryExecution.optimizedPlan.collect {
      case LogicalRelation(rel: HadoopFsRelation, _, _, _, _) =>
        rel.location.inputFiles.toSeq
    }.flatten.map(f => f.substring(f.indexOf("data/"))).toSet
    val expectFiles = t4.currentSnapshot.get
      .buckets(LakeTable.bucketOf(key, 4)).allFiles.toSet
    assert(scanned == expectFiles, "pruning active under the recreated layout")
    wal.unpersist()
  }

  test("BucketPrune handles OR-of-equalities like an IN list") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 1200, 20)
    t.merge(wal, "t", 1)
    t.compactAll()
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case LogicalRelation(rel: HadoopFsRelation, _, _, _, _) =>
          rel.location.inputFiles.toSeq
      }.flatten.map(f => f.substring(f.indexOf("data/"))).toSet
    // SQL generators emit OR-of-equalities where humans write IN
    val q = t.read().where($"conv_id" === "c3" || $"conv_id" === "c7")
    val expectFiles = Set("c3", "c7").map(LakeTable.bucketOf(_, 8))
      .flatMap(b => t.currentSnapshot.get.buckets(b).allFiles)
    assert(scannedFiles(q) == expectFiles, "OR of equalities prunes to the union")
    assert(scannedFiles(q).size < scannedFiles(t.read()).size)
    // correctness: equals the IN form
    val viaIn = t.read().where($"conv_id".isin("c3", "c7"))
      .collect().map(_.toString).sorted.toSeq
    assert(q.collect().map(_.toString).sorted.toSeq == viaIn && viaIn.nonEmpty)
    // mixed OR arms must NOT prune (would drop rows)
    val mixed = t.read().where($"conv_id" === "c3" || $"turn_idx" === 0)
    assert(scannedFiles(mixed) == scannedFiles(t.read()))
  }

  test("manifest file stats: changesInRange and readTimeRange skip files by metadata") {
    val t = freshTable(buckets = 4)
    // synthetic ts = 1704067200 + lsn*2 seconds ⇒ disjoint per-batch ranges.
    // Distinct seeds: each batch draws a different key set, so the live
    // state keeps winners from every batch (same-seed batches would be pure
    // overwrites — batch 3 would own every key).
    val batches = (0 to 2).map { i =>
      i -> TranscriptWal.synthetic(spark, 200, 6, seed = 100L + i,
        lsnOffset = i * 1000000L).cache()
    }
    batches.foreach { case (i, b) => t.merge(b, "t", i + 1) }
    def tsBounds(i: Int): (Long, Long) = {
      val base = 1704067200L * 1000000L
      (base + (i * 1000000L) * 2000000L, base + ((i + 1) * 1000000L - 1) * 2000000L)
    }
    // change feed restricted to batch 1's ts range: only v2's files scanned
    val (lo1, hi1) = tsBounds(1)
    val feed = t.changesInRange(lo1, hi1)
    val v2Files = {
      // readSnapshot is private — recover v2's change files via its feed
      t.changesSince(1).where($"_commit_version" === 2)
    }
    assert(feed.count() == batches(1)._2.count())
    val feedFiles = feed.inputFiles.map(f => f.substring(f.indexOf("data/"))).toSet
    val allChangeFiles = t.changesSince(0).inputFiles
      .map(f => f.substring(f.indexOf("data/"))).toSet
    assert(feedFiles.nonEmpty && feedFiles.size < allChangeFiles.size,
      s"stats must prune change files: ${feedFiles.size} vs ${allChangeFiles.size}")
    assert(feedFiles.forall(_.startsWith("data/e0000000002-")),
      "only the matching commit's files are opened")
    // arbitrated time-range read: correctness + zero files opened for a
    // range outside the data
    t.compactAll()
    val inRange = t.readTimeRange(lo1, hi1)
      .select("conv_id", "turn_idx", "text").collect().map(_.toString).sorted.toSeq
    val expected = t.read()
      .where(unix_micros($"ts").between(lo1, hi1))
      .select("conv_id", "turn_idx", "text").collect().map(_.toString).sorted.toSeq
    assert(inRange == expected && expected.nonEmpty)
    val outside = t.readTimeRange(4102444800L * 1000000L, 4102444801L * 1000000L)
    assert(outside.inputFiles.isEmpty,
      "a range outside every file's stats opens ZERO files (clean table)")
    assert(outside.count() == 0)
    batches.foreach(_._2.unpersist())
    val _ = v2Files
  }

  test("DSv2: compacted table reads as a columnar BatchScan with bucket-pruned files") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val t = freshTable(buckets = 8)
    val wal = TranscriptWal.synthetic(spark, 1000, 16, deleteFraction = 0.1).cache()
    t.merge(wal, "t", 1)
    t.compactAll() // all buckets clean + tombstone-split ⇒ columnar eligible
    val df = spark.read.format("graftlake").load(t.path)

    // full scan: a genuine v2 batch scan feeding ColumnarToRow (vectorized)
    val full = df.select("conv_id", "turn_idx", "text")
    val fullPlan = full.queryExecution.executedPlan
    assert(fullPlan.collect { case b: BatchScanExec => b }.size == 1,
      "compacted read must plan a BatchScan, not a row-based v1 bridge")
    assert(fullPlan.toString.contains("ColumnarToRow"),
      "batch scan must be columnar (vectorized parquet)")
    // correctness vs the engine read
    val viaScala = t.read().select("conv_id", "turn_idx", "text")
    assert(full.exceptAll(viaScala).count() == 0 &&
      viaScala.exceptAll(full).count() == 0)

    // literal key filter: the scan's file set is exactly that bucket's bases
    val one = df.where($"conv_id" === "c3")
    val scan = one.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    val scannedFiles = scan.scan
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .fileIndex.inputFiles
      .map(f => f.substring(f.indexOf("data/"))).toSet
    val expectFiles =
      t.currentSnapshot.get.buckets(LakeTable.bucketOf("c3", 8)).base.toSet
    assert(scannedFiles == expectFiles, "v2 scan prunes to the key's bucket")
    assert(one.count() == t.readConv("c3").count() && one.count() > 0)
    // pushed-filter display carries the conv_id predicate
    assert(one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("PushedFilters"))

    // deltas arrive ⇒ arbitration required ⇒ correct row-bridge fallback
    t.merge(wal.where($"conv_id" === "c3").withColumn("lsn", $"lsn" + 5000000L)
      .withColumn("text", lit("v2")), "t", 2)
    val df2 = spark.read.format("graftlake").load(t.path)
    assert(df2.where($"conv_id" === "c3").select("text").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("v2"))
    assert(df2.count() == t.read().count())
    // and compaction restores the columnar path
    t.compactAll()
    val df3 = spark.read.format("graftlake").load(t.path)
    assert(df3.select("conv_id").queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.size == 1)
    // a key hashing to an EMPTY bucket plans a zero-file columnar scan
    assert(df3.where($"conv_id" === "zzz_no_such_conv").count() == 0)
    wal.unpersist()
  }

  test("DSv2: filterless COUNT/MIN/MAX push to parquet footers on a compacted table") {
    val t = freshTable(buckets = 8)
    // deletes matter: a footer count over unsplit bases would include
    // tombstone rows — the split format is what makes the pushdown CORRECT
    val wal = TranscriptWal.synthetic(spark, 800, 12, deleteFraction = 0.2)
    t.merge(wal, "t", 1)
    t.compactAll()
    // the connector honors Spark's own file-source gate for stats-served
    // aggregates (off by default, exactly like the built-in parquet source)
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = spark.read.format("graftlake").load(t.path)
      val agg = df.agg(count(lit(1)).as("n"),
        min($"turn_idx").as("lo"), max($"turn_idx").as("hi"))
      val explained = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(explained.contains("PushedAggregation"),
        s"aggregates must reach the parquet footers:\n$explained")
      val row = agg.collect()(0)
      assert(row.getLong(0) == t.read().count(), "footer count == live rows (no tombstones)")
      val exp = t.read().agg(min($"turn_idx"), max($"turn_idx")).collect()(0)
      assert(row.getInt(1) == exp.getInt(0) && row.getInt(2) == exp.getInt(1))
      // dirty table: the same aggregate silently takes the full (correct) plan
      t.merge(wal.limit(10).withColumn("lsn", $"lsn" + 1000000L), "t", 2)
      val df2 = spark.read.format("graftlake").load(t.path)
      assert(df2.count() == t.read().count())
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("SQL INSERT INTO a graftlake view lands merged upsert epochs") {
    val t = freshTable(buckets = 4)
    val wal = TranscriptWal.synthetic(spark, 300, 6)
    t.merge(wal, "t", 1)
    val v1 = t.latestVersion.get
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW lake_ins " +
      s"USING graftlake OPTIONS (path '${t.path}')")
    // plain payload rows — the engine synthesizes op/lsn/commit_ts
    spark.sql("INSERT INTO lake_ins VALUES " +
      "('sqlconv', 0, 'user', 'hello from sql', NULL, TIMESTAMP'2024-06-01 00:00:00')," +
      "('sqlconv', 1, 'assistant', 'hi', NULL, TIMESTAMP'2024-06-01 00:00:01')")
    assert(t.latestVersion.get == v1 + 1, "INSERT commits one epoch")
    assert(t.readConv("sqlconv").count() == 2)
    assert(t.currentSnapshot.get.committedEpochs.contains("sql-append"))
    // a second INSERT supersedes by the auto-lsn (last writer wins)
    spark.sql("INSERT INTO lake_ins VALUES " +
      "('sqlconv', 0, 'user', 'edited', NULL, TIMESTAMP'2024-06-01 00:00:02')")
    val texts = t.readConv("sqlconv").orderBy("turn_idx")
      .select("text").collect().map(_.getString(0)).toSeq
    assert(texts == Seq("edited", "hi"))
    // DataFrame append through the v2 write path
    import spark.implicits._
    Seq(("dfconv", 0, "user", "from df.write", Option.empty[String],
      new java.sql.Timestamp(1717200000000L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.format("graftlake").mode("append").save(t.path)
    assert(t.readConv("dfconv").count() == 1)
    // overwrite swaps the live generation atomically (merge-on-read —
    // WriterContractSpec covers the full contract); unknown modes refused
    val vBefore = t.latestVersion.get
    Seq(("x", 0, "user", "only row now", Option.empty[String],
      new java.sql.Timestamp(0L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.format("graftlake").mode("overwrite").save(t.path)
    assert(t.latestVersion.get == vBefore + 1, "one overwrite = one commit")
    assert(t.read().select("conv_id").collect().map(_.getString(0)).toSeq == Seq("x"))
    assert(t.readAsOf(vBefore).count() > 1, "pre-swap state survives")
    intercept[Exception] {
      Seq(("x", 0, "user", "nope", Option.empty[String],
        new java.sql.Timestamp(0L)))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .write.format("graftlake").mode("ignore").save(t.path)
    }
  }

  test("GraftCatalog: full SQL DDL/DML lifecycle with no paths in queries") {
    val rootDir = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.prod")
    spark.sql("CREATE TABLE gcat.prod.turns " +
      "(conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, ts TIMESTAMP) " +
      "USING graftlake PARTITIONED BY (bucket(8, conv_id))")
    // the empty table exists, describes itself, and the layout took effect
    assert(spark.sql("SELECT * FROM gcat.prod.turns").columns.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val t = LakeTable.open(spark, s"$rootDir/prod/turns")
    assert(t.currentSnapshot.get.numBuckets == 8)
    assert(spark.sql("SHOW TABLES IN gcat.prod").collect().map(_.getString(1)).toSeq
      == Seq("turns"))

    spark.sql("INSERT INTO gcat.prod.turns VALUES " +
      "('c1', 0, 'user', 'hi', NULL, TIMESTAMP'2024-01-01 00:00:00')," +
      "('c1', 1, 'assistant', 'hello', NULL, TIMESTAMP'2024-01-01 00:00:01')")
    val v1 = t.latestVersion.get
    spark.sql("INSERT INTO gcat.prod.turns VALUES " +
      "('c1', 0, 'user', 'edited', NULL, TIMESTAMP'2024-01-01 00:00:02')")
    assert(spark.sql("SELECT text FROM gcat.prod.turns WHERE conv_id='c1' ORDER BY turn_idx")
      .collect().map(_.getString(0)).toSeq == Seq("edited", "hello"))
    // SQL time travel onto the retained snapshot
    assert(spark.sql(s"SELECT text FROM gcat.prod.turns VERSION AS OF $v1 " +
      "WHERE turn_idx = 0").collect().map(_.getString(0)).toSeq == Seq("hi"))
    // CTAS through the catalog
    spark.sql("CREATE TABLE gcat.prod.copy USING graftlake AS " +
      "SELECT conv_id, turn_idx, role, text, tool, ts FROM gcat.prod.turns")
    assert(spark.sql("SELECT count(*) FROM gcat.prod.copy").collect()(0).getLong(0) == 2)
    // rename + drop
    spark.sql("ALTER TABLE gcat.prod.copy RENAME TO prod.copy2")
    assert(spark.sql("SELECT count(*) FROM gcat.prod.copy2").collect()(0).getLong(0) == 2)
    spark.sql("DROP TABLE gcat.prod.copy2")
    intercept[Exception] { spark.sql("SELECT * FROM gcat.prod.copy2").collect() }
  }

  test("multi-table exactly-once: crash between merges leaves a consistent pair after retry") {
    import graft.lake.TxnLog
    val work = Files.createTempDirectory("txn").toString
    val turns = new LakeTable(spark, s"$work/turns", numBuckets = 4)
    val stats = new LakeTable(spark, s"$work/stats", numBuckets = 4)
    val txn = new TxnLog(spark, s"$work/txn")
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    val statBatch = wal.groupBy("conv_id").agg(count(lit(1)).as("n"))
      .select($"conv_id", lit(0).as("turn_idx"), lit("U").as("op"),
        lit(1L).as("lsn"), lit(new java.sql.Timestamp(0)).cast("timestamp").as("commit_ts"),
        $"n")

    // epoch 1 lands in both tables, then the pin covers both
    val s1 = txn.commit(Seq(turns -> wal, stats -> statBatch), "pipe", 1)
    assert(s1.tables.keySet == Set(turns.path, stats.path))
    assert(txn.readPinned(turns).count() > 0 && txn.readPinned(stats).count() > 0)

    // CRASH SIMULATION for epoch 2: table A merged, coordinator dies before
    // table B and before the pin
    // fresh seed ⇒ new keys, so the epoch visibly grows the row count
    val wal2 = TranscriptWal.synthetic(spark, 200, 8, seed = 77L,
      lsnOffset = 1000000L).cache()
    val stat2 = wal2.groupBy("conv_id").agg(count(lit(1)).as("n"))
      .select($"conv_id", lit(0).as("turn_idx"), lit("U").as("op"),
        lit(2L).as("lsn"), lit(new java.sql.Timestamp(0)).cast("timestamp").as("commit_ts"),
        $"n")
    turns.merge(wal2, "pipe", 2) // the half-done txn
    val turnsRowsAfterCrash = turns.read().count()
    // readers in the crash window still see the CONSISTENT epoch-1 pin
    assert(txn.latest.get.epochs("pipe") == 1)
    assert(txn.readPinned(turns).count() < turnsRowsAfterCrash)

    // retry the WHOLE txn: A no-ops (idempotent epoch), B applies, pin lands
    val turnsVersionBefore = turns.latestVersion.get
    val s2 = txn.commit(Seq(turns -> wal2, stats -> stat2), "pipe", 2)
    assert(turns.latestVersion.get == turnsVersionBefore, "A must not double-apply")
    assert(turns.read().count() == turnsRowsAfterCrash)
    assert(s2.epochs("pipe") == 2)
    assert(txn.readPinned(turns).count() == turnsRowsAfterCrash)
    assert(txn.readPinned(stats).count() > 0)
    // and re-running the COMPLETED txn is a pure no-op, no new pin version
    val s3 = txn.commit(Seq(turns -> wal2, stats -> stat2), "pipe", 2)
    assert(s3.version == s2.version)
    wal.unpersist(); wal2.unpersist()
  }

  test("tombstone GC skips provably-clean buckets by manifest stats") {
    val t = freshTable(buckets = 4)
    t.merge(TranscriptWal.synthetic(spark, 500, 8, deleteFraction = 0.2), "t", 1)
    t.compactAll() // v2: bases still carry tombstones
    t.compactAll(dropTombstonesBelowLsn = Some(10000000L)) // v3: GC rewrite
    val v3 = t.latestVersion.get
    // second GC pass: every bucket is provably tombstone-free (op footer
    // range excludes 'D') ⇒ metadata-only no-op, no new snapshot
    t.compactAll(dropTombstonesBelowLsn = Some(10000000L))
    assert(t.latestVersion.get == v3,
      "GC with nothing to collect must not rewrite a single bucket")
    // the stats actually recorded the proof
    val s = t.currentSnapshot.get
    val baseFiles = s.buckets.values.flatMap(_.base)
    assert(baseFiles.nonEmpty && baseFiles.forall(f => s.fileStats(f).noTombs))
  }

  test("change feed: _commit_version is a partition column, not a path parse") {
    val t = freshTable(buckets = 4)
    (1 to 4).foreach { i =>
      t.merge(TranscriptWal.synthetic(spark, 60, 4, seed = i.toLong,
        lsnOffset = i * 100000L), "t", i)
    }
    val feed = t.changesSince(0)
    // no per-row path work anywhere in the plan
    val planStr = feed.queryExecution.executedPlan.toString
    assert(!planStr.contains("input_file_name"),
      s"feed plan must not parse file paths per row:\n$planStr")
    // a version predicate becomes a PARTITION filter and prunes whole
    // commits out of the file list before the scan plans
    val one = t.changesSince(0).where($"_commit_version" === 2)
    val scan = one.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "version predicate must partition-prune")
    val allFiles = feed.inputFiles.length
    val prunedFiles = scan.selectedPartitions.totalNumberOfFiles
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"expected pruned file list, got $prunedFiles of $allFiles")
    assert(one.select("_lsn").collect().map(_.getLong(0))
      .forall(l => l >= 200000L && l < 300000L))
  }

  test("TIMESTAMP AS OF resolves in O(log V) flat-JSON parses") {
    val t = freshTable(buckets = 2)
    val n = 48
    (1 to n).foreach { i =>
      t.merge(TranscriptWal.synthetic(spark, 6, 2, lsnOffset = i * 1000L), "t", i)
    }
    // commit times are forced monotone even when the wall clock stalls
    val times = (1L to n.toLong).map(v => t.snapshotAt(v).commitTimeMs)
    assert(times.sliding(2).forall(p => p(0) < p(1)),
      "commitTimeMs must be strictly increasing across versions")
    // a FRESH instance (cold caches) pays O(log V) parses, not O(V)
    val t2 = LakeTable.open(spark, t.path)
    val target = times(29) // resolve into the middle of the history
    val before = t2.commitTimeParses
    assert(t2.versionAsOfTimestamp(target) == 30L)
    val parses = t2.commitTimeParses - before
    assert(parses <= 8, s"expected <= log2($n)+2 parses, got $parses")
    // warm resolution parses nothing
    val again = t2.commitTimeParses
    assert(t2.versionAsOfTimestamp(times(40)) == 41L)
    assert(t2.commitTimeParses - again <= 8)
    assert(t2.readAsOfTimestamp(target).count() == t2.readAsOf(30).count())
  }

  test("deleteWhere executes the match lineage once (bytes-read bound)") {
    val t = freshTable(buckets = 4)
    t.merge(TranscriptWal.synthetic(spark, 4000, 8), "t", 1)
    t.compactAll()
    def fileBytesRead(): Long = {
      import scala.jdk.CollectionConverters._
      org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator().asScala
        .filter(s => s.getScheme == "file")
        .map(s => Option(s.getLong("bytesRead")).map(_.longValue).getOrElse(0L))
        .sum
    }
    // cost of ONE arbitrated match pass over the table
    val m0 = fileBytesRead()
    t.read().where($"turn_idx" >= 2).select("conv_id", "turn_idx").count()
    val onePass = fileBytesRead() - m0
    assert(onePass > 0, "storage statistics must be live for this test")
    val m1 = fileBytesRead()
    val deleted = t.deleteWhere($"turn_idx" >= 2)
    val delBytes = fileBytesRead() - m1
    assert(deleted > 0 && t.read().where($"turn_idx" >= 2).count() == 0)
    // single-pass: the delete's read cost ~= one match pass (+ the small
    // tombstone write + commit-time footer reads), never ~2 passes
    assert(delBytes < (onePass * 1.6).toLong + 1024 * 1024,
      s"deleteWhere read $delBytes bytes vs $onePass for one pass — " +
        "the match lineage is executing more than once")
  }

  test("appendAsUpserts rejects batches with no orderable payload column") {
    val t = freshTable(buckets = 2)
    val df = Seq(("c1", 0, Map("a" -> 1)), ("c1", 0, Map("b" -> 2)))
      .toDF("conv_id", "turn_idx", "attrs")
    val e = intercept[IllegalArgumentException] { t.appendAsUpserts(df) }
    assert(e.getMessage.contains("orderable"))
    // key-only batches (payload-less) still work: rows are identical per key
    t.appendAsUpserts(Seq(("c1", 0), ("c2", 1)).toDF("conv_id", "turn_idx"))
    assert(t.read().count() == 2)
  }

  test("streaming read: startingVersion selects the feed; without it analysis passes") {
    val t = freshTable(buckets = 2)
    t.merge(TranscriptWal.synthetic(spark, 50, 4), "t", 1)
    // without the option, ANALYSIS passes (MICRO_BATCH_READ is advertised so
    // Spark's generic capability error never fires) and the stream START
    // carries the actionable "pass startingVersion" message — asserted
    // end-to-end in StreamingSpec. Here: the load itself must not throw and
    // must expose the BATCH schema (no silent mis-schemaed change feed).
    val bare = spark.readStream.format("graftlake").load(t.path)
    assert(bare.isStreaming && !bare.columns.contains("_commit_version"))
    // the documented option selects the feed (change schema)
    val ok = spark.readStream.format("graftlake")
      .option("startingVersion", "0").load(t.path)
    assert(ok.isStreaming && ok.columns.contains("_commit_version"))
  }

  test("lake writes follow the user session's conf UNSETS, not just sets") {
    val t = freshTable(buckets = 2)
    val key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(key, "123456")
    try {
      t.merge(TranscriptWal.synthetic(spark, 20, 2), "t", 1)
      val clone = LakeTable.microsWriteSession(spark)
      assert(clone.conf.get(key) == "123456")
      spark.conf.unset(key)
      t.merge(TranscriptWal.synthetic(spark, 20, 2, lsnOffset = 100000L), "t", 2)
      assert(!clone.conf.getAll.contains(key),
        "an unset key must not keep its stale value in the write clone")
    } finally spark.conf.unset(key)
  }
}
