package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeTable, TxnLog}
import graft.wal.TranscriptWal

/** Round-5 contract hardening: the SQL-append epoch-id race (silent batch
  * drop), per-row INSERT lsns, pin monotonicity, snapshot-pinned fallback
  * scans, loud failures on mis-wired reads, schema-gated aggregate
  * pushdown, ALTER TABLE, and session-conf hygiene.
  */
class WriterContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshTable(buckets: Int = 8) =
    new LakeTable(spark, Files.createTempDirectory("lake").toString, buckets)

  private def payload(prefix: String, n: Int) =
    (0 until n).map(i => (s"${prefix}_$i", 0, "user", s"text $prefix $i",
      Option.empty[String], new java.sql.Timestamp(1717200000000L + i)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("concurrent SQL INSERTs: a lost epoch-id race retries, never drops a batch") {
    val t = freshTable(4)
    t.appendAsUpserts(payload("seed", 5))
    // Two writers race appendAsUpserts; both self-allocate epoch ids from
    // the same snapshot. The loser's id is burned by the winner — it must
    // RETRY under a fresh id, not be swallowed as a replay.
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("a", "b").map { tag =>
      new Thread(() => {
        try t.appendAsUpserts(payload(tag, 40), maxRetries = 20)
        catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"writers failed: ${errors.toArray.mkString(", ")}")
    val got = t.read()
    assert(got.where($"conv_id".startsWith("a_")).count() == 40, "writer a's batch landed")
    assert(got.where($"conv_id".startsWith("b_")).count() == 40, "writer b's batch landed")
    assert(got.count() == 85)
  }

  test("same-key rows in one INSERT resolve to a deterministic winner") {
    def run(): Seq[String] = {
      val t = freshTable(4)
      val dup = Seq(
        ("k", 0, "user", "alpha", Option.empty[String], new java.sql.Timestamp(0L)),
        ("k", 0, "user", "omega", Option.empty[String], new java.sql.Timestamp(0L)),
        ("k", 1, "user", "only", Option.empty[String], new java.sql.Timestamp(0L)))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      t.appendAsUpserts(dup.repartition(4)) // physical order must not matter
      t.read().orderBy("turn_idx").select("text").collect().map(_.getString(0)).toSeq
    }
    val first = run()
    // per-row lsns: the LAST row in the deterministic payload sort wins
    assert(first == Seq("omega", "only"))
    assert(run() == first, "same input, same winner — every run")
  }

  test("INSERT lsns stack: a later INSERT supersedes an earlier one per key") {
    val t = freshTable(4)
    t.appendAsUpserts(payload("c", 3))
    t.appendAsUpserts(payload("c", 3).withColumn("text", lit("v2")))
    assert(t.read().where($"text" === "v2").count() == 3)
    assert(t.read().count() == 3)
  }

  test("TxnLog pins are monotone: a late coordinator never regresses a newer pin") {
    val work = Files.createTempDirectory("txn-mono").toString
    val t = new LakeTable(spark, s"$work/t", numBuckets = 4)
    val txn = new TxnLog(spark, s"$work/txn")
    txn.commit(Seq(t -> payload("p", 4).withColumn("op", lit("U"))
      .withColumn("lsn", lit(1L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L)))), "ns1", 0)
    val pinned = txn.latest.get.tables(t.path)
    // the table advances through another coordinator/namespace
    val r2 = t.mergeWithRetry(payload("q", 4).withColumn("op", lit("U"))
      .withColumn("lsn", lit(2L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L))), "direct", 0)
    txn.publishPins(Map(t.path -> r2.version), "ns2", 0)
    assert(txn.latest.get.tables(t.path) == r2.version)
    // LATE publish of the older pin (phase 1 ran before ns2 advanced the
    // table): the pin must hold at the newer version, not regress
    txn.publishPins(Map(t.path -> pinned), "late-ns", 0)
    assert(txn.latest.get.tables(t.path) == r2.version,
      "a max-merge keeps readPinned monotone")
    assert(txn.readPinned(t).count() == 8)
  }

  test("readPinned of an unpinned table fails loudly") {
    val work = Files.createTempDirectory("txn-loud").toString
    val t = new LakeTable(spark, s"$work/t", numBuckets = 4)
    t.merge(payload("x", 2).withColumn("op", lit("U"))
      .withColumn("lsn", lit(1L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L))), "m", 0)
    val txn = new TxnLog(spark, s"$work/txn")
    intercept[IllegalStateException] { txn.readPinned(t) } // no manifest at all
    val other = new LakeTable(spark, s"$work/other", numBuckets = 4)
    other.merge(payload("y", 2).withColumn("op", lit("U"))
      .withColumn("lsn", lit(1L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L))), "m", 0)
    txn.commit(Seq(other -> payload("z", 2).withColumn("op", lit("U"))
      .withColumn("lsn", lit(2L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L)))), "ns", 0)
    intercept[IllegalArgumentException] { txn.readPinned(t) } // never pinned here
  }

  test("reading a nonexistent path fails loudly and creates no directories") {
    val missing = Files.createTempDirectory("no-table").resolve("typo").toString
    intercept[Exception] { spark.read.format("graftlake").load(missing).count() }
    assert(!Files.exists(Paths.get(missing)),
      "a failed read must not litter table skeleton directories")
    // v1 view surface fails at resolution too
    intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW typo_view " +
        s"USING graftlake OPTIONS (path '$missing')")
      spark.sql("SELECT * FROM typo_view").collect()
    }
    assert(!Files.exists(Paths.get(missing)))
    // opening via the Scala API stays lenient (creation flow) but writes
    // nothing until a merge commits
    val t = new LakeTable(spark, missing, numBuckets = 4)
    assert(t.read().isEmpty)
    assert(!Files.exists(Paths.get(missing)))
    t.merge(payload("n", 2).withColumn("op", lit("U"))
      .withColumn("lsn", lit(1L))
      .withColumn("commit_ts", lit(new java.sql.Timestamp(0L))), "m", 0)
    assert(LakeTable.existsAt(missing) && t.read().count() == 2)
  }

  test("lake writes scope the parquet timestamp conf; the user session is untouched") {
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.get(key) // Spark default: INT96
    val t = freshTable(4)
    t.merge(TranscriptWal.synthetic(spark, 200, 5), "t", 1)
    assert(spark.conf.get(key) == before,
      "opening/writing a lake table must not mutate the caller's session conf")
    // and the scoped write still produced stats-bearing (micros) ts footers
    val stats = t.currentSnapshot.get.fileStats
    assert(stats.nonEmpty && stats.values.exists(_.minTs.isDefined),
      "ts footer stats require the scoped TIMESTAMP_MICROS write conf")
  }

  test("DSv2 arbitration fallback reads the snapshot the scan was PLANNED against") {
    val t = freshTable(4)
    t.merge(TranscriptWal.synthetic(spark, 300, 6), "t", 1) // deltas ⇒ fallback
    val df = spark.read.format("graftlake").load(t.path)
    df.queryExecution.optimizedPlan // pushdown runs: ScanBuilder pins here
    val planned = t.read().count()
    // a commit lands between planning and execution
    t.merge(TranscriptWal.synthetic(spark, 100, 6, seed = 99L,
      lsnOffset = 5000000L), "t", 2)
    assert(df.collect().length == planned,
      "execution must serve the planned version, not the current one")
    // a fresh query (new planning) sees the new commit
    assert(spark.read.format("graftlake").load(t.path).count() > planned)
  }

  test("aggregate pushdown is refused while any clean base lacks the evolved schema") {
    val t = freshTable(4)
    val v0 = TranscriptWal.synthetic(spark, 400, 8, withTool = false).drop("tool")
    t.merge(v0, "t", 1)
    t.compactAll() // bases WITHOUT the tool column
    // additive evolution lands `tool` through one conversation's bucket only
    val oneConv = TranscriptWal.synthetic(spark, 40, 8, lsnOffset = 9000000L)
      .where($"conv_id" === "c1")
    t.merge(oneConv, "t", 2)
    t.compactAll() // rewrites ONLY the dirty bucket — other bases stay stale
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val agg = spark.read.format("graftlake").load(t.path).agg(max($"tool").as("m"))
      val explained = agg.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!explained.contains("PushedAggregation"),
        s"stale-schema bases must refuse footer-served aggregates:\n$explained")
      val exp = t.read().agg(max($"tool")).collect()(0).getString(0)
      assert(agg.collect()(0).getString(0) == exp, "the full plan stays correct")
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("ALTER TABLE ADD COLUMN pre-declares an additive column; non-additive fails") {
    val rootDir = Files.createTempDirectory("graft-alter").toString
    spark.conf.set("spark.sql.catalog.galt", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.galt.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS galt.ns")
    spark.sql("CREATE TABLE galt.ns.t " +
      "(conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO galt.ns.t VALUES ('c1', 0, 'hi')")
    spark.sql("ALTER TABLE galt.ns.t ADD COLUMN score DOUBLE")
    assert(spark.sql("SELECT * FROM galt.ns.t").columns.toSeq ==
      Seq("conv_id", "turn_idx", "text", "score"))
    // existing rows read the new column as null; new rows carry it
    assert(spark.sql("SELECT score FROM galt.ns.t WHERE conv_id='c1'")
      .collect()(0).isNullAt(0))
    spark.sql("INSERT INTO galt.ns.t VALUES ('c2', 0, 'scored', 0.75)")
    assert(spark.sql("SELECT score FROM galt.ns.t WHERE conv_id='c2'")
      .collect()(0).getDouble(0) == 0.75)
    // non-additive changes are refused loudly
    intercept[Exception] { spark.sql("ALTER TABLE galt.ns.t DROP COLUMN text") }
    intercept[Exception] { spark.sql("ALTER TABLE galt.ns.t RENAME COLUMN text TO body") }
    // VERSION AS OF guards its parse instead of NPE-ing
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM galt.ns.t VERSION AS OF 'not-a-version'").collect()
    }
    assert(e.getMessage != null, "a typed error, not an NPE")
  }

  test("chaos: concurrent CDC merges, SQL appends, compactions and vacuums converge") {
    val t = new LakeTable(spark, Files.createTempDirectory("chaos").toString,
      numBuckets = 8, maxDeltasPerBucket = 2) // frequent inline compaction
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val epochs = 6
    val cdcWriter = new Thread(() => {
      try (0 until epochs).foreach { i =>
        t.mergeWithRetry(wal.where($"lsn" % epochs === i), "cdc", i.toLong,
          maxRetries = 100)
      } catch { case e: Throwable => errors.add(e) }
    })
    val sqlAppender = new Thread(() => {
      try (0 until epochs).foreach { i =>
        t.appendAsUpserts(payload(s"sql$i", 10), maxRetries = 100)
      } catch { case e: Throwable => errors.add(e) }
    })
    val maintenance = new Thread(() => {
      while (!done.get()) {
        // vacuum WITH an mtime grace: count-based retention alone cannot
        // protect a long-running concurrent compaction whose input
        // snapshot ages out of the keep window mid-job (this very test
        // caught that file-delete race at keep=3 with no grace — the
        // documented contract: grace must cover the longest in-flight op).
        // Snapshot GC stays active; only young data files are protected.
        try { t.compactAll(); t.vacuum(keepSnapshots = 3, inFlightGraceMs = 300000L) }
        catch {
          case _: graft.lake.CommitConflictException => () // lost race: fine
          case e: Throwable => errors.add(e)
        }
        Thread.sleep(30)
      }
    })
    maintenance.start(); cdcWriter.start(); sqlAppender.start()
    cdcWriter.join(); sqlAppender.join()
    done.set(true); maintenance.join()
    assert(errors.isEmpty, s"writers/maintenance failed: ${errors.toArray.mkString("; ")}")
    // every CDC row (arbitrated) AND every SQL batch survived the chaos
    val cdcGot = t.read().where(!$"conv_id".startsWith("sql"))
      .select("conv_id", "turn_idx", "text")
    val cdcExp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    assert(cdcGot.exceptAll(cdcExp).count() == 0 && cdcExp.exceptAll(cdcGot).count() == 0)
    (0 until epochs).foreach(i =>
      assert(t.read().where($"conv_id".startsWith(s"sql${i}_")).count() == 10,
        s"SQL append $i must not be lost"))
    wal.unpersist()
  }

  test("keyed lookups compose with time travel; asOfTimestamp option; DESCRIBE props") {
    val t = freshTable(8)
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    t.merge(wal, "t", 1)
    val v1 = t.latestVersion.get
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(30)
    t.merge(wal.where($"conv_id" === "c3")
      .withColumn("lsn", $"lsn" + 1000000L)
      .withColumn("text", lit("updated")), "t", 2)
    // pruned time travel: the keyed read AT v1 sees the pre-update text
    val got = spark.read.format("graftlake").option("asOfVersion", v1.toString)
      .load(t.path).where($"conv_id" === "c3").select("conv_id", "turn_idx", "text")
    val exp = t.readAsOf(v1).where($"conv_id" === "c3")
      .select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    assert(got.where($"text" === "updated").count() == 0)
    // asOfTimestamp option = the non-catalog TIMESTAMP AS OF
    val byTs = spark.read.format("graftlake")
      .option("asOfTimestamp", tsAfterV1.toString).load(t.path)
    assert(byTs.where($"text" === "updated").count() == 0)
    assert(byTs.count() == t.readAsOf(v1).count())
    // DESCRIBE-visible properties
    val props = new graft.lake.GraftLakeV2Table(spark, t.path, None, None).properties()
    assert(props.get("numBuckets") == "8" && props.get("format") == "graftlake")
    wal.unpersist()
  }

  test("a graftlake temp view stays fresh across queries (pin is per scan, not per view)") {
    val t = freshTable(4)
    t.merge(TranscriptWal.synthetic(spark, 200, 5), "t", 1)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW fresh_v " +
      s"USING graftlake OPTIONS (path '${t.path}')")
    val n1 = spark.sql("SELECT count(*) FROM fresh_v").collect()(0).getLong(0)
    assert(n1 > 0)
    t.merge(TranscriptWal.synthetic(spark, 100, 5, seed = 9L, lsnOffset = 7000000L),
      "t", 2)
    val n2 = spark.sql("SELECT count(*) FROM fresh_v").collect()(0).getLong(0)
    assert(n2 > n1, "a later query through the same view sees later commits")
  }

  test("SQL DELETE FROM lands tombstone merges; TRUNCATE TABLE empties; history survives") {
    val rootDir = Files.createTempDirectory("graft-del").toString
    spark.conf.set("spark.sql.catalog.gdel", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdel.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.ns")
    spark.sql("CREATE TABLE gdel.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gdel.ns.t VALUES " +
      "('c1', 0, 'keep'), ('c1', 1, 'drop me'), ('c2', 0, 'drop me'), ('c3', 0, 'keep')")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    val vBefore = t.latestVersion.get
    // key predicate
    spark.sql("DELETE FROM gdel.ns.t WHERE conv_id = 'c2'")
    assert(spark.sql("SELECT count(*) FROM gdel.ns.t").collect()(0).getLong(0) == 3)
    // payload predicate (translated, evaluated on the arbitrated live state)
    spark.sql("DELETE FROM gdel.ns.t WHERE text LIKE 'drop%'")
    assert(spark.sql("SELECT conv_id FROM gdel.ns.t ORDER BY conv_id")
      .collect().map(_.getString(0)).toSeq == Seq("c1", "c3"))
    // the deletes are CDC events: tombstones flow through the change feed
    // and time travel still serves the pre-delete state
    assert(t.changesSince(vBefore).where(col("op") === "D").count() == 2)
    assert(t.readAsOf(vBefore).count() == 4)
    // deleting nothing commits nothing
    val vNoop = t.latestVersion.get
    spark.sql("DELETE FROM gdel.ns.t WHERE conv_id = 'ghost'")
    assert(t.latestVersion.get == vNoop, "empty match must not burn a version")
    spark.sql("TRUNCATE TABLE gdel.ns.t")
    assert(spark.sql("SELECT count(*) FROM gdel.ns.t").collect()(0).getLong(0) == 0)
    assert(t.readAsOf(vBefore).count() == 4, "truncate is tombstones, not erasure")
  }

  test("SQL MERGE INTO: matched update/delete + not-matched insert, CDC-native") {
    val rootDir = Files.createTempDirectory("graft-mrg").toString
    spark.conf.set("spark.sql.catalog.gmrg", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmrg.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmrg.ns")
    spark.sql("CREATE TABLE gmrg.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gmrg.ns.t VALUES " +
      "('c1', 0, 'old'), ('c2', 0, 'doomed'), ('c3', 0, 'untouched')")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    val vBefore = t.latestVersion.get
    Seq(("c1", 0, "updated", "U"), ("c2", 0, null: String, "D"),
      ("c9", 9, "inserted", "U"))
      .toDF("conv_id", "turn_idx", "text", "src_op")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO gmrg.ns.t t USING merge_src s
        |  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        |  WHEN MATCHED AND s.src_op = 'D' THEN DELETE
        |  WHEN MATCHED THEN UPDATE SET text = s.text
        |  WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, text)
        |    VALUES (s.conv_id, s.turn_idx, s.text)""".stripMargin)
    val got = spark.sql("SELECT conv_id, text FROM gmrg.ns.t ORDER BY conv_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("c1", "updated"), ("c3", "untouched"), ("c9", "inserted")))
    // merge-on-read CDC: the MERGE is ONE delta epoch (tombstone for the
    // delete, upserts for update+insert), the feed carries it, and time
    // travel still serves the pre-merge state
    assert(t.latestVersion.get == vBefore + 1, "one MERGE = one commit")
    val feed = t.changesSince(vBefore)
    assert(feed.where(col("op") === "D").count() == 2, // c2 + c1's update-tombstone
      "delete + update-as-delete both tombstone through the feed")
    assert(feed.where(col("op") === "U").count() == 2) // c1 reinsert + c9 insert
    assert(t.readAsOf(vBefore).count() == 3)
    // idempotent arbitration: the update's reinsert BEAT its own tombstone
    assert(spark.sql("SELECT count(*) FROM gmrg.ns.t WHERE conv_id='c1'")
      .collect()(0).getLong(0) == 1)
  }

  test("SQL UPDATE rewrites in place — including key-column updates") {
    val rootDir = Files.createTempDirectory("graft-upd").toString
    spark.conf.set("spark.sql.catalog.gupd", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gupd.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gupd.ns")
    spark.sql("CREATE TABLE gupd.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gupd.ns.t VALUES " +
      "('c1', 0, 'a'), ('c1', 1, 'b'), ('c2', 0, 'c')")
    spark.sql("UPDATE gupd.ns.t SET text = concat(text, '!') WHERE conv_id = 'c1'")
    assert(spark.sql("SELECT text FROM gupd.ns.t ORDER BY conv_id, turn_idx")
      .collect().map(_.getString(0)).toSeq == Seq("a!", "b!", "c"))
    // key-column update: the OLD key must die (delete+reinsert semantics)
    spark.sql("UPDATE gupd.ns.t SET turn_idx = 7 WHERE conv_id = 'c2'")
    val keys = spark.sql("SELECT conv_id, turn_idx FROM gupd.ns.t ORDER BY conv_id, turn_idx")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(keys == Seq(("c1", 0), ("c1", 1), ("c2", 7)))
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    assert(t.read().count() == 3)
  }

  test("SQL INSERT OVERWRITE swaps the live generation in ONE epoch; history survives") {
    val rootDir = Files.createTempDirectory("graft-ovw").toString
    spark.conf.set("spark.sql.catalog.govw", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.govw.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS govw.ns")
    spark.sql("CREATE TABLE govw.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO govw.ns.t VALUES " +
      "('c1', 0, 'old'), ('c2', 0, 'old'), ('c3', 0, 'old')")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    val vBefore = t.latestVersion.get
    // c1 survives the swap with a new text (same-key reinsert must beat its
    // own generation tombstone); c2/c3 vanish; c9 is new
    spark.sql("INSERT OVERWRITE govw.ns.t VALUES " +
      "('c1', 0, 'new'), ('c9', 0, 'new')")
    assert(t.latestVersion.get == vBefore + 1, "one OVERWRITE = one commit")
    val got = spark.sql("SELECT conv_id, text FROM govw.ns.t ORDER BY conv_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("c1", "new"), ("c9", "new")))
    // merge-on-read: the old generation is tombstoned, not erased
    assert(t.readAsOf(vBefore).count() == 3, "time travel serves the pre-swap state")
    val feed = t.changesSince(vBefore)
    assert(feed.where(col("op") === "D").count() == 3, "every old key tombstoned")
    assert(feed.where(col("op") === "U").count() == 2)
    // df.write SaveMode.Overwrite takes the same atomic path
    val v2 = t.latestVersion.get
    Seq(("c7", 0, "v1-path")).toDF("conv_id", "turn_idx", "text")
      .write.format("graftlake").mode("overwrite").save(s"$rootDir/ns/t")
    assert(t.latestVersion.get == v2 + 1)
    assert(t.read().select("conv_id").collect().map(_.getString(0)).toSeq == Seq("c7"))
    // an overwrite does not take caller lsns: the generation defines its own
    val e = intercept[IllegalArgumentException] {
      t.overwriteWith(Seq(("c8", 0, 5L)).toDF("conv_id", "turn_idx", "lsn"))
    }
    assert(e.getMessage.contains("plain payload"))
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE prunes target rows absent from the source") {
    val rootDir = Files.createTempDirectory("graft-nms").toString
    spark.conf.set("spark.sql.catalog.gnms", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnms.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnms.ns")
    spark.sql("CREATE TABLE gnms.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gnms.ns.t VALUES " +
      "('c1', 0, 'stays'), ('c2', 0, 'updated by source'), ('c3', 0, 'not in source')")
    Seq(("c1", 0, "stays"), ("c2", 0, "fresh"))
      .toDF("conv_id", "turn_idx", "text").createOrReplaceTempView("nms_src")
    // the full sync idiom: matched rows take the source's values, target
    // rows the source no longer carries are deleted — one statement, one epoch
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    val vBefore = t.latestVersion.get
    spark.sql(
      """MERGE INTO gnms.ns.t t USING nms_src s
        |  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        |  WHEN MATCHED THEN UPDATE SET text = s.text
        |  WHEN NOT MATCHED THEN INSERT *
        |  WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT conv_id, text FROM gnms.ns.t ORDER BY conv_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("c1", "stays"), ("c2", "fresh")))
    assert(t.latestVersion.get == vBefore + 1, "one MERGE = one commit")
  }

  test("SQL DELETE with a subquery predicate falls back to the row-level path") {
    val rootDir = Files.createTempDirectory("graft-sqd").toString
    spark.conf.set("spark.sql.catalog.gsqd", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqd.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsqd.ns")
    spark.sql("CREATE TABLE gsqd.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gsqd.ns.t VALUES " +
      "('c1', 0, 'keep'), ('c2', 0, 'doomed'), ('c3', 0, 'doomed')")
    Seq("c2", "c3").toDF("doomed_id").createOrReplaceTempView("sqd_doomed")
    // untranslatable to the v1 Filter algebra (canDeleteWhere refuses), so
    // Spark rewrites through SupportsRowLevelOperations/SupportsDelta
    spark.sql("DELETE FROM gsqd.ns.t WHERE conv_id IN (SELECT doomed_id FROM sqd_doomed)")
    assert(spark.sql("SELECT conv_id FROM gsqd.ns.t").collect()
      .map(_.getString(0)).toSeq == Seq("c1"))
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    assert(t.changesSince(t.latestVersion.get - 1)
      .where(col("op") === "D").count() == 2, "subquery DELETE is tombstones too")
  }

  test("row-level commits are serializable: an interleaved commit aborts loudly") {
    val t = new LakeTable(spark, Files.createTempDirectory("graft-iso").toString, 4)
    t.merge(TranscriptWal.synthetic(spark, 100, 4), "t", 1)
    val pinned = t.currentSnapshot.get
    // a writer sneaks in a commit after the row-level operation pinned
    t.merge(TranscriptWal.synthetic(spark, 50, 4, lsnOffset = 1000000L), "t", 2)
    val e = intercept[graft.lake.CommitConflictException] {
      t.commitPinned(pinned, "sql-merge", Map.empty, 1L, 0L, 0L, 0L)
    }
    assert(e.getMessage.contains("re-run"))
  }

  test("SQL bucket() function agrees with the writer's physical routing") {
    val rootDir = Files.createTempDirectory("graft-fn").toString
    spark.conf.set("spark.sql.catalog.gfn", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfn.root", rootDir)
    val ids = (0 until 50).map(i => s"conv$i")
    val got = spark.sql(
      s"SELECT id, gfn.system.bucket(16, id) AS b FROM VALUES " +
        ids.map(i => s"('$i')").mkString(",") + " AS t(id)")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach(id => assert(got(id) == LakeTable.bucketOf(id, 16),
      s"SQL bucket() must match the writer expression for $id"))
    assert(spark.sql("SELECT gfn.system.bucket(16, CAST(NULL AS STRING))")
      .collect()(0).isNullAt(0), "null key yields null, never a bucket")
  }

  test("SQL CALL procedures run compact and vacuum with no paths or Scala API") {
    val rootDir = Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.gproc", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gproc.ns")
    spark.sql("CREATE TABLE gproc.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO gproc.ns.t VALUES ('c$i', 0, 'row $i')"))
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    assert(t.currentSnapshot.get.buckets.values.exists(_.deltas.nonEmpty))
    val v = spark.sql("CALL gproc.system.compact(table => 'ns.t')")
      .collect()(0).getLong(0)
    assert(v == t.latestVersion.get, "compact returns the new version")
    assert(t.currentSnapshot.get.buckets.values.forall(_.deltas.isEmpty))
    // age-based retention first: everything is recent, so nothing expires
    val aged = spark.sql("CALL gproc.system.vacuum(table => 'ns.t', keep => 1, " +
      "retain_age_ms => 3600000)").collect()(0)
    assert(aged.getInt(0) == 0, s"recent snapshots survive age retention: $aged")
    val row = spark.sql("CALL gproc.system.vacuum(table => 'ns.t', keep => 1)")
      .collect()(0)
    assert(row.getInt(0) > 0 && row.getInt(1) > 0, s"vacuum reports work: $row")
    assert(spark.sql("SELECT count(*) FROM gproc.ns.t").collect()(0).getLong(0) == 3,
      "maintenance preserves the live state")
    intercept[Exception] { spark.sql("CALL gproc.system.nope()").collect() }
  }

  test("SQL CALL system.rollback restores an earlier version THROUGH the change feed; history lists it") {
    val rootDir = Files.createTempDirectory("graft-rb").toString
    spark.conf.set("spark.sql.catalog.grb", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grb.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grb.ns")
    spark.sql("CREATE TABLE grb.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO grb.ns.t VALUES ('c1', 0, 'keep'), ('c2', 0, 'edit me')")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    val mark = t.latestVersion.get
    spark.sql("DELETE FROM grb.ns.t WHERE conv_id = 'c1'")
    spark.sql("INSERT INTO grb.ns.t VALUES ('c2', 0, 'edited'), ('c3', 0, 'born late')")
    val row = spark.sql(
      s"CALL grb.system.rollback(table => 'ns.t', version => $mark)").collect()(0)
    assert(row.getLong(0) == mark && row.getLong(1) == t.latestVersion.get)
    // diff-based: ONLY changed keys move — c1 reinserted + c2 restored as
    // upserts, late-born c3 tombstoned; untouched keys write nothing
    assert(row.getLong(2) == 2 && row.getLong(3) == 1, s"diff sizes: $row")
    val state = spark.sql("SELECT conv_id, text FROM grb.ns.t ORDER BY conv_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(state == Seq(("c1", "keep"), ("c2", "edit me")))
    // the reversal IS change-feed visible (a metadata-only RESTORE wouldn't
    // be): the rollback commit carries the delete + the two restores
    val feed = t.changesSince(t.latestVersion.get - 1)
    assert(feed.where(col("op") === "D").select("conv_id")
      .collect().map(_.getString(0)).toSeq == Seq("c3"))
    assert(feed.where(col("op") === "U").count() == 2)
    // rolling back to the CURRENT version is a no-op, not a commit
    val before = t.latestVersion.get
    spark.sql(s"CALL grb.system.rollback(table => 'ns.t', version => $before)").collect()
    assert(t.latestVersion.get == before)
    // post-mark additive column: a row differing ONLY in it still rolls back
    // — run under touchedKeysCap=0 so THIS rollback exercises the
    // full-diff fallback (the earlier ones took the change-feed-bounded
    // touched-key path); both must restore the identical state
    spark.sql("ALTER TABLE grb.ns.t ADD COLUMN note STRING")
    spark.sql("INSERT INTO grb.ns.t VALUES ('c1', 0, 'keep', 'annotated')")
    spark.conf.set("spark.graft.rollback.touchedKeysCap", "0")
    try spark.sql(s"CALL grb.system.rollback(table => 'ns.t', version => $mark)").collect()
    finally spark.conf.unset("spark.graft.rollback.touchedKeysCap")
    val afterEvo = spark.sql("SELECT conv_id, text, note FROM grb.ns.t ORDER BY conv_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.isNullAt(2))).toSeq
    assert(afterEvo == Seq(("c1", "keep", true), ("c2", "edit me", true)),
      "schema keeps the evolved column; restored rows read null in it")
    // history procedure: newest first, monotone commit times, rollback on top
    val h = spark.sql("CALL grb.system.history(table => 'ns.t')").collect()
    assert(h.map(_.getLong(0)).toSeq == h.map(_.getLong(0)).sortBy(-_).toSeq)
    assert(h.head.getLong(0) == t.latestVersion.get)
    val times = h.reverse.map(_.getAs[Long]("commit_time_ms"))
    assert(times.zip(times.tail).forall { case (a, b) => a < b },
      "commit times strictly increase across versions")
    // a rollback past retention / to a never-written version fails loudly
    intercept[Exception] {
      spark.sql("CALL grb.system.rollback(table => 'ns.t', version => 999)").collect()
    }
  }

  test("MERGE deltas are clustered by the table's bucket function: O(buckets) files per epoch") {
    val rootDir = Files.createTempDirectory("graft-dist").toString
    spark.conf.set("spark.sql.catalog.gdist", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdist.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdist.ns")
    spark.sql("CREATE TABLE gdist.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gdist.ns.t SELECT concat('c', id), 0, concat('v', id) FROM range(200)")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    def nFiles = t.history().orderBy(col("version").desc)
      .select("n_files").first().getLong(0)
    val before = nFiles
    // a deliberately many-partition source: WITHOUT the write's clustered
    // distribution every write task opens a file per bucket it sees
    // (~16 tasks × 4 buckets here); the declared bucket(n, conv_id)
    // clustering shuffles the delta once so each bucket lands in ONE task
    spark.range(200).selectExpr("concat('c', id) AS conv_id",
      "0 AS turn_idx", "concat('w', id) AS new_text")
      .repartition(16).createOrReplaceTempView("dist_src")
    spark.sql("""MERGE INTO gdist.ns.t t USING dist_src s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED THEN UPDATE SET text = s.new_text""")
    val added = nFiles - before
    assert(added > 0 && added <= 4,
      s"clustered row-level write must add at most one delta file per bucket, added $added")
    assert(spark.sql("SELECT count(*) FROM gdist.ns.t WHERE text LIKE 'w%'")
      .first().getLong(0) == 200, "clustering must not change MERGE semantics")
  }

  test("TIMESTAMP AS OF resolves the latest snapshot committed at or before it") {
    val rootDir = Files.createTempDirectory("graft-tsasof").toString
    spark.conf.set("spark.sql.catalog.gts", classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gts.root", rootDir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gts.ns")
    spark.sql("CREATE TABLE gts.ns.t (conv_id STRING, turn_idx INT, text STRING) " +
      "USING graftlake PARTITIONED BY (bucket(4, conv_id))")
    spark.sql("INSERT INTO gts.ns.t VALUES ('c1', 0, 'first')")
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql("INSERT INTO gts.ns.t VALUES ('c1', 0, 'second')")
    val t = LakeTable.open(spark, s"$rootDir/ns/t")
    // Scala surface: between the two inserts → the first state
    assert(t.readAsOfTimestamp(between)
      .select("text").collect().map(_.getString(0)).toSeq == Seq("first"))
    assert(t.readAsOfTimestamp(System.currentTimeMillis())
      .select("text").collect().map(_.getString(0)).toSeq == Seq("second"))
    // SQL surface (timestamp literal is UTC; session TZ is UTC)
    val lit = new java.sql.Timestamp(between).toInstant
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(s"SELECT text FROM gts.ns.t TIMESTAMP AS OF '$lit'")
      .collect().map(_.getString(0)).toSeq == Seq("first"))
    // a time before the first commit fails loudly rather than lying
    intercept[Exception] {
      spark.sql("SELECT * FROM gts.ns.t TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
  }
}
