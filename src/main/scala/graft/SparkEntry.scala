package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.IngestConfig
import graft.ops.{CdcOps, DedupOps, MultimodalOps, SimilarityOps, TextOps}
import graft.stream.CdcIngestJob
import graft.wal.TranscriptWal

/** Driver contract — one entry per implemented operator (SURVEY.md §2), each
  * with a DuckDB-equivalent oracle in [[oracleSql]]. Column names and value
  * rounding are kept bit-identical between the Spark query and the oracle.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scratch lake dirs for the self-contained queries, deleted on JVM exit.
    * Deletion cannot happen inside the query (the returned DataFrame reads
    * the lake lazily), so accumulation was leaking a temp tree per
    * invocation — a shutdown hook reclaims them all.
    */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratchDirs.forEach { root =>
      try
        scala.util.Using.resource(Files.walk(root)) { w =>
          import scala.jdk.CollectionConverters._
          w.iterator().asScala.toVector.sortBy(-_.getNameCount)
            .foreach(p => Files.deleteIfExists(p))
        }
      catch { case _: Throwable => () }
    }))

  private def scratchDir(prefix: String): String = {
    // Prefer tmpfs (same policy as Bench.benchRoot): this host's virtio disk
    // throttles unpredictably under concurrent writeback, and scratch lakes
    // are per-invocation throwaways — nothing needs to survive a reboot.
    val base = java.nio.file.Paths.get("/dev/shm")
    val d =
      if (Files.isDirectory(base) && Files.isWritable(base)) {
        val root = base.resolve("graft-scratch")
        Files.createDirectories(root)
        Files.createTempDirectory(root, prefix)
      } else Files.createTempDirectory(prefix)
    scratchDirs.add(d)
    d.toString
  }

  /** Flagship: full CDC apply — derive the WAL from `events`, replay it
    * through the engine into a fresh GraftLake table, read the final state
    * back. Driver smoke-checks rows>0 at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_cdc_apply")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- CDC core (SURVEY §2.2 F1, §2.3 J7, §2.9) --------------------------

    // End-to-end engine: WAL → dedup → arbitrate → bucketed idempotent MERGE
    // → final state. The oracle recomputes the same final state in pure SQL.
    "q_cdc_apply" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // TIME TRAVEL — two commits, read the table AS OF the first: the old
    // snapshot's merge-on-read state must equal the arbitrated state of the
    // first batch alone.
    "q_time_travel" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val wal = TranscriptWal.fromEvents(s, dir).cache()
      val Array(lo, hi) = wal.agg(min(col("lsn")), max(col("lsn")))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val split = Math.floorDiv(lo + hi, 2L)
      val t = new graft.lake.LakeTable(s, s"$work/t", numBuckets = 16)
      t.merge(wal.where(col("lsn") < split), "t", 1)
      t.merge(wal.where(col("lsn") >= split), "t", 2)
      wal.unpersist() // the result reads the lake, not the cached WAL
      t.readAsOf(1)
        .select("conv_id", "turn_idx", "role", "text")
        .orderBy("conv_id", "turn_idx")
    }),

    // INCREMENTAL READ (change-data-feed) — the rows committed after v1 are
    // exactly the second batch, with their commit version attached.
    "q_changes_since" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val wal = TranscriptWal.fromEvents(s, dir).cache()
      val Array(lo, hi) = wal.agg(min(col("lsn")), max(col("lsn")))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val split = Math.floorDiv(lo + hi, 2L)
      val t = new graft.lake.LakeTable(s, s"$work/t", numBuckets = 16)
      t.merge(wal.where(col("lsn") < split), "t", 1)
      t.merge(wal.where(col("lsn") >= split), "t", 2)
      wal.unpersist() // the result reads the lake, not the cached WAL
      t.changesSince(1)
        .select(col("conv_id"), col("turn_idx"), col("op"),
          col("_lsn").as("lsn"), col("role"), col("text"),
          col("_commit_version").as("commit_version"))
        .orderBy("conv_id", "turn_idx", "lsn", "op")
    }),

    // DSv2 CONNECTOR — the same CDC apply, but the final state is read back
    // through `spark.read.format("graftlake")` over the COMPACTED table:
    // exercises the columnar BatchScan path (tombstone-split bases, pruned
    // file index) end-to-end against the same oracle as q_cdc_apply.
    "q_dsv2_scan" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      table.compactAll() // all buckets clean+split ⇒ columnar eligibility
      s.read.format("graftlake").load(table.path)
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL WRITE SURFACE — INSERT INTO a graftlake view commits an upsert
    // epoch; fresh keys append, an existing key is superseded by the
    // auto-allocated lsn (last-writer-wins against all prior state).
    "q_sql_insert" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      val view = s"ins_${Math.abs(work.hashCode)}"
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view " +
        s"USING graftlake OPTIONS (path '${table.path}')")
      s.sql(s"INSERT INTO $view VALUES " +
        "('zz_sql', 0, 'user', 'inserted via sql', NULL, TIMESTAMP'2024-06-01 00:00:00')," +
        "('zz_sql', 1, 'assistant', 'ack', NULL, TIMESTAMP'2024-06-01 00:00:01')")
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL DELETE SURFACE — tombstone-merge of the live rows matching a
    // payload predicate (fresh lsn, O(matched), no rewrite): the applied
    // state minus every user turn with turn_idx >= 3.
    "q_sql_delete" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      table.deleteWhere(col("role") === "user" && col("turn_idx") >= 3)
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL MERGE SURFACE — `MERGE INTO` via Spark 4's delta-based row-level
    // operation (SupportsDelta): matched-delete, matched-update and
    // not-matched-insert arms in ONE statement, landed as one O(changed)
    // tombstone+upsert epoch (never a rewrite). The reference's write-back
    // loop (S10) expressed in pure SQL.
    "q_sql_merge" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      val cat = s"gm${Math.abs(work.hashCode)}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      // The D-arm and U-arm conditions are disjoint, so both fold into ONE
      // scan of the live state with a conditional projection (r7) — the
      // union form read the merge-on-read table twice inside the MERGE job.
      // Row set is identical; MERGE semantics are per-key, order-free.
      val live = table.read()
      val isDel = col("role") === "user" && col("turn_idx") >= 3
      val isUpd = col("role") === "assistant" && col("turn_idx") === 1
      val src = live.where(isDel || isUpd)
        .select(col("conv_id"), col("turn_idx"),
          when(isUpd, concat(col("text"), lit(" [merged]")))
            .otherwise(lit(null).cast("string")).as("new_text"),
          lit(null).cast("string").as("role"),
          lit(null).cast("string").as("tool"), lit(null).cast("timestamp").as("ts"),
          when(isDel, lit("D")).otherwise(lit("U")).as("src_op"))
        .unionByName(s.sql(
          "SELECT 'zz_merge' AS conv_id, 0 AS turn_idx, 'merged in' AS new_text, " +
            "'user' AS role, CAST(NULL AS STRING) AS tool, " +
            "TIMESTAMP'2024-06-01 00:00:00' AS ts, 'I' AS src_op"))
      val view = s"mrg_${Math.abs(work.hashCode)}"
      src.createOrReplaceTempView(view)
      s.sql(
        s"""MERGE INTO $cat.ns.t t USING $view s
           |  ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
           |  WHEN MATCHED AND s.src_op = 'D' THEN DELETE
           |  WHEN MATCHED AND s.src_op = 'U' THEN UPDATE SET text = s.new_text
           |  WHEN NOT MATCHED AND s.src_op = 'I' THEN
           |    INSERT (conv_id, turn_idx, role, text, tool, ts)
           |    VALUES (s.conv_id, s.turn_idx, s.role, s.new_text, s.tool, s.ts)
           |""".stripMargin)
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL UPDATE SURFACE — row-level UPDATE as delete+reinsert under one
    // lsn pair (deterministic winner), matched against a pinned snapshot.
    "q_sql_update" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      val cat = s"gu${Math.abs(work.hashCode)}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      s.sql(s"UPDATE $cat.ns.t SET text = concat(text, ' [edited]') " +
        "WHERE role = 'user' AND turn_idx = 0")
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL OVERWRITE SURFACE — `INSERT OVERWRITE` as ONE atomic
    // generation-swap epoch: every live key tombstoned at max_lsn+1, the
    // new rows landed above, merge-on-read (history + change feed keep the
    // old generation). Self-referencing SELECT is safe: the scan reads the
    // pinned pre-swap version, the commit is a new version.
    "q_sql_overwrite" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      val cat = s"go${Math.abs(work.hashCode)}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      s.sql(s"INSERT OVERWRITE $cat.ns.t " +
        s"SELECT conv_id, turn_idx, role, concat('kept: ', text) AS text, tool, ts " +
        s"FROM $cat.ns.t WHERE role = 'purchase'")
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // SQL ROLLBACK SURFACE — `CALL system.rollback` restores an earlier
    // version AS A NEW COMMIT: a DELETE and an INSERT land after the mark,
    // the rollback reverses both, and the reversal is itself change-feed
    // visible (unlike a metadata-only RESTORE). Final state == the state at
    // the mark, i.e. the plain applied WAL.
    "q_sql_rollback" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/lake/ns/t",
        checkpointPath = s"$work/cp", numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir)
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      val mark = table.latestVersion.get
      val cat = s"gr${Math.abs(work.hashCode)}"
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.lake.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", s"$work/lake")
      s.sql(s"DELETE FROM $cat.ns.t WHERE role = 'user' AND turn_idx >= 3")
      s.sql(s"INSERT INTO $cat.ns.t VALUES " +
        "('zz_gone', 0, 'user', 'will be rolled back', NULL, TIMESTAMP'2024-06-01 00:00:00')")
      s.sql(s"CALL $cat.system.rollback(table => 'ns.t', version => $mark)")
      table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .orderBy("conv_id", "turn_idx")
    }),

    // CHANGE FEED, TIME-WINDOWED — raw change rows whose event time falls in
    // the middle half of the stream, served with manifest-stat file skipping
    // (exact: the feed is unarbitrated).
    "q_changes_range" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val wal = TranscriptWal.fromEvents(s, dir).cache()
      val Array(lo, hi) = wal.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val Array(lsnLo, lsnHi) = wal.agg(min(col("lsn")), max(col("lsn")))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val split = Math.floorDiv(lsnLo + lsnHi, 2L)
      val t = new graft.lake.LakeTable(s, s"$work/t", numBuckets = 16)
      t.merge(wal.where(col("lsn") < split), "t", 1)
      t.merge(wal.where(col("lsn") >= split), "t", 2)
      wal.unpersist()
      val span = hi - lo
      t.changesInRange(lo + span / 4, lo + (3 * span) / 4)
        .select(col("conv_id"), col("turn_idx"), col("op"),
          col("_lsn").as("lsn"), col("role"))
        .orderBy("conv_id", "turn_idx", "lsn", "op")
    }),

    // ARBITRATED TIME-RANGE READ — live rows whose (winning) event time
    // falls in the window; clean buckets skip non-intersecting base files
    // from the manifest alone.
    "q_time_range" -> ((s, dir) => {
      val work = scratchDir("graftlake")
      val conf = IngestConfig(tablePath = s"$work/t", checkpointPath = s"$work/cp",
        numBuckets = 16, enforceWatermark = false)
      val wal = TranscriptWal.fromEvents(s, dir).cache()
      val Array(lo, hi) = wal.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val table = CdcIngestJob.replayBatch(s, wal, conf)
      wal.unpersist()
      val span = hi - lo
      table.readTimeRange(lo + span / 4, lo + (3 * span) / 4)
        .select("conv_id", "turn_idx", "role", "text")
        .orderBy("conv_id", "turn_idx")
    }),

    // F1 — exact duplicate events (same key+lsn) collapse to one.
    "q_cdc_dedup" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.dedupByKeyLsn(wal.unionAll(wal))
        .groupBy("conv_id").agg(count(lit(1)).as("n_events"))
        .orderBy("conv_id")
    }),

    // J7 — last-writer-wins arbitration per merge key (max lsn).
    "q_cdc_arbitrate" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.arbitrateLastWriterWins(wal)
        .select("conv_id", "turn_idx", "op", "lsn", "role", "text")
        .orderBy("conv_id", "turn_idx")
    }),

    // W1-W4 kernel — gap sessionization (1h) per conversation.
    "q_cdc_sessionize" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.sessionizeByGap(wal, "ts", 3600)
        .groupBy("conv_id")
        .agg(max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("conv_id")
    }),

    // §2.9 — watermark late-drop with counting (7-day delay vs max ts).
    "q_cdc_late" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val hw = wal.agg(max(unix_micros(col("commit_ts")))).collect()(0).getLong(0)
      CdcOps.dropLate(wal, hw, expr("INTERVAL '7' DAY"))
        .groupBy("conv_id").agg(count(lit(1)).as("n_kept"))
        .orderBy("conv_id")
    }),

    // A9 — per-conversation lineage metrics.
    "q_cdc_lineage" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.lineageMetrics(wal).orderBy("conv_id")
    }),

    // J4 analog — boilerplate: text repeated across >= 12 distinct convs.
    "q_cdc_boilerplate" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.flagBoilerplate(wal, minConvs = 12)
        .where(col("is_boilerplate"))
        .select("text").distinct()
        .orderBy("text")
    }),

    // F11 — full 11-rule sanitization chain; the fixture plants one instance
    // of every default PII class (email, url, mac, ipv6, ipv4, card, imei,
    // digit-run, national-id, intl phone, generic phone).
    "q_cdc_sanitize" -> ((s, dir) => {
      val id = col("doc_id")
      val docs = tbl(s, dir, "documents").select(
        id,
        concat(
          lit("mail u"), id.cast("string"), lit("@example.com"),
          lit(" ph +82-10-"), (id % 10000).cast("string"),
          lit(" id AB"), (lit(1000000) + id % 1000000).cast("string"),
          lit(" card 4242-4242-4242-"), lpad((id % 10000).cast("string"), 4, "0"),
          lit(" imei 3512345"), lpad((id % 100000000).cast("string"), 8, "0"),
          lit(" acct 9"), lpad((id % 100000).cast("string"), 11, "0"),
          lit(" ip 10.0."), (id % 256).cast("string"), lit(".7"),
          lit(" ip6 fe80:abc1:234:5678:9abc:def0:1234:"), (id % 10).cast("string"),
          lit(" mac 0a:1b:2c:3d:4e:5f"),
          lit(" tel 010-123-456-"), lpad((id % 10000).cast("string"), 4, "0"),
          lit(" see https://ex.com/"), id.cast("string"),
          lit(" t "), substring(col("text"), 1, 40)).as("text"))
      CdcOps.sanitize(docs).orderBy("doc_id")
    }),

    // O1/W8 — canonical order + replay-stable global ids on the final state.
    "q_cdc_order" -> ((s, dir) => {
      val state = TranscriptWal.expectedState(TranscriptWal.fromEvents(s, dir))
      CdcOps.withGlobalId(state)
        .select("global_id", "conv_id", "turn_idx", "role")
        .orderBy("conv_id", "turn_idx")
    }),

    // W5/W7/J1 — lag/lead neighbor comparison: inter-event gap stats per conv.
    "q_window_lag" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val w = Window.partitionBy("conv_id").orderBy("lsn")
      // exact integer microseconds end-to-end; divide once at presentation
      wal.withColumn("gap", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .groupBy("conv_id")
        .agg(round(sum(col("gap")) / (count(col("gap")) * lit(1000000.0)), 2).as("avg_gap_s"),
          round(max(col("gap")) / 1000000.0, 2).as("max_gap_s"))
        .orderBy("conv_id")
    }),

    // A2/A9 — EXACT interpolated percentiles of inter-event gaps per conv
    // (p50/p95 latency stats — the ops-dashboard aggregation). Spark's
    // `percentile` and DuckDB's `quantile_cont` share the type-7 linear
    // interpolation definition, but the two engines may evaluate
    // a+(b-a)*f vs a*(1-f)+b*f — a one-ulp difference that flips a bare
    // floor() at exact-integer boundaries. Quantizing to a COARSER grid with
    // a half-offset (floor(x/1000 + 0.5) — round-half-up milliseconds) puts
    // every boundary 500 µs away from any interpolated value, so a ulp can
    // never flip the compared integer.
    "q_percentile_gap" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val w = Window.partitionBy("conv_id").orderBy("lsn")
      wal.withColumn("gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .where(col("gap").isNotNull)
        .groupBy("conv_id")
        .agg(
          floor(expr("percentile(gap, 0.5)") / 1000.0 + 0.5).cast("long").as("p50_millis"),
          floor(expr("percentile(gap, 0.95)") / 1000.0 + 0.5).cast("long").as("p95_millis"),
          count(lit(1)).as("n_gaps"))
        .orderBy("conv_id")
    }),

    // A1 — mode statistics: most frequent role per conversation
    // (deterministic tie-break on role).
    "q_mode_role" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val counts = wal.groupBy("conv_id", "role").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("conv_id").orderBy(desc("n"), col("role"))
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("conv_id", "role", "n").orderBy("conv_id")
    }),

    // A8 — distinct-style ranking: dense_rank of (role, tool) combos by
    // global frequency (the heading-level assignment kernel).
    "q_rank_styles" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val styles = wal.groupBy("role", "tool").agg(count(lit(1)).as("n"))
      styles.withColumn("style_rank",
          dense_rank().over(Window.orderBy(desc("n"), col("role"))))
        .select("role", "tool", "n", "style_rank")
        .orderBy("style_rank")
    }),

    // J7 — levenshtein arbitration between two sources of truth (the hybrid
    // stream-vs-OCR trust rule): similarity >= 0.5 trusts the stream.
    "q_levenshtein" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"), substring(col("text"), 1, 60).as("t"))
      val a = d.select(col("doc_id").as("a_id"), col("t").as("ta"))
      val b = d.select((col("doc_id") - 1).as("a_id"), col("doc_id").as("b_id"),
        col("t").as("tb"))
      a.join(b, "a_id")
        .withColumn("lev", levenshtein(col("ta"), col("tb")))
        .withColumn("sim", round(lit(1.0) -
          col("lev") / greatest(length(col("ta")), length(col("tb"))), 4))
        .withColumn("trust_stream", col("sim") >= 0.5)
        .select("a_id", "b_id", "lev", "sim", "trust_stream")
        .orderBy("a_id")
    }),

    // W6/O6 analog — gaps-and-islands: longest consecutive turn_idx run per
    // conversation (label-sequence continuation detection).
    "q_longest_run" -> ((s, dir) => {
      val d = TranscriptWal.fromEvents(s, dir)
        .select("conv_id", "turn_idx").distinct()
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      d.withColumn("grp", col("turn_idx") - row_number().over(w))
        .groupBy("conv_id", "grp").agg(count(lit(1)).as("cnt"))
        .groupBy("conv_id").agg(max(col("cnt")).as("longest_run"))
        .orderBy("conv_id")
    }),

    // S9 — plain-text report sink: ordered traversal per conversation
    // rendered to one document (distributed, no driver collect).
    "q_export_text" -> ((s, dir) => {
      val state = TranscriptWal.expectedState(TranscriptWal.fromEvents(s, dir))
      graft.sink.TranscriptExport.toText(state).orderBy("conv_id")
    }),

    // S7 — markdown report sink (escaping + tool annotations). Rows-only.
    "q_export_markdown" -> ((s, dir) => {
      val state = TranscriptWal.expectedState(TranscriptWal.fromEvents(s, dir))
      graft.sink.TranscriptExport.toMarkdown(state).orderBy("conv_id")
    }),

    // §3.3 — triage routing cascade: per-conv signals → route column.
    "q_route_triage" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      graft.ops.Route.triage(wal, deleteHeavy = 0.21, updateStorm = 100)
        .groupBy("route").agg(count(lit(1)).as("n_convs"))
        .orderBy("route")
    }),

    // S2 — corrupt-record policy: JSON WAL with planted garbage; clean rows
    // pass, rejects counted (warn-and-continue).
    "q_corrupt_source" -> ((s, dir) => {
      val work = scratchDir("corruptwal")
      val good = TranscriptWal.fromEvents(s, dir).where(col("lsn") < 100)
      good.coalesce(1).write.mode("overwrite").json(s"$work/wal")
      val bad = Seq("{not json at all", """{"op":"U"}""", """{"lsn":5}""",
        """{"op":"X","lsn":"NaN","conv_id":7}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/wal/zz-corrupt.json"),
        bad.mkString("\n").getBytes)
      val (clean, corrupt) = graft.wal.WalSource.readJson(s, s"$work/wal")
      clean.groupBy("op").agg(count(lit(1)).as("n_clean"))
        .withColumn("n_corrupt", lit(corrupt.count()))
        .orderBy("op")
    }),

    // §2.10 — typed Aggregator: bounded top-3 lsn heap per conversation.
    "q_topk_agg" -> ((s, dir) => {
      import s.implicits._
      val top3 = udaf(new graft.ops.Aggregators.TopKLongs(3))
      TranscriptWal.fromEvents(s, dir)
        .groupBy("conv_id").agg(top3(col("lsn")).as("t"))
        .select(col("conv_id"),
          element_at(col("t"), 1).as("lsn1"),
          element_at(col("t"), 2).as("lsn2"),
          element_at(col("t"), 3).as("lsn3"))
        .orderBy("conv_id")
    }),

    // ---- Relational coverage (scans/aggs/joins, SURVEY §2.1/2.3/2.4/2.6) ---

    // A1-style frequency stats: TPC-H Q1 pricing summary.
    "q1_agg" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Broadcast-join chain: revenue per nation (customer ⋈ orders ⋈ nation).
    "q_join_nation_rev" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // O4 — top-k: 10 highest-value customers (deterministic tie-break).
    "q_topk_customers" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      o.groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(desc("total"), col("o_custkey"))
        .limit(10)
    }),

    // U1 — anti-join: customers with no URGENT order, per market segment.
    "q_anti_join" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // F9 — explode/split generator: top-20 token frequencies over documents.
    "q_explode_tokens" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("word"))
        .limit(20)
    }),

    // ---- Training-data pipeline ops over documents -------------------------

    // Exact dedup by content hash: survivor = min doc_id per text.
    "q_dedup_exact" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id").orderBy("doc_id")
    }),

    // Document fingerprinting (md5 content hash).
    "q_fingerprint" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy("doc_id").limit(100)
    }),

    // Per-doc token counts: whitespace + BPE-ish subword estimate.
    "q_text_metrics" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeishTokenCount(col("text")).as("n_tokens_bpeish"))
        .orderBy("doc_id")
    }),

    // Language-ID by stopword-marker voting, cross-tabbed vs actual lang.
    // Tokens in their own projection (shinglesFromTokens perf contract):
    // inlined, each language's marker filter re-runs the regex split.
    "q_langid" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("lang"), TextOps.tokens(lower(col("text"))).as("__toks"))
        .withColumn("lang_pred", TextOps.langIdFromTokens(col("__toks")))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    }),

    // Quality scoring (length/punct/stopword/replacement-char) — rows-only.
    "q_quality_score" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // n-gram (token-set) Jaccard similarity: all pairs among doc_id<40.
    "q_jaccard_pairs" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").where(col("doc_id") < 40)
      val ids = d.select(col("doc_id").as("a_id"))
        .crossJoin(d.select(col("doc_id").as("b_id")))
        .where(col("a_id") < col("b_id"))
      DedupOps.jaccardVerify(d, ids, threshold = 0.9, shingleWidth = 1)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    }),

    // MinHash+LSH near-dup pipeline on an augmented corpus (plants true
    // near-copies) → LSH candidates → exact Jaccard verify, filtered to the
    // planted pairs. HARD-ORACLED: DuckDB recomputes each planted pair's
    // exact shingle-set Jaccard, so LSH recall on J≥0.5 pairs is a
    // correctness gate, not a rows-only check. bands=16 (r=2) makes the
    // miss probability at the corpus's minimum planted J (0.8, measured at
    // every SF) ~1e-7 per pair — deterministic-green, not luck.
    "q_near_dup_lsh" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("doc_id", "text")
      val copies = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text"))
      DedupOps.nearDuplicates(d.unionAll(copies), threshold = 0.5, bands = 16)
        .where(col("b_id") === col("a_id") + 100000)
        .orderBy("a_id", "b_id")
    }),

    // Duplicate-CLUSTER resolution: near-dup pairs (exact token-set Jaccard
    // over a corpus with planted copies) → connected components via
    // iterative min-label propagation → canonical survivor per component.
    // Oracled against a DuckDB RECURSIVE reachability CTE computing the
    // same min-reachable-id labels.
    "q_dup_clusters" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").where(col("doc_id") < 60)
        .select("doc_id", "text")
      val all = d.unionAll(d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker")).as("text")))
      val ids = all.select(col("doc_id").as("a_id"))
        .crossJoin(all.select(col("doc_id").as("b_id")))
        .where(col("a_id") < col("b_id"))
      // width-3 shingles: token-set (width-1) Jaccard at 0.5 chains random
      // docs through shared stopwords into one giant blob (measured: 116 of
      // 120 nodes in one component); 3-gram shingles keep only real overlap
      val pairs = DedupOps.jaccardVerify(all, ids, threshold = 0.5, shingleWidth = 3)
      DedupOps.dupClusters(pairs.select("a_id", "b_id"))
        .withColumn("is_survivor", col("id") === col("cluster_id"))
        .orderBy("id")
    }),

    // SimHash near-dup buckets on the same augmented corpus. Rows-only.
    "q_simhash" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("doc_id", "text")
      val copies = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" ").as("sep")).as("text")) // same token set
      DedupOps.simHashDuplicates(d.unionAll(copies))
        .select(col("simhash"), col("n"),
          array_min(col("ids")).as("min_id"), array_max(col("ids")).as("max_id"))
        .orderBy("min_id")
    }),

    // SimHash banded near-dup with native codegen hamming64 (Hamming<=3);
    // planted copies with one flipped token land within distance. Rows-only.
    "q_simhash_near" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").select("doc_id", "text")
      val copies = d.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" flip")).as("text"))
      graft.ops.DedupOps.simHashNearDuplicates(d.unionAll(copies), maxHamming = 7)
        .where(col("b_id") === col("a_id") + 100000)
        .orderBy("a_id")
    }),

    // Brute-force cosine top-5 neighbors for the first 5 vectors
    // (integer-quantized for cross-engine exactness).
    "q_ann_brute" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 5)
        .orderBy("query_id", "rank")
    }),

    // Embedding-cosine near-dup (5th dedup modality): plant positively-scaled
    // copies (cosine ≡ 1 up to quantization — same LSH bucket
    // DETERMINISTICALLY, every projection keeps its sign), find them via
    // bucketed exact cosine, and HARD-ORACLE the planted pairs' quantized
    // cosine in DuckDB — bucket recall is a correctness gate.
    "q_embed_dedup" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
      SimilarityOps.cosineNearDuplicates(e.unionAll(copies), threshold = 0.99)
        .where(col("b_id") === col("a_id") + 100000)
        .orderBy("a_id")
    }),

    // LSH-bucketed ANN (the 100 TB plan): exact cosine only inside colliding
    // random-hyperplane buckets. Rows-only (bucketing is xxhash64-derived).
    "q_ann_lsh" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      SimilarityOps.lshTopK(e, e.where(col("vec_id") < 50), k = 5, bits = 8)
        .groupBy("query_id").agg(count(lit(1)).as("n_neighbors"),
          round(max(col("sim")), 6).as("best_sim"))
        .orderBy("query_id")
    }),

    // J5/J6 + §2.10 — label-sequence continuation (typed UDAF bitset prefix)
    // + lag-window adjacency links.
    "q_seq_link" -> ((s, dir) => {
      val d = TranscriptWal.fromEvents(s, dir)
        .select("conv_id", "turn_idx").distinct()
      val prefixUdaf = udaf(new graft.ops.Aggregators.SeqPrefixLen(0))
      val prefix = d.groupBy("conv_id")
        .agg(prefixUdaf(col("turn_idx")).cast("long").as("prefix_len"))
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      val links = d.withColumn("prev", lag(col("turn_idx"), 1).over(w))
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_turns"),
          count(when(col("turn_idx") - col("prev") === 1, 1)).as("n_adjacent"))
      links.join(prefix, "conv_id")
        .select("conv_id", "n_turns", "prefix_len", "n_adjacent")
        .orderBy("conv_id")
    }),

    // J2/J3 — interval containment join (grid-bucketed equi-join, explode on
    // overlap) + residual anti branch.
    "q_interval_join" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      val ev = wal.select(col("conv_id"), col("lsn"), unix_micros(col("ts")).as("tsu"))
      val windows = wal.groupBy("conv_id")
        .agg(min(unix_micros(col("ts"))).as("s0"))
        .select(col("conv_id"), col("s0"),
          explode(array((0 until 4).map(i => lit(i)): _*)).as("wid"))
        .withColumn("ws", col("s0") + col("wid").cast("long") * lit(600000000L))
        .withColumn("we", col("ws") + lit(900000000L))
        .drop("s0")
      val asg = graft.ops.IntervalJoin.assign(ev, windows, "conv_id",
        "tsu", "ws", "we", cellMicros = 300000000L)
      val perEvent = asg.groupBy("conv_id", "lsn").agg(count(lit(1)).as("nw"))
      val agg = perEvent.groupBy("conv_id").agg(
        sum(col("nw")).as("n_assign"),
        count(when(col("nw") >= 2, 1)).as("n_multi"))
      // residual ≡ events minus the assigned key set — perEvent already IS
      // that set, so anti-join against it instead of IntervalJoin.residual,
      // which would re-execute the whole grid join a second time (r7).
      val resid = ev.join(perEvent.select("conv_id", "lsn"),
          Seq("conv_id", "lsn"), "left_anti")
        .groupBy("conv_id").agg(count(lit(1)).as("n_residual"))
      agg.join(resid, Seq("conv_id"), "left")
        .select(col("conv_id"), col("n_assign"), col("n_multi"),
          coalesce(col("n_residual"), lit(0L)).as("n_residual"))
        .orderBy("conv_id")
    }),

    // W6 — bounded-lookback same-role linking via flatMapSortedGroups
    // (secondary sort through the shuffle, O(lookback) state).
    "q_list_link" -> ((s, dir) => {
      val state = TranscriptWal.expectedState(TranscriptWal.fromEvents(s, dir))
      graft.ops.GroupOps.linkSameRole(state, lookback = 5)
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_turns"),
          count(when(col("link_idx") >= 0, 1)).as("n_linked"),
          coalesce(max(when(col("link_idx") >= 0, col("link_idx"))), lit(-1))
            .cast("int").as("max_link"))
        .orderBy("conv_id")
    }),

    // W10 — greedy span clustering (boundary depends on the running cluster
    // START — not window-expressible) via flatMapSortedGroups.
    "q_greedy_cluster" -> ((s, dir) => {
      val d = TranscriptWal.fromEvents(s, dir)
        .groupBy("conv_id", "turn_idx").agg(min(col("ts")).as("ts"))
      graft.ops.GroupOps.greedyCluster(d, spanMicros = 1200000000L)
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_turns"),
          (max(col("cluster_id")) + 1).cast("long").as("n_clusters"))
        .orderBy("conv_id")
    }),

    // W4 — multi-pass boundary cascade folded into one window pass
    // (time gap OR role-escalation OR turn_idx reset).
    "q_cascade_merge" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      CdcOps.sessionizeCascade(wal, "lsn", Seq(
        (p, c) => unix_micros(c.getField("ts")) - unix_micros(p.getField("ts")) > 1800000000L,
        (p, c) => c.getField("role") === "system" && p.getField("role") =!= "system",
        (p, c) => c.getField("turn_idx") < p.getField("turn_idx")))
        .groupBy("conv_id").agg(
          max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("conv_id")
    }),

    // §2.9 — event-time session_window aggregation (10-minute gap).
    "q_session_window" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      wal.groupBy(col("conv_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n")).as("n_events"))
        .orderBy("conv_id")
    }),

    // A5 — iterative fixpoint aggregation: driver-bounded loop re-filtering
    // docs below the (quantized) mean quality; per-iteration lineage rows.
    "q_fixpoint" -> ((s, dir) => {
      import s.implicits._
      val scored = tbl(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
        .persist() // 4 actions over the loop — score the corpus once
      // quantized mean: both engines compare identical 2-dp thresholds,
      // immune to summation-order ulps. Each pass's (count after the
      // previous filter, mean for this pass) come from ONE aggregate — the
      // separate count-per-iteration shape ran 7 actions instead of 4 (r7).
      var kept = scored
      var m = scored.agg(round(avg(col("q")), 2)).collect()(0).getDouble(0)
      val log = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
      for (iter <- 1 to 2) {
        kept = kept.where(col("q") >= m)
        val r = kept.agg(count(lit(1)), round(avg(col("q")), 2)).collect()(0)
        log += ((iter, r.getLong(0), m))
        m = r.getDouble(1)
      }
      kept = kept.where(col("q") >= m)
      log += ((3, kept.count(), m))
      scored.unpersist(blocking = false) // loop actions done — free the cache
      log.toSeq.toDF("iter", "n_docs", "mean_q").orderBy("iter")
    }),

    // F12 — flag-enrichment dims join (broadcast a literal role taxonomy).
    "q_enrich_flags" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("click", "interactive"), ("view", "passive"),
        ("purchase", "transactional"), ("signup", "onboarding"),
        ("error", "fault")).toDF("role", "role_class")
      TranscriptWal.fromEvents(s, dir)
        .join(broadcast(dim), Seq("role"), "left")
        .groupBy("role_class").agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("conv_id")).as("n_convs"))
        .orderBy("role_class")
    }),

    // A6 — quality-gated plan replacement: when() on aggregated stats picks
    // the compact or full rendering plan per conversation.
    "q_gated_replace" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      // the gate compares exact integers (sum < 40*count), never a rounded
      // double: Spark rounds the decimal string of a double, DuckDB rounds
      // its binary value — .xx5 quotients diverge between the two
      wal.groupBy("conv_id").agg(
          count(lit(1)).as("n_events"),
          sum(length(col("text"))).as("text_chars"))
        .withColumn("plan",
          when(col("text_chars") < lit(40) * col("n_events"), lit("compact"))
            .otherwise(lit("full")))
        .orderBy("conv_id")
    }),

    // F10 — replacement-char ratio metric + substitution, per language.
    "q_badchar" -> ((s, dir) => {
      val planted = tbl(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" �x�")))
          .otherwise(col("text")).as("text"))
      planted
        .withColumn("bad",
          length(col("text")) - length(regexp_replace(col("text"), "�", "")))
        .withColumn("ratio", col("bad").cast("double") / length(col("text")))
        .withColumn("clean", regexp_replace(col("text"), "�", " "))
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("bad")).as("n_bad_chars"),
          round(avg(col("ratio")), 6).as("avg_bad_ratio"),
          sum(length(col("clean"))).as("clean_chars"))
        .orderBy("lang")
    }),

    // S3 — trusted-source passthrough: the fast route skips sanitization,
    // other routes pay for it; branches union over one scan.
    "q_route_passthrough" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
      graft.ops.Route.apply(wal, Map(
        "quarantine" -> (df => CdcOps.sanitize(df)),
        "review" -> (df => CdcOps.sanitize(df))))
        .groupBy("route").agg(
          count(lit(1)).as("n_events"),
          sum(length(col("text"))).as("text_chars"))
        .orderBy("route")
    }),

    // S8 — HTML report sink.
    "q_export_html" -> ((s, dir) => {
      val state = TranscriptWal.expectedState(TranscriptWal.fromEvents(s, dir))
      graft.sink.TranscriptExport.toHtml(state).orderBy("conv_id")
    }),

    // W9 — frame-based attachment: each event aggregates over a ±time frame
    // of its conversation (rangeBetween window), then per-conv rollup.
    "q_frame_attach" -> ((s, dir) => {
      val wal = TranscriptWal.fromEvents(s, dir)
        .select(col("conv_id"), unix_micros(col("ts")).as("tsu"))
      val w = Window.partitionBy("conv_id").orderBy(col("tsu"))
        .rangeBetween(-300000000L, 0L)
      wal.withColumn("n_frame", count(lit(1)).over(w))
        .groupBy("conv_id").agg(
          count(lit(1)).as("n_events"),
          sum(col("n_frame")).as("frame_mass"),
          max(col("n_frame")).as("max_frame"))
        .orderBy("conv_id")
    }),

    // IVF ANN (the second scale path next to LSH): hash-seeded centroids +
    // one Lloyd refinement, nprobe-list search. Rows-only (centroids are
    // hash-derived); spec proves nprobe=nlist reduces to exact search.
    "q_ann_ivf" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      SimilarityOps.ivfTopK(e, e.where(col("vec_id") < 50), k = 5,
        nlist = 16, nprobe = 4)
        .groupBy("query_id").agg(count(lit(1)).as("n_neighbors"),
          round(max(col("sim")), 6).as("best_sim"))
        .orderBy("query_id")
    }),

    // Multimodal plumbing: binary media column + typed metadata → partition-
    // batched (stub) codec → per-type feature stats.
    "q_media_features" -> ((s, dir) =>
      MultimodalOps.mediaFeatureStats(s, dir)),

    // REAL multimodal decode: genuine WAV/BMP blobs parsed by a pure-JVM
    // binary codec; the oracle recomputes the expected decode output from
    // the generation formulas — a header-parse bug breaks the match.
    "q_media_decode" -> ((s, dir) =>
      MultimodalOps.decodeReal(MultimodalOps.realMediaTable(s, dir))
        .orderBy("doc_id").toDF()),

    // §2.8 — base64 data-URI round-trip (reference embeds images as data
    // URIs, utils/Base64ImageUtils.java): encode the payload into a
    // `data:` URI, decode it back, and assert byte-exact round-trip — all
    // codegen'd column expressions, no UDF.
    "q_base64_uri" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          // strip MIME line-wrapping: Spark's base64 chunks at 76 chars
          // (RFC 2045); a data: URI needs the unwrapped RFC 4648 form —
          // which is also what DuckDB's to_base64 emits
          concat(lit("data:text/plain;base64,"),
            regexp_replace(base64(col("text").cast("binary")),
              "[\\r\\n]", "")).as("data_uri"))
        .withColumn("uri_len", length(col("data_uri")).cast("long"))
        .withColumn("decoded",
          unbase64(substring_index(col("data_uri"), ",", -1)).cast("string"))
        .join(tbl(s, dir, "documents").select(col("doc_id"), col("text")), "doc_id")
        .withColumn("roundtrip_ok", col("decoded") === col("text"))
        .select("doc_id", "uri_len", "roundtrip_ok")
        .orderBy("doc_id")
    }),

    // §2.8 — rlike with Unicode property classes (reference label-sequence
    // classification, utils/BulletedParagraphUtils.java:30-38): per-language
    // counts of docs whose text starts with a letter / digit / uppercase
    // letter, and docs containing Han script. Patterns are chosen from the
    // \p{...} classes Java regex and RE2 agree on.
    "q_rlike_labels" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          count(when(col("text").rlike("^\\p{L}"), 1)).as("n_start_letter"),
          count(when(col("text").rlike("^\\p{N}"), 1)).as("n_start_digit"),
          count(when(col("text").rlike("^\\p{Lu}"), 1)).as("n_start_upper"),
          count(when(col("text").rlike("\\p{IsHan}"), 1)).as("n_has_han"))
        .orderBy("lang")
    }),

    // Token counting + quality scoring per language.
    "q_doc_quality" -> ((s, dir) => {
      val toks = size(filter(split(col("text"), " "), w => w =!= ""))
      tbl(s, dir, "documents")
        .withColumn("n_tokens", toks)
        .withColumn("stop_ratio",
          size(filter(split(col("text"), " "), w => w.isin("the", "a"))) /
            toks.cast("double"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("n_tokens")), 2).as("avg_tokens"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"))
        .orderBy("lang")
    })
  )

  /** DuckDB regexp_replace chain generated from the engine's own rule list —
    * rule text and order cannot drift between Spark and the oracle.
    */
  private def sanitizeSqlChain(inner: String): String =
    graft.ops.CdcOps.defaultSanitizeRules.foldLeft(s"($inner)") {
      (acc, r) => s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')"
    }

  /** DuckDB twin of TextOps.qualityScore (same arithmetic order + rounding). */
  private val qualitySqlExpr: String =
    """round(greatest(0.0,
      |  least(CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS DOUBLE) / 20.0, 1.0)
      |  * (1.0 - CAST(len(text) - len(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
      |       / greatest(CAST(len(text) AS DOUBLE), 1.0))
      |  * (1.0 - CAST(len(text) - len(regexp_replace(text, '�', '', 'g')) AS DOUBLE)
      |       / greatest(CAST(len(text) AS DOUBLE), 1.0))
      |  * least(1.0,
      |      CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('the','a','of','and'))) AS DOUBLE)
      |        / greatest(CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS DOUBLE), 1.0)
      |      * 5.0 + 0.5)), 4)""".stripMargin

  def oracleSql: Map[String, String] = {
    val walCte = s"WITH wal AS (${TranscriptWal.fromEventsSql})"
    Map(
      "q_cdc_apply" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role, text, tool
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // Same semantics as q_cdc_apply — the engine-side difference (compacted
      // table read back via the DSv2 columnar scan) must be invisible.
      "q_dsv2_scan" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role, text, tool
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // The applied state plus the two SQL-inserted rows (fresh key zz_sql).
      "q_sql_insert" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (
           |  SELECT conv_id, turn_idx, role, text, tool
           |  FROM latest WHERE rn = 1 AND op <> 'D')
           |SELECT * FROM (
           |  SELECT * FROM state
           |  UNION ALL SELECT 'zz_sql', 0, 'user', 'inserted via sql', NULL
           |  UNION ALL SELECT 'zz_sql', 1, 'assistant', 'ack', NULL
           |) ORDER BY conv_id, turn_idx""".stripMargin,

      // The applied state minus the rows a tombstone-merge DELETE matched.
      "q_sql_delete" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role, text, tool
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |  AND NOT (role = 'user' AND turn_idx >= 3)
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // The applied state after one MERGE: user/turn>=3 rows deleted,
      // assistant/turn=1 texts updated, one fresh row inserted.
      "q_sql_merge" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (
           |  SELECT conv_id, turn_idx, role,
           |         CASE WHEN role = 'assistant' AND turn_idx = 1
           |              THEN text || ' [merged]' ELSE text END AS text,
           |         tool
           |  FROM latest WHERE rn = 1 AND op <> 'D'
           |    AND NOT (role = 'user' AND turn_idx >= 3))
           |SELECT * FROM (
           |  SELECT * FROM state
           |  UNION ALL SELECT 'zz_merge', 0, 'user', 'merged in', NULL
           |) ORDER BY conv_id, turn_idx""".stripMargin,

      // The applied state after one UPDATE of user/turn=0 texts.
      "q_sql_update" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role,
           |       CASE WHEN role = 'user' AND turn_idx = 0
           |            THEN text || ' [edited]' ELSE text END AS text,
           |       tool
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // The state after INSERT OVERWRITE with the purchase-only selection:
      // exactly the surviving generation, texts prefixed.
      "q_sql_overwrite" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role, 'kept: ' || text AS text, tool
           |FROM latest WHERE rn = 1 AND op <> 'D' AND role = 'purchase'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // Rollback restores the pre-mutation mark exactly: the plain applied
      // WAL (the DELETE and the INSERT after the mark are both reversed).
      "q_sql_rollback" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, role, text, tool
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // Raw change rows in the middle half of the event-time span.
      "q_changes_range" ->
        s"""$walCte, b AS (
           |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM wal)
           |SELECT conv_id, turn_idx, op, lsn, role
           |FROM wal, b
           |WHERE epoch_us(ts) BETWEEN b.lo + (b.hi - b.lo) // 4
           |                       AND b.lo + (3 * (b.hi - b.lo)) // 4
           |ORDER BY conv_id, turn_idx, lsn, op""".stripMargin,

      // Live state whose winning row's event time falls in the middle half.
      "q_time_range" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM wal)
           |SELECT conv_id, turn_idx, role, text
           |FROM latest, b
           |WHERE rn = 1 AND op <> 'D'
           |  AND epoch_us(ts) BETWEEN b.lo + (b.hi - b.lo) // 4
           |                       AND b.lo + (3 * (b.hi - b.lo)) // 4
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // Arbitrated state of the sub-split half of the WAL = what time travel
      // to the first commit must return.
      "q_time_travel" ->
        s"""$walCte, s AS (SELECT (min(lsn) + max(lsn)) // 2 AS v FROM wal),
           |h AS (SELECT * FROM wal, s WHERE lsn < s.v),
           |latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM h)
           |SELECT conv_id, turn_idx, role, text
           |FROM latest WHERE rn = 1 AND op <> 'D'
           |ORDER BY conv_id, turn_idx""".stripMargin,

      // The change feed after commit 1 is the RAW second batch (no
      // arbitration — consumers arbitrate), stamped with its commit version.
      "q_changes_since" ->
        s"""$walCte, s AS (SELECT (min(lsn) + max(lsn)) // 2 AS v FROM wal)
           |SELECT conv_id, turn_idx, op, lsn, role, text,
           |       CAST(2 AS BIGINT) AS commit_version
           |FROM wal, s WHERE lsn >= s.v
           |ORDER BY conv_id, turn_idx, lsn, op""".stripMargin,

      "q_cdc_dedup" ->
        s"""$walCte
           |SELECT conv_id, count(*) AS n_events FROM wal
           |GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_cdc_arbitrate" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id, turn_idx, op, lsn, role, text
           |FROM latest WHERE rn = 1 ORDER BY conv_id, turn_idx""".stripMargin,

      "q_cdc_sessionize" ->
        s"""$walCte, flagged AS (
           |  SELECT conv_id,
           |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
           |              WHEN epoch(ts) - epoch(lag(ts) OVER w) > 3600 THEN 1
           |              ELSE 0 END AS flag
           |  FROM wal WINDOW w AS (PARTITION BY conv_id ORDER BY ts)),
           |sess AS (
           |  SELECT conv_id, sum(flag) OVER (PARTITION BY conv_id ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM flagged)
           |SELECT conv_id, CAST(max(sid) AS BIGINT) AS n_sessions,
           |       count(*) AS n_events
           |FROM sess GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_cdc_late" ->
        s"""$walCte
           |SELECT conv_id, count(*) AS n_kept FROM wal
           |WHERE commit_ts >= (SELECT max(commit_ts) FROM wal) - INTERVAL 7 DAY
           |GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_cdc_lineage" ->
        s"""$walCte
           |SELECT conv_id, count(*) AS events,
           |       count(*) FILTER (op <> 'D') AS upserts,
           |       count(*) FILTER (op = 'D') AS deletes,
           |       count(DISTINCT turn_idx) AS distinct_turns,
           |       max(lsn) AS max_lsn
           |FROM wal GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_cdc_boilerplate" ->
        s"""$walCte
           |SELECT DISTINCT text FROM (
           |  SELECT text, count(DISTINCT conv_id) AS nc FROM wal GROUP BY text)
           |WHERE nc >= 12 ORDER BY text""".stripMargin,

      // Oracle chain generated from the SAME rule list the engine applies —
      // rule text and order cannot drift between the two sides.
      "q_cdc_sanitize" -> {
        val planted =
          """'mail u' || CAST(doc_id AS VARCHAR) || '@example.com' ||
            | ' ph +82-10-' || CAST(doc_id % 10000 AS VARCHAR) ||
            | ' id AB' || CAST(1000000 + doc_id % 1000000 AS VARCHAR) ||
            | ' card 4242-4242-4242-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
            | ' imei 3512345' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0') ||
            | ' acct 9' || lpad(CAST(doc_id % 100000 AS VARCHAR), 11, '0') ||
            | ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ||
            | ' ip6 fe80:abc1:234:5678:9abc:def0:1234:' || CAST(doc_id % 10 AS VARCHAR) ||
            | ' mac 0a:1b:2c:3d:4e:5f' ||
            | ' tel 010-123-456-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
            | ' see https://ex.com/' || CAST(doc_id AS VARCHAR) ||
            | ' t ' || substring(text, 1, 40)""".stripMargin
        val chain = graft.ops.CdcOps.defaultSanitizeRules.foldLeft(s"($planted)") {
          (acc, r) => s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')"
        }
        s"SELECT doc_id, $chain AS text FROM documents ORDER BY doc_id"
      },

      "q_cdc_order" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (SELECT conv_id, turn_idx, role FROM latest WHERE rn = 1 AND op <> 'D')
           |SELECT row_number() OVER (ORDER BY conv_id, turn_idx) AS global_id,
           |       conv_id, turn_idx, role
           |FROM state ORDER BY conv_id, turn_idx""".stripMargin,

      "q_window_lag" ->
        s"""$walCte, g AS (
           |  SELECT conv_id,
           |         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id ORDER BY lsn)) AS gap
           |  FROM wal)
           |SELECT conv_id,
           |       round(CAST(sum(gap) AS DOUBLE) / (count(gap) * 1000000.0), 2) AS avg_gap_s,
           |       round(CAST(max(gap) AS DOUBLE) / 1000000.0, 2) AS max_gap_s
           |FROM g GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_percentile_gap" ->
        s"""$walCte, g AS (
           |  SELECT conv_id,
           |         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id ORDER BY lsn)) AS gap
           |  FROM wal)
           |SELECT conv_id,
           |       CAST(floor(quantile_cont(gap, 0.5) / 1000.0 + 0.5) AS BIGINT) AS p50_millis,
           |       CAST(floor(quantile_cont(gap, 0.95) / 1000.0 + 0.5) AS BIGINT) AS p95_millis,
           |       count(gap) AS n_gaps
           |FROM g WHERE gap IS NOT NULL
           |GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_mode_role" ->
        s"""$walCte, c AS (
           |  SELECT conv_id, role, count(*) AS n FROM wal GROUP BY conv_id, role),
           |r AS (SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY n DESC, role) AS rn FROM c)
           |SELECT conv_id, role, n FROM r WHERE rn = 1 ORDER BY conv_id""".stripMargin,

      "q_rank_styles" ->
        s"""$walCte, c AS (
           |  SELECT role, tool, count(*) AS n FROM wal GROUP BY role, tool)
           |SELECT role, tool, n,
           |       CAST(dense_rank() OVER (ORDER BY n DESC, role) AS INTEGER) AS style_rank
           |FROM c ORDER BY style_rank""".stripMargin,

      "q_levenshtein" ->
        """WITH d AS (
          |  SELECT doc_id, substring(text, 1, 60) AS t FROM documents WHERE doc_id < 50)
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |       CAST(levenshtein(a.t, b.t) AS INTEGER) AS lev,
          |       round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
          |             / greatest(len(a.t), len(b.t)), 4) AS sim,
          |       (1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
          |             / greatest(len(a.t), len(b.t))) >= 0.5 AS trust_stream
          |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
          |ORDER BY a_id""".stripMargin,

      "q_longest_run" ->
        s"""$walCte, d AS (SELECT DISTINCT conv_id, turn_idx FROM wal),
           |g AS (SELECT conv_id, turn_idx,
           |             turn_idx - row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS grp
           |      FROM d)
           |SELECT conv_id, CAST(max(cnt) AS BIGINT) AS longest_run FROM (
           |  SELECT conv_id, grp, count(*) AS cnt FROM g GROUP BY conv_id, grp)
           |GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_export_text" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (SELECT conv_id, turn_idx, role, text FROM latest WHERE rn = 1 AND op <> 'D')
           |SELECT conv_id,
           |       conv_id || chr(10) ||
           |       string_agg('  ' || role || ': ' || text, chr(10) ORDER BY turn_idx) AS doc
           |FROM state GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_route_triage" ->
        s"""$walCte, sig AS (
           |  SELECT conv_id, count(*) AS n,
           |         count(*) FILTER (op = 'D') AS dels,
           |         count(DISTINCT turn_idx) AS turns
           |  FROM wal GROUP BY conv_id),
           |r AS (
           |  SELECT CASE
           |    WHEN CAST(dels AS DOUBLE) / n > 0.21 THEN 'quarantine'
           |    WHEN n > 100 AND turns < CAST(n AS DOUBLE) / 10 THEN 'review'
           |    ELSE 'fast' END AS route
           |  FROM sig)
           |SELECT route, count(*) AS n_convs FROM r GROUP BY route ORDER BY route""".stripMargin,

      "q_corrupt_source" ->
        """WITH wal AS (
          |  SELECT CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
          |  FROM events WHERE event_id < 100)
          |SELECT op, count(*) AS n_clean, CAST(4 AS BIGINT) AS n_corrupt
          |FROM wal GROUP BY op ORDER BY op""".stripMargin,

      "q_topk_agg" ->
        s"""$walCte, r AS (
           |  SELECT conv_id, lsn,
           |         row_number() OVER (PARTITION BY conv_id ORDER BY lsn DESC) AS rn
           |  FROM wal)
           |SELECT conv_id,
           |       max(CASE WHEN rn = 1 THEN lsn END) AS lsn1,
           |       max(CASE WHEN rn = 2 THEN lsn END) AS lsn2,
           |       max(CASE WHEN rn = 3 THEN lsn END) AS lsn3
           |FROM r GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
          |       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
          |       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
          |       round(CAST(avg(l_quantity) AS DOUBLE), 2) AS avg_qty,
          |       count(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q_join_nation_rev" ->
        """SELECT n_name, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
          |       count(*) AS n_orders
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin,

      "q_topk_customers" ->
        """SELECT o_custkey, round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
          |FROM orders GROUP BY o_custkey
          |ORDER BY total DESC, o_custkey LIMIT 10""".stripMargin,

      "q_anti_join" ->
        """SELECT c_mktsegment, count(*) AS n_customers
          |FROM customer WHERE c_custkey NOT IN (
          |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "q_explode_tokens" ->
        """SELECT word, count(*) AS n FROM (
          |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
          |WHERE word <> '' GROUP BY word
          |ORDER BY n DESC, word LIMIT 20""".stripMargin,

      "q_dedup_exact" ->
        """SELECT min(doc_id) AS doc_id FROM documents
          |GROUP BY text ORDER BY doc_id""".stripMargin,

      "q_fingerprint" ->
        """SELECT doc_id, md5(text) AS fp FROM documents
          |ORDER BY doc_id LIMIT 100""".stripMargin,

      "q_text_metrics" ->
        """SELECT doc_id,
          |       CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
          |       CAST(list_sum(list_transform(
          |         list_filter(string_split(text, ' '), w -> w <> ''),
          |         w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpeish
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q_langid" ->
        """WITH toks AS (
          |  SELECT doc_id, lang,
          |         list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
          |  FROM documents),
          |scores AS (
          |  SELECT doc_id, lang, cand, CASE cand
          |    WHEN 'en' THEN len(list_filter(t, w -> w IN ('the','and','of','is')))
          |    WHEN 'de' THEN len(list_filter(t, w -> w IN ('der','die','und','ist')))
          |    WHEN 'fr' THEN len(list_filter(t, w -> w IN ('le','la','et','est')))
          |    WHEN 'es' THEN len(list_filter(t, w -> w IN ('el','los','y','es')))
          |    WHEN 'zh' THEN len(list_filter(t, w -> w IN ('的','是','了','在')))
          |    END AS score
          |  FROM toks, (SELECT unnest(['en','de','fr','es','zh']) AS cand)),
          |best AS (
          |  SELECT doc_id, lang, cand, score,
          |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
          |  FROM scores)
          |SELECT lang, CASE WHEN score > 0 THEN cand ELSE 'und' END AS lang_pred,
          |       count(*) AS n
          |FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,

      "q_jaccard_pairs" ->
        """WITH t AS (
          |  SELECT doc_id,
          |         list_distinct(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS s
          |  FROM documents WHERE doc_id < 40)
          |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          |       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          |             / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
          |FROM t a, t b WHERE a.doc_id < b.doc_id
          |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
          |ORDER BY a_id, b_id""".stripMargin,

      "q_ann_brute" ->
        """WITH qz AS (
          |  SELECT vec_id,
          |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
          |  FROM embeddings),
          |qs AS (SELECT vec_id AS query_id, v AS qv FROM qz WHERE vec_id < 5),
          |pairs AS (
          |  SELECT query_id, c.vec_id AS neighbor_id,
          |         list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*c.v[i])) AS dot,
          |         list_sum(list_transform(qv, x -> x*x)) AS nq,
          |         list_sum(list_transform(c.v, x -> x*x)) AS nc
          |  FROM qs, qz c WHERE query_id <> c.vec_id),
          |sims AS (
          |  SELECT query_id, neighbor_id,
          |         round(CAST(dot AS DOUBLE)/(sqrt(CAST(nq AS DOUBLE))*sqrt(CAST(nc AS DOUBLE))), 6) AS sim
          |  FROM pairs),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          |  FROM sims)
          |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, sim
          |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "q_media_features" ->
        """WITH m AS (
          |  SELECT doc_id, md5(text) AS h,
          |         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS mediaType
          |  FROM documents),
          |b AS (
          |  SELECT doc_id, mediaType,
          |         list_transform(range(0, 16),
          |           i -> strpos('123456789abcdef', substr(h, 2*i+1, 1)) * 16
          |              + strpos('123456789abcdef', substr(h, 2*i+2, 1))) AS bytes
          |  FROM m),
          |f AS (
          |  SELECT doc_id, mediaType,
          |         CAST(list_sum(bytes) AS DOUBLE)/16 AS byteMean,
          |         list_max(bytes) AS byteMax,
          |         CASE mediaType WHEN 'video' THEN 4 WHEN 'audio' THEN 8 ELSE 1 END AS frameCount
          |  FROM b)
          |SELECT mediaType, count(*) AS n,
          |       round(CAST(avg(byteMean) AS DOUBLE), 4) AS avg_byte_mean,
          |       CAST(max(byteMax) AS INTEGER) AS max_byte,
          |       CAST(sum(frameCount) AS BIGINT) AS total_frames
          |FROM f GROUP BY mediaType ORDER BY mediaType""".stripMargin,

      "q_seq_link" ->
        s"""$walCte, d AS (SELECT DISTINCT conv_id, turn_idx FROM wal),
           |r AS (SELECT conv_id, turn_idx,
           |        row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS rn,
           |        lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
           |      FROM d)
           |SELECT conv_id, count(*) AS n_turns,
           |       count(*) FILTER (turn_idx = rn) AS prefix_len,
           |       count(*) FILTER (turn_idx - prev = 1) AS n_adjacent
           |FROM r GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_interval_join" ->
        s"""$walCte,
           |ev AS (SELECT conv_id, lsn, epoch_us(ts) AS tsu FROM wal),
           |m AS (SELECT conv_id, min(tsu) AS s0 FROM ev GROUP BY conv_id),
           |w AS (SELECT conv_id, s0 + CAST(wid AS BIGINT)*600000000 AS ws,
           |             s0 + CAST(wid AS BIGINT)*600000000 + 900000000 AS we
           |      FROM m, (SELECT unnest([0,1,2,3]) AS wid)),
           |a AS (SELECT e.conv_id, e.lsn FROM ev e
           |      JOIN w ON e.conv_id = w.conv_id AND e.tsu >= w.ws AND e.tsu < w.we),
           |pe AS (SELECT conv_id, lsn, count(*) AS nw FROM a GROUP BY conv_id, lsn),
           |ag AS (SELECT conv_id, CAST(sum(nw) AS BIGINT) AS n_assign,
           |              count(*) FILTER (nw >= 2) AS n_multi
           |       FROM pe GROUP BY conv_id),
           |res AS (SELECT e.conv_id, count(*) AS n_residual
           |        FROM ev e LEFT JOIN pe ON e.conv_id = pe.conv_id AND e.lsn = pe.lsn
           |        WHERE pe.lsn IS NULL GROUP BY e.conv_id)
           |SELECT ag.conv_id AS conv_id, n_assign, n_multi,
           |       coalesce(n_residual, 0) AS n_residual
           |FROM ag LEFT JOIN res ON ag.conv_id = res.conv_id
           |ORDER BY ag.conv_id""".stripMargin,

      "q_list_link" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (SELECT conv_id, turn_idx, role FROM latest WHERE rn = 1 AND op <> 'D'),
           |r AS (SELECT conv_id, turn_idx, role,
           |        row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
           |      FROM state),
           |l AS (SELECT a.conv_id, a.turn_idx, max(b.turn_idx) AS link_idx
           |      FROM r a LEFT JOIN r b ON b.conv_id = a.conv_id AND b.role = a.role
           |            AND b.rn BETWEEN a.rn - 5 AND a.rn - 1
           |      GROUP BY a.conv_id, a.turn_idx)
           |SELECT conv_id, count(*) AS n_turns, count(link_idx) AS n_linked,
           |       CAST(coalesce(max(link_idx), -1) AS INTEGER) AS max_link
           |FROM l GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_greedy_cluster" ->
        s"""${walCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
           |d0 AS (SELECT conv_id, turn_idx, min(ts) AS ts FROM wal GROUP BY conv_id, turn_idx),
           |d AS (SELECT conv_id, turn_idx, epoch_us(ts) AS tsu,
           |        row_number() OVER (PARTITION BY conv_id ORDER BY epoch_us(ts), turn_idx) AS rn
           |      FROM d0),
           |r AS (
           |  SELECT conv_id, rn, tsu, CAST(0 AS BIGINT) AS cluster_id, tsu AS cstart
           |  FROM d WHERE rn = 1
           |  UNION ALL
           |  SELECT d.conv_id, d.rn, d.tsu,
           |    CASE WHEN d.tsu - r.cstart > 1200000000 THEN r.cluster_id + 1 ELSE r.cluster_id END,
           |    CASE WHEN d.tsu - r.cstart > 1200000000 THEN d.tsu ELSE r.cstart END
           |  FROM r JOIN d ON d.conv_id = r.conv_id AND d.rn = r.rn + 1)
           |SELECT conv_id, count(*) AS n_turns,
           |       CAST(max(cluster_id) + 1 AS BIGINT) AS n_clusters
           |FROM r GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_cascade_merge" ->
        s"""$walCte, g AS (
           |  SELECT conv_id,
           |    lag(epoch_us(ts)) OVER w AS pts, lag(role) OVER w AS prole,
           |    lag(turn_idx) OVER w AS pturn,
           |    epoch_us(ts) AS tsu, role, turn_idx
           |  FROM wal WINDOW w AS (PARTITION BY conv_id ORDER BY lsn)),
           |f AS (SELECT conv_id,
           |  CASE WHEN pts IS NULL THEN 1
           |       WHEN tsu - pts > 1800000000
           |            OR (role = 'system' AND prole <> 'system')
           |            OR turn_idx < pturn THEN 1 ELSE 0 END AS flag
           |  FROM g),
           |sess AS (SELECT conv_id,
           |  sum(flag) OVER (PARTITION BY conv_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
           |SELECT conv_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
           |FROM sess GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_session_window" ->
        s"""$walCte, g AS (
           |  SELECT conv_id, CASE WHEN lag(ts) OVER w IS NULL THEN 1
           |    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000 THEN 1
           |    ELSE 0 END AS flag
           |  FROM wal WINDOW w AS (PARTITION BY conv_id ORDER BY ts))
           |SELECT conv_id, CAST(sum(flag) AS BIGINT) AS n_sessions,
           |       count(*) AS n_events
           |FROM g GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_fixpoint" ->
        s"""WITH t AS (SELECT doc_id, $qualitySqlExpr AS q FROM documents),
           |m1 AS (SELECT round(avg(q), 2) AS m FROM t),
           |k1 AS (SELECT q FROM t, m1 WHERE q >= m1.m),
           |m2 AS (SELECT round(avg(q), 2) AS m FROM k1),
           |k2 AS (SELECT q FROM k1, m2 WHERE q >= m2.m),
           |m3 AS (SELECT round(avg(q), 2) AS m FROM k2),
           |k3 AS (SELECT q FROM k2, m3 WHERE q >= m3.m)
           |SELECT CAST(1 AS INTEGER) AS iter, (SELECT count(*) FROM k1) AS n_docs,
           |       (SELECT m FROM m1) AS mean_q
           |UNION ALL SELECT 2, (SELECT count(*) FROM k2), (SELECT m FROM m2)
           |UNION ALL SELECT 3, (SELECT count(*) FROM k3), (SELECT m FROM m3)
           |ORDER BY iter""".stripMargin,

      "q_enrich_flags" ->
        s"""$walCte, e AS (
           |  SELECT CASE role WHEN 'click' THEN 'interactive' WHEN 'view' THEN 'passive'
           |    WHEN 'purchase' THEN 'transactional' WHEN 'signup' THEN 'onboarding'
           |    WHEN 'error' THEN 'fault' END AS role_class, conv_id
           |  FROM wal)
           |SELECT role_class, count(*) AS n_events, count(DISTINCT conv_id) AS n_convs
           |FROM e GROUP BY role_class ORDER BY role_class""".stripMargin,

      "q_gated_replace" ->
        s"""$walCte
           |SELECT conv_id, count(*) AS n_events,
           |       CAST(sum(len(text)) AS BIGINT) AS text_chars,
           |       CASE WHEN sum(len(text)) < 40 * count(*)
           |            THEN 'compact' ELSE 'full' END AS plan
           |FROM wal GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_badchar" ->
        """WITH p AS (
          |  SELECT doc_id, lang,
          |    CASE WHEN doc_id % 7 = 0 THEN text || ' �x�' ELSE text END AS text
          |  FROM documents),
          |c AS (
          |  SELECT lang,
          |    len(text) - len(regexp_replace(text, '�', '', 'g')) AS bad,
          |    CAST(len(text) - len(regexp_replace(text, '�', '', 'g')) AS DOUBLE)
          |      / len(text) AS ratio,
          |    len(regexp_replace(text, '�', ' ', 'g')) AS clean_len
          |  FROM p)
          |SELECT lang, count(*) AS n_docs, CAST(sum(bad) AS BIGINT) AS n_bad_chars,
          |       round(CAST(avg(ratio) AS DOUBLE), 6) AS avg_bad_ratio,
          |       CAST(sum(clean_len) AS BIGINT) AS clean_chars
          |FROM c GROUP BY lang ORDER BY lang""".stripMargin,

      "q_route_passthrough" -> {
        val sanitized = sanitizeSqlChain("text")
        s"""$walCte, sig AS (
           |  SELECT conv_id, count(*) AS n,
           |         count(*) FILTER (op = 'D') AS dels,
           |         count(DISTINCT turn_idx) AS turns
           |  FROM wal GROUP BY conv_id),
           |r AS (SELECT conv_id, CASE
           |    WHEN CAST(dels AS DOUBLE) / n > 0.3 THEN 'quarantine'
           |    WHEN n > 100 AND turns < CAST(n AS DOUBLE) / 10 THEN 'review'
           |    ELSE 'fast' END AS route
           |  FROM sig),
           |x AS (SELECT r.route,
           |        CASE WHEN r.route = 'fast' THEN w.text ELSE $sanitized END AS t
           |      FROM wal w JOIN r ON w.conv_id = r.conv_id)
           |SELECT route, count(*) AS n_events, CAST(sum(len(t)) AS BIGINT) AS text_chars
           |FROM x GROUP BY route ORDER BY route""".stripMargin
      },

      "q_export_html" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (SELECT conv_id, turn_idx, role, text FROM latest WHERE rn = 1 AND op <> 'D')
           |SELECT conv_id,
           |  '<h2>' || conv_id || '</h2>' || chr(10) ||
           |  string_agg('<p class="' || role || '">' ||
           |    replace(replace(replace(replace(text,
           |      '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;') ||
           |    '</p>', chr(10) ORDER BY turn_idx) AS doc
           |FROM state GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_export_markdown" ->
        s"""$walCte, latest AS (
           |  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
           |  FROM wal),
           |state AS (SELECT conv_id, turn_idx, role, text, tool FROM latest WHERE rn = 1 AND op <> 'D')
           |SELECT conv_id,
           |  '## ' || conv_id || chr(10) || chr(10) ||
           |  string_agg('**' || role || '**' ||
           |    CASE WHEN tool IS NOT NULL THEN ' (' || tool || ')' ELSE '' END ||
           |    ': ' || regexp_replace(text, '([*_`\\[\\]])', '\\\\\\1', 'g'),
           |    chr(10) || chr(10) ORDER BY turn_idx) AS doc
           |FROM state GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      "q_quality_score" ->
        s"""SELECT doc_id, $qualitySqlExpr AS quality
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q_media_decode" ->
        """SELECT doc_id,
          |  CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'image' END AS media_type,
          |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 3) * 4000
          |       ELSE 1 + doc_id % 8 END AS INTEGER) AS dim1,
          |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1
          |       ELSE 1 + doc_id % 5 END AS INTEGER) AS dim2,
          |  CAST(CASE WHEN doc_id % 2 = 0 THEN 50 + doc_id % 50
          |       ELSE (1 + doc_id % 8) * (1 + doc_id % 5) END AS BIGINT) AS payload_units,
          |  CAST(CASE WHEN doc_id % 2 = 0
          |       THEN (50 + doc_id % 50) * 1000000 // (8000 + (doc_id % 3) * 4000)
          |       ELSE 0 END AS BIGINT) AS duration_micros
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q_frame_attach" ->
        s"""$walCte, e AS (SELECT conv_id, epoch_us(ts) AS tsu FROM wal),
           |f AS (SELECT conv_id,
           |        count(*) OVER (PARTITION BY conv_id ORDER BY tsu
           |          RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS n_frame
           |      FROM e)
           |SELECT conv_id, count(*) AS n_events,
           |       CAST(sum(n_frame) AS BIGINT) AS frame_mass,
           |       max(n_frame) AS max_frame
           |FROM f GROUP BY conv_id ORDER BY conv_id""".stripMargin,

      // Planted-pair recall gate for the LSH pipeline: every (doc, doc+tail)
      // pair whose exact 3-token-shingle Jaccard clears the threshold must be
      // found, with that jaccard. DuckDB shingles are strings, Spark's are
      // xxhash64 of the same strings — set sizes (and so jaccard) agree
      // absent 64-bit collisions within one doc pair's ~10³ shingles.
      "q_near_dup_lsh" ->
        """WITH d AS (SELECT doc_id, text FROM documents),
          |tok AS (SELECT doc_id,
          |  list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ta,
          |  list_filter(string_split_regex(lower(text || ' tail marker'), '\s+'), w -> w <> '') AS tb
          |  FROM d),
          |sh AS (SELECT doc_id,
          |  CASE WHEN len(ta) >= 3 THEN list_distinct(list_transform(range(1, len(ta)-1),
          |         i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2]))
          |       ELSE [array_to_string(ta, ' ')] END AS sa,
          |  CASE WHEN len(tb) >= 3 THEN list_distinct(list_transform(range(1, len(tb)-1),
          |         i -> tb[i] || ' ' || tb[i+1] || ' ' || tb[i+2]))
          |       ELSE [array_to_string(tb, ' ')] END AS sb
          |  FROM tok),
          |j AS (SELECT doc_id AS a_id, doc_id + 100000 AS b_id,
          |        CAST(len(list_intersect(sa, sb)) AS DOUBLE)
          |          / len(list_distinct(list_concat(sa, sb))) AS jac
          |      FROM sh)
          |SELECT a_id, b_id, round(jac, 6) AS jaccard FROM j
          |WHERE jac >= 0.5 ORDER BY a_id, b_id""".stripMargin,

      // Connected components as min-reachable-id via a recursive walk: the
      // UNION dedups (v, label) states so the CTE terminates; grouping by v
      // with min(l) is exactly the fixpoint the engine's label propagation
      // converges to.
      "q_dup_clusters" ->
        """WITH RECURSIVE d0 AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id < 60),
          |corpus AS (
          |  SELECT doc_id, text FROM d0
          |  UNION ALL SELECT doc_id + 100000, text || ' tail marker' FROM d0),
          |tok AS (SELECT doc_id,
          |          list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS t
          |        FROM corpus),
          |t AS (SELECT doc_id,
          |        CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(
          |               range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
          |             ELSE [array_to_string(t, ' ')] END AS s
          |      FROM tok),
          |e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM t a, t b
          |      WHERE a.doc_id < b.doc_id
          |        AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          |            / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
          |edges AS (SELECT a_id AS src, b_id AS dst FROM e
          |          UNION SELECT b_id, a_id FROM e),
          |walk(v, l) AS (
          |  SELECT DISTINCT src, src FROM edges
          |  UNION
          |  SELECT e.dst, w.l FROM walk w JOIN edges e ON e.src = w.v)
          |SELECT v AS id, min(l) AS cluster_id, v = min(l) AS is_survivor
          |FROM walk GROUP BY v ORDER BY id""".stripMargin,

      // Planted-copy recall gate for embedding near-dup: a 0.5-scaled copy's
      // float multiply is EXACT (exponent decrement), so both engines see
      // identical doubles; cosine is integer-quantized like q_ann_brute.
      "q_embed_dedup" ->
        """WITH base AS (
          |  SELECT vec_id,
          |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qa,
          |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*0.5*1000) AS BIGINT)) AS qb
          |  FROM embeddings),
          |p AS (
          |  SELECT vec_id AS a_id, vec_id + 100000 AS b_id,
          |    list_sum(list_transform(range(1, len(qa)+1), i -> qa[i]*qb[i])) AS dot,
          |    list_sum(list_transform(qa, x -> x*x)) AS na,
          |    list_sum(list_transform(qb, x -> x*x)) AS nb
          |  FROM base),
          |s AS (SELECT a_id, b_id,
          |        round(CAST(dot AS DOUBLE)
          |          / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS sim
          |      FROM p)
          |SELECT a_id, b_id, sim FROM s WHERE sim >= 0.99 ORDER BY a_id""".stripMargin,

      "q_base64_uri" ->
        """SELECT doc_id,
          |       CAST(len('data:text/plain;base64,' || to_base64(encode(text))) AS BIGINT) AS uri_len,
          |       decode(from_base64(to_base64(encode(text)))) = text AS roundtrip_ok
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q_rlike_labels" ->
        """SELECT lang, count(*) AS n_docs,
          |       count(*) FILTER (regexp_matches(text, '^\p{L}')) AS n_start_letter,
          |       count(*) FILTER (regexp_matches(text, '^\p{N}')) AS n_start_digit,
          |       count(*) FILTER (regexp_matches(text, '^\p{Lu}')) AS n_start_upper,
          |       count(*) FILTER (regexp_matches(text, '\p{Han}')) AS n_has_han
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      "q_doc_quality" ->
        """WITH d AS (
          |  SELECT lang, n_chars,
          |         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
          |         CAST(len(list_filter(string_split(text, ' '),
          |              w -> w IN ('the', 'a'))) AS DOUBLE)
          |           / len(list_filter(string_split(text, ' '), w -> w <> '')) AS stop_ratio
          |  FROM documents)
          |SELECT lang, count(*) AS n_docs,
          |       round(CAST(avg(n_tokens) AS DOUBLE), 2) AS avg_tokens,
          |       round(CAST(avg(n_chars) AS DOUBLE), 2) AS avg_chars,
          |       round(CAST(avg(stop_ratio) AS DOUBLE), 4) AS avg_stop_ratio
          |FROM d GROUP BY lang ORDER BY lang""".stripMargin
    )
  }
}
