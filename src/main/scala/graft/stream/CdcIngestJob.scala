package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.LakeTable
import graft.model.{IngestConfig, Schemas}
import graft.ops.CdcOps

/** The streaming CDC ingest core (north rule): tail a WAL directory with a
  * file source, window/dedup/arbitrate per micro-batch, and apply to a
  * [[LakeTable]] with an idempotent epoch-stamped merge inside `foreachBatch`.
  *
  * Reference lineage: the per-document extract→transform→write-back loop
  * (api/OpenDataLoaderPDF.java:39-41 → DocumentProcessor.extractContents →
  * generateOutputs) becomes per-micro-batch `ops pipeline → MERGE`; the
  * reference's per-file CLI resumability (CLIMain.java:106-117) becomes
  * checkpointed source offsets + the lake's committed-epoch manifest.
  *
  * Exactly-once: Structured Streaming may re-run a batch after failure;
  * `LakeTable.merge` consults the snapshot's committed epochs and re-applies
  * as a no-op. Offsets (checkpoint) + epoch manifest (table) together give
  * end-to-end exactly-once without a transactional source.
  */
object CdcIngestJob {

  /** The per-batch transform pipeline — also usable in pure batch replay.
    * NOTE: (key,lsn) duplicate events need no explicit dedup stage — the
    * merge's single arbitration aggregate collapses them for free (identical
    * payloads, same max_by winner), saving a full shuffle per batch.
    */
  def pipeline(batch: DataFrame, conf: IngestConfig, highWaterMicros: Long): DataFrame = {
    var df = batch
    if (conf.enforceWatermark && highWaterMicros > 0L)
      df = CdcOps.dropLate(df, highWaterMicros,
        expr(s"INTERVAL '${conf.watermarkDelay}'"))
    if (conf.sanitize) df = CdcOps.sanitize(df)
    if (conf.flagBoilerplate)
      // Drop cross-conversation boilerplate turns before they reach the lake
      // (reference: header/footer rows never enter the content stream).
      // UPSERTS ONLY: a 'D' tombstone often carries the before-image — and
      // boilerplate turns are exactly the ones most likely deleted — so
      // filtering deletes by their text would silently drop the tombstone
      // and leave the target row live (delete loss / resurrection).
      df = CdcOps.flagBoilerplate(df)
        .where(col("op") === "D" || !col("is_boilerplate"))
        .drop("is_boilerplate")
    df
  }

  /** Per-run lineage totals accumulated on the driver. (Observed metrics on
    * a foreachBatch frame never reach StreamingQueryProgress, and AQE can
    * elide CollectMetrics on empty batches — so late drops are counted by a
    * dedicated action and accumulated here.)
    */
  final class IngestMetrics {
    private val late = new java.util.concurrent.atomic.LongAdder
    private val applied = new java.util.concurrent.atomic.LongAdder
    private[stream] def add(lateDrops: Long, events: Long): Unit = {
      late.add(lateDrops); applied.add(events)
    }
    def lateDrops: Long = late.sum
    def eventsApplied: Long = applied.sum
  }

  /** Register a lineage-metrics listener on the session's stream bus. */
  def attachListener(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }

  /** Start the streaming query. Caller owns stop/await. */
  def start(spark: SparkSession, walDir: String, conf: IngestConfig,
            withTool: Boolean = true): StreamingQuery =
    startWithMetrics(spark, walDir, conf, withTool)._1

  /** Start + a driver-side lineage accumulator (late drops, events applied). */
  def startWithMetrics(spark: SparkSession, walDir: String, conf: IngestConfig,
                       withTool: Boolean = true): (StreamingQuery, IngestMetrics) = {
    val metrics = new IngestMetrics
    val schema = if (withTool) Schemas.changeEvent else Schemas.changeEventV0
    val table = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    // WAL encoding is a config switch: parquet binlog extracts, or a JSON
    // line feed through the hardened source (corrupt records observed as
    // `wal_source_stream` on the progress bus, then filtered — the
    // reference's warn-and-continue policy, DocumentProcessor.java:239-250).
    val raw = conf.walFormat match {
      case "parquet" => spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", conf.maxFilesPerTrigger)
        .parquet(walDir)
      case "json" =>
        graft.wal.WalSource.readJsonStream(spark, walDir, conf.maxFilesPerTrigger)
      case other => sys.error(s"unknown walFormat: $other (parquet|json)")
    }
    val stream = raw
      .withWatermark("commit_ts", conf.watermarkDelay)
      // surfaced per batch on the streaming progress bus (MetricsListener)
      .observe("wal", count(lit(1)).as("events"),
        max(col("commit_ts")).as("max_commit_ts"))

    // Epoch namespace must be scoped to the checkpoint: batchIds restart at 0
    // for a new checkpoint, so a table fed by successive streams (or multiple
    // writers) needs one committed-epoch counter per checkpoint lineage. The
    // FULL path is the key (one snapshot-manifest entry per stream, not per
    // row — length is irrelevant): a 32-bit hash of it would collide two
    // checkpoint lineages at the birthday bound and make one stream's batchId
    // silently suppress the other's merges.
    val epochNs = "cdc-" + conf.checkpointPath
    // MIGRATION WINDOW: pre-upgrade checkpoints committed under a 32-bit
    // MurmurHash of the checkpoint path. A stream resuming such a checkpoint
    // may crash-replay its last batch, which only the legacy namespace knows
    // as committed — consult it too (read old key, write new key) so the
    // replay stays a no-op instead of duplicating the batch's rows.
    val legacyEpochNs = "cdc-" + java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(conf.checkpointPath).toLong & 0xffffffffL)
    stream.writeStream
      .option("checkpointLocation", conf.checkpointPath)
      // AvailableNow drains what exists and exits (resumable catch-up runs);
      // follow mode keeps tailing at a fixed cadence for a real deployment.
      .trigger(conf.followInterval match {
        case Some(interval) => Trigger.ProcessingTime(interval)
        case None           => Trigger.AvailableNow()
      })
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val snap = table.currentSnapshot
        val hw = snap.map(_.highWaterMicros).getOrElse(0L)
        val staged = pipeline(batch, conf, hw)
        // mergeWithRetry, not merge: concurrent maintenance (compactAll, a
        // second writer) is a supported scenario, and a bare commit race
        // would throw out of foreachBatch and kill the streaming query —
        // an operational failure the optimistic retry loop exists to absorb.
        val res =
          if (snap.exists(_.committedEpochs.get(legacyEpochNs).exists(_ >= batchId)))
            table.MergeResult(applied = false, snap.get.version, 0, 0, 0, 0, 0, hw)
          else table.mergeWithRetry(staged, epochNs, batchId)
        // Late count is its OWN action, not an Observation riding the merge:
        // when a whole batch is late, AQE's empty-relation propagation
        // through the merge's repartition drops the CollectMetrics subtree
        // and the observed count silently reads 0. This scan is cheap — the commit_ts
        // predicate pushes into the parquet scan and only that column is
        // read.
        val lateDrops =
          if (res.applied && conf.enforceWatermark && hw > 0L)
            batch.where(col("commit_ts") <
              timestamp_micros(lit(hw)) - expr(s"INTERVAL '${conf.watermarkDelay}'"))
              .count()
          else 0L
        metrics.add(lateDrops, res.events)
        // Per-batch lineage to the driver log; the snapshot carries the same
        // numbers durably (A9 / north-rule metrics).
        println(s"""{"batch":$batchId,"applied":${res.applied},"events":${res.events},""" +
          s""""upserts":${res.upserts},"deletes":${res.deletes},"lateDrops":$lateDrops,""" +
          s""""touchedBuckets":${res.touchedBuckets},"version":${res.version}}""")
        ()
      }
      .start() -> metrics
  }

  /** Batch replay of a WAL DataFrame straight into the table — same pipeline,
    * one epoch per call. Used by benchmarks, Verify queries, and replay tests.
    */
  def replayBatch(spark: SparkSession, wal: DataFrame, conf: IngestConfig,
                  epochId: Long = 0L): LakeTable = {
    val table = new LakeTable(spark, conf.tablePath, conf.numBuckets)
    val hw = table.currentSnapshot.map(_.highWaterMicros).getOrElse(0L)
    table.merge(pipeline(wal, conf, hw), "replay", epochId)
    table
  }
}
