package graft.model

import org.apache.spark.sql.types._

/** Core data model of the CDC/incremental-ingest engine.
  *
  * Domain per BASELINE.json `input_hint`: multi-turn conversation transcripts.
  * The reference's `List<List<IObject>>` page-partitioned element lists
  * (reference: processors/DocumentProcessor.java:179) become a keyed, ordered
  * table: `conv_id` is the grouping key (the reference's page number) and
  * `turn_idx` the explicit intra-group order (the reference's element index —
  * never physical order, mirroring its ID-based rather than positional
  * metadata re-keying at processors/DocumentProcessor.java:439-446).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp
)

/** One WAL/binlog change event. `op` is I(nsert)/U(pdate)/D(elete);
  * `lsn` totally orders events within a key (arbitration = max lsn,
  * the analog of the reference's last-writer-wins hybrid text arbitration,
  * processors/HybridDocumentProcessor.java:892-1010); `commit_ts` is the
  * watermark column.
  */
final case class ChangeEvent(
    op: String,
    lsn: Long,
    commit_ts: java.sql.Timestamp,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp
)

object Schemas {
  /** Target (state) table schema — additive evolution may append columns. */
  val turn: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)
  ))

  /** Change-event envelope = op/lsn/commit_ts + payload columns. */
  val changeEvent: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("commit_ts", TimestampType)
  ) ++ turn.fields)

  /** Early-batch variant without the `tool` column (schema-evolution fixture:
    * the additive column appears mid-stream, cf. hybrid metadata fields that
    * exist only for enriched elements, json/serializers/SerializerUtil.java:51-124).
    */
  val changeEventV0: StructType =
    StructType(changeEvent.fields.filterNot(_.name == "tool"))

  /** Merge key. The engine's only identity; all ordering/equality derives
    * from it (north rule: stable turn ordering by (conv_id, turn_idx)). */
  val mergeKey: Seq[String] = Seq("conv_id", "turn_idx")
}

/** Job configuration. Mirrors the reference's Config/FilterConfig pattern
  * where every boolean toggles an operator stage (api/FilterConfig.java:29-34).
  */
final case class IngestConfig(
    tablePath: String,
    checkpointPath: String,
    numBuckets: Int = 64,
    watermarkDelay: String = "1 hour",
    /** Drop events older than (max seen commit_ts - delay); counted, not silent. */
    enforceWatermark: Boolean = true,
    sanitize: Boolean = false,
    flagBoilerplate: Boolean = false,
    /** Salt factor for hot-conversation pre-shuffle (0 = off). */
    saltBuckets: Int = 8,
    maxFilesPerTrigger: Int = 8,
    /** WAL encoding: "parquet" (binlog extracts) or "json" (line-delimited
      * feeds — corrupt records counted and filtered, never fatal). */
    walFormat: String = "parquet",
    /** None (default): drain-and-exit (Trigger.AvailableNow — batch-style
      * catch-up runs, the reference CLI's process-what's-there loop).
      * Some(interval): FOLLOW mode — a ProcessingTime trigger that keeps
      * tailing the WAL dir for new files at the given cadence until the
      * query is stopped (graceful: the in-flight epoch completes, the
      * checkpoint + epoch manifest make the next start resume exactly-once).
      */
    followInterval: Option[String] = None
)
