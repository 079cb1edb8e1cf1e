package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** STREAMING CHANGE FEED: `spark.readStream.format("graftlake")
  * .option("path", t).load()` tails the lake's own commit log — every merge
  * becomes a micro-batch of raw change rows (op / payload / _lsn /
  * _commit_version), so downstream pipelines consume the table exactly like
  * the table consumes the WAL. Lake-to-lake pipelines compose from this:
  * ingest → lake A → change-feed stream → derived lake B, each hop
  * exactly-once (source offsets are snapshot VERSIONS, deterministic to
  * replay; the sink's epoch manifest dedups).
  *
  * Offsets: the stream's offset IS the table version. `getBatch(a, b)` =
  * [[LakeTable.changesBetween]](a, b) — version-bounded, so checkpoint
  * recovery replays byte-identical batches however many commits landed
  * since. `startingVersion` (default 0 = everything retained) skips history;
  * vacuumed history fails loudly rather than silently skipping commits —
  * retention must cover the feed's lag, the same contract as batch
  * `changesSince`.
  */
final class GraftLakeStreamSource(spark: SparkSession, path: String,
                                  startingVersion: Long) extends Source {

  private val table = LakeTable.open(spark, path)

  override val schema: StructType = GraftLakeStreamSource.changesSchema(spark, path)

  override def getOffset: Option[Offset] =
    table.latestVersion.filter(_ > startingVersion).map(LongOffset(_))

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val batch = table.changesBetween(from, versionOf(end))
    // SCHEMA PIN: the stream's schema is fixed at source creation; a column
    // added by additive evolution mid-stream would widen the batch frame and
    // misbind against the query's resolved attributes. Project to the pinned
    // schema (always a subset — evolution is additive): the new column flows
    // after a stream restart, the running query keeps its contract. Same
    // semantics as the mainstream lakehouse CDF sources.
    val pinned = batch.select(schema.fieldNames.toIndexedSeq.map(
      org.apache.spark.sql.functions.col): _*)
    // Source.getBatch must return a STREAMING frame (MicroBatchExecution
    // asserts it) — re-root the batch plan, same as Spark's own v1 sources.
    org.apache.spark.sql.graftbridge.asStreamingFrame(pinned)
  }

  override def stop(): Unit = ()
}

object GraftLakeStreamSource {
  /** op + payload + _lsn + _commit_version — the change-feed row shape. */
  def changesSchema(spark: SparkSession, path: String): StructType = {
    val t = LakeTable.open(spark, path)
    val snap = t.currentSnapshot.getOrElse(throw new IllegalArgumentException(
      s"cannot stream changes of $path: no snapshot yet (create the table " +
        "or merge once first — the feed's schema is the table's)"))
    StructType(t.fileSchemaOf(snap.schema).fields :+
      StructField("_commit_version", LongType))
  }
}
