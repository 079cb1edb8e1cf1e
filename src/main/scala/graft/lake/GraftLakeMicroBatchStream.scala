package graft.lake

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = table snapshot VERSION (json is the bare number, so
  * checkpoints written by the retired v1 source resume unchanged).
  */
final case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** STREAMING CHANGE FEED on the supported DSv2 surface: every commit
  * becomes a micro-batch of raw change rows (op / payload / `_lsn` /
  * `_commit_version`), so downstream pipelines consume the table exactly
  * like the table consumes the WAL — lake→lake hops compose exactly-once
  * (deterministic version-bounded replay + the sink's epoch manifest).
  *
  * The batch plan is files-first, no arbitration (the change feed is raw):
  * each version's change files come from the O(commit) sidecar manifest,
  * and the rows are served by Spark's own parquet partition readers over
  * exactly those files — per version, so `_commit_version` is appended as
  * a partition-constant column (a `JoinedRow`, no extra scan or regex).
  *
  * Admission control: `maxVersionsPerTrigger` bounds catch-up batches;
  * `Trigger.AvailableNow` pins the drain target at start
  * ([[SupportsTriggerAvailableNow]]) so a busy writer cannot keep the
  * drain alive forever.
  *
  * SCHEMA PIN: the read schema is fixed when the stream (re)starts — files
  * written before an additive evolution read through it null-filled, files
  * written after project down to it; a restart picks up the widened schema.
  * Same semantics as the mainstream lakehouse CDF sources.
  */
final class GraftLakeMicroBatchStream(spark: SparkSession, path: String,
                                      startingVersion: Long,
                                      pinnedSchema: StructType,
                                      maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val table = LakeTable.open(spark, path)
  // pinnedSchema = (possibly `select`-narrowed) change columns; the files
  // carry everything but the virtual _commit_version, which — when selected
  // at all — is appended by the reader wrapper as a partition constant.
  private val withVersion = pinnedSchema.fieldNames.contains("_commit_version")
  private val fileSchema =
    StructType(pinnedSchema.fields.filterNot(_.name == "_commit_version"))

  private def versionOf(o: Offset): Long = o match {
    case GraftVersionOffset(v) => v
    case other                 => other.json().trim.toLong
  }

  override def initialOffset(): Offset = GraftVersionOffset(startingVersion)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  // Trigger.AvailableNow: pin the drain target when the query starts —
  // versions committed after that belong to the next run.
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = table.latestVersion

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled surface")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = versionOf(start)
    val latest = availableNowTarget.orElse(table.latestVersion).getOrElse(from)
    // Default bound 128 versions/batch: an unbounded deep catch-up would
    // plan one scan build per version in a single giant batch (driver-side
    // O(lag)); bounding turns it into a pipeline of right-sized batches —
    // exactly-once either way. ≤0 opts out.
    val bound = maxVersionsPerTrigger.getOrElse(128L)
    val capped = if (bound <= 0L) latest else math.min(latest, from + bound)
    GraftVersionOffset(math.max(from, capped))
  }

  /** One delegate parquet Batch per VERSION in (start, end]: the version is
    * a constant over that batch's partitions, which is what lets the reader
    * append `_commit_version` without touching file bytes. The last planned
    * delegate's factory serves [[createReaderFactory]] (Spark plans then
    * asks for the factory on the same exec node).
    */
  @volatile private var delegateFactory: PartitionReaderFactory = _

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = versionOf(start); val b = versionOf(end)
    val parts = Seq.newBuilder[InputPartition]
    ((a + 1) to b).foreach { v =>
      val files = table.changeFilesWithStats(v)._1
      if (files.nonEmpty) {
        val index = new InMemoryFileIndex(spark,
          files.map(f => new HPath(s"$path/$f")), Map.empty, Some(fileSchema))
        val scan = new ParquetScanBuilder(spark, index, fileSchema, fileSchema,
          CaseInsensitiveStringMap.empty()).build()
        val batch = scan.toBatch
        delegateFactory = batch.createReaderFactory()
        batch.planInputPartitions().foreach(p =>
          parts += GraftVersionedPartition(p, v))
      }
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // identical per batch (same schema/conf; only the file lists differ,
    // and those live in the partitions)
    GraftVersionedReaderFactory(delegateFactory, withVersion)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A delegate parquet file partition tagged with the commit version all of
  * its rows belong to.
  */
final case class GraftVersionedPartition(inner: InputPartition, version: Long)
    extends InputPartition

/** Row-mode wrapper appending the partition's `_commit_version` to every
  * delegate row. Row-mode on purpose: the appended constant forces the
  * non-vectorized path, and change-feed batches are commit-sized — the
  * steady-state analytics scans (the 100 TB path) stay columnar through
  * the batch connector.
  */
final case class GraftVersionedReaderFactory(inner: PartitionReaderFactory,
                                             withVersion: Boolean)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vp = partition.asInstanceOf[GraftVersionedPartition]
    val delegate = inner.createReader(vp.inner)
    if (!withVersion) delegate // projection dropped the virtual column
    else {
      val vRow = InternalRow(vp.version)
      new PartitionReader[InternalRow] {
        private val joined = new JoinedRow
        override def next(): Boolean = delegate.next()
        override def get(): InternalRow = joined(delegate.get(), vRow)
        override def close(): Unit = delegate.close()
      }
    }
  }
}
