package graft.lake

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter,
  DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationInfo, SupportsDelta,
  WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Hadoop `Configuration` is not Serializable; this is the standard
  * write/readFields envelope (the same shape Spark uses internally) so the
  * prepared parquet write conf can ride inside a serializable task factory.
  */
final class SerializableHConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** SQL `MERGE INTO` / `UPDATE` / subquery-`DELETE` over a GraftLake table —
  * Spark 4's delta-based row-level-operation surface
  * ([[org.apache.spark.sql.connector.write.SupportsDelta]]) wired to the
  * engine's native CDC semantics. The reference's write-back loop (SURVEY
  * S10, `AutoTaggingProcessor.java:81-118`) becomes expressible in pure SQL:
  *
  * {{{
  *   MERGE INTO gcat.ns.turns t USING updates s
  *     ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
  *     WHEN MATCHED AND s.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Physical shape — MERGE-ON-READ, never a rewrite:
  *  - The target READ pins one snapshot and serves the arbitrated live
  *    state (bucket-pruned / columnar exactly like any other scan).
  *  - Spark joins source⋈target and streams typed ops to executor-side
  *    [[GraftDeltaWriter]]s, which write op='U' rows and 'D' tombstones as
  *    per-bucket parquet DELTA files — O(changed rows), the same files a
  *    [[LakeTable.merge]] epoch writes.
  *  - UPDATE is represented as DELETE + REINSERT
  *    ([[representUpdateAsDeleteAndInsert]]): the engine's last-writer-wins
  *    arbitration needs the old key tombstoned when an UPDATE changes a key
  *    column. Deletes carry lsn = max_lsn+1 and upserts max_lsn+2, so an
  *    unchanged-key update's reinsert beats its own tombstone
  *    deterministically.
  *  - COMMIT is serializable: CAS at pinnedVersion+1
  *    ([[LakeTable.commitPinned]]); a concurrent commit aborts the
  *    statement loudly (its staged files become vacuum-reclaimable
  *    orphans), because the written lsns were allocated against the pinned
  *    snapshot.
  *
  * One caveat, documented like the INSERT path's: two NOT-MATCHED inserts
  * of the SAME key within one MERGE tie on the shared upsert lsn and
  * resolve nondeterministically (Spark's cardinality check already rejects
  * duplicate MATCHED rows).
  */
final class GraftRowLevelOperation(spark: SparkSession, path: String,
                                   cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  private val lake = LakeTable.open(spark, path)
  private[lake] val pinned: LakeTable#Snapshot =
    lake.currentSnapshot.getOrElse(throw new IllegalStateException(
      s"cannot run a row-level $cmd on $path: no snapshot yet"))

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graftlake row-level $cmd"

  /** The engine's merge key IS the row id. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("conv_id"), Expressions.column("turn_idx"))

  /** Updates arrive as delete + reinsert: correct even when an UPDATE
    * rewrites a key column (the old key must be tombstoned), and the
    * two-lsn allocation keeps the unchanged-key case deterministic.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** Target read, PINNED to the operation's snapshot: the matched set and
    * the commit must agree on one table state. Pruning/pushdown apply as on
    * any other scan of that version.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScanBuilder(spark, path, Some(pinned.version), None,
      GraftLakeV2Table.keysNonNull(pinned.schema))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(lake, pinned.asInstanceOf[lake.Snapshot],
          s"sql-${cmd.toString.toLowerCase}", info)
    }
}

/** Per-bucket file lists + counters from one committed writer task (shared
  * by the row-level delta writers and the streaming sink writers).
  */
final case class GraftDeltaCommit(files: Map[Int, Seq[String]],
                                  rows: Long, deletes: Long,
                                  maxLsn: Long = 0L, maxHw: Long = 0L)
    extends WriterCommitMessage

final class GraftDeltaWrite(lake: LakeTable, pinned: LakeTable#Snapshot,
                            epochNs: String, info: LogicalWriteInfo)
    extends DeltaWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** Cluster the delta rows by the table's OWN bucket function before the
    * writers run: without it every write task opens a file per bucket it
    * happens to see, so one MERGE from a T-task source writes O(T × buckets)
    * delta files per epoch — at cluster scale that is a manifest and
    * read-amplification explosion compaction has to mop up. Clustered on
    * `bucket(n, conv_id)` (resolved through the catalog's FunctionCatalog —
    * row-level ops always come through the catalog), all rows of one bucket
    * land in ONE task: O(touched buckets) files, the same shape
    * [[LakeTable.merge]] produces with its explicit repartition. Costs one
    * O(changed) hash shuffle — the trade the engine's native merge already
    * makes. Skew note: a pathologically hot bucket serializes into one
    * task; the native merge salts for that — MERGE batches are O(changed)
    * and keep the simpler exact clustering.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.bucket(lake.tableNumBuckets, "conv_id")))

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty

  private val fileSchema: StructType =
    lake.fileSchemaOf(pinned.schema.asInstanceOf[StructType])
  private val maxLsn: Long =
    pinned.asInstanceOf[lake.Snapshot].metrics.getOrElse("max_lsn", 0L)
  // deletes below upserts: an update-as-delete+reinsert of an unchanged key
  // must resolve to the reinsert
  private val lsnDelete = maxLsn + 1
  private val lsnUpsert = maxLsn + 2
  private val stagingRel =
    lake.newEpochDir(pinned.asInstanceOf[lake.Snapshot].version + 1)

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    override def createBatchWriterFactory(phys: PhysicalWriteInfo): DeltaWriterFactory = {
      val (factory, conf) = lake.executorWriterFactory(fileSchema)
      GraftDeltaWriterFactory(factory, new SerializableHConf(conf),
        s"${lake.path}/$stagingRel", fileSchema,
        info.schema(), info.rowIdSchema().orElse(null),
        lake.tableNumBuckets, lsnDelete, lsnUpsert)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val commits = messages.collect { case m: GraftDeltaCommit => m }
      val bucketFiles = commits.flatMap(_.files).groupBy(_._1)
        .map { case (b, fs) => b -> fs.flatMap(_._2).toSeq.sorted }
      val events = commits.map(_.rows).sum
      val deletes = commits.map(_.deletes).sum
      if (events == 0) return // nothing matched / nothing inserted: no epoch
      val nowMicros = System.currentTimeMillis() * 1000L
      lake.commitPinned(pinned.asInstanceOf[lake.Snapshot], epochNs,
        bucketFiles, events, deletes, nowMicros, lsnUpsert)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      // best-effort: committed tasks' files are listed; task-aborts already
      // deleted their own. The staging dir is unreferenced either way —
      // vacuum reclaims anything this misses.
      val dir = java.nio.file.Paths.get(lake.path, stagingRel)
      if (java.nio.file.Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(dir)) { s =>
          s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().asScala.foreach(p =>
              try java.nio.file.Files.deleteIfExists(p)
              catch { case _: IOException => () })
        }
      }
    }
  }
}

final case class GraftDeltaWriterFactory(
    factory: OutputWriterFactory, conf: SerializableHConf,
    stagingDir: String, fileSchema: StructType,
    writeSchema: StructType, rowIdSchema: StructType,
    numBuckets: Int, lsnDelete: Long, lsnUpsert: Long)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(this, partitionId, taskId)
}

/** Executor-side bucket-routed parquet task writer: rows in the engine's
  * file schema (op, payload…, _lsn) land in per-bucket files under one
  * staging epoch dir, through Spark's own parquet OutputWriter
  * (vectorizable files, real column statistics). Buckets are computed with
  * the writer's exact hash ([[LakeTable.bucketOf]]); one open writer per
  * touched bucket per task. Task aborts delete this task's own files, so a
  * retried task never leaks duplicates into the commit message set. Shared
  * by the row-level delta writers and the streaming sink writers.
  */
private[lake] abstract class GraftBucketFileWriter(
    factory: OutputWriterFactory, hconf: SerializableHConf,
    stagingDir: String, fileSchema: StructType, numBuckets: Int,
    partitionId: Int, taskId: Long) {

  protected val ctx = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      hconf.value,
      new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
        partitionId), (taskId & 0x7fffffff).toInt))
  }
  private val ext = factory.getFileExtension(ctx)

  protected val opU = UTF8String.fromString("U")
  protected val opD = UTF8String.fromString("D")
  private val writers =
    scala.collection.mutable.Map.empty[Int,
      (org.apache.spark.sql.execution.datasources.OutputWriter, String)]
  private var rows = 0L
  private var deletes = 0L
  private var maxLsn = 0L
  private var maxHw = 0L

  private def writerFor(bucket: Int)
      : org.apache.spark.sql.execution.datasources.OutputWriter =
    writers.getOrElseUpdate(bucket, {
      val name = s"part-$partitionId-$taskId-b$bucket$ext"
      val path = s"$stagingDir/b=$bucket/$name"
      (factory.newInstance(path, fileSchema, ctx), s"b=$bucket/$name")
    })._1

  /** Write one file-schema row (values(0)=op … values(last)=_lsn), routed
    * by the key's bucket.
    */
  protected def emitValues(values: Array[Any], conv: UTF8String,
                           isDelete: Boolean, lsn: Long, hwMicros: Long): Unit = {
    require(conv != null, "graftlake merge key conv_id must not be null")
    val bucket = LakeTable.bucketOf(conv.toString, numBuckets)
    writerFor(bucket).write(new GenericInternalRow(values))
    rows += 1
    if (isDelete) deletes += 1
    if (lsn > maxLsn) maxLsn = lsn
    if (hwMicros > maxHw) maxHw = hwMicros
  }

  def commitMessage(): WriterCommitMessage = {
    val rel = stagingRelOf(stagingDir)
    val byBucket = writers.map { case (b, (w, name)) =>
      w.close(); b -> Seq(s"$rel/$name")
    }.toMap
    GraftDeltaCommit(byBucket, rows, deletes, maxLsn, maxHw)
  }

  /** Table-relative epoch dir (stagingDir is absolute: <table>/data/…). */
  private def stagingRelOf(abs: String): String = {
    val i = abs.lastIndexOf("/data/")
    abs.substring(i + 1)
  }

  def abortFiles(): Unit =
    writers.values.foreach { case (w, rel) =>
      try w.close() catch { case _: Exception => () }
      try java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$stagingDir/$rel"))
      catch { case _: IOException => () }
    }
}

final class GraftDeltaWriter(f: GraftDeltaWriterFactory,
                             partitionId: Int, taskId: Long)
    extends GraftBucketFileWriter(f.factory, f.conf, f.stagingDir,
      f.fileSchema, f.numBuckets, partitionId, taskId)
    with DeltaWriter[InternalRow] {

  // fileSchema = op +: payload(table order) :+ _lsn; map each payload slot
  // to its ordinal in the incoming ROW / ROWID projections by NAME
  private val payloadFields = f.fileSchema.fields.slice(1, f.fileSchema.fields.length - 1)
  private val fromRow: Array[Int] =
    payloadFields.map(p => f.writeSchema.fieldNames.indexOf(p.name))
  private val fromRowId: Array[Int] =
    payloadFields.map(p =>
      if (f.rowIdSchema == null) -1 else f.rowIdSchema.fieldNames.indexOf(p.name))
  private val convInRow = f.writeSchema.fieldNames.indexOf("conv_id")
  private val convInRowId =
    if (f.rowIdSchema == null) -1 else f.rowIdSchema.fieldNames.indexOf("conv_id")

  private def emit(src: InternalRow, idx: Array[Int], convIdx: Int,
                   op: UTF8String, lsn: Long): Unit = {
    val out = new Array[Any](f.fileSchema.length)
    out(0) = op
    var i = 0
    while (i < payloadFields.length) {
      val from = idx(i)
      out(i + 1) =
        if (from < 0 || src.isNullAt(from)) null
        else src.get(from, payloadFields(i).dataType)
      i += 1
    }
    out(out.length - 1) = lsn
    emitValues(out, src.getUTF8String(convIdx), op == opD, lsn, 0L)
  }

  override def insert(row: InternalRow): Unit =
    emit(row, fromRow, convInRow, opU, f.lsnUpsert)

  override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
    insert(row)

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    emit(id, fromRowId, convInRowId, opD, f.lsnDelete)

  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit =
    // unreachable with representUpdateAsDeleteAndInsert=true; kept total
    insert(row)

  override def commit(): WriterCommitMessage = commitMessage()

  override def abort(): Unit = abortFiles()

  override def close(): Unit = ()
}
