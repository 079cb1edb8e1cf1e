package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{
  DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `df.writeStream.format("graftlake").start()` — the DSv2-native streaming
  * sink: every micro-batch lands as one idempotent merge epoch, written by
  * EXECUTOR-side per-bucket parquet writers ([[GraftBucketFileWriter]]) and
  * committed by the driver through the same O(changed) metadata path as
  * [[LakeTable.merge]] — the foreachBatch idiom's semantics behind the
  * supported API, with no driver-side row movement.
  *
  * Exactly-once: the epoch namespace is `sink-<queryId>` (stable across
  * restarts — Spark persists the query id in the checkpoint) and the epoch
  * id is the batch id, so a replayed batch after crash/restart short-
  * circuits as already-committed and its re-written files are vacuum-
  * reclaimable orphans.
  *
  * CDC envelope: if the stream carries `op` / `lsn` / `commit_ts` columns
  * they are honored (a change-feed-shaped stream keeps real tombstones and
  * writer lsns); otherwise rows land as op='U' upserts under a synthesized
  * lsn of `max_lsn@start + batchId + 1` — deterministic across batch
  * replays, and documented SINGLE-WRITER (a concurrent writer allocating
  * its own lsns could interleave; CDC feeds with real lsns have no such
  * caveat).
  *
  * Commit concurrency: the metadata commit retries on CAS conflicts like
  * [[LakeTable.mergeWithRetry]], renaming the staged epoch dir to each
  * attempted version (files are written once, metadata re-targets).
  */
final class GraftStreamingWrite(lake: LakeTable, info: LogicalWriteInfo)
    extends StreamingWrite {

  private val ns = s"sink-${info.queryId()}"
  private val streamSchema = info.schema()
  private val envelope = Set("op", "lsn", "commit_ts")
  private val payloadSchema =
    StructType(streamSchema.fields.filterNot(f => envelope(f.name)))
  require(Seq("conv_id", "turn_idx").forall(payloadSchema.fieldNames.contains),
    s"a graftlake stream needs the merge key columns (conv_id, turn_idx); " +
      s"got ${streamSchema.fieldNames.mkString(", ")}")
  private val fileSchema = StructType(
    StructField("op", org.apache.spark.sql.types.StringType) +:
      payloadSchema.fields :+ StructField("_lsn", LongType))
  private val lsnBase: Long =
    lake.currentSnapshot.flatMap(_.metrics.get("max_lsn")).getOrElse(0L)
  // staging prefix is per-RUN (nonce): two runs of the same query never
  // share a tmp dir, and a zombie run's strays are unreferenced orphans
  private val stagingPrefix =
    s"data/tmp-${ns.take(13)}-${java.util.UUID.randomUUID().toString.take(8)}"

  private def stagingRel(epochId: Long): String = f"$stagingPrefix-e$epochId%d"

  override def createStreamingWriterFactory(
      phys: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (factory, conf) = lake.executorWriterFactory(fileSchema)
    GraftSinkWriterFactory(factory, new SerializableHConf(conf),
      s"${lake.path}/$stagingPrefix", fileSchema, streamSchema,
      lake.tableNumBuckets, lsnBase)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.collect { case m: GraftDeltaCommit => m }
    var bucketFiles = commits.flatMap(_.files).groupBy(_._1)
      .map { case (b, fs) => b -> fs.flatMap(_._2).toSeq.sorted }
    val events = commits.map(_.rows).sum
    if (events == 0) { abort(epochId, messages); return } // empty trigger
    val deletes = commits.map(_.deletes).sum
    val maxLsn = commits.map(_.maxLsn).max
    val hw = {
      val m = commits.map(_.maxHw).max
      if (m > 0L) m else System.currentTimeMillis() * 1000L
    }
    var currentRel = stagingRel(epochId)
    var attempt = 0
    while (true) {
      val prev = lake.currentSnapshot
      if (prev.exists(_.committedEpochs.get(ns).exists(_ >= epochId))) {
        // crash/restart replay: the batch is already in the table — drop
        // the re-written files (they were staged under this run's prefix)
        abort(epochId, messages)
        return
      }
      // re-target the staged dir at the version this attempt commits
      val rel = lake.newEpochDir(prev.map(_.version + 1).getOrElse(1L))
      Files.createDirectories(Paths.get(lake.path, rel).getParent)
      Files.move(Paths.get(lake.path, currentRel), Paths.get(lake.path, rel))
      bucketFiles = bucketFiles.map { case (b, fs) =>
        b -> fs.map(f => rel + f.substring(currentRel.length))
      }
      currentRel = rel
      val unified = StructType(prev.map(_.schema.fields).getOrElse(Array.empty) ++
        payloadSchema.fields.filterNot(f =>
          prev.exists(_.schema.fieldNames.contains(f.name))))
      try {
        lake.commitFiles(prev, ns, epochId, unified, bucketFiles,
          events, deletes, hw, math.max(maxLsn, lsnBase + epochId + 1))
        return
      } catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > 5) throw e
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(lake.path, stagingRel(epochId))
    if (Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(dir)) { s =>
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(p =>
            try Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () })
      }
    }
  }
}

final case class GraftSinkWriterFactory(
    factory: OutputWriterFactory, conf: SerializableHConf,
    stagingPrefix: String, fileSchema: StructType, streamSchema: StructType,
    numBuckets: Int, lsnBase: Long) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(this, partitionId, taskId, epochId)
}

final class GraftSinkWriter(f: GraftSinkWriterFactory,
                            partitionId: Int, taskId: Long, epochId: Long)
    extends GraftBucketFileWriter(f.factory, f.conf,
      f"${f.stagingPrefix}-e$epochId%d", f.fileSchema, f.numBuckets,
      partitionId, taskId)
    with DataWriter[InternalRow] {

  private val names = f.streamSchema.fieldNames
  private val opIdx = names.indexOf("op")
  private val lsnIdx = names.indexOf("lsn")
  private val ctsIdx = names.indexOf("commit_ts")
  private val payloadFields = f.fileSchema.fields.slice(1, f.fileSchema.fields.length - 1)
  private val fromRow: Array[Int] = payloadFields.map(p => names.indexOf(p.name))
  private val convIdx = names.indexOf("conv_id")
  private val epochLsn = f.lsnBase + epochId + 1

  override def write(row: InternalRow): Unit = {
    val op =
      if (opIdx < 0 || row.isNullAt(opIdx)) opU
      else row.getUTF8String(opIdx)
    val lsn =
      if (lsnIdx < 0 || row.isNullAt(lsnIdx)) epochLsn else row.getLong(lsnIdx)
    val hw =
      if (ctsIdx < 0 || row.isNullAt(ctsIdx)) 0L else row.getLong(ctsIdx)
    val out = new Array[Any](f.fileSchema.length)
    out(0) = op
    var i = 0
    while (i < payloadFields.length) {
      val from = fromRow(i)
      out(i + 1) =
        if (from < 0 || row.isNullAt(from)) null
        else row.get(from, payloadFields(i).dataType)
      i += 1
    }
    out(out.length - 1) = lsn
    emitValues(out, row.getUTF8String(convIdx), op == opD ||
      (op != null && op.toString == "D"), lsn, hw)
  }

  override def commit(): WriterCommitMessage = commitMessage()

  override def abort(): Unit = abortFiles()

  override def close(): Unit = ()
}
