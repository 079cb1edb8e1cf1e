package graft.stream

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-batch lineage metrics via the streaming progress bus (SURVEY §2.4 A9:
  * the reference's `ProcessingResult` timings/counters as a listener).
  * Collects input rates, batch durations, and observed metrics attached to
  * the STREAMING plan (e.g. the `wal` observation in CdcIngestJob.start).
  * NOTE: metrics observed inside foreachBatch never reach this bus — late
  * drops travel through [[CdcIngestJob.IngestMetrics]] instead.
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(
      batchId: Long, numInputRows: Long, durationMs: Long,
      observed: Map[String, Map[String, Any]])

  private val buf = mutable.ArrayBuffer.empty[BatchMetrics]

  def batches: Seq[BatchMetrics] = buf.synchronized(buf.toVector)
  def totalInputRows: Long = batches.map(_.numInputRows).sum

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    import scala.jdk.CollectionConverters._
    val observed = p.observedMetrics.asScala.map { case (name, row) =>
      name -> row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.get(i) }.toMap
    }.toMap
    buf.synchronized {
      buf += BatchMetrics(p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        observed)
    }
  }
}
