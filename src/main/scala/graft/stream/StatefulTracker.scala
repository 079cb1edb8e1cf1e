package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.9 — cross-batch conversation state via `flatMapGroupsWithState`: the
  * per-conversation running counters survive micro-batch boundaries in the
  * streaming state store (and restarts via the checkpoint), which no
  * stateless foreachBatch pipeline can do. This is the streaming twin of the
  * reference's per-document accumulators that live across page batches
  * (processors/DocumentProcessor.java keeps document-scoped state while
  * pages stream through).
  *
  * State per conv_id is O(1) (counters + high-water lsn), so 10^8 live
  * conversations cost the state store ~GBs, partitioned across executors by
  * the groupByKey shuffle.
  */
object StatefulTracker {

  final case class ConvState(nEvents: Long, nDeletes: Long, maxLsn: Long)

  final case class ConvUpdate(
      conv_id: String, n_events: Long, n_deletes: Long, max_lsn: Long,
      batch_events: Long)

  /** events must carry (conv_id, op, lsn). Emits one update row per
    * conversation per micro-batch it appears in, with RUNNING totals.
    */
  def track(events: DataFrame): Dataset[ConvUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("conv_id"), col("op"), col("lsn"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (conv: String, it: Iterator[(String, String, Long)],
         state: GroupState[ConvState]) =>
          val prev = state.getOption.getOrElse(ConvState(0L, 0L, -1L))
          var n = 0L; var d = 0L; var mx = prev.maxLsn
          it.foreach { case (_, op, lsn) =>
            n += 1
            if (op == "D") d += 1
            if (lsn > mx) mx = lsn
          }
          val next = ConvState(prev.nEvents + n, prev.nDeletes + d, mx)
          state.update(next)
          Iterator.single(ConvUpdate(conv, next.nEvents, next.nDeletes, next.maxLsn, n))
      }
  }
}
