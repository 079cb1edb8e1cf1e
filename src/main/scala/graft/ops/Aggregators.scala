package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY §2.10: the reference's custom accumulators —
  * label-sequence detectors, mode/rarity statistics — as Spark typed UDAFs).
  * Buffers are bounded and order-independent, so partial aggregation
  * (map-side combine) stays correct and memory-safe at any group size.
  */
object Aggregators {

  /** Bounded top-k largest values — a per-group heap that merges
    * associatively. The reference's "500-interval lookback cap"
    * (ListProcessor.java:54-58) as an aggregation: state never exceeds k,
    * so a hot conversation with 10^7 events still carries a k-element buffer
    * through the shuffle.
    */
  final class TopKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], v: Long): Seq[Long] = bound(buf :+ v)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = bound(a ++ b)
    override def finish(r: Seq[Long]): Seq[Long] = r.sorted(Ordering[Long].reverse)
    private def bound(s: Seq[Long]): Seq[Long] =
      if (s.size <= k) s else s.sorted(Ordering[Long].reverse).take(k)
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }
}
