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

  /** Label-sequence continuation validator (§2.10 / J6): the reference
    * checks that list labels continue an arithmetic sequence
    * (1,2,3… — ListProcessor.java:446-567, HeaderFooterProcessor.java:324-344
    * votes on repeating label patterns). Transcript analog: how long is the
    * gap-free prefix of turn indices starting at `first`?
    *
    * The buffer is an order-INDEPENDENT bounded bitset over
    * [first, first+cap): aggregation input order is nondeterministic under
    * partial aggregation, so sequence state must commute — the bitset does,
    * a "current run" counter would not. finish() = index of the first clear
    * bit. cap bounds state per group (the reference's 500-interval lookback
    * cap, ListProcessor.java:54-58).
    */
  final class SeqPrefixLen(first: Int, cap: Int = 1024)
      extends Aggregator[Int, Array[Long], Int] {
    private val words = (cap + 63) / 64
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(buf: Array[Long], v: Int): Array[Long] = {
      val i = v - first
      if (i >= 0 && i < cap) buf(i >> 6) |= 1L << (i & 63)
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Int = {
      var i = 0
      while (i < cap && (buf(i >> 6) >> (i & 63) & 1L) == 1L) i += 1
      i
    }
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Int] = ExpressionEncoder()
  }
}
