package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (UDAF surface, SURVEY.md §2.3): keeps
  * the k (score, id) pairs with the highest score — the partial-aggregation
  * building block for distributed similarity search: each partition keeps
  * only k candidates, the merge is k-way, so the shuffle carries O(k) per
  * group instead of the full candidate set.
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
  override def zero: List[Scored] = Nil

  private def trim(xs: List[Scored]): List[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  /** Invariant: every buffer this aggregator produces is sorted and ≤ k
    * long, so a full buffer rejects a non-qualifying row with one
    * comparison against its kth (last) element — the common case once a
    * partition warms up — instead of a per-row sort. */
  override def reduce(buf: List[Scored], a: Scored): List[Scored] =
    if (buf.lengthCompare(k) >= 0) {
      val kth = buf.last
      if (a.score < kth.score || (a.score == kth.score && a.id > kth.id)) buf
      else trim(a :: buf)
    } else trim(a :: buf)

  override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
    trim(b1 ++ b2)

  override def finish(reduction: List[Scored]): Seq[Scored] = trim(reduction)

  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
