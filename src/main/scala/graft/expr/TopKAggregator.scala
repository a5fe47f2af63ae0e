package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k as a TRUE partial aggregate: each input row costs
  * a bounded insert into a k-element buffer, map-side combine ships at most
  * k `(value, id)` pairs per (partition, group) into the shuffle, and
  * merge is a k+k trim. The window-function alternative
  * (`row_number() ... <= k`) shuffles EVERY row to its group's partition
  * and sorts the whole group — at 100 TB that is the difference between a
  * shuffle of k·groups rows and a shuffle of the full table.
  *
  * Ordering: value DESC, id ASC (deterministic tiebreak — callers pass a
  * unique id). `finish` emits the buffer best-first, so zipping with index
  * yields the rank.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k=$k must be >= 1")

  // best-first ordering: larger value first, then smaller id
  private def ord: Ordering[(Long, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def zero: Seq[(Long, Long)] = Nil

  override def reduce(buf: Seq[(Long, Long)],
      row: (Long, Long)): Seq[(Long, Long)] =
    // buf stays sorted best-first and ≤ k long; skip the insert when the
    // row can't make the cut (the common case once the buffer is warm)
    if (buf.size >= k && ord.compare(row, buf.last) >= 0) buf
    else ((buf :+ row).sorted(ord)).take(k)

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
