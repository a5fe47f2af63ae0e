package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.SriRow

/** Typed keep-latest merge for the Dataset API (SURVEY §2.10): max-by
  * (modified_ms, jsondata) — the A1 window dedup as an `Aggregator`, for
  * callers who hold a `Dataset[SriRow]` and want compile-time fields.
  *
  * Unlike the window form this is a true partial aggregate: map-side
  * combine reduces each partition to one candidate per key before the
  * shuffle — the better plan when duplicates per key are many.
  */
object LatestAggregator extends Aggregator[SriRow, Option[SriRow], SriRow] {

  override def zero: Option[SriRow] = None

  private def newer(a: SriRow, b: SriRow): SriRow = {
    // keep-latest with the same deterministic tiebreak as Dedup.keepLatest
    val c = java.lang.Long.compare(a.modified_ms, b.modified_ms)
    if (c > 0) a
    else if (c < 0) b
    else if (Ordering[Option[String]].lt(Option(a.jsondata), Option(b.jsondata))) a
    else b
  }

  override def reduce(buf: Option[SriRow], row: SriRow): Option[SriRow] =
    Some(buf.fold(row)(newer(_, row)))

  override def merge(a: Option[SriRow], b: Option[SriRow]): Option[SriRow] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(newer(x, y))
      case _ => a.orElse(b)
    }

  override def finish(r: Option[SriRow]): SriRow = r.get

  override def bufferEncoder: Encoder[Option[SriRow]] =
    Encoders.product[Option[SriRow]]
  override def outputEncoder: Encoder[SriRow] = Encoders.product[SriRow]
}
