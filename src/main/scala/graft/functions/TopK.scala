package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator for (score, id) pairs, ordered by
  * (score desc, id asc).
  *
  * Replaces a `row_number` window over all scored rows: a window must
  * shuffle and sort the full N×Q scored set, while this aggregator keeps at
  * most O(k) state per group and participates in map-side partial
  * aggregation — only per-mapper top-k lists cross the shuffle. That is the
  * shape that survives a 100× corpus scale-up.
  *
  * The buffer grows to at most 4k entries before it is compacted, so
  * per-row maintenance is amortized O(1) appends with an O(k·log k) sort
  * every 3k rows.
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  // k <= 0 would silently trim every buffer to empty and the
  // aggregate would drop all rows with no error
  require(k >= 1, "k must be at least 1")


  private def ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] = {
    val appended = buf :+ row
    if (appended.size.toLong > 4L * k) trim(appended) else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
