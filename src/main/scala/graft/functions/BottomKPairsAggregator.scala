package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[BottomKSampleAggregator]]'s persistable sibling: identical bottom-k
  * (hash, value) retention (Cohen & Kaplan PODC'07 sampling scheme), but
  * FINISHES with the retained pairs instead of the bare values — the
  * form a maintained aggregate state stores. Keeping the hash coordinate
  * is what makes the persisted sample re-mergeable: a later batch's
  * synopsis unions in and re-trims on the SAME ordering the original
  * trim used, so merged-then-finalized equals the single pass over the
  * concatenated batches (the law the maintained-quantile oracle checks).
  * Dropping the hashes (as the query-time form does) would freeze the
  * sample — nothing could ever displace a retained row.
  *
  * Encodes as `array<struct<_1: double, _2: double>>` (_1 = hash
  * uniform, _2 = value) — plain parquet, ≤ k entries per group. */
case class BottomKPairsAggregator(k: Int)
    extends Aggregator[(Double, Double), Seq[(Double, Double)], Seq[(Double, Double)]] {
  // k <= 0 would silently trim every buffer to empty and the
  // aggregate would drop all rows with no error
  require(k >= 1, "k must be at least 1")


  private def trim(buf: Seq[(Double, Double)]): Seq[(Double, Double)] =
    buf.distinct.sorted.take(k)

  override def zero: Seq[(Double, Double)] = Vector.empty

  override def reduce(buf: Seq[(Double, Double)], uv: (Double, Double)): Seq[(Double, Double)] = {
    val appended = buf :+ uv
    if (appended.size.toLong > 4L * k) trim(appended) else appended
  }

  override def merge(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Seq[(Double, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Double)]): Seq[(Double, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
}
