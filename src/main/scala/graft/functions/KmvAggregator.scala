package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values accumulator: keeps the k smallest DISTINCT
  * uniform-hash values seen.
  *
  * The state behind the KMV distinct-count estimator (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD'07): per group at most k doubles cross the shuffle regardless of
  * group size, and partial states merge by set-union + re-trim — so
  * map-side partial aggregation applies, the property that makes a
  * distinct-count over 100 TB cost one narrow shuffle of k·8-byte
  * synopses instead of a full distinct of the value column.
  *
  * Same amortization as [[TopKAggregator]]: the buffer grows to 4k entries
  * between O(k·log k) compactions, so per-row maintenance is O(1) appends.
  */
case class KmvAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  // k <= 0 would silently trim every buffer to empty and the
  // aggregate would drop all rows with no error
  require(k >= 1, "k must be at least 1")


  private def trim(buf: Seq[Double]): Seq[Double] =
    buf.distinct.sorted.take(k)

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], u: Double): Seq[Double] = {
    val appended = buf :+ u
    if (appended.size.toLong > 4L * k) trim(appended) else appended
  }

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = trim(a ++ b)

  override def finish(buf: Seq[Double]): Seq[Double] = trim(buf)

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
