package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k sample accumulator: keeps the k smallest DISTINCT
  * (hash, value) PAIRS seen, and finishes with the retained values
  * sorted ascending. PAIR-distinct, not hash-distinct, is the pinned
  * semantics (the quantile merge law's SQL twin dedups pairs): with a
  * unique id column the two coincide; duplicate ids carrying different
  * values each occupy a sample slot — pass a unique id for the strict
  * uniform-sample reading.
  *
  * The state behind bottom-k quantile estimation (the sampling scheme of
  * Cohen & Kaplan, "Summarizing Data using Bottom-k Sketches", PODC'07):
  * hashing each row's id to a uniform and keeping the k hash-smallest
  * rows IS a uniform k-row sample of the group — but deterministic,
  * engine-reproducible, and mergeable: the bottom-k of a union is the
  * trimmed union of per-shard bottom-k sets, so map-side partial
  * aggregation applies and per-shard sketches roll up without re-reading
  * shards. At most k (double, double) pairs per group cross the shuffle
  * regardless of group size.
  *
  * Same amortization as [[KmvAggregator]]: the buffer grows to 4k entries
  * between O(k·log k) compactions, so per-row maintenance is O(1) appends.
  */
case class BottomKSampleAggregator(k: Int)
    extends Aggregator[(Double, Double), Seq[(Double, Double)], Seq[Double]] {
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

  override def finish(buf: Seq[(Double, Double)]): Seq[Double] =
    trim(buf).map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** [[BottomKSampleAggregator]] finishing with the retained (hash, value)
  * PAIRS — the persistable synopsis form behind
  * [[graft.operators.Sketches.quantileSynopsis]]: keeping the hashes is
  * what makes the sample MERGEABLE after the fact (the bottom-k of a
  * union is decided by the hashes; a values-only sample cannot re-enter
  * an election). Pairs come back sorted by (hash, value) — the trim
  * order — so the output is deterministic under any partial-merge order.
  *
  * A pair with NaN in either slot is SKIPPED at reduce: the callers fold
  * "row has no sampleable value" (null id / null value) into NaN so the
  * synopsis can ride inside a single multi-aggregate pass over data that
  * other aggregates in the same pass DO count (a Spark UDAF cannot
  * filter its own input rows). hashUniform never emits NaN, so no real
  * key is lost.
  */
case class BottomKPairSampleAggregator(k: Int)
    extends Aggregator[(Double, Double), Seq[(Double, Double)], Seq[(Double, Double)]] {
  require(k >= 1, "k must be at least 1")

  private def trim(buf: Seq[(Double, Double)]): Seq[(Double, Double)] =
    buf.distinct.sorted.take(k)

  override def zero: Seq[(Double, Double)] = Vector.empty

  override def reduce(buf: Seq[(Double, Double)], uv: (Double, Double)): Seq[(Double, Double)] = {
    if (uv._1.isNaN || uv._2.isNaN) buf
    else {
      val appended = buf :+ uv
      if (appended.size.toLong > 4L * k) trim(appended) else appended
    }
  }

  override def merge(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Seq[(Double, Double)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Double)]): Seq[(Double, Double)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Double)]] = ExpressionEncoder()
}
