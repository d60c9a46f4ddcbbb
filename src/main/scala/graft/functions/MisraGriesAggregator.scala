package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequent-items summary (Misra & Gries, Sci. Comput. Program.
  * 1982, in the mergeable form of Agarwal et al., "Mergeable Summaries",
  * PODS'12).
  *
  * State is a map of at most `capacity` (item, count) entries. A
  * compaction at size s > capacity subtracts the (capacity+1)-th largest
  * count m from every entry and drops the non-positive ones; each such
  * event removes at least m·(capacity+1) total mass, so across the whole
  * aggregation any single item loses at most n/(capacity+1) of its true
  * count — the classic guarantee that every item with true frequency
  * above n/(capacity+1) is still present in the final summary
  * (estimates are UNDER-counts; the summary is a candidate superset, not
  * an exact counter — pair it with an exact recount of the candidates,
  * as [[graft.operators.Sketches.heavyHitters]] does).
  *
  * Merging two summaries is entry-wise count addition followed by the
  * same compaction, which preserves the additive error bound
  * (Agarwal et al. §3.2) — so map-side partial aggregation applies and
  * per-shard summaries roll up to a corpus summary without re-reading
  * anything.
  *
  * Same amortization as [[KmvAggregator]]: the map is allowed to grow to
  * 4×capacity between compactions, so per-row maintenance is O(1) map
  * updates with O(c·log c) compactions every ≥ 3c rows.
  */
case class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, "capacity must be at least 1")

  /** Shrink to at most `capacity` entries by subtracting the
    * (capacity+1)-th largest count from every entry. No-op when already
    * small enough. */
  private def compact(buf: Map[String, Long]): Map[String, Long] =
    if (buf.size <= capacity) buf
    else {
      // (capacity+1)-th largest count: every surviving entry had count > m
      val vals = buf.valuesIterator.toArray
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - capacity - 1)
      buf.collect { case (k, c) if c > m => k -> (c - m) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    val grown = buf.updated(item, buf.getOrElse(item, 0L) + 1L)
    if (grown.size.toLong > 4L * capacity) compact(grown) else grown
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    compact(small.foldLeft(large) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    })
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = compact(buf)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
