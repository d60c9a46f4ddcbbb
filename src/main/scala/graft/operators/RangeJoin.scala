package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-predicate) joins without a cartesian product.
  *
  * Spark's optimizer plans a non-equi `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoopJoin — O(points × intervals) comparisons, the shape
  * that dies first at scale. Bucketing restores an equi-join: intervals
  * explode into the fixed-width buckets they overlap, points map to their
  * single bucket, the join runs hash-partitioned on the bucket id, and the
  * exact range predicate filters the candidates. Work becomes
  * O(points + intervals × spannedBuckets + trueMatches) and shuffles
  * hash-distribute — the standard distributed interval-join build.
  *
  * Choose `bucketWidth` near the typical interval width: each interval
  * then spans ~2 buckets, and a point meets only intervals whose bucket it
  * shares. Too small → interval replication grows; too large → more
  * false candidates reach the exact filter. Both are knobs, not
  * correctness risks.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [lo, hi] contains it
    * (inclusive on both ends).
    *
    * `pointCol` / `loCol` / `hiCol` must be numeric and below 2^52 in
    * magnitude (bucket assignment divides as double before flooring —
    * exact in that range; for timestamps or dates, derive an epoch-day or
    * epoch-second column first). Column names must be disjoint between
    * the two frames.
    *
    * @return point columns ++ interval columns, one row per containment
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // one OUTLIER interval (an open-ended sentinel hi, a mis-chosen
    // width) would materialize millions-to-quadrillions of bucket
    // elements and kill the stage — fail with the actual row's span and
    // a remedy instead of an array-allocation error deep in a task
    val maxBuckets = 4 * 1024 * 1024L
    val lo = floor(col(loCol) / bucketWidth).cast("long")
    val hi = floor(col(hiCol) / bucketWidth).cast("long")
    // a NULL bound can never satisfy the inclusive containment predicate,
    // so such intervals are dropped up front — the same no-match result
    // the exact filter would produce, without tripping the outlier guard
    // below (hi - lo is NULL for them, which would otherwise fall into
    // the raise_error branch with a misleading span message)
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull)
      .withColumn("__bucket",
      explode(sequence(lo,
        when(hi - lo < maxBuckets, hi).otherwise(raise_error(concat(
          lit(s"pointInInterval: interval spans more than $maxBuckets buckets "
            + s"at bucketWidth=$bucketWidth ("), col(loCol), lit(".."),
          col(hiCol), lit(") — widen bucketWidth or clamp sentinel bounds")))))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
