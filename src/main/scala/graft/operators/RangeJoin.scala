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
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
