package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-memory sketches for corpus-scale statistics.
  *
  * North-star extension: dataset cards and curation monitoring need
  * per-group cardinalities over columns whose exact distinct would be a
  * full shuffle of the column. A sketch caps the per-group state, keeps
  * the aggregation map-side combinable, and is deterministic here (hash
  * based, no RNG) so the DuckDB oracle can reproduce it bit-for-bit —
  * unlike HLL-based `approx_count_distinct`, whose registers differ
  * across engines.
  */
object Sketches {

  /** Approximate distinct count per group via k-minimum-values (KMV;
    * Beyer et al. SIGMOD'07). Values hash to uniforms in [0,1); the k-th
    * smallest distinct uniform U(k) estimates the cardinality as
    * (k-1)/U(k) (the unbiased form), exact when fewer than k distinct
    * values exist. Expected relative error is ~1/sqrt(k-2).
    *
    * Scale shape: one narrow shuffle of at-most-k-double synopses per
    * group (map-side partials pre-trim), the value payload never moves,
    * and synopses for different partitions/runs union losslessly — the
    * mergeability that lets per-shard sketches roll up to a corpus
    * total without re-reading shards.
    *
    * @return groupCols + (est_distinct rounded to 6, n_kept = min(k, d))
    */
  def approxDistinctKmv(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 64,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val kmv = udaf(graft.functions.KmvAggregator(k))
    val u = Sampling.hashUniform(col(valueCol), salt)
    df.select((groupCols.map(col) :+ u.as("__u")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__u")).as("__mins"))
      .withColumn("n_kept", size(col("__mins")))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("__mins"), k)), 6))
      .select((groupCols.map(col) :+ col("est_distinct") :+ col("n_kept")): _*)
  }
}
