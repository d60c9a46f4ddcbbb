package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding pooling: per-group element-wise centroids of an
  * `array<float>` column — the standard reduction for building
  * user/document/cluster representations out of item embeddings.
  *
  * Two forms:
  *
  *  - [[meanPool]] — typed [[Aggregator]] summing into a dims-wide double
  *    buffer: map-side partial aggregation, ONE shuffle of a dims-length
  *    vector per (partition, group) — the 100 TB path. Float addition is
  *    re-associated by partial aggregation, so results are deterministic
  *    only to ~1e-15 relative; fine for ML, not for hash comparison.
  *  - [[meanPoolExact]] — posexplode + DECIMAL sums per (group, dim):
  *    order-independent bit-exact results (the oracle-checkable form).
  *    Shuffles dims× more rows; the executable specification.
  */
object Embeddings {

  /** Bit-exact mean pooling in long format: (grp, i, mean) per group and
    * 0-based dimension. Decimal sums are order-independent; mean is a
    * single double division rounded to 6. */
  def meanPoolExact(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy("grp", "i")
      .agg(
        // count(v), not count(*): a null ELEMENT must drop out of both the
        // sum and the denominator (mirrors the oracle's count(v))
        round((sum(col("v").cast("double").cast("decimal(28,12)")).cast("double") /
          count(col("v"))), 6).as("mean"))

  /** Bounded-state mean-vector aggregator: O(dims) per group regardless of
    * group size, map-side combine before the shuffle. Buffer is a plain
    * (sums, count) tuple — the sums array is mutated in place, only the
    * tiny tuple shell reallocates per row. */
  private final class MeanVecAgg(dims: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)
    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      if (v == null) b
      else {
        require(v.length == dims, s"expected $dims-dim vector, got ${v.length}")
        var i = 0
        while (i < dims) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
    }
    override def merge(
        a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(b: (Array[Double], Long)): Array[Double] = {
      if (b._2 == 0L) return null
      val out = new Array[Double](dims)
      var i = 0
      while (i < dims) { out(i) = b._1(i) / b._2; i += 1 }
      out
    }
    override def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Scale-path mean pooling: (grp, centroid array<double>, n_members).
    * Null vectors are skipped; a group of only nulls pools to null. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String, dims: Int): DataFrame = {
    val agg = udaf(new MeanVecAgg(dims))
    // a vector CONTAINING a null element cannot reach the aggregator (its
    // primitive Array[Float] input encoder dies on the element) — treat
    // the whole vector as null, which the aggregator already skips. The
    // exact form instead averages around the hole per dimension; for the
    // corrupt-input rows this guards, dropping the vector is the honest
    // reading (and the job survives, which is the point).
    val clean = when(exists(col(vecCol), x => x.isNull), lit(null))
      .otherwise(col(vecCol))
    df.groupBy(col(groupCol).as("grp"))
      .agg(
        agg(clean).as("centroid"),
        count(clean).as("n_members"))
  }

  /** Embedding DRIFT between two corpus slices (ingest batches, time
    * windows, sources): cosine similarity and L2 distance between the
    * slices' mean vectors — the cheapest useful dataset-shift monitor
    * for an embedding column (a mean that moves means the distribution
    * moved; the converse needs finer monitors, which is why the report
    * also carries both norms).
    *
    * Scale shape: two [[meanPoolExact]] passes (each one map-side-
    * combined aggregation, dims-bounded state), then arithmetic on
    * 2×dims rows — nothing downstream of the two scans depends on slice
    * size. Determinism: means are exact decimal sums rounded to 6 (the
    * pooling contract), products of those rounded doubles are IEEE-
    * identical across engines, and the cross-dimension reductions go
    * through decimal again — so the DuckDB oracle reproduces every
    * digit.
    *
    * @return one row: (cos_means, l2_means, norm_a, norm_b), all
    *         rounded to 6. An EMPTY slice (zero rows / all-null vectors)
    *         yields null comparative stats and a null norm on that side —
    *         there is no mean to drift against; only two NON-empty slices
    *         of different dimensionality raise.
    */
  def driftStats(a: DataFrame, b: DataFrame, vecCol: String = "embedding"): DataFrame = {
    def means(df: DataFrame, out: String) =
      meanPoolExact(df.select(lit(0).as("grp"), col(vecCol)), "grp", vecCol)
        .select(col("i"), col("mean").as(out))
    val dec = "decimal(28,12)"
    // FULL outer + in-plan raise: an inner join would silently truncate a
    // dimensionality mismatch (a broken re-embed, exactly what a drift
    // monitor exists to catch) to the common prefix and report a
    // plausible-looking drift over it. The check compares per-side
    // NON-NULL dimension counts after the aggregate, not per-row null
    // partners: an EMPTY slice (zero rows, or all-null vectors) is not a
    // dimensionality disagreement — it has no dimensions at all — and
    // returns all-null stats (there is no mean to drift against), while
    // two non-empty slices of different width still die loudly.
    means(a, "ma").join(means(b, "mb"), Seq("i"), "full_outer")
      .agg(
        sum((col("ma") * col("mb")).cast(dec)).as("sab"),
        sum((col("ma") * col("ma")).cast(dec)).as("saa"),
        sum((col("mb") * col("mb")).cast(dec)).as("sbb"),
        sum(((col("ma") - col("mb")) * (col("ma") - col("mb"))).cast(dec)).as("sd"),
        count(col("ma")).as("__na"),
        count(col("mb")).as("__nb"))
      .withColumn("__dim_chk",
        when(col("__na") =!= col("__nb") && col("__na") > 0 && col("__nb") > 0,
          raise_error(concat(
            lit("driftStats: slices disagree on embedding dimensionality ("),
            col("__na"), lit(" vs "), col("__nb"), lit(" dimensions)"))))
          .otherwise(lit(0)))
      .select(
        round(col("sab").cast("double") /
          sqrt(col("saa").cast("double") * col("sbb").cast("double")), 6).as("cos_means"),
        // + __dim_chk (always 0 when the check passes) keeps the check
        // aggregate REFERENCED — column pruning would drop an unused one
        round(sqrt(col("sd").cast("double") + col("__dim_chk")), 6).as("l2_means"),
        round(sqrt(col("saa").cast("double")), 6).as("norm_a"),
        round(sqrt(col("sbb").cast("double")), 6).as("norm_b"))
  }
}
