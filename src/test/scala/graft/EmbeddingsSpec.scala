package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .withColumn("grp", pmod(col("vec_id"), lit(8)))

  test("aggregator mean pooling matches the exact decimal form within 1e-9") {
    val exact = Embeddings.meanPoolExact(emb, "grp", "embedding")
    val fast = Embeddings.meanPool(emb, "grp", "embedding", dims = 64)
      .select(col("grp"), posexplode(col("centroid")).as(Seq("i", "m")))
    val joined = exact.join(fast, Seq("grp", "i"))
    assert(joined.count() === 8L * 64L)
    // the exact form rounds to 6 places, so agreement is bounded by 5e-7
    val maxErr = joined.agg(max(abs(col("mean") - col("m")))).as[Double].head()
    assert(maxErr < 5.1e-7, s"maxErr=$maxErr")
  }

  test("mean pooling is stable under repartitioning (exact form bit-equal)") {
    val a = Embeddings.meanPoolExact(emb, "grp", "embedding")
    val b = Embeddings.meanPoolExact(emb.repartition(17), "grp", "embedding")
    assert(a.exceptAll(b).count() === 0)
  }

  test("null vectors are skipped; all-null group pools to null") {
    val withNulls = Seq(
      (1L, Array(1.0f, 3.0f)), (1L, Array(3.0f, 5.0f))
    ).toDF("grp", "embedding")
      .unionByName(Seq((1L, Option.empty[Array[Float]]), (2L, Option.empty[Array[Float]]))
        .toDF("grp", "embedding"))
    val got = Embeddings.meanPool(withNulls, "grp", "embedding", dims = 2)
      .orderBy("grp").collect()
    assert(got(0).getSeq[Double](1) === Seq(2.0, 4.0))
    assert(got(0).getLong(2) === 2L)
    assert(got(1).isNullAt(1) && got(1).getLong(2) === 0L)
  }

  test("driftStats: identical slices report cos 1 / L2 0; a planted shift moves both") {
    val a = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)), (2L, Array(3.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val self = Embeddings.driftStats(a, a).head()
    assert(self.getDouble(0) === 1.0) // cos_means
    assert(self.getDouble(1) === 0.0) // l2_means
    assert(self.getDouble(2) === self.getDouble(3)) // norms equal

    // shift every vector by +10 on dim 1: mean moves, cosine drops
    val b = a.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        (v, i) => org.apache.spark.sql.functions.when(i === 1, v + 10.0f).otherwise(v))
        .as("embedding"))
    val drift = Embeddings.driftStats(a, b).head()
    assert(drift.getDouble(0) < 1.0)
    assert(drift.getDouble(1) > 9.0) // mean moved ~10 on one dim
    assert(drift.getDouble(3) > drift.getDouble(2))
  }

  test("driftStats: empty slice returns null stats; real width mismatch still dies") {
    val a = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)), (2L, Array(3.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // zero-row slice: not a dimensionality disagreement — the comparative
    // stats are null (nothing to drift against) while the NON-empty
    // slice's own norm still reports
    val r = Embeddings.driftStats(a, a.limit(0)).head()
    Seq(0, 1, 3).foreach(i => assert(r.isNullAt(i), s"col $i should be null"))
    assert(r.getDouble(2) > 0) // norm_a: slice a exists
    // all-null-vector slice behaves the same
    val nulls = Seq((9L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val r2 = Embeddings.driftStats(a, nulls).head()
    Seq(0, 1, 3).foreach(i => assert(r2.isNullAt(i), s"col $i should be null"))
    assert(r2.getDouble(2) > 0)
    // two NON-empty slices of different width must still fail loudly
    val wide = Seq((1L, Array(1.0f, 0.0f, 2.0f, 5.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Embeddings.driftStats(a, wide).head())
    assert(e.getMessage.contains("dimensionality")
      || Option(e.getCause).exists(_.getMessage.contains("dimensionality")))
  }
}
