package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * North-star extension. Two paths:
  *
  *  - [[bruteForceTopK]] — exact cosine top-k of a (small, broadcast) query
  *    set against the corpus: one pass over the corpus, no corpus shuffle
  *    except the final per-query top-k, which is rank-limited. The
  *    baseline every approximate method is judged against.
  *
  *  - [[lshTopK]] — sign-random-projection LSH: corpus and queries are
  *    bucketed by the sign pattern of `planes` deterministic pseudo-random
  *    hyperplanes; only same-bucket pairs are scored. At 100 TB the bucket
  *    join replaces the all-pairs product; recall is tuned by
  *    (planes, bucket count) like any SRP index.
  *
  * Dot products / norms are ordered left-to-right folds (`zip_with` +
  * `aggregate`), which keeps results bit-reproducible for a given array
  * order — the property the DuckDB oracle comparison relies on. The
  * hyperplanes are derived from md5, so bucketing is reproducible too.
  */
object Similarity {

  /** Ordered-fold dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Ordered-fold L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact top-k nearest corpus vectors (cosine) for every query vector.
    *
    * The query side is expected to be small and is broadcast; the corpus
    * streams through codegen'd cosine evaluation once. Ranking ties break
    * on corpus id so output is deterministic.
    *
    * @return (query_id, corpus_id, cos, rank) with rank in 1..k
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("qv"))
    val c = corpus.select(col(corpusIdCol).as("corpus_id"), col(corpusVecCol).as("cv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * parity of the first hex digit of md5("p#d"). */
  private def planeComponent(p: Column, d: Column): Column = {
    val digit = conv(md5(concat(p.cast("string"), lit("#"), d.cast("string"))).substr(1, 1), 16, 10)
    (pmod(digit.cast("int"), lit(2)) * 2 - 1).cast("double")
  }

  /** Sign-random-projection bucket key: one bit per hyperplane —
    * sign of <v, plane_p> — concatenated to a string key. */
  def srpBucket(vec: Column, planes: Int): Column =
    concat_ws("", transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") * planeComponent(p, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }))

  /** Approximate top-k via SRP-LSH bucketing: candidates are corpus vectors
    * in the query's bucket; exact cosine ranks within the bucket. Vectors
    * in other buckets are never touched — that's the scale path. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      k: Int,
      planes: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("qv"),
      srpBucket(col(queryVecCol), planes).as("bucket"))
    val c = corpus.select(col(corpusIdCol).as("corpus_id"), col(corpusVecCol).as("cv"),
      srpBucket(col(corpusVecCol), planes).as("bucket"))
    val self = if (excludeSelf) col("query_id") =!= col("corpus_id") else lit(true)
    val scored = c.join(broadcast(q), Seq("bucket")).filter(self)
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucketed so only same-bucket
    * pairs are scored, then thresholded. Returns (id_a, id_b, cos) with
    * id_a < id_b, cos >= minCos. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCos: Double = 0.95,
      planes: Int = 4): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      srpBucket(col(vecCol), planes).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= minCos)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }
}
