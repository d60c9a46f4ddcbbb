package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline: the end-to-end path a training
  * corpus takes through this library, as one operator —
  *
  *   quality filter → exact dedup → benchmark decontamination → split
  *
  * Each stage is the already-verified operator ([[TextAnalysis
  * .gopherishFlags]], [[Dedup]]'s digest keep-first, [[Decontamination
  * .decontaminate]], [[Sampling.assignSplit]]); this wrapper exists
  * because composition itself is what production runs, so composition
  * itself is what gets oracle-checked (`x_curate` mirrors all four stages
  * in one SQL statement).
  *
  * Scale shape is the sum of its parts — quality is a per-row projection
  * fused into the scan, dedup shuffles (digest, id) pairs, decontamination
  * is a broadcast map-side join, the split is a per-row hash — so the
  * pipeline reads the corpus once and shuffles only narrow columns.
  */
object Curation {

  /** Run the full curation pipeline; returns surviving (idCol, split).
    *
    * @param docs      training corpus (idCol, textCol)
    * @param bench     benchmark/eval set to decontaminate against (broadcast)
    * @param splits    (name, weight) split spec, weights summing to <= 1
    * @param languages when set, keep only docs whose [[TextAnalysis.langId]]
    *                  is in the set (the C4/Gopher language gate); another
    *                  per-row predicate fused into the same corpus scan
    * @param nearDup   when set to (simhashBits, maxHamming), add a
    *                  near-duplicate stage after exact dedup: SimHash
    *                  Hamming pairs → transitive clusters
    *                  ([[Dedup.duplicateClusters]]) → keep each cluster's
    *                  minimum id ([[Dedup.keepCanonical]]). Clustering is
    *                  diameter-free (large-star/small-star fallback), so
    *                  long near-duplicate chains cannot abort the run;
    *                  `ccMaxIters` is the total-round bug guard passed
    *                  through to [[Dedup.keepCanonical]]
    */
  def curate(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      shingleN: Int = 3,
      minHits: Long = 1L,
      languages: Option[Set[String]] = None,
      nearDup: Option[(Int, Int)] = None,
      ccMaxIters: Int = 25): DataFrame = {
    // keepText = one corpus scan: quality metrics, the keep filter and the
    // downstream stages all read the same projection — no semi-join back
    val quality = TextAnalysis.gopherishFlags(docs, idCol, textCol, keepText = true)
      .filter(col("keep"))
      .select(col(idCol), col(textCol))
    val kept = languages.fold(quality) { ls =>
      quality.filter(TextAnalysis.langId(col(textCol))
        .isInCollection(ls.toSeq.sorted))
    }
    val hashed = kept.withColumn("__content_hash",
      graft.functions.HashColumns.hashExpr(Seq(col(textCol))))
    val w = Window.partitionBy("__content_hash").orderBy(col(idCol))
    val deduped = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__content_hash")
    val nearDeduped = nearDup.fold(deduped) { case (bits, maxHam) =>
      Dedup.keepCanonical(deduped, idCol,
        Dedup.simhashNearDuplicates(deduped, idCol, textCol, bits, maxHam),
        maxIters = ccMaxIters)
    }
    val clean = Decontamination.decontaminate(
      nearDeduped, bench, idCol, textCol, shingleN, minHits)
    Sampling.assignSplit(clean.select(col(idCol)), idCol, splits)
  }
}
