package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED model-based quality classification — the learned tier above
  * [[TextAnalysis.qualityScore]]'s fixed-weight sigmoid: a logistic-shaped
  * linear classifier over the Gopher metric surface, trained by batch
  * gradient descent against caller-supplied labels. The public recipe
  * (fastText / CCNet / DCLM-style quality classifiers: a linear model over
  * cheap per-document features, trained to separate a reference corpus
  * from crawl text) reduced to deterministic relational algebra — training
  * is K aggregation passes over a cached narrow feature frame, each
  * collecting ONE model-sized row; classification is a per-row projection.
  *
  * Determinism contract (the [[LangModel]] discipline): features are the
  * 6-decimal-rounded [[TextAnalysis.gopherishFlags]] metrics, min-max
  * scaled and re-rounded to 6; the activation is the ELLIOTT fast sigmoid
  * `0.5 + z / (2·(1+|z|))` — rational arithmetic only (+, ×, ÷, |·|), every
  * step a correctly-rounded IEEE operation, where `exp` could diverge
  * engine to engine ULP by ULP and COMPOUND across iterations; per-row
  * activations round to 6; gradients sum as `decimal(28,6)` (order-
  * independent); each weight update re-rounds to 6. Every iteration is
  * therefore bit-replayable as a chained SQL CTE — the whole weight TRACE
  * is oracle-checkable, not just the final model.
  *
  * The gradient is the delta rule `(p − y)·x` (Widrow–Hoff form with a
  * sigmoid-shaped output — the logistic-regression gradient with the
  * Elliott activation substituted; Elliott 1993 is the published
  * activation). Min-max scaling (exact min/max — order-independent, no
  * variance/sqrt) keeps features in [0,1] so one global learning rate
  * behaves.
  *
  * Scale shape: ONE corpus scan builds the feature frame (the same
  * single-tokenization pass as the flags path) which is cached narrow
  * (id, 5 doubles, label); each GD iteration is one map-side-combined
  * aggregate producing ONE row (7 decimal sums + a count) — K iterations =
  * K bounded-collect jobs over the cached frame, the
  * [[TextAnalysis.bpeTrainMerges]] precedent. Weights broadcast as plan
  * literals; classification fuses into the corpus scan. Nothing driver-
  * side ever holds more than the model.
  */
object QualityModel {

  /** Feature surface: the [[TextAnalysis.gopherishFlags]] metric columns,
    * in the fixed order the dot product folds them. */
  val Features: Seq[String] = Seq(
    "n_tokens", "mean_token_len", "alpha_ratio",
    "top_bigram_ratio", "top_trigram_ratio")

  /** Bias row name in the trained-weight trace. */
  val BiasFeature: String = "__bias__"

  /** A trained classifier: per-feature (min, max) scaling stats captured
    * at train time (classification must scale with the TRAINING corpus's
    * stats — the standard served-model contract) and the full weight
    * trace; `trace(i)` = (bias, weights) after iteration i, `trace(0)` is
    * the all-zero init. */
  final case class TrainedQuality(
      featureStats: Seq[(String, Double, Double)],
      trace: Vector[(Double, Vector[Double])]) {
    def bias: Double = trace.last._1
    def weights: Vector[Double] = trace.last._2
  }

  /** Driver-side 6-decimal HALF_UP round — the same rounding
    * `round(col, 6)` applies inside plans, so driver-updated weights and
    * plan-computed values live on one grid. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Elliott fast sigmoid `0.5 + z/(2·(1+|z|))` — the rational-arithmetic
    * activation (no `exp`, see the determinism contract). Monotone,
    * (−∞,∞)→(0,1), 0 ↦ 0.5. */
  def elliott(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Fixed-order dot product `((bias + w₀·f₀) + w₁·f₁) + …` — the exact
    * association the oracle mirrors (multiplication commutes bit-exactly;
    * addition order is pinned by the fold). */
  private def dot(bias: Double, weights: Seq[Double], cols: Seq[Column]): Column =
    weights.zip(cols).foldLeft(lit(bias)) { case (acc, (w, c)) => acc + c * lit(w) }

  /** (idCol, __f0.., __y) raw labeled metrics: one tokenization pass,
    * label joined back by id (labels live on metadata columns the metric
    * projection drops), null-metric rows (null text) excluded — a row
    * with no measurable features can't carry gradient. */
  private def labeledMetrics(
      df: DataFrame, idCol: String, textCol: String, label: Column): DataFrame = {
    val metrics = TextAnalysis.gopherishFlags(df, idCol, textCol)
      .filter(col("n_tokens").isNotNull)
      .select(col(idCol) +:
        Features.zipWithIndex.map { case (f, j) =>
          col(f).cast("double").as(s"__f$j") }: _*)
    metrics.join(df.select(col(idCol), label.cast("double").as("__y")), Seq(idCol))
  }

  /** Exact per-feature (min, max) over a labeled-metric frame — one
    * aggregate, one collected row (model-sized). */
  private def collectStats(labeled: DataFrame): Seq[(String, Double, Double)] = {
    val aggs = Features.indices.flatMap(j =>
      Seq(min(col(s"__f$j")).as(s"mn$j"), max(col(s"__f$j")).as(s"mx$j")))
    val row = labeled.agg(aggs.head, aggs.tail: _*).collect().head
    require(!row.isNullAt(0),
      "quality-classifier training needs at least one labeled row with measurable features")
    Features.zipWithIndex.map { case (f, j) =>
      (f, row.getAs[Double](s"mn$j"), row.getAs[Double](s"mx$j")) }
  }

  /** Min-max scale to [0,1], re-rounded to 6; a constant feature
    * (max = min) scales to 0.0 — plan-time constant, no 0/0. */
  private def scaledCol(c: Column, mn: Double, mx: Double): Column =
    if (mx == mn) lit(0.0) else round((c - lit(mn)) / lit(mx - mn), 6)

  private def scaledFrame(
      labeled: DataFrame, idCol: String,
      stats: Seq[(String, Double, Double)]): DataFrame =
    labeled.select(
      col(idCol) +: col("__y") +:
        stats.zipWithIndex.map { case ((_, mn, mx), j) =>
          scaledCol(col(s"__f$j"), mn, mx).as(s"__s$j") }: _*)

  /** Train the classifier: K delta-rule iterations over the min-max-scaled
    * Gopher metrics of `df`, labels from `label` (any boolean/numeric
    * expression over `df`'s columns — e.g. reference-corpus membership).
    * Weights and bias init at 0 (iteration 0 of the trace).
    *
    * @param label 1.0 = quality/reference, 0.0 = crawl/negative
    * @return scaling stats + the full per-iteration weight trace
    */
  def trainQualityClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      iters: Int = 8,
      lr: Double = 0.5,
      scope: graft.CacheScope = graft.CacheScope.Global): TrainedQuality = {
    require(iters >= 1, "need at least one training iteration")
    val labeled = labeledMetrics(df, idCol, textCol, label)
    val stats = collectStats(labeled)
    val scaled = scope.persist(scaledFrame(labeled, idCol, stats))
    val k = Features.size
    var bias = 0.0
    var w = Vector.fill(k)(0.0)
    var trace = Vector((bias, w))
    (1 to iters).foreach { _ =>
      val z = dot(bias, w, Features.indices.map(j => col(s"__s$j")))
      val p = round(elliott(z), 6)
      val r = p - col("__y")
      val aggs =
        Features.indices.map(j =>
          sum((r * col(s"__s$j")).cast("decimal(28,6)")).as(s"g$j")) ++
          Seq(sum(r.cast("decimal(28,6)")).as("gb"), count(lit(1)).as("n"))
      val row = scaled.agg(aggs.head, aggs.tail: _*).collect().head
      val n = row.getAs[Long]("n")
      require(n > 0, "quality-classifier training needs at least one labeled row")
      def g(name: String): Double = row.getAs[java.math.BigDecimal](name).doubleValue
      bias = round6(bias - lr * (g("gb") / n))
      w = Features.indices.map(j => round6(w(j) - lr * (g(s"g$j") / n))).toVector
      trace :+= ((bias, w))
    }
    // training runs eagerly to completion above, so the scaled frame has
    // no live consumers once the trace is built — release it instead of
    // leaving a dead cached frame for the session's lifetime (the registry
    // trains twice per bench run)
    scaled.unpersist(blocking = false)
    TrainedQuality(stats, trace)
  }

  /** The trained weight trace as a frame — (iter, feature, weight), bias
    * under [[BiasFeature]]; the oracle-facing training artifact (checking
    * EVERY iteration pins the whole GD law, not just its fixed point). */
  def weightTraceDf(spark: SparkSession, model: TrainedQuality): DataFrame = {
    import spark.implicits._
    model.trace.zipWithIndex.flatMap { case ((b, ws), i) =>
      ((BiasFeature, b) +: Features.zip(ws)).map { case (f, v) => (i, f, v) }
    }.toDF("iter", "feature", "weight")
  }

  /** Score `df` with a trained model: scale with the TRAINING stats,
    * Elliott-activate the trained dot product, gate at `threshold`.
    * Null-metric rows are excluded (they were never trainable and carry
    * no score). Pure per-row projection — fuses into the corpus scan.
    *
    * @return (idCol, clf_score, keep)
    */
  def classifyQuality(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: TrainedQuality,
      threshold: Double = 0.5): DataFrame = {
    val metrics = TextAnalysis.gopherishFlags(df, idCol, textCol)
      .filter(col("n_tokens").isNotNull)
    val scaledCols = model.featureStats.zipWithIndex.map { case ((f, mn, mx), _) =>
      scaledCol(col(f).cast("double"), mn, mx) }
    val score = round(elliott(dot(model.bias, model.weights, scaledCols)), 6)
    metrics.select(col(idCol), score.as("clf_score"))
      .withColumn("keep", col("clf_score") >= lit(threshold))
  }
}
