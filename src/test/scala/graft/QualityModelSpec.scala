package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable hand corpus: positives are varied prose, negatives are the
  // repetitive short-token spam the Gopher metrics can see
  private def corpus = Seq(
    (1L, "the quarterly report covers revenue growth across distinct market segments", 1.0),
    (2L, "engineers reviewed the proposal and suggested several structural improvements", 1.0),
    (3L, "a balanced paragraph mentions different subjects without repeating itself", 1.0),
    (4L, "historians compared primary sources against later secondary interpretations", 1.0),
    (5L, "the committee published detailed findings after months of careful analysis", 1.0),
    (6L, "travelers described regional cuisine markets and architecture in their journals", 1.0),
    (11L, "buy now buy now buy now buy now buy now buy now buy now buy now", 0.0),
    (12L, "win big win big win big win big win big win big win big win big", 0.0),
    (13L, "click here click here click here click here click here click here", 0.0),
    (14L, "free free free free free free free free free free free free free free", 0.0),
    (15L, "act now act now act now act now act now act now act now act now", 0.0),
    (16L, "top deal top deal top deal top deal top deal top deal top deal", 0.0)
  ).toDF("doc_id", "text", "y")

  test("training separates a separable corpus; positives outscore negatives") {
    val m = QualityModel.trainQualityClassifier(
      corpus, "doc_id", "text", col("y"), iters = 12, lr = 0.5)
    val scored = QualityModel.classifyQuality(corpus, "doc_id", "text", m)
      .join(corpus.select(col("doc_id"), col("y")), Seq("doc_id"))
      .select(col("y"), col("clf_score")).as[(Double, Double)].collect()
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max,
      s"expected full separation, got pos.min=${pos.min} neg.max=${neg.max}")
    // the gate agrees with the labels on this corpus
    val acc = scored.count { case (y, s) => (s >= 0.5) == (y == 1.0) }
    assert(acc === scored.length, "threshold gate must match labels when separated")
  }

  test("the trace starts at zero, has iters+1 entries, and training is deterministic") {
    val m1 = QualityModel.trainQualityClassifier(
      corpus, "doc_id", "text", col("y"), iters = 5)
    val m2 = QualityModel.trainQualityClassifier(
      corpus, "doc_id", "text", col("y"), iters = 5)
    assert(m1.trace.size === 6)
    assert(m1.trace.head._1 === 0.0 && m1.trace.head._2.forall(_ === 0.0))
    assert(m1.trace === m2.trace, "identical inputs must train identical traces")
    assert(m1.featureStats === m2.featureStats)
    assert(m1.trace.last !== m1.trace.head, "training must move the weights")
    // every weight lives on the 6-decimal grid and is finite
    m1.trace.foreach { case (b, ws) =>
      (b +: ws).foreach { w =>
        assert(!w.isNaN && !w.isInfinite)
        assert(BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble === w)
      }
    }
  }

  test("a constant feature scales to zero and its weight never moves") {
    // every token alphabetic in every doc -> alpha_ratio is constant 1.0
    val m = QualityModel.trainQualityClassifier(
      corpus, "doc_id", "text", col("y"), iters = 6)
    val aIdx = QualityModel.Features.indexOf("alpha_ratio")
    val (_, amn, amx) = m.featureStats(aIdx)
    assert(amn === amx, "fixture should hold alpha_ratio constant")
    assert(m.trace.forall(_._2(aIdx) === 0.0),
      "a zero-span feature carries zero gradient forever")
  }

  test("null-text rows neither train nor classify") {
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[String], 1.0)).toDF("doc_id", "text", "y"))
    val m0 = QualityModel.trainQualityClassifier(
      corpus, "doc_id", "text", col("y"), iters = 4)
    val mN = QualityModel.trainQualityClassifier(
      withNull, "doc_id", "text", col("y"), iters = 4)
    assert(m0.trace === mN.trace, "a null-text row must not carry gradient")
    val classified = QualityModel.classifyQuality(withNull, "doc_id", "text", mN)
    assert(classified.filter(col("doc_id") === 99L).count() === 0)
    assert(classified.count() === 12)
  }

  test("scores stay in (0,1) and respect the Elliott midpoint at z=0") {
    val m = QualityModel.TrainedQuality(
      QualityModel.Features.map(f => (f, 0.0, 1.0)),
      Vector((0.0, Vector.fill(QualityModel.Features.size)(0.0))))
    // all-zero weights -> z=0 -> every score exactly 0.5, kept at the
    // default >= 0.5 threshold
    val out = QualityModel.classifyQuality(corpus, "doc_id", "text", m)
      .select(col("clf_score"), col("keep")).as[(Double, Boolean)].collect()
    assert(out.forall { case (s, k) => s === 0.5 && k })
  }

  test("training refuses an empty or all-null corpus") {
    val empty = Seq.empty[(Long, String, Double)].toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      QualityModel.trainQualityClassifier(empty, "doc_id", "text", col("y"), iters = 2)
    }
  }

  test("training plan: per-iteration aggregates ride the cached scaled frame, no cartesian") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = QualityModel.trainQualityClassifier(
      docs, "doc_id", "text", col("doc_id") % 2 === 0, iters = 2)
    val plan = QualityModel.classifyQuality(docs, "doc_id", "text", m)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Exchange"), "classification must be a per-row projection")
  }
}
