package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv is exact below k and within the error envelope above it") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val truth = events.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .as[(String, Long)].collect().toMap
    assert(truth.nonEmpty)
    // k above every group's true distinct: the exact fallback must fire
    val exact = Sketches.approxDistinctKmv(events, Seq("event_type"), "user_id", k = 4096)
      .select("event_type", "est_distinct", "n_kept")
      .as[(String, Double, Int)].collect()
    assert(exact.nonEmpty)
    exact.foreach { case (et, est, kept) =>
      assert(est === kept.toDouble, s"$et: sub-k group must be exact")
      assert(est === truth(et).toDouble, s"$et: true ${truth(et)}, got $est")
    }
    // k below every group's true distinct: the (k-1)/U(k) estimator path;
    // expected relative error ~1/sqrt(k-2), assert a generous envelope
    val k = math.max(4, truth.values.min.toInt / 2)
    val est = Sketches.approxDistinctKmv(events, Seq("event_type"), "user_id", k = k)
      .select("event_type", "est_distinct", "n_kept")
      .as[(String, Double, Int)].collect()
    est.foreach { case (et, e, kept) =>
      assert(kept === k)
      val t = truth(et).toDouble
      assert(e > t * 0.3 && e < t * 3.0, s"$et: estimate $e vs true $t")
    }
  }

  test("kmv synopsis is invariant under repartitioning (merge path)") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val a = Sketches.approxDistinctKmv(events, Seq("event_type"), "user_id", k = 32)
      .as[(String, Double, Int)].collect().toSet
    val b = Sketches.approxDistinctKmv(events.repartition(17), Seq("event_type"),
        "user_id", k = 32)
      .as[(String, Double, Int)].collect().toSet
    assert(a === b)
  }

  test("kmv dedups hash values: duplicated rows do not inflate the estimate") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val doubled = df.union(df)
    val once = Sketches.approxDistinctKmv(df, Seq("g"), "v", k = 16)
      .as[(String, Double, Int)].head()
    val twice = Sketches.approxDistinctKmv(doubled, Seq("g"), "v", k = 16)
      .as[(String, Double, Int)].head()
    assert(once === twice)
  }
}
