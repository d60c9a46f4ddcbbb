package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 5L), (3L, 16L), (4L, 31L), (5L, 32L), (6L, 100L), (7L, -7L)
  ).toDF("pid", "v")

  private lazy val intervals = Seq(
    (10L, 0L, 5L),     // within one bucket (width 16)
    (11L, 5L, 40L),    // spans three buckets
    (12L, 99L, 101L),  // far bucket
    (13L, -10L, -1L)   // negative domain
  ).toDF("iid", "lo", "hi")

  test("bucketed containment equals the naive cross-filter join") {
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 16L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    // sanity on the fixture: inclusive bounds both ends, negatives handled
    assert(got.contains((1L, 10L)) && got.contains((2L, 10L)))  // 0 and 5 in [0,5]
    assert(got.contains((2L, 11L)) && got.contains((4L, 11L)))  // lo and within
    assert(got.contains((5L, 11L)))                             // 32 in [5,40]
    assert(got.contains((7L, 13L)))                             // -7 in [-10,-1]
    assert(!got.contains((6L, 11L)))
  }

  test("bucket width does not change results, only candidate volume") {
    val naive = points.crossJoin(intervals)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 3L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === naive, s"width $w")
    }
  }

  test("null interval bounds drop the interval — no match, no outlier error") {
    // a NULL lo or hi can never satisfy the containment predicate; it must
    // not reach the bucket-span outlier guard (where hi - lo is NULL and
    // the error message would claim a span it cannot know)
    val withNulls = intervals.select($"iid", $"lo", $"hi").unionByName(Seq(
      (20L, Option.empty[Long], Option(50L)),
      (21L, Option(0L), Option.empty[Long])
    ).toDF("iid", "lo", "hi"))
    val got = RangeJoin.pointInInterval(points, "v", withNulls, "lo", "hi", 16L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter($"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
  }

  test("the physical plan is a hash equi-join on the bucket, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
