package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (Some(1L), Some("a")),
    (Some(2L), Some("a")),
    (Some(3L), None),
    (None, Some("b"))
  ).toDF("id", "tag")

  test("profileColumns: exact counts and ratios per column in one report") {
    val got = DataQuality.profileColumns(rows, Seq("id", "tag"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 4L, 3L, 3L, 0.75, 0.75)))
    assert(got("tag") === (("tag", 4L, 3L, 2L, 0.75, 0.5)))
  }

  test("profileColumns on empty input: zero counts, null ratios") {
    val empty = rows.filter(lit(false))
    val got = DataQuality.profileColumns(empty, Seq("id"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(got === (("id", 0L, 0L, 0L, None, None)))
  }

  test("profileDrift: deltas exact per column, empty side A yields null row_ratio") {
    val runA = rows // 4 rows, id 3/4 complete
    val runB = rows.unionByName(Seq((Option.empty[Long], Some("c"))).toDF("id", "tag"))
    val got = DataQuality.profileDrift(runA, runB, Seq("id", "tag"))
      .select("column", "n_rows_a", "n_rows_b", "d_completeness", "row_ratio")
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("id")._2 === 4L && got("id")._3 === 5L)
    assert(got("id")._4 === -0.15) // completeness 3/5 vs 3/4, rounded at 6
    assert(got("id")._5 === 1.25)
    assert(got("tag")._4 === 0.05)
    // empty A: ratio is NULL (no evidence), not a division blow-up
    val vsEmpty = DataQuality.profileDrift(rows.filter(lit(false)), runB, Seq("id"))
    assert(vsEmpty.select("row_ratio").head().isNullAt(0))
  }

  test("checkReferentialIntegrity: orphans exact, null keys reported apart") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = DataQuality.checkReferentialIntegrity(child, parent, Seq("fk" -> "pk"))
      .as[(String, Long, Long, Long, Option[Double])].head()
    // 5 rows, 1 null key, 1 orphan (9), 3 of 4 non-null match
    assert(got === (("fk", 5L, 1L, 1L, Some(0.75))))
    // all matching: zero orphans, ratio 1.0
    val clean = DataQuality.checkReferentialIntegrity(
      Seq(1L, 2L).toDF("fk"), parent, Seq("fk" -> "pk"))
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(clean === (("fk", 2L, 0L, 0L, Some(1.0))))
  }

  test("checkReferentialIntegrity: no checkable keys → NULL match_ratio") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // every child key NULL: zero performable checks, not a 0% match
    val allNull = DataQuality.checkReferentialIntegrity(
      Seq[Option[Long]](None, None).toDF("fk"), parent, Seq("fk" -> "pk"))
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(allNull === (("fk", 2L, 2L, 0L, None)))
    // empty child: same convention
    val empty = DataQuality.checkReferentialIntegrity(
      Seq(Some(1L)).toDF("fk").filter(lit(false)), parent, Seq("fk" -> "pk"))
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(empty === (("fk", 0L, 0L, 0L, None)))
  }

  test("splitQuarantine routes rows by named constraints; NULL predicate fails closed") {
    val df = Seq(
      (1L, Some(10.0), Some("a")),   // clean
      (2L, Some(200.0), Some("b")),  // fails v_small
      (3L, None, Some("c")),         // NULL v: fail-closed on v_small
      (4L, Some(5.0), None)          // fails tag_present
    ).toDF("id", "v", "tag")
    val constraints = Seq(
      "v_small" -> (col("v") <= 100.0),
      "tag_present" -> col("tag").isNotNull)
    val (valid, quarantined) = DataQuality.splitQuarantine(df, constraints)
    assert(valid.select("id").as[Long].collect().toSet === Set(1L))
    assert(valid.columns.toSeq === df.columns.toSeq) // audit column removed
    val reasons = quarantined
      .select(col("id"), array_join(col("violations"), ",").as("r"))
      .as[(Long, String)].collect().toMap
    assert(reasons === Map(2L -> "v_small", 3L -> "v_small", 4L -> "tag_present"))
    // every input row lands on exactly one side
    assert(valid.count() + quarantined.count() === df.count())
  }

  test("rowViolations rejects duplicate constraint names") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val err = intercept[IllegalArgumentException] {
      DataQuality.rowViolations(df, Seq("c" -> (col("v") > 0), "c" -> (col("v") < 10)))
    }
    assert(err.getMessage.contains("unique"))
  }

  test("checkColumns gates on thresholds; untouched dimensions don't gate") {
    val got = DataQuality.checkColumns(rows,
      minCompleteness = Map("id" -> 0.7, "tag" -> 0.9),
      minUniqueness = Map("id" -> 0.7))
      .select("column", "pass").as[(String, Boolean)].collect().toMap
    assert(got("id") === true)   // 0.75 >= 0.7 on both dimensions
    assert(got("tag") === false) // completeness 0.75 < 0.9
  }
}
