package graft

import org.apache.spark.sql.functions._

import graft.operators.Reshape

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivotAgg widens declared values and leaves absent cells NULL") {
    val df = Seq(("g1", "A", 1), ("g1", "A", 2), ("g1", "B", 5), ("g2", "B", 7))
      .toDF("g", "p", "v")
    val wide = Reshape.pivotAgg(df, Seq("g"), "p", Seq("A", "B", "C"),
      sum(col("v")), "s_")
    assert(wide.columns.toSeq === Seq("g", "s_a", "s_b", "s_c"))
    val byG = wide.collect().map(r => r.getString(0) -> r).toMap
    assert(byG("g1").getLong(1) === 3L)
    assert(byG("g1").getLong(2) === 5L)
    assert(byG("g1").isNullAt(3))
    assert(byG("g2").isNullAt(1))
    assert(byG("g2").getLong(2) === 7L)
  }

  test("pivotAgg rejects pivot values whose sanitized column names collide") {
    val df = Seq(("g1", "A", 1)).toDF("g", "p", "v")
    val err = intercept[IllegalArgumentException] {
      Reshape.pivotAgg(df, Seq("g"), "p", Seq("A", "a"), sum(col("v")))
    }
    assert(err.getMessage.contains("collide"))
  }

  test("pivotAgg ignores rows whose pivot value is undeclared") {
    val df = Seq(("g1", "A", 1), ("g1", "Z", 100)).toDF("g", "p", "v")
    val wide = Reshape.pivotAgg(df, Seq("g"), "p", Seq("A"), sum(col("v")))
    assert(wide.collect().map(r => r.getLong(1)).toSeq === Seq(1L))
  }

  test("melt is the exact long form: n_rows × n_valueCols, NULL cells kept") {
    val df = Seq((1L, Some(2.5), 10), (2L, None, 20)).toDF("id", "a", "b")
    val long = Reshape.melt(df, Seq("id"), Seq("a", "b"), "m", "v")
    assert(long.columns.toSeq === Seq("id", "m", "v"))
    assert(long.count() === 4)
    val cells = long.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(cells((1L, "a")) === Some(2.5))
    assert(cells((1L, "b")) === Some(10.0))
    assert(cells((2L, "a")) === None)
    assert(cells((2L, "b")) === Some(20.0))
  }

  test("melt round-trips through pivotAgg (first as the cell agg)") {
    val df = Seq((1L, 3.0, 4.0), (2L, 5.0, 6.0)).toDF("id", "a", "b")
    val long = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    val back = Reshape.pivotAgg(long, Seq("id"), "variable", Seq("a", "b"),
      first(col("value")))
    val rows = back.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ===
      Seq((1L, 3.0, 4.0), (2L, 5.0, 6.0)))
  }

  test("crosstabCounts fills empty cells with 0 and preserves row totals") {
    val df = Seq(("r1", "x"), ("r1", "x"), ("r1", "y"), ("r2", "y")).toDF("r", "c")
    val ct = Reshape.crosstabCounts(df, "r", "c", Seq("x", "y", "z"))
    val byR = ct.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byR("r1") === ((2L, 1L, 0L)))
    assert(byR("r2") === ((0L, 1L, 0L)))
    // total-preserving: wide row sums == group sizes
    assert(byR.values.map(t => t._1 + t._2 + t._3).sum === df.count())
  }

  test("rollupAgg emits per-level subtotals with grouping flags") {
    val df = Seq(("a", "p", 1), ("a", "q", 2), ("b", "p", 4)).toDF("g1", "g2", "v")
    val out = Reshape.rollupAgg(df, Seq("g1", "g2"),
      Seq(sum(col("v")).as("sum_v"), count(lit(1)).as("n")))
    assert(out.columns.toSeq === Seq("g1", "g2", "g_g1", "g_g2", "sum_v", "n"))
    val rows = out.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1)), r.getInt(2), r.getInt(3)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(rows((Some("a"), Some("p"), 0, 0)) === ((1L, 1L)))
    assert(rows((Some("a"), None, 0, 1)) === ((3L, 2L)))     // subtotal over g2
    assert(rows((Some("b"), None, 0, 1)) === ((4L, 1L)))
    assert(rows((None, None, 1, 1)) === ((7L, 3L)))          // grand total
    assert(rows.size === 3 + 2 + 1)
  }

  test("rollupAgg flags disambiguate a genuine NULL group value from a subtotal") {
    val df = Seq((Option.empty[String], 1), (Some("a"), 2)).toDF("g1", "v")
    val out = Reshape.rollupAgg(df, Seq("g1"), Seq(sum(col("v")).as("sum_v")))
    val rows = out.collect().map(r =>
      (Option(r.getString(0)), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows((None, 0)) === 1L)  // the real NULL group
    assert(rows((None, 1)) === 3L)  // the grand total
  }
}
