package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  private def view(df: DataFrame): Map[String, (Long, Double, Double, Double, Double)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap

  private val data = Seq(
    ("a", 1.0, 0), ("a", 2.0, 1), ("a", 6.0, 2),
    ("b", 10.0, 0), ("b", 20.0, 2)).toDF("g", "v", "batch")

  private def direct(df: DataFrame) = MaterializedAgg.finalizeView(
    MaterializedAgg.partialState(df, Seq("g"), "v"), Seq("g"))

  test("merge of per-batch partials equals the from-scratch aggregate") {
    val batches = (0 until 3).map(i =>
      MaterializedAgg.partialState(data.filter(col("batch") === i), Seq("g"), "v"))
    val merged = MaterializedAgg.finalizeView(
      MaterializedAgg.mergeStates(batches, Seq("g")), Seq("g"))
    assert(view(merged) === view(direct(data)))
    assert(view(merged)("a") === ((3L, 9.0, 3.0, 1.0, 6.0)))
  }

  test("merge is association-order independent") {
    val b = (0 until 3).map(i =>
      MaterializedAgg.partialState(data.filter(col("batch") === i), Seq("g"), "v"))
    val leftFold = MaterializedAgg.mergeStates(
      Seq(MaterializedAgg.mergeStates(Seq(b(0), b(1)), Seq("g")), b(2)), Seq("g"))
    val rightFold = MaterializedAgg.mergeStates(
      Seq(b(0), MaterializedAgg.mergeStates(Seq(b(1), b(2)), Seq("g"))), Seq("g"))
    assert(view(MaterializedAgg.finalizeView(leftFold, Seq("g"))) ===
      view(MaterializedAgg.finalizeView(rightFold, Seq("g"))))
  }

  test("retraction of a batch nulls extrema; repair restores them from survivors") {
    val g = Seq("g")
    val b = (0 until 3).map(i => data.filter(col("batch") === i))
    val standing = MaterializedAgg.mergeStates(
      b.map(MaterializedAgg.partialState(_, g, "v")), g)
    val retracted = MaterializedAgg.mergeStates(
      Seq(standing, MaterializedAgg.retractState(b(2), g, "v")), g)
    // pre-repair: algebraic parts already correct, extrema honest-NULL
    val pre = retracted.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.isNullAt(3) || r.isNullAt(4)))).toMap
    assert(pre("a")._1 === 2L)
    val repaired = MaterializedAgg.finalizeView(
      MaterializedAgg.repairGroups(retracted, b(0).unionByName(b(1)), b(2), g, "v"), g)
    val expect = direct(data.filter(col("batch") =!= 2))
    assert(view(repaired) === view(expect))
    assert(view(repaired)("a") === ((2L, 3.0, 1.5, 1.0, 2.0)))
  }

  test("fully-retracted groups vanish from the finalized view") {
    val g = Seq("g")
    val only = Seq(("solo", 5.0)).toDF("g", "v")
    val standing = MaterializedAgg.partialState(only, g, "v")
    val retracted = MaterializedAgg.mergeStates(
      Seq(standing, MaterializedAgg.retractState(only, g, "v")), g)
    val repaired = MaterializedAgg.repairGroups(
      retracted, only.limit(0), only, g, "v")
    assert(repaired.count() === 0)
    assert(MaterializedAgg.finalizeView(retracted, g).count() === 0)
  }

  test("distinct synopsis merge law: merged batches equal the single pass") {
    val g = Seq("g")
    // enough distinct values to overflow k in one group (estimator path)
    // and stay under it in the other (exact path)
    val rows = ((1 to 300).map(i => ("big", i.toLong)) ++
      (1 to 10).map(i => ("small", i.toLong))).toDF("g", "v")
      .withColumn("batch", pmod(col("v"), lit(3)))
    val b = (0 until 3).map(i => rows.filter(col("batch") === i))
    val merged = MaterializedAgg.finalizeDistinct(
      MaterializedAgg.mergeDistinct(
        b.map(MaterializedAgg.partialDistinct(_, g, "v", k = 16)), g, k = 16), g, k = 16)
    val single = MaterializedAgg.finalizeDistinct(
      MaterializedAgg.partialDistinct(rows, g, "v", k = 16), g, k = 16)
    assert(merged.collect().map(_.toSeq).toSet === single.collect().map(_.toSeq).toSet)
    val bySize = merged.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(bySize("small") === ((10.0, 10)))          // exact below k
    assert(bySize("big")._2 === 16)                   // estimator path, synopsis full
    assert(math.abs(bySize("big")._1 - 300.0) / 300.0 < 0.5)
  }

  test("quantile synopsis merge law: merged batches equal the single pass") {
    val g = Seq("g")
    // > k rows in one group (trim path), < k in the other (exact path)
    val rows = ((1 to 400).map(i => ("big", i.toLong, i.toDouble)) ++
      (1 to 9).map(i => ("small", (1000 + i).toLong, i * 10.0)))
      .toDF("g", "id", "v")
      .withColumn("batch", pmod(col("id"), lit(3)))
    val b = (0 until 3).map(i => rows.filter(col("batch") === i))
    val qs = Seq(0.25, 0.5, 0.9)
    val merged = MaterializedAgg.finalizeQuantile(
      MaterializedAgg.mergeQuantile(
        b.map(MaterializedAgg.partialQuantile(_, g, "id", "v", k = 32)), g, k = 32), g, qs)
    val single = MaterializedAgg.finalizeQuantile(
      MaterializedAgg.partialQuantile(rows, g, "id", "v", k = 32), g, qs)
    assert(merged.collect().map(_.toSeq).toSet === single.collect().map(_.toSeq).toSet)
    val got = merged.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> ((r.getDouble(2), r.getInt(3)))).toMap
    assert(got(("small", 0.5)) === ((50.0, 9)))  // exact below k: true median
    assert(got(("big", 0.5))._2 === 32)          // trimmed to k
    // uniform-sample median of 1..400 should land broadly mid-range
    assert(got(("big", 0.5))._1 > 100.0 && got(("big", 0.5))._1 < 300.0)
  }

  test("rollingOver: trailing-N sum per partition, gap-tolerant, window population honest") {
    val daily = Seq(
      ("p1", 1, 10.0), ("p1", 2, 20.0), ("p1", 4, 40.0),  // day 3 missing
      ("p2", 1, 5.0)).toDF("g", "day", "v")
    val out = MaterializedAgg.rollingOver(daily, Seq("g"), "day", "v", 1)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> ((r.getDouble(3), r.getInt(4)))).toMap
    assert(rows(("p1", 1)) === ((10.0, 1)))
    assert(rows(("p1", 2)) === ((30.0, 2)))
    // ROWS framing: day 4's window is the last 2 PRESENT days (2, 4)
    assert(rows(("p1", 4)) === ((60.0, 2)))
    assert(rows(("p2", 1)) === ((5.0, 1)))
  }

  test("maintainStore: generation-committed append + retract converges to recompute") {
    val dir = java.nio.file.Files.createTempDirectory("agg_maintain").toFile
    dir.delete()
    val path = dir.getAbsolutePath
    val g = Seq("g")
    val b = (0 until 3).map(i => data.filter(col("batch") === i))
    b.foreach(batch => MaterializedAgg.maintainStore(spark, path, batch, g, "v"))
    MaterializedAgg.maintainStore(spark, path, b(2), g, "v", retract = true)
    val (_, state) = graft.sources.Store.readStoreLatest(spark, path).get
    // algebraic measures equal the survivor recompute; extrema NULL until repair
    val fin = MaterializedAgg.finalizeView(state, g)
      .select("g", "n_rows", "sum_v", "avg_v")
    val expect = direct(data.filter(col("batch") =!= 2))
      .select("g", "n_rows", "sum_v", "avg_v")
    assert(fin.collect().map(_.toSeq).toSet === expect.collect().map(_.toSeq).toSet)
    // each maintenance step was its own committed generation (keep=3 retained)
    assert(graft.sources.Store.listGenerations(spark, path).size === 3)
  }

  test("top-k synopsis merge law: merged batches equal the fresh leaderboard") {
    val ord = graft.sources.Tables.orders(spark, sfDir)
    val g = Seq("o_orderpriority")
    val fresh = MaterializedAgg.finalizeTopK(
      MaterializedAgg.partialTopK(ord, g, "o_orderkey", "o_totalprice", k = 7), g)
      .collect().map(_.toSeq).toSet
    // batched by order key thirds, merged — must EQUAL fresh, not approximate
    val b = (0 until 3).map(i => ord.filter(pmod(col("o_orderkey"), lit(3)) === i))
    val states = b.map(MaterializedAgg.partialTopK(_, g, "o_orderkey", "o_totalprice", k = 7))
    val merged = MaterializedAgg.finalizeTopK(MaterializedAgg.mergeTopK(states, g, k = 7), g)
      .collect().map(_.toSeq).toSet
    assert(merged === fresh)
    // replay idempotence: a batch's synopsis merged in twice changes nothing
    val replayed = MaterializedAgg.finalizeTopK(
      MaterializedAgg.mergeTopK(states :+ states.head, g, k = 7), g)
      .collect().map(_.toSeq).toSet
    assert(replayed === fresh)
    // ranks are 1..k per group with k distinct ids
    val perGroup = MaterializedAgg.finalizeTopK(
      MaterializedAgg.mergeTopK(states, g, k = 7), g)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("d"))
      .collect()
    perGroup.foreach(r => assert(r.getLong(1) === 7L && r.getLong(2) === 7L))
  }

  test("maintained HLL distinct: overlapping shards merge idempotently, deletes repair touched groups only") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val g = Seq("event_type")
    // shards overlap on user_id — register max must absorb, not add
    val parts = (0 to 2).map(i =>
      MaterializedAgg.partialDistinctHll(ev.filter(pmod(col("event_id"), lit(3)) === i),
        g, "user_id", p = 4))
    val merged = MaterializedAgg.mergeDistinctHll(parts, g)
    val fresh = MaterializedAgg.partialDistinctHll(ev, g, "user_id", p = 4)
    assert(merged.exceptAll(fresh).count() === 0 && fresh.exceptAll(merged).count() === 0)
    // replayed batch absorbed
    val replayed = MaterializedAgg.mergeDistinctHll(parts :+ parts.head, g)
    assert(replayed.exceptAll(fresh).count() === 0)
    // delete touching one group: repaired state ≡ fresh survivors' state
    val gone = col("event_type") === "purchase" && pmod(col("user_id"), lit(2)) === 0
    val repaired = MaterializedAgg.repairDistinctHll(
      merged, ev.filter(!gone), ev.filter(gone), g, "user_id", p = 4)
    val freshSurv = MaterializedAgg.partialDistinctHll(ev.filter(!gone), g, "user_id", p = 4)
    assert(repaired.exceptAll(freshSurv).count() === 0 &&
      freshSurv.exceptAll(repaired).count() === 0)
    // untouched groups' register rows are bit-identical to the pre-delete state
    val untouchedBefore = merged.filter(col("event_type") =!= "purchase")
    val untouchedAfter = repaired.filter(col("event_type") =!= "purchase")
    assert(untouchedAfter.exceptAll(untouchedBefore).count() === 0)
  }

  test("top-k boundary tie: selection, merge, and finalize share one total order") {
    // value tie EXACTLY at the k boundary where numeric and lexicographic
    // id orders disagree (9 vs 10): the synopsis stores ids as strings, so
    // selection must tie-break lexicographically too or merged ≠ fresh
    val rows = Seq((1L, "g", 5.0), (9L, "g", 1.0), (10L, "g", 1.0))
      .toDF("id", "g", "v")
    val g = Seq("g")
    val fresh = MaterializedAgg.finalizeTopK(
      MaterializedAgg.partialTopK(rows, g, "id", "v", k = 2), g)
      .collect().map(_.toSeq).toSet
    // 9 and 10 arrive in different batches; the merge re-trims their union
    val states = Seq(
      MaterializedAgg.partialTopK(rows.filter(col("id") =!= 10L), g, "id", "v", k = 2),
      MaterializedAgg.partialTopK(rows.filter(col("id") === 10L), g, "id", "v", k = 2))
    val merged = MaterializedAgg.finalizeTopK(
      MaterializedAgg.mergeTopK(states, g, k = 2), g)
      .collect().map(_.toSeq).toSet
    assert(merged === fresh)
    // and the shared order is the lexicographic one: "10" < "9"
    assert(fresh.map(_(2)) === Set("1", "10"))
  }

  test("top-k repair: deleting leaders recomputes touched groups from survivors only") {
    val ord = graft.sources.Tables.orders(spark, sfDir)
    val g = Seq("o_orderpriority")
    val standing = MaterializedAgg.partialTopK(ord, g, "o_orderkey", "o_totalprice", k = 5)
    // delete the CURRENT LEADERS of one group (its top-2) — the repair
    // must surface the next-best survivors, untouched groups unchanged
    val leaders = MaterializedAgg.finalizeTopK(standing, g)
      .filter(col("o_orderpriority") === "1-URGENT" && col("rank") <= 2)
      .select(col("id").cast("long").as("o_orderkey"), col("o_orderpriority"))
    val deleted = ord.join(leaders, Seq("o_orderkey", "o_orderpriority"), "left_semi")
    val survivors = ord.join(leaders, Seq("o_orderkey", "o_orderpriority"), "left_anti")
    val repaired = MaterializedAgg.finalizeTopK(
      MaterializedAgg.repairTopK(standing, survivors, deleted, g, "o_orderkey",
        "o_totalprice", k = 5), g)
      .collect().map(_.toSeq).toSet
    val fresh = MaterializedAgg.finalizeTopK(
      MaterializedAgg.partialTopK(survivors, g, "o_orderkey", "o_totalprice", k = 5), g)
      .collect().map(_.toSeq).toSet
    assert(repaired === fresh)
    // a touched group whose every row is deleted leaves the state
    val one = ord.filter(col("o_orderpriority") === "5-LOW")
    val gone = MaterializedAgg.repairTopK(
      MaterializedAgg.partialTopK(one, g, "o_orderkey", "o_totalprice", k = 5),
      one.limit(0), one, g, "o_orderkey", "o_totalprice", k = 5)
    assert(gone.count() === 0)
  }

  test("rolling hll distinct: every window estimate equals the fresh estimate over its days") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
    val daily = MaterializedAgg.partialDistinctHll(
      ev, Seq("event_type", "day"), "user_id", p = 4)
    val rolled = MaterializedAgg.rollingDistinctHll(
      daily, Seq("event_type"), "day", windowDays = 7, p = 4)
      .collect().map(r => (r.getString(0), r.getDate(1)) ->
        ((r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    assert(rolled.nonEmpty)
    // the law, checked exhaustively: each (type, day)'s rolled estimate
    // IS the fresh single-pass estimate over that type's trailing window
    val fresh = rolled.keys.toSeq.sortBy(_.toString).map { case (t, d) =>
      val lo = java.sql.Date.valueOf(d.toLocalDate.minusDays(6))
      val slice = ev.filter(col("event_type") === t &&
        col("day").between(lit(lo), lit(d)))
      val est = graft.operators.Sketches
        .approxDistinctHll(slice, Nil, "user_id", p = 4).collect().head
      val nDays = slice.select("day").distinct().count().toInt
      (t, d) -> ((est.getDouble(0), est.getInt(1), nDays))
    }.toMap
    assert(rolled === fresh)
  }
}
