package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:05"), 1L),
    ("A", ts("2024-01-01 10:00:10"), 2L),
    ("B", ts("2024-01-01 10:00:03"), 3L),
    ("C", ts("2024-01-01 10:00:01"), 4L)   // no quote for C at all
  ).toDF("sym", "t", "trade_id")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:05"), 101.0), // exactly coincident with trade 1
    ("A", ts("2024-01-01 10:00:09"), 102.0),
    ("B", ts("2024-01-01 10:00:04"), 200.0)  // after B's trade -> no match
  ).toDF("sym", "t", "px")

  test("as-of join matches the latest at-or-before right row per key") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t", rightPrefix = "q_")
      .select($"trade_id", $"q_px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) === Some(101.0)) // coincident quote matches (at-or-before)
    assert(got(2L) === Some(102.0)) // latest earlier quote
    assert(got(3L) === None)        // only later quotes exist
    assert(got(4L) === None)        // key absent on right
  }

  test("left rows and columns are preserved; right payload is prefixed") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t", rightPrefix = "q_")
    assert(got.count() === 4)
    assert(got.columns.toSeq === Seq("sym", "t", "trade_id", "q_t", "q_px"))
  }

  test("tie-broken numerically, not lexicographically, on (key, ts) collisions") {
    // 99.0 > "101.0" as strings but 101.0 > 99.0 numerically — the larger
    // NUMERIC tiebreak must win
    val dupQuotes = quotes
      .filter($"px" =!= 101.0)
      .unionByName(Seq(
        ("A", ts("2024-01-01 10:00:05"), 99.0),
        ("A", ts("2024-01-01 10:00:05"), 101.5)).toDF("sym", "t", "px"))
    val got = AsOfJoin.asOf(trades, dupQuotes, Seq("sym"), "t", "t",
      rightPrefix = "q_", rightTieBreak = Some("px"))
    val px = got.filter($"trade_id" === 1L).select("q_px").as[Double].head()
    assert(px === 101.5)
  }

  test("property: matches a naive per-row reference on random data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val leftRows = (1 to 60).map { i =>
        (s"k${rnd.nextInt(5)}", ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong)
      }
      val rightRows = (1 to 40).map { i =>
        (s"k${rnd.nextInt(6)}", ts(f"2024-01-01 10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i * 1.0)
      }
      val got = AsOfJoin.asOf(
        leftRows.toDF("sym", "t", "trade_id"), rightRows.toDF("sym", "t", "px"),
        Seq("sym"), "t", "t", rightPrefix = "q_", rightTieBreak = Some("px"))
        .select($"trade_id", $"q_px")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      // naive reference: latest at-or-before right row per key, ties -> max px
      val expected = leftRows.map { case (k, lt, id) =>
        val cands = rightRows.filter(r => r._1 == k && !r._2.after(lt))
        id -> (if (cands.isEmpty) None
               else {
                 val maxTs = cands.map(_._2.getTime).max
                 Some(cands.filter(_._2.getTime == maxTs).map(_._3).max)
               })
      }.toMap
      assert(got === expected)
    }
  }

  test("right rows with null timestamps never match") {
    val withNullTs = quotes.unionByName(
      Seq(("C", null.asInstanceOf[Timestamp], 777.0)).toDF("sym", "t", "px"))
    val got = AsOfJoin.asOf(trades, withNullTs, Seq("sym"), "t", "t", rightPrefix = "q_")
    assert(got.filter($"trade_id" === 4L).select("q_px").collect().head.isNullAt(0))
  }

  test("tolerance nulls out matches older than the bound, keeps fresh ones") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val l = Seq((1L, 100L, ts(50)), (2L, 101L, ts(50))).toDF("k", "lid", "ts")
    val r = Seq((1L, 900L, ts(45)), (2L, 901L, ts(10))).toDF("k", "rid", "ts")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", rightPrefix = "r_",
        tolerance = Some("30 MINUTES"))
      .select("k", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(900L))  // 5 minutes old: within bound
    assert(got(2L) === None)        // 40 minutes old: stale, nulled
    // without tolerance both match
    val loose = AsOfJoin.asOf(l, r, Seq("k"), "ts", "ts", rightPrefix = "r_")
      .select("k", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(loose(2L) === Some(901L))
  }
}
