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

  test("cms never under-counts, and is exact when width kills collisions") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val cand = graft.sources.Tables.part(spark, sfDir)
      .filter(col("p_partkey") % 10 === 0)
    val truth = li.groupBy("l_partkey").count()
      .as[(Long, Long)].collect().toMap.withDefaultValue(0L)
    // tight width: estimates must still dominate the true counts
    val est = Sketches.cmsFrequencies(li, "l_partkey", cand, "p_partkey",
        width = 64, depth = 4)
      .as[(Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (k, e) => assert(e >= truth(k), s"part $k: $e < ${truth(k)}") }
    // width far above the distinct key count: no row collides everywhere
    val wide = Sketches.cmsFrequencies(li, "l_partkey", cand, "p_partkey",
        width = 1 << 16, depth = 4)
      .as[(Long, Long)].collect()
    wide.foreach { case (k, e) => assert(e === truth(k), s"part $k: $e != ${truth(k)}") }
  }

  test("cms sketch merges by cell addition and ignores partitioning") {
    val li = graft.sources.Tables.lineitem(spark, sfDir).select("l_partkey")
    val a = li.filter(col("l_partkey") % 2 === 0)
    val b = li.filter(col("l_partkey") % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsSketch(df, "l_partkey", width = 32, depth = 3)
        .as[(Int, Long, Long)].collect().map { case (j, bk, c) => (j, bk) -> c }.toMap
    val whole = cells(li)
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged === whole)
    assert(cells(li.repartition(13)) === whole)
  }

  test("bottom-k quantiles are exact below k and close above it") {
    val df = (1 to 1000).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    // k >= group size: the sample IS the group, quantiles are exact under
    // the lower-value convention est(q) = sorted(v)[floor(q * (n-1))]
    val exact = Sketches.approxQuantilesBottomK(df, Seq("g"), "id", "v",
        qs = Seq(0.0, 0.5, 1.0), k = 1000)
      .select("q", "est_value", "n_sample").as[(Double, Double, Int)].collect()
      .map { case (q, e, n) => q -> ((e, n)) }.toMap
    assert(exact(0.0) === ((1.0, 1000)))
    assert(exact(0.5) === ((500.0, 1000))) // floor(0.5 * 999) = 499 -> v=500
    assert(exact(1.0) === ((1000.0, 1000)))
    // k << group size: a uniform 64-row sample; rank error ~1/sqrt(k)
    val approx = Sketches.approxQuantilesBottomK(df, Seq("g"), "id", "v",
        qs = Seq(0.5), k = 64)
      .select("est_value").as[Double].head()
    assert(approx > 250.0 && approx < 750.0, s"median estimate $approx")
  }

  test("bottom-k quantile sample is invariant under repartitioning") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.approxQuantilesBottomK(df, Seq("o_orderpriority"), "o_orderkey",
          "o_totalprice", qs = Seq(0.25, 0.9), k = 32)
        .as[(String, Double, Double, Int)].collect().toSet
    val base = run(orders)
    assert(base.nonEmpty)
    assert(run(orders.repartition(17)) === base)
  }

  test("heavyHitters equals the exact GROUP BY ... HAVING definition") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val n = events.filter(col("user_id").isNotNull).count()
    val truth = events.filter(col("user_id").isNotNull)
      .groupBy("user_id").count()
      .filter(col("count") >= lit(0.005) * lit(n))
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val got = Sketches.heavyHitters(events, "user_id", minShare = 0.005)
      .select("user_id", "cnt").as[(Long, Long)].collect().toSet
    assert(got === truth)
  }

  test("heavyHitters stays exact when compaction fires (capacity << distinct)") {
    // 5 heavy items (200 rows each) in a sea of 2000 singletons: with the
    // auto capacity max(64, ceil(2/0.05)) = 64 << 2005 distinct items, the
    // MG summary compacts many times, yet the candidate superset guarantee
    // must keep every true heavy hitter for pass 2 to confirm
    val heavy = (1 to 5).flatMap(i => Seq.fill(200)(s"h$i"))
    val tail = (1 to 2000).map(i => s"t$i")
    val df = (heavy ++ tail).toDF("item").repartition(13)
    val got = Sketches.heavyHitters(df, "item", minShare = 0.05)
      .as[(String, Long, Double)].collect().toSet
    val share = BigDecimal(200.0 / 3000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got === (1 to 5).map(i => (s"h$i", 200L, share)).toSet)
  }

  test("heavyHitters is invariant under repartitioning (merge path)") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val a = Sketches.heavyHitters(events, "user_id", minShare = 0.005)
      .as[(Long, Long, Double)].collect().toSet
    val b = Sketches.heavyHitters(events.repartition(17), "user_id", minShare = 0.005)
      .as[(Long, Long, Double)].collect().toSet
    assert(a.nonEmpty && a === b)
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

  test("robustOutliers flags the planted spike, is repartition-stable, zero-MAD safe") {
    // 200 values near 100 plus one spike; k covers all rows, so med/MAD
    // are exact and the spike's score is hand-checkable
    val base = (0 until 200).map(i => (i.toLong, 100.0 + (i % 11) - 5))
    val rows = (base :+ (999L, 10000.0)).toDF("id", "v")
    val got = Sketches.robustOutliers(rows, "id", "v", threshold = 3.0, k = 512)
      .select("id").as[Long].collect().toSet
    assert(got.contains(999L))
    assert(!got.exists(id => id < 200 && id != 999L) || got.size < 5)
    val again = Sketches.robustOutliers(rows.repartition(13), "id", "v",
      threshold = 3.0, k = 512).select("id").as[Long].collect().toSet
    assert(again === got)
    // constant column: MAD 0 -> no outliers, no division blow-up
    val const = (0 until 50).map(i => (i.toLong, 7.0)).toDF("id", "v")
    assert(Sketches.robustOutliers(const, "id", "v").count() === 0)
  }

  test("kmv synopsis merge is lossless: merged estimate equals the fresh global estimate") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val k = 32
    // three disjoint batches by event_id; per-batch synopses merged
    val parts = (0 to 2).map(b =>
      Sketches.kmvSynopsis(events.filter(pmod(col("event_id"), lit(3)) === b), "user_id", k))
    val merged = Sketches.kmvEstimate(Sketches.kmvMerge(parts, k), k)
      .as[(Double, Int)].head()
    val fresh = Sketches.kmvEstimate(Sketches.kmvSynopsis(events, "user_id", k), k)
      .as[(Double, Int)].head()
    assert(merged === fresh, "merge must be exact, not approximate")
    // sub-k shard: synopsis is the full distinct set, merge stays exact
    val tiny = Sketches.kmvSynopsis(events.limit(5), "user_id", k)
    assert(tiny.count() <= 5)
    // idempotence under re-merge of the same synopsis (set semantics)
    val re = Sketches.kmvEstimate(Sketches.kmvMerge(Seq(parts.head, parts.head), k), k)
      .as[(Double, Int)].head()
    val one = Sketches.kmvEstimate(parts.head, k).as[(Double, Int)].head()
    assert(re === one)
  }

  test("cms merge is linear: merged per-batch cells equal the fresh corpus sketch") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val parts = (0 to 2).map(b =>
      Sketches.cmsSketch(li.filter(pmod(col("l_orderkey"), lit(3)) === b),
        "l_partkey", width = 128, depth = 4))
    val merged = Sketches.cmsMerge(parts)
    val fresh = Sketches.cmsSketch(li, "l_partkey", width = 128, depth = 4)
    assert(merged.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(merged).count() === 0)
    // and probing the merged sketch answers the fresh probe's estimates
    val cands = li.select(col("l_partkey").as("p")).distinct().limit(20)
    val a = Sketches.cmsProbe(merged, cands, "p", width = 128, depth = 4)
    val b = Sketches.cmsProbe(fresh, cands, "p", width = 128, depth = 4)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("hll registers match a bit-level JVM reference implementation") {
    val p = 8
    val m = 1L << p
    val w = 60 - p
    val vals = (1 to 200).map(i => s"v$i")
    val df = vals.toDF("v")
    val got = Sketches.hllRegisters(df, Nil, "v", p = p)
      .select("b", "m_reg").as[(Int, Int)].collect().toMap
    // reference: same 60-bit md5 prefix, bucket = low bits via mod,
    // rho = leading-zero count of the (60-p)-bit value part + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = vals
      .map { v =>
        val hex = md.digest(s"$v#hll".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        val b = (h % m).toInt
        val part = h / m
        val rho =
          if (part == 0L) w + 1
          else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(part))
        (b, rho)
      }
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(got === expected)
  }

  test("hll estimate is within the error envelope, exact small-range by linear counting") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val truth = events.groupBy("event_type").agg(countDistinct("event_id").as("d"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.approxDistinctHll(events, Seq("event_type"), "event_id", p = 8)
      .select("event_type", "est_distinct")
      .as[(String, Double)].collect()
    assert(est.nonEmpty)
    est.foreach { case (et, e) =>
      val t = truth(et).toDouble
      // sigma ~ 1.04/sqrt(256) = 6.5%; assert a 4-sigma-ish envelope
      assert(e > t * 0.7 && e < t * 1.3, s"$et: estimate $e vs true $t")
    }
    // tiny cardinality vs m=256 registers: the linear-counting branch
    // must fire and is EXACT-ish (V zero registers, distinct << m)
    val small = (1 to 5).map(i => s"u$i").toDF("v")
    val one = Sketches.approxDistinctHll(small, Nil, "v", p = 8)
      .as[(Double, Int)].collect().head
    assert(one._2 > 0, "small input must leave zero registers")
    assert(one._1 > 3.0 && one._1 < 8.0, s"linear counting estimate ${one._1} for true 5")
  }

  test("hll merge is idempotent max: merged shard registers equal fresh registers") {
    val events = graft.sources.Tables.events(spark, sfDir)
    // shards by event id: the same user_id value lands in MANY shards,
    // so the merge must collapse duplicates (max), not add them
    val parts = (0 to 2).map(b =>
      Sketches.hllRegisters(events.filter(pmod(col("event_id"), lit(3)) === b),
        Seq("event_type"), "user_id", p = 4))
    val merged = Sketches.hllMerge(parts, Seq("event_type"))
    val fresh = Sketches.hllRegisters(events, Seq("event_type"), "user_id", p = 4)
    assert(merged.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(merged).count() === 0)
    // estimates therefore agree row for row
    val a = Sketches.hllEstimate(merged, Seq("event_type"), p = 4).collect().map(_.toString).sorted
    val b = Sketches.hllEstimate(fresh, Seq("event_type"), p = 4).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("hll estimate accepts a pre-hll_p synopsis as the caller's p") {
    // migration path: register stores persisted before hll_p existed have
    // no such column — the estimate assumes the caller's p (the contract
    // those stores were written under), range-checked, same answer as the
    // carried-p synopsis
    val events = graft.sources.Tables.events(spark, sfDir)
    val regs = Sketches.hllRegisters(events, Seq("event_type"), "user_id", p = 8)
    val legacy = regs.drop("hll_p")
    val a = Sketches.hllEstimate(regs, Seq("event_type"), p = 8)
      .collect().map(_.toString).sorted.toSeq
    val b = Sketches.hllEstimate(legacy, Seq("event_type"), p = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    // the range check still guards a legacy synopsis read at a wrong
    // SMALLER p (b >= 16 registers exist at p=8); the p=4 geometry
    // violation fails loudly rather than estimating garbage
    val ex = intercept[Exception] {
      Sketches.hllEstimate(legacy, Seq("event_type"), p = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("hll synopsis inconsistent with p=4")),
      s"unexpected failure: $ex")
  }

  test("hll estimate rejects a synopsis built with a different p") {
    val events = graft.sources.Tables.events(spark, sfDir)
    // p = 8 registers carry buckets up to 255; estimating them as a p = 4
    // synopsis (16 buckets) is geometric garbage and must FAIL, not
    // silently return a wrong estimate
    val regs = Sketches.hllRegisters(events, Seq("event_type"), "user_id", p = 8)
    val ex = intercept[Exception] {
      Sketches.hllEstimate(regs, Seq("event_type"), p = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("hll synopsis inconsistent with p=4")),
      s"unexpected failure: $ex")
    // the matching p still estimates fine through the guard
    assert(Sketches.hllEstimate(regs, Seq("event_type"), p = 8).count() > 0)

    // the OTHER direction: a p = 4 synopsis estimated at p = 8 passes
    // every per-register range bound (b < 16 < 256, m_reg ≤ 53 w.h.p.)
    // yet would count 240 phantom empty buckets — only the carried
    // hll_p identity catches it
    val low = Sketches.hllRegisters(events, Seq("event_type"), "user_id", p = 4)
    val ex2 = intercept[Exception] {
      Sketches.hllEstimate(low, Seq("event_type"), p = 8).collect()
    }
    assert(messages(ex2).exists(_.contains("hll synopsis inconsistent with p=8")),
      s"unexpected failure: $ex2")
    // and the merge carries the geometry through
    val merged = Sketches.hllMerge(Seq(low, low), Seq("event_type"))
    val ex3 = intercept[Exception] {
      Sketches.hllEstimate(merged, Seq("event_type"), p = 8).collect()
    }
    assert(messages(ex3).exists(_.contains("hll synopsis inconsistent with p=8")),
      s"unexpected failure: $ex3")
    // MIXED-p merge must fail loudly, not relabel: a max(hll_p) would
    // stamp every colliding bucket with the larger p and the estimate
    // guard would pass on garbage geometry. Which guard fires first is
    // row-order dependent (the merge's per-bucket mixed-p raise, or the
    // estimate's hll_p check on an uncollided minority-p bucket) — either
    // is the loud failure the law requires
    val ex4 = intercept[Exception] {
      Sketches.hllEstimate(
        Sketches.hllMerge(Seq(low, regs), Seq("event_type")),
        Seq("event_type"), p = 8).collect()
    }
    assert(messages(ex4).exists(m =>
      m.contains("hllMerge: synopses built with different p") ||
        m.contains("hll synopsis inconsistent with p=8")),
      s"unexpected failure: $ex4")
  }

  test("hll registers are invariant under repartitioning") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val a = Sketches.hllRegisters(events, Seq("event_type"), "user_id", p = 6)
      .collect().map(_.toString).sorted
    val b = Sketches.hllRegisters(events.repartition(7), Seq("event_type"), "user_id", p = 6)
      .collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("quantile synopsis merge is a lossless semilattice: merged ≡ single-pass, idempotent") {
    val ord = graft.sources.Tables.orders(spark, sfDir)
    val single = Sketches.quantileSynopsis(ord, "o_orderkey", "o_totalprice", k = 64)
    val parts = (0 to 3).map(b =>
      Sketches.quantileSynopsis(ord.filter(pmod($"o_orderkey", lit(4)) === b),
        "o_orderkey", "o_totalprice", k = 64))
    val merged = Sketches.quantileMerge(parts, k = 64)
    assert(merged.exceptAll(single).count() === 0 &&
      single.exceptAll(merged).count() === 0,
      "merge of per-shard synopses must equal the whole-corpus synopsis")
    // idempotent (semilattice): re-merging an already-merged shard is a no-op
    val again = Sketches.quantileMerge(Seq(merged, parts.head), k = 64)
    assert(again.exceptAll(single).count() === 0 &&
      single.exceptAll(again).count() === 0)
    // and the estimates answer the fresh statement
    val e1 = Sketches.quantileEstimate(merged, Seq(0.5, 0.9), k = 64)
      .as[(Double, Double, Int)].collect().sorted.toSeq
    val e2 = Sketches.quantileEstimate(single, Seq(0.5, 0.9), k = 64)
      .as[(Double, Double, Int)].collect().sorted.toSeq
    assert(e1 === e2)
  }

  test("quantile estimate sits inside the DKW rank-error envelope vs the exact distribution") {
    // DKW at k = 256: eps = sqrt(ln(2/δ)/(2k)) ≈ 0.085 at δ = 0.05; the
    // sample is hash-deterministic so this either holds forever or fails
    // loudly — assert the documented bound with no slack games
    val ord = graft.sources.Tables.orders(spark, sfDir)
      .filter($"o_totalprice".isNotNull && $"o_orderkey".isNotNull)
    val n = ord.count().toDouble
    val syn = Sketches.quantileSynopsis(ord, "o_orderkey", "o_totalprice", k = 256)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val est = Sketches.quantileEstimate(syn, qs, k = 256)
      .select("q", "est_value").as[(Double, Double)].collect().toMap
    qs.foreach { q =>
      val v = est(q)
      val rank = ord.filter($"o_totalprice".cast("double") <= v).count() / n
      assert(math.abs(rank - q) <= 0.085,
        s"q=$q estimate $v has empirical rank $rank — outside the DKW envelope")
    }
  }

  test("quantile synopsis is exact below k and invariant under repartitioning") {
    val small = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (4L, 40.0)).toDF("id", "v")
    val est = Sketches.quantileEstimate(
      Sketches.quantileSynopsis(small, "id", "v", k = 64), Seq(0.0, 0.5, 1.0), k = 64)
      .select("q", "est_value").as[(Double, Double)].collect().toMap
    // 4 < k: the sample IS the data; lower-value convention on the sorted
    // values [10,20,30,40]: q=0.5 -> index floor(0.5*3)=1 -> 20
    assert(est(0.0) === 10.0 && est(0.5) === 20.0 && est(1.0) === 40.0)
    val ord = graft.sources.Tables.orders(spark, sfDir)
    val a = Sketches.quantileSynopsis(ord, "o_orderkey", "o_totalprice", k = 32)
      .collect().map(_.toString).sorted.toSeq
    val b = Sketches.quantileSynopsis(ord.repartition(7), "o_orderkey", "o_totalprice", k = 32)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("corpusReportSketched: counts and mean equal the exact report; percentiles in envelope") {
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val exact = TextAnalysis.corpusReport(docs, "text").collect()(0)
    val sk = TextAnalysis.corpusReportSketched(docs, "doc_id", "text", k = 256).collect()(0)
    assert(sk.getAs[Long]("n_docs") === exact.getAs[Long]("n_docs"))
    assert(sk.getAs[Long]("n_null") === exact.getAs[Long]("n_null"))
    assert(sk.getAs[Long]("n_empty") === exact.getAs[Long]("n_empty"))
    assert(sk.getAs[Double]("tokens_mean") === exact.getAs[Double]("tokens_mean"))
    // percentile envelope against the exact token-count distribution
    val counts = docs.select(TextAnalysis.tokenCount(col("text")).cast("double").as("c"))
      .filter($"c".isNotNull)
    val n = counts.count().toDouble
    Seq(0.5 -> "tokens_p50", 0.9 -> "tokens_p90").foreach { case (q, c) =>
      val v = sk.getAs[Double](c)
      val rank = counts.filter($"c" <= v).count() / n
      assert(math.abs(rank - q) <= 0.085, s"$c=$v rank $rank outside DKW envelope")
    }
    // null texts fold to NaN pairs the aggregator skips: the sample never
    // absorbs a null row, while the SAME single pass still counts it
    val tiny = Seq((1L, Some("a b c")), (2L, Some("d e")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val r = TextAnalysis.corpusReportSketched(tiny, "doc_id", "text", k = 256).collect()(0)
    assert(r.getAs[Long]("n_docs") === 3L && r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[Int]("n_sample") === 2, "the null row must not occupy a sample slot")
    // 2 < k: exact fallback — values [2,3], q=0.5 reads floor(0.5*1)=0 -> 2
    assert(r.getAs[Double]("tokens_p50") === 2.0)
  }
}
