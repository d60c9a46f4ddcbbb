package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("assignSplit covers every row, respects weights, and is deterministic") {
    val split = Sampling.assignSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1400 && counts("train") < 1800, s"train=${counts("train")}")
    assert(counts("val") > 100 && counts("val") < 320, s"val=${counts("val")}")
    assert(counts("test") > 100 && counts("test") < 320, s"test=${counts("test")}")
    // pure function of (id, salt): a repartitioned rerun assigns identically
    val again = Sampling.assignSplit(ids.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).count() === 0)
  }

  test("assignSplit re-draws under a different salt") {
    val a = Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
    val b = Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s2")
    assert(a.join(b, Seq("id")).filter(a("split") =!= b("split")).count() > 0)
  }

  test("sampleDeterministic keeps a stable subset near the fraction") {
    val s = Sampling.sampleDeterministic(ids, "id", 0.25)
    val n = s.count()
    assert(n > 380 && n < 620, s"n=$n")
    assert(s.exceptAll(Sampling.sampleDeterministic(ids.repartition(7), "id", 0.25)).count() === 0)
  }

  test("sampleStratified applies per-stratum fractions and drops unlisted strata") {
    val rows = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val s = Sampling.sampleStratified(rows, "id", "stratum", Map("a" -> 1.0, "b" -> 0.2))
    val counts = s.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts("a") === 666L)             // fraction 1.0 keeps every row
    assert(counts("b") > 60 && counts("b") < 210, s"b=${counts("b")}")
    assert(!counts.contains("c"))            // unlisted stratum dropped
  }

  test("null ids get a null split, never a silent bucket; oversubscribed weights are rejected") {
    val withNull = ids.unionByName(Seq(Option.empty[Long]).toDF("id"))
    val split = Sampling.assignSplit(withNull, "id", Seq("train" -> 0.8, "test" -> 0.2))
    assert(split.filter(col("id").isNull).select("split").head.isNullAt(0))
    assert(split.filter(col("split").isNull).count() === 1)
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.3, "test" -> 0.1))
    }
  }

  test("weighted oversampling: floor copies unconditional, fractional copy ~frac, stable") {
    val w = Sampling.sampleWithWeight(ids, "id", 2.3)
    val n = ids.count()
    val byCopy = w.groupBy("copy").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCopy(0) === n && byCopy(1) === n) // full epochs
    assert(byCopy(2) > n * 0.2 && byCopy(2) < n * 0.4) // ~0.3 draw
    // deterministic and repartition-stable
    val again = Sampling.sampleWithWeight(ids.repartition(7), "id", 2.3)
    assert(w.exceptAll(again).count() === 0)
    assert(again.exceptAll(w).count() === 0)
    // weight 1.0 = identity with copy 0; weight 0 = empty
    assert(Sampling.sampleWithWeight(ids, "id", 1.0).count() === n)
    assert(Sampling.sampleWithWeight(ids, "id", 0.0).count() === 0)
  }

  test("sampleToBudget: shares track targets, caps at 1, drops unweighted groups") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars")
    val weights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
    val got = Sampling.sampleToBudget(docs, "doc_id", "source", "n_chars",
      budget = 10000.0, weights)
    // only weighted sources survive
    val srcs = got.select("source").distinct().as[String].collect().toSet
    assert(srcs.subsetOf(weights.map(_._1).toSet) && srcs.nonEmpty)
    // membership is exactly u < min(1, target/total), recomputed by hand
    val totals = docs.filter(col("source").isin(weights.map(_._1): _*))
      .groupBy("source").agg(sum("n_chars").cast("double").as("total"))
      .as[(String, Double)].collect().toMap
    val targets = Sampling.budgetTargets(10000.0, weights).toMap
    val expected = docs.filter(col("source").isin(weights.map(_._1): _*))
      .withColumn("u", Sampling.hashUniform(col("doc_id"), "mixture"))
      .as[(Long, String, Long, Double)].collect()
      .filter { case (_, src, _, u) => u < math.min(1.0, targets(src) / totals(src)) }
      .map { case (id, src, nc, _) => (id, src, nc) }.toSet
    assert(got.as[(Long, String, Long)].collect().toSet === expected)
    assert(expected.nonEmpty)
    // a budget beyond every total keeps every weighted row (fraction 1)
    val all = Sampling.sampleToBudget(docs, "doc_id", "source", "n_chars",
      budget = 1e9, weights)
    assert(all.count() ===
      docs.filter(col("source").isin(weights.map(_._1): _*)).count())
    // repartition-stable
    val again = Sampling.sampleToBudget(docs.repartition(17), "doc_id",
      "source", "n_chars", budget = 10000.0, weights)
    assert(again.as[(Long, String, Long)].collect().toSet === expected)
  }

  test("grouped split keeps all rows of a group in one split (leakage safety)") {
    val rows = ids.withColumn("group_id", col("id") % 50)
    val split = Sampling.assignSplit(rows, "group_id", Seq("train" -> 0.7, "test" -> 0.3))
    val violations = split.groupBy("group_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(violations === 0)
  }

  test("capPerGroup keeps the hash-minimal rows per group, repartition-stable") {
    // skewed groups: group g has 10*(g+1) members
    val rows = (0 until 4).flatMap(g => (0 until 10 * (g + 1)).map(i => (g * 1000L + i, g)))
      .toDF("id", "g")
    val capped = Sampling.capPerGroup(rows, "id", "g", maxPerGroup = 12)
    // brute-force election: 12 smallest (hashUniform, id) per group
    val expected = rows
      .withColumn("u", Sampling.hashUniform(col("id"), "cap"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("u"), col("id"))))
      .filter(col("rn") <= 12)
      .select("id", "g").as[(Long, Int)].collect().toSet
    assert(capped.as[(Long, Int)].collect().toSet === expected)
    // under-cap groups survive whole: group 0 has 10 <= 12 members
    assert(capped.filter(col("g") === 0).count() === 10)
    // layout-independent: same survivors from a different partitioning
    val again = Sampling.capPerGroup(rows.repartition(13), "id", "g", maxPerGroup = 12)
    assert(again.as[(Long, Int)].collect().toSet === expected)
  }

  test("sampleByScoreBand: bands partition by cutpoints, rates steer keeps, stable") {
    // ids 0..899 with score = id: bands should be ~equal thirds
    val rows = (0L until 900L).toDF("id").withColumn("score", col("id").cast("double"))
    val out = Sampling.sampleByScoreBand(rows, "id", "score",
      fractions = Seq(0.0, 0.5, 1.0), k = 256)
    val byBand = out.groupBy("band").count().as[(Int, Long)].collect().toMap
    // band 0 kept at 0.0 -> absent; band 2 kept fully -> ~300 rows
    assert(!byBand.contains(0))
    assert(byBand(2) > 250 && byBand(2) < 350)
    assert(byBand(1) > 90 && byBand(1) < 210) // ~300 * 0.5
    // banding is monotone in score: every kept band-2 score > every kept band-1
    val maxB1 = out.filter(col("band") === 1).agg(max("score")).head.getDouble(0)
    val minB2 = out.filter(col("band") === 2).agg(min("score")).head.getDouble(0)
    assert(maxB1 < minB2)
    // repartition-stable
    val again = Sampling.sampleByScoreBand(rows.repartition(11), "id", "score",
      fractions = Seq(0.0, 0.5, 1.0), k = 256)
    assert(again.select("id", "band").as[(Long, Int)].collect().toSet ===
      out.select("id", "band").as[(Long, Int)].collect().toSet)
    // single band degenerates to plain deterministic Bernoulli
    val one = Sampling.sampleByScoreBand(rows, "id", "score", fractions = Seq(1.0))
    assert(one.count() === 900)
  }

  test("capPerGroup drops null ids and caps the null group like any other") {
    val rows = Seq((Some(1L), "a"), (Some(2L), "a"), (Some(3L), "a"),
      (None, "a"), (Some(4L), null), (Some(5L), null), (Some(6L), null))
      .toDF("id", "g")
    val capped = Sampling.capPerGroup(rows, "id", "g", maxPerGroup = 2)
    val byGroup = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byGroup("a") === 2)          // null id never elected
    assert(byGroup(null) === 2)         // null group capped, not dropped
  }

  test("capPerGroup: a duplicate id elected in one group cannot leak into another") {
    // contract violation on purpose: id 7 appears in groups a AND b. Whatever
    // happens inside its own groups, electing 7 in group a must never
    // resurrect a capped-out id-7 row of group b — the semi-join keys on
    // (group, id), not id alone.
    val rows = Seq((7L, "a"), (1L, "a"), (2L, "a"),
      (7L, "b"), (3L, "b"), (4L, "b"), (5L, "b"), (6L, "b"))
      .toDF("id", "g")
    val capped = Sampling.capPerGroup(rows, "id", "g", maxPerGroup = 1)
    val byGroup = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byGroup("a") === 1, s"group a over cap: $byGroup")
    assert(byGroup("b") === 1, s"group b over cap: $byGroup")
  }

  test("sampleByScoreBand: empty input yields empty output, NaN scores drop") {
    // empty input: the cut derivation must not index into the empty
    // bottom-k sample (element_at throws unconditionally on index 0)
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(Sampling.sampleByScoreBand(empty, "id", "score",
      Seq(0.5, 0.9)).count() === 0)
    // NaN compares greater than every double -> it would land in the TOP
    // band and be kept at the highest rate; it must drop with the nulls
    val dirty = Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN), (4L, 3.0))
      .toDF("id", "score")
    val got = Sampling.sampleByScoreBand(dirty, "id", "score", Seq(1.0, 1.0))
    assert(!got.select("id").as[Long].collect().contains(3L))
  }

  test("shufflePositions: contiguous permutation, repartition-stable, salt-sensitive") {
    val rows = spark.range(0, 500).select(col("id"), (col("id") * 3).as("payload"))
    val got = Sampling.shufflePositions(rows, "id", "epoch1")
    // a contiguous 0-based permutation, payload carried through
    assert(got.count() === 500)
    assert(got.select("shuffle_pos").as[Long].collect().sorted.toSeq === (0L until 500L))
    assert(got.filter(col("payload") =!= col("id") * 3).count() === 0)
    // pure function of (id, salt): any input partitioning gives the order
    val again = Sampling.shufflePositions(rows.repartition(13), "id", "epoch1")
      .select("id", "shuffle_pos")
    assert(again.exceptAll(got.select("id", "shuffle_pos")).count() === 0)
    // a new salt is a fresh epoch order
    val other = Sampling.shufflePositions(rows, "id", "epoch2").select("id", "shuffle_pos")
    assert(other.exceptAll(got.select("id", "shuffle_pos")).count() > 0)
    // and it is genuinely shuffled, not identity order
    assert(got.filter(col("id") === col("shuffle_pos")).count() < 50)
  }
}
