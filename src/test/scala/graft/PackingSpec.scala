package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // one shard (ids all ≡ 0 mod 1) so the fill order is just id order
  private lazy val docs = Seq(
    (0L, "a b c d e f"),       // 6 tokens
    (1L, "g h i j k l"),       // 6 tokens -> closes pack 0 at 12 (overflow)
    (2L, "m n o"),             // 3 tokens -> pack 1
    (3L, "p q r s t u v w"),   // 8 tokens -> pack 1 closes at 17
    (4L, "x y")                // 2 tokens -> pack 1 (prev cum 17 >= 20? no: floor(17/10)=1)
  ).toDF("doc_id", "text")

  test("contiguous fill: pack closes when the running total crosses the budget") {
    val got = Packing.packSequences(docs, "doc_id", "text", budget = 10L, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_id", "pack_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 6L, 0L, 1L), // prev cum 0  -> pack 0
      (1L, 6L, 0L, 2L), // prev cum 6  -> pack 0 (overflows to 12)
      (2L, 3L, 1L, 1L), // prev cum 12 -> pack 1
      (3L, 8L, 1L, 2L), // prev cum 15 -> pack 1 (overflows to 23)
      (4L, 2L, 2L, 1L)  // prev cum 23 -> pack 2
    ))
  }

  test("every doc is assigned exactly once; oversized docs get their own pack") {
    val big = Seq((0L, Seq.fill(50)("w").mkString(" ")), (1L, "a b")).toDF("doc_id", "text")
    val got = Packing.packSequences(big, "doc_id", "text", budget = 10L, shards = 1)
    assert(got.count() === 2)
    val rows = got.orderBy("doc_id").select("pack_id").as[Long].collect().toSeq
    assert(rows === Seq(0L, 5L)) // giant doc fills packs 0..4's span; next opens at 5
  }

  test("packByCount over a precomputed count column equals the text form") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("tok_count",
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
    val byText = Packing.packSequences(corpus, "doc_id", "text", budget = 512L, shards = 8)
    val byCount = Packing.packByCount(corpus, "doc_id", col("tok_count"),
      budget = 512L, shards = 8)
    assert(byText.exceptAll(byCount).count() === 0)
    assert(byCount.exceptAll(byText).count() === 0)
  }

  test("shards are independent and assignment is repartition-stable") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Packing.packSequences(corpus, "doc_id", "text", budget = 512L, shards = 8)
    val b = Packing.packSequences(corpus.repartition(13), "doc_id", "text",
      budget = 512L, shards = 8)
    assert(a.exceptAll(b).count() === 0)
    assert(a.count() === corpus.count())
    assert(a.select("shard").distinct().count() === 8)
  }

  test("packGroups never splits a group; every row keeps its group's pack") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("grp", (col("doc_id") % 25).cast("long"))
    val got = Packing.packGroups(corpus, "doc_id", "grp",
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
      budget = 2048L, shards = 4)
    assert(got.count() === corpus.count())
    // group atomicity: one (shard, pack_id) per group
    val split = got.groupBy("grp")
      .agg(countDistinct(concat_ws("#", col("shard"), col("pack_id"))).as("n"))
      .filter($"n" > 1)
    assert(split.count() === 0)
    // deterministic under repartitioning
    val again = Packing.packGroups(corpus.repartition(13), "doc_id", "grp",
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
      budget = 2048L, shards = 4)
    assert(got.exceptAll(again).count() === 0)
  }

  test("packGroups keeps the NULL group: one row out per row in, same pack") {
    // a null group key is a real group: a plain using-join back to the
    // rows would silently drop every row of it, breaking the
    // one-row-per-input-row contract
    val df = Seq((1L, Some("a"), 10L), (2L, Option.empty[String], 10L),
      (3L, Option.empty[String], 10L), (4L, Some("b"), 10L))
      .toDF("doc_id", "grp", "n")
    val got = Packing.packGroups(df, "doc_id", "grp", col("n"), budget = 100L)
    assert(got.count() === 4)
    val nullRows = got.filter($"grp".isNull)
    assert(nullRows.count() === 2)
    // group atomicity holds for the null group too
    assert(nullRows.select("shard", "pack_id").distinct().count() === 1)
  }

  test("duplicate ids within a shard accumulate row-by-row, not as frame peers") {
    // RANGE framing would give both duplicate-id rows the SAME running
    // total (each includes the other), corrupting every later boundary
    val df = Seq((5L, 6L), (5L, 6L), (7L, 6L)).toDF("doc_id", "n")
    val got = Packing.packByCount(df, "doc_id", col("n"), budget = 10L, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().sorted.toSeq
    // running totals 6, 12, 18 -> preceding totals 0, 6, 12 -> packs 0, 0, 1
    assert(got === Seq((5L, 0L), (5L, 0L), (7L, 1L)))
  }

  test("pack summary: token totals conserve and fill ratios hover near 1") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val assign = Packing.packSequences(corpus, "doc_id", "text", budget = 512L, shards = 8)
    val summary = Packing.packSummary(assign, budget = 512L)
    val totalA = assign.agg(sum("n_tokens")).as[Long].head()
    val totalS = summary.agg(sum("tokens_total")).as[Long].head()
    assert(totalA === totalS)
    // all non-final packs are filled past the budget by construction;
    // just sanity-check the ratio column is populated and positive
    assert(summary.filter($"fill_ratio" <= 0).count() === 0)
  }
}
