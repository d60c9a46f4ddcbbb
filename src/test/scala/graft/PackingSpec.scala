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

  test("packBestFit: hand vector — fullest feasible bin wins, ties take the smaller bin") {
    // one shard; processing order (tokens desc, id): 9, 8, 6, 5a, 5b, 2
    val df = Seq(
      (0L, 9L), (1L, 8L), (2L, 6L), (3L, 5L), (4L, 5L), (5L, 2L)
    ).toDF("doc_id", "n")
    val got = Packing.packBestFit(df, "doc_id", col("n"), budget = 10L, shards = 1)
      .select("doc_id", "n_tokens", "pack_id", "pack_pos")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 9 -> bin0 (new); 8 -> bin1 (bin0 at 9 infeasible); 6 -> bin2;
    // 5 -> bins at 9,8,6: feasible ≤5 remaining? 10-5=5 -> floor fill 5:
    //      none ≤5... fills are 9,8,6 -> none ≤ 5 -> bin3 (new);
    // 5 -> fills 9,8,6,5: feasible fill ≤ 5 -> bin3 (fill 5) wins -> 10;
    // 2 -> capacity 8: fills 9,8,6,10 -> fullest ≤8 is 8 (bin1) -> 10
    assert(got === Seq(
      (0L, 9L, 0L, 1L), (1L, 8L, 1L, 1L), (2L, 6L, 2L, 1L),
      (3L, 5L, 3L, 1L), (4L, 5L, 3L, 2L), (5L, 2L, 1L, 2L)))
    // tie case: two bins at the same fill — the smaller bin id wins
    val tie = Seq((0L, 5L), (1L, 5L), (2L, 4L))
      .toDF("doc_id", "n")
    val got2 = Packing.packBestFit(tie, "doc_id", col("n"), budget = 9L, shards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // 5 -> bin0; 5 -> bin1 (bin0 infeasible: 5+5>9); 4 -> both at 5, min id
    assert(got2 === Seq((0L, 0L), (1L, 1L), (2L, 0L)))
  }

  test("packBestFit: conserves tokens, respects the budget, oversized docs isolate") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val tokCount = graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
    val bfd = Packing.packBestFit(corpus, "doc_id", tokCount, budget = 512L, shards = 8)
    assert(bfd.count() === corpus.count(), "exactly one row per document")
    val seqp = Packing.packSequences(corpus, "doc_id", "text", budget = 512L, shards = 8)
    assert(bfd.agg(sum("n_tokens")).as[Long].head() ===
      seqp.agg(sum("n_tokens")).as[Long].head(), "token conservation")
    // hard budget: a pack over the budget must be an oversized singleton
    val over = bfd.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 512 && col("n") > 1)
    assert(over.count() === 0, "no multi-doc pack exceeds the budget")
  }

  test("packGroupsBestFit: group-atomic BFD, null group kept, hand vector") {
    // group totals 9, 8, 6, 5, 5, 2 — the row-form hand vector at group
    // level, incl. a two-row group (atomicity) and a NULL group
    val df = Seq(
      (0L, Some(0L), 4L), (1L, Some(0L), 5L), // grp 0: total 9, key 0
      (10L, Some(1L), 8L),                    // grp 1: total 8
      (20L, Some(2L), 6L),
      (30L, Some(3L), 5L),
      (40L, Some(4L), 5L),
      (50L, Option.empty[Long], 2L)           // NULL group: total 2, key 50
    ).toDF("doc_id", "grp", "n")
    val got = Packing.packGroupsBestFit(df, "doc_id", "grp", col("n"),
      budget = 10L, shards = 1)
      .select("doc_id", "pack_id", "pack_pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // BFD over totals: 9->bin0, 8->bin1, 6->bin2, 5->bin3, 5->bin3(10),
    // 2->bin1(10); both grp-0 rows share bin 0, the null group lands bin 1.
    // pack_pos = the GROUP's assignment order in its pack (row-form
    // contract at group level): grp 4 is bin 3's 2nd, null grp is bin 1's
    // 2nd, every first occupant is 1 — both grp-0 ROWS share pos 1
    assert(got === Seq((0L, 0L, 1L), (1L, 0L, 1L), (10L, 1L, 1L),
      (20L, 2L, 1L), (30L, 3L, 1L), (40L, 3L, 2L), (50L, 1L, 2L)))
    // corpus: atomicity + one row per input + repartition stability
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("grp", (col("doc_id") % 25).cast("long"))
    val tok = graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
    val big = Packing.packGroupsBestFit(corpus, "doc_id", "grp", tok,
      budget = 2048L, shards = 4)
    assert(big.count() === corpus.count())
    assert(big.groupBy("grp")
      .agg(countDistinct(concat_ws("#", col("shard"), col("pack_id"))).as("n"))
      .filter($"n" > 1).count() === 0, "a group never splits across packs")
    val again = Packing.packGroupsBestFit(corpus.repartition(13), "doc_id", "grp",
      tok, budget = 2048L, shards = 4)
    assert(big.exceptAll(again).count() === 0 && again.exceptAll(big).count() === 0)
  }

  test("packGroupsBestFit: non-integral id refused; all-null-id group packs in the null shard") {
    // the packBestFit boundary guard, not a deep-plan NPE: a string id
    // would null every grp_key % shards and explode inside mapPartitions
    val bad = Seq(("a", 0L, 5L)).toDF("doc_id", "grp", "n")
    val e = intercept[IllegalArgumentException] {
      Packing.packGroupsBestFit(bad, "doc_id", "grp", col("n"), budget = 10L)
    }
    assert(e.getMessage.contains("integral"))
    // integral ids that are ALL null within a group: grp_key (min id) is
    // null, so the group's shard is null — it must pack deterministically
    // there (the packGroups tolerance), not NPE in the state machine
    val withNulls = Seq(
      (Some(0L), 0L, 4L), (Some(1L), 0L, 5L),
      (Option.empty[Long], 7L, 3L), (Option.empty[Long], 7L, 2L)
    ).toDF("doc_id", "grp", "n")
    val out = Packing.packGroupsBestFit(withNulls, "doc_id", "grp", col("n"),
      budget = 10L, shards = 2)
    assert(out.count() === 4, "one output row per input row")
    val nullShard = out.filter($"grp" === 7L)
      .select("shard", "pack_id", "pack_pos")
      .as[(Option[Long], Long, Long)].collect().toSeq
    assert(nullShard === Seq((None, 0L, 1L), (None, 0L, 1L)),
      "the all-null-id group lands whole in the null shard's first bin")
  }

  test("packBestFit: no more bins than budget-respecting next-fit; repartition-stable") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val tokCount = graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
    val budget = 512L
    val bfd = Packing.packBestFit(corpus, "doc_id", tokCount, budget, shards = 8)
    val binsBfd = bfd.select("shard", "pack_id").distinct().count()
    // reference baseline computed driver-side: budget-RESPECTING next-fit
    // in the same (tokens desc, id) order — close the bin when the next
    // doc does not fit. (packSequences is NOT comparable: its contiguous
    // fill packs "tighter" only by overflowing packs past the budget.)
    val perShard = bfd.select("shard", "n_tokens")
      .as[(Long, Long)].collect().groupBy(_._1)
    val binsNextFit = perShard.values.map { rows =>
      val desc = rows.map(_._2).sorted(Ordering[Long].reverse)
      var bins = 0L; var fill = budget + 1 // force-open on first doc
      desc.foreach { t =>
        if (fill + t > budget) { bins += 1; fill = t } else fill += t
      }
      bins
    }.sum
    assert(binsBfd <= binsNextFit,
      s"best-fit must not waste more bins than next-fit: $binsBfd vs $binsNextFit")
    // a theoretical floor, and determinism under a different input layout
    val floor = bfd.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select(ceil(col("t").cast("double") / budget)).as[Long].collect().sum
    assert(binsBfd >= floor)
    val again = Packing.packBestFit(corpus.repartition(13), "doc_id", tokCount,
      budget, shards = 8)
    assert(bfd.exceptAll(again).count() === 0 && again.exceptAll(bfd).count() === 0,
      "assignment is a pure function of (ids, counts, budget, shards)")
  }
}
