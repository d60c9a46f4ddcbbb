package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Decontamination, Dedup, Sampling, TextAnalysis}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val train = docs.filter($"doc_id" % 20 =!= 0)
  private lazy val bench = docs.filter($"doc_id" % 20 === 0)

  test("curate equals the hand-composed stage chain") {
    // shingleN = 3 matches the hand chain below; the API default is the
    // production 13-gram recipe
    val got = Curation.curate(train, bench, "doc_id", "text", shingleN = 3)
    val qualityIds = TextAnalysis.gopherishFlags(train, "doc_id", "text")
      .filter($"keep").select("doc_id")
    val kept = train.join(qualityIds, Seq("doc_id"), "left_semi")
    val dedupIds = kept
      .withColumn("h", graft.functions.HashColumns.hashExpr(Seq($"text")))
      .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
    val deduped = kept.join(dedupIds, Seq("doc_id"), "left_semi")
    val clean = Decontamination.decontaminate(deduped, bench, "doc_id", "text", 3, 1L)
    val expected = Sampling.assignSplit(clean.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("url gate removes exactly blocked-host and url-less docs, before any text pass") {
    val urls = train.select($"doc_id",
      concat(lit("https://"),
        when($"doc_id" % 11 === 0, lit("ads.")).otherwise(lit("")),
        lit("site"), pmod($"doc_id", lit(37)).cast("string"),
        lit(".example.com/d/"), $"doc_id".cast("string")).as("url"))
      .filter($"doc_id" % 13 =!= 0) // every 13th doc has NO url row
    val rules = Seq("site5.example.com", "*.site7.example.com").toDF("rule")
    val got = Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
      urlGate = Some((urls, "url", rules)))
    // the gate's semantics re-derived as plain id arithmetic: url-less
    // (every 13th), exact rule (non-ads host site5), wildcard rule (the
    // ads. proper subdomain of site7)
    val blockedOrUrlless = ($"doc_id" % 13 === 0) ||
      (($"doc_id" % 11 =!= 0) && ($"doc_id" % 37 === 5)) ||
      (($"doc_id" % 11 === 0) && ($"doc_id" % 37 === 7))
    val expected = Curation.curate(
      train.filter(!blockedOrUrlless), bench, "doc_id", "text", shingleN = 3)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("quality-model gate equals the hand-applied score filter over the same metrics") {
    import graft.registry.Helpers.{qualityWeights, qualityBias, qualityMinScore}
    val got = Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
      qualityModel = Some((qualityWeights, qualityBias, qualityMinScore)))
    val scored = TextAnalysis.gopherishFlags(train, "doc_id", "text")
      .filter($"keep")
      .filter(TextAnalysis.qualityScoreExpr(qualityWeights, qualityBias)
        >= qualityMinScore)
      .select("doc_id")
    val expected = Curation.curate(
      train.join(scored, Seq("doc_id"), "left_semi"),
      bench, "doc_id", "text", shingleN = 3)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("curate rejects staged pairs without the near-dup stage enabled") {
    // nearDupPairs is only consumed by the nearDup stage; supplying it
    // alone must fail loudly instead of silently skipping near-dup
    val staged = Seq((1L, 2L)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      Curation.curate(train, bench, "doc_id", "text", nearDupPairs = Some(staged))
    }
    assert(ex.getMessage.contains("nearDupPairs requires nearDup"))
  }

  test("language gate only removes rows, and exactly the non-English ones") {
    val gated = Curation.curate(train, bench, "doc_id", "text",
      languages = Some(Set("en")))
    val ungated = Curation.curate(train, bench, "doc_id", "text")
    // gated ⊆ ungated: the gate is one more filter, never adds rows
    assert(gated.join(ungated, Seq("doc_id"), "left_anti").count() === 0)
    // every dropped survivor is exactly a non-en doc
    val dropped = ungated.join(gated, Seq("doc_id"), "left_anti").select("doc_id")
    val nonEn = TextAnalysis.languageId(train, "doc_id", "text")
      .filter($"lang" =!= "en").select("doc_id")
    assert(dropped.exceptAll(dropped.join(nonEn, Seq("doc_id"), "left_semi")).count() === 0)
    // and no surviving doc is non-en
    assert(gated.join(nonEn, Seq("doc_id"), "left_semi").count() === 0)
  }

  test("near-dup stage drops exactly the non-canonical cluster members") {
    val withStage = Curation.curate(train, bench, "doc_id", "text",
      nearDup = Some((16, 2)))
    val without = Curation.curate(train, bench, "doc_id", "text")
    // the stage can only remove rows, and every removed doc must be a
    // non-minimum member of some simhash cluster over the deduped set
    assert(withStage.count() <= without.count())
    assert(withStage.join(without, Seq("doc_id"), "left_anti").count() === 0)
    val removed = without.join(withStage, Seq("doc_id"), "left_anti").select("doc_id")
    if (removed.count() > 0) {
      val losers = Dedup.duplicateClusters(
          Dedup.simhashNearDuplicates(train, "doc_id", "text", 16, 2))
        .filter($"id" =!= $"cluster_id").select($"id".as("doc_id"))
      assert(removed.join(losers, Seq("doc_id"), "left_semi").count() === removed.count())
    }
  }

  test("precomputed-pairs near-dup stage equals the in-query computation") {
    // staged full-corpus pairs at a WIDER bound, filtered down — the
    // production shape (one pair store, many questions); must equal the
    // fresh per-stage computation exactly
    val staged = Dedup.simhashNearDuplicates(docs, "doc_id", "text", 16, 2)
      .filter($"hamming" <= 1)
    val fresh = Curation.curate(train, bench, "doc_id", "text", nearDup = Some((16, 1)))
    val fed = Curation.curate(train, bench, "doc_id", "text", nearDup = Some((16, 1)),
      nearDupPairs = Some(staged))
    assert(fed.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(fed).count() === 0)
  }

  test("media near-dup stage drops exactly the non-canonical phash cluster members") {
    val withStage = Curation.curate(train, bench, "doc_id", "text",
      mediaDup = Some((16, 2)))
    val without = Curation.curate(train, bench, "doc_id", "text")
    assert(withStage.count() <= without.count())
    assert(withStage.join(without, Seq("doc_id"), "left_anti").count() === 0)
    val removed = without.join(withStage, Seq("doc_id"), "left_anti").select("doc_id")
    if (removed.count() > 0) {
      val losers = Dedup.duplicateClusters(
          graft.operators.Multimodal.phashNearDuplicates(
            graft.operators.Multimodal.asMedia(train, "doc_id", "text"), 16, 2))
        .filter($"id" =!= $"cluster_id").select($"id".as("doc_id"))
      assert(removed.join(losers, Seq("doc_id"), "left_semi").count() === removed.count())
    }
  }

  test("precomputed-pairs media stage equals the in-query phash computation") {
    // staged FULL-CORPUS phash pairs fed into curate must equal the fresh
    // per-stage computation exactly — the media twin of the text staged-
    // pairs law (phash membership is per-document, so restriction to
    // survivors on both endpoints is exact)
    val staged = graft.operators.Multimodal.phashNearDuplicates(
      graft.operators.Multimodal.asMedia(docs, "doc_id", "text"), 16, 2)
    val fresh = Curation.curate(train, bench, "doc_id", "text", mediaDup = Some((16, 2)))
    val fed = Curation.curate(train, bench, "doc_id", "text", mediaDup = Some((16, 2)),
      mediaDupPairs = Some(staged))
    assert(fed.exceptAll(fresh).count() === 0)
    assert(fresh.exceptAll(fed).count() === 0)
    // and staged pairs without the stage enabled must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      Curation.curate(train, bench, "doc_id", "text", mediaDupPairs = Some(staged))
    }
    assert(ex.getMessage.contains("mediaDupPairs requires mediaDup"))
  }

  test("curateFromPrefix equals curate for every gate configuration") {
    // the staging law: every prefix column is a per-document fact, gates
    // select subsets, and subset-filtering commutes with per-document
    // facts — so the prefix path must be EQUAL, not approximately equal
    val weights = Seq(
      "mean_token_len" -> 0.4, "alpha_ratio" -> 2.5,
      "top_bigram_ratio" -> -3.0, "top_trigram_ratio" -> -2.0)
    val bias = -2.0
    val prefix = Curation.curatePrefix(train, bench, "doc_id", "text",
      shingleN = 3, minHits = 1L, qualityModel = Some((weights, bias))).persist()
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
        what: String): Unit =
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
        s"prefix path diverged from the fresh pipeline: $what")
    // plain
    same(Curation.curateFromPrefix(prefix, "doc_id"),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3), "plain")
    // url gate (incl. docs with NO url row dropping)
    val urls = train.select($"doc_id",
      concat(lit("https://"),
        when($"doc_id" % 11 === 0, lit("ads.")).otherwise(lit("")),
        lit("site"), pmod($"doc_id", lit(37)).cast("string"),
        lit(".example.com/d/"), $"doc_id".cast("string")).as("url"))
      .filter($"doc_id" % 13 =!= 0)
    val rules = Seq("site5.example.com", "*.site7.example.com").toDF("rule")
    same(
      Curation.curateFromPrefix(prefix, "doc_id",
        urlKeepIds = Some(graft.operators.Urls
          .filterBlockedHosts(urls, "doc_id", "url", rules).select("doc_id"))),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
        urlGate = Some((urls, "url", rules))), "url gate")
    // model gate
    same(
      Curation.curateFromPrefix(prefix, "doc_id", minScore = Some(0.5)),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
        qualityModel = Some((weights, bias, 0.5))), "model gate")
    // language gate
    same(
      Curation.curateFromPrefix(prefix, "doc_id", languages = Some(Set("en"))),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
        languages = Some(Set("en"))), "language gate")
    // near-dup election over staged pairs
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", 16, 2)
      .filter($"hamming" <= 1).persist()
    same(
      Curation.curateFromPrefix(prefix, "doc_id", nearDupPairs = Some(pairs)),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
        nearDup = Some((16, 1)), nearDupPairs = Some(pairs)), "near-dup election")
    // media election over staged pairs
    val mpairs = graft.operators.Multimodal.phashNearDuplicates(
      graft.operators.Multimodal.asMedia(docs, "doc_id", "text"), 16, 2).persist()
    same(
      Curation.curateFromPrefix(prefix, "doc_id", mediaDupPairs = Some(mpairs)),
      Curation.curate(train, bench, "doc_id", "text", shingleN = 3,
        mediaDup = Some((16, 2)), mediaDupPairs = Some(mpairs)), "media election")
    // a prefix staged WITHOUT the model carries NO q_score column (an
    // always-null column would let the gate silently drop every row),
    // so a model gate over it refuses loudly
    val bare = Curation.curatePrefix(train.limit(50), bench, "doc_id", "text",
      shingleN = 3)
    assert(!bare.columns.contains("q_score"))
    val ex = intercept[IllegalArgumentException] {
      Curation.curateFromPrefix(bare, "doc_id", minScore = Some(0.5))
    }
    assert(ex.getMessage.contains("quality model"))
    prefix.unpersist(); pairs.unpersist(); mpairs.unpersist()
  }

  test("each stage only removes rows; survivors carry a split") {
    val got = Curation.curate(train, bench, "doc_id", "text")
    assert(got.count() > 0)
    assert(got.count() <= train.count())
    assert(got.filter($"split".isNull).count() === 0)
    assert(got.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // no benchmark doc can survive into the output
    assert(got.join(bench, Seq("doc_id"), "left_semi").count() === 0)
  }
}
