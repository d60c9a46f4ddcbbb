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

  // ---- steady-state composed curation (curateIncremental) ----

  // diverse long fillers (every doc passes the quality gate); the near
  // twins are one-token mutations empirically verified to share an LSH
  // band with their original — deterministic forever under the fixed
  // md5 signature arithmetic, no LSH luck involved
  private val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
    "river bank while morning light settles on the tall grass and the birds call"
  private val fillerB = "a steady rain fell across the old town square as vendors " +
    "opened their stalls and the church bell counted out the early hours again"
  private val fillerC = "deep in the valley the farmers walked their fields checking " +
    "rows of young corn while clouds drifted slowly over the distant blue hills"
  private val fillerD = "under the harbor lights the fishing boats unloaded crates of " +
    "silver fish while gulls circled overhead and ropes creaked against the piers"
  private val fillerE = "seven lanterns hung along the narrow alley where cats watched " +
    "strangers pass and distant music drifted from an open doorway into the night air"
  private val fillerF = "inside the museum hall students sketched marble statues while " +
    "guides described ancient trade routes and sunlight streamed onto polished floors"

  private def incFixture = {
    val ingested = Seq(
      (1L, fillerA),
      (2L, fillerB)
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, fillerA),                              // exact tier: standing hit
      (11L, fillerB.replace("again", "anew")),     // near tier: standing band hit
      (12L, fillerC),                              // survivor: batch-novel class min
      (13L, fillerC.replace("hills", "peaks")),    // near tier: batch election cut
      (14L, fillerD),                              // url tier: canonical standing (doc 1's)
      (15L, fillerD),                              // url tier: intra-batch keep-min (10 wins)
      (16L, "tiny"),                               // quality gate cut
      (17L, fillerE),                              // blocklist cut (ads. host)
      (18L, fillerF)                               // decontamination cut (bench match)
    ).toDF("doc_id", "text")
    // url identity rides an EFFECTIVE id: 14 takes doc 1's whole url
    // (standing canonical), 15 takes doc 10's (intra-batch collision)
    val eid = when($"doc_id" === 14L, lit(1L))
      .when($"doc_id" === 15L, lit(10L)).otherwise($"doc_id")
    val urls = (ingested.select($"doc_id") unionByName batch.select($"doc_id"))
      .select($"doc_id", concat(lit("https://"),
        when($"doc_id" === 17L, lit("ads.")).otherwise(lit("")),
        lit("h"), pmod(eid, lit(5)).cast("string"),
        lit(".example.com/p/"), eid.cast("string")).as("url"))
    val bench2 = Seq((100L, fillerF)).toDF("doc_id", "text")
    val rules = Seq("*.example.org" /* no match */ ,
      "ads.h2.example.com").toDF("rule")
    (ingested, batch, urls, bench2, rules)
  }

  /** The corpus-wide composition curateIncremental's law references:
    * url blocklist + canonical keep-min → quality gate → exact keep-min
    * → banded bucket keep-min → decontaminate → split. */
  private def corpusTwin(corpus: org.apache.spark.sql.DataFrame,
      urls: org.apache.spark.sql.DataFrame,
      rules: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame) = {
    import graft.operators.Urls
    val unblocked = Urls.filterBlockedHosts(urls, "doc_id", "url", rules)
    val urlWinners = Urls.duplicateUrls(unblocked, "doc_id", "url")
      .select($"keep_id".as("doc_id"))
    val urlKept = corpus.join(urlWinners, Seq("doc_id"), "left_semi")
    val quality = TextAnalysis.gopherishFlags(urlKept, "doc_id", "text", keepText = true)
      .filter($"keep").select("doc_id", "text")
    val exactIds = quality
      .withColumn("h", graft.functions.HashColumns.hashExpr(Seq($"text")))
      .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
    val exact = quality.join(exactIds, Seq("doc_id"), "left_semi")
    val bandRows = Dedup.minhashBandIndex(exact, "doc_id", "text", 3, 8, 4)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
    val cut = bandRows.withColumn("m", min($"id").over(w))
      .filter($"id" =!= $"m").select($"id".as("doc_id")).distinct()
    val nearKept = exact.join(cut, Seq("doc_id"), "left_anti")
    val clean = Decontamination.decontaminate(nearKept, bench, "doc_id", "text", 3, 1L)
    Sampling.assignSplit(clean.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
  }

  test("curateIncremental: the incremental law, every tier firing") {
    val (ingested, batch, urls, bench2, rules) = incFixture
    val ingUrls = urls.join(ingested.select("doc_id"), Seq("doc_id"), "left_semi")
    val batchUrls = urls.join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
    // stores accumulate by the operator's own novelty outputs: batch 0 =
    // the ingested corpus against empty state
    val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, url = true, near = true), shingleN = 3,
      urlGate = Some((ingUrls, "url", rules)), nearDup = Some((3, 8, 4)))
    val state = Curation.CurationState(inc0.novelDigests,
      inc0.novelCanonical, inc0.novelBands)
    val inc = Curation.curateIncremental(batch, bench2, "doc_id", "text", state,
      shingleN = 3, urlGate = Some((batchUrls, "url", rules)),
      nearDup = Some((3, 8, 4)))
    val got = inc.survivors.as[(Long, String)].collect().toMap
    // the law: corpus-wide composition over ingested ∪ batch, restricted
    // to the batch (batch ids exceed ingested ids — the historization
    // convention every keep-min election rides)
    val full = corpusTwin(ingested.unionByName(batch), urls, rules, bench2)
      .filter($"doc_id" >= 10L).as[(Long, String)].collect().toMap
    assert(got === full, "incremental ≠ corpus-wide restricted to the batch")
    // every tier fired, each on its intended doc:
    val gotIds = got.keySet
    assert(!gotIds.contains(10L), "exact tier: standing content hash must cut")
    assert(!gotIds.contains(11L), "near tier: standing band occupancy must cut")
    assert(gotIds.contains(12L), "batch-novel near class keeps its min id")
    assert(!gotIds.contains(13L), "near tier: batch bucket election must cut")
    assert(!gotIds.contains(14L), "url tier: canonical standing with ingested 1")
    assert(!gotIds.contains(15L), "url tier: intra-batch canonical keep-min (10 wins)")
    assert(!gotIds.contains(16L), "quality gate cut")
    assert(!gotIds.contains(17L), "blocklist: ads.h2.example.com is cut")
    assert(!gotIds.contains(18L), "decontamination: the bench-matching doc is cut")
    assert(gotIds === Set(12L))
  }

  test("curateIncremental: re-delivery ingests nothing once novelty is appended") {
    val (ingested, batch, urls, bench2, rules) = incFixture
    val ingUrls = urls.join(ingested.select("doc_id"), Seq("doc_id"), "left_semi")
    val batchUrls = urls.join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
    val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, url = true, near = true), shingleN = 3,
      urlGate = Some((ingUrls, "url", rules)), nearDup = Some((3, 8, 4)))
    val state1 = Curation.CurationState(inc0.novelDigests,
      inc0.novelCanonical, inc0.novelBands)
    val inc1 = Curation.curateIncremental(batch, bench2, "doc_id", "text", state1,
      shingleN = 3, urlGate = Some((batchUrls, "url", rules)),
      nearDup = Some((3, 8, 4)))
    val state2 = Curation.CurationState(
      state1.knownDigests.unionByName(inc1.novelDigests),
      Some(state1.knownCanonical.get.unionByName(inc1.novelCanonical.get)),
      Some(state1.bandIndex.get.unionByName(inc1.novelBands.get)))
    val again = Curation.curateIncremental(batch, bench2, "doc_id", "text", state2,
      shingleN = 3, urlGate = Some((batchUrls, "url", rules)),
      nearDup = Some((3, 8, 4)))
    assert(again.survivors.count() === 0, "a re-delivered batch must not survive")
    assert(again.novelCanonical.get.count() === 0, "re-delivery appends no canonicals")
    assert(again.novelDigests.count() === 0, "re-delivery appends no digests")
    assert(again.novelBands.get.count() === 0, "re-delivery appends no bands")
  }

  test("curateIncremental plan: store probes are hash joins, bench broadcasts, no corpus re-read") {
    val (ingested, batch, urls, bench2, rules) = incFixture
    val batchUrls = urls.join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
    val state = Curation.CurationState(
      Seq("00" * 16).toDF("content_hash"),
      Some(Seq("https://x.example.com/1").toDF("canonical_url")),
      Some(Seq((1L, 0, 7L)).toDF("id", "band", "key")))
    val inc = Curation.curateIncremental(batch, bench2, "doc_id", "text", state,
      shingleN = 3, urlGate = Some((batchUrls, "url", rules)),
      nearDup = Some((3, 8, 4)))
    val plan = inc.survivors.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "no election may degrade to a cartesian")
    spark.catalog.clearCache()
  }

  test("curateIncremental refuses a tier without its standing store") {
    val (ingested, batch, urls, bench2, rules) = incFixture
    intercept[IllegalArgumentException] {
      Curation.curateIncremental(batch, bench2, "doc_id", "text",
        Curation.emptyState(spark), shingleN = 3,
        nearDup = Some((3, 8, 4)))
    }
    intercept[IllegalArgumentException] {
      Curation.curateIncremental(batch, bench2, "doc_id", "text",
        Curation.emptyState(spark), shingleN = 3,
        urlGate = Some((urls, "url", rules)))
    }
  }

  /** Standing state over ingested docs 1 and 2 (the incFixture corpus),
    * plus the pieces the takedown tests reuse. */
  private def takedownFixture = {
    val (ingested, _, urls, bench2, rules) = incFixture
    val ingUrls = urls.join(ingested.select("doc_id"), Seq("doc_id"), "left_semi")
    val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, url = true, near = true), shingleN = 3,
      urlGate = Some((ingUrls, "url", rules)), nearDup = Some((3, 8, 4)))
    val state = Curation.CurationState(inc0.novelDigests,
      inc0.novelCanonical, inc0.novelBands)
    (state, urls, bench2, rules)
  }

  test("curateStateTakedown: removed keys leave every store, retained keys stay") {
    val (state, urls, _, _) = takedownFixture
    val removed = Seq((1L, fillerA)).toDF("doc_id", "text")
    val purged = Curation.curateStateTakedown(state, removed, "doc_id", "text",
      removedUrls = Some((urls.filter($"doc_id" === 1L), "url")))
    val hashOf = (t: String) => Seq(t).toDF("text")
      .select(graft.functions.HashColumns.hashExpr(Seq($"text")).as("h"))
      .as[String].head()
    val digests = purged.knownDigests.as[String].collect().toSet
    assert(!digests.contains(hashOf(fillerA)), "removed digest must be gone")
    assert(digests === Set(hashOf(fillerB)), "retained digest must stay")
    val canon = purged.knownCanonical.get.as[String].collect().toSet
    assert(canon === Set("https://h2.example.com/p/2"),
      "only the retained doc's canonical survives")
    val bands = purged.bandIndex.get.select($"id").distinct().as[Long].collect().toSet
    assert(bands === Set(2L), "band rows purge by id")
    assert(purged.bandIndex.get.count() ===
      state.bandIndex.get.filter($"id" === 2L).count())
  }

  test("takedown restores novelty: removed content re-ingests, retained stays cut") {
    val (state, _, bench2, rules) = takedownFixture
    val removed = Seq((1L, fillerA)).toDF("doc_id", "text")
    val removedUrls = Seq((1L, "https://h1.example.com/p/1")).toDF("doc_id", "url")
    val batch = Seq(
      (10L, fillerA),  // exact copy of the REMOVED doc 1 — must re-ingest
      (11L, fillerC),  // novel text on the removed doc's URL — must re-ingest
      (12L, fillerB)   // exact copy of the RETAINED doc 2 — must stay cut
    ).toDF("doc_id", "text")
    val batchUrls = Seq(
      (10L, "https://h0.example.com/p/10"),
      (11L, "https://h1.example.com/p/1"),
      (12L, "https://h2.example.com/p/12")).toDF("doc_id", "url")
    def run(st: Curation.CurationState) =
      Curation.curateIncremental(batch, bench2, "doc_id", "text", st,
        shingleN = 3, urlGate = Some((batchUrls, "url", rules)),
        nearDup = Some((3, 8, 4)))
        .survivors.select("doc_id").as[Long].collect().toSet
    assert(run(state) === Set.empty,
      "pre-takedown every batch doc hits a standing key")
    val purged = Curation.curateStateTakedown(state, removed, "doc_id", "text",
      removedUrls = Some((removedUrls, "url")))
    assert(run(purged) === Set(10L, 11L),
      "takedown must re-open exactly the removed doc's classes")
  }

  test("takedown is idempotent and ignores never-stored keys") {
    val (state, _, _, _) = takedownFixture
    val ghost = Seq((999L, "content that was never ingested")).toDF("doc_id", "text")
    val ghostUrls = Seq((999L, "https://nowhere.example.com/x")).toDF("doc_id", "url")
    val purged = Curation.curateStateTakedown(state, ghost, "doc_id", "text",
      removedUrls = Some((ghostUrls, "url")))
    assert(purged.knownDigests.as[String].collect().toSet ===
      state.knownDigests.as[String].collect().toSet)
    assert(purged.knownCanonical.get.as[String].collect().toSet ===
      state.knownCanonical.get.as[String].collect().toSet)
    assert(purged.bandIndex.get.count() === state.bandIndex.get.count())
    // re-running a real takedown converges on the same stores
    val removed = Seq((1L, fillerA)).toDF("doc_id", "text")
    val once = Curation.curateStateTakedown(state, removed, "doc_id", "text")
    val twice = Curation.curateStateTakedown(once, removed, "doc_id", "text")
    assert(once.knownDigests.as[String].collect().toSet ===
      twice.knownDigests.as[String].collect().toSet)
    // no removedUrls -> the canonical store is left untouched
    assert(once.knownCanonical.get.as[String].collect().toSet ===
      state.knownCanonical.get.as[String].collect().toSet)
  }

  // ---- the TRANSITIVE (nearCc) near tier ----
  //
  // Chain geometry, measured once and pinned (64-bit token simhash):
  // B = chainA with token 4 changed (hamming 5), C = the SAME bag of
  // tokens as B-with-token-14-changed but REVERSED (token simhash is
  // order-insensitive: hamming(B, C) = 7; hamming(A, C) = 12), C2 = C
  // with one more pre-reversal change (hamming(C, C2) = 3,
  // hamming(A, C2) = 15, hamming(B, C2) = 10). At maxHamming = 8 the
  // pair graph is exactly the chain A–B–C–C2: no shortcut edges, so
  // only a TRANSITIVE election can see that C/C2 duplicate A. The
  // reversal also makes C's 3-gram shingles disjoint from A's and B's —
  // the banded tier's blind spot the divergence test pins.
  private val chainA = ("river stones gathered along the quiet valley floor " +
    "where morning light touched tall grass and distant farms woke slowly " +
    "under pale clouds").split(" ")
  private val chainB = chainA.updated(4, "narrow").mkString(" ")
  private val chainC = chainA.updated(4, "narrow").updated(14, "narrow")
    .reverse.mkString(" ")
  private val chainC2 = chainA.updated(4, "narrow").updated(14, "narrow")
    .updated(9, "golden").reverse.mkString(" ")

  private def ccFixture = {
    val ingested = Seq((1L, fillerA), (2L, chainA.mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, fillerA),   // exact tier: standing hit
      (20L, chainB),    // cc tier: direct pair with standing 2
      (21L, chainC),    // cc tier: TRANSITIVE cut (paired only with 20)
      (22L, fillerC),   // survivor
      (23L, "tiny"),    // quality gate cut
      (24L, fillerF)    // decontamination cut
    ).toDF("doc_id", "text")
    val bench2 = Seq((100L, fillerF)).toDF("doc_id", "text")
    (ingested, batch, bench2)
  }

  /** The corpus-wide composition the CC law references: quality gate →
    * exact keep-min → simhash pairs → transitive clusters → keep each
    * cluster's minimum → decontaminate → split ([[Curation.curate]]'s
    * `nearDup` chain at the incremental tier's geometry). */
  private def corpusTwinCc(corpus: org.apache.spark.sql.DataFrame,
      bench: org.apache.spark.sql.DataFrame, bits: Int, maxHam: Int) = {
    val quality = TextAnalysis.gopherishFlags(corpus, "doc_id", "text", keepText = true)
      .filter($"keep").select("doc_id", "text")
    val exactIds = quality
      .withColumn("h", graft.functions.HashColumns.hashExpr(Seq($"text")))
      .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
    val exact = quality.join(exactIds, Seq("doc_id"), "left_semi")
    val pairs = Dedup.simhashNearDuplicates(exact, "doc_id", "text", bits, maxHam)
    val nearKept = Dedup.keepCanonical(exact, "doc_id", pairs)
    val clean = Decontamination.decontaminate(nearKept, bench, "doc_id", "text", 3, 1L)
    Sampling.assignSplit(clean.select("doc_id"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
  }

  test("curateIncremental nearCc: the incremental law with transitive clusters") {
    val (ingested, batch, bench2) = ccFixture
    val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, nearCc = true), shingleN = 3,
      nearCc = Some((64, 8)))
    val state = Curation.CurationState(inc0.novelDigests,
      fpIndex = inc0.novelFps, ccLabels = inc0.ccLabels)
    val inc = Curation.curateIncremental(batch, bench2, "doc_id", "text", state,
      shingleN = 3, nearCc = Some((64, 8)))
    val got = inc.survivors.as[(Long, String)].collect().toMap
    val full = corpusTwinCc(ingested.unionByName(batch), bench2, 64, 8)
      .filter($"doc_id" >= 10L).as[(Long, String)].collect().toMap
    assert(got === full, "incremental nearCc ≠ corpus-wide CC restricted to the batch")
    val gotIds = got.keySet
    assert(!gotIds.contains(10L), "exact tier: standing content hash must cut")
    assert(!gotIds.contains(20L), "cc tier: direct pair with the standing doc must cut")
    assert(!gotIds.contains(21L),
      "cc tier: the chain's far end must cut TRANSITIVELY (no direct pair with 2)")
    assert(!gotIds.contains(23L) && !gotIds.contains(24L))
    assert(gotIds === Set(22L))
    // the labeling the batch returns is the full-graph labeling: 2, 20,
    // 21 share one component named by the standing minimum
    val labels = inc.ccLabels.get.as[(Long, Long)].collect().toMap
    assert(labels(20L) === 2L && labels(21L) === 2L && labels(2L) === 2L)
  }

  test("curateIncremental nearCc: re-delivery ingests nothing, labeling unchanged") {
    val (ingested, batch, bench2) = ccFixture
    val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, nearCc = true), shingleN = 3,
      nearCc = Some((64, 8)))
    val state1 = Curation.CurationState(inc0.novelDigests,
      fpIndex = inc0.novelFps, ccLabels = inc0.ccLabels)
    val inc1 = Curation.curateIncremental(batch, bench2, "doc_id", "text", state1,
      shingleN = 3, nearCc = Some((64, 8)))
    val state2 = Curation.CurationState(
      state1.knownDigests.unionByName(inc1.novelDigests),
      fpIndex = Some(state1.fpIndex.get.unionByName(inc1.novelFps.get)),
      ccLabels = inc1.ccLabels)
    val again = Curation.curateIncremental(batch, bench2, "doc_id", "text", state2,
      shingleN = 3, nearCc = Some((64, 8)))
    assert(again.survivors.count() === 0, "a re-delivered batch must not survive")
    assert(again.novelDigests.count() === 0, "re-delivery appends no digests")
    assert(again.novelFps.get.count() === 0, "re-delivery appends no fingerprints")
    assert(again.ccLabels.get.as[(Long, Long)].collect().sorted ===
      inc1.ccLabels.get.as[(Long, Long)].collect().sorted,
      "re-delivery must leave the labeling unchanged")
  }

  test("nearCc cuts the transitive chain end the banded tier structurally misses") {
    val (ingested, batch, bench2) = ccFixture
    // banded run over the SAME fixture: C's reversal makes its 3-gram
    // shingles disjoint from A's and B's, so C shares no band bucket
    // with either (measured: A–B share 1 bucket, B–C and A–C share 0) —
    // bucket-local elections cannot see the chain
    val b0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, near = true), shingleN = 3,
      nearDup = Some((3, 8, 4)))
    val bandState = Curation.CurationState(b0.novelDigests, bandIndex = b0.novelBands)
    val banded = Curation.curateIncremental(batch, bench2, "doc_id", "text",
      bandState, shingleN = 3, nearDup = Some((3, 8, 4)))
      .survivors.select("doc_id").as[Long].collect().toSet
    val cc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
      Curation.emptyState(spark, nearCc = true), shingleN = 3,
      nearCc = Some((64, 8)))
    val ccState = Curation.CurationState(cc0.novelDigests,
      fpIndex = cc0.novelFps, ccLabels = cc0.ccLabels)
    val cc = Curation.curateIncremental(batch, bench2, "doc_id", "text",
      ccState, shingleN = 3, nearCc = Some((64, 8)))
      .survivors.select("doc_id").as[Long].collect().toSet
    assert(!banded.contains(20L), "B shares a bucket with standing A: banded cuts it")
    assert(banded.contains(21L),
      "the banded tier KEEPS the chain end (no shared bucket) — the documented trade")
    assert(!cc.contains(21L), "the cc tier cuts it transitively")
    assert(cc === banded - 21L, "the two tiers differ exactly on the chain end")
  }

  test("nearDupSkew: the salt engages only past the threshold and is row-identical") {
    // planted hot bucket: 40 batch docs share a long boilerplate prefix
    // with a tiny unique suffix — the suffix's few shingles almost never
    // displace a minhash minimum, so the docs pile into the SAME band
    // buckets (the boilerplate-template shape that hot-spots LSH keys)
    val boiler = "the committee shall convene on the first monday of every " +
      "month to review all pending applications and publish its findings " +
      "in the public register within fourteen days"
    val ingested = Seq((1L, boiler + " anchor edition zero")).toDF("doc_id", "text")
    val batch = (10L to 49L).map(i => (i, s"$boiler unique$i"))
      .toDF("doc_id", "text")
    val bench2 = Seq((100L, "benchmark only sentence nothing shares")).toDF("doc_id", "text")
    def run(skew: Option[(Long, Int)]) = {
      val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
        Curation.emptyState(spark, near = true), shingleN = 3,
        nearDup = Some((3, 8, 4)))
      Curation.curateIncremental(batch, bench2, "doc_id", "text",
        Curation.CurationState(inc0.novelDigests, bandIndex = inc0.novelBands),
        shingleN = 3, nearDup = Some((3, 8, 4)), nearDupSkew = skew)
    }
    val hotIsHot = run(None).novelBands.get
      .groupBy("band", "key").count().agg(max("count")).head.getLong(0)
    assert(hotIsHot >= 30L, s"fixture must actually plant a hot bucket, max=$hotIsHot")
    val plain = run(None)
    val saltedOn = run(Some((10L, 4)))   // threshold below the hot bucket
    val saltedOff = run(Some((10000L, 4))) // threshold above it
    val planOn = saltedOn.survivors.queryExecution.sparkPlan.toString
    val planOff = saltedOff.survivors.queryExecution.sparkPlan.toString
    assert(planOn.contains("__salt"),
      "past the threshold the probe must be the salted join")
    assert(!planOff.contains("__salt"),
      "below the threshold the plan must stay the unsalted probe")
    assert(!planOn.contains("CartesianProduct"))
    // row identity: survivors and every novelty append match the plain run
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    assert(ids(saltedOn.survivors) === ids(plain.survivors))
    assert(saltedOn.novelDigests.as[String].collect().sorted ===
      plain.novelDigests.as[String].collect().sorted)
    assert(saltedOn.novelBands.get.as[(Long, Int, Long)].collect().sorted ===
      plain.novelBands.get.as[(Long, Int, Long)].collect().sorted)
    spark.catalog.clearCache()
  }

  test("nearDupSkew on the CC tier: salt engages only past the threshold, row-identical") {
    // planted hot Hamming block: boilerplate docs with a one-token suffix
    // change keep most SimHash bits identical, so (blk, bval) block values
    // repeat across the batch — the fp-identical-template shape that heaps
    // one reducer in both the standing probe and the intra-batch self-join
    val boiler = "the committee shall convene on the first monday of every " +
      "month to review all pending applications and publish its findings " +
      "in the public register within fourteen days"
    val ingested = Seq((1L, boiler + " anchor edition zero")).toDF("doc_id", "text")
    val batch = (10L to 49L).map(i => (i, s"$boiler unique$i"))
      .toDF("doc_id", "text")
    val bench2 = Seq((100L, "benchmark only sentence nothing shares")).toDF("doc_id", "text")
    def run(skew: Option[(Long, Int)], edgeBound: Int = 1 << 20) = {
      val inc0 = Curation.curateIncremental(ingested, bench2, "doc_id", "text",
        Curation.emptyState(spark, nearCc = true), shingleN = 3,
        nearCc = Some((64, 8)))
      Curation.curateIncremental(batch, bench2, "doc_id", "text",
        Curation.CurationState(inc0.novelDigests,
          fpIndex = inc0.novelFps, ccLabels = inc0.ccLabels),
        shingleN = 3, nearCc = Some((64, 8)), nearDupSkew = skew,
        ccDriverEdgeBound = edgeBound)
    }
    val hotIsHot = run(None).novelFps.get
      .groupBy("blk", "bval").count().agg(max("count")).head.getLong(0)
    assert(hotIsHot >= 30L, s"fixture must actually plant a hot block, max=$hotIsHot")
    val plain = run(None)
    // plan-shape assertions pin the EAGER repair path (edgeBound 0): the
    // driver fast path collects the pair set, so the salted join runs in
    // a job the survivors plan no longer carries; row-identity below
    // additionally covers the default (driver) path
    val saltedOn = run(Some((10L, 4)), edgeBound = 0)   // threshold below the hot block
    val saltedOff = run(Some((10000L, 4)), edgeBound = 0) // threshold above it
    val saltedOnFast = run(Some((10L, 4)))
    val planOn = saltedOn.survivors.queryExecution.sparkPlan.toString
    val planOff = saltedOff.survivors.queryExecution.sparkPlan.toString
    assert(planOn.contains("__salt"),
      "past the threshold both CC pair joins must be the salted form")
    assert(!planOff.contains("__salt"),
      "below the threshold the plan must stay the unsalted probe")
    assert(!planOn.contains("CartesianProduct"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    assert(ids(saltedOn.survivors) === ids(plain.survivors))
    assert(saltedOn.novelDigests.as[String].collect().sorted ===
      plain.novelDigests.as[String].collect().sorted)
    assert(saltedOn.ccLabels.get.as[(Long, Long)].collect().sorted ===
      plain.ccLabels.get.as[(Long, Long)].collect().sorted,
      "the advanced labeling must be row-identical under the salt")
    assert(ids(saltedOff.survivors) === ids(plain.survivors))
    assert(ids(saltedOnFast.survivors) === ids(plain.survivors) &&
      saltedOnFast.ccLabels.get.as[(Long, Long)].collect().sorted ===
        plain.ccLabels.get.as[(Long, Long)].collect().sorted,
      "the salted probe under the DRIVER repair path is row-identical too")
    spark.catalog.clearCache()
  }

  test("commitCurationSnapshot: a takedown interrupted between stores leaves old state visible") {
    import graft.sources.Store
    val docs = Seq((1L, chainA.mkString(" ")), (2L, chainB), (3L, "a wholly " +
      "unrelated document about harbor lights and evening ferries crossing " +
      "the calm strait while dock workers loaded crates of fresh fish under " +
      "bright lamps and gulls circled the warm chimney smoke above town"))
      .toDF("doc_id", "text")
    val bench2 = Seq((100L, "benchmark only sentence nothing shares")).toDF("doc_id", "text")
    val inc = Curation.curateIncremental(docs, bench2, "doc_id", "text",
      Curation.emptyState(spark, nearCc = true), shingleN = 3, nearCc = Some((64, 8)))
    val state0 = Curation.CurationState(inc.novelDigests,
      fpIndex = inc.novelFps, ccLabels = inc.ccLabels)
    val dir = java.nio.file.Files.createTempDirectory("graft_curation_snap").toString
    val paths = Curation.CurationStorePaths(s"$dir/manifest", s"$dir/digests",
      fpsPath = Some(s"$dir/fps"), labelsPath = Some(s"$dir/labels"))
    val g1 = Curation.commitCurationSnapshot(state0, paths)
    val (_, standing) = Curation.readCurationSnapshot(spark, paths).get
    val digests0 = standing.knownDigests.as[String].collect().sorted
    // takedown doc 2, but CRASH mid-commit: only the digests generation
    // lands, fps/labels/manifest never written
    val purged = Curation.curateStateTakedown(standing,
      Seq((2L, chainB)).toDF("doc_id", "text"), "doc_id", "text")
    Store.writeStoreGeneration(purged.knownDigests, s"$dir/digests", keep = 2)
    val (gAfterCrash, visible) = Curation.readCurationSnapshot(spark, paths).get
    assert(gAfterCrash === g1, "the manifest still pins the pre-takedown pass")
    assert(visible.knownDigests.as[String].collect().sorted === digests0,
      "readers see the UNPURGED state — the orphan purged generation is invisible")
    assert(visible.fpIndex.get.filter($"id" === 2L).count() > 0)
    // recovery: re-run the takedown commit in full; the snapshot flips
    // atomically to fully-purged
    val purged2 = Curation.curateStateTakedown(visible,
      Seq((2L, chainB)).toDF("doc_id", "text"), "doc_id", "text")
    val g2 = Curation.commitCurationSnapshot(purged2, paths)
    assert(g2 > g1)
    val (_, after) = Curation.readCurationSnapshot(spark, paths).get
    assert(after.knownDigests.count() === 2 &&
      after.fpIndex.get.filter($"id" === 2L).count() === 0 &&
      after.ccLabels.get.filter($"id" === 2L).count() === 0,
      "every store purged, visible as one pass")
    spark.catalog.clearCache()
  }

  test("curateStateTakedown refuses a labeling without its fingerprint index") {
    // the repair re-derives affected-component pairs FROM the index; a
    // state carrying ccLabels but no fpIndex used to fall through with the
    // labeling unpurged — removed ids kept their label rows silently
    val state = Curation.CurationState(
      Seq("h1").toDF("content_hash"),
      ccLabels = Some(Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")))
    val e = intercept[IllegalArgumentException] {
      Curation.curateStateTakedown(state,
        Seq((2L, "gone")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("fpIndex"))
  }

  test("curateStateTakedown repairs the CC labeling: bridge removal splits the component") {
    // standing chain 1–2–3–4 (A–B–C–C2); doc 2 is the only bridge
    // between 1 and {3, 4} (hamming(A,C)=12, (A,C2)=15, (B,C2)=10 — all
    // beyond 8)
    val standing = Seq((1L, chainA.mkString(" ")), (2L, chainB),
      (3L, chainC), (4L, chainC2)).toDF("doc_id", "text")
    val fps = Dedup.simhashBlockedIndex(standing, "doc_id", "text", 64, 8)
    val pairs = Dedup.hammingNearDuplicates(
      standing.select($"doc_id".as("id"),
        Dedup.simhash($"text", 64).as("fp")), "id", "fp", 64, 8)
    val labels = Dedup.duplicateClusters(pairs)
    val state = Curation.CurationState(
      standing.select(graft.functions.HashColumns.hashExpr(Seq($"text")).as("content_hash")),
      fpIndex = Some(fps), ccLabels = Some(labels))
    assert(labels.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), "pre-takedown: one chain component")
    val purged = Curation.curateStateTakedown(state,
      Seq((2L, chainB)).toDF("doc_id", "text"), "doc_id", "text")
    assert(purged.fpIndex.get.filter($"id" === 2L).count() === 0,
      "removed doc's fingerprint rows leave the index")
    val repaired = purged.ccLabels.get.as[(Long, Long)].collect().toMap
    // the bridge is gone: 1 has no surviving pair (drops from the
    // labeling, as a recompute would drop it); {3, 4} stay a component
    // named by their own minimum, no longer by 1
    assert(repaired === Map(3L -> 3L, 4L -> 3L),
      "component must SPLIT and relabel, not just filter the removed row")
    // the repair law: identical to a from-scratch rebuild over the
    // purged fingerprint index
    val rebuilt = Dedup.duplicateClusters(
      Dedup.hammingNearDuplicates(
        standing.filter($"doc_id" =!= 2L).select($"doc_id".as("id"),
          Dedup.simhash($"text", 64).as("fp")), "id", "fp", 64, 8))
      .as[(Long, Long)].collect().toMap
    assert(repaired === rebuilt)
  }
}
