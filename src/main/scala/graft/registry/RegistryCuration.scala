package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{Currents, MetaColumns => M}
import graft.operators._
import graft.operators.Scd2.ValidFromMode
import graft.pipeline.Historization
import graft.sources.{Store, StoreIndex, Tables}
import graft.registry.Helpers._
import graft.registry.OracleCtes._

/** Registrations: composed curation, decontamination, and data-quality gates.
  * One entry per implemented operator, each paired with its DuckDB
  * oracle twin; composed into the driver contract by
  * [[graft.SparkEntry]]. Entries moved verbatim from SparkEntry
  * (r14 split — VERDICT r13 item 7). */
private[graft] object RegistryCuration {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // per-benchmark attribution: the eval docs split into two suites by
    // doc_id % 40; hits counted per (doc, suite)
    "x_decontaminate_by" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontamination.contaminationByBenchmark(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0)
          .withColumn("suite",
            when(col("doc_id") % 40 === 0, lit("suite_a")).otherwise(lit("suite_b"))),
        "doc_id", "text", "suite", n = 3)
    }),
    // benchmark decontamination: every 20th doc plays the eval set, the
    // rest is the training corpus; 3-gram collision flags contamination
    // (same shingle derivation as the dedup family / docShinglesCte)
    "x_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontamination.contaminationReport(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 3, minHits = 1)
    }),
    // span-level decontamination: same bench split, 30-char grams (the
    // spans-family width) — reports the contaminated ISLANDS instead of
    // flagging whole documents; bench gram set broadcast, corpus probes
    // map-side (zero corpus shuffle before the hit filter)
    "x_decontaminate_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontamination.contaminatedSpans(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", k = 30, stride = 1)
    }),
    // the scrub: contaminated islands interval-merged and excised, the
    // clean remainder re-joined in order — the surgical alternative to
    // dropping a whole document for one quoted benchmark line
    "x_decontaminate_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontamination.decontaminateSpans(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", k = 30, stride = 1)
    }),
    // deequ-style publish gate: one aggregation pass profiles all three
    // columns; o_orderkey is unique (uniqueness 1.0), o_custkey is a
    // 10:1 foreign key (0.1), o_orderstatus is a tiny enum
    "x_quality_checks" -> ((s, d) =>
      DataQuality.checkColumns(Tables.orders(s, d),
        minCompleteness = Map("o_orderkey" -> 1.0, "o_custkey" -> 1.0,
          "o_orderstatus" -> 1.0),
        minUniqueness = Map("o_orderkey" -> 1.0))),
    // profile drift between two loads: run A = orders minus every 3rd
    // key, run B = the full table — per-column completeness/uniqueness
    // deltas and the row ratio from two bounded profile passes
    "x_quality_drift" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      DataQuality.profileDrift(
        orders.filter(col("o_orderkey") % 3 =!= 0), orders,
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))
    }),
    // FK gate with REAL orphans: every 7th order is withheld from the
    // parent side, so its lineitems must surface in n_orphans
    "x_quality_fk" -> ((s, d) =>
      DataQuality.checkReferentialIntegrity(
        Tables.lineitem(s, d),
        Tables.orders(s, d).filter(col("o_orderkey") % 7 =!= 0),
        Seq("l_orderkey" -> "o_orderkey"))),
    // the composed curation pipeline: quality -> dedup -> decontaminate
    // -> split, one operator, oracle-checked as a whole
    // shingleN = 3 pinned at each call: the oracle mirrors trigram
    // shingles on this SMALL fixture (production default is 13-grams —
    // at n=3 on a real corpus nearly everything shares a shingle)
    "x_curate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.curate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3)
    }),
    // the pipeline with the domain-blocklist gate on: per-doc URLs carry
    // a deterministic host (every 11th doc on an "ads." subdomain); one
    // EXACT rule and one WILDCARD (*.domain, proper subdomains only)
    // rule cut hosts BEFORE the quality stage — the suffix equi-join gate
    // (never a corpus regex). Like every gated family member this reads
    // the STAGED curation prefix (r15 VERDICT: the six curate rows
    // re-tokenized the corpus per question — 12% of the bench); the gate
    // itself and the survivor-dependent stages run per-question, and
    // prefix ≡ fresh is spec-pinned in CurationSpec
    "x_curate_url" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val urls = docs.select(col("doc_id"),
        concat(lit("https://"),
          when(col("doc_id") % 11 === 0, lit("ads.")).otherwise(lit("")),
          lit("site"), pmod(col("doc_id"), lit(37)).cast("string"),
          lit(".example.com/d/"), col("doc_id").cast("string")).as("url"))
      val rules = Seq("site5.example.com", "*.site7.example.com").toDF("rule")
      Curation.curateFromPrefix(stagedCuratePrefix(s, d), "doc_id",
        urlKeepIds = Some(
          Urls.filterBlockedHosts(urls, "doc_id", "url", rules).select("doc_id")))
    }),
    // the pipeline with the model-based quality gate on: the fixed-weight
    // sigmoid score staged beside the flags (same metric columns, same
    // scan), kept at score >= 0.5 — the fastText-recipe second filter
    "x_curate_quality" -> ((s, d) =>
      Curation.curateFromPrefix(stagedCuratePrefix(s, d), "doc_id",
        minScore = Some(qualityMinScore))),
    // the same pipeline with the optional language gate on: docs whose
    // staged stopword-profile language is not English drop out
    "x_curate_lang" -> ((s, d) =>
      Curation.curateFromPrefix(stagedCuratePrefix(s, d), "doc_id",
        languages = Some(Set("en")))),
    // curation with the near-dup cluster stage: exact dedup, then simhash
    // Hamming pairs -> transitive clusters -> keep the cluster minimum.
    // Pairs come from the staged store, restricted to the surviving docs
    // (pair membership is pairwise, so hamming<=1 pairs are exactly the
    // staged hamming<=2 rows filtered) — both the per-doc facts AND the
    // pair set are computed once per corpus, never once per question
    "x_curate_neardup" -> ((s, d) =>
      Curation.curateFromPrefix(stagedCuratePrefix(s, d), "doc_id",
        nearDupPairs = Some(stagedSimhashPairs(s, d, 16, 2).filter(col("hamming") <= 1)))),
    // curation with the MEDIA near-dup stage: after exact dedup, the
    // perceptual-hash pair store (aHash fingerprints -> pigeonhole
    // Hamming pairs) drives the same transitive-cluster + keep-minimum
    // election — the multimodal twin of x_curate_neardup
    "x_curate_media" -> ((s, d) =>
      Curation.curateFromPrefix(stagedCuratePrefix(s, d), "doc_id",
        mediaDupPairs = Some(stagedPhashPairs(s, d, 16, 2)))),
    // STEADY-STATE composed curation — the production web-ingest loop as
    // one oracle row: even non-bench docs play the ingested corpus (its
    // stores built by the operator's own batch-0 run against empty
    // state), odd docs play the new batch, with deterministic even-
    // neighbor text derivations so the standing tiers fire (doc%9==1:
    // near-dup of the even neighbor via an appended token; doc%9==4: its
    // exact copy) and floor(doc_id/3)-keyed urls so canonical classes
    // span both sides (plus ads./exact blocklist hits). The oracle
    // replays the INCREMENTAL LAW form: the corpus-wide composition over
    // ingested ∪ batch, restricted to the batch — so the law itself is
    // what DuckDB checks
    // The registered row reads the STAGED standing stores and runs the
    // batch leg only — the steady-state cost the operator exists for
    // (the five-gated-curate-rows precedent); x_stage_build_curate_state
    // prices the batch-0 build, and the oracle below replays the LAW, so
    // the staged stores' whole semantics stay cross-engine-checked
    "x_curate_incremental" -> ((s, d) => {
      val batch = curateIncBatch(s, d)
      Curation.curateIncremental(batch, curateIncBench(s, d), "doc_id", "text",
        stagedCurateState(s, d), shingleN = 3,
        urlGate = Some((curateIncUrls(batch), "url", curateIncRules(s))),
        nearDup = Some((3, 8, 4))).survivors
    }),
    // the TRANSITIVE near tier in the steady-state loop (nearCc): the
    // batch's blocked SimHash rows probe the standing fingerprint index,
    // the standing labeling advances by condensed-graph repair, and a
    // batch doc survives iff it is its component's minimum — curate's CC
    // election at batch probe cost, the semantics the banded tier trades
    // away. Same fixture and staging shape as x_curate_incremental; the
    // oracle replays the LAW: the corpus-wide composition with the
    // simhash-CC election (the x_curate_neardup chain) over
    // ingested ∪ batch, restricted to the batch
    "x_curate_incremental_cc" -> ((s, d) => {
      val batch = curateIncBatch(s, d)
      Curation.curateIncremental(batch, curateIncBench(s, d), "doc_id", "text",
        stagedCurateCcState(s, d), shingleN = 3,
        urlGate = Some((curateIncUrls(batch), "url", curateIncRules(s))),
        nearCc = Some((64, 3))).survivors
    }),
    // build-pricing row for the staged curation state: the ingested
    // corpus through the operator against EMPTY state, all three novelty
    // stores written fresh to scratch every run; returns the digest
    // store (full content oracle — the canonical and band stores are
    // law-checked through x_curate_incremental itself)
    "x_stage_build_curate_state" -> ((s, d) => {
      val inc0 = curateIncBatch0(s, d)
      buildScratch(s, "curate_inc_canon")(inc0.novelCanonical.get)
      buildScratch(s, "curate_inc_bands")(inc0.novelBands.get)
      buildScratch(s, "curate_inc_digests")(inc0.novelDigests)
    }),
    // TAKEDOWN of standing curation state — the erasure/compliance leg of
    // the steady-state loop: every 10th ingested doc leaves the corpus,
    // and the standing stores forget its digest, canonical URL, and band
    // rows (broadcast anti-joins over derived keys; keys that were never
    // stored — gate-cut docs, blocked hosts — anti-join away silently,
    // which is the idempotency the operator documents). All three purged
    // stores are rewritten through the swap write and priced here; the
    // digest store's full content is the oracle (store minus the removed
    // docs' content hashes), the band/canonical purges and the
    // novelty-restored re-submission law are spec-pinned in CurationSpec
    "x_curate_state_takedown" -> ((s, d) => {
      val removed = curateIncIngested(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), col("text"))
      val purged = Curation.curateStateTakedown(stagedCurateState(s, d),
        removed, "doc_id", "text",
        removedUrls = Some((curateIncUrls(removed), "url")))
      buildScratch(s, "curate_takedown_canon")(purged.knownCanonical.get)
      buildScratch(s, "curate_takedown_bands")(purged.bandIndex.get)
      buildScratch(s, "curate_takedown_digests")(purged.knownDigests)
    }),
    // TAKEDOWN over the STREAMING loop's delta-generation snapshot
    // layout: the staged CC state is committed as TWO delta generations
    // per store (the micro-batch layout — each commit holds one batch's
    // novelty, the pinned content is their union), then
    // curateTakedownSnapshot purges and REBASES it in one atomic
    // manifest commit — no compact-to-full first. The digest store read
    // back through the rebased snapshot is the oracle (the same
    // set-subtraction law as x_curate_state_takedown, arrived at through
    // the delta-union + rebase machinery instead of a full-store
    // rewrite); the fps/labels/canonical purges, the crash window, and
    // the base carry-forward are spec-pinned in StreamingSpec. Fresh
    // scratch each run — takedown mutates, staged stores are immutable —
    // so the row prices the honest 2-commit + purge + rebase pass
    "x_curate_takedown_snapshot" -> ((s, d) => {
      val path = s"/tmp/graft_scratch/curate_td_snap_${dirTag(d, "documents")}"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val st = stagedCurateCcState(s, d)
      def half(df: DataFrame, key: org.apache.spark.sql.Column, even: Boolean) =
        df.filter(pmod(crc32(key.cast("string")), lit(2))
          === lit(if (even) 0 else 1))
      def commit(even: Boolean): Unit = {
        Store.commitSnapshot(s, s"$path/m", Seq(
          ("digests", s"$path/digests",
            half(st.knownDigests, col("content_hash"), even)),
          ("canonical", s"$path/canon",
            half(st.knownCanonical.get, coalesce(col("canonical_url"), lit("")), even)),
          ("fps", s"$path/fps", half(st.fpIndex.get, col("id"), even)),
          ("labels", s"$path/labels", st.ccLabels.get)), keep = Int.MaxValue)
        ()
      }
      commit(true); commit(false)
      val removed = curateIncIngested(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 2)
        .select(col("doc_id"), col("text"))
      Curation.curateTakedownSnapshot(s, s"$path/m",
        s"$path/digests", s"$path/fps", s"$path/labels",
        removed, "doc_id", "text",
        canonicalPath = Some(s"$path/canon"),
        removedUrls = Some((curateIncUrls(removed), "url")))
      Store.readSnapshotDeltas(s, s"$path/m",
        Map("digests" -> s"$path/digests"), Map.empty).get._2("digests")
    }),
    // prefix-build accounting row: the honest cost of the staged
    // curation prefix the five gated rows above amortize (quality
    // metrics + model score + language + content hash + contamination
    // flag, two corpus passes, one persisted write). Returns the built
    // table for the oracle compare — the full prefix CONTENT is
    // oracle-checked, not just its totals
    "x_stage_build_curate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      buildScratch(s, "curate_prefix_n3")(Curation.curatePrefix(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3, minHits = 1L,
        qualityModel = Some((qualityWeights, qualityBias))))
    }),
    // row-level expectations with quarantine routing: each bad row
    // carries the names of the constraints it failed — one stateless
    // projection, no shuffle
    "x_quality_quarantine" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val constraints = Seq(
        "qty_le_45" -> (col("l_quantity") <= 45),
        "discount_le_8pct" -> (col("l_discount") <= 0.08),
        "tax_le_6pct" -> (col("l_tax") <= 0.06))
      val (_, quarantined) = DataQuality.splitQuarantine(li, constraints)
      quarantined.select(col("l_orderkey"), col("l_linenumber"),
        array_join(col("violations"), ",").as("reasons"))
    }),
  )

  /** Shared fixture CTEs of the steady-state curation oracles (CTE body,
    * no WITH prefix — the CC law row needs a `WITH RECURSIVE` head): the
    * even/odd(+10000) corpus derivation, the url tier, the quality gate,
    * and the content hashes of its survivors (`hashed`). The build row
    * reads `hashed` restricted to the ingested side; the law rows
    * continue through the elections. */
  private lazy val duckCurateIncPrefixBody: String =
    s"""src AS (
         |  SELECT CASE WHEN d.doc_id % 2 = 1 THEN d.doc_id + 10000
         |              ELSE d.doc_id END AS doc_id,
         |    CASE WHEN d.doc_id % 2 = 1 AND d.doc_id % 9 = 1
         |           THEN e.text || ' zmutivar'
         |         WHEN d.doc_id % 2 = 1 AND d.doc_id % 9 = 4 THEN e.text
         |         ELSE d.text END AS text
         |  FROM documents d
         |  LEFT JOIN documents e ON d.doc_id % 2 = 1 AND e.doc_id = d.doc_id - 1
         |  WHERE d.doc_id % 2 = 1 OR d.doc_id % 20 <> 0
         |),
         |hosts AS (
         |  SELECT doc_id,
         |    CASE WHEN p % 11 = 0 THEN 'ads.' ELSE '' END ||
         |      'site' || CAST(p % 37 AS VARCHAR) || '.example.com' AS host,
         |    'https://' ||
         |      CASE WHEN p % 11 = 0 THEN 'ads.' ELSE '' END ||
         |      'site' || CAST(p % 37 AS VARCHAR) || '.example.com/d/' ||
         |      CAST(p AS VARCHAR) AS url
         |  FROM (SELECT doc_id,
         |          CASE WHEN (doc_id % 10000) % 5 = 2 THEN (doc_id % 10000) - 1
         |               ELSE doc_id % 10000 END AS p
         |        FROM src)
         |),
         |unblocked AS (
         |  SELECT doc_id, url FROM hosts
         |  WHERE host <> 'site5.example.com'
         |    AND NOT (host LIKE '%.site7.example.com')
         |),
         |urlwin AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY url ORDER BY doc_id) AS rn
         |    FROM unblocked
         |  ) WHERE rn = 1
         |),
         |toks AS (
         |  SELECT s.doc_id,
         |    list_filter(regexp_split_to_array(s.text, '\\s+'), t -> length(t) > 0) AS w
         |  FROM src s JOIN urlwin USING (doc_id)
         |),
         |$qualityMetricsCte,
         |base AS (SELECT doc_id FROM m WHERE $qualityKeepPredicate),
         |hashed AS (
         |  SELECT s.doc_id, md5(coalesce(CAST(s.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM src s JOIN base USING (doc_id)
         |)""".stripMargin

  /** Shared by the two takedown rows: the standing digest set minus the
    * removed docs' content hashes — one law, two storage routes (swap
    * rewrite vs delta-snapshot rebase). */
  private lazy val duckTakedownDigestsSql: String =
    s"""WITH $duckCurateIncPrefixBody
       |SELECT DISTINCT content_hash FROM hashed
       |WHERE doc_id < 10000
       |  AND content_hash NOT IN (
       |    SELECT md5(coalesce(CAST(text AS VARCHAR), 'nan'))
       |    FROM src WHERE doc_id < 10000 AND doc_id % 10 = 2)""".stripMargin

  val oracles: Seq[(String, String)] = Seq(
    // the staged prefix's FULL CONTENT replayed: quality keep predicate
    // and model score over the shared metric CTE, the stopword-profile
    // language argmax, the exact-dedup digest, and the any-shared-shingle
    // contamination flag — all per-document facts, so the statement is
    // gate-free and the six curate oracles stay untouched
    "x_stage_build_curate" ->
      s"""$docShinglesCte,
         |$qualityMetricsCte,
         |lng AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.langOrder.map(l => s"${duckLangHits(l)} AS c_$l").mkString(", ")}
         |  FROM toks
         |),
         |bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0),
         |tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 20 <> 0),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s))
         |SELECT m.doc_id,
         |  ($qualityKeepPredicate) AS keep,
         |  ${duckQualityScore(qualityWeights, qualityBias)} AS q_score,
         |  ($duckLangCase) AS lang,
         |  md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash,
         |  (h.doc_id IS NOT NULL) AS contaminated
         |FROM m
         |JOIN lng USING (doc_id)
         |JOIN documents d USING (doc_id)
         |LEFT JOIN hits h USING (doc_id)
         |WHERE m.doc_id % 20 <> 0""".stripMargin,
    // the four curation stages in one statement; quality CTEs and the
    // keep predicate are the SAME vals the standalone x_text_quality
    // oracle uses, the split bound is written (0.9 + 0.05) so both
    // engines accumulate the identical IEEE double
    // x_curate plus the near-dup cluster stage between exact dedup and
    // decontamination: simhash fps (shared tail CTE) -> pigeonhole pairs
    // restricted to dedup survivors -> recursive min-label components ->
    // drop non-minimum members. Restricting PAIRS to survivors equals the
    // operator's pairs-over-survivors (blocking commutes with the subset)
    "x_curate_neardup" ->
      s"""WITH RECURSIVE $duckToksCte,
         |$duckShinglesTailCte,
         |$qualityMetricsCte,
         |base AS (
         |  SELECT doc_id FROM m
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |$simhashFpTailCte,
         |${duckHammingPairs(16, 1)},
         |pairs2 AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN dedup da ON da.doc_id = p.id_a
         |  JOIN dedup db ON db.doc_id = p.id_b
         |),
         |${duckCcLosers("pairs2")},
         |ndd AS (
         |  SELECT d.doc_id FROM dedup d
         |  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN ndd USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM ndd d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    // the x_curate_neardup statement with the pair source swapped: phash
    // fingerprints (the x_media_phash derivation) instead of simhash —
    // the media cluster stage composed into curation
    "x_curate_media" ->
      s"""WITH RECURSIVE $duckToksCte,
         |$duckShinglesTailCte,
         |$qualityMetricsCte,
         |base AS (
         |  SELECT doc_id FROM m
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |$phashFpTailCte,
         |${duckHammingPairs(16, 2)},
         |pairs2 AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN dedup da ON da.doc_id = p.id_a
         |  JOIN dedup db ON db.doc_id = p.id_b
         |),
         |${duckCcLosers("pairs2")},
         |ndd AS (
         |  SELECT d.doc_id FROM dedup d
         |  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN ndd USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM ndd d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    // the incremental law AS the oracle: the corpus-wide composition
    // (url blocklist + canonical keep-min → quality → exact keep-min →
    // banded bucket keep-min → decontaminate → split) over
    // ingested ∪ batch, restricted to the batch — what the registered
    // row computes through its standing stores
    // the staged-state build: digest store = one hash per gate-surviving
    // ingested content class (the canonical and band stores are checked
    // through the law row above/below)
    "x_stage_build_curate_state" ->
      s"""WITH $duckCurateIncPrefixBody
         |SELECT DISTINCT content_hash FROM hashed WHERE doc_id < 10000""".stripMargin,
    // the takedown arithmetic: the staged digest store (the build row's
    // statement) minus the removed ingested docs' content hashes — key
    // derivation mirrors ingestion (same md5-coalesce form), removal is
    // set subtraction whether or not the key was ever stored
    "x_curate_state_takedown" -> duckTakedownDigestsSql,
    // the SAME set-subtraction law, arrived at through the delta-layout
    // snapshot machinery (two delta commits unioned, purged, rebased):
    // the storage route differs, the standing-content law cannot
    "x_curate_takedown_snapshot" -> duckTakedownDigestsSql,
    // the CC law AS the oracle: the corpus-wide composition with the
    // TRANSITIVE simhash-CC election (fingerprints over the gated docs,
    // pigeonhole pairs restricted to exact survivors — blocking commutes
    // with the subset — recursive min-label components, drop non-minimum
    // members) over ingested ∪ batch, restricted to the batch: what the
    // registered row computes through the standing fp index + labeling
    "x_curate_incremental_cc" ->
      s"""WITH RECURSIVE $duckCurateIncPrefixBody,
         |exact AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |${simhashFpTail(64)},
         |${duckHammingPairs(64, 3)},
         |pairs2 AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN exact ea ON ea.doc_id = p.id_a
         |  JOIN exact eb ON eb.doc_id = p.id_b
         |),
         |${duckCcLosers("pairs2")},
         |cckept AS (
         |  SELECT e.doc_id FROM exact e
         |  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = e.doc_id)
         |),
         |shx AS (
         |  SELECT t.doc_id,
         |    list_distinct(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
         |      i -> array_to_string(w[i+1:i+3], ' '))) AS shingles
         |  FROM toks t JOIN cckept USING (doc_id)
         |),
         |btoks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS w
         |  FROM documents WHERE doc_id % 20 = 0
         |),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |    range(0, greatest(len(w) - 3, 0) + 1),
         |    i -> array_to_string(w[i+1:i+3], ' ')))) AS s
         |  FROM btoks
         |),
         |tr AS (SELECT doc_id, unnest(shingles) AS s FROM shx),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bsh USING (s)),
         |clean AS (
         |  SELECT k.doc_id FROM cckept k LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u
         |  FROM clean WHERE doc_id >= 10000
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    "x_curate_incremental" ->
      s"""WITH $duckCurateIncPrefixBody,
         |exact AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |shx AS (
         |  SELECT t.doc_id,
         |    list_distinct(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
         |      i -> array_to_string(w[i+1:i+3], ' '))) AS shingles
         |  FROM toks t JOIN exact USING (doc_id)
         |),
         |sig AS (
         |  SELECT doc_id AS id,
         |    list_transform(range(0, 8),
         |      j -> list_min(list_transform(shingles,
         |             s -> md5(concat(CAST(j AS VARCHAR), '#', s))))) AS sig
         |  FROM shx
         |),
         |banded AS (
         |  SELECT id, g.band,
         |         md5(array_to_string(sig[g.band*2+1:g.band*2+2], '|')) AS key
         |  FROM sig, generate_series(0, 3) g(band)
         |),
         |nearcut AS (
         |  SELECT DISTINCT id FROM (
         |    SELECT id, min(id) OVER (PARTITION BY band, key) AS mn FROM banded
         |  ) WHERE id <> mn
         |),
         |nearkept AS (
         |  SELECT e.doc_id FROM exact e LEFT JOIN nearcut n ON n.id = e.doc_id
         |  WHERE n.id IS NULL
         |),
         |btoks AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS w
         |  FROM documents WHERE doc_id % 20 = 0
         |),
         |bsh AS (
         |  SELECT DISTINCT unnest(list_distinct(list_transform(
         |    range(0, greatest(len(w) - 3, 0) + 1),
         |    i -> array_to_string(w[i+1:i+3], ' ')))) AS s
         |  FROM btoks
         |),
         |tr AS (
         |  SELECT k.doc_id, unnest(x.shingles) AS s
         |  FROM nearkept k JOIN shx x USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bsh USING (s)),
         |clean AS (
         |  SELECT k.doc_id FROM nearkept k LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u
         |  FROM clean WHERE doc_id >= 10000
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    "x_curate" ->
      s"""$docShinglesCte,
         |$qualityMetricsCte,
         |base AS (
         |  SELECT doc_id FROM m
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN dedup USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM dedup d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    // x_curate with the URL blocklist gate: identical statement except
    // `base` additionally excludes blocked hosts — the oracle replays the
    // gate's SEMANTICS over the same deterministic host derivation
    // (exact rule hits the non-ads host, the wildcard rule hits only the
    // ads. proper subdomain)
    "x_curate_url" ->
      s"""$docShinglesCte,
         |$qualityMetricsCte,
         |base AS (
         |  SELECT doc_id FROM m
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |    AND NOT ((doc_id % 11 <> 0 AND doc_id % 37 = 5)
         |          OR (doc_id % 11 = 0 AND doc_id % 37 = 7))
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN dedup USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM dedup d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    // x_curate with the model gate: identical statement except `base`
    // additionally requires the shared-weight sigmoid score >= 0.5
    "x_curate_quality" ->
      s"""$docShinglesCte,
         |$qualityMetricsCte,
         |base AS (
         |  SELECT doc_id FROM m
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |    AND ${duckQualityScore(qualityWeights, qualityBias)} >= $qualityMinScore
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN dedup USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM dedup d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    // x_curate with the language gate: identical statement except `base`
    // additionally requires the generated stopword-profile argmax = 'en';
    // the lang CASE is built from the same vals as the x_text_lang oracle
    "x_curate_lang" ->
      s"""$docShinglesCte,
         |$qualityMetricsCte,
         |lng AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      ${TextAnalysis.langOrder.map(l => s"${duckLangHits(l)} AS c_$l").mkString(", ")}
         |    FROM toks
         |  ) WHERE ($duckLangCase) = 'en'
         |),
         |base AS (
         |  SELECT m.doc_id FROM m JOIN lng USING (doc_id)
         |  WHERE $qualityKeepPredicate AND doc_id % 20 <> 0
         |),
         |hashed AS (
         |  SELECT d.doc_id, md5(coalesce(CAST(d.text AS VARCHAR), 'nan')) AS content_hash
         |  FROM documents d JOIN base USING (doc_id)
         |),
         |dedup AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
         |    FROM hashed
         |  ) WHERE rn = 1
         |),
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |tr AS (
         |  SELECT sh.doc_id, unnest(sh.shingles) AS s FROM sh JOIN dedup USING (doc_id)
         |),
         |hits AS (SELECT DISTINCT t.doc_id FROM tr t JOIN bench USING (s)),
         |clean AS (
         |  SELECT d.doc_id FROM dedup d LEFT JOIN hits h USING (doc_id)
         |  WHERE h.doc_id IS NULL
         |),
         |u AS (
         |  SELECT doc_id, ${duckHashUniform("doc_id", "split")} AS u FROM clean
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.9 THEN 'train'
         |       WHEN u < (0.9 + 0.05) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM u""".stripMargin,
    "x_decontaminate_by" ->
      s"""$docShinglesCte,
         |bench AS (
         |  SELECT DISTINCT
         |    CASE WHEN doc_id % 40 = 0 THEN 'suite_a' ELSE 'suite_b' END AS bench_id,
         |    unnest(shingles) AS s
         |  FROM sh WHERE doc_id % 20 = 0
         |),
         |train AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 20 <> 0
         |)
         |SELECT t.doc_id, b.bench_id, count(*) AS n_hits
         |FROM train t JOIN bench b USING (s)
         |GROUP BY 1, 2""".stripMargin,
    "x_decontaminate" ->
      s"""$docShinglesCte,
         |bench AS (
         |  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 20 = 0
         |),
         |train AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 20 <> 0
         |),
         |hits AS (
         |  SELECT t.doc_id, count(*) AS n_hits
         |  FROM train t JOIN bench USING (s) GROUP BY 1
         |),
         |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id)
         |SELECT s.doc_id, s.n_shingles,
         |       coalesce(h.n_hits, 0) AS n_hits,
         |       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / s.n_shingles, 6) AS contamination,
         |       coalesce(h.n_hits, 0) >= 1 AS contaminated
         |FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id""".stripMargin,
    // same position set as the Spark side (1-based starts, stride 1),
    // raw-substring joins instead of the 60-bit hashes, identical
    // island-merge window — the x_dedup_spans oracle with the bench gram
    // set replacing the df >= 2 duplication gate
    "x_decontaminate_spans" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 30
        |),
        |bench AS (
        |  SELECT DISTINCT substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT text, unnest(range(1, length(text) - 28)) AS p
        |        FROM docs WHERE doc_id % 20 = 0)
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS p
        |        FROM docs WHERE doc_id % 20 <> 0)
        |),
        |hit AS (SELECT pos.doc_id, pos.p FROM pos JOIN bench USING (gram)),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) AS grp
        |  FROM hit
        |)
        |SELECT doc_id, min(p) AS span_start, max(p) + 29 AS span_end
        |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // the scrub twin: the x_dedup_spans_removed surgery (interval merge,
    // segment stitch, tail append) with the contaminated-island cut set,
    // final select over the TRAIN rows so clean and short/null texts
    // pass through
    "x_decontaminate_scrub" ->
      """WITH train AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
        |),
        |docs AS (SELECT doc_id, text FROM train WHERE length(text) >= 30),
        |bench AS (
        |  SELECT DISTINCT substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT text, unnest(range(1, length(text) - 28)) AS p
        |        FROM documents WHERE doc_id % 20 = 0 AND length(text) >= 30)
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS p FROM docs)
        |),
        |cut AS (SELECT pos.doc_id, pos.p FROM pos JOIN bench USING (gram)),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) AS grp
        |  FROM cut
        |),
        |sp AS (
        |  SELECT doc_id, min(p) AS s, max(p) + 29 AS e FROM isl GROUP BY doc_id, grp
        |),
        |mk AS (
        |  SELECT doc_id, s, e,
        |    max(e) OVER (PARTITION BY doc_id ORDER BY s
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM sp
        |),
        |mg AS (
        |  SELECT doc_id, s, e,
        |    sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS mgrp
        |  FROM mk
        |),
        |merged AS (
        |  SELECT doc_id, min(s) AS s, max(e) AS e FROM mg GROUP BY doc_id, mgrp
        |),
        |segs AS (
        |  SELECT m.doc_id, m.s,
        |    substring(d.text,
        |      coalesce(lag(m.e) OVER (PARTITION BY m.doc_id ORDER BY m.s), 0) + 1,
        |      m.s - coalesce(lag(m.e) OVER (PARTITION BY m.doc_id ORDER BY m.s), 0) - 1) AS seg
        |  FROM merged m JOIN train d USING (doc_id)
        |),
        |heads AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY s) AS head FROM segs GROUP BY doc_id
        |),
        |tails AS (
        |  SELECT doc_id, max(e) AS me FROM merged GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CASE WHEN t.me IS NULL THEN d.text
        |       ELSE coalesce(h.head, '') || substring(d.text, t.me + 1) END AS cleaned
        |FROM train d
        |LEFT JOIN heads h USING (doc_id)
        |LEFT JOIN tails t USING (doc_id)""".stripMargin,
    // definitional FK check: orphans = non-null child keys absent from
    // the (shrunken) parent; NULL match_ratio when no key is checkable
    // (n_rows = n_null_key), mirroring the operator's convention
    // two profile CTEs (one aggregation pass each) joined per column;
    // ratios round at 6 BEFORE differencing, exactly like the operator
    "x_quality_drift" ->
      """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
        |b AS (SELECT * FROM orders),
        |pa AS (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows_a,
        |         round(CAST(count(o_orderkey) AS DOUBLE) / count(*), 6) AS completeness_a,
        |         round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6) AS uniqueness_a
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |         round(CAST(count(o_custkey) AS DOUBLE) / count(*), 6),
        |         round(CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*), 6)
        |  FROM a
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |         round(CAST(count(o_orderstatus) AS DOUBLE) / count(*), 6),
        |         round(CAST(count(DISTINCT o_orderstatus) AS DOUBLE) / count(*), 6)
        |  FROM a
        |),
        |pb AS (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows_b,
        |         round(CAST(count(o_orderkey) AS DOUBLE) / count(*), 6) AS completeness_b,
        |         round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6) AS uniqueness_b
        |  FROM b
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |         round(CAST(count(o_custkey) AS DOUBLE) / count(*), 6),
        |         round(CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*), 6)
        |  FROM b
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |         round(CAST(count(o_orderstatus) AS DOUBLE) / count(*), 6),
        |         round(CAST(count(DISTINCT o_orderstatus) AS DOUBLE) / count(*), 6)
        |  FROM b
        |)
        |SELECT pa."column", n_rows_a, completeness_a, uniqueness_a,
        |       n_rows_b, completeness_b, uniqueness_b,
        |       round(completeness_b - completeness_a, 6) AS d_completeness,
        |       round(uniqueness_b - uniqueness_a, 6) AS d_uniqueness,
        |       round(CAST(n_rows_b AS DOUBLE) / n_rows_a, 6) AS row_ratio
        |FROM pa JOIN pb USING ("column")""".stripMargin,
    "x_quality_fk" ->
      """WITH par AS (
        |  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0
        |),
        |agg AS (
        |  SELECT count(*) AS n_rows,
        |    count(*) FILTER (l_orderkey IS NULL) AS n_null_key,
        |    count(*) FILTER (l_orderkey IS NOT NULL
        |      AND l_orderkey NOT IN (SELECT o_orderkey FROM par)) AS n_orphans
        |  FROM lineitem
        |)
        |SELECT 'l_orderkey' AS key, n_rows, n_null_key, n_orphans,
        |  CASE WHEN n_rows - n_null_key = 0 THEN NULL
        |       ELSE round(CAST(n_rows - n_null_key - n_orphans AS DOUBLE) /
        |                  (n_rows - n_null_key), 6)
        |  END AS match_ratio
        |FROM agg""".stripMargin,
    // the gate is definitional SQL: per-column counts over one scan;
    // pass = thresholds in the registered call
    "x_quality_checks" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(o_custkey) AS nn_ck, count(DISTINCT o_custkey) AS nd_ck,
        |    count(o_orderkey) AS nn_ok, count(DISTINCT o_orderkey) AS nd_ok,
        |    count(o_orderstatus) AS nn_os, count(DISTINCT o_orderstatus) AS nd_os
        |  FROM orders
        |)
        |SELECT u."column", n AS n_rows, u.n_nonnull, u.n_distinct,
        |  round(CAST(u.n_nonnull AS DOUBLE) / n, 6) AS completeness,
        |  round(CAST(u.n_distinct AS DOUBLE) / n, 6) AS uniqueness,
        |  (CASE u."column"
        |     WHEN 'o_orderkey' THEN
        |       round(CAST(u.n_nonnull AS DOUBLE) / n, 6) >= 1.0
        |       AND round(CAST(u.n_distinct AS DOUBLE) / n, 6) >= 1.0
        |     WHEN 'o_custkey' THEN round(CAST(u.n_nonnull AS DOUBLE) / n, 6) >= 1.0
        |     ELSE round(CAST(u.n_nonnull AS DOUBLE) / n, 6) >= 1.0
        |   END) AS pass
        |FROM m, (VALUES
        |  ('o_custkey',     (SELECT nn_ck FROM m), (SELECT nd_ck FROM m)),
        |  ('o_orderkey',    (SELECT nn_ok FROM m), (SELECT nd_ok FROM m)),
        |  ('o_orderstatus', (SELECT nn_os FROM m), (SELECT nd_os FROM m))
        |) AS u("column", n_nonnull, n_distinct)""".stripMargin,
    // NULL predicate = violation (fail-closed) in both engines via the
    // same coalesce; concat_ws skips the non-violated NULL slots exactly
    // like array_join over the compacted array
    "x_quality_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(',',
        |    CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 'qty_le_45' END,
        |    CASE WHEN NOT coalesce(l_discount <= 0.08, FALSE) THEN 'discount_le_8pct' END,
        |    CASE WHEN NOT coalesce(l_tax <= 0.06, FALSE) THEN 'tax_le_6pct' END) AS reasons
        |FROM lineitem
        |WHERE NOT coalesce(l_quantity <= 45, FALSE)
        |   OR NOT coalesce(l_discount <= 0.08, FALSE)
        |   OR NOT coalesce(l_tax <= 0.06, FALSE)""".stripMargin,
  )
}
