package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline: the end-to-end path a training
  * corpus takes through this library, as one operator —
  *
  *   quality filter → exact dedup → benchmark decontamination → split
  *
  * Each stage is the already-verified operator ([[TextAnalysis
  * .gopherishFlags]], [[Dedup]]'s digest keep-first, [[Decontamination
  * .decontaminate]], [[Sampling.assignSplit]]); this wrapper exists
  * because composition itself is what production runs, so composition
  * itself is what gets oracle-checked (`x_curate` mirrors all four stages
  * in one SQL statement).
  *
  * Scale shape is the sum of its parts — quality is a per-row projection
  * fused into the scan, dedup shuffles (digest, id) pairs, decontamination
  * is a broadcast map-side join, the split is a per-row hash — so the
  * pipeline reads the corpus once and shuffles only narrow columns.
  */
object Curation {

  /** Run the full curation pipeline; returns surviving (idCol, split).
    *
    * @param docs      training corpus (idCol, textCol)
    * @param bench     benchmark/eval set to decontaminate against (broadcast)
    * @param splits    (name, weight) split spec, weights summing to <= 1
    * @param shingleN  decontamination shingle width in tokens. BREAKING
    *                  CHANGE (v13): the default moved from 3 to 13 — the
    *                  published-recipe range is 8–13, and 3-gram flagging
    *                  at corpus scale is mostly false positives. Callers
    *                  that relied on the old default now get different
    *                  (strictly fewer) contamination drops; pass
    *                  `shingleN = 3` explicitly to keep the old survivors
    * @param languages when set, keep only docs whose [[TextAnalysis.langId]]
    *                  is in the set (the C4/Gopher language gate); another
    *                  per-row predicate fused into the same corpus scan
    * @param nearDup   when set to (simhashBits, maxHamming), add a
    *                  near-duplicate stage after exact dedup: SimHash
    *                  Hamming pairs → transitive clusters
    *                  ([[Dedup.duplicateClusters]]) → keep each cluster's
    *                  minimum id ([[Dedup.keepCanonical]]). Clustering is
    *                  diameter-free (large-star/small-star fallback), so
    *                  long near-duplicate chains cannot abort the run;
    *                  `ccMaxIters` is the total-round bug guard passed
    *                  through to [[Dedup.keepCanonical]]
    * @param nearDupPairs when set (requires `nearDup`), a precomputed
    *                  near-dup pair set (id_a, id_b) — e.g. a pairs store
    *                  another pipeline maintains — used INSTEAD of
    *                  recomputing SimHash pairs in-query. Pairs are
    *                  restricted to the surviving ids on both endpoints
    *                  first, which makes "full-corpus pairs, filtered"
    *                  equal to "pairs computed on the survivors" (pair
    *                  membership is pairwise, so the restriction is exact).
    *                  This is the production shape: pairs are computed
    *                  once per corpus, not once per question.
    * @param mediaDup  when set to (phashBits, maxHamming), add a media
    *                  near-duplicate stage after the text stages:
    *                  perceptual-hash fingerprints over the docs treated
    *                  as media payloads ([[Multimodal.phashNearDuplicates]]
    *                  — pigeonhole Hamming blocking, never all-pairs) →
    *                  the same transitive-cluster + keep-minimum election.
    *                  Visually-near-identical assets collapse the way
    *                  near-identical text does; with a real codec the
    *                  fingerprint source swaps, the stage stays.
    * @param mediaDupPairs when set (requires `mediaDup`), a precomputed
    *                  phash pair set (id_a, id_b) — the staged media twin
    *                  of `nearDupPairs`, restricted to surviving ids on
    *                  both endpoints (exact for the same pairwise-
    *                  membership reason). Production computes the phash
    *                  pair store once per corpus generation.
    * @param urlGate   when set to (urls, urlCol, rules), a domain
    *                  blocklist gate BEFORE the quality stage — the first
    *                  stage of the public web recipes (C4/RefinedWeb cut
    *                  blocked domains before any content pass): `urls`
    *                  maps `idCol` to a URL column `urlCol`; docs whose
    *                  host a rule blocks ([[Urls.blockedHostIds]] — exact
    *                  host or `*.domain` proper-subdomain wildcard, one
    *                  broadcast suffix equi-join, never a corpus regex)
    *                  are dropped, as are docs with NO url row (a
    *                  crawl-less document has no provenance to gate on —
    *                  the conservative web-recipe posture)
    * @param qualityModel when set to (weights, bias, minScore), a
    *                  model-based quality gate after the hard Gopher
    *                  thresholds: [[TextAnalysis.qualityScoreExpr]] over
    *                  the SAME metric columns the flags pass computed
    *                  (no second tokenization), kept when
    *                  `score >= minScore` — the standard second filter
    *                  (fastText-recipe shape) fused into the same scan
    */
  def curate(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      shingleN: Int = 13,
      minHits: Long = 1L,
      languages: Option[Set[String]] = None,
      nearDup: Option[(Int, Int)] = None,
      ccMaxIters: Int = 25,
      nearDupPairs: Option[DataFrame] = None,
      mediaDup: Option[(Int, Int)] = None,
      mediaDupPairs: Option[DataFrame] = None,
      urlGate: Option[(DataFrame, String, DataFrame)] = None,
      qualityModel: Option[(Seq[(String, Double)], Double, Double)] = None): DataFrame = {
    require(nearDupPairs.isEmpty || nearDup.nonEmpty,
      "nearDupPairs requires nearDup: staged pairs are only consumed by the " +
        "near-duplicate stage, which nearDup enables")
    require(mediaDupPairs.isEmpty || mediaDup.nonEmpty,
      "mediaDupPairs requires mediaDup: staged pairs are only consumed by the " +
        "media near-duplicate stage, which mediaDup enables")
    // the media stage routes ids through Multimodal's LONG id schema:
    // a string id would cast to null, no pairs would form, and the stage
    // would silently remove nothing — refuse non-integral ids up front
    if (mediaDup.nonEmpty) {
      val t = docs.schema(idCol).dataType
      require(Seq("byte", "short", "integer", "long").contains(t.typeName),
        s"mediaDup requires an integral $idCol (got ${t.typeName}): "
          + "Multimodal's media schema keys on long ids")
    }
    // URL blocklist gate first: the cheapest cut (a ~30-byte host key)
    // happens before any tokenization; survivors = docs whose url row
    // exists and is not blocked
    val gated = urlGate.fold(docs) { case (urls, urlCol, rules) =>
      docs.join(
        Urls.filterBlockedHosts(urls, idCol, urlCol, rules).select(col(idCol)),
        Seq(idCol), "left_semi")
    }
    // keepText = one corpus scan: quality metrics, the keep filter, the
    // optional model score and the downstream stages all read the same
    // projection — no semi-join back, no second tokenization
    val flagged = TextAnalysis.gopherishFlags(gated, idCol, textCol, keepText = true)
      .filter(col("keep"))
    val quality = qualityModel.fold(flagged) { case (w, b, minScore) =>
        flagged.filter(TextAnalysis.qualityScoreExpr(w, b) >= lit(minScore))
      }
      .select(col(idCol), col(textCol))
    val kept = languages.fold(quality) { ls =>
      quality.filter(TextAnalysis.langId(col(textCol))
        .isInCollection(ls.toSeq.sorted))
    }
    val hashed = kept.withColumn("__content_hash",
      graft.functions.HashColumns.hashExpr(Seq(col(textCol))))
    val w = Window.partitionBy("__content_hash").orderBy(col(idCol))
    val deduped = hashed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__content_hash")
    val nearDeduped = nearDup.fold(deduped) { case (bits, maxHam) =>
      val pairs = nearDupPairs.fold(
        Dedup.simhashNearDuplicates(deduped, idCol, textCol, bits, maxHam)) { staged =>
        // restrict staged full-corpus pairs to survivors on BOTH endpoints:
        // exactly the pair set a fresh computation over `deduped` yields
        val ids = deduped.select(col(idCol))
        staged.join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
          .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
      }
      Dedup.keepCanonical(deduped, idCol, pairs, maxIters = ccMaxIters)
    }
    val mediaDeduped = mediaDup.fold(nearDeduped) { case (bits, maxHam) =>
      val pairs = mediaDupPairs.fold(
        Multimodal.phashNearDuplicates(
          Multimodal.asMedia(nearDeduped, idCol, textCol), bits, maxHam)) { staged =>
        // same exactness argument as nearDupPairs: phash membership is
        // per-document, so full-corpus pairs restricted to survivors on
        // both endpoints equal pairs computed on the survivors
        val ids = nearDeduped.select(col(idCol))
        staged.join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
          .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
      }
      Dedup.keepCanonical(nearDeduped, idCol, pairs, maxIters = ccMaxIters)
    }
    val clean = Decontamination.decontaminate(
      mediaDeduped, bench, idCol, textCol, shingleN, minHits)
    Sampling.assignSplit(clean.select(col(idCol)), idCol, splits)
  }

  /** The per-document STAGED PREFIX of the curation pipeline — every
    * gate-independent fact [[curate]]'s stages derive from the text,
    * computed ONCE per corpus generation and persisted, so the family of
    * curation questions (plain, url-gated, model-gated, language-gated,
    * near-dup, media-dup) re-reads a narrow table instead of
    * re-tokenizing the corpus per question:
    *
    *  - `keep`       — the [[TextAnalysis.gopherishFlags]] verdict (the
    *                   hard Gopher thresholds);
    *  - `q_score`    — the fixed-weight model score over the same metric
    *                   columns (the column exists ONLY when a model is
    *                   staged — an always-null column would let a later
    *                   `minScore` gate silently drop every row instead
    *                   of refusing a model-less prefix);
    *  - `lang`       — [[TextAnalysis.langId]];
    *  - `content_hash` — the exact-dedup digest;
    *  - `contaminated` — "shares ≥ minHits shingles with the benchmark"
    *                   ([[Decontamination.contaminationReport]]'s flag —
    *                   per-document, so it commutes with every later
    *                   gate and election).
    *
    * All five are PER-DOCUMENT functions of the text (and the fixed
    * bench/model), which is exactly why staging is sound: each curate
    * question's gates select a SUBSET of documents, and subset-filtering
    * commutes with per-document facts — only the dedup keep-first and
    * the near-dup elections depend on which documents survive, and those
    * run per-question in [[curateFromPrefix]] over these narrow columns.
    *
    * @return (idCol, keep, q_score, lang, content_hash, contaminated)
    */
  def curatePrefix(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 13,
      minHits: Long = 1L,
      qualityModel: Option[(Seq[(String, Double)], Double)] = None): DataFrame = {
    val flagged = TextAnalysis.gopherishFlags(docs, idCol, textCol, keepText = true)
    val scoreCol = qualityModel.map { case (w, b) =>
      TextAnalysis.qualityScoreExpr(w, b).as("q_score")
    }
    val base = flagged.select(Seq(col(idCol), col("keep")) ++ scoreCol ++ Seq(
      TextAnalysis.langId(col(textCol)).as("lang"),
      graft.functions.HashColumns.hashExpr(Seq(col(textCol))).as("content_hash")): _*)
    val flags = Decontamination.contaminationReport(
        docs, bench, idCol, textCol, shingleN, minHits)
      .select(col("doc_id").as(idCol), col("contaminated"))
    base.join(flags, Seq(idCol))
  }

  /** [[curate]] answered from a staged [[curatePrefix]] — EQUAL output
    * for the corresponding gate configuration (spec-pinned per gate), at
    * narrow-column cost: the corpus text is never read. Gates filter the
    * staged per-document facts; only the survivor-dependent stages run
    * here (exact-dedup keep-first over (content_hash, id) pairs, the
    * near-dup/media elections over STAGED pair stores restricted to
    * survivors — exact because pair membership is pairwise, the
    * [[curate]] argument).
    *
    * @param urlKeepIds   when set, keep only these ids (the url gate's
    *                     survivor side — [[Urls.filterBlockedHosts]] of
    *                     the url table, id column projected)
    * @param minScore     when set, require `q_score >= minScore` (the
    *                     prefix must have been staged WITH the model)
    * @param languages    when set, keep only these [[TextAnalysis.langId]]
    *                     classes
    * @param nearDupPairs when set, the SimHash near-dup election runs
    *                     over these staged pairs (cluster keep-minimum)
    * @param mediaDupPairs when set, the media election follows, same form
    * @return (idCol, split)
    */
  def curateFromPrefix(
      prefix: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      urlKeepIds: Option[DataFrame] = None,
      minScore: Option[Double] = None,
      languages: Option[Set[String]] = None,
      nearDupPairs: Option[DataFrame] = None,
      mediaDupPairs: Option[DataFrame] = None,
      ccMaxIters: Int = 25): DataFrame = {
    require(minScore.isEmpty || prefix.columns.contains("q_score"),
      "minScore needs a prefix staged with a quality model")
    val gated = urlKeepIds.fold(prefix) { ids =>
      prefix.join(ids.select(col(idCol)), Seq(idCol), "left_semi")
    }
    val quality = minScore.fold(gated.filter(col("keep"))) { ms =>
      gated.filter(col("keep") && col("q_score") >= lit(ms))
    }
    val kept = languages.fold(quality) { ls =>
      quality.filter(col("lang").isInCollection(ls.toSeq.sorted))
    }
    val w = Window.partitionBy("content_hash").orderBy(col(idCol))
    val deduped = kept.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("contaminated"))
    def elect(cur: DataFrame, pairs: Option[DataFrame]): DataFrame =
      pairs.fold(cur) { staged =>
        val ids = cur.select(col(idCol))
        val restricted = staged
          .join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
          .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
        Dedup.keepCanonical(cur, idCol, restricted, maxIters = ccMaxIters)
      }
    val elected = elect(elect(deduped, nearDupPairs), mediaDupPairs)
    Sampling.assignSplit(
      elected.filter(!col("contaminated")).select(col(idCol)), idCol, splits)
  }

  /** Standing state the steady-state curation loop accumulates — three
    * narrow stores, each fed by the matching novelty output of
    * [[curateIncremental]]:
    *
    *  - `knownDigests`   — `content_hash` of every GATE-SURVIVING content
    *                       class ingested so far (32 bytes/class);
    *  - `knownCanonical` — `canonical_url` of every blocklist-surviving
    *                       URL class (the url tier's store; present iff
    *                       the tier runs);
    *  - `bandIndex`      — (id, band, key) LSH band rows of every
    *                       EXACT-SURVIVING ingested document, kept AND
    *                       near-cut (the corpus-wide bucket election
    *                       consults every exact survivor, so the
    *                       incremental law needs both — the
    *                       [[Dedup.paragraphBandIndex]] convention);
    *                       present iff the near tier runs.
    *  - `fpIndex`        — blocked SimHash rows (id, fp, blk, bval) of
    *                       every exact-surviving ingested document
    *                       ([[Dedup.simhashBlockedIndex]]); present iff
    *                       the TRANSITIVE near tier (`nearCc`) runs.
    *  - `ccLabels`       — the standing (id, cluster_id) labeling over
    *                       the Hamming-pair graph of those documents
    *                       ([[Dedup.duplicateClusters]] fixpoint); a
    *                       MAINTAINED store (each batch REPLACES it with
    *                       [[Dedup.updateClusters]]' output — swap-write
    *                       it, don't append); present iff `nearCc` runs.
    */
  final case class CurationState(
      knownDigests: DataFrame,
      knownCanonical: Option[DataFrame] = None,
      bandIndex: Option[DataFrame] = None,
      fpIndex: Option[DataFrame] = None,
      ccLabels: Option[DataFrame] = None)

  /** One batch's output: the surviving (idCol, split) rows plus the
    * novelty appends that keep the NEXT run incremental. Append each
    * novelty frame to its store and re-delivering the same batch ingests
    * nothing (spec-pinned). `ccLabels` is the exception to the
    * append-only shape: it is the FULL updated labeling and REPLACES the
    * standing `ccLabels` store (the [[Dedup.updateClusters]] maintenance
    * contract — labels of standing docs can change when a batch bridges
    * their components). */
  final case class CurationIncrement(
      survivors: DataFrame,
      novelDigests: DataFrame,
      novelCanonical: Option[DataFrame] = None,
      novelBands: Option[DataFrame] = None,
      novelFps: Option[DataFrame] = None,
      ccLabels: Option[DataFrame] = None)

  /** Empty standing state (run the first batch against this; its novelty
    * outputs ARE the initial stores). */
  def emptyState(
      spark: org.apache.spark.sql.SparkSession,
      url: Boolean = false,
      near: Boolean = false,
      nearCc: Boolean = false): CurationState = {
    def empty(cols: (String, String)*): DataFrame =
      spark.range(0).select(cols.map { case (n, t) =>
        lit(null).cast(t).as(n) }: _*)
    CurationState(
      knownDigests = empty("content_hash" -> "string"),
      knownCanonical =
        if (url) Some(empty("canonical_url" -> "string")) else None,
      bandIndex =
        if (near) Some(empty("id" -> "long", "band" -> "int", "key" -> "long"))
        else None,
      fpIndex =
        if (nearCc) Some(empty("id" -> "long", "fp" -> "long",
          "blk" -> "int", "bval" -> "long")) else None,
      ccLabels =
        if (nearCc) Some(empty("id" -> "long", "cluster_id" -> "long"))
        else None)
  }

  /** STEADY-STATE composed curation — the production web-ingest loop:
    * gate ONE new batch against standing stores instead of re-running
    * the corpus-wide pipeline, at batch cost forever. Stage order is the
    * corpus-wide composition's:
    *
    *   url tier (blocklist + standing-canonical novelty) → quality gates
    *   → exact dedup vs the standing digest store → banded near-dup vs
    *   the standing band index → benchmark decontamination → split
    *
    * THE INCREMENTAL LAW (spec-pinned): with stores accumulated from the
    * ingested corpus (equivalently: by running this operator over the
    * ingested batches in order, appending each increment's novelty),
    * the survivors equal the CORPUS-WIDE composition over
    * ingested ∪ batch restricted to the batch — under the historization
    * id convention (batch ids exceed ingested ids, so every keep-min
    * election favors the ingested side, which is what "standing store
    * wins" implements). Per-document stages (gates, contamination,
    * split) restrict trivially; the three election stages restrict
    * because (a) a batch URL/content class with a standing occurrence
    * always loses to it, (b) intra-batch elections see every batch
    * class, and (c) duplicate content shares every band bucket, so
    * electing among batch EXACT-survivors equals electing among all
    * batch docs (the one-pass-election argument of
    * [[Dedup.nearDedupParagraphsIncremental]] lifted to documents).
    *
    * The near tier is BANDING-AS-PREDICATE (bucket keep-min, the
    * FineWeb/paragraph convention) rather than [[curate]]'s
    * simhash-pairs + connected components: bucket-local elections
    * restrict to a batch exactly, while transitive clusters can span
    * standing docs and would need the incremental-CC machinery — the
    * documented trade for a steady-state loop with index-probe cost.
    *
    * Scale shape: the batch never meets corpus payloads — it probes the
    * canonical store (~100-byte keys), the digest store (32-byte keys),
    * and the band index (8-byte keys) with hash joins; the bench gram
    * set broadcasts ([[Decontamination.decontaminate]]); everything else
    * is per-row. Steady-state cost is O(batch), never O(corpus).
    *
    * @param urlGate (urls, urlCol, rules) — requires
    *                `state.knownCanonical`; docs cut when blocked, when
    *                their canonical URL is standing, or when a smaller
    *                batch id shares it
    * @param nearDup (n, k, bands) minhash shape — requires
    *                `state.bandIndex`
    * @param nearDupSkew (hotBucketThreshold, salt) — skew armor for
    *                WHICHEVER near tier runs. Banded tier: on
    *                boilerplate-heavy corpora one
    *                LSH bucket (a site template's band key) can hold a
    *                large share of the batch and pin its whole probe on
    *                one reducer. The operator first measures the batch's
    *                hottest bucket (one map-side-combined count over the
    *                band rows — batch-sized, skew-free by the combiner);
    *                ONLY past the threshold does the probe switch to the
    *                salted form ([[SkewJoin.saltedInnerJoin]] against the
    *                DISTINCT standing keys — a hot key then occupies
    *                `salt` reducers) and the batch election to a
    *                combine-then-broadcast-join shape instead of the
    *                window sort. CC tier: the same measured switch over
    *                the batch's hottest (blk, bval) Hamming block — a
    *                fingerprint-identical boilerplate block would heap
    *                one reducer in both the standing probe and the
    *                intra-batch self-join; past the threshold both run
    *                as [[SkewJoin.saltedInnerJoin]] with the standing/
    *                left side salted and the batch side replicated.
    *                Row-identical to the plain probe
    *                (spec-pinned); below the threshold the plan is
    *                byte-for-byte the unsalted one, so well-behaved
    *                batches never pay the salt's replication
    * @param nearCc  (simhashBits, maxHamming) — the TRANSITIVE near tier,
    *                mutually exclusive with `nearDup`: the batch's
    *                SimHash blocked rows probe the standing fingerprint
    *                index for cross pairs ([[Dedup.hammingProbePairs]]),
    *                pair up among themselves, and the standing labeling
    *                advances through [[Dedup.updateClusters]] (condensed-
    *                graph repair — batch cost, O(corpus) only in the
    *                final narrow relabel pass). A batch doc is cut iff it
    *                is not its component's minimum id, which under the
    *                increasing-id convention is exactly [[curate]]'s
    *                `nearDup` CC election restricted to the batch — the
    *                transitive semantics the banded tier trades away
    *                (bucket-local elections cannot see A~B~C chains whose
    *                ends share no bucket; the divergence is spec-pinned).
    *                Requires `state.fpIndex` + `state.ccLabels`
    * @return survivors + the novelty appends (+ the replacement labeling
    *         when `nearCc` runs)
    */
  def curateIncremental(
      batch: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      state: CurationState,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      shingleN: Int = 13,
      minHits: Long = 1L,
      languages: Option[Set[String]] = None,
      qualityModel: Option[(Seq[(String, Double)], Double, Double)] = None,
      urlGate: Option[(DataFrame, String, DataFrame)] = None,
      nearDup: Option[(Int, Int, Int)] = None,
      nearDupSkew: Option[(Long, Int)] = None,
      nearCc: Option[(Int, Int)] = None,
      scope: graft.CacheScope = graft.CacheScope.Global,
      ccDriverEdgeBound: Int = 1 << 20): CurationIncrement = {
    require(urlGate.isEmpty || state.knownCanonical.nonEmpty,
      "urlGate requires a standing canonical-URL store in the state")
    require(nearDup.isEmpty || state.bandIndex.nonEmpty,
      "nearDup requires a standing band index in the state")
    require(nearDup.isEmpty || nearCc.isEmpty,
      "nearDup (banding-as-predicate) and nearCc (transitive clusters) are " +
        "alternative near tiers — pick one")
    require(nearCc.isEmpty || (state.fpIndex.nonEmpty && state.ccLabels.nonEmpty),
      "nearCc requires a standing fingerprint index and labeling in the state")
    // url tier: blocklist first (stateless broadcast), then canonical
    // novelty vs the standing store + intra-batch keep-min — the
    // incrementalDuplicateUrls semantics, winners carried forward
    val (urlKept, novelCanonical) = urlGate match {
      case None => (batch, None)
      case Some((urls, urlCol, rules)) =>
        val unblocked = Urls.filterBlockedHosts(urls, idCol, urlCol, rules)
        val winners = scope.persist(Urls.incrementalDuplicateUrls(
          unblocked, idCol, urlCol, state.knownCanonical.get))
        (batch.join(winners.select(col("keep_id").as(idCol)), Seq(idCol), "left_semi"),
          Some(winners.select(col("canonical_url"))))
    }
    // per-document gates — the curatePrefix facts computed for THIS batch
    val flagged = TextAnalysis.gopherishFlags(urlKept, idCol, textCol, keepText = true)
      .filter(col("keep"))
    val quality = qualityModel.fold(flagged) { case (w, b, minScore) =>
        flagged.filter(TextAnalysis.qualityScoreExpr(w, b) >= lit(minScore))
      }
      .select(col(idCol), col(textCol))
    val kept = languages.fold(quality) { ls =>
      quality.filter(TextAnalysis.langId(col(textCol)).isInCollection(ls.toSeq.sorted))
    }
    // exact tier: standing digest anti-join + intra-batch keep-min; the
    // survivors carry content_hash = exactly the novel classes
    val exact = scope.persist(
      Dedup.incrementalExact(kept, idCol, Seq(textCol), state.knownDigests))
    val novelDigests = exact.select(col("content_hash"))
    // near tier: band rows of every batch exact-survivor probe the
    // standing index (cut on any occupied bucket) and elect keep-min
    // among themselves; ALL of them append (kept and cut — the corpus-
    // wide election consults every exact survivor)
    val (nearKept, novelBands) = nearDup match {
      case None => (exact.drop("content_hash"), None)
      case Some((n, k, bands)) =>
        val bandRows = scope.persist(Dedup.minhashBandIndex(
          exact.select(col(idCol), col(textCol)), idCol, textCol, n, k, bands))
        // skew measurement (only when armor is requested): the hottest
        // batch bucket, from one map-side-combined count — a bounded
        // batch-sized job, never a corpus pass
        val salted = nearDupSkew.filter { case (threshold, _) =>
          val hot = bandRows.groupBy("band", "key").count()
            .agg(max(col("count"))).head()
          !hot.isNullAt(0) && hot.getLong(0) > threshold
        }
        val (standingCut, batchCut) = salted match {
          case Some((_, salt)) =>
            // hot-bucket path: the standing side collapses to DISTINCT
            // keys first (the combiner absorbs ITS skew), then the probe
            // is the salted equi-join — one hot batch key spreads over
            // `salt` reducers; the election aggregates per-bucket minima
            // (combine again) and joins them back broadcast, replacing
            // the window sort that would heap the hot bucket on one task
            val standingKeys = state.bandIndex.get.select("band", "key").distinct()
            val sCut = SkewJoin.saltedInnerJoin(
              bandRows.select(col("id"), col("band"), col("key")),
              standingKeys, Seq("band", "key"), salt)
              .select(col("id")).distinct()
            val mins = bandRows.groupBy("band", "key")
              .agg(min(col("id")).as("__bmin"))
            // the join back is SALTED too, not broadcast: `mins` is one
            // row per distinct batch bucket — on exactly the large skewed
            // batches this path exists for, that can exceed the broadcast
            // limit, while its per-key single row makes it the cheap
            // replicated side of the salted join (r18 review finding)
            val bCut = SkewJoin.saltedInnerJoin(bandRows, mins, Seq("band", "key"), salt)
              .filter(col("id") =!= col("__bmin"))
              .select(col("id")).distinct()
            (sCut, bCut)
          case None =>
            val sCut = bandRows.as("b")
              .join(state.bandIndex.get.as("c"),
                col("b.band") === col("c.band") && col("b.key") === col("c.key"),
                "left_semi")
              .select(col("id")).distinct()
            val w = Window.partitionBy("band", "key")
            val bCut = bandRows
              .withColumn("__bmin", min(col("id")).over(w))
              .filter(col("id") =!= col("__bmin"))
              .select(col("id")).distinct()
            (sCut, bCut)
        }
        val cut = standingCut.unionByName(batchCut).distinct()
        (exact.join(cut.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
          .drop("content_hash"),
          Some(bandRows))
    }
    // transitive near tier: batch blocked fingerprints probe the standing
    // index (cross pairs) and pair among themselves (intra pairs); the
    // standing labeling advances by condensed-graph repair, and a batch
    // doc survives iff it is its component's minimum — the CC election of
    // the corpus-wide pipeline, answered at batch probe cost
    val (ccKept, novelFps, newLabels) = nearCc match {
      case None => (nearKept, None, None)
      case Some((bits, maxHam)) =>
        val batchBlocked = scope.persist(Dedup.simhashBlockedIndex(
          exact.select(col(idCol), col(textCol)), idCol, textCol, bits, maxHam))
        // the banded tier's skew switch applied to Hamming blocks: one
        // map-side-combined count over the batch's (blk, bval) rows —
        // batch-sized, skew-free by the combiner — gates the salted form
        val salted = nearDupSkew.filter { case (threshold, _) =>
          val hot = batchBlocked.groupBy("blk", "bval").count()
            .agg(max(col("count"))).head()
          !hot.isNullAt(0) && hot.getLong(0) > threshold
        }
        val (cross, intra) = salted match {
          case Some((_, salt)) =>
            // pair work in a bucket is the PRODUCT of its two sides, so
            // salting ONE side spreads the whole bucket: the standing
            // side salts (corpus-scale — must shuffle exactly once), the
            // batch side replicates salt× (batch-sized, the cheap side by
            // the steady-state assumption). Row-identical to the plain
            // probe (spec-pinned on a planted hot block).
            val b = batchBlocked.select(col("id").as("__b_id"),
              col("fp").as("__b_fp"), col("blk"), col("bval"))
            val crossS = SkewJoin.saltedInnerJoin(
                state.fpIndex.get, b, Seq("blk", "bval"), salt)
              .filter(bit_count(col("fp").bitwiseXOR(col("__b_fp"))) <= maxHam)
              .select(col("id").as("id_a"), col("__b_id").as("id_b"))
              .dropDuplicates(Seq("id_a", "id_b"))
            val intraS = SkewJoin.saltedInnerJoin(
                batchBlocked, b, Seq("blk", "bval"), salt)
              .filter(col("id") < col("__b_id") &&
                bit_count(col("fp").bitwiseXOR(col("__b_fp"))) <= maxHam)
              .select(col("id").as("id_a"), col("__b_id").as("id_b"))
              .dropDuplicates(Seq("id_a", "id_b"))
            (crossS, intraS)
          case None =>
            val crossP = Dedup.hammingProbePairs(state.fpIndex.get, batchBlocked, maxHam)
            val intraP = batchBlocked.as("a").join(batchBlocked.as("b"),
                col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
                  col("a.id") < col("b.id"))
              .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHam)
              .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
              .dropDuplicates(Seq("id_a", "id_b"))
            (crossP, intraP)
        }
        val labels = scope.persist(Dedup.updateClusters(
          state.ccLabels.get, cross.unionByName(intra), scope = scope,
          driverEdgeBound = ccDriverEdgeBound))
        val cut = labels.filter(col("cluster_id") =!= col("id")).select(col("id"))
        (nearKept.join(cut.withColumnRenamed("id", idCol), Seq(idCol), "left_anti"),
          Some(batchBlocked), Some(labels))
    }
    val clean = Decontamination.decontaminate(
      ccKept, bench, idCol, textCol, shingleN, minHits)
    CurationIncrement(
      survivors = Sampling.assignSplit(clean.select(col(idCol)), idCol, splits),
      novelDigests = novelDigests,
      novelCanonical = novelCanonical,
      novelBands = novelBands,
      novelFps = novelFps,
      ccLabels = newLabels)
  }

  /** Store roots for a curation state persisted as ONE pinned snapshot
    * ([[commitCurationSnapshot]]); optional paths present iff the state
    * carries the matching store. */
  final case class CurationStorePaths(
      manifestPath: String,
      digestsPath: String,
      canonicalPath: Option[String] = None,
      bandsPath: Option[String] = None,
      fpsPath: Option[String] = None,
      labelsPath: Option[String] = None)

  /** Commit a [[CurationState]] atomically: every store writes a
    * FULL-content generation, then one manifest pins them all
    * ([[graft.sources.Store.commitSnapshot]]'s crash contract — stores
    * first, manifest last, so a crash ANYWHERE leaves the previously
    * pinned state complete and visible; newly written generations stay
    * unreferenced until the manifest lands). This is the batch-caller
    * contract [[curateStateTakedown]]'s scaladoc used to delegate to
    * write ordering: persist the takedown's output through this and
    * readers get old-or-new, never half-purged, without reading anything.
    *
    * Layout note: full-content generations — the batch deployment shape
    * (takedown and rebuilds produce full frames anyway). The STREAMING
    * loop's delta-generation layout ([[graft.streaming
    * .StreamingHistorization.curateMaintainStream]]'s `nearCc` mode) is a
    * different store convention; take THAT down with
    * [[curateTakedownSnapshot]] (one atomic rebase commit — no
    * compact-to-full pass), and fold its per-batch delta growth with
    * [[graft.sources.Store.compactSnapshotDeltas]].
    *
    * @return the committed manifest generation
    */
  def commitCurationSnapshot(
      state: CurationState,
      paths: CurationStorePaths,
      keep: Int = 2): Long = {
    def aligned(name: String, df: Option[DataFrame], p: Option[String]) = {
      require(df.isEmpty == p.isEmpty,
        s"$name store and its path must come together (state has ${df.nonEmpty}, " +
          s"paths has ${p.nonEmpty})")
      df.zip(p).map { case (d, path) => (name, path, d) }
    }
    val stores = Seq(("digests", paths.digestsPath, state.knownDigests)) ++
      aligned("canonical", state.knownCanonical, paths.canonicalPath) ++
      aligned("bands", state.bandIndex, paths.bandsPath) ++
      aligned("fps", state.fpIndex, paths.fpsPath) ++
      aligned("labels", state.ccLabels, paths.labelsPath)
    graft.sources.Store.commitSnapshot(
      state.knownDigests.sparkSession, paths.manifestPath, stores, keep)
  }

  /** Read back the newest (or `manifestGen`-pinned) committed curation
    * snapshot — the consistent cross-store state a maintenance pass or
    * the steady-state loop resumes from. None when nothing has committed. */
  def readCurationSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      paths: CurationStorePaths,
      manifestGen: Option[Long] = None): Option[(Long, CurationState)] = {
    val wanted = Map("digests" -> paths.digestsPath) ++
      paths.canonicalPath.map("canonical" -> _) ++
      paths.bandsPath.map("bands" -> _) ++
      paths.fpsPath.map("fps" -> _) ++
      paths.labelsPath.map("labels" -> _)
    graft.sources.Store.readSnapshot(spark, paths.manifestPath, wanted, manifestGen)
      .map { case (g, m) =>
        g -> CurationState(m("digests"), m.get("canonical"), m.get("bands"),
          m.get("fps"), m.get("labels"))
      }
  }

  /** TAKEDOWN of standing curation state — the erasure/compliance twin of
    * [[curateIncremental]]: when documents leave the corpus (copyright
    * takedown, right-to-be-forgotten), the standing stores must forget
    * their keys, or the steady-state loop would keep suppressing
    * re-submissions of content whose prior copy no longer exists — and an
    * erasure request isn't honored while the content's digest, canonical
    * URL, and band fingerprints persist.
    *
    * Key derivation mirrors ingestion exactly: digest =
    * [[Dedup.incrementalExact]]'s content hash of `textCol`; canonical =
    * [[Urls.canonicalizeUrl]] of the removed docs' URLs; band rows delete
    * by id. Deleting the CLASS key is exact, not conservative: a standing
    * class has exactly ONE standing occupant (later duplicates were cut at
    * ingestion, never ingested), so the removed winner's key has no other
    * standing holder — the class correctly re-opens. The precondition is
    * the flip side: `removed` should be docs actually standing in the
    * corpus; taking down an id that was CUT at ingestion (its class winner
    * still stands) would re-open a class that is still occupied. Keys not
    * present in a store anti-join away silently, so takedown is
    * IDEMPOTENT — re-running a takedown (or racing two) converges.
    *
    * CC-tier scope (`fpIndex`/`ccLabels`): the removed ids' fingerprint
    * rows leave the index by id, and the labeling is REPAIRED, not just
    * filtered — a removed document can be the bridge of its component, so
    * the affected components re-cluster over pairs re-derived from the
    * purged index while every other label passes through (the
    * [[Dedup.removeDocsFromClusters]] argument at the same
    * affected-component cost).
    *
    * Near-tier scope: only the removed ids' OWN band rows leave the index.
    * Rows of docs that were near-CUT against the removed doc stay (the
    * index remembers every exact-survivor ever seen — the corpus-wide
    * election needs that), so a re-submission of NEAR (not exact) content
    * can still be suppressed by those other docs' fingerprints. That is
    * the intended erasure semantics: the removed document's fingerprints
    * are gone; fingerprints that remain belong to other documents.
    *
    * Scale shape: takedown batches are small by nature — every derived key
    * frame broadcasts, each store purge is one broadcast anti-join, and
    * corpus payloads are never read. Persist the returned frames through
    * the store's swap write so readers see old-or-new, never half-purged
    * ([[graft.sources.Store]]'s generation contract); the OUT corpus
    * itself purges through the store's own erasure path.
    *
    * @param removed     (idCol, textCol) of the standing docs being removed
    * @param removedUrls (urls, urlCol) for the same ids — required when the
    *                    state carries a canonical store and the url tier
    *                    should forget them; None leaves that store untouched
    * @param strict      when true, enforce the precondition loudly: every
    *                    removed digest (and canonical URL, when urls are
    *                    given) must be STANDING in its store, or the call
    *                    fails before purging anything — taking down an
    *                    ingestion-CUT duplicate would otherwise silently
    *                    delete the still-standing winner's class keys and
    *                    re-open an occupied class. Band rows need no check:
    *                    they delete by the removed doc's OWN id, which is
    *                    exact whether or not that doc was near-cut. Default
    *                    false keeps the idempotent/ghost-key-tolerant
    *                    behavior for retry/replay callers
    * @return the state with every removed key purged
    */
  def curateStateTakedown(
      state: CurationState,
      removed: DataFrame,
      idCol: String,
      textCol: String,
      removedUrls: Option[(DataFrame, String)] = None,
      strict: Boolean = false): CurationState = {
    // mirror curateIncremental's precondition: a labeling without its
    // fingerprint index is an inconsistent state — the repair re-derives
    // affected-component pairs FROM the index, so passing the labeling
    // through unpurged would keep removed ids' label rows (and bridged
    // components merged) silently
    require(state.ccLabels.isEmpty || state.fpIndex.nonEmpty,
      "takedown of a state carrying ccLabels requires its fpIndex: the " +
        "labeling repair re-derives pairs from the fingerprint index")
    val digKeys = removed.select(
      graft.functions.HashColumns.hashExpr(Seq(col(textCol))).as("content_hash"))
    if (strict) {
      // takedown batches are key-sized, so the precondition probe is one
      // bounded anti-join count per store, paid before any purge
      val ghostDigests = digKeys.distinct()
        .join(state.knownDigests, Seq("content_hash"), "left_anti").count()
      require(ghostDigests == 0L,
        s"strict takedown: $ghostDigests removed content digest(s) are not " +
          "standing — removing an ingestion-cut duplicate would re-open a " +
          "class whose winner still stands")
      removedUrls.zip(state.knownCanonical).foreach { case ((urls, urlCol), c) =>
        val ghostCanon = urls
          .select(Urls.canonicalizeUrl(col(urlCol)).as("__rm_canon")).distinct()
          .join(c, col("__rm_canon") <=> col("canonical_url"), "left_anti").count()
        require(ghostCanon == 0L,
          s"strict takedown: $ghostCanon removed canonical URL(s) are not standing")
      }
    }
    val purgedDigests = state.knownDigests
      .join(broadcast(digKeys), Seq("content_hash"), "left_anti")
    val purgedCanonical = state.knownCanonical.map { c =>
      removedUrls.fold(c) { case (urls, urlCol) =>
        // null-safe (<=>): ingestion's novelty probe matches a null
        // canonical key null-safely, so a standing null class (null /
        // uncanonicalizable URL) must be purgeable the same way — a plain
        // `=` anti-join could never remove it
        c.join(
          broadcast(urls.select(
            Urls.canonicalizeUrl(col(urlCol)).as("__rm_canon"))),
          col("canonical_url") <=> col("__rm_canon"), "left_anti")
      }
    }
    val purgedBands = state.bandIndex.map(
      _.join(broadcast(removed.select(col(idCol).as("id"))), Seq("id"), "left_anti"))
    // CC-tier stores: fp rows delete by the removed doc's own id (exact);
    // the labeling repairs per [[Dedup.removeDocsFromClusters]]' argument —
    // only components that CONTAINED a removed id can change (a removal
    // can split one), so re-cluster the affected subgraph only, with its
    // pairs re-derived from the PURGED fingerprint index (the index is the
    // pair source of record here; maxHamming is recoverable from its block
    // geometry: blocks = maxHamming + 1). Every other label passes through.
    val rmIds = broadcast(removed.select(col(idCol).as("id")).distinct())
    val purgedFps = state.fpIndex.map(
      _.join(rmIds, Seq("id"), "left_anti"))
    val purgedLabels = (state.ccLabels, purgedFps) match {
      case (Some(labels), Some(fps)) =>
        val affected = broadcast(
          labels.join(rmIds, Seq("id"), "left_semi").select("cluster_id").distinct())
        // using-joins move the join key to the front — re-select so the
        // returned labeling keeps the store's (id, cluster_id) order
        val untouched = labels.join(affected, Seq("cluster_id"), "left_anti")
          .select("id", "cluster_id")
        val affectedNodes =
          labels.join(affected, Seq("cluster_id"), "left_semi").select("id")
        val sub = fps.join(broadcast(affectedNodes), Seq("id"), "left_semi")
        val maxHam = sub.agg(max(col("blk"))).head.getAs[Any](0) match {
          case null => 0 // no surviving affected fingerprints: nothing to pair
          case b: Int => b // blocks are 0..maxHamming
        }
        val subPairs = sub.as("a").join(sub.as("b"),
            col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
              col("a.id") < col("b.id"))
          .filter(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= maxHam)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .dropDuplicates(Seq("id_a", "id_b"))
        Some(untouched.unionByName(
          Dedup.duplicateClusters(subPairs).select("id", "cluster_id")))
      case (l, _) => l
    }
    CurationState(purgedDigests, purgedCanonical, purgedBands,
      purgedFps, purgedLabels)
  }

  /** TAKEDOWN over the STREAMING loop's delta-generation snapshot layout
    * — the erasure twin of [[graft.streaming.StreamingHistorization
    * .curateMaintainStream]]'s `nearCc` mode, closing the carried gap
    * [[commitCurationSnapshot]] documented ("compact to a full snapshot
    * first"): the compaction IS the takedown commit. The newest manifest
    * resolves the pinned state (delta stores as their `[base, pin]`
    * union, labels at its pin), [[curateStateTakedown]] purges it, and
    * the purged FULL content commits as ONE REBASED snapshot
    * ([[graft.sources.Store.commitSnapshot]] `rebase`): each delta
    * store's new generation is a full snapshot AND its own base, so
    * snapshot readers stop unioning the pre-takedown deltas (which still
    * hold the removed keys — they now back only older manifests, and a
    * compliance deployment follows with [[graft.sources.Store
    * .purgeSnapshot]] to scrub that history).
    *
    * Crash contract inherited whole: stores write first, manifest last —
    * a crash anywhere leaves the prior manifest pinning the intact
    * pre-takedown state, and the orphan full generations sit above its
    * pins (invisible; a later delta commit that unions one sees only
    * duplicate rows of standing content, the documented artifact class).
    * Re-running the takedown converges. The streaming loop resumes on
    * the rebased snapshot unchanged: it carries bases forward through
    * [[graft.sources.Store.readManifestPins]] on every commit.
    *
    * The loop must be QUIESCED across the call (the
    * [[graft.sources.Store.purgeGenerations]] contract): a batch racing
    * the takedown could commit a manifest the takedown never read.
    *
    * @param removed (idCol, textCol) of the standing docs being removed;
    *                textCol must carry THE TEXT THE LOOP HASHED — when
    *                the loop ran the site-content tier, that is the
    *                EXTRACTED main text (what the deployment exported),
    *                not the raw html: digest keys derive from it, and a
    *                raw-html frame would silently purge no digest
    *                (`strict = true` fails loudly on exactly that)
    * @param censusPath the site-census delta store, when the loop runs
    *                   the site-content tier ([[WebContent
    *                   .siteCensusTakedown]] purges it by page id in the
    *                   same atomic commit)
    * @return the committed manifest generation; None when no snapshot
    *         has ever committed (nothing standing to take down)
    */
  def curateTakedownSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      manifestPath: String,
      digestPath: String,
      fpsPath: String,
      labelsPath: String,
      removed: DataFrame,
      idCol: String,
      textCol: String,
      canonicalPath: Option[String] = None,
      removedUrls: Option[(DataFrame, String)] = None,
      censusPath: Option[String] = None,
      strict: Boolean = false,
      keep: Int = Int.MaxValue): Option[Long] = {
    val deltaPaths = Map("digests" -> digestPath, "fps" -> fpsPath) ++
      canonicalPath.map("canonical" -> _) ++ censusPath.map("census" -> _)
    graft.sources.Store.readSnapshotDeltas(
      spark, manifestPath, deltaPaths, Map("labels" -> labelsPath)).map { case (_, m) =>
      // delta unions can carry orphan-generation duplicates; the rebased
      // generation is the store's SET, so dedup each on its row key
      val state = CurationState(
        m("digests").select(col("content_hash")).distinct(),
        canonicalPath.map(_ => m("canonical").select(col("canonical_url")).distinct()),
        None,
        Some(m("fps").select(col("id"), col("fp"), col("blk"), col("bval"))
          .dropDuplicates(Seq("id", "blk"))),
        Some(m("labels").select(col("id"), col("cluster_id"))))
      val purged = curateStateTakedown(
        state, removed, idCol, textCol, removedUrls, strict)
      val purgedCensus = censusPath.map { _ =>
        WebContent.siteCensusTakedown(
          m("census").select(col("host"), col("bh"), col("page")).distinct(),
          removed, idCol)
      }
      val stores = Seq(
        ("digests", digestPath, purged.knownDigests),
        ("fps", fpsPath, purged.fpIndex.get),
        ("labels", labelsPath, purged.ccLabels.get)) ++
        canonicalPath.map(p => ("canonical", p, purged.knownCanonical.get)) ++
        censusPath.zip(purgedCensus).map { case (p, c) => ("census", p, c) }
      graft.sources.Store.commitSnapshot(spark, manifestPath, stores,
        keep = keep, rebase = deltaPaths.keySet)
    }
  }
}
