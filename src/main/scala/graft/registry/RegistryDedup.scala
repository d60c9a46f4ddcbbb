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

/** Registrations: deduplication — exact, MinHash-LSH, SimHash, duplicated spans, clusters, survivor election, fuzzy join, URL canonicalization.
  * One entry per implemented operator, each paired with its DuckDB
  * oracle twin; composed into the driver contract by
  * [[graft.SparkEntry]]. Entries moved verbatim from SparkEntry
  * (r14 split — VERDICT r13 item 7). */
private[graft] object RegistryDedup {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // ---- staged-store BUILD accounting rows: the one-time cost of the
    // artifacts every staged read above amortizes, measured as its own
    // row (compute + persist to scratch) instead of silently landing on
    // whichever read-query touches a store first ----
    "x_stage_build_neardup_pairs" -> ((s, d) =>
      buildScratch(s, "neardup_pairs_b16_h2")(
        Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text", 16, 2))),
    // ---- extensions: dedup ----
    "x_dedup_exact" -> ((s, d) =>
      Dedup.exactDuplicates(Tables.documents(s, d), "doc_id", Seq("text"))),
    "x_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", n = 3, minSim = 0.1)),
    // the subset-duplicate screen: |A∩B| / min(|A|,|B|) — catches a short
    // doc contained in a long one, which Jaccard's union denominator
    // structurally misses (spec pins an explicit planted case)
    "x_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, minContainment = 0.5)),
    // the containment screen wired into the ELECTION path: pairs → CC →
    // keepBest with n_chars scoring, so a contained near-subset LOSES to
    // its container (the container is the longer member of the pair) —
    // the composition real curation runs on subset duplicates. Pairs are
    // computed FRESH over the full corpus, deliberately NOT the staged
    // survivor-restricted shortcut the simhash/phash stages use: their
    // pair membership is per-document (fingerprints), so restriction is
    // exact; containment's df-capped shingle join makes pair membership
    // corpus-relative (dropping docs changes shingle document
    // frequencies), and a restricted staged set would NOT equal a fresh
    // computation over the survivors
    "x_dedup_containment_elect" -> ((s, d) =>
      Dedup.keepBest(Tables.documents(s, d), "doc_id", "n_chars",
        Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, minContainment = 0.5).select("id_a", "id_b"))
        .select("doc_id")),
    "x_dedup_minhash" -> ((s, d) =>
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text", n = 3, k = 8, bands = 4)),
    // cross-run near-dup: odd-id docs are the new batch, the even-id docs'
    // persisted band index plays the accumulated corpus index
    "x_dedup_minhash_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val index = Dedup.minhashBandIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Dedup.incrementalMinhashCandidates(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", index)
    }),
    "x_dedup_minhash_verified" -> ((s, d) =>
      Dedup.minhashNearDuplicates(Tables.documents(s, d), "doc_id", "text",
        n = 3, k = 8, bands = 4, minSim = 0.3)),
    "x_dedup_simhash" -> ((s, d) =>
      Dedup.simhashGroups(Tables.documents(s, d), "doc_id", "text", bits = 16)),
    "x_dedup_simhash_near" -> ((s, d) =>
      Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text",
        bits = 16, maxHamming = 2)),
    // the corpus-scale setting of the same operator: a 64-bit fingerprint
    // (bits=16 saturates its 2^16 space on a real corpus and buckets go
    // quadratic) — exercises the full-width block arithmetic including
    // the sign bit, which carries fingerprint bit 0 at width 64
    "x_dedup_simhash_wide" -> ((s, d) =>
      Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text",
        bits = 64, maxHamming = 3)),
    // record-linkage dedup: every supplier-name pair within one edit,
    // found by PassJoin segment pigeonhole blocking with an exact
    // levenshtein verify. Sequential ID-style names ("Supplier#000...")
    // keep the true near-pair count linear-ish in rows — the density
    // regime the operator is for; saturated template spaces (part names:
    // 2% of ALL pairs are true dist-1 matches at sf0.1) make any exact
    // method's OUTPUT quadratic and belong to the n-gram/simhash family
    // instead (density caveat on the operator's scaladoc)
    "x_dedup_editdist" -> ((s, d) =>
      Dedup.editDistanceNearDuplicates(Tables.supplier(s, d), "s_suppkey", "s_name",
        maxDist = 1)),
    // transitive duplicate clusters over the simhash near-dup pairs: the
    // step pair emitters stop short of — A~B, B~C collapse into one
    // cluster named by the minimum member
    "x_dedup_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(
          Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text",
            bits = 16, maxHamming = 2))
        .select(col("id").as("doc_id"), col("cluster_id"))),
    // incremental cluster maintenance: pairs NOT touching a doc_id ≡ 9
    // (mod 10) play the standing labeling, every pair touching one plays
    // the new ~10% batch — a realistic ingestion slice, so the query's
    // cost demonstrates the batch-cost claim (the r8 registration made
    // the "batch" half the corpus and cost two full CC loops).
    // updateClusters must be row-identical to the full recompute — so the
    // oracle IS the x_dedup_clusters statement. Pairs come from the
    // staged store, and the STANDING labeling is staged too: before the
    // batch arrives, production's labels store already exists — the
    // query's steady-state cost is the batch update, not a standing-side
    // CC re-run per question (that fresh cost stays measured by
    // x_dedup_clusters)
    "x_dedup_clusters_incremental" -> ((s, d) => {
      val pairs = stagedSimhashPairs(s, d, 16, 2)
      val batch = pairs.filter(col("id_a") % 10 === 9 || col("id_b") % 10 === 9)
      Dedup.updateClusters(stagedStandingLabels(s, d), batch)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),
    // the takedown direction: remove the doc_id ≡ 3 (mod 25) batch (~4%)
    // from the standing labeling + pair set at affected-component cost;
    // removeDocsFromClusters must equal the full recompute without the
    // ids, so the oracle is the recursive-CC statement over the kept
    // pairs. Standing labels + pairs are the staged WIDE (64-bit) stores:
    // at the corpus-scale fingerprint width components are small, so the
    // affected-component claim does real work — on the saturated 16-bit
    // graph (one giant component at sf0.1) any removal's "affected
    // subgraph" IS the whole graph and the repair degenerates to a full
    // CC by graph shape, not by operator design (dense-graph correctness,
    // including bridge splits, stays spec-pinned in DedupSpec)
    "x_dedup_clusters_removed" -> ((s, d) => {
      val pairs = stagedSimhashPairs(s, d, 64, 3)
      val removed = Tables.documents(s, d).filter(col("doc_id") % 25 === 3).select("doc_id")
      val (labels2, _) = Dedup.removeDocsFromClusters(
        stagedSimhashClusters(s, d, 64, 3), pairs, removed)
      labels2.select(col("id").as("doc_id"), col("cluster_id"))
    }),
    // one-row dedup dataset-card stats — a READ of the staged labeling
    // (the labelsPath store the maintenance loop keeps current), the way
    // production answers it; the labeling's derivation is oracle-checked
    // end-to-end by x_dedup_clusters
    "x_dedup_cluster_stats" -> ((s, d) =>
      Dedup.clusterStats(stagedSimhashClusters(s, d, 16, 2))),
    // corpus-level cluster dedup: drop every clustered doc except the
    // cluster minimum; unpaired docs survive. Losers come from the staged
    // labeling — the payload-bearing corpus joins the label store once
    "x_dedup_canonical" -> ((s, d) =>
      Dedup.keepCanonicalWith(Tables.documents(s, d), "doc_id",
          stagedSimhashClusters(s, d, 16, 2))
        .select("doc_id")),
    // score-elected survivor: within each simhash cluster the LONGEST
    // member survives (ties: min id) — the election real curation runs,
    // instead of keepCanonical's min-id convention; election over the
    // staged labeling
    "x_dedup_keep_best" -> ((s, d) =>
      Dedup.keepBestWith(Tables.documents(s, d), "doc_id", "n_chars",
          stagedSimhashClusters(s, d, 16, 2))
        .select("doc_id")),
    // the corpus-scale width run END-TO-END: 64-bit pairs (the setting a
    // real corpus ships — 16-bit fingerprint space saturates) fed through
    // CC and the score election, so the full-width block arithmetic is
    // oracle-checked all the way to cluster labels and survivors, not
    // just at the pair emitter. Both wide queries answer from the staged
    // 64-bit labeling (the CC loop runs inside its one-time build; the
    // steady-state fresh CC cost stays measured by x_dedup_clusters)
    "x_dedup_clusters_wide" -> ((s, d) =>
      stagedSimhashClusters(s, d, 64, 3)
        .select(col("id").as("doc_id"), col("cluster_id"))),
    "x_dedup_keep_best_wide" -> ((s, d) =>
      Dedup.keepBestWith(Tables.documents(s, d), "doc_id", "n_chars",
          stagedSimhashClusters(s, d, 64, 3))
        .select("doc_id")),
    // duplicated 30-char substring spans across the corpus
    "x_dedup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 30, stride = 1, minDocFreq = 2)),
    // incremental spans: odd-id docs play the new batch, the even-id
    // docs' distinct gram-hash store plays the accumulated corpus — the
    // spans the batch would get from the full-corpus run, at batch cost
    // (the minhash/exact/embedding incremental convention)
    "x_dedup_spans_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalDuplicatedSpans(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        Dedup.spanGramsOf(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          k = 30, stride = 1),
        k = 30, stride = 1)
    }),
    // the EXACT form (suffix-array semantics, string-verified — the
    // oracle statement is shared with x_dedup_spans because that SQL
    // already groups by the gram string; equality of the two rows is the
    // no-collision observation, spec-pinned on a planted fixture)
    "x_dedup_spans_exact" -> ((s, d) =>
      Dedup.duplicatedSpansExact(Tables.documents(s, d), "doc_id", "text",
        k = 30, minDocFreq = 2)),
    // the scale setting of the same operator: stride 4 samples every 4th
    // position, cutting explode volume 4x — the knob a 100 TB run uses.
    // Registered alongside the exhaustive form so the stride arithmetic
    // (position set AND island merge over stride-spaced runs) is
    // oracle-checked, not just unit-tested
    // the standing spans-family stores (grams / ids / spans, built by the
    // per-batch ingestion loop over three doc_id%3 batches) — the BUILD
    // accounting row: fresh build into scratch each run, returning the
    // accumulated spans store. Prefix-asymmetric semantics: a position is
    // duplicated iff another doc in an earlier-or-same batch shares its
    // gram (the spansStream contract), which the oracle replays with a
    // batch-aware join
    "x_stage_build_spans" -> ((s, d) => {
      val path = s"/tmp/graft_scratch/span_stores_build"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      buildSpanStores(s, d, path)
      s.read.parquet(s"$path/spans").select(col("doc_id"), col("span_start"),
        col("span_end"), col("ingest_batch").cast("int").as("ingest_batch"))
    }),
    // takedown over the spans family: purge every 7th doc from a fresh
    // copy of the staged stores — the replay rewrites the affected batch
    // suffix, so survivors' spans that existed only through a removed
    // doc's grams die too (no per-id delete can see those). The result
    // must equal the ingestion loop over the SURVIVOR corpus, which the
    // oracle computes independently; the copy+replay cost is the honest
    // per-takedown price
    "x_dedup_spans_purged" -> ((s, d) => {
      val src = stagedSpanStores(s, d)
      val path = s"/tmp/graft_scratch/spans_purge_${dirTag(d, "documents")}"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val docs = Tables.documents(s, d)
      Dedup.purgeSpanStores(s,
        docs.filter(pmod(col("doc_id"), lit(7)) === 0).select("doc_id"),
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 0).select("doc_id", "text"),
        "doc_id", "text", s"$path/grams", s"$path/ids", s"$path/spans", k = 30)
      s.read.parquet(s"$path/spans").select(col("doc_id"), col("span_start"),
        col("span_end"), col("ingest_batch").cast("int").as("ingest_batch"))
    }),
    "x_dedup_spans_strided" -> ((s, d) =>
      Dedup.duplicatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 30, stride = 4, minDocFreq = 2)),
    // the transformation side of span dedup: cut every duplicated island
    // from all but its first-occurrence (min doc id) document and re-emit
    // the cleaned corpus — Lee et al.'s actual output, not coordinates
    "x_dedup_spans_removed" -> ((s, d) =>
      Dedup.removeDuplicatedSpans(Tables.documents(s, d), "doc_id", "text",
        k = 30, stride = 1, minDocFreq = 2)),
    // incremental (cross-run) exact dedup: even-id docs play the already-
    // ingested corpus (digest store), the full table is the new batch
    "x_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val known = docs.filter(col("doc_id") % 2 === 0)
        .select(graft.functions.HashColumns.hashExpr(Seq(col("text"))).as("content_hash"))
      Dedup.incrementalExact(docs, "doc_id", Seq("text"), known)
        .select("doc_id", "content_hash")
    }),
    // URL canonicalization — the first stage of every public web-corpus
    // recipe (CCNet/RefinedWeb/C4 dedupe by normalized URL before any
    // content pass). The rule list lives in Urls.canonicalizeUrl; the
    // oracle replays it as DuckDB regex/list expressions over the SAME
    // fixture (hand edge vectors + per-document derived mess)
    "x_text_url_canonical" -> ((s, d) =>
      urlFixture(s, d).select(col("url_id"),
        Urls.canonicalizeUrl(col("url")).as("canonical_url"),
        Urls.urlHost(col("url")).as("host"))),
    // URL-level exact dedup: one hash aggregation on the canonical
    // string, smallest id survives — at 100 TB this drops duplicates on
    // a ~100-byte key before any payload is read
    "x_dedup_url" -> ((s, d) =>
      Urls.duplicateUrls(urlFixture(s, d), "url_id", "url")),
    // per-host corpus accounting (crawl budgeting / domain blocklists)
    "x_text_url_hosts" -> ((s, d) =>
      Urls.hostStats(urlFixture(s, d), "url")),
    // internationalized hostnames: xn-- (ACE/punycode) labels decode to
    // their Unicode form inside canonicalization — RFC 3492 as a pure
    // expression fold, no UDF — so mixed spellings of one hostname share
    // one canonical class and one blocklist row; invalid ACE labels pass
    // through verbatim. The oracle holds the IDNA ground truth as
    // literals (DuckDB cannot replay punycode); the wildcard-blocklist
    // both-spellings law is spec-pinned in UrlsSpec
    "x_text_url_idn" -> ((s, _) => {
      import s.implicits._
      idnEdgeVectors.map(v => (v._1, v._2)).toDF("url_id", "url")
        .select(col("url_id"),
          Urls.canonicalizeUrl(col("url")).as("canonical_url"),
          Urls.urlHost(col("url")).as("host"))
    }),
    // robots.txt-derived blocklist rules: per-host robots bodies (six
    // deterministic variants exercising comments, case, whitespace,
    // agent-run accumulation, non-matching agents, and a comment line
    // INSIDE a User-agent run — which per RFC 9309 must not end the run)
    // parsed by the documented REP subset — hosts fully disallowed for
    // '*' come back as exact-host rules for the blocklist gate
    "x_text_robots" -> ((s, d) => {
      val h = pmod(col("doc_id"), lit(37))
      val robots = Tables.documents(s, d).select(
        concat(lit("site"), h.cast("string"), lit(".example.com")).as("host"),
        when(pmod(h, lit(6)) === 0,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /")))
          .when(pmod(h, lit(6)) === 1,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /private"),
              lit(""), lit("User-agent: badbot"), lit("Disallow: /")))
          .when(pmod(h, lit(6)) === 2,
            concat_ws("\n", lit("# note"), lit("USER-AGENT: *   "),
              lit(" Disallow:   /  ")))
          .when(pmod(h, lit(6)) === 3,
            concat_ws("\n", lit("User-agent: badbot"), lit("User-agent: *"),
              lit("Disallow: /")))
          .when(pmod(h, lit(6)) === 4,
            concat_ws("\n", lit("User-agent: *"), lit("# interleaved note"),
              lit("User-agent: badbot"), lit("Disallow: /")))
          .otherwise(concat_ws("\n", lit("User-agent: badbot"), lit("Disallow: /")))
          .as("robots_txt")).distinct()
      Urls.robotsDisallowedHosts(robots, "host", "robots_txt")
    }),
    // robots PATH rules + RFC 9309 longest-match gate (the dominant real
    // robots shape — path-level Disallow with Allow carve-outs): nine
    // per-host body variants exercise a path Disallow under a longer
    // Allow, an Allow/Disallow LENGTH TIE (Allow wins), a specific-UA
    // group overriding '*' (tier selection), an empty Disallow (matches
    // nothing), three-level longest-match nesting, a '$'-anchored
    // wildcard suffix rule (/*.pdf$), mid-pattern '*' wildcards with a
    // wildcard-vs-wildcard specificity race, PERCENT-ENCODED rules
    // (unreserved octets decode, hex case-folds, %2A stays a literal
    // asterisk-encoding — never a wildcard), and QUERY-BEARING rules
    // (match path?query; plain rules keep matching the query-stripped
    // path); sixteen deterministic URL paths (incl. %-encoded and
    // ?-bearing ones) probe every branch. The oracle replays group
    // selection, the tier filter, the percent normalization, the
    // LIKE-compiled pattern match, and the (length DESC, allow DESC)
    // election relationally
    "x_text_robots_paths" -> ((s, d) => {
      val h = pmod(col("doc_id"), lit(37))
      val robots = Tables.documents(s, d).select(
        concat(lit("site"), h.cast("string"), lit(".example.com")).as("host"),
        when(pmod(h, lit(9)) === 0,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /private"),
              lit("Allow: /private/ok")))
          .when(pmod(h, lit(9)) === 1,
            concat_ws("\n", lit("User-agent: *"), lit("Allow: /p"),
              lit("Disallow: /p"), lit("Disallow: /public")))
          .when(pmod(h, lit(9)) === 2,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /"), lit(""),
              lit("User-agent: graftbot"), lit("Disallow: /private")))
          .when(pmod(h, lit(9)) === 3,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow:")))
          .when(pmod(h, lit(9)) === 4,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /a"),
              lit("Allow: /a/b"), lit("Disallow: /a/b/c")))
          .when(pmod(h, lit(9)) === 5,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /*.pdf$")))
          .when(pmod(h, lit(9)) === 6,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /a*z"),
              lit("Allow: /a*zz")))
          .when(pmod(h, lit(9)) === 7,
            concat_ws("\n", lit("User-agent: *"), lit("Disallow: /s%65cret"),
              lit("Allow: /s%65cret/pub%6cic"), lit("Disallow: /item%2A")))
          .otherwise(concat_ws("\n", lit("User-agent: *"),
            lit("Disallow: /search?q="), lit("Allow: /search?q=safe")))
          .as("robots_txt")).distinct()
      val rules = Urls.robotsPathRules(robots, "host", "robots_txt",
        userAgent = "graftbot")
      val paths = array(lit("/"), lit("/private/ok/x"), lit("/private/y"),
        lit("/p/z"), lit("/a/b/c/d"), lit("/a/b/q"), lit("/a/x"), lit("/public"),
        lit("/docs/r.pdf"), lit("/docs/r.pdfx"), lit("/abcz"), lit("/abczz"),
        lit("/s%65cret/x"), lit("/secret/public/y"), lit("/search?q=test"),
        lit("/search?q=safe1"), lit("/item%2a"), lit("/item*"))
      val urls = Tables.documents(s, d).select(col("doc_id").as("url_id"),
        concat(lit("https://site"), h.cast("string"), lit(".example.com"),
          element_at(paths, (pmod(col("doc_id"), lit(18)) + 1).cast("int"))).as("url"))
      Urls.robotsBlockedPathIds(urls, "url_id", "url", rules)
    }),
    // incremental (cross-run) URL dedup: even-id urls play the standing
    // canonical store; the full fixture is the new batch — the cheapest
    // dedup stage at batch cost (the x_dedup_incremental pattern on the
    // ~100-byte canonical key)
    "x_dedup_url_incremental" -> ((s, d) => {
      val urls = urlFixture(s, d)
      val known = urls.filter(col("url_id") % 2 === 0)
        .select(Urls.canonicalizeUrl(col("url")).as("canonical_url")).distinct()
      Urls.incrementalDuplicateUrls(urls, "url_id", "url", known)
    }),
    // corpus-wide paragraph dedup with NORMALIZED matching (FineWeb
    // style): the single-line corpus first derives 20-token paragraphs,
    // every 7th doc is upper-cased so the case-fold + whitespace-collapse
    // canonicalization is itself the thing under oracle check — repeated
    // paragraphs dedup across the case variants, survivors keep original
    // text
    "x_dedup_paragraphs" -> ((s, d) =>
      Dedup.dedupParagraphsAcrossCorpus(
        Tables.documents(s, d)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, upper(col("text")))
              .otherwise(col("text")))
          .withColumn("text",
            regexp_replace(col("text"), "((?:\\S+ ){20})", "$1\n\n")),
        "doc_id", "text")),
    // incremental (cross-run) paragraph dedup: even docs' paragraph-hash
    // store plays the ingested corpus, odd docs are the new batch — a
    // batch paragraph is cut when its canonical hash is standing (an
    // earlier run keeps it) or an earlier batch occurrence exists; the
    // ingested corpus is never re-read, only its 8-byte hash store
    "x_dedup_paragraphs_incremental" -> ((s, d) => {
      val para = Tables.documents(s, d)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, upper(col("text")))
            .otherwise(col("text")))
        .withColumn("text",
          regexp_replace(col("text"), "((?:\\S+ ){20})", "$1\n\n"))
      val standing = Dedup.paragraphHashes(
        para.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Dedup.dedupParagraphsIncremental(
        para.filter(col("doc_id") % 2 === 1), "doc_id", "text", standing)
    }),
    // paragraph NEAR-dup with reassembly: the exact-canonical fixture
    // plus a one-token mutation on every doc_id % 3 == 1 doc ("the" ->
    // "th3" before the paragraph breaks are injected — token count, and
    // so break positions, unchanged), so reflowed boilerplate one word
    // apart exists and must ALSO collapse. MinHash per distinct
    // canonical paragraph, per-bucket keep-min election, losers cut,
    // survivors re-joined with original text; the oracle replays the
    // identical signature/band arithmetic
    "x_dedup_paragraphs_near" -> ((s, d) =>
      Dedup.nearDedupParagraphsAcrossCorpus(
        Tables.documents(s, d)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, upper(col("text")))
              .otherwise(col("text")))
          .withColumn("text",
            when(col("doc_id") % 3 === 1,
              regexp_replace(col("text"), "\\bthe\\b", "th3"))
              .otherwise(col("text")))
          .withColumn("text",
            regexp_replace(col("text"), "((?:\\S+ ){20})", "$1\n\n")),
        "doc_id", "text")),
    // incremental (cross-run) paragraph NEAR-dup: the x_dedup_paragraphs_near
    // fixture split even/odd — even docs' paragraph BAND INDEX plays the
    // standing store, odd docs are the new batch. A batch class is cut
    // when its hash is standing (exact tier), when a standing class
    // occupies any of its band buckets (near tier — reflowed boilerplate
    // from an earlier run), or when it loses the batch-internal bucket
    // election; the ingested corpus is never re-read, only its narrow
    // (lh, band, key) index
    "x_dedup_paragraphs_near_incremental" -> ((s, d) => {
      val para = Tables.documents(s, d)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, upper(col("text")))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 3 === 1,
            regexp_replace(col("text"), "\\bthe\\b", "th3"))
            .otherwise(col("text")))
        .withColumn("text",
          regexp_replace(col("text"), "((?:\\S+ ){20})", "$1\n\n"))
      val standing = Dedup.paragraphBandIndex(
        para.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Dedup.nearDedupParagraphsIncremental(
        para.filter(col("doc_id") % 2 === 1), "doc_id", "text", standing)
    }),
    // ---- extension: cross-table fuzzy join (record linkage) ----
    // clean reference keys (12-hex md5 prefixes, high-entropy) linked to
    // a deterministically dirtied feed (one substitution at a
    // key-dependent position); PassJoin blocking, exact verify
    "x_fuzzy_join" -> ((s, d) => {
      val clean = Tables.customer(s, d).select(col("c_custkey").as("cid"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("k"))
      val p = (pmod(col("cid"), lit(12)) + 1).cast("int")
      val dirty = clean.select(col("cid").as("did"),
        concat(col("k").substr(lit(1), p - 1), lit("x"),
          col("k").substr(p + 1, lit(12))).as("k2"))
      Dedup.fuzzyJoin(clean, "cid", "k", dirty, "did", "k2", maxDist = 1)
    }),
    // entity-resolution election on the fuzzy pairs: one canonical clean
    // match per dirty row (best distance, id tiebreak) — a window keyed
    // by the dirty id, so the shuffle is per-entity, never global
    "x_fuzzy_join_best" -> ((s, d) => {
      val clean = Tables.customer(s, d).select(col("c_custkey").as("cid"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("k"))
      val p = (pmod(col("cid"), lit(12)) + 1).cast("int")
      val dirty = clean.select(col("cid").as("did"),
        concat(col("k").substr(lit(1), p - 1), lit("x"),
          col("k").substr(p + 1, lit(12))).as("k2"))
      val pairs = Dedup.fuzzyJoin(clean, "cid", "k", dirty, "did", "k2", maxDist = 1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("right_id").orderBy(col("dist"), col("left_id"))
      pairs.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).drop("rk")
    }),
  )
}
