package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{Currents, MetaColumns => M}
import graft.operators._
import graft.operators.Scd2.ValidFromMode
import graft.pipeline.Historization
import graft.sources.{Store, StoreIndex, Tables}

/** Driver contract: one registered query per implemented operator
  * (SURVEY.md §2 + north-star extensions), each with DuckDB-equivalent
  * oracle SQL over the same parquet tables.
  *
  * Cross-engine determinism rules used throughout (SURVEY.md §5.2/§7.4):
  *  - fixed injected run timestamps, never wall clock;
  *  - doubles that feed hashes or aggregates go through decimal casts
  *    (raw double→string and double-sum order differ between engines);
  *  - md5-hex everywhere a hash is needed — both engines agree bit-for-bit;
  *  - ranking ties broken by an id column;
  *  - the events table's nanosecond timestamps are truncated to micros on
  *    both sides (Tables.events here, CAST(ts AS TIMESTAMP) in DuckDB).
  */
object SparkEntry {

  /** CSV fixture for the L1 scan parity check; overridable where the
    * reference checkout lives elsewhere (query and oracle stay in sync
    * because both read this value). */
  private val gradesCsvPath: String =
    sys.env.getOrElse("GRAFT_GRADES_CSV", "/root/reference/data/grades_full.csv")

  /** Fixture dir for the real-binary-file ingestion check (query and oracle
    * both read this value, so they cannot disagree on the path). */
  private val mediaFixtureDir: String =
    sys.env.getOrElse("GRAFT_MEDIA_FIXTURE_DIR", "/tmp/graft_media_fixture")

  /** (Re)write a deterministic 16-file binary fixture: file i holds the 16
    * raw md5 bytes of "graft-media#i" — full 0..255 byte range, identical on
    * every run, so ingesting it is oracle-checkable without shipping test
    * data in the repo. */
  private[graft] def writeMediaFixture(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    // drop stale *.bin first: the ingest glob (and the oracle's read_blob)
    // match ALL .bin files, so leftovers from an older naming scheme would
    // silently diverge query and oracle. Materialize the listing before
    // deleting — DirectoryStream iteration concurrent with deletion is only
    // weakly consistent and provider-dependent.
    val listing = java.nio.file.Files.list(p)
    val stale =
      try {
        val b = Seq.newBuilder[java.nio.file.Path]
        listing.forEach(f => if (f.getFileName.toString.endsWith(".bin")) b += f)
        b.result()
      } finally listing.close()
    stale.foreach(java.nio.file.Files.delete)
    (0 until 16).foreach { i =>
      val bytes = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-media#$i".getBytes("UTF-8"))
      java.nio.file.Files.write(p.resolve(f"f$i%02d.bin"), bytes)
    }
  }

  /** Harness entry point: (re)write the media fixture without running any
    * query, so oracle-side consumers never depend on query execution order. */
  private[graft] def ensureMediaFixture(): Unit = writeMediaFixture(mediaFixtureDir)

  /** Fixture dir for the schema'd JSONL ingestion check (query and oracle
    * both read this value, so they cannot disagree on the path). */
  private val jsonlFixtureDir: String =
    sys.env.getOrElse("GRAFT_JSONL_FIXTURE_DIR", "/tmp/graft_jsonl_fixture")

  /** (Re)write a deterministic 24-line JSONL fixture exercising the parse
    * edges a schema'd reader must get right: an explicit null field
    * (title, every 7th-ish line), a MISSING nested object (meta, line 5
    * and 16 — absent key, not null literal), variable-length arrays, and
    * doubles that print exactly (multiples of 0.25). Identical on every
    * run, so ingestion is oracle-checkable without shipping test data. */
  private[graft] def writeJsonlFixture(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    val lines = (0 until 24).map { i =>
      val tags = (0 to i % 3).map(j => s""""t$j"""").mkString(",")
      val title = if (i % 7 == 3) "null" else s""""doc $i""""
      val meta =
        if (i % 11 == 5) ""
        else s""","meta":{"lang":"${if (i % 2 == 0) "en" else "de"}","tokens":${i * 3}}"""
      s"""{"id":$i,"title":$title,"score":${i * 0.25},"tags":[$tags]$meta}"""
    }
    java.nio.file.Files.write(p.resolve("docs.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private[graft] def ensureJsonlFixture(): Unit = writeJsonlFixture(jsonlFixtureDir)

  /** Hand-authored URL canonicalization edge vectors (url_id, url) — one
    * per rule of [[graft.operators.Urls.canonicalizeUrl]]'s scaladoc list,
    * shared verbatim with the DuckDB oracle (the VALUES literal is
    * GENERATED from this val, so the two engines cannot drift). No single
    * quotes allowed: the oracle embeds these as SQL string literals. */
  private val urlEdgeVectors: Seq[(Long, String)] = Seq(
    1000001L -> "HTTP://WWW.Example.COM/Path/File",
    1000002L -> "http://example.com:80/a",
    1000003L -> "https://example.com:443/a",
    1000004L -> "https://example.com:8443/a",
    1000005L -> "http://example.com:443/a",
    1000006L -> "https://a.com/x#section-2",
    1000007L -> "https://a.com/x?k=v#frag",
    1000008L -> "https://a.com",
    1000009L -> "https://a.com?b=2&a=1",
    1000010L -> "https://a.com/x?utm_source=tw&b=2&utm_medium=s&a=1",
    1000011L -> "https://a.com/x?fbclid=XYZ&gclid=1&msclkid=2&igshid=3&mc_eid=4",
    1000012L -> "https://a.com/x?utm_source=tw",
    1000013L -> "https://a.com/x?myutm_source=keep",
    1000014L -> "https://a.com/x?utmost=keep",
    1000015L -> "https://a.com/x?fbclid&a",
    1000016L -> "https://a.com/x?a=1&&b=2&",
    1000017L -> "https://a.com/x?",
    1000018L -> "http://User:Pw@HOST.Com:80/a",
    1000019L -> "https://a.com/x?to=user@b.com",
    1000020L -> "https://a.com/CaseSensitive?Key=Val",
    1000021L -> "  https://a.com/x  ",
    1000022L -> "not a url",
    1000023L -> "mailto:x@y.com",
    1000024L -> "/relative/path?utm_source=x",
    // canonical twins of 1000006/1000021 — URL-level dedup must collapse
    1000025L -> "HTTPS://A.COM:443/x?utm_campaign=z#frag2",
    1000026L -> "https://a.com/x")

  /** SQL VALUES literal of [[urlEdgeVectors]] for the oracle side. */
  private val urlEdgeValuesSql: String = {
    require(urlEdgeVectors.forall(!_._2.contains("'")),
      "url edge vectors must not contain single quotes (embedded in SQL)")
    urlEdgeVectors.map { case (i, u) => s"($i, '$u')" }.mkString(", ")
  }

  /** URL fixture: the edge vectors plus a messy URL derived per document —
    * scheme/host case, a default port, param order, tracking params, and a
    * fragment all vary by doc_id while the CANONICAL form depends only on
    * doc_id % 250, so every 250-congruent pair of docs collapses under
    * URL dedup. The derivation is plain column arithmetic replayed
    * verbatim by the oracle's twin expression. */
  private def urlFixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edge = urlEdgeVectors.toDF("url_id", "url")
    val doc = col("doc_id")
    val k = pmod(doc, lit(250))
    val derived = Tables.documents(s, d).select(
      (doc + 2000000L).as("url_id"),
      concat(
        when(pmod(doc, lit(2)) === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(pmod(doc, lit(3)) === 0, lit("Site")).otherwise(lit("site")),
        pmod(k, lit(37)).cast("string"), lit(".Example.com"),
        when(pmod(doc, lit(4)) === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/"), k.cast("string"),
        when(pmod(doc, lit(2)) === 0,
          concat(lit("?a="), pmod(k, lit(5)).cast("string"),
            lit("&b="), pmod(k, lit(7)).cast("string")))
          .otherwise(concat(lit("?b="), pmod(k, lit(7)).cast("string"),
            lit("&a="), pmod(k, lit(5)).cast("string"))),
        when(pmod(doc, lit(3)) === 1,
          concat(lit("&utm_source=feed&fbclid="), doc.cast("string")))
          .otherwise(lit("")),
        when(pmod(doc, lit(5)) === 0, concat(lit("#sec"), doc.cast("string")))
          .otherwise(lit(""))).as("url"))
    edge.unionByName(derived)
  }

  private val ts1 = "2024-01-01 10:00:00"
  private val ts2 = "2024-02-15 10:30:00"
  private val ts3 = "2024-03-01 09:30:00"
  private val ts4 = "2024-04-01 08:00:00"
  private def cur1 = Currents(ts1)
  private def cur2 = Currents(ts2)
  private def cur3 = Currents(ts3)
  private def cur4 = Currents(ts4)
  private val keys = Seq("l_orderkey", "l_linenumber")

  /** Deterministic lineitem projection used as CDC/SCD2 snapshot base:
    * doubles pre-cast to decimal so stringified hash inputs agree across
    * engines. */
  private def liProj(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)").as("quantity"),
      col("l_returnflag").as("returnflag"),
      col("l_linestatus").as("linestatus"),
      col("l_shipdate").cast("date").as("shipdate"))

  /** Snapshot A: the "current" load — everything shipped before mid-1995. */
  private def snapA(spark: SparkSession, dir: String): DataFrame =
    liProj(spark, dir).filter(col("shipdate") < lit("1995-06-01").cast("date"))

  /** Snapshot B: the full table with a deterministic mutation — quantity
    * bumped for every 97th order key. Yields inserts (new keys) and
    * updates (changed records) against snapshot A. */
  private def snapB(spark: SparkSession, dir: String): DataFrame =
    liProj(spark, dir).withColumn("quantity",
      when(pmod(col("l_orderkey"), lit(97)) === 0,
        (col("quantity") + 10).cast("decimal(18,2)")).otherwise(col("quantity")))

  private def enrichedA(spark: SparkSession, dir: String): DataFrame =
    MetaEnrichment.addMetaColumns(snapA(spark, dir), cur1, keys)
  private def enrichedB(spark: SparkSession, dir: String): DataFrame =
    MetaEnrichment.addMetaColumns(snapB(spark, dir), cur2, keys)

  /** Run-2 full snapshot with every 3rd order key vanished (the d08
    * shrink) — the soft-delete feed: keys of snapshot A absent here are
    * the ones [[graft.operators.Cdc.stampDeleted]] stamps. */
  private def shrunkB(spark: SparkSession, dir: String): DataFrame =
    snapB(spark, dir).filter(pmod(col("l_orderkey"), lit(3)) =!= 0)

  /** Content tag of a table's parquet footprint (file names, sizes,
    * mtimes): staged derived stores embed it in their path so they rebuild
    * whenever the inputs change and are reused (across queries AND across
    * processes) while the inputs stand still. */
  private def dirTag(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    val entries =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName).map(x => s"${x.getName}:${x.length}:${x.lastModified}")
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Staged SimHash near-dup pair store ([[graft.sources.Store
    * .readOrCreate]]): the CC family's six questions all start from the
    * SAME pair set, and production computes that set once per corpus
    * generation (it is exactly the `pairsPath` store
    * `clusterMaintainStream` maintains), not once per question. The first
    * query to ask builds and commits the store; every later one — in this
    * process or the next — reads parquet. Content-tagged by the documents
    * table's footprint, so a regenerated corpus rebuilds it. */
  private def stagedSimhashPairs(
      s: SparkSession, d: String, bits: Int, maxHamming: Int): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "documents")}/simhash_pairs_b${bits}_h$maxHamming")(
      Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text", bits, maxHamming))

  /** Staged phash near-dup pair store — the MEDIA twin of
    * [[stagedSimhashPairs]]: perceptual-hash Hamming pairs over the
    * corpus treated as media payloads, computed once per corpus
    * generation (pigeonhole blocking, never all-pairs) and read by every
    * media-dedup question. */
  private def stagedPhashPairs(
      s: SparkSession, d: String, bits: Int, maxHamming: Int): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "documents")}/phash_pairs_b${bits}_h$maxHamming")(
      Multimodal.phashNearDuplicates(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"), bits, maxHamming))

  /** Staged standing labeling for the incremental-maintenance row: the
    * labels store as it stands BEFORE the 10%-batch arrives (pairs not
    * touching a doc_id ≡ 9 mod 10). */
  private def stagedStandingLabels(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "documents")}/simhash_standing_labels_b16_h2")(
      Dedup.duplicateClusters(
        stagedSimhashPairs(s, d, 16, 2)
          .filter(col("id_a") % 10 =!= 9 && col("id_b") % 10 =!= 9)))

  /** Staged cluster labeling over [[stagedSimhashPairs]] — the `labelsPath`
    * store of the maintenance loop: labels are computed once (then
    * maintained incrementally), and stats/canonical/election questions are
    * READS of the labeling. */
  private def stagedSimhashClusters(
      s: SparkSession, d: String, bits: Int, maxHamming: Int): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "documents")}/simhash_labels_b${bits}_h$maxHamming")(
      Dedup.duplicateClusters(stagedSimhashPairs(s, d, bits, maxHamming)))

  private def scd2v2(spark: SparkSession, dir: String): DataFrame = {
    // v1 is referenced three times by the second merge (closed/active/
    // closed-key splits) — persist so the bootstrap subtree runs once.
    val v1 = Scd2.historizeDataset(enrichedA(spark, dir), None, cur1, ValidFromMode.LoadDate)
      .persist()
    Scd2.historizeDataset(enrichedB(spark, dir), Some(v1), cur2, ValidFromMode.LoadDate)
  }

  /** Staged SCD2 two-merge store: `d06_scd2_merge` measures the merge
    * itself fresh; the split and as-of questions are READS of the standing
    * historized store in production — a time-travel query never re-runs
    * the merges that built the store it travels over. */
  private def stagedScd2v2(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "lineitem")}/scd2_v2")(scd2v2(s, d))

  /** Staged BUCKETED twin of the SCD2 store ([[graft.sources.Store
    * .writeStoreBucketed]] layout) for the point-lookup registration:
    * history point reads hit one bucket directory out of 8 with KEY_HASH
    * row groups pruned by the within-file sort. */
  private def stagedScd2v2BucketedPath(s: SparkSession, d: String): String = {
    val path = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/scd2_v2_bucketed"
    Store.readOrCreateWith(s, path)(tmp =>
      Store.writeStoreBucketed(stagedScd2v2(s, d), tmp, buckets = 8))
    path
  }

  /** Deterministic orders projection — the SECOND historized dimension for
    * the temporal join: price pre-cast to decimal so stringified hash
    * inputs agree across engines (same discipline as [[liProj]]). */
  private def ordProj(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_orderstatus").as("orderstatus"),
      col("o_totalprice").cast("decimal(18,2)").as("totalprice"),
      col("o_orderdate").cast("date").as("orderdate"))

  /** Orders run-2 snapshot: totalprice bumped for every 53rd order key — a
    * modulus DISJOINT from lineitem's 97, so the two histories version at
    * different keys and the temporal join exercises real window splits
    * (1 lineitem version × 2 order versions and vice versa), plus the
    * cross-epoch rejection on keys divisible by both. */
  private def ordSnapB(spark: SparkSession, dir: String): DataFrame =
    ordProj(spark, dir).withColumn("totalprice",
      when(pmod(col("o_orderkey"), lit(53)) === 0,
        (col("totalprice") + 100).cast("decimal(18,2)")).otherwise(col("totalprice")))

  /** Staged two-merge SCD2 store over ORDERS (key = o_orderkey), the right
    * side of `x_store_temporal_join`: same two-run scheme as the lineitem
    * store, mutation modulus 53. */
  private def stagedOrdersScd2(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "orders")}/scd2_orders") {
      val keysO = Seq("o_orderkey")
      val v1 = Scd2.historizeDataset(
        MetaEnrichment.addMetaColumns(ordProj(s, d), cur1, keysO),
        None, cur1, ValidFromMode.LoadDate).persist()
      Scd2.historizeDataset(
        MetaEnrichment.addMetaColumns(ordSnapB(s, d), cur2, keysO),
        Some(v1), cur2, ValidFromMode.LoadDate)
    }

  /** Orders run-4 snapshot for the compaction fixture: snapshot B with
    * every 31st key's totalprice bumped AGAIN (+50) — a third disjoint
    * modulus, so a 4-run tiered lifecycle closes rows in THREE distinct
    * runs (run 2: pre-change 53-versions; run 3: vanished 7-keys; run 4:
    * pre-change 31-versions) and the archive accrues three `run=`
    * partitions — the minimum on which [[graft.operators.Scd2Tier
    * .compactHistory]]'s keepRuns=2 fold does real work. */
  private def ordSnapC(spark: SparkSession, dir: String): DataFrame =
    ordSnapB(spark, dir).withColumn("totalprice",
      when(pmod(col("o_orderkey"), lit(31)) === 0,
        (col("totalprice") + 50).cast("decimal(18,2)")).otherwise(col("totalprice")))

  /** Staged tiered SCD2 store (orders) after runs 1–3 of the delete
    * lifecycle — the standing state the steady-state row
    * `x_scd2_tiered_run` applies run 4 to. Returns (activePath,
    * historyPath). Deliberately MUTABLE staging: the run-4 application
    * converges (crash contract: a replay against the advanced store
    * recomputes the identical active tier and an empty closed set), so
    * every call after the first measures the same per-run merge work and
    * reads the same store content. */
  private[graft] def stagedTierRuns13(s: SparkSession, d: String): (String, String) = {
    val root = Store.ensureStagedDir(s,
      s"/tmp/graft_staged/${dirTag(d, "orders")}/scd2_tier_r13") { tmp =>
      val keysO = Seq("o_orderkey")
      val m = ValidFromMode.LoadDate
      val (ap, hp) = (s"$tmp/active", s"$tmp/history")
      val b = MetaEnrichment.addMetaColumns(ordSnapB(s, d), cur2, keysO)
      Scd2Tier.historizeTiered(s,
        MetaEnrichment.addMetaColumns(ordProj(s, d), cur1, keysO), ap, hp, cur1, m)
      Scd2Tier.historizeTiered(s, b, ap, hp, cur2, m)
      Scd2Tier.historizeTiered(s,
        b.filter(pmod(col("o_orderkey"), lit(7)) =!= 0), ap, hp, cur3, m)
    }
    (s"$root/active", s"$root/history")
  }

  /** Staged tiered SCD2 store (orders) after the FULL 4-run compaction
    * fixture (bootstrap, 53-bump, 7-vanish, full re-delivery with
    * 31-bump): three closed-row `run=` partitions in the archive.
    * `x_scd2_tiered_compact` folds them and proves the fold is
    * reader-invisible. Immutable apart from [[graft.operators.Scd2Tier
    * .compactHistory]], which is content-preserving and idempotent. */
  private[graft] def stagedTier4Runs(s: SparkSession, d: String): (String, String) = {
    val root = Store.ensureStagedDir(s,
      s"/tmp/graft_staged/${dirTag(d, "orders")}/scd2_tier_4run") { tmp =>
      val keysO = Seq("o_orderkey")
      val m = ValidFromMode.LoadDate
      val (ap, hp) = (s"$tmp/active", s"$tmp/history")
      val b = MetaEnrichment.addMetaColumns(ordSnapB(s, d), cur2, keysO)
      Scd2Tier.historizeTiered(s,
        MetaEnrichment.addMetaColumns(ordProj(s, d), cur1, keysO), ap, hp, cur1, m)
      Scd2Tier.historizeTiered(s, b, ap, hp, cur2, m)
      Scd2Tier.historizeTiered(s,
        b.filter(pmod(col("o_orderkey"), lit(7)) =!= 0), ap, hp, cur3, m)
      Scd2Tier.historizeTiered(s,
        MetaEnrichment.addMetaColumns(ordSnapC(s, d), cur4, keysO), ap, hp, cur4, m)
    }
    (s"$root/active", s"$root/history")
  }

  /** The tiered read projection shared by the three x_scd2_tiered* rows. */
  private def tieredReadProjection(s: SparkSession, ap: String, hp: String): DataFrame =
    Scd2Tier.readTiered(s, ap, hp).get
      .select("o_orderkey", "totalprice", M.RecordHash, M.InsertTs,
        M.InsertRunId, M.UpdateTs, M.UpdateRunId, M.ValidFrom, M.ValidTo,
        M.Deleted)
      .withColumn("totalprice", col("totalprice").cast("double"))

  /** Driver-side KEY_HASH literal of `base`'s minimum (orderkey,
    * linenumber) key — the bounded two-scalar collect behind the bucketed
    * point reads, deriving exactly the md5 the meta enrichment defines. */
  private def minKeyHash(base: DataFrame): String = {
    val k = base.orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber").limit(1).collect()(0)
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"${k.get(0)}#?${k.get(1)}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Staged soft-delete-stamped two-run hash store: `x_store_deleted_stamp`
    * measures the stamping pass fresh; deletion-aware run travel reads the
    * standing stamped store. */
  private def stagedStamped2Run(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "lineitem")}/stamped_2run") {
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      val shrunk = shrunkB(s, d)
      val r2 = Historization.historizeFrames(r1, shrunk, cur2, keys)
      Cdc.stampDeleted(
        r2, MetaEnrichment.addMetaColumns(shrunk, cur2, keys), cur2)
    }

  /** Staged GENERATION-committed hash store ([[graft.sources.Store
    * .writeStoreGeneration]]): maintenance pass 1 commits the run-1
    * historization as generation 1, pass 2 reads pass 1's pinned
    * generation and commits the two-run chain as generation 2 (keep=2 —
    * both passes stand). This is the concurrent-reader-safe commit shape:
    * a commit only ever creates a NEW directory, so a reader mid-scan of
    * pass 1 is untouched by pass 2's commit, and the pass-1 store remains
    * addressable afterwards — which is exactly what the travel query
    * reads. */
  private def stagedGenerationStore(s: SparkSession, d: String): String = {
    val path = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/hash_store_gens"
    if (Store.listGenerations(s, path).size < 2) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      val g1 = Store.writeStoreGeneration(r1, path, keep = 2)
      val r2 = Historization.historizeFrames(
        Store.readStoreGeneration(s, path, g1), snapB(s, d), cur2, keys)
      Store.writeStoreGeneration(r2, path, keep = 2)
    }
    path
  }

  /** The incremental-feed batch: every 100th order key's rows of run 2's
    * snapshot — ~1% of keys, a mix of rows new to the store (post-cutoff
    * shipdates), unchanged re-deliveries, and changed records (keys
    * divisible by 9700). The small-batch-vs-standing-store regime the
    * Bloom route exists for. */
  private def batchB(s: SparkSession, d: String): DataFrame =
    enrichedB(s, d).filter(pmod(col("l_orderkey"), lit(100)) === 0)

  /** Bloom sizing for the staged store synopsis: 2^22 bits over the
    * sf0.1 store's ~300k pairs ≈ 13 bits/pair → <1% false positives with
    * 4 hashes; the dense words are 512 KiB — bounded, store-size-free. */
  private val BloomBits = 1 << 22

  /** Staged ENRICHED hash store (run-1 content): the standing-store side
    * of the incremental-feed regime, read the way production reads it —
    * a committed parquet store with precomputed digests — instead of
    * re-deriving the md5 enrichment from the raw snapshot per question. */
  private def stagedHashStoreA(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      s"/tmp/graft_staged/${dirTag(d, "lineitem")}/hash_store_a")(enrichedA(s, d))

  /** Staged Bloom synopsis of the standing store's digest pairs
    * ([[graft.operators.Cdc.bloomSynopsis]]): built once per store
    * generation — the artifact a production store maintains on append
    * (word-wise bit_or merge) — so the per-batch delta pays only the
    * probe. One file: the synopsis is a bounded sliver (≤ 64k word rows
    * here), and a collect from 32 micro-files costs more open/footer
    * overhead than the data. */
  private def stagedBloomSynopsis(s: SparkSession, d: String): DataFrame =
    Store.readOrCreate(s,
      // path suffix `s1`: the synopsis now carries its bits sentinel row —
      // a stale committed pre-sentinel store must not be reused
      s"/tmp/graft_staged/${dirTag(d, "lineitem")}/bloom_synopsis_b22s1")(
      Cdc.bloomSynopsis(stagedHashStoreA(s, d), bits = BloomBits).coalesce(1))

  /** Staged two-pass CROSS-STORE snapshot ([[graft.sources.Store
    * .commitSnapshot]]): each maintenance pass commits the hash store
    * AND a stats store, then one manifest pinning both generations —
    * pass 1 holds the run-1 historization, pass 2 the two-run chain. */
  private def stagedManifestSnapshot(s: SparkSession, d: String): String = {
    val root = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/manifest_pair"
    if (Store.listGenerations(s, s"$root/manifest").size < 2) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      def stats(df: DataFrame) = df.groupBy().agg(count(lit(1)).as("n_rows"))
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      Store.commitSnapshot(s, s"$root/manifest", Seq(
        ("hash", s"$root/hash", r1), ("stats", s"$root/stats", stats(r1))), keep = 2)
      val r2 = Historization.historizeFrames(
        Store.readStoreLatest(s, s"$root/hash").get._2, snapB(s, d), cur2, keys)
      Store.commitSnapshot(s, s"$root/manifest", Seq(
        ("hash", s"$root/hash", r2), ("stats", s"$root/stats", stats(r2))), keep = 2)
      ()
    }
    root
  }

  /** Build the three spans-family stores (grams / ids / spans, each
    * partitioned by ingest_batch) by the driver-side twin of
    * [[graft.streaming.StreamingHistorization.spansStream]]'s batch body:
    * three batches split by `doc_id % 3`, each probing the standing gram
    * partitions of the earlier batches — the standing state
    * [[graft.operators.Dedup.purgeSpanStores]] repairs. */
  private def buildSpanStores(s: SparkSession, d: String, root: String): Unit = {
    val docs = Tables.documents(s, d).select(col("doc_id").as("id"), col("text").as("t"))
    (0 to 2).foreach { b =>
      graft.CacheScope.withScope { scope =>
        val batch = scope.persist(docs.filter(pmod(col("id"), lit(3)) === b))
        val standing =
          if (b == 0) s.range(0).select(col("id").as("gh"))
          else s.read.parquet(s"$root/grams").filter(col("ingest_batch") < b).select("gh")
        Dedup.incrementalDuplicatedSpans(batch, "id", "t", standing, k = 30,
            stride = 1, scope = scope)
          .write.mode("overwrite").parquet(s"$root/spans/ingest_batch=$b")
        Dedup.spanGramsOf(batch, "id", "t", k = 30, stride = 1, scope = scope)
          .write.mode("overwrite").parquet(s"$root/grams/ingest_batch=$b")
        batch.select("id").write.mode("overwrite").parquet(s"$root/ids/ingest_batch=$b")
      }
    }
  }

  /** Staged spans-family stores (build-once): the standing state the
    * purge row repairs a fresh copy of. */
  private def stagedSpanStores(s: SparkSession, d: String): String = {
    val root = s"/tmp/graft_staged/${dirTag(d, "documents")}/span_stores"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$root/ids/ingest_batch=2/_SUCCESS")
    if (!fs.exists(marker)) {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      buildSpanStores(s, d, root)
    }
    root
  }

  /** Staged range-sorted lineitem store with its file-stats manifest
    * ([[graft.sources.StoreIndex.writeStoreSorted]]): the data-layout
    * artifact a production store maintains at write/compaction time so
    * selective reads touch only the files that can hold the answer.
    * Built once per corpus generation through the CAS commit (the
    * manifest records basenames, so it survives the commit rename). */
  private def stagedSortedLineitemPath(s: SparkSession, d: String): String = {
    val path = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/lineitem_sorted_f16"
    Store.readOrCreateWith(s, path)(dir =>
      StoreIndex.writeStoreSorted(
        Tables.lineitem(s, d), dir, Seq("l_orderkey"), numFiles = 16))
    path
  }

  /** Staged TIME-sorted lineitem store (sorted + manifested on
    * `l_shipdate`): the time-slice layout — a fact store laid out by
    * event time is the single most common 100 TB read pattern ("last
    * week's data"), and the manifest prunes it exactly like a key range
    * (native TIMESTAMP min/max comparisons). */
  private def stagedTimeSortedLineitemPath(s: SparkSession, d: String): String = {
    val path = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/lineitem_tsorted_f16"
    Store.readOrCreateWith(s, path)(dir =>
      StoreIndex.writeStoreSorted(
        Tables.lineitem(s, d), dir, Seq("l_shipdate"), numFiles = 16))
    path
  }

  /** Staged Z-ordered lineitem store on (l_partkey, l_suppkey): the
    * two-dimensional layout twin — per-file ranges tight on BOTH columns,
    * so [[graft.sources.StoreIndex.readStoreBox]] prunes either axis. */
  private def stagedZOrderLineitemPath(s: SparkSession, d: String): String = {
    val path = s"/tmp/graft_staged/${dirTag(d, "lineitem")}/lineitem_zorder_f16"
    Store.readOrCreateWith(s, path)(dir =>
      StoreIndex.writeStoreZOrdered(
        Tables.lineitem(s, d), dir, "l_partkey", "l_suppkey", numFiles = 16))
    path
  }

  /** Scratch store write for the `x_stage_build_*` accounting rows: these
    * rows measure BUILD cost (compute + persist) honestly on every run,
    * so they write to a throwaway path instead of the shared staging root
    * (which, once committed, is immutable) and return the written store's
    * content for the oracle compare. */
  private def buildScratch(s: SparkSession, name: String)(df: DataFrame): DataFrame = {
    val path = s"/tmp/graft_scratch/$name"
    Store.writeStoreSwap(df, path, Nil)
    s.read.parquet(path)
  }

  /** Build every staged derived store for `d` so a bench run measures
    * steady-state reads in every pass: called by [[graft.Bench]] OUTSIDE
    * the timed window (the one-time build cost otherwise lands on
    * whichever registered query touches a store first and distorts that
    * row — BENCH_r10's x_curate_neardup charged 38 s of pairs-store build
    * to a read query). Build cost stays visible in its own rows
    * (`x_stage_build_*`) and in the fresh-computation rows
    * (x_dedup_clusters, d06_scd2_merge, x_store_deleted_stamp). */
  def prebuildStaged(s: SparkSession, d: String): Unit = {
    stagedSimhashPairs(s, d, 16, 2).count()
    stagedSimhashPairs(s, d, 64, 3).count()
    stagedSimhashClusters(s, d, 16, 2).count()
    stagedSimhashClusters(s, d, 64, 3).count()
    stagedStandingLabels(s, d).count()
    stagedScd2v2(s, d).count()
    stagedScd2v2BucketedPath(s, d)
    stagedOrdersScd2(s, d).count()
    stagedStamped2Run(s, d).count()
    stagedGenerationStore(s, d)
    stagedHashStoreA(s, d).count()
    stagedBloomSynopsis(s, d).count()
    stagedPhashPairs(s, d, 16, 2).count()
    stagedSpanStores(s, d)
    stagedManifestSnapshot(s, d)
    stagedTierRuns13(s, d)
    stagedTier4Runs(s, d)
    stagedSortedLineitemPath(s, d)
    stagedZOrderLineitemPath(s, d)
    stagedTimeSortedLineitemPath(s, d)
    ()
  }

  /** Flagship (driver smoke, sf0.001): the reference's production path over
    * two lineitem snapshots — enrich, delta anti-join, append — returning
    * the versioned store content (SURVEY.md §7.5). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val current = enrichedA(spark, dir)
    current.unionByName(Cdc.delta(current, enrichedB(spark, dir)))
  }

  // --------------------------------------------------------------------
  // queries
  // --------------------------------------------------------------------

  /** Dump-layer canonicalization: decimal columns hash-diverge between the
    * Spark parquet dump and DuckDB (CORRECTNESS_r01: rows+schema matched,
    * hash didn't, on every quantity-carrying entry). Decimal math stays
    * internal; only the dumped projection casts to double (values are exact
    * halves — lossless). Oracles mirror with CAST(... AS DOUBLE). */
  /** Mixture-sampling setting shared by the x_sample_mixture query and
    * its oracle: 4 weighted sources splitting a 10k-char budget 4:3:2:1.
    * One val so the weight list (and so the normalized IEEE targets from
    * [[graft.operators.Sampling.budgetTargets]]) cannot drift between
    * the two engines. */
  private val mixtureWeights: Seq[(String, Double)] =
    Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  private def qtyAsDouble(df: DataFrame): DataFrame =
    df.withColumn("quantity", col("quantity").cast("double"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- parity: live operators (SURVEY §2.1) ----
    "l01_csv_scan" -> ((s, _) =>
      Store.readCsv(s, gradesCsvPath).select(
        col("Lastname"), col("Firstname"), col("SSN"),
        col("Test1").cast("double").as("Test1"), col("Test2").cast("double").as("Test2"),
        col("Test3").cast("double").as("Test3"), col("Test4").cast("double").as("Test4"),
        col("Final").cast("double").as("Final"), col("Grade"))),
    "l05_meta_enrich" -> ((s, d) => qtyAsDouble(enrichedA(s, d))),
    "l11_hash_projection" -> ((s, d) => enrichedA(s, d).select(M.KeyHash, M.RecordHash)),
    "l09_delta" -> ((s, d) => qtyAsDouble(Cdc.delta(enrichedA(s, d), enrichedB(s, d))
      .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.RecordHash))),
    // the bucketed-store delta form: must produce EXACTLY the pair
    // anti-join's rows (same oracle SQL), while re-keying the join so a
    // KEY_HASH-bucketed store is read with zero Exchange
    "l09_delta_bucketed" -> ((s, d) => qtyAsDouble(Cdc.deltaBucketed(enrichedA(s, d), enrichedB(s, d))
      .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.RecordHash))),
    // the incremental-feed regime pair: a SMALL batch (every 100th order
    // key of run 2 — ~1% of keys) against the large standing store. The
    // plain-anti-join twin measures what the regime costs without routing…
    "l09_delta_batch" -> ((s, d) => qtyAsDouble(Cdc.delta(stagedHashStoreA(s, d), batchB(s, d))
      .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.RecordHash))),
    // …and the Bloom route probes the STAGED store synopsis (built once
    // per store generation, its cost visible in x_stage_build_bloom):
    // definite-new rows bypass the store entirely, maybe rows resolve
    // through the broadcast residual — the store is scanned once
    // (pair columns only) and never shuffled. Must produce EXACTLY the
    // pair anti-join's rows (same oracle SQL — false positives cost a
    // probe, never a wrong answer)
    "l09_delta_bloom" -> ((s, d) => qtyAsDouble(
      Cdc.deltaBloomWith(stagedHashStoreA(s, d), batchB(s, d),
        stagedBloomSynopsis(s, d), bits = BloomBits)
        .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.RecordHash))),
    // ---- staged-store BUILD accounting rows: the one-time cost of the
    // artifacts every staged read above amortizes, measured as its own
    // row (compute + persist to scratch) instead of silently landing on
    // whichever read-query touches a store first ----
    "x_stage_build_neardup_pairs" -> ((s, d) =>
      buildScratch(s, "neardup_pairs_b16_h2")(
        Dedup.simhashNearDuplicates(Tables.documents(s, d), "doc_id", "text", 16, 2))),
    "x_stage_build_bloom" -> ((s, d) =>
      buildScratch(s, "bloom_synopsis_b22")(
        Cdc.bloomSynopsis(stagedHashStoreA(s, d), bits = BloomBits).coalesce(1))),
    "l13_inserts" -> ((s, d) => Cdc.inserts(enrichedA(s, d), enrichedB(s, d))
      .select("l_orderkey", "l_linenumber", M.KeyHash)),
    "l14_updates" -> ((s, d) => qtyAsDouble(Cdc.updates(enrichedA(s, d), enrichedB(s, d))
      .select("l_orderkey", "l_linenumber", "quantity", M.RecordHash))),
    "l10_union_append" -> ((s, d) => {
      val cur = enrichedA(s, d)
      qtyAsDouble(cur.unionByName(Cdc.delta(cur, enrichedB(s, d)))
        .select("l_orderkey", "l_linenumber", "quantity", "returnflag", "linestatus",
          "shipdate", M.KeyHash, M.RecordHash, M.InsertRunId))
    }),
    "l16_historize_runs" -> ((s, d) => {
      // The reference's only end-to-end path (main.py:14-34) as the pure
      // two-run chain: bootstrap run over snapshot A, incremental run over B.
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      qtyAsDouble(Historization.historizeFrames(r1, snapB(s, d), cur2, keys))
    }),
    // ---- parity: design-spec operators (SURVEY §2.2) ----
    "d03_schema_evolution" -> ((s, d) => {
      val base = snapA(s, d)
      val target = org.apache.spark.sql.types.StructType(
        base.schema.fields.filterNot(_.name == "linestatus") :+
          org.apache.spark.sql.types.StructField("load_source",
            org.apache.spark.sql.types.StringType, nullable = true))
      qtyAsDouble(SchemaEvolution.prepareSchema(base, target,
        Map("load_source" -> "batch"), removeColumns = true))
    }),
    "d04_merge_cdc" -> ((s, d) => {
      val cur  = enrichedA(s, d)
      val newD = enrichedB(s, d).filter(pmod(col("l_orderkey"), lit(7)) === 0)
      val del  = cur.filter(pmod(col("l_orderkey"), lit(13)) === 0).select(M.KeyHash)
      qtyAsDouble(Cdc.mergeCdc(cur, newD, Seq(M.KeyHash), Some(del))
        .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.RecordHash))
    }),
    "d06_scd2_merge" -> ((s, d) => qtyAsDouble(scd2v2(s, d))),
    // D1 bootstrap + D5 valid-from policy variants (LoadDate is covered by d06)
    "d05_valid_from_lower" -> ((s, d) => qtyAsDouble(
      Scd2.historizeDataset(enrichedA(s, d), None, cur1, ValidFromMode.LowerBound))),
    "d05_valid_from_custom" -> ((s, d) => qtyAsDouble(
      Scd2.historizeDataset(enrichedA(s, d), None, cur1, ValidFromMode.Custom("2020-06-15")))),
    "d07_deletes_by_column" -> ((s, d) =>
      Cdc.deletesByColumn(enrichedA(s, d), "returnflag", "R")),
    "d08_deleted_full_load" -> ((s, d) => {
      val shrunk = enrichedB(s, d).filter(pmod(col("l_orderkey"), lit(3)) =!= 0)
      Cdc.deletedByFullLoad(enrichedA(s, d), shrunk)
    }),
    // D7/D8 composed INTO the history — the closure the reference's dead
    // code never wires: run-3 full load drops every 7th order key; the
    // vanished keys' ACTIVE rows close (runDay − 1 = leap-day 02-29) and
    // stamp DELETED, closed history and surviving keys pass through
    "x_scd2_delete_close" -> ((s, d) => {
      val snap3 = enrichedB(s, d).filter(pmod(col("l_orderkey"), lit(7)) =!= 0)
      qtyAsDouble(Scd2.closeVanished(stagedScd2v2(s, d), snap3, cur3)
        .select("l_orderkey", "l_linenumber", "quantity", M.RecordHash,
          M.UpdateTs, M.UpdateRunId, M.ValidFrom, M.ValidTo, M.Deleted))
    }),
    // resurrection: run 4 re-delivers the FULL load, so every key the
    // run-3 closure closed comes back — a fresh interval opens at the
    // run-4 day and the validity gap (the deleted epoch) is preserved.
    // The store-maintenance composition (closure pass + reopen pass) is
    // registered because the fixture's snapshot is NOT key-unique (the
    // synthetic lineitem duplicates (orderkey, linenumber)), which the
    // merge forms' contract excludes; reopenClosed makes no such
    // assumption. mergeScd2Reopen (merge + reopen in one run) is
    // property-tested in Scd2Spec under the key-unique contract.
    "x_scd2_reopen" -> ((s, d) => {
      val snap3 = enrichedB(s, d).filter(pmod(col("l_orderkey"), lit(7)) =!= 0)
      val closed = Scd2.closeVanished(stagedScd2v2(s, d), snap3, cur3).persist()
      qtyAsDouble(Scd2.reopenClosed(closed, enrichedB(s, d), cur4)
        .select("l_orderkey", "l_linenumber", "quantity", M.RecordHash,
          M.UpdateTs, M.UpdateRunId, M.ValidFrom, M.ValidTo, M.Deleted))
    }),
    // TIERED twin of the whole 4-run delete lifecycle: active rows in one
    // store, closed intervals appended to a run-partitioned archive —
    // merges touch the active tier plus a KEY_HASH-projected archive
    // probe, never the history payload (the layout that stops merge cost
    // scaling with history length). The tiering must be INVISIBLE to
    // readers: (archive ∪ active) after runs 1-4 (bootstrap, 53-modulus
    // change, 7-modulus vanish, full re-delivery) answers the flat
    // lifecycle's closed-form statement. The fixture is ORDERS — the
    // key-unique dimension — because the tiered lifecycle composes the
    // merge forms, whose contract is a key-unique full load (the
    // duplicate-keyed lineitem is the documented reason x_scd2_reopen
    // uses the pass forms instead). Fresh build each call — this row
    // measures the tiered lifecycle itself.
    "x_scd2_tiered" -> ((s, d) => {
      val base = s"/tmp/graft_scratch/scd2_tier_${dirTag(d, "orders")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val m = ValidFromMode.LoadDate
      val (ap, hp) = (s"$base/active", s"$base/history")
      val keysO = Seq("o_orderkey")
      val a = MetaEnrichment.addMetaColumns(ordProj(s, d), cur1, keysO)
      val b = MetaEnrichment.addMetaColumns(ordSnapB(s, d), cur2, keysO)
      Scd2Tier.historizeTiered(s, a, ap, hp, cur1, m)
      Scd2Tier.historizeTiered(s, b, ap, hp, cur2, m)
      Scd2Tier.historizeTiered(s,
        b.filter(pmod(col("o_orderkey"), lit(7)) =!= 0), ap, hp, cur3, m)
      Scd2Tier.historizeTiered(s, b, ap, hp, cur4, m)
      tieredReadProjection(s, ap, hp)
    }),
    // STEADY-STATE tiered row: the number that matters at year N of a
    // daily-merged dimension is the per-run slice, not the lifecycle
    // rebuild — runs 1-3 are staged once (cold cost in the staging pass,
    // like every other staged store) and this row times run 4 ALONE:
    // archive KEY_HASH probe, active merge, reopen, closure, swap. The
    // application is in-place and CONVERGENT (the crash contract: a
    // replay against the advanced store recomputes the identical active
    // tier and appends nothing), so re-running the row measures the same
    // merge work and answers the same flat closed-form statement as the
    // fresh-lifecycle twin x_scd2_tiered.
    "x_scd2_tiered_run" -> ((s, d) => {
      val (ap, hp) = stagedTierRuns13(s, d)
      Scd2Tier.historizeTiered(s,
        MetaEnrichment.addMetaColumns(ordSnapB(s, d), cur2, Seq("o_orderkey")),
        ap, hp, cur4, ValidFromMode.LoadDate)
      tieredReadProjection(s, ap, hp)
    }),
    // ARCHIVE COMPACTION is reader-invisible: fold the staged 4-run
    // archive's older `run=` partitions (3 partitions -> keepRuns=2
    // keeps the newest, folds the other two) and answer the SAME
    // closed-form statement the uncompacted store answers — under the
    // driver's hash, compaction changed nothing a reader can see.
    // Idempotent: a second call finds <= keepRuns partitions and
    // returns without rewriting.
    "x_scd2_tiered_compact" -> ((s, d) => {
      val (ap, hp) = stagedTier4Runs(s, d)
      Scd2Tier.compactHistory(s, hp, keepRuns = 2)
      tieredReadProjection(s, ap, hp)
    }),
    "l15_split_active" -> ((s, d) => Scd2.splitMergedDataset(stagedScd2v2(s, d))._2
      .select("l_orderkey", "l_linenumber", M.RecordHash, M.ValidFrom, M.ValidTo)),
    "l15_split_hist" -> ((s, d) => Scd2.splitMergedDataset(stagedScd2v2(s, d))._1
      .select("l_orderkey", "l_linenumber", M.RecordHash, M.ValidFrom, M.ValidTo)),
    // point-in-time reconstruction: the historized table as it was on a
    // mid-history day (run 1 live, run 2 not yet — every v1 row valid)
    // and on the close-out boundary day itself (closed rows' VALID_TO is
    // inclusive, so 2024-02-14 still reads the pre-change versions)
    "x_store_asof" -> ((s, d) => qtyAsDouble(Scd2.asOf(stagedScd2v2(s, d), "2024-02-01")
      .select("l_orderkey", "l_linenumber", "quantity",
        M.RecordHash, M.ValidFrom, M.ValidTo))),
    "x_store_asof_boundary" -> ((s, d) =>
      qtyAsDouble(Scd2.asOf(stagedScd2v2(s, d), "2024-02-14")
        .select("l_orderkey", "l_linenumber", "quantity",
          M.RecordHash, M.ValidFrom, M.ValidTo))),
    // bucketed point-in-time POINT lookup: "the version of key X live on
    // day D" against the writeStoreBucketed layout — one bucket directory
    // of 8, KEY_HASH row-group pruned, validity bounds pushed (plan
    // pinned in StoreSpec). The demo key is the snapshot's minimum
    // business key; its KEY_HASH literal derives driver-side exactly as
    // the md5 enrichment defines it (bounded collect: two scalars)
    "x_store_asof_point" -> ((s, d) =>
      qtyAsDouble(Store.readStoreBucketAsOf(s, stagedScd2v2BucketedPath(s, d),
        minKeyHash(snapA(s, d)), "2024-02-01", buckets = 8)
        .select("l_orderkey", "l_linenumber", "quantity",
          M.RecordHash, M.ValidFrom, M.ValidTo))),
    // full version chain of one key — the point lookup without the day
    // restriction; the demo key is the minimum CHANGED key (modulus-97
    // bump), so the history has both the closed row and its successor
    "x_store_key_history" -> ((s, d) =>
      qtyAsDouble(Store.readStoreBucketKey(s, stagedScd2v2BucketedPath(s, d),
        minKeyHash(snapA(s, d).filter(pmod(col("l_orderkey"), lit(97)) === 0)),
        buckets = 8)
        .select("l_orderkey", "l_linenumber", "quantity",
          M.RecordHash, M.ValidFrom, M.ValidTo))),
    // interval audit read: every version valid at any point of
    // [2024-01-05, 2024-02-10] — the window ends BEFORE the run-2
    // boundary, so run-1 rows qualify (including ones later closed on
    // Feb 14: they were live during the window) while every Feb 15
    // opening is excluded; both bounds push to the scan like asOf
    "x_store_between" -> ((s, d) =>
      qtyAsDouble(Scd2.between(stagedScd2v2(s, d), "2024-01-05", "2024-02-10")
        .select("l_orderkey", "l_linenumber", "quantity",
          M.RecordHash, M.ValidFrom, M.ValidTo))),
    // temporal join: align the lineitem history (versions at keys % 97)
    // with the orders history (versions at keys % 53) on the time axis —
    // equi-join on orderkey, windows intersected, empty intersections
    // dropped. Both sides read standing stores; the plan is a plain
    // equi-join with the overlap test as a post-join filter (no nested
    // loop — pinned in PlanAuditSpec)
    "x_store_temporal_join" -> ((s, d) =>
      Scd2.temporalJoin(
        stagedScd2v2(s, d), stagedOrdersScd2(s, d),
        Seq("l_orderkey" -> "o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("quantity").cast("double").as("quantity"),
          col("totalprice").cast("double").as("totalprice"),
          col(M.RecordHash),
          col(M.RecordHash + "_R").as("RECORD_HASH_R"),
          col(M.ValidFrom), col(M.ValidTo))),
    // run-based time travel over the APPEND-ONLY hash store (the l16
    // loop's sink): filtering the two-run chain to run 1's INSERT_RUN_ID
    // must reproduce exactly the run-1 snapshot content — the
    // "reproduce the training set a past run trained on" query
    "x_store_asof_run" -> ((s, d) => {
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      val full = Historization.historizeFrames(r1, snapB(s, d), cur2, keys)
      qtyAsDouble(full.filter(col(M.InsertRunId) <= cur1.runId))
    }),
    // generation travel: the physical-rewrite axis of time travel — the
    // store exactly as maintenance pass 1 committed it, read AFTER pass 2
    // committed its successor generation (pass 1's directory is never
    // touched by the commit, so the read is the pass-1 run-1 content)
    "x_store_generation_travel" -> ((s, d) => {
      val path = stagedGenerationStore(s, d)
      qtyAsDouble(Store.readStoreGeneration(s, path, Store.listGenerations(s, path).head))
    }),
    // CROSS-STORE snapshot travel: resolve the PASS-1 manifest and read
    // the hash store at its pinned generation — after pass 2 committed
    // both stores and its own manifest. The pin must land on pass 1's
    // run-1 content (the oracle recomputes it); that the companion stats
    // store pins to the SAME pass is the consistency property the specs
    // exercise (a latest-per-store read would race the pass boundary)
    "x_store_manifest_snapshot" -> ((s, d) => {
      val root = stagedManifestSnapshot(s, d)
      val firstGen = Store.listGenerations(s, s"$root/manifest").head
      val pinned = Store.readSnapshot(s, s"$root/manifest",
        Map("hash" -> s"$root/hash", "stats" -> s"$root/stats"), Some(firstGen)).get._2
      qtyAsDouble(pinned("hash"))
    }),
    // erasure COMPOSED with snapshots: purging a pinned store renumbers
    // its generations, so purgeSnapshot rewrites the retained manifest
    // history through the purge mapping — the pass-1 manifest still
    // resolves pass 1, now minus the erased keys (the stats store is
    // untouched and keeps its original pins). Copy + purge + remap each
    // run: the honest per-erasure cost on a snapshot deployment
    "x_store_manifest_purged" -> ((s, d) => {
      val src = stagedManifestSnapshot(s, d)
      val path = s"/tmp/graft_scratch/manifest_purge_${dirTag(d, "lineitem")}"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val removed = liProj(s, d).select("l_orderkey").distinct()
        .filter(pmod(col("l_orderkey"), lit(7)) === 0)
      val mapping = Store.purgeSnapshot(s, s"$path/manifest",
        Seq(("hash", s"$path/hash", "l_orderkey")), removed)
      val pass1 = mapping(mapping.keys.min)
      qtyAsDouble(Store.readSnapshot(s, s"$path/manifest",
        Map("hash" -> s"$path/hash"), Some(pass1)).get._2("hash"))
    }),
    // cross-generation ERASURE: takedown repairs the latest generation,
    // but retention keeps prior passes that still hold the removed rows —
    // purgeGenerations rewrites EVERY retained generation (order
    // preserved, each rewrite committed as a new generation so pinned
    // readers stay safe) and prunes the pre-purge passes. Purges a fresh
    // COPY of the staged two-generation store (purge mutates; staged
    // stores are immutable), returning the purged twin of generation 1:
    // run-1 content minus the removed keys, which the oracle recomputes
    // independently. The full-pass measurement (copy + 2 rewrites +
    // prune) is the honest per-erasure cost.
    "x_store_generation_purged" -> ((s, d) => {
      val src = stagedGenerationStore(s, d)
      val path = s"/tmp/graft_scratch/gens_purge_${dirTag(d, "lineitem")}"
      val conf = s.sparkContext.hadoopConfiguration
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
        fs, new org.apache.hadoop.fs.Path(path), false, conf)
      val removed = liProj(s, d).select("l_orderkey").distinct()
        .filter(pmod(col("l_orderkey"), lit(7)) === 0)
      val mapping = Store.purgeGenerations(s, path, removed, "l_orderkey")
      qtyAsDouble(Store.readStoreGeneration(s, path, mapping(mapping.keys.min)))
    }),
    // symmetric store diff: run-1 snapshot vs the SHRUNK mutated run-2
    // feed — all three statuses present (added: post-cutoff keys,
    // removed: the vanished 3rd keys, changed: the 97th-key mutation).
    // Payloads never shuffle: both sides reduce to (key, digest) first
    "x_store_diff" -> ((s, d) =>
      Cdc.storeDiff(snapA(s, d), shrunkB(s, d),
        Seq("l_orderkey", "l_linenumber"),
        Seq("quantity", "returnflag", "linestatus", "shipdate"))),
    // the publish-gate roll-up of the same diff
    "x_store_diff_summary" -> ((s, d) =>
      Cdc.storeDiffSummary(snapA(s, d), shrunkB(s, d),
        Seq("l_orderkey", "l_linenumber"),
        Seq("quantity", "returnflag", "linestatus", "shipdate"))),
    // file-skipping manifest read: a range over the SORT key of the
    // staged range-sorted store — the driver-side manifest proves which
    // of the 16 files can intersect [1000, 1999] (file-level pruning,
    // before any footer is opened), the exact predicate re-applies over
    // the kept files, so the result is row-identical to a full filtered
    // scan — which is exactly what the oracle computes
    "x_store_skipping" -> ((s, d) =>
      StoreIndex.readStoreSkipping(
        s, stagedSortedLineitemPath(s, d), "l_orderkey", 1000L, 1999L)),
    // time-slice read over the shipdate-sorted store: the "one month of
    // a years-spanning fact store" pattern — the manifest's native
    // TIMESTAMP min/max prove which files overlap the slice
    "x_store_time_slice" -> ((s, d) =>
      // LocalDateTime literals: the parquet column reads as
      // TIMESTAMP_NTZ in Spark 4, and NTZ compares only against NTZ
      StoreIndex.readStoreSkipping(
        s, stagedTimeSortedLineitemPath(s, d), "l_shipdate",
        java.time.LocalDateTime.parse("1997-03-01T00:00:00"),
        java.time.LocalDateTime.parse("1997-03-31T23:59:59"))),
    // scattered point lookups through the manifest: each key's file is
    // proven by [min, max] containment before any footer opens; parquet
    // row-group stats narrow further inside the kept files
    "x_store_point_lookup" -> ((s, d) =>
      StoreIndex.readStoreKeys(
        s, stagedSortedLineitemPath(s, d), "l_orderkey", Seq(123L, 7777L, 14000L))),
    // two-dimensional box over the Z-ordered store: BOTH range predicates
    // prune through the per-file stats (the Z-layout keeps min/max tight
    // on both columns; a single-column sort would leave the second
    // column's per-file range spanning the whole domain)
    "x_store_zorder_box" -> ((s, d) =>
      StoreIndex.readStoreBox(s, stagedZOrderLineitemPath(s, d),
        "l_partkey", 100L, 299L, "l_suppkey", 10L, 39L)),
    // layout-build accounting row: sort + write + manifest scan, honest
    // cost of the artifact the two reads above amortize. The returned
    // row aggregates the MANIFEST — its totals must reproduce the
    // table's, which is the faithfulness property skipping depends on
    "x_stage_build_sorted" -> ((s, d) => {
      val path = "/tmp/graft_scratch/lineitem_sorted_f16"
      StoreIndex.writeStoreSorted(
        Tables.lineitem(s, d), path, Seq("l_orderkey"), numFiles = 16)
      s.read.parquet(StoreIndex.statsManifestPath(path)).agg(
        sum("n_rows").as("n_rows"),
        min("min_l_orderkey").as("min_k"), max("max_l_orderkey").as("max_k"),
        sum("nulls_l_orderkey").as("n_nulls"))
    }),
    // soft-delete stamping: run 2 delivers a SHRUNK full snapshot (every
    // 3rd order key vanished); instead of dropping the vanished keys'
    // rows (D8/mergeCdc), stampDeleted writes DELETED = run-2 ts and
    // keeps every row — the reference's declared-but-never-populated
    // DELETED timestamp (MetaColumnHelpers.py:150) completed
    "x_store_deleted_stamp" -> ((s, d) => {
      val r1 = Historization.historizeFrames(
        enrichedA(s, d).limit(0), snapA(s, d), cur1, keys)
      val shrunk = shrunkB(s, d)
      val r2 = Historization.historizeFrames(r1, shrunk, cur2, keys)
      val stamped = Cdc.stampDeleted(
        r2, MetaEnrichment.addMetaColumns(shrunk, cur2, keys), cur2)
      qtyAsDouble(stamped.select("l_orderkey", "l_linenumber", "quantity",
        M.KeyHash, M.RecordHash, M.InsertRunId, M.Deleted))
    }),
    // deletion-aware run travel: as of run 2 — the run that stamped the
    // deletions — the vanished keys' rows are invisible (DELETED <= the
    // as-of instant), while travel to run 1 still sees them (spec-pinned
    // in CdcSpec); time travel stays truthful for removals. Reads the
    // STAGED stamped store: travel is a read of standing state
    // (x_store_deleted_stamp keeps measuring the stamping pass fresh)
    "x_store_asof_run_deleted" -> ((s, d) =>
      qtyAsDouble(Historization.asOfRun(stagedStamped2Run(s, d), cur2.runId)
        .select("l_orderkey", "l_linenumber", "quantity", M.KeyHash, M.InsertRunId))),
    // schema evolution INSIDE the historization loop: run 1 delivers the
    // base schema, run 2 adds a source_sys column (populated for every
    // 5th order key). Evolution to the target schema happens before
    // enrichment, so run-1 rows hash with the null default and run-2
    // re-deliveries carrying a value re-version, while re-deliveries
    // still at the default stay unchanged — drifting feed schemas do not
    // fork the store
    "x_historize_evolving" -> ((s, d) => {
      val target = org.apache.spark.sql.types.StructType(
        snapA(s, d).schema.fields :+ org.apache.spark.sql.types.StructField(
          "source_sys", org.apache.spark.sql.types.StringType, nullable = true))
      val run2 = snapB(s, d).withColumn("source_sys",
        when(pmod(col("l_orderkey"), lit(5)) === 0, lit("sys2")))
      val bootstrap = MetaEnrichment.addMetaColumns(
        SchemaEvolution.prepareSchema(snapA(s, d), target), cur1, keys).limit(0)
      val r1 = Historization.historizeFramesEvolving(
        bootstrap, snapA(s, d), cur1, keys, target)
      qtyAsDouble(Historization.historizeFramesEvolving(
        r1, run2, cur2, keys, target))
    }),
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
    // ---- extensions: similarity search ----
    "x_sim_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
    }),
    // params measured, not guessed: recall@10 = 0.90 on the sf0.01
    // embeddings (SimilaritySpec pins a 0.6 CI floor on exactly these)
    "x_sim_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10,
        planes = 2, dims = 64, tables = 4)
    }),
    // the composed quantized-ANN path: SRP buckets over int8 codes (the
    // wide shuffle moves 1-byte codes, not floats), exact re-rank on the
    // original vectors. Same planes/tables as x_sim_ann_lsh — bucket signs
    // are scale-invariant, so recall matches the dequantized measurement
    // (0.90 at sf0.01; same CI floor applies)
    "x_sim_ann_quantized" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.quantizedLshTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10,
        planes = 2, dims = 64, tables = 4)
    }),
    // product quantization + ADC: corpus as 16 4-dim-subspace codes,
    // per-query lookup tables, reconstructed-norm cosine shortlist,
    // exact re-rank of the top-40. recall@10 = 0.76 at sf0.01 (CI floor
    // 0.6 in SimilaritySpec)
    "x_sim_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10,
        m = 16, codes = 16, iters = 2, probe = 40)
    }),
    // recall@10 = 0.70 at sf0.01 (same CI floor applies)
    "x_sim_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10, centroids = 16, nprobe = 8)
    }),
    // persist-then-probe PQ: the codebook frame and code table are the
    // artifacts a production corpus encodes ONCE and stores; the probe
    // trains and encodes nothing. Must equal x_sim_pq row-for-row (same
    // oracle statement); the parquet round-trip itself is pinned in
    // SimilaritySpec — registered queries stay pure
    "x_sim_pq_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
        m = 16, codes = 16, iters = 2)
      Similarity.pqTopKWith(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding",
        Similarity.pqEncodeWith(emb, "vec_id", "embedding", cb), cb,
        k = 10, probe = 40)
    }),
    // persist-then-probe IVF: stored centroid frame + inverted file,
    // corpus vectors join in by id only for scoring; equals x_sim_ivf
    "x_sim_ivf_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", centroids = 16)
      Similarity.ivfTopKWith(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding",
        Similarity.ivfAssignWith(emb, "vec_id", "embedding", cents), cents,
        k = 10, nprobe = 8)
    }),
    // IVF over Lloyd-REFINED centroids: kmeansCentroids replaces the
    // md5-sample coarse quantizer on the SAME stored-artifact probe path
    // (the drop-in refinement the kmeans scaladoc promises). Measured:
    // recall@10 0.88 vs 0.70 for the sample at the same nprobe=8 —
    // training the quantizer buys recall with zero probe-cost change
    "x_sim_ivf_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 16, iters = 2)
        .withColumn("nrm", Similarity.l2Norm(col("centroid")))
      Similarity.ivfTopKWith(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding",
        Similarity.ivfAssignWith(emb, "vec_id", "embedding", cents), cents,
        k = 10, nprobe = 8)
    }),
    // the COMPOSED index (IVFADC, Jégou et al. 2011): PQ codes of the
    // residual within each IVF cell, probed by q·c + ADC(q·r) over the
    // posting's stored true norm, exact re-rank of the top-80. All three
    // artifacts (centroid frame, residual codebooks, coded postings) are
    // the persist-once model synopses; recall@10 = 0.78 at sf0.01
    // (CI floor 0.6 in SimilaritySpec)
    "x_sim_ivfpq_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", centroids = 16)
      val cb = Similarity.ivfPqCodebook(emb, "vec_id", "embedding", cents,
        m = 16, codes = 32, iters = 2)
      val post = Similarity.ivfPqEncodeWith(emb, "vec_id", "embedding", cents, cb)
      Similarity.ivfPqTopKWith(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", post, cents, cb,
        k = 10, nprobe = 10, probe = 80)
    }),
    // the batch-cost demonstration for the PQ leg (the kmeans-incremental
    // shape): codebook trained on the corpus, but ONLY the vec_id ≡ 4
    // (mod 5) batch is encoded through the stored model — the per-batch
    // cost a production ingest pays. Codes flattened to CSV (atomic dump
    // columns only, the r6 rule)
    "x_sim_pq_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
        m = 16, codes = 16, iters = 2)
      Similarity.pqEncodeWith(emb.filter(col("vec_id") % 5 === 4), "vec_id", "embedding", cb)
        .select(col("vec_id"), array_join(col("codes"), ",").as("codes_csv"))
    }),
    // same for the IVF leg: centroids trained on the corpus, only the
    // batch assigned through the stored frame into the inverted file
    "x_sim_ivf_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", centroids = 16)
      Similarity.ivfAssignWith(emb.filter(col("vec_id") % 5 === 4), "vec_id", "embedding", cents)
    }),
    // int8 scalar quantization: 4x smaller vectors for the ANN shuffle.
    // The dump flattens codes to a CSV string: the driver's checker sorts
    // every dumped column, and array-typed cells crash its pandas sort
    // (r6 red row) — registered dumps expose only atomic-typed columns.
    "x_sim_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), col("q.scale").as("scale"),
          array_join(col("q.codes"), ",").as("codes_csv"))),
    // 2^4 buckets per table × 2 OR'd tables: bucket count sized for the
    // sf0.01/sf0.1 corpus (use embeddingNearDupPairsAuto at unknown scale)
    "x_sim_near_dup" -> ((s, d) =>
      Similarity.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        minCos = 0.4, planes = 4, dims = 64, tables = 2)),
    // cross-run semantic near-dup: odd-id vectors are the new batch, the
    // even-id vectors' persisted bucket index plays the accumulated
    // corpus index (the embedding twin of x_dedup_minhash_incremental)
    "x_sim_near_dup_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val index = Similarity.srpBucketIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        planes = 4, dims = 64, tables = 2)
      Similarity.incrementalEmbeddingCandidates(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", index,
        planes = 4, dims = 64, tables = 2)
    }),
    // the production composition: candidates from the index probe, then
    // exact cosine over only the candidate pairs
    "x_sim_near_dup_incr_verified" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.filter(col("vec_id") % 2 === 0)
      val index = Similarity.srpBucketIndex(corpus, "vec_id", "embedding",
        planes = 4, dims = 64, tables = 2)
      Similarity.incrementalEmbeddingNearDuplicates(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", index, corpus,
        minCos = 0.4, planes = 4, dims = 64, tables = 2)
    }),
    // size-derived bucket count: planes = autoPlanes(count, 64) — the
    // copy-paste template that still holds at unknown corpus scale (the
    // oracle mirrors the derivation with a scalar count() subquery)
    "x_sim_near_dup_auto" -> ((s, d) =>
      Similarity.embeddingNearDupPairsAuto(Tables.embeddings(s, d), "vec_id", "embedding",
        minCos = 0.4, dims = 64, tables = 2, targetPerBucket = 64)),
    // ---- extensions: salted skew join (oracle = the plain join it must
    // be row-identical to; returnflag has 3 values -> maximal key skew) ----
    "x_skew_join" -> ((s, d) => {
      val li = liProj(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("returnflag"), col("quantity"))
      val dim = li.groupBy("returnflag").agg(
        count(lit(1)).as("n_flag"),
        sum(col("quantity")).cast("double").as("sum_qty"))
      SkewJoin.saltedInnerJoin(li.drop("quantity"), dim, Seq("returnflag"), salt = 8)
    }),
    // bucketed interval join: shipments landing inside 31-day order
    // windows (every 601st order), an equi-join on 16-day buckets plus the
    // exact containment filter — never a nested-loop/cartesian plan.
    // Day numbers are the NTZ timestamp's date part as epoch days
    // (timezone-free on both engines); the window subset is deterministic
    "x_range_join" -> ((s, d) => {
      val day = (c: org.apache.spark.sql.Column) => unix_date(c.cast("date"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        day(col("l_shipdate")).as("ship_day"))
      val win = Tables.orders(s, d).filter(col("o_orderkey") % 601 === 0)
        .select(col("o_orderkey").as("win_key"),
          day(col("o_orderdate")).as("lo"),
          (day(col("o_orderdate")) + 30).as("hi"))
      RangeJoin.pointInInterval(li, "ship_day", win, "lo", "hi", bucketWidth = 16)
        .select("win_key", "l_orderkey", "l_linenumber", "ship_day")
    }),
    // SemDeDup-style semantic dedup: deterministic k-means (IVF-seeded,
    // two decimal-sum Lloyd rounds) buckets the corpus; within-cluster
    // cosine pairs feed the standard cluster/canonical machinery; output
    // is the surviving (canonical + unpaired) vec_ids
    "x_emb_semdedup" -> ((s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        minCos = 0.4, k = 8, iters = 2).select("vec_id")),
    // persisted k-means model: centroids trained on the corpus once
    // (kmeansCentroids — the k-means leg of the persisted-model story),
    // a ~20% "new batch" assigned through the stored frame
    // (kmeansAssignWith) must land in exactly the cells the full in-loop
    // assignment gives those rows
    "x_emb_kmeans_incremental" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
      Similarity.kmeansAssignWith(emb.filter(col("vec_id") % 5 === 4),
        "vec_id", "embedding", cents)
    }),
    // ---- extensions: embedding pooling ----
    "x_emb_meanpool" -> ((s, d) =>
      Embeddings.meanPoolExact(
        Tables.embeddings(s, d).withColumn("grp", pmod(col("vec_id"), lit(16))),
        "grp", "embedding")),
    // embedding drift between two ingest slices: cosine + L2 between the
    // slices' exact mean vectors — the dataset-shift monitor a corpus
    // store runs per batch; slice size never reaches past the two pooling
    // scans
    "x_emb_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Embeddings.driftStats(
        emb.filter(pmod(col("vec_id"), lit(2)) === 0),
        emb.filter(pmod(col("vec_id"), lit(2)) === 1))
    }),
    // ---- extensions: text analysis ----
    "x_text_profile" -> ((s, d) =>
      TextAnalysis.profile(Tables.documents(s, d), "doc_id", "text")),
    "x_text_bm25" -> ((s, d) =>
      TextAnalysis.bm25(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "vector", "join", "hash"))),
    "x_text_quality" -> ((s, d) =>
      TextAnalysis.gopherishFlags(Tables.documents(s, d), "doc_id", "text")),
    // code-point Shannon entropy: the gibberish/binary-junk band signal
    "x_text_entropy" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        round(TextAnalysis.charEntropy(col("text")), 6).as("char_entropy"))),
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
    // embedding-prep chunking: 120-char windows, 24-char overlap; the
    // tail window is shorter, which the oracle's substring mirrors
    "x_text_chunks" -> ((s, d) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
        size = 120, overlap = 24)),
    // pre-dedup canonicalization: NFC composition + whitespace collapse.
    // The fixture corpus is ASCII (NFC-identity), so a decomposed suffix
    // — combining acute U+0301 and the Angstrom sign U+212B, which NFC
    // maps to precomposed é and Å — is appended to make the composition
    // path itself the thing under oracle check
    "x_text_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.normalizeWhitespace(TextAnalysis.normalizeNfc(
          concat(col("text"), lit("  café Å end ")))).as("norm_text"))
        .withColumn("n_chars_norm", length(col("norm_text")))),
    // tokenizer coverage: every-5th-doc slice plays the reference vocab,
    // the rest of the corpus is measured against it
    "x_text_oov" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.oovRate(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
        docs.filter(col("doc_id") % 5 === 0)
          .select(explode(graft.operators.Dedup.tokens(col("text"))).as("tok")))
    }),
    "x_text_report" -> ((s, d) =>
      TextAnalysis.corpusReport(Tables.documents(s, d), "text")),
    "x_text_redact" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.redactPii(col("text")).as("redacted"))),
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
    // intra-doc repetition removal: collapse consecutive duplicate tokens
    "x_text_collapse" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.collapseTokenRuns(col("text")).as("collapsed"))),
    // corpus-wide C4-style line dedup: the synthetic corpus is single-
    // line, so the query first derives 8-token lines (regex parity with
    // the oracle checked byte-for-byte), then keeps only each repeated
    // line's global first occurrence
    "x_text_dedup_lines" -> ((s, d) =>
      Dedup.dedupLinesAcrossCorpus(
        Tables.documents(s, d).withColumn("text",
          regexp_replace(col("text"), "((?:\\S+ ){8})", "$1\n")),
        "doc_id", "text")),
    // stopword-profile language ID (C4/Gopher gate): per-row argmax of
    // function-word hit ratios; the oracle's stopword lists are generated
    // from the SAME TextAnalysis.stopwords val, so they cannot drift
    "x_text_lang" -> ((s, d) =>
      TextAnalysis.languageId(Tables.documents(s, d), "doc_id", "text")),
    // CCNet-style unigram log-prob quality score against the corpus's own
    // unigram distribution; decimal-summed, ln-parity per bm25 precedent
    "x_text_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d), "doc_id", "text")),
    // bigram conditional log-prob: word-order-sensitive quality score
    // against the corpus's own bigram distribution; docs with < 2 tokens
    // are absent on both engines
    "x_text_bigram" -> ((s, d) =>
      TextAnalysis.bigramLogProb(Tables.documents(s, d), "doc_id", "text")),
    // corpus boilerplate discovery: top word-3-grams by document
    // frequency, distributed top-k (TakeOrdered), gram-text tiebreak
    "x_text_boilerplate" -> ((s, d) =>
      TextAnalysis.frequentNgrams(Tables.documents(s, d), "doc_id", "text",
        n = 3, topK = 20)),
    // inverted-index tf-idf cosine: lexical near-dup pairs through shared
    // sub-cap terms only — never all-pairs
    "x_text_tfidf_pairs" -> ((s, d) =>
      TextAnalysis.tfidfCosinePairs(Tables.documents(s, d), "doc_id", "text",
        minSim = 0.3, maxTermDocFreq = 100)),
    // positional winnowing fingerprints (Schleimer et al. SIGMOD'03):
    // rightmost-min of each w-hash window over character k-grams
    "x_text_winnow" -> ((s, d) =>
      TextAnalysis.winnow(Tables.documents(s, d), "doc_id", "text", k = 12, w = 8)),
    // MOSS-style overlap report: docs sharing >= 2 winnowed fingerprints
    "x_text_winnow_pairs" -> ((s, d) =>
      TextAnalysis.winnowSimilarPairs(Tables.documents(s, d), "doc_id", "text",
        k = 12, w = 8, minShared = 2, maxFpDocFreq = 100)),
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
    // the same pipeline with the optional language gate on: docs whose
    // stopword-profile language is not English drop out at the scan stage
    "x_curate_lang" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.curate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3, languages = Some(Set("en")))
    }),
    // curation with the near-dup cluster stage: exact dedup, then simhash
    // Hamming pairs -> transitive clusters -> keep the cluster minimum.
    // Pairs come from the staged store, restricted inside `curate` to the
    // surviving docs (pair membership is pairwise, so hamming<=1 pairs
    // are exactly the staged hamming<=2 rows filtered) — curation reuses
    // the corpus pair set instead of re-deriving its own
    "x_curate_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.curate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3, nearDup = Some((16, 1)),
        nearDupPairs = Some(stagedSimhashPairs(s, d, 16, 2).filter(col("hamming") <= 1)))
    }),
    // curation with the MEDIA near-dup stage: after exact dedup, the docs'
    // payloads run the perceptual-hash pipeline (aHash fingerprints ->
    // pigeonhole Hamming pairs -> transitive clusters -> keep the cluster
    // minimum) — the multimodal twin of x_curate_neardup, composing
    // Multimodal.phashNearDuplicates into the same CC + election stages
    "x_curate_media" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.curate(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", shingleN = 3, mediaDup = Some((16, 2)),
        // the staged full-corpus phash pair store, restricted to
        // survivors inside curate — the production shape (pairs computed
        // once per corpus, not once per question); equality with the
        // in-query computation is spec-pinned in CurationSpec
        mediaDupPairs = Some(stagedPhashPairs(s, d, 16, 2)))
    }),
    // ---- extensions: sequence packing (context-window assembly) ----
    "x_pack_sequences" -> ((s, d) =>
      Packing.packSequences(Tables.documents(s, d), "doc_id", "text",
        budget = 512L, shards = 8)),
    "x_pack_summary" -> ((s, d) =>
      Packing.packSummary(
        Packing.packSequences(Tables.documents(s, d), "doc_id", "text",
          budget = 512L, shards = 8),
        budget = 512L)),
    // group-atomic: synthetic groups of ~1% of the corpus each stay whole
    "x_pack_groups" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Packing.packGroups(
        docs.withColumn("grp", (col("doc_id") % 100).cast("long")),
        "doc_id", "grp",
        TextAnalysis.tokenCount(col("text")).cast("long"),
        budget = 2048L, shards = 8)
    }),
    // packing budgeted by the byte-level BPE merge-table count
    // ([[graft.operators.TextAnalysis.bpeCount]]) — the production-
    // truthful budget: context windows are sized in tokenizer tokens,
    // and a whitespace count under-sizes punctuation-dense text. The
    // oracle replays the SAME merges table as a sequential replace
    // chain (equivalent to the encoder loop for the well-formed table)
    // the validator guards the oracle's sequential-replay assumption:
    // an ill-formed table would be rejected here, never mis-hashed
    "x_pack_bpe" -> ((s, d) =>
      Packing.packByCount(Tables.documents(s, d), "doc_id",
        TextAnalysis.bpeCount(col("text"),
          TextAnalysis.validateBpeMerges(TextAnalysis.DefaultBpeMerges)).cast("long"),
        budget = 2048L, shards = 8)),
    // kernel cost at a PRODUCTION vocabulary size: the same packing
    // statement over the ~55k-rule stress table (every printable digram
    // ranked + frequent-trigram composites — denser merge activity than
    // a trained 50k vocabulary, so this upper-bounds the real cost). No
    // SQL twin: a 55k-rule replace chain is not an oracle, it's a second
    // implementation — the driver records the rows-only check, and the
    // bench row is the point (VERDICT r11 #3: within ~2x of the 58-rule
    // kernel time).
    "x_pack_bpe50k" -> ((s, d) =>
      Packing.packByCount(Tables.documents(s, d), "doc_id",
        TextAnalysis.bpeCount(col("text"),
          TextAnalysis.StressBpeMerges50k).cast("long"), budget = 8192L, shards = 8)),
    // the id-emitting side of the tokenizer: the token STREAM a training
    // pipeline feeds the model (bpeCount only sizes it). Exploded to
    // scalar rows for the compare; 1/13 of the corpus bounds the row
    // volume while exercising every kernel path on real text
    "x_text_bpe_encode" -> ((s, d) =>
      Tables.documents(s, d).filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("doc_id"), posexplode(TextAnalysis.bpeEncode(col("text"),
          TextAnalysis.validateBpeMerges(TextAnalysis.DefaultBpeMerges))))
        .select(col("doc_id"), (col("pos") + 1).as("tok_pos"),
          col("col").as("token_id"))),
    // the packed TRAINING SEQUENCES themselves: pack membership by the
    // count kernel, per-pack token stream = member docs' id arrays
    // concatenated in pack_pos order — the operator a 100 TB pretraining
    // run ships to the trainer. collect_list is per-(shard, pack) — its
    // size is the pack's doc count, bounded by budget/min-doc-tokens,
    // never corpus-shaped; array_sort makes the unordered collect
    // deterministic
    "x_pack_bpe_sequences" -> ((s, d) => {
      val merges = TextAnalysis.validateBpeMerges(TextAnalysis.DefaultBpeMerges)
      val docs = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(13)) === 0)
      val packed = Packing.packByCount(docs, "doc_id",
        TextAnalysis.bpeCount(col("text"), merges).cast("long"),
        budget = 2048L, shards = 8)
      packed
        .join(docs.select(col("doc_id"),
          TextAnalysis.bpeEncode(col("text"), merges).as("ids")), Seq("doc_id"))
        .groupBy("shard", "pack_id")
        .agg(collect_list(struct(col("pack_pos"), col("ids"))).as("parts"))
        .select(col("shard"), col("pack_id"),
          posexplode(flatten(transform(array_sort(col("parts")),
            x => x.getField("ids")))))
        .select(col("shard"), col("pack_id"),
          (col("pos") + 1).cast("long").as("seq_pos"), col("col").as("token_id"))
    }),
    // ---- extensions: deterministic sampling / splits ----
    "x_split_assign" -> ((s, d) =>
      Sampling.assignSplit(Tables.documents(s, d).select("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),
    "x_sample_stratified" -> ((s, d) =>
      Sampling.sampleStratified(Tables.events(s, d), "event_id", "event_type",
        Map("click" -> 0.5, "view" -> 0.1, "purchase" -> 1.0))
        .select("event_id", "event_type")),
    // mixture down-sampling to a char budget: 4 weighted sources share
    // 10k chars 4:3:2:1, the rest of the corpus is dropped; the oracle
    // embeds the SAME Sampling.budgetTargets doubles as literals
    "x_sample_mixture" -> ((s, d) =>
      Sampling.sampleToBudget(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars", budget = 10000.0, mixtureWeights)),
    // epoch oversampling at weight 2.3: two full copies + a 0.3 draw
    "x_sample_weighted" -> ((s, d) =>
      Sampling.sampleWithWeight(Tables.documents(s, d).select("doc_id"), "doc_id", 2.3)
        .select("doc_id", "copy")),
    // domain-cap curation: at most 10 docs survive per source, elected by
    // the deterministic hash order (every source has 25 at this SF, so
    // every group truncates and the election itself is what's checked)
    "x_sample_cap" -> ((s, d) =>
      Sampling.capPerGroup(Tables.documents(s, d), "doc_id", "source", maxPerGroup = 10)
        .select("doc_id", "source")),
    // deterministic global training order: contiguous 0-based positions
    // by hash order — the zipWithIndex build (range exchange + two
    // narrow stages), never a single-partition global window
    "x_sample_shuffle" -> ((s, d) =>
      Sampling.shufflePositions(
        Tables.documents(s, d).select("doc_id"), "doc_id", "ord")),
    // quality-band mixture: tertile the corpus by (rounded) char entropy
    // via the bottom-k cutpoint sketch, keep 20%/50%/100% per band — the
    // no-global-sort "sample harder from better data" recipe; the score
    // rounds to 6dp upstream so both engines band identical doubles
    "x_sample_band" -> ((s, d) =>
      Sampling.sampleByScoreBand(
          Tables.documents(s, d).select(col("doc_id"),
            round(TextAnalysis.charEntropy(col("text")), 6).as("score")),
          "doc_id", "score", fractions = Seq(0.2, 0.5, 1.0), k = 64)
        .select(col("doc_id"), col("score"), col("band").cast("int").as("band"))),
    // KMV distinct-count sketch: per event type, distinct users estimated
    // from the 64 smallest user-id hash uniforms (150 true distinct, so
    // the (k-1)/U(k) estimator path is exercised, not the exact fallback)
    "x_sketch_distinct" -> ((s, d) =>
      Sketches.approxDistinctKmv(Tables.events(s, d), Seq("event_type"), "user_id",
        k = 64)),
    // Count-Min frequencies: lineitem part keys sketched into 4×256
    // cells, probed for every 50th part key; width is deliberately small
    // relative to ~2k distinct keys so the min-over-rows estimate path
    // (not a collision-free identity) is what's being checked
    "x_sketch_cms" -> ((s, d) =>
      Sketches.cmsFrequencies(Tables.lineitem(s, d), "l_partkey",
        Tables.part(s, d).filter(col("p_partkey") % 50 === 0), "p_partkey",
        width = 256, depth = 4)),
    // bottom-k quantiles: per-priority order totals from the 256
    // hash-smallest orders per group (~3k rows/group, so the sampled
    // path is exercised, not the exact small-group fallback)
    "x_sketch_quantiles" -> ((s, d) =>
      Sketches.approxQuantilesBottomK(Tables.orders(s, d), Seq("o_orderpriority"),
        "o_orderkey", "o_totalprice", Seq(0.25, 0.5, 0.75, 0.9, 0.99), k = 256)),
    // robust anomaly detection: event values score by |v-med|/MAD with
    // med and MAD from the bottom-k row sample; the value column is
    // right-skewed, so mean/stddev would mask exactly these outliers
    "x_sketch_outliers" -> ((s, d) =>
      Sketches.robustOutliers(
        Tables.events(s, d).select("event_id", "value"),
        "event_id", "value", threshold = 3.0, k = 256)),
    // MERGED KMV synopses: three disjoint ingest batches each persist a
    // ≤ 64-row synopsis; the roll-up (merge + estimate) must EQUAL the
    // fresh whole-corpus estimate — the lossless-merge law that lets a
    // store answer "distinct users so far" per batch without re-reading
    // any shard. The oracle computes the fresh global estimate
    "x_sketch_kmv_merged" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val parts = (0 to 2).map(b =>
        Sketches.kmvSynopsis(ev.filter(pmod(col("event_id"), lit(3)) === b), "user_id", k = 64))
      Sketches.kmvEstimate(Sketches.kmvMerge(parts, k = 64), k = 64)
    }),
    // MERGED Count-Min sketches: per-batch cell counts sum to exactly
    // the fresh corpus sketch (counts are linear), so probing the merged
    // cells answers the SAME estimates as x_sketch_cms — same oracle
    "x_sketch_cms_merged" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val parts = (0 to 2).map(b =>
        Sketches.cmsSketch(li.filter(pmod(col("l_orderkey"), lit(3)) === b),
          "l_partkey", width = 256, depth = 4))
      Sketches.cmsProbe(Sketches.cmsMerge(parts),
        Tables.part(s, d).filter(col("p_partkey") % 50 === 0), "p_partkey",
        width = 256, depth = 4)
    }),
    // HLL distinct per event type (deterministic md5 registers, p=8):
    // the harmonic-mean sum runs in fixed point (integer terms
    // 2^(maxRho−M)), so the estimate is association-order-free and
    // hash-matches the oracle's identical integer arithmetic; event_id
    // (~1–3k distinct per type vs m=256) keeps the raw branch active
    "x_sketch_hll" -> ((s, d) =>
      Sketches.approxDistinctHll(Tables.events(s, d), Seq("event_type"), "event_id", p = 8)),
    // MERGED HLL register synopses: per-(group,bucket) MAX over three
    // event-sharded synopses of user_id (the same user lands in many
    // shards — the merge must be idempotent, not just additive) equals
    // the fresh whole-corpus registers, so the merged estimate answers
    // the fresh statement; p=4 exercises the small-m alpha constant
    "x_sketch_hll_merged" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val parts = (0 to 2).map(b =>
        Sketches.hllRegisters(ev.filter(pmod(col("event_id"), lit(3)) === b),
          Seq("event_type"), "user_id", p = 4))
      Sketches.hllEstimate(Sketches.hllMerge(parts, Seq("event_type")), Seq("event_type"), p = 4)
    }),
    // EXACT heavy hitters (bot/abuse detection shape): Misra-Gries
    // candidates (pass 1, bounded state) -> exact recount of candidates
    // (pass 2, broadcast). Output is exact regardless of sketch
    // internals, so the oracle is a plain GROUP BY ... HAVING; the MG
    // superset guarantee itself is property-tested in SketchesSpec
    "x_sketch_heavy" -> ((s, d) =>
      Sketches.heavyHitters(Tables.events(s, d), "user_id", minShare = 0.005)),
    // ---- extensions: multimodal plumbing ----
    // real files on disk through the binaryFile source (not text-as-binary):
    // a deterministic fixture is (re)written driver-side, Spark ingests the
    // raw bytes, DuckDB's read_blob reads the same files as the oracle
    // schema'd JSONL ingestion (the interchange format of training-data
    // pipelines): explicit schema (no inference pass), nested struct and
    // array fields, null vs MISSING keys distinguished correctly; output
    // projects to scalars so the dump/oracle compare stays canonical
    "x_jsonl_scan" -> ((s, _) => {
      writeJsonlFixture(jsonlFixtureDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("title", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        org.apache.spark.sql.types.StructField("meta", org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("tokens", org.apache.spark.sql.types.LongType))))))
      Store.readJsonl(s, s"$jsonlFixtureDir/docs.jsonl", Some(schema))
        .select(col("id"), col("title"), col("score"),
          size(col("tags")).as("n_tags"),
          col("meta.lang").as("lang"), col("meta.tokens").as("tokens"))
    }),
    "x_media_binary" -> ((s, _) => {
      writeMediaFixture(mediaFixtureDir)
      Store.readBinaryFiles(s, mediaFixtureDir, Some("*.bin"))
        .select(
          substring_index(col("path"), "/", -1).as("name"),
          col("length").as("byte_len"),
          lower(hex(col("content"))).as("content_hex"))
    }),
    "x_media_meta" -> ((s, d) =>
      Multimodal.decodeMetaSql(Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"))),
    "x_media_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"))),
    // Dump projections canonicalize non-scalar outputs (the driver's pandas
    // compare cannot sort array/binary cells): features -> comma-joined
    // floor(x*1e6) ints, payload -> lowercase hex. The operators themselves
    // keep the real types.
    "x_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"), dims = 8)
        .select(col("id"),
          when(col("features").isNotNull,
            concat_ws(",",
              transform(col("features"), x => floor(x * lit(1e6)).cast("long").cast("string"))))
            .as("features_q"))),
    "x_media_resize" -> ((s, d) =>
      Multimodal.resizeStub(Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"), 64, 64)
        .select(col("id"), col("width"), col("height"),
          lower(hex(col("payload"))).as("payload_hex"))),
    // perceptual-hash near-dup pairs: aHash fingerprints (mean-threshold
    // over the stub-decode features), pigeonhole Hamming blocking
    "x_media_phash" -> ((s, d) =>
      Multimodal.phashNearDuplicates(
        Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text"),
        bits = 16, maxHamming = 2)),
    // ---- extensions: as-of join (point-in-time lookup) ----
    "x_asof_purchase" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", "ts",
        rightPrefix = "p_", rightTieBreak = Some("event_id"))
    }),
    "x_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts", "ts",
        rightPrefix = "p_", rightTieBreak = Some("event_id"),
        tolerance = Some("30 MINUTES"))
    }),
    // ---- extensions: event analytics (batch twins of the streaming path) ----
    "x_events_tumbling" -> ((s, d) => EventAnalytics.tumblingAgg(Tables.events(s, d), 60)),
    "x_events_running" -> ((s, d) => EventAnalytics.userRunning(Tables.events(s, d))),
    "x_events_sessionize" -> ((s, d) => EventAnalytics.sessionize(Tables.events(s, d), 30)),
    // the NATIVE session_window twin: engine-managed merge, no session_no;
    // boundary semantics match sessionize (gap strictly greater splits) at
    // full microsecond precision — the oracle compares raw timestamps,
    // not floor-second epochs
    "x_events_sessionize_native" -> ((s, d) =>
      EventAnalytics.sessionizeNative(Tables.events(s, d), 30)),
    "x_events_top_types" -> ((s, d) => EventAnalytics.topTypesPerHour(Tables.events(s, d), 3)),
    "x_events_cohort" -> ((s, d) => EventAnalytics.cohortRetention(Tables.events(s, d))),
    // ordered conversion funnel view -> click -> purchase: each step's
    // time must be strictly after the previous step's
    "x_events_funnel" -> ((s, d) =>
      EventAnalytics.funnelCounts(Tables.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))),
    // attribution: purchases joined to the same user's clicks in the
    // preceding 2 hours — an EQUI-join on user_id with the window as a
    // post-join filter (never a cartesian); the stream-stream twin
    // (intervalJoinStream) is pinned ≡ to this operator in StreamingSpec
    "x_events_attribution" -> ((s, d) =>
      EventAnalytics.attributionCounts(Tables.events(s, d), "purchase", "click", 120)),
    // ---- extensions: analytic benchmarks over the star schema ----
    "x_agg_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),
    "x_join_revenue" -> ((s, d) => {
      val li  = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),
    // TPC-H Q5-style star join: two fact SMJs, every dimension broadcast;
    // exercises join ordering + broadcast selection on a 6-table plan
    "x_join_region_revenue" -> ((s, d) => {
      val li   = Tables.lineitem(s, d)
      val ord  = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val supp = Tables.supplier(s, d)
      val nat  = Tables.nation(s, d)
      val reg  = Tables.region(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),
    // ---- extensions: reshape (pandas pivot_table / melt / crosstab) ----
    // wide pivot with a DECLARED vocabulary: single hash aggregate, no
    // distinct-discovery pass over the pivot column
    "x_reshape_pivot" -> ((s, d) =>
      Reshape.pivotAgg(Tables.lineitem(s, d), Seq("l_linestatus"), "l_returnflag",
        Seq("A", "N", "R"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double"), "qty_")),
    // long melt: zero-shuffle row expansion, NULL cells kept
    "x_reshape_unpivot" -> ((s, d) =>
      Reshape.melt(Tables.part(s, d), Seq("p_partkey"),
        Seq("p_retailprice", "p_size"), "metric", "value")),
    // contingency counts, empty cells 0 (total-preserving)
    "x_reshape_crosstab" -> ((s, d) =>
      Reshape.crosstabCounts(Tables.documents(s, d), "source", "lang",
        Seq("de", "en", "es", "fr", "zh"))),
    // hierarchical subtotals with explicit grouping flags (subtotal NULL
    // vs data NULL disambiguated)
    "x_agg_rollup" -> ((s, d) =>
      Reshape.rollupAgg(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"),
        Seq(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty")))),
    // ---- extensions: incrementally-maintained materialized aggregates ----
    // three ingest batches -> three partial states -> one merge: the
    // finalized view must hash-match the from-scratch recompute no matter
    // how the corpus was batched
    "x_agg_maintain" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val batches = (0 until 3).map(i =>
        MaterializedAgg.partialState(
          li.filter(pmod(col("l_orderkey"), lit(3)) === i), Seq("l_returnflag"), "l_quantity"))
      MaterializedAgg.finalizeView(
        MaterializedAgg.mergeStates(batches, Seq("l_returnflag")), Seq("l_returnflag"))
    }),
    // delete maintenance: batch 2 retracted from the standing state
    // (algebraic measures by negative merge, extrema by touched-group
    // repair over survivors) ≡ recompute over batches 0+1 only
    "x_agg_maintain_retract" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val g = Seq("l_returnflag")
      val b = (0 until 3).map(i => li.filter(pmod(col("l_orderkey"), lit(3)) === i))
      val standing = MaterializedAgg.mergeStates(
        b.map(MaterializedAgg.partialState(_, g, "l_quantity")), g)
      val retracted = MaterializedAgg.mergeStates(
        Seq(standing, MaterializedAgg.retractState(b(2), g, "l_quantity")), g)
      val survivors = b(0).unionByName(b(1))
      MaterializedAgg.finalizeView(
        MaterializedAgg.repairGroups(retracted, survivors, b(2), g, "l_quantity"), g)
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
    // rolling 7-day revenue per priority over DAILY PARTIALS: the window
    // sorts per-(priority, day) synopsis rows (groups × days,
    // corpus-independent), never the orders facts
    "x_agg_rolling" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      MaterializedAgg.rollingOver(daily, Seq("o_orderpriority"), "day", "rev", 6)
        .select(col("o_orderpriority"), col("day"),
          col("rev").cast("double").as("day_rev"),
          col("roll_sum").cast("double").as("roll7_rev"),
          col("n_in_window").as("n_days"))
    }),
    // rolling DISTINCT over maintained daily HLL partials: sums cannot
    // roll a distinct (the same user across two days counts once in the
    // week), register-max can — each day merges its trailing 7 days'
    // registers and estimates. The window works on synopsis rows
    // (|types| x |days| x <=16 registers at p=4), never the events
    "x_agg_rolling_hll" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      val daily = MaterializedAgg.partialDistinctHll(
        ev, Seq("event_type", "day"), "user_id", p = 4)
      MaterializedAgg.rollingDistinctHll(daily, Seq("event_type"), "day", 7, p = 4)
    }),
    // distinct-count measure maintained the same way: per-batch KMV
    // synopses merged across batches ≡ the single-pass estimate (merge
    // law); holistic, so deletes go through touched-group repair, not
    // retraction
    "x_agg_maintain_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val g = Seq("event_type")
      val b = (0 until 3).map(i => ev.filter(pmod(col("user_id"), lit(3)) === i))
      MaterializedAgg.finalizeDistinct(
        MaterializedAgg.mergeDistinct(
          b.map(MaterializedAgg.partialDistinct(_, g, "user_id")), g), g)
    }),
    // HLL flavor of the maintained distinct — the many-groups regime
    // (2^p registers per group beat k doubles once groups are millions);
    // shards overlap on user_id so the register-max merge must be
    // idempotent, then a delete touching ONE group repairs from
    // survivors (HLL cannot retract), untouched groups' registers stand
    "x_agg_maintain_hll" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val g = Seq("event_type")
      val b = (0 to 2).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
      val state = MaterializedAgg.mergeDistinctHll(
        b.map(MaterializedAgg.partialDistinctHll(_, g, "user_id", p = 4)), g)
      val gone = col("event_type") === "purchase" && pmod(col("user_id"), lit(2)) === 0
      val repaired = MaterializedAgg.repairDistinctHll(
        state, ev.filter(!gone), ev.filter(gone), g, "user_id", p = 4)
      MaterializedAgg.finalizeDistinctHll(repaired, g, p = 4)
    }),
    // quantile measure maintained the same way: per-batch bottom-k
    // (hash, value) synopses — the persisted hash coordinate is what
    // makes the sample re-mergeable — merged ≡ the single-pass sketch
    "x_agg_maintain_quantile" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val g = Seq("o_orderpriority")
      val b = (0 until 3).map(i => ord.filter(pmod(col("o_orderkey"), lit(3)) === i))
      MaterializedAgg.finalizeQuantile(
        MaterializedAgg.mergeQuantile(
          b.map(MaterializedAgg.partialQuantile(_, g, "o_orderkey", "o_totalprice", k = 256)),
          g, k = 256),
        g, Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    }),
    // leaderboard measure maintained the same way: per-batch top-k
    // (value desc, id asc) synopses — the same semilattice trim law as
    // the extrema — merged ≡ the fresh whole-corpus leaderboard; the
    // distinct in the merge absorbs a replayed batch (idempotent)
    "x_agg_maintain_topk" -> ((s, d) => {
      val ord = Tables.orders(s, d)
      val g = Seq("o_orderpriority")
      val b = (0 until 3).map(i => ord.filter(pmod(col("o_orderkey"), lit(3)) === i))
      MaterializedAgg.finalizeTopK(
        MaterializedAgg.mergeTopK(
          b.map(MaterializedAgg.partialTopK(_, g, "o_orderkey", "o_totalprice", k = 10)),
          g, k = 10), g)
    }),
    // ---- extensions: incrementally-maintained materialized joins ----
    // three ingest rounds with BOTH sides growing — (L0,R0), (L1,R1),
    // (∅,R2) — each round contributing only its delta triple
    // ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR against the sides standing BEFORE it; the
    // union of the three deltas must hash-match the from-scratch join,
    // in any batching (the Blakeley SIGMOD'86 insert algebra)
    "x_join_maintain" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val lB = (0 until 2).map(i => li.filter(pmod(col("l_orderkey"), lit(2)) === i))
      val rB = (0 until 3).map(i => ord.filter(pmod(col("l_orderkey"), lit(3)) === i))
      val keys = Seq("l_orderkey")
      // the demo batches are table-halves, not small production deltas:
      // leave strategy choice to AQE instead of forcing a broadcast
      val d1 = MaterializedJoin.insertDelta(li.limit(0), lB(0), ord.limit(0), rB(0), keys,
        broadcastDeltas = false)
      val d2 = MaterializedJoin.insertDelta(lB(0), lB(1), rB(0), rB(1), keys,
        broadcastDeltas = false)
      val d3 = MaterializedJoin.insertDelta(lB(0).unionByName(lB(1)), li.limit(0),
        rB(0).unionByName(rB(1)), rB(2), keys, broadcastDeltas = false)
      d1.unionByName(d2).unionByName(d3)
    }),
    // the two IVM halves COMPOSE: each batch's join delta feeds an
    // aggregate partial, and the merged state must equal the aggregate
    // over the from-scratch join — a maintained dashboard over a
    // maintained join pays |ΔJ| + |touched groups| per batch, never |J|
    "x_join_agg_maintain" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      val lB = (0 until 2).map(i => li.filter(pmod(col("l_orderkey"), lit(2)) === i))
      val rB = (0 until 3).map(i => ord.filter(pmod(col("l_orderkey"), lit(3)) === i))
      val keys = Seq("l_orderkey")
      val deltas = Seq(
        MaterializedJoin.insertDelta(li.limit(0), lB(0), ord.limit(0), rB(0), keys,
          broadcastDeltas = false),
        MaterializedJoin.insertDelta(lB(0), lB(1), rB(0), rB(1), keys,
          broadcastDeltas = false),
        MaterializedJoin.insertDelta(lB(0).unionByName(lB(1)), li.limit(0),
          rB(0).unionByName(rB(1)), rB(2), keys, broadcastDeltas = false))
      val g = Seq("o_orderpriority")
      MaterializedAgg.finalizeView(
        MaterializedAgg.mergeStates(
          deltas.map(MaterializedAgg.partialState(_, g, "l_quantity")), g), g)
    }),
    // dimension refresh (the UPDATE third of the lifecycle): every 10th
    // order's priority changes; the view retracts rows joined to the
    // touched keys and re-joins the standing facts against just the new
    // dimension rows — and must equal the recompute over the updated
    // dimension
    "x_join_refresh_dim" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val view = MaterializedJoin.insertDeltaLeft(li, ord, Seq("l_orderkey"),
        broadcastDelta = false)
      val updated = ord.filter(pmod(col("l_orderkey"), lit(10)) === 0)
        .withColumn("o_orderpriority", concat(lit("R-"), col("o_orderpriority")))
      MaterializedJoin.refreshDimension(view, li, updated, Seq("l_orderkey"))
    }),
    // star-schema maintenance: fact batches star-join ALL standing
    // dimensions in one pass (ΔF⋈D1⋈D2, fold of broadcast delta joins —
    // the dominant 100 TB regime: facts grow continuously, dimensions
    // maintain on their own cadence); batch-delta union ≡ 3-way join
    "x_join_maintain_star" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      val ordDim = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      val partDim = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      val b = (0 until 3).map(i => li.filter(pmod(col("l_orderkey"), lit(3)) === i))
      b.map(MaterializedJoin.insertDeltaStar(_,
          Seq((ordDim, Seq("l_orderkey")), (partDim, Seq("l_partkey"))),
          broadcastDelta = false))
        .reduce(_ unionByName _)
    }),
    // delete maintenance by PROVENANCE: left rows with l_linenumber = 3
    // are deleted; the standing view retracts by anti-join on the left
    // row id (l_orderkey, l_linenumber) — never a re-join — and must
    // equal the recompute over surviving left rows
    "x_join_maintain_retract" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val view = MaterializedJoin.insertDeltaLeft(li, ord, Seq("l_orderkey"),
        broadcastDelta = false)
      MaterializedJoin.retractByIds(view,
        li.filter(col("l_linenumber") === 3), Seq("l_orderkey", "l_linenumber"))
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
    })
  )

  // --------------------------------------------------------------------
  // oracle SQL (DuckDB dialect, tables = parquet files in the same dir)
  // --------------------------------------------------------------------

  /** Shared CTE text: deterministic snapshots + meta enrichment. */
  private val snapshotsCte: String =
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |         CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
       |         l_returnflag AS returnflag, l_linestatus AS linestatus,
       |         CAST(l_shipdate AS DATE) AS shipdate
       |  FROM lineitem
       |),
       |snapA AS (SELECT * FROM base WHERE shipdate < DATE '1995-06-01'),
       |snapB AS (
       |  SELECT l_orderkey, l_linenumber,
       |         CASE WHEN l_orderkey % 97 = 0
       |              THEN CAST(quantity + 10 AS DECIMAL(18,2)) ELSE quantity END AS quantity,
       |         returnflag, linestatus, shipdate
       |  FROM base
       |),
       |enrichA AS (
       |  SELECT *,
       |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
       |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'))) AS "KEY_HASH",
       |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
       |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'),
       |                        coalesce(CAST(quantity AS VARCHAR),'nan'),
       |                        coalesce(returnflag,'nan'), coalesce(linestatus,'nan'),
       |                        coalesce(CAST(shipdate AS VARCHAR),'nan'))) AS "RECORD_HASH",
       |    TIMESTAMP '$ts1' AS "INSERT_TS", TIMESTAMP '$ts1' AS "UPDATE_TS",
       |    '20240101100000' AS "INSERT_RUN_ID", '20240101100000' AS "UPDATE_RUN_ID",
       |    CAST(NULL AS TIMESTAMP) AS "DELETED"
       |  FROM snapA
       |),
       |enrichB AS (
       |  SELECT *,
       |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
       |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'))) AS "KEY_HASH",
       |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
       |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'),
       |                        coalesce(CAST(quantity AS VARCHAR),'nan'),
       |                        coalesce(returnflag,'nan'), coalesce(linestatus,'nan'),
       |                        coalesce(CAST(shipdate AS VARCHAR),'nan'))) AS "RECORD_HASH",
       |    TIMESTAMP '$ts2' AS "INSERT_TS", TIMESTAMP '$ts2' AS "UPDATE_TS",
       |    '20240215103000' AS "INSERT_RUN_ID", '20240215103000' AS "UPDATE_RUN_ID",
       |    CAST(NULL AS TIMESTAMP) AS "DELETED"
       |  FROM snapB
       |)""".stripMargin

  /** SCD2 CTE chain on top of the snapshots: bootstrap merge of A, then the
    * five-branch merge of B (semantics of SCDHelpers.py:129-220). */
  /** The delete-closure SELECT over `v2` — shared by `x_scd2_delete_close`
    * and the reopen row so the two statements cannot drift. */
  private val scd2CloseSelect: String =
    s"""SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
       |       "RECORD_HASH",
       |       CASE WHEN "VALID_TO" = DATE '9999-12-31' AND l_orderkey % 7 = 0
       |            THEN TIMESTAMP '$ts3' ELSE "UPDATE_TS" END AS "UPDATE_TS",
       |       CASE WHEN "VALID_TO" = DATE '9999-12-31' AND l_orderkey % 7 = 0
       |            THEN '20240301093000' ELSE "UPDATE_RUN_ID" END AS "UPDATE_RUN_ID",
       |       "VALID_FROM",
       |       CASE WHEN "VALID_TO" = DATE '9999-12-31' AND l_orderkey % 7 = 0
       |            THEN DATE '2024-02-29' ELSE "VALID_TO" END AS "VALID_TO",
       |       CASE WHEN "VALID_TO" = DATE '9999-12-31' AND l_orderkey % 7 = 0
       |            THEN TIMESTAMP '$ts3' ELSE "DELETED" END AS "DELETED"
       |FROM v2""".stripMargin

  private val scd2Cte: String =
    s"""$snapshotsCte,
       |v1 AS (
       |  SELECT *, DATE '2024-01-01' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO"
       |  FROM enrichA
       |),
       |cur_only AS (
       |  SELECT c.* FROM v1 c LEFT JOIN enrichB n ON c."KEY_HASH" = n."KEY_HASH"
       |  WHERE n."KEY_HASH" IS NULL OR c."VALID_TO" <> DATE '9999-12-31'
       |),
       |new_only AS (
       |  SELECT n.*, DATE '2024-02-15' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO"
       |  FROM enrichB n WHERE n."KEY_HASH" NOT IN (SELECT "KEY_HASH" FROM v1)
       |),
       |unchanged AS (
       |  SELECT c.* FROM v1 c JOIN enrichB n
       |  ON c."KEY_HASH" = n."KEY_HASH" AND c."RECORD_HASH" = n."RECORD_HASH"
       |     AND c."VALID_TO" = DATE '9999-12-31'
       |),
       |changed_cur AS (
       |  SELECT c.* REPLACE (TIMESTAMP '$ts2' AS "UPDATE_TS",
       |                      '20240215103000' AS "UPDATE_RUN_ID",
       |                      DATE '2024-02-14' AS "VALID_TO")
       |  FROM v1 c JOIN enrichB n
       |  ON c."KEY_HASH" = n."KEY_HASH" AND c."RECORD_HASH" <> n."RECORD_HASH"
       |     AND c."VALID_TO" = DATE '9999-12-31'
       |),
       |changed_new AS (
       |  SELECT n.*, DATE '2024-02-15' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO"
       |  FROM enrichB n JOIN v1 c
       |  ON c."KEY_HASH" = n."KEY_HASH" AND c."RECORD_HASH" <> n."RECORD_HASH"
       |     AND c."VALID_TO" = DATE '9999-12-31'
       |),
       |v2 AS (
       |  SELECT * FROM cur_only UNION ALL BY NAME
       |  SELECT * FROM new_only UNION ALL BY NAME
       |  SELECT * FROM unchanged UNION ALL BY NAME
       |  SELECT * FROM changed_cur UNION ALL BY NAME
       |  SELECT * FROM changed_new
       |)""".stripMargin

  /** Pigeonhole-blocked Hamming-pair CTEs over a preceding CTE named `fp`
    * with columns (doc_id, fp) — the SQL twin of
    * [[Dedup.hammingNearDuplicates]], blocks generated from the SAME
    * (lo, width) computation the operator uses, so query and oracle
    * cannot drift. Ends in `pairs (id_a, id_b, hamming)`. */
  private def duckHammingPairs(bits: Int, maxHamming: Int): String = {
    val blocks = Dedup.hammingBlocks(bits, maxHamming).zipWithIndex.map { case ((lo, w), j) =>
      s"SELECT doc_id AS id, fp, $j AS blk, (fp >> $lo) & ${(1L << w) - 1} AS bval FROM fp"
    }.mkString("\n  UNION ALL ")
    s"""blocked AS (
       |  $blocks
       |),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
       |  FROM blocked a JOIN blocked b
       |    ON a.blk = b.blk AND a.bval = b.bval AND a.id < b.id
       |),
       |pairs AS (
       |  SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
       |  FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= $maxHamming
       |)""".stripMargin
  }

  private lazy val simhashNearPairsCte: String =
    s"""$simhashFpCte,
       |${duckHammingPairs(16, 2)}""".stripMargin

  /** The 64-bit sibling of [[simhashNearPairsCte]] — one definition shared
    * by the wide pair, cluster, and election oracles so the corpus-scale
    * width's arithmetic cannot drift between them. */
  private lazy val simhashWideNearPairsCte: String =
    s"""WITH $duckToksCte,
       |${simhashFpTail(64)},
       |${duckHammingPairs(64, 3)}""".stripMargin

  /** Recursive min-label connected-components CTEs over a pair relation
    * (`id_a`, `id_b`): `cc` enumerates (node, reachable node) over the
    * symmetric edge list — min(label) per id is the component minimum,
    * the same fixpoint [[Dedup.duplicateClusters]] converges to. One
    * definition shared by every cluster oracle so the recursion rule
    * cannot drift between them. Requires a `WITH RECURSIVE` statement. */
  private def duckConnectedComponents(pairsRel: String): String =
    s"""edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM $pairsRel
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM $pairsRel
       |),
       |cc AS (
       |  SELECT src AS id, src AS label FROM edges
       |  UNION
       |  SELECT e.src AS id, c.label FROM edges e JOIN cc c ON c.id = e.dst
       |)""".stripMargin

  /** [[duckConnectedComponents]] plus the `losers` CTE: every node that is
    * not its component's minimum — the set [[Dedup.keepCanonical]] drops. */
  private def duckCcLosers(pairsRel: String): String =
    s"""${duckConnectedComponents(pairsRel)},
       |losers AS (
       |  SELECT id FROM cc GROUP BY id HAVING id <> min(label)
       |)""".stripMargin

  /** Deterministic-k-means CTE chain (the SQL twin of
    * [[Similarity.kmeansAssign]]): `v` = vectors with norms, `c0` =
    * smallest-md5(id) seed centroids as doubles, then per Lloyd round r a
    * norm CTE `n{r}`, cosine-argmax assignment `a{r}` (ties toward the
    * larger cid, the IVF rule), and decimal-sum means `c{r+1}` with
    * empty clusters keeping their previous centroid. Ends with the final
    * assignment `a{iters} (id, vv, nrm, cid)`. Every numeric step reuses
    * an already-green derivation: the x_sim_ivf init/argmax and the
    * x_emb_meanpool decimal-mean. */
  private def duckKmeansCtes(k: Int, iters: Int, dims: Int = 64): String = {
    val d1 = dims + 1
    val head =
      s"""v AS (
         |  SELECT vec_id AS id, embedding AS vv,
         |    sqrt(list_sum(list_transform(range(1, $d1),
         |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings
         |),
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS INT) AS cid,
         |         list_transform(range(1, $d1), i -> CAST(vv[i] AS DOUBLE)) AS cv
         |  FROM v ORDER BY md5(CAST(id AS VARCHAR)) LIMIT $k
         |)""".stripMargin
    def round_(r: Int): String = {
      val mean =
        s"""m${r + 1} AS (
           |  SELECT cid, CAST(i AS INT) AS i,
           |    round(CAST(sum(CAST(CAST(vv[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
           |          / count(vv[CAST(i AS INT)]), 6) AS m
           |  FROM a$r, range(1, $d1) t(i) GROUP BY cid, i
           |),
           |g${r + 1} AS (SELECT cid, list(m ORDER BY i) AS cv FROM m${r + 1} GROUP BY cid),
           |c${r + 1} AS (
           |  SELECT c.cid, coalesce(g.cv, c.cv) AS cv
           |  FROM c$r c LEFT JOIN g${r + 1} g USING (cid)
           |)""".stripMargin
      s"""${assignCte(r, d1)}${if (r < iters) ",\n" + mean else ""}"""
    }
    (head +: (0 to iters).map(round_)).mkString(",\n")
  }

  /** Product-quantization ANN mirror ([[graft.operators.Similarity.pqTopK]]):
    * every CTE carries the subspace index `s` as a column, so one set of
    * CTEs covers all m subspaces. Parity pins, operand for operand:
    * md5-smallest seed rows sliced per subspace; L2 assignment score
    * `2.0 * dot - cn2` with ties toward the larger code; decimal-sum
    * means rounded to 6; ADC dot and reconstructed norm as list_sum over
    * ascending s (Spark's reduceLeft order); the zero-denominator guard;
    * round-then-rank with (cos DESC, id ASC) at both the probe shortlist
    * and the final exact re-rank. */
  /** Shared IVF CTE chain through the inverted file `assign` (id, vv,
    * nrm, cid): vectors+norms, deterministic centroid sample, all-pairs
    * cell scores, per-vector argmax. The x_sim_ivf probe statement and
    * the batch-assign oracle both build on it. */
  private val duckIvfAssignCtes: String =
    """v AS (
      |  SELECT vec_id AS id, embedding AS vv,
      |    sqrt(list_sum(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings
      |),
      |cent AS (
      |  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS INT) AS cid,
      |         vv AS cv, nrm AS cnrm
      |  FROM v ORDER BY md5(CAST(id AS VARCHAR)) LIMIT 16
      |),
      |pairs AS (
      |  SELECT v.id, v.vv, v.nrm, c.cid,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(v.vv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (v.nrm * c.cnrm) AS s
      |  FROM v CROSS JOIN cent c
      |),
      |assign AS (
      |  SELECT id, vv, nrm, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
      |    FROM pairs
      |  ) WHERE rn = 1
      |)""".stripMargin

  /** Shared PQ CTE chain through the corpus code table `ec` (id, cs —
    * the per-vector code list): training head + Lloyd rounds + encode.
    * [[duckPqSql]] appends the ADC probe; the batch-encode oracle selects
    * from `ec` directly. */
  private def duckPqCtes(m: Int, ks: Int, iters: Int, dims: Int = 64): String = {
    val d0 = dims / m
    val d1 = d0 + 1
    val head =
      s"""WITH v AS (
         |  SELECT vec_id AS id, embedding AS vv,
         |    sqrt(list_sum(list_transform(range(1, ${dims + 1}),
         |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings
         |),
         |sub AS (
         |  SELECT id, CAST(t.s AS INT) AS s,
         |    list_transform(range(CAST(t.s AS INT) * $d0 + 1, CAST(t.s AS INT) * $d0 + $d1),
         |      i -> CAST(vv[CAST(i AS INT)] AS DOUBLE)) AS sv
         |  FROM v, range(0, $m) t(s)
         |),
         |sd AS (
         |  SELECT id, vv,
         |    CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS INT) AS cid
         |  FROM v ORDER BY md5(CAST(id AS VARCHAR)) LIMIT $ks
         |),
         |c0 AS (
         |  SELECT CAST(t.s AS INT) AS s, cid,
         |    list_transform(range(CAST(t.s AS INT) * $d0 + 1, CAST(t.s AS INT) * $d0 + $d1),
         |      i -> CAST(vv[CAST(i AS INT)] AS DOUBLE)) AS cv
         |  FROM sd, range(0, $m) t(s)
         |)""".stripMargin
    val rounds = (0 to iters).map { r =>
      if (r < iters) duckPqAssignRound(r, d1) + ",\n" + duckPqMeanRound(r, d1)
      else duckPqAssignRound(r, d1)
    }
    val ec = s"ec AS (SELECT id, list(cid ORDER BY s) AS cs FROM a$iters GROUP BY id)"
    (head +: rounds :+ ec).mkString(",\n")
  }

  /** One Lloyd assignment round of the DuckDB PQ trainer (n/p/a CTEs over
    * `sub` and `c\$r`) — shared by the flat-PQ chain ([[duckPqCtes]]) and
    * the residual-PQ chain of the composed IVF-PQ oracle. */
  private def duckPqAssignRound(r: Int, d1: Int): String =
    s"""n$r AS (
       |  SELECT s, cid, cv,
       |    list_sum(list_transform(range(1, $d1), i -> cv[CAST(i AS INT)] * cv[CAST(i AS INT)])) AS cn2
       |  FROM c$r
       |),
       |p$r AS (
       |  SELECT x.id, x.s, x.sv, c.cid,
       |    2.0 * list_sum(list_transform(range(1, $d1),
       |      i -> x.sv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])) - c.cn2 AS sc
       |  FROM sub x JOIN n$r c USING (s)
       |),
       |a$r AS (
       |  SELECT id, s, sv, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id, s ORDER BY sc DESC, cid DESC) AS rn
       |    FROM p$r
       |  ) WHERE rn = 1
       |)""".stripMargin

  /** One Lloyd mean-update round of the DuckDB PQ trainer (decimal sums,
    * 6-decimal rounded means, empty clusters keep their centroid). */
  private def duckPqMeanRound(r: Int, d1: Int): String =
    s"""m${r + 1} AS (
       |  SELECT s, cid, CAST(i AS INT) AS i,
       |    round(CAST(sum(CAST(CAST(sv[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
       |          / count(sv[CAST(i AS INT)]), 6) AS mn
       |  FROM a$r, range(1, $d1) t(i) GROUP BY s, cid, i
       |),
       |g${r + 1} AS (SELECT s, cid, list(mn ORDER BY i) AS cv FROM m${r + 1} GROUP BY s, cid),
       |c${r + 1} AS (
       |  SELECT c.s, c.cid, coalesce(g.cv, c.cv) AS cv
       |  FROM c$r c LEFT JOIN g${r + 1} g ON g.s = c.s AND g.cid = c.cid
       |)""".stripMargin

  /** DuckDB twin of the byte-level BPE count: the per-byte hex symbol
    * string ('>xx|' per byte) pushed through the merges table as a
    * sequential replace chain — rank order, all non-overlapping
    * occurrences per rule, exactly the encoder loop's result for the
    * training-well-formed [[graft.operators.TextAnalysis
    * .DefaultBpeMerges]] (see its scaladoc for the argument). */
  private def duckBpeSymExpr(tokCol: String): String = {
    val base = s"regexp_replace(lower(hex(encode($tokCol))), '(..)', '>\\1|', 'g')"
    graft.operators.TextAnalysis.DefaultBpeMerges.foldLeft(base) { case (acc, (a, b)) =>
      s"replace($acc, '>$a|>$b|', '>$a$b|')"
    }
  }

  /** CTE chain from `documents` (restricted by `where`) to the per-doc
    * BPE token-ID stream `ord(doc_id, id, tok_pos)`: the replay chain of
    * [[duckBpeSymExpr]] split back into symbols, joined to the standard
    * BPE vocabulary — byte symbols are ids 0..255, the rule at rank r
    * defines id 256 + r (first rule wins on a duplicated concatenation,
    * mirroring the kernel's putIfAbsent). */
  private def duckBpeIdCtes(where: String): String = {
    val seen = scala.collection.mutable.HashSet[String]()
    val mergeRows = graft.operators.TextAnalysis.DefaultBpeMerges.zipWithIndex.flatMap {
      case ((a, b), i) => if (seen.add(a + b)) Some(s"('${a + b}', ${256 + i})") else None
    }.mkString(", ")
    s"""tok AS (
       |  SELECT doc_id, CASE WHEN i = 1 THEN tok0 ELSE ' ' || tok0 END AS tok, i
       |  FROM (
       |    SELECT doc_id,
       |      unnest(string_split(text, ' ')) AS tok0,
       |      unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
       |    FROM documents WHERE $where
       |  )
       |),
       |sym AS (
       |  SELECT doc_id, i, ${duckBpeSymExpr("tok")} AS s
       |  FROM tok WHERE tok <> ''
       |),
       |sp AS (
       |  SELECT doc_id, i,
       |    unnest(string_split(s, '|')) AS piece,
       |    unnest(range(1, len(string_split(s, '|')) + 1)) AS j
       |  FROM sym
       |),
       |ts AS (
       |  SELECT doc_id, i, j, substring(piece, 2) AS sym FROM sp WHERE piece <> ''
       |),
       |vocab AS (
       |  SELECT lpad(lower(hex(r)), 2, '0') AS sym, CAST(r AS INT) AS id
       |  FROM range(0, 256) t(r)
       |  UNION ALL
       |  SELECT * FROM (VALUES $mergeRows) v(sym, id)
       |),
       |ord AS (
       |  SELECT ts.doc_id, v.id,
       |    row_number() OVER (PARTITION BY ts.doc_id ORDER BY ts.i, ts.j) AS tok_pos
       |  FROM ts JOIN vocab v USING (sym)
       |)""".stripMargin
  }

  /** The composed IVF-PQ oracle (IVFADC): IVF assignment
    * ([[duckIvfAssignCtes]]) → residuals → the SAME Lloyd PQ trainer over
    * the residuals → per-query probe of the `nprobe` best cells scoring
    * coded postings by q·c + ADC(q·r) over true norms → exact re-rank of
    * the `probe` shortlist. Every arithmetic step mirrors the Spark
    * operator operand-for-operand. */
  private def duckIvfPqSql(
      m: Int, ks: Int, iters: Int, nprobe: Int, probe: Int, k: Int,
      dims: Int = 64): String = {
    val d0 = dims / m
    val d1 = d0 + 1
    val head =
      s"""WITH $duckIvfAssignCtes,
         |rv AS (
         |  SELECT a.id, list_transform(range(1, ${dims + 1}),
         |    i -> CAST(a.vv[CAST(i AS INT)] AS DOUBLE) - CAST(c.cv[CAST(i AS INT)] AS DOUBLE)) AS vv
         |  FROM assign a JOIN cent c USING (cid)
         |),
         |sub AS (
         |  SELECT id, CAST(t.s AS INT) AS s,
         |    list_transform(range(CAST(t.s AS INT) * $d0 + 1, CAST(t.s AS INT) * $d0 + $d1),
         |      i -> vv[CAST(i AS INT)]) AS sv
         |  FROM rv, range(0, $m) t(s)
         |),
         |sd AS (
         |  SELECT id, vv,
         |    CAST(row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR))) - 1 AS INT) AS cid
         |  FROM rv ORDER BY md5(CAST(id AS VARCHAR)) LIMIT $ks
         |),
         |c0 AS (
         |  SELECT CAST(t.s AS INT) AS s, cid,
         |    list_transform(range(CAST(t.s AS INT) * $d0 + 1, CAST(t.s AS INT) * $d0 + $d1),
         |      i -> vv[CAST(i AS INT)]) AS cv
         |  FROM sd, range(0, $m) t(s)
         |)""".stripMargin
    val rounds = (0 to iters).map { r =>
      if (r < iters) duckPqAssignRound(r, d1) + ",\n" + duckPqMeanRound(r, d1)
      else duckPqAssignRound(r, d1)
    }
    val tail =
      s"""ec AS (SELECT id, list(cid ORDER BY s) AS cs FROM a$iters GROUP BY id),
         |qcell AS (
         |  SELECT id AS qid, cid FROM (
         |    SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
         |    FROM pairs WHERE id < 5
         |  ) WHERE rn <= $nprobe
         |),
         |dcc AS (
         |  SELECT q.qid, q.cid,
         |    list_sum(list_transform(range(1, ${dims + 1}),
         |      i -> CAST(vq.vv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) AS dotc
         |  FROM qcell q JOIN v vq ON vq.id = q.qid JOIN cent c ON c.cid = q.cid
         |),
         |subq AS (
         |  SELECT id, CAST(t.s AS INT) AS s,
         |    list_transform(range(CAST(t.s AS INT) * $d0 + 1, CAST(t.s AS INT) * $d0 + $d1),
         |      i -> CAST(vv[CAST(i AS INT)] AS DOUBLE)) AS sv
         |  FROM v, range(0, $m) t(s) WHERE id < 5
         |),
         |tq AS (
         |  SELECT x.id AS qid, x.s, c.cid,
         |    list_sum(list_transform(range(1, $d1),
         |      i -> x.sv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])) AS d
         |  FROM subq x JOIN n$iters c USING (s)
         |),
         |tqa AS (SELECT qid, s, list(d ORDER BY cid) AS ds FROM tq GROUP BY qid, s),
         |tqq AS (SELECT qid, list(ds ORDER BY s) AS tabs FROM tqa GROUP BY qid),
         |adc AS (
         |  SELECT q.qid AS query_id, e.id AS corpus_id,
         |    round(CASE WHEN vq.nrm * ve.nrm = 0 THEN 0.0
         |      ELSE (d.dotc + list_sum(list_transform(range(0, $m),
         |             u -> t.tabs[CAST(u AS INT) + 1][ec.cs[CAST(u AS INT) + 1] + 1])))
         |           / (vq.nrm * ve.nrm) END, 6) AS cos
         |  FROM qcell q
         |  JOIN assign e ON e.cid = q.cid AND e.id <> q.qid
         |  JOIN dcc d ON d.qid = q.qid AND d.cid = q.cid
         |  JOIN tqq t ON t.qid = q.qid
         |  JOIN ec ON ec.id = e.id
         |  JOIN v vq ON vq.id = q.qid
         |  JOIN v ve ON ve.id = e.id
         |),
         |sl AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos DESC, corpus_id ASC) AS rn
         |    FROM adc
         |  ) WHERE rn <= $probe
         |),
         |scored AS (
         |  SELECT query_id, corpus_id,
         |    round(list_sum(list_transform(range(1, ${dims + 1}),
         |            i -> CAST(vq.vv[i] AS DOUBLE) * CAST(vc.vv[i] AS DOUBLE)))
         |          / (vq.nrm * vc.nrm), 6) AS cos
         |  FROM sl JOIN v vq ON vq.id = query_id JOIN v vc ON vc.id = corpus_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos DESC, corpus_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= $k""".stripMargin
    (head +: rounds :+ tail).mkString(",\n")
  }

  private def duckPqSql(m: Int, ks: Int, iters: Int, probe: Int, k: Int,
      dims: Int = 64): String = {
    val d0 = dims / m
    val d1 = d0 + 1
    val tail =
      s"""tq AS (
         |  SELECT x.id AS qid, x.s, c.cid,
         |    list_sum(list_transform(range(1, $d1),
         |      i -> x.sv[CAST(i AS INT)] * c.cv[CAST(i AS INT)])) AS d,
         |    c.cn2
         |  FROM sub x JOIN n$iters c USING (s) WHERE x.id < 5
         |),
         |tqa AS (
         |  SELECT qid, s, list(d ORDER BY cid) AS ds, list(cn2 ORDER BY cid) AS c2
         |  FROM tq GROUP BY qid, s
         |),
         |tqq AS (
         |  SELECT qid, list(ds ORDER BY s) AS tabs, list(c2 ORDER BY s) AS cn2s
         |  FROM tqa GROUP BY qid
         |),
         |adc AS (
         |  SELECT t.qid AS query_id, e.id AS corpus_id,
         |    round(CASE WHEN vq.nrm * sqrt(list_sum(list_transform(range(0, $m),
         |        u -> cn2s[CAST(u AS INT) + 1][e.cs[CAST(u AS INT) + 1] + 1]))) = 0 THEN 0.0
         |      ELSE list_sum(list_transform(range(0, $m),
         |             u -> tabs[CAST(u AS INT) + 1][e.cs[CAST(u AS INT) + 1] + 1]))
         |           / (vq.nrm * sqrt(list_sum(list_transform(range(0, $m),
         |               u -> cn2s[CAST(u AS INT) + 1][e.cs[CAST(u AS INT) + 1] + 1]))))
         |      END, 6) AS cos
         |  FROM ec e CROSS JOIN tqq t JOIN v vq ON vq.id = t.qid
         |  WHERE t.qid <> e.id
         |),
         |sl AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos DESC, corpus_id ASC) AS rn
         |    FROM adc
         |  ) WHERE rn <= $probe
         |),
         |scored AS (
         |  SELECT query_id, corpus_id,
         |    round(list_sum(list_transform(range(1, ${dims + 1}),
         |            i -> CAST(vq.vv[i] AS DOUBLE) * CAST(vc.vv[i] AS DOUBLE)))
         |          / (vq.nrm * vc.nrm), 6) AS cos
         |  FROM sl JOIN v vq ON vq.id = query_id JOIN v vc ON vc.id = corpus_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos DESC, corpus_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= $k""".stripMargin
    duckPqCtes(m, ks, iters, dims) + ",\n" + tail
  }

  /** One k-means assignment round: centroid norms `n{r}`, all-pairs
    * cosine `p{r}`, argmax `a{r}`. */
  private def assignCte(r: Int, d1: Int): String =
    s"""n$r AS (
       |  SELECT cid, cv,
       |    sqrt(list_sum(list_transform(range(1, $d1), i -> cv[i] * cv[i]))) AS cnrm
       |  FROM c$r
       |),
       |p$r AS (
       |  SELECT v.id, v.vv, v.nrm, c.cid,
       |    list_sum(list_transform(range(1, $d1),
       |      i -> CAST(v.vv[i] AS DOUBLE) * c.cv[i])) / (v.nrm * c.cnrm) AS s
       |  FROM v CROSS JOIN n$r c
       |),
       |a$r AS (
       |  SELECT id, vv, nrm, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
       |    FROM p$r
       |  ) WHERE rn = 1
       |)""".stripMargin

  /** Perceptual-hash CTE: aHash over the same md5 feature derivation the
    * media-features oracle uses; `list_reduce` mirrors the Spark fold's
    * left-to-right double addition order. Null payloads are excluded
    * entirely, mirroring the query's `fp IS NOT NULL` filter (without the
    * guard a null text folds to fp = 0 here and would pair). Ends in
    * `fp (doc_id, fp)`. */
  /** Perceptual-hash fingerprint CTE tail (no WITH prefix; CTE names
    * pf/pm/fp avoid the quality CTEs' `m`), ending in `fp (doc_id, fp)` —
    * shared by the standalone phash oracle and the curation-media oracle. */
  private lazy val phashFpTailCte: String =
    """pf AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    list_transform(range(0, 16), i ->
      |      CAST(list_sum(list_transform(range(1, 5), j ->
      |        (strpos('0123456789abcdef',
      |           substring(md5(text || '#' || CAST(i AS VARCHAR)), j, 1)) - 1)
      |        * CAST(pow(16, 4 - j) AS BIGINT))) AS DOUBLE) / 65535.0 * 2 - 1) AS f
      |  FROM documents
      |  WHERE text IS NOT NULL
      |),
      |pm AS (
      |  SELECT doc_id, f, list_reduce(f, (a, b) -> a + b) / 16 AS mean FROM pf
      |),
      |fp AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 16), i ->
      |    CASE WHEN f[CAST(i + 1 AS INT)] > mean
      |         THEN CAST(pow(2, 15 - i) AS BIGINT) ELSE CAST(0 AS BIGINT) END))
      |    AS BIGINT) AS fp
      |  FROM pm
      |)""".stripMargin

  private lazy val phashFpCte: String = s"WITH $phashFpTailCte"

  /** SimHash fingerprint CTE (16-bit, mirrors the kernel bit-for-bit) shared
    * by the grouping and Hamming-neighborhood oracles. `fp` is the
    * null-coalesced BIGINT fingerprint. */
  /** Shared whitespace-token CTE body (no WITH prefix) — the one `toks`
    * definition every document oracle builds on. */
  private val duckToksCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS w
      |  FROM documents
      |)""".stripMargin

  /** SimHash fingerprint CTE tail (expects `toks`), ending in
    * `fp (doc_id, fp)`. Fingerprint bit b lands on the long's bit
    * `bits-1-b`, so at bits = 64 fingerprint bit 0 is the SIGN bit —
    * `pow(2, 63)` does not fit a BIGINT, so that one position adds
    * Long.MinValue directly, exactly as the Spark fold does
    * (`Dedup.simhashFold`); every lower position is an exact power of
    * two in a double. */
  private def simhashFpTail(bits: Int): String = {
    val signSafePow =
      if (bits == 64)
        s"""CASE WHEN b = 0 THEN (-9223372036854775807 - 1)
           |                ELSE CAST(pow(2, ${bits - 1} - b) AS BIGINT) END""".stripMargin
      else s"CAST(pow(2, ${bits - 1} - b) AS BIGINT)"
    s"""fp0 AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(0, $bits), b ->
       |      CASE WHEN list_sum(list_transform(w, t ->
       |             (CAST(floor((strpos('0123456789abcdef',
       |                         substring(md5(t), CAST(floor(b / 4) AS INT) + 1, 1)) - 1)
       |                  / pow(2, 3 - (b % 4))) AS INT) % 2) * 2 - 1)) > 0
       |           THEN $signSafePow ELSE CAST(0 AS BIGINT) END)) AS simhash
       |  FROM toks
       |),
       |fp AS (
       |  SELECT doc_id, CAST(coalesce(simhash, 0) AS BIGINT) AS fp FROM fp0
       |)""".stripMargin
  }

  private val simhashFpTailCte: String = simhashFpTail(16)

  private val simhashFpCte: String =
    s"""WITH $duckToksCte,
       |$simhashFpTailCte""".stripMargin

  /** Distinct-3-gram shingle CTE body (expects `toks`). */
  private val duckShinglesTailCte: String =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
      |      i -> array_to_string(w[i+1:i+3], ' '))) AS shingles
      |  FROM toks
      |)""".stripMargin

  /** MinHash sig + LSH banded CTE chain ending in `banded (id, band,
    * key)` — shared by the all-pairs and incremental-probe oracles. */
  private lazy val minhashBandedCte: String =
    s"""$docShinglesCte,
       |sig AS (
       |  SELECT doc_id AS id,
       |    list_transform(range(0, 8),
       |      j -> list_min(list_transform(shingles,
       |             s -> md5(concat(CAST(j AS VARCHAR), '#', s))))) AS sig
       |  FROM sh
       |),
       |banded AS (
       |  SELECT id, g.band,
       |         md5(array_to_string(sig[g.band*2+1:g.band*2+2], '|')) AS key
       |  FROM sig, generate_series(0, 3) g(band)
       |)""".stripMargin

  /** Grouped HLL estimate over `events` — mirrors [[graft.operators
    * .Sketches.hllRegisters]]/[[graft.operators.Sketches.hllEstimate]]
    * digit for digit: same 60-bit md5 hash, bucket = h mod m (low bits),
    * rho by BINARY-STRING length of the value part (exact, no floating
    * log2), register max, fixed-point harmonic sum (integer terms
    * 2^(maxRho−M), absent buckets contributing the register-0 term), and
    * the identical Scala-computed double literal for α_m·m²·2^maxRho. */
  private def duckHllSql(valueCol: String, p: Int, where: String = "1=1"): String = {
    val m = 1 << p
    val w = 60 - p
    val maxRho = w + 1
    val num = Sketches.hllNumerator(p)
    s"""WITH h AS (
       |  SELECT event_type,
       |         ${duckHash60(s"CAST($valueCol AS VARCHAR) || '#hll'")} AS h
       |  FROM events WHERE $valueCol IS NOT NULL AND ($where)
       |),
       |r AS (
       |  SELECT event_type, CAST(h % $m AS INT) AS b,
       |         CAST(CASE WHEN h // $m = 0 THEN $maxRho
       |                   ELSE $w + 1 - length(bin(h // $m)) END AS INT) AS m_part
       |  FROM h
       |),
       |regs AS (SELECT event_type, b, max(m_part) AS m_reg FROM r GROUP BY event_type, b),
       |agg AS (
       |  SELECT event_type, count(*) AS np,
       |         sum(CAST(1 AS BIGINT) << CAST($maxRho - m_reg AS INT)) AS sp
       |  FROM regs GROUP BY event_type
       |),
       |est AS (
       |  SELECT event_type,
       |         CAST(sp + ($m - np) * (CAST(1 AS BIGINT) << $maxRho) AS DOUBLE) AS s,
       |         CAST($m - np AS INT) AS n_zero_regs
       |  FROM agg
       |)
       |SELECT event_type,
       |       round(CASE WHEN CAST($num AS DOUBLE) / s <= CAST(${2.5 * m} AS DOUBLE)
       |                   AND n_zero_regs > 0
       |                  THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / n_zero_regs)
       |                  ELSE CAST($num AS DOUBLE) / s END, 6) AS est_distinct,
       |       n_zero_regs
       |FROM est""".stripMargin
  }

  /** Document tokenization / shingling CTEs shared by the dedup oracles. */
  private val docShinglesCte: String =
    s"""WITH $duckToksCte,
       |$duckShinglesTailCte""".stripMargin

  /** Containment-pair derivation through its intersection counts (ends at
    * the `inter` CTE) — shared by the pair report and the election twin
    * so the two statements cannot drift. */
  private lazy val containmentInterCte: String =
    s"""$docShinglesCte,
       |ex AS (SELECT doc_id AS id, unnest(shingles) AS s FROM sh),
       |joinable AS (
       |  SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 1000
       |),
       |fil AS (SELECT ex.* FROM ex JOIN joinable USING (s)),
       |sizes AS (SELECT id, count(*) AS n_sh FROM ex GROUP BY id),
       |inter AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
       |  FROM fil a JOIN fil b ON a.s = b.s AND a.id < b.id
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** Gopher/C4 quality-metric CTE body (expects `toks`) + keep predicate —
    * shared between the standalone quality oracle and the composed
    * curation-pipeline oracle so the two cannot drift. */
  private val qualityMetricsCte: String =
    """m AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS INT) AS n_tokens,
      |    round(CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS DOUBLE)
      |          / greatest(len(w), 1), 6) AS mean_token_len,
      |    round(CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
      |          / greatest(len(w), 1), 6) AS alpha_ratio,
      |    CASE WHEN len(w) >= 2 THEN
      |      round(CAST(list_max(map_values(list_aggregate(
      |        list_transform(range(0, len(w) - 1), i -> array_to_string(w[i+1:i+2], ' ')),
      |        'histogram'))) AS DOUBLE) / (len(w) - 1), 6)
      |    ELSE 0.0 END AS top_bigram_ratio,
      |    CASE WHEN len(w) >= 3 THEN
      |      round(CAST(list_max(map_values(list_aggregate(
      |        list_transform(range(0, len(w) - 2), i -> array_to_string(w[i+1:i+3], ' ')),
      |        'histogram'))) AS DOUBLE) / (len(w) - 2), 6)
      |    ELSE 0.0 END AS top_trigram_ratio
      |  FROM toks
      |)""".stripMargin

  private val qualityKeepPredicate: String =
    """(n_tokens BETWEEN 20 AND 100000)
      |       AND (mean_token_len BETWEEN 2.0 AND 12.0)
      |       AND alpha_ratio >= 0.8
      |       AND top_bigram_ratio <= 0.30
      |       AND top_trigram_ratio <= 0.20""".stripMargin

  /** DuckDB mirror of [[Dedup.shingleHash]]: first 15 hex digits of md5 as
    * a 60-bit BIGINT. Powers of 16 are exactly representable as doubles up
    * to 16^14, and every partial product and the sum stay under 2^63, so
    * the arithmetic is exact integer on both engines. */
  private def duckHash60(expr: String): String =
    s"""CAST(list_sum(list_transform(range(1, 16), j ->
       |      (strpos('0123456789abcdef', substring(md5($expr), j, 1)) - 1)
       |      * CAST(pow(16, 15 - j) AS BIGINT))) AS BIGINT)""".stripMargin

  /** Winnowing selection CTE chain (k = 12, w = 8; mirrors
    * [[TextAnalysis.winnowFingerprints]] hash-for-hash) ending in
    * `fps (doc_id, pos, fp)` — shared by the fingerprint-table oracle and
    * the overlap-pairs oracle. */
  private lazy val winnowFpsCte: String =
    s"""WITH base AS (
       |  SELECT doc_id, text, CAST(length(text) - 11 AS INT) AS n FROM documents
       |),
       |g AS (
       |  SELECT doc_id, CAST(p AS INT) AS p,
       |         ${duckHash60("substring(text, CAST(p AS INT), 12)")} AS gh
       |  FROM (SELECT doc_id, text, unnest(range(1, n + 1)) AS p
       |        FROM base WHERE n >= 1)
       |),
       |win AS (
       |  SELECT doc_id, CAST(a AS INT) AS a
       |  FROM (SELECT doc_id, unnest(range(1, greatest(n - 7, 1) + 1)) AS a
       |        FROM base WHERE n >= 1)
       |),
       |sel AS (
       |  SELECT w.doc_id, w.a, g.p, g.gh,
       |         row_number() OVER (PARTITION BY w.doc_id, w.a
       |                            ORDER BY g.gh ASC, g.p DESC) AS rn
       |  FROM win w JOIN g ON g.doc_id = w.doc_id
       |                   AND g.p >= w.a AND g.p < w.a + 8
       |),
       |fps AS (
       |  SELECT DISTINCT doc_id, p AS pos, gh AS fp FROM sel WHERE rn = 1
       |)""".stripMargin

  /** DuckDB mirror of [[graft.operators.Sampling.hashUniform]]: first 8 hex
    * digits of md5(s"$$id#$$salt") as a 32-bit integer over 2^32. */
  private def duckHashUniform(idExpr: String, salt: String): String =
    s"""CAST(list_sum(list_transform(range(1, 9), j ->
       |      (strpos('0123456789abcdef',
       |         substring(md5(CAST($idExpr AS VARCHAR) || '#$salt'), j, 1)) - 1)
       |      * CAST(pow(16, 8 - j) AS BIGINT))) AS DOUBLE) / 4294967296.0""".stripMargin

  /** 4-run tiered delete-lifecycle closed form — shared by the fresh
    * (`x_scd2_tiered`) and steady-state (`x_scd2_tiered_run`) rows. */
  private val scd2TieredLifecycleSql: String =
    s"""WITH obase AS (
         |  SELECT o_orderkey, o_orderstatus AS orderstatus,
         |         CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice,
         |         CAST(o_orderdate AS DATE) AS orderdate
         |  FROM orders
         |),
         |snapb AS (
         |  SELECT o_orderkey, orderstatus,
         |         CASE WHEN o_orderkey % 53 = 0
         |              THEN CAST(totalprice + 100 AS DECIMAL(18,2))
         |              ELSE totalprice END AS totalprice,
         |         orderdate
         |  FROM obase
         |),
         |h1 AS (
         |  SELECT *, md5(concat_ws('#?',
         |    coalesce(CAST(o_orderkey AS VARCHAR),'nan'),
         |    coalesce(orderstatus,'nan'),
         |    coalesce(CAST(totalprice AS VARCHAR),'nan'),
         |    coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS rh FROM obase
         |),
         |h2 AS (
         |  SELECT *, md5(concat_ws('#?',
         |    coalesce(CAST(o_orderkey AS VARCHAR),'nan'),
         |    coalesce(orderstatus,'nan'),
         |    coalesce(CAST(totalprice AS VARCHAR),'nan'),
         |    coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS rh FROM snapb
         |)
         |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
         |       rh AS "RECORD_HASH",
         |       TIMESTAMP '$ts1' AS "INSERT_TS", '20240101100000' AS "INSERT_RUN_ID",
         |       TIMESTAMP '$ts2' AS "UPDATE_TS", '20240215103000' AS "UPDATE_RUN_ID",
         |       DATE '2024-01-01' AS "VALID_FROM", DATE '2024-02-14' AS "VALID_TO",
         |       CAST(NULL AS TIMESTAMP) AS "DELETED"
         |FROM h1 WHERE o_orderkey % 53 = 0
         |UNION ALL BY NAME
         |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
         |       rh AS "RECORD_HASH",
         |       CASE WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
         |            ELSE TIMESTAMP '$ts1' END AS "INSERT_TS",
         |       CASE WHEN o_orderkey % 53 = 0 THEN '20240215103000'
         |            ELSE '20240101100000' END AS "INSERT_RUN_ID",
         |       CASE WHEN o_orderkey % 7 = 0 THEN TIMESTAMP '$ts3'
         |            WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
         |            ELSE TIMESTAMP '$ts1' END AS "UPDATE_TS",
         |       CASE WHEN o_orderkey % 7 = 0 THEN '20240301093000'
         |            WHEN o_orderkey % 53 = 0 THEN '20240215103000'
         |            ELSE '20240101100000' END AS "UPDATE_RUN_ID",
         |       CASE WHEN o_orderkey % 53 = 0 THEN DATE '2024-02-15'
         |            ELSE DATE '2024-01-01' END AS "VALID_FROM",
         |       CASE WHEN o_orderkey % 7 = 0 THEN DATE '2024-02-29'
         |            ELSE DATE '9999-12-31' END AS "VALID_TO",
         |       CASE WHEN o_orderkey % 7 = 0 THEN TIMESTAMP '$ts3'
         |            ELSE CAST(NULL AS TIMESTAMP) END AS "DELETED"
         |FROM h2
         |UNION ALL BY NAME
         |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
         |       rh AS "RECORD_HASH",
         |       TIMESTAMP '$ts2' AS "INSERT_TS", '20240215103000' AS "INSERT_RUN_ID",
         |       TIMESTAMP '$ts2' AS "UPDATE_TS", '20240215103000' AS "UPDATE_RUN_ID",
         |       DATE '2024-04-01' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO",
         |       CAST(NULL AS TIMESTAMP) AS "DELETED"
         |FROM h2 WHERE o_orderkey % 7 = 0""".stripMargin

  /** Closed form of the 4-run COMPACTION fixture ([[stagedTier4Runs]]);
    * see the `x_scd2_tiered_compact` registration for the row classes. */
  private val scd2TieredCompactSql: String =
    s"""WITH obase AS (
       |  SELECT o_orderkey, o_orderstatus AS orderstatus,
       |         CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice,
       |         CAST(o_orderdate AS DATE) AS orderdate
       |  FROM orders
       |),
       |snapb AS (
       |  SELECT o_orderkey, orderstatus,
       |         CASE WHEN o_orderkey % 53 = 0
       |              THEN CAST(totalprice + 100 AS DECIMAL(18,2))
       |              ELSE totalprice END AS totalprice,
       |         orderdate
       |  FROM obase
       |),
       |snapc AS (
       |  SELECT o_orderkey, orderstatus,
       |         CASE WHEN o_orderkey % 31 = 0
       |              THEN CAST(totalprice + 50 AS DECIMAL(18,2))
       |              ELSE totalprice END AS totalprice,
       |         orderdate
       |  FROM snapb
       |),
       |h1 AS (SELECT *, md5(concat_ws('#?', coalesce(CAST(o_orderkey AS VARCHAR),'nan'), coalesce(orderstatus,'nan'), coalesce(CAST(totalprice AS VARCHAR),'nan'), coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS rh FROM obase),
       |h2 AS (SELECT *, md5(concat_ws('#?', coalesce(CAST(o_orderkey AS VARCHAR),'nan'), coalesce(orderstatus,'nan'), coalesce(CAST(totalprice AS VARCHAR),'nan'), coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS rh FROM snapb),
       |h4 AS (SELECT *, md5(concat_ws('#?', coalesce(CAST(o_orderkey AS VARCHAR),'nan'), coalesce(orderstatus,'nan'), coalesce(CAST(totalprice AS VARCHAR),'nan'), coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS rh FROM snapc)
       |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
       |       rh AS "RECORD_HASH",
       |       TIMESTAMP '$ts1' AS "INSERT_TS", '20240101100000' AS "INSERT_RUN_ID",
       |       TIMESTAMP '$ts2' AS "UPDATE_TS", '20240215103000' AS "UPDATE_RUN_ID",
       |       DATE '2024-01-01' AS "VALID_FROM", DATE '2024-02-14' AS "VALID_TO",
       |       CAST(NULL AS TIMESTAMP) AS "DELETED"
       |FROM h1 WHERE o_orderkey % 53 = 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
       |       rh AS "RECORD_HASH",
       |       CASE WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
       |            ELSE TIMESTAMP '$ts1' END AS "INSERT_TS",
       |       CASE WHEN o_orderkey % 53 = 0 THEN '20240215103000'
       |            ELSE '20240101100000' END AS "INSERT_RUN_ID",
       |       TIMESTAMP '$ts3' AS "UPDATE_TS", '20240301093000' AS "UPDATE_RUN_ID",
       |       CASE WHEN o_orderkey % 53 = 0 THEN DATE '2024-02-15'
       |            ELSE DATE '2024-01-01' END AS "VALID_FROM",
       |       DATE '2024-02-29' AS "VALID_TO",
       |       TIMESTAMP '$ts3' AS "DELETED"
       |FROM h2 WHERE o_orderkey % 7 = 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
       |       rh AS "RECORD_HASH",
       |       CASE WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
       |            ELSE TIMESTAMP '$ts1' END AS "INSERT_TS",
       |       CASE WHEN o_orderkey % 53 = 0 THEN '20240215103000'
       |            ELSE '20240101100000' END AS "INSERT_RUN_ID",
       |       TIMESTAMP '$ts4' AS "UPDATE_TS", '20240401080000' AS "UPDATE_RUN_ID",
       |       CASE WHEN o_orderkey % 53 = 0 THEN DATE '2024-02-15'
       |            ELSE DATE '2024-01-01' END AS "VALID_FROM",
       |       DATE '2024-03-31' AS "VALID_TO",
       |       CAST(NULL AS TIMESTAMP) AS "DELETED"
       |FROM h2 WHERE o_orderkey % 31 = 0 AND o_orderkey % 7 <> 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
       |       rh AS "RECORD_HASH",
       |       TIMESTAMP '$ts4' AS "INSERT_TS", '20240401080000' AS "INSERT_RUN_ID",
       |       TIMESTAMP '$ts4' AS "UPDATE_TS", '20240401080000' AS "UPDATE_RUN_ID",
       |       DATE '2024-04-01' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO",
       |       CAST(NULL AS TIMESTAMP) AS "DELETED"
       |FROM h4 WHERE o_orderkey % 7 = 0 OR o_orderkey % 31 = 0
       |UNION ALL BY NAME
       |SELECT o_orderkey, CAST(totalprice AS DOUBLE) AS totalprice,
       |       rh AS "RECORD_HASH",
       |       CASE WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
       |            ELSE TIMESTAMP '$ts1' END AS "INSERT_TS",
       |       CASE WHEN o_orderkey % 53 = 0 THEN '20240215103000'
       |            ELSE '20240101100000' END AS "INSERT_RUN_ID",
       |       CASE WHEN o_orderkey % 53 = 0 THEN TIMESTAMP '$ts2'
       |            ELSE TIMESTAMP '$ts1' END AS "UPDATE_TS",
       |       CASE WHEN o_orderkey % 53 = 0 THEN '20240215103000'
       |            ELSE '20240101100000' END AS "UPDATE_RUN_ID",
       |       CASE WHEN o_orderkey % 53 = 0 THEN DATE '2024-02-15'
       |            ELSE DATE '2024-01-01' END AS "VALID_FROM",
       |       DATE '9999-12-31' AS "VALID_TO",
       |       CAST(NULL AS TIMESTAMP) AS "DELETED"
       |FROM h2 WHERE o_orderkey % 7 <> 0 AND o_orderkey % 31 <> 0""".stripMargin

  /** Shared oracle fragment: the URL fixture (edge VALUES + the derived
    * per-document mess) canonicalized by the DuckDB replay of
    * [[graft.operators.Urls.canonicalizeUrl]]'s rule list. Yields table
    * `urlcanon(url_id, canonical_url, host)`. */
  private val urlCanonCte: String =
    s"""WITH raw AS (
       |  SELECT * FROM (VALUES $urlEdgeValuesSql) AS t(url_id, url)
       |  UNION ALL
       |  SELECT 2000000 + doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
       |         CASE WHEN doc_id % 3 = 0 THEN 'Site' ELSE 'site' END ||
       |         CAST((doc_id % 250) % 37 AS VARCHAR) || '.Example.com' ||
       |         CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
       |         '/Docs/' || CAST(doc_id % 250 AS VARCHAR) ||
       |         CASE WHEN doc_id % 2 = 0
       |              THEN '?a=' || CAST((doc_id % 250) % 5 AS VARCHAR) ||
       |                   '&b=' || CAST((doc_id % 250) % 7 AS VARCHAR)
       |              ELSE '?b=' || CAST((doc_id % 250) % 7 AS VARCHAR) ||
       |                   '&a=' || CAST((doc_id % 250) % 5 AS VARCHAR) END ||
       |         CASE WHEN doc_id % 3 = 1
       |              THEN '&utm_source=feed&fbclid=' || CAST(doc_id AS VARCHAR)
       |              ELSE '' END ||
       |         CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR)
       |              ELSE '' END
       |  FROM documents
       |),
       |u1 AS (SELECT url_id, trim(url) AS t FROM raw),
       |u2 AS (SELECT *, regexp_replace(t, '#.*', '') AS nofrag FROM u1),
       |u3 AS (SELECT *,
       |         lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |         regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM u2),
       |u4 AS (SELECT *, regexp_extract(rest, '^([^/?]*)', 1) AS authority,
       |         regexp_replace(rest, '^[^/?]*', '') AS pathq FROM u3),
       |u5 AS (SELECT *, regexp_extract(authority, '^(.*@)?', 1) AS userinfo,
       |         lower(regexp_replace(authority, '^.*@', '')) AS hostport FROM u4),
       |u6 AS (SELECT *,
       |         CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |              ELSE hostport END AS hostport2,
       |         regexp_extract(pathq, '^([^?]*)', 1) AS path0,
       |         CASE WHEN contains(pathq, '?')
       |              THEN regexp_replace(pathq, '^[^?]*\\?', '') ELSE '' END AS query
       |       FROM u5),
       |u7 AS (SELECT *, CASE WHEN path0 = '' THEN '/' ELSE path0 END AS norm_path,
       |         list_sort(list_filter(str_split(query, '&'),
       |           p -> p <> '' AND NOT regexp_matches(p,
       |             '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|mc_eid)(=|$$)'))) AS kept
       |       FROM u6),
       |urlcanon AS (
       |  SELECT url_id,
       |         CASE WHEN scheme = '' THEN t
       |              ELSE scheme || '://' || userinfo || hostport2 || norm_path ||
       |                   CASE WHEN len(kept) > 0
       |                        THEN '?' || array_to_string(kept, '&') ELSE '' END
       |         END AS canonical_url,
       |         CASE WHEN scheme = '' THEN ''
       |              ELSE lower(regexp_replace(
       |                     regexp_replace(authority, '^.*@', ''), ':[0-9]*$$', ''))
       |         END AS host
       |  FROM u7
       |)""".stripMargin

  def oracleSql: Map[String, String] = baseOracles ++ Map(
    // deliberately the SAME statements as x_sim_pq / x_sim_ivf: probing a
    // stored codebook + code table (resp. centroid frame + inverted file)
    // is an implementation strategy — persist-then-probe — not a semantic
    // change, exactly the l09_delta_bucketed precedent
    "x_sim_pq_index" -> baseOracles("x_sim_pq"),
    "x_sim_ivf_index" -> baseOracles("x_sim_ivf"),
    // batch-cost legs: the fresh-path encode/assign statements restricted
    // to the batch — encoding through the stored model is definitionally
    // the same argmax (the x_emb_kmeans_incremental precedent)
    "x_sim_pq_incremental" ->
      s"""${duckPqCtes(16, 16, 2)}
         |SELECT id AS vec_id, array_to_string(cs, ',') AS codes_csv
         |FROM ec WHERE id % 5 = 4""".stripMargin,
    "x_sim_ivf_incremental" ->
      s"""WITH $duckIvfAssignCtes
         |SELECT id AS vec_id, cid FROM assign WHERE id % 5 = 4""".stripMargin,
    // Lloyd-refined IVF: the kmeans trainer's final round already emits
    // the refined centroids (n2), the all-pairs cell scores (p2), and
    // the inverted file (a2) — the probe statement is x_sim_ivf's over
    // those CTEs
    "x_sim_ivf_kmeans" ->
      s"""WITH ${duckKmeansCtes(16, 2)},
         |probe AS (
         |  SELECT id AS query_id, vv AS qv, nrm AS qn, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
         |    FROM p2 WHERE id < 5
         |  ) WHERE rn <= 8
         |),
         |scored AS (
         |  SELECT p.query_id, a.id AS corpus_id,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(p.qv[i] AS DOUBLE) * CAST(a.vv[i] AS DOUBLE))) / (p.qn * a.nrm), 6) AS cos
         |  FROM probe p JOIN a2 a ON a.cid = p.cid AND a.id <> p.query_id
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos DESC, corpus_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin,
    // the composed-index oracle reproduces the whole IVFADC pipeline:
    // IVF assignment, residuals, the Lloyd trainer over residuals, the
    // q·c + ADC(q·r) probe, exact re-rank
    "x_sim_ivfpq_index" ->
      duckIvfPqSql(m = 16, ks = 32, iters = 2, nprobe = 10, probe = 80, k = 10),
    // incremental ≡ the full-corpus spans statement restricted to the
    // batch's documents: a gram is in ≥2 distinct docs overall iff it
    // hits the standing store or a second batch doc
    "x_dedup_spans_incremental" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 30
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS p FROM docs)
        |),
        |dup AS (
        |  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |),
        |dp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (gram)
        |  WHERE pos.doc_id % 2 = 1
        |),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) AS grp
        |  FROM dp
        |)
        |SELECT doc_id, min(p) AS span_start, max(p) + 29 AS span_end
        |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // the exact spans row shares x_dedup_spans' statement: that oracle
    // already decides duplication by the gram STRING, which is exactly
    // the exact operator's semantics (the hashed operator merely has no
    // collisions to expose at this scale)
    "x_dedup_spans_exact" -> baseOracles("x_dedup_spans"),
    // deliberately the SAME statement as x_store_asof_run: generation 1
    // IS the store run 1 left behind, preserved physically — generation
    // travel and run travel answer the same question through different
    // axes (physical rewrites vs logical loads)
    "x_store_generation_travel" -> baseOracles("x_store_asof_run"),
    // the pass-1 manifest pins the pass-1 hash-store generation, whose
    // content IS the run-1 historization — same statement again through
    // the cross-store snapshot axis
    "x_store_manifest_snapshot" -> baseOracles("x_store_asof_run"),
    // the purged twin of generation 1 = run-1 content minus the removed
    // keys, recomputed independently from the snapshots — no retained
    // generation may contain a removed key (spec-pinned in StoreSpec;
    // here the oracle pins the surviving content exactly)
    "x_store_generation_purged" -> duckRun1PurgedSql,
    // the remapped pass-1 manifest resolves the purged twin of the
    // pass-1 hash-store generation: run-1 content minus the erased keys
    // — the same statement through the snapshot axis
    "x_store_manifest_purged" -> duckRun1PurgedSql,
    // merged per-batch CMS cells ≡ fresh corpus sketch (linearity), so
    // the probe answers the same estimates — same statement
    "x_sketch_cms_merged" -> baseOracles("x_sketch_cms"),
    // HLL registers and the fixed-point harmonic sum re-derived in SQL —
    // identical integer arithmetic, identical double literals
    "x_sketch_hll" -> duckHllSql("event_id", 8),
    // merged register synopses ≡ fresh whole-corpus registers (max is
    // idempotent), so the merged estimate answers the fresh statement
    // over the same (value, p) parameters
    "x_sketch_hll_merged" -> duckHllSql("user_id", 4),
    // maintained HLL after the touched-group repair ≡ the fresh statement
    // over survivors (the merge law + recompute-repair law in one row)
    "x_agg_maintain_hll" -> duckHllSql("user_id", 4,
      where = "NOT (event_type = 'purchase' AND user_id % 2 = 0)"),
    // rolling 7-day distinct: per-(type, day) registers window-merged by
    // register max — the identical fixed-point estimate arithmetic as
    // duckHllSql, grouped by (type, window day); p=4: m=16, maxRho=57
    "x_agg_rolling_hll" -> {
      val m = 16; val w = 56; val maxRho = 57
      val num = graft.operators.Sketches.hllNumerator(4)
      s"""WITH h AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |         ${duckHash60("CAST(user_id AS VARCHAR) || '#hll'")} AS h
         |  FROM events WHERE user_id IS NOT NULL
         |),
         |r AS (
         |  SELECT event_type, day, CAST(h % $m AS INT) AS b,
         |         CAST(CASE WHEN h // $m = 0 THEN $maxRho
         |                   ELSE $w + 1 - length(bin(h // $m)) END AS INT) AS m_part
         |  FROM h
         |),
         |regs AS (
         |  SELECT event_type, day, b, max(m_part) AS m_reg
         |  FROM r GROUP BY 1, 2, 3
         |),
         |days AS (SELECT DISTINCT event_type, day FROM regs),
         |wnd AS (
         |  SELECT d.event_type, d.day, r.b, max(r.m_reg) AS m_reg
         |  FROM days d JOIN regs r ON r.event_type = d.event_type
         |    AND r.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY 1, 2, 3
         |),
         |nwin AS (
         |  SELECT d.event_type, d.day, CAST(count(*) AS INT) AS n_days
         |  FROM days d JOIN days e ON e.event_type = d.event_type
         |    AND e.day BETWEEN d.day - 6 AND d.day
         |  GROUP BY 1, 2
         |),
         |agg AS (
         |  SELECT event_type, day, count(*) AS np,
         |         sum(CAST(1 AS BIGINT) << CAST($maxRho - m_reg AS INT)) AS sp
         |  FROM wnd GROUP BY 1, 2
         |),
         |est AS (
         |  SELECT event_type, day,
         |         CAST(sp + ($m - np) * (CAST(1 AS BIGINT) << $maxRho) AS DOUBLE) AS s,
         |         CAST($m - np AS INT) AS n_zero_regs
         |  FROM agg
         |)
         |SELECT e.event_type, e.day,
         |       round(CASE WHEN CAST($num AS DOUBLE) / s <= CAST(${2.5 * m} AS DOUBLE)
         |                   AND n_zero_regs > 0
         |                  THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / n_zero_regs)
         |                  ELSE CAST($num AS DOUBLE) / s END, 6) AS est_distinct,
         |       n_zero_regs, n.n_days
         |FROM est e JOIN nwin n ON n.event_type = e.event_type AND n.day = e.day""".stripMargin
    },
    // the three insert-delta triples union to exactly the from-scratch
    // inner join — the oracle is the join's definition
    "x_join_maintain" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    // maintained leaderboard ≡ the fresh top-k definition (semilattice
    // trim law); both engines tie-break by the id STRING (binary order)
    "x_agg_maintain_topk" ->
      """WITH r AS (
        |  SELECT o_orderpriority, CAST(o_orderkey AS VARCHAR) AS id,
        |         CAST(o_totalprice AS DOUBLE) AS value,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY CAST(o_totalprice AS DOUBLE) DESC,
        |                    CAST(o_orderkey AS VARCHAR)) AS rk
        |  FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
        |)
        |SELECT o_orderpriority, CAST(rk AS INT) AS rank, id, value
        |FROM r WHERE rk <= 10""".stripMargin,
    // composed IVM: the merged per-batch-delta aggregate state answers
    // the aggregate over the join's definition
    "x_join_agg_maintain" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_v,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6)
        |    AS avg_v,
        |  min(CAST(l_quantity AS DOUBLE)) AS min_v,
        |  max(CAST(l_quantity AS DOUBLE)) AS max_v
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    // refreshed view ≡ the join over the updated dimension's definition
    "x_join_refresh_dim" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CASE WHEN o_orderkey % 10 = 0 THEN 'R-' || o_orderpriority
        |            ELSE o_orderpriority END AS o_orderpriority,
        |       o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    // star maintenance ≡ the 3-way join's definition
    "x_join_maintain_star" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |       o_orderpriority, p_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey""".stripMargin,
    // provenance retraction ≡ recompute over surviving left rows
    "x_join_maintain_retract" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_linenumber <> 3""".stripMargin,
    // merged per-batch KMV synopses ≡ fresh global synopsis (lossless
    // merge), so the estimate is the ungrouped x_sketch_distinct
    "x_sketch_kmv_merged" ->
      s"""WITH u AS (
         |  SELECT DISTINCT ${duckHashUniform("user_id", "kmv")} AS u FROM events
         |),
         |r AS (
         |  SELECT u, row_number() OVER (ORDER BY u) AS rn, count(*) OVER () AS nd
         |  FROM u
         |)
         |SELECT round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |             ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END, 6)
         |         AS est_distinct,
         |       CAST(least(max(nd), 64) AS INT) AS n_kept
         |FROM r""".stripMargin,
    // symmetric diff: both sides reduce to (key, digest) then one full
    // outer join; the digest recipe is the library record hash
    "x_store_diff" -> storeDiffOracle(
      """SELECT l_orderkey, l_linenumber, diff_status, record_hash_a, record_hash_b
        |FROM diff WHERE diff_status <> 'unchanged'""".stripMargin),
    // CAST each sum to BIGINT: Spark's sum(when) is LongType but DuckDB's
    // bare sum(CASE) over INTEGER yields HUGEINT — value-identical yet
    // typed-hash-distinct on the driver (the r12 red row).
    "x_store_diff_summary" -> storeDiffOracle(
      """SELECT CAST(sum(CASE WHEN diff_status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(sum(CASE WHEN diff_status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |       CAST(sum(CASE WHEN diff_status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(sum(CASE WHEN diff_status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM diff""".stripMargin),
    // skipping reads are row-identical to the full filtered scan —
    // the pruning is a fast-path, never a semantic
    "x_store_skipping" ->
      "SELECT * FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 1999",
    "x_store_point_lookup" ->
      "SELECT * FROM lineitem WHERE l_orderkey IN (123, 7777, 14000)",
    "x_store_time_slice" ->
      """SELECT * FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-03-01 00:00:00'
        |                     AND TIMESTAMP '1997-03-31 23:59:59'""".stripMargin,
    "x_store_zorder_box" ->
      """SELECT * FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 39""".stripMargin,
    // the manifest's totals must reproduce the table's (faithfulness)
    "x_stage_build_sorted" ->
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_k,
        |       max(l_orderkey) AS max_k, CAST(0 AS BIGINT) AS n_nulls
        |FROM lineitem""".stripMargin)

  /** Shared CTE chain for the store-diff rows: snapshot A vs the shrunk
    * mutated run-2 feed, both reduced to (key, record digest), full-outer
    * joined and classified — `finalSelect` reads from `diff`. */
  private def storeDiffOracle(finalSelect: String): String = {
    val digest = (q: String) =>
      s"""md5(concat_ws('#?', coalesce(CAST(quantity AS VARCHAR),'nan'),
         |                     coalesce(returnflag,'nan'), coalesce(linestatus,'nan'),
         |                     coalesce(CAST(shipdate AS VARCHAR),'nan'))) AS $q""".stripMargin
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
       |         l_returnflag AS returnflag, l_linestatus AS linestatus,
       |         CAST(l_shipdate AS DATE) AS shipdate
       |  FROM lineitem
       |),
       |a AS (SELECT * FROM base WHERE shipdate < DATE '1995-06-01'),
       |b AS (
       |  SELECT l_orderkey, l_linenumber,
       |         CASE WHEN l_orderkey % 97 = 0 THEN CAST(quantity + 10 AS DECIMAL(18,2))
       |              ELSE quantity END AS quantity,
       |         returnflag, linestatus, shipdate
       |  FROM base WHERE l_orderkey % 3 <> 0
       |),
       |ha AS (
       |  SELECT l_orderkey, l_linenumber, max(h) AS record_hash_a
       |  FROM (SELECT l_orderkey, l_linenumber, ${digest("h")} FROM a)
       |  GROUP BY 1, 2
       |),
       |hb AS (
       |  SELECT l_orderkey, l_linenumber, max(h) AS record_hash_b
       |  FROM (SELECT l_orderkey, l_linenumber, ${digest("h")} FROM b)
       |  GROUP BY 1, 2
       |),
       |diff AS (
       |  SELECT coalesce(ha.l_orderkey, hb.l_orderkey) AS l_orderkey,
       |         coalesce(ha.l_linenumber, hb.l_linenumber) AS l_linenumber,
       |         record_hash_a, record_hash_b,
       |         CASE WHEN record_hash_a IS NULL THEN 'added'
       |              WHEN record_hash_b IS NULL THEN 'removed'
       |              WHEN record_hash_a <> record_hash_b THEN 'changed'
       |              ELSE 'unchanged' END AS diff_status
       |  FROM ha FULL OUTER JOIN hb
       |    ON ha.l_orderkey = hb.l_orderkey AND ha.l_linenumber = hb.l_linenumber
       |)
       |$finalSelect""".stripMargin
  }

  /** Run-1 store content minus the erased keys — shared by the
    * generation-purge and manifest-purge rows (both read "pass 1, after
    * erasure" through different resolution axes). */
  private lazy val duckRun1PurgedSql: String =
    s"""$snapshotsCte,
       |delta AS (
       |  SELECT n.* FROM enrichB n LEFT JOIN enrichA c
       |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
       |  WHERE c."KEY_HASH" IS NULL
       |)
       |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity)
       |FROM (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta)
       |WHERE "INSERT_RUN_ID" <= '20240101100000' AND l_orderkey % 7 <> 0""".stripMargin

  /** Batch-aware spans twin shared by the staged-build and purge rows:
    * the spansStream contract is prefix-asymmetric — a position of a doc
    * in batch b (= doc_id % 3) is duplicated iff ANOTHER doc of an
    * earlier-or-same batch shares its 30-gram — which the join condition
    * `o.b <= a.b` replays; `where` restricts the corpus (the purge row
    * passes the survivor filter). */
  private def duckSpansBatchedSql(where: String): String =
    s"""WITH docs AS (
       |  SELECT doc_id, text, CAST(doc_id % 3 AS INT) AS b
       |  FROM documents WHERE $where AND length(text) >= 30
       |),
       |pos AS (
       |  SELECT doc_id, b, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
       |  FROM (SELECT doc_id, text, b, unnest(range(1, length(text) - 28)) AS p FROM docs)
       |),
       |dp AS (
       |  SELECT DISTINCT a.doc_id, a.b, a.p
       |  FROM pos a JOIN pos o ON o.gram = a.gram AND o.doc_id <> a.doc_id AND o.b <= a.b
       |),
       |isl AS (
       |  SELECT doc_id, b, p,
       |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) AS grp
       |  FROM dp
       |)
       |SELECT doc_id, min(p) AS span_start, max(p) + 29 AS span_end, b AS ingest_batch
       |FROM isl GROUP BY doc_id, grp, b""".stripMargin

  private lazy val baseOracles: Map[String, String] = Map(
    "l01_csv_scan" ->
      s"""SELECT Lastname, Firstname, SSN,
        |       CAST(Test1 AS DOUBLE) AS Test1, CAST(Test2 AS DOUBLE) AS Test2,
        |       CAST(Test3 AS DOUBLE) AS Test3, CAST(Test4 AS DOUBLE) AS Test4,
        |       CAST(Final AS DOUBLE) AS Final, Grade
        |FROM read_csv('$gradesCsvPath', header = true)""".stripMargin,
    "l16_historize_runs" ->
      s"""$snapshotsCte,
         |delta AS (
         |  SELECT n.* FROM enrichB n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |)
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity)
         |FROM (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta)""".stripMargin,
    // the l16 statement filtered to run 1's INSERT_RUN_ID: run-based
    // time travel over the append-only store = the run-1 snapshot content
    "x_store_asof_run" ->
      s"""$snapshotsCte,
         |delta AS (
         |  SELECT n.* FROM enrichB n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |)
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity)
         |FROM (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta)
         |WHERE "INSERT_RUN_ID" <= '20240101100000'""".stripMargin,
    // the l16 chain over the SHRUNK run-2 snapshot, then the stamp: keys
    // in the store absent from the shrunk snapshot get DELETED = run-2 ts
    // (all rows kept; first observation wins)
    "x_store_deleted_stamp" ->
      s"""$snapshotsCte,
         |shrunk AS (SELECT * FROM enrichB WHERE l_orderkey % 3 <> 0),
         |delta AS (
         |  SELECT n.* FROM shrunk n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |),
         |store AS (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta),
         |gone AS (
         |  SELECT DISTINCT s."KEY_HASH" FROM store s
         |  WHERE NOT EXISTS (SELECT 1 FROM shrunk n WHERE n."KEY_HASH" = s."KEY_HASH")
         |)
         |SELECT s.l_orderkey, s.l_linenumber, CAST(s.quantity AS DOUBLE) AS quantity,
         |  s."KEY_HASH", s."RECORD_HASH", s."INSERT_RUN_ID",
         |  CASE WHEN g."KEY_HASH" IS NOT NULL AND s."DELETED" IS NULL
         |       THEN TIMESTAMP '$ts2' ELSE s."DELETED" END AS "DELETED"
         |FROM store s LEFT JOIN gone g ON g."KEY_HASH" = s."KEY_HASH"""".stripMargin,
    // the stamped store traveled to run 2: inserted at or before run 2
    // AND not deleted at or before it — the vanished keys' rows drop out
    "x_store_asof_run_deleted" ->
      s"""$snapshotsCte,
         |shrunk AS (SELECT * FROM enrichB WHERE l_orderkey % 3 <> 0),
         |delta AS (
         |  SELECT n.* FROM shrunk n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |),
         |store AS (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta),
         |gone AS (
         |  SELECT DISTINCT s."KEY_HASH" FROM store s
         |  WHERE NOT EXISTS (SELECT 1 FROM shrunk n WHERE n."KEY_HASH" = s."KEY_HASH")
         |),
         |stamped AS (
         |  SELECT s.*, CASE WHEN g."KEY_HASH" IS NOT NULL AND s."DELETED" IS NULL
         |                   THEN TIMESTAMP '$ts2' ELSE s."DELETED" END AS "DELETED2"
         |  FROM store s LEFT JOIN gone g ON g."KEY_HASH" = s."KEY_HASH"
         |)
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "KEY_HASH", "INSERT_RUN_ID"
         |FROM stamped
         |WHERE "INSERT_RUN_ID" <= '20240215103000'
         |  AND ("DELETED2" IS NULL OR "DELETED2" > TIMESTAMP '$ts2')""".stripMargin,
    // evolve-then-historize: both snapshots coerced to the target schema
    // (base + source_sys) BEFORE enrichment, so source_sys participates
    // in RECORD_HASH — run-2 rows where it left the default re-version,
    // rows still at the default (and otherwise unchanged) do not
    "x_historize_evolving" ->
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
         |         l_returnflag AS returnflag, l_linestatus AS linestatus,
         |         CAST(l_shipdate AS DATE) AS shipdate
         |  FROM lineitem
         |),
         |evA AS (
         |  SELECT *, CAST(NULL AS VARCHAR) AS source_sys
         |  FROM base WHERE shipdate < DATE '1995-06-01'
         |),
         |evB AS (
         |  SELECT l_orderkey, l_linenumber,
         |         CASE WHEN l_orderkey % 97 = 0
         |              THEN CAST(quantity + 10 AS DECIMAL(18,2)) ELSE quantity END AS quantity,
         |         returnflag, linestatus, shipdate,
         |         CASE WHEN l_orderkey % 5 = 0 THEN 'sys2' END AS source_sys
         |  FROM base
         |),
         |enrichA AS (
         |  SELECT *,
         |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
         |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'))) AS "KEY_HASH",
         |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
         |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'),
         |                        coalesce(CAST(quantity AS VARCHAR),'nan'),
         |                        coalesce(returnflag,'nan'), coalesce(linestatus,'nan'),
         |                        coalesce(CAST(shipdate AS VARCHAR),'nan'),
         |                        coalesce(source_sys,'nan'))) AS "RECORD_HASH",
         |    TIMESTAMP '$ts1' AS "INSERT_TS", TIMESTAMP '$ts1' AS "UPDATE_TS",
         |    '20240101100000' AS "INSERT_RUN_ID", '20240101100000' AS "UPDATE_RUN_ID",
         |    CAST(NULL AS TIMESTAMP) AS "DELETED"
         |  FROM evA
         |),
         |enrichB AS (
         |  SELECT *,
         |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
         |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'))) AS "KEY_HASH",
         |    md5(concat_ws('#?', coalesce(CAST(l_orderkey AS VARCHAR),'nan'),
         |                        coalesce(CAST(l_linenumber AS VARCHAR),'nan'),
         |                        coalesce(CAST(quantity AS VARCHAR),'nan'),
         |                        coalesce(returnflag,'nan'), coalesce(linestatus,'nan'),
         |                        coalesce(CAST(shipdate AS VARCHAR),'nan'),
         |                        coalesce(source_sys,'nan'))) AS "RECORD_HASH",
         |    TIMESTAMP '$ts2' AS "INSERT_TS", TIMESTAMP '$ts2' AS "UPDATE_TS",
         |    '20240215103000' AS "INSERT_RUN_ID", '20240215103000' AS "UPDATE_RUN_ID",
         |    CAST(NULL AS TIMESTAMP) AS "DELETED"
         |  FROM evB
         |),
         |delta AS (
         |  SELECT n.* FROM enrichB n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |)
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity)
         |FROM (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta)""".stripMargin,
    "d05_valid_from_lower" ->
      s"""$snapshotsCte
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity),
         |       DATE '1900-01-01' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO"
         |FROM enrichA""".stripMargin,
    "d05_valid_from_custom" ->
      s"""$snapshotsCte
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity),
         |       DATE '2020-06-15' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO"
         |FROM enrichA""".stripMargin,
    "l05_meta_enrich" ->
      s"""$snapshotsCte
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity) FROM enrichA""".stripMargin,
    "l11_hash_projection" ->
      s"""$snapshotsCte SELECT "KEY_HASH", "RECORD_HASH" FROM enrichA""",
    "l09_delta" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, CAST(n.quantity AS DOUBLE) AS quantity,
         |       n."KEY_HASH", n."RECORD_HASH"
         |FROM enrichB n LEFT JOIN enrichA c
         |  ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |WHERE c."KEY_HASH" IS NULL""".stripMargin,
    // deliberately the SAME statement as l09_delta: the bucketed re-keyed
    // join is an implementation strategy, not a semantic change
    "l09_delta_bucketed" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, CAST(n.quantity AS DOUBLE) AS quantity,
         |       n."KEY_HASH", n."RECORD_HASH"
         |FROM enrichB n LEFT JOIN enrichA c
         |  ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |WHERE c."KEY_HASH" IS NULL""".stripMargin,
    // the incremental-feed regime: the delta statement restricted to the
    // 1% batch — identical SQL for the plain twin and the Bloom route
    // (the route is an implementation strategy: false positives fall
    // through to the exact residual, so the output is the anti-join's)
    "l09_delta_batch" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, CAST(n.quantity AS DOUBLE) AS quantity,
         |       n."KEY_HASH", n."RECORD_HASH"
         |FROM enrichB n LEFT JOIN enrichA c
         |  ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |WHERE c."KEY_HASH" IS NULL AND n.l_orderkey % 100 = 0""".stripMargin,
    "l09_delta_bloom" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, CAST(n.quantity AS DOUBLE) AS quantity,
         |       n."KEY_HASH", n."RECORD_HASH"
         |FROM enrichB n LEFT JOIN enrichA c
         |  ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |WHERE c."KEY_HASH" IS NULL AND n.l_orderkey % 100 = 0""".stripMargin,
    // build-accounting rows return the built artifact's content, so the
    // oracle is the artifact's defining statement. The bloom synopsis
    // twin walks the identical md5 bit derivation: 15-hex-char prefix →
    // 60-bit value (exact in BIGINT: per-digit products are ≤ 15·16^14),
    // position mod 2^22, word = pos/64, mask = OR of 2^(pos%64) — the OR
    // as SUM(DISTINCT) over HUGEINT, folded back to the signed 64-bit
    // word Spark's shiftleft produces
    "x_stage_build_bloom" ->
      s"""$snapshotsCte,
         |hx AS (
         |  SELECT md5("KEY_HASH" || "RECORD_HASH" || '#bloom#' || CAST(j AS VARCHAR)) AS h
         |  FROM enrichA, (SELECT unnest([0, 1, 2, 3]) AS j)
         |),
         |pos AS (
         |  SELECT list_sum(list_transform(range(1, 16),
         |    i -> CAST(strpos('0123456789abcdef', substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT)
         |         * CAST(pow(16, 15 - i) AS BIGINT))) % 4194304 AS p
         |  FROM hx
         |),
         |words AS (
         |  SELECT CAST(p // 64 AS INT) AS w,
         |         SUM(DISTINCT CAST(pow(2, p % 64) AS HUGEINT)) AS s
         |  FROM pos GROUP BY 1
         |)
         |SELECT w, CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616
         |                    ELSE s END AS BIGINT) AS m
         |FROM words
         |UNION ALL SELECT -1 AS w, CAST($BloomBits AS BIGINT) AS m""".stripMargin,
    "l13_inserts" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, n."KEY_HASH"
         |FROM enrichB n WHERE NOT EXISTS
         |  (SELECT 1 FROM enrichA c WHERE c."KEY_HASH" = n."KEY_HASH")""".stripMargin,
    "l14_updates" ->
      s"""$snapshotsCte
         |SELECT n.l_orderkey, n.l_linenumber, CAST(n.quantity AS DOUBLE) AS quantity,
         |       n."RECORD_HASH"
         |FROM enrichB n JOIN enrichA c
         |  ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" <> c."RECORD_HASH"""".stripMargin,
    "l10_union_append" ->
      s"""$snapshotsCte,
         |delta AS (
         |  SELECT n.* FROM enrichB n LEFT JOIN enrichA c
         |    ON n."KEY_HASH" = c."KEY_HASH" AND n."RECORD_HASH" = c."RECORD_HASH"
         |  WHERE c."KEY_HASH" IS NULL
         |)
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       returnflag, linestatus, shipdate,
         |       "KEY_HASH", "RECORD_HASH", "INSERT_RUN_ID"
         |FROM (SELECT * FROM enrichA UNION ALL BY NAME SELECT * FROM delta)""".stripMargin,
    "d03_schema_evolution" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity,
        |       l_returnflag AS returnflag,
        |       CAST(l_shipdate AS DATE) AS shipdate,
        |       'batch' AS load_source
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1995-06-01'""".stripMargin,
    "d04_merge_cdc" ->
      s"""$snapshotsCte,
         |newd AS (SELECT * FROM enrichB WHERE l_orderkey % 7 = 0),
         |del AS (SELECT "KEY_HASH" FROM enrichA WHERE l_orderkey % 13 = 0),
         |kept AS (
         |  SELECT c.* FROM enrichA c
         |  WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d."KEY_HASH" = c."KEY_HASH")
         |    AND NOT EXISTS (SELECT 1 FROM newd n WHERE n."KEY_HASH" = c."KEY_HASH")
         |)
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "KEY_HASH", "RECORD_HASH"
         |FROM (SELECT * FROM kept UNION ALL BY NAME SELECT * FROM newd)""".stripMargin,
    "d06_scd2_merge" ->
      s"""$scd2Cte
         |SELECT * REPLACE (CAST(quantity AS DOUBLE) AS quantity) FROM v2""".stripMargin,
    "d07_deletes_by_column" ->
      s"""$snapshotsCte SELECT "KEY_HASH" FROM enrichA WHERE returnflag = 'R'""",
    "d08_deleted_full_load" ->
      s"""$snapshotsCte
         |SELECT c."KEY_HASH" FROM enrichA c
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM enrichB n
         |  WHERE n.l_orderkey % 3 <> 0 AND n."KEY_HASH" = c."KEY_HASH")""".stripMargin,
    // delete closure: CASE-close the active rows of vanished keys (run-3
    // drops every 7th order key; key digest <-> business key is bijective
    // here, so the modulus states the vanished set directly)
    "x_scd2_delete_close" ->
      s"""$scd2Cte
         |$scd2CloseSelect""".stripMargin,
    // resurrection: the closure's output plus a fresh run-4 interval for
    // every closed key (the full load re-delivers them); the gap between
    // the close and the reopen is preserved — no row covers it
    "x_scd2_reopen" ->
      s"""$scd2Cte,
         |closed AS (
         |$scd2CloseSelect
         |)
         |SELECT * FROM closed
         |UNION ALL BY NAME
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "UPDATE_TS", "UPDATE_RUN_ID",
         |       DATE '2024-04-01' AS "VALID_FROM", DATE '9999-12-31' AS "VALID_TO",
         |       "DELETED"
         |FROM enrichB WHERE l_orderkey % 7 = 0""".stripMargin,
    // tiered lifecycle ≡ flat lifecycle: the archive/active split is a
    // storage layout, not a semantics change. Orders is key-unique and
    // the mutations are modulus-determined, so the 4-run outcome has a
    // CLOSED FORM: (a) the pre-change version of every 53-key, closed at
    // the run-2 boundary; (b) every key's current content — closed with
    // the DELETED stamp iff it is a 7-key (vanished in run 3); (c) a
    // fresh run-4 interval for every 7-key (re-delivered in run 4), the
    // deleted epoch left as a gap
    "x_scd2_tiered" -> scd2TieredLifecycleSql,
    // the steady-state row applies run 4 to the staged runs-1-3 tiers;
    // the converged end state is the same 4-run lifecycle, so the oracle
    // is the same closed-form statement
    "x_scd2_tiered_run" -> scd2TieredLifecycleSql,
    // compaction fixture closed form (runs: bootstrap, 53-bump, 7-vanish,
    // full re-delivery with 31-bump): per key k with original content O,
    // run-2 content B = O(+100 if 53|k), run-4 content C = B(+50 if 31|k)
    // the store holds (a) O closed at the run-2 boundary for 53-keys,
    // (b) B closed DELETED at the run-3 boundary for 7-keys, (c) B closed
    // at the run-4 boundary for 31-keys still active then (not 7-keys),
    // (d) a run-4 interval with content C for every 7-key (reopen) and
    // 31-key (update), (e) untouched active rows for everything else.
    // compactHistory folded the run-2 partition into run-3's before the
    // read -- the statement is the UNCOMPACTED store's: the fold must be
    // invisible under the driver's hash
    "x_scd2_tiered_compact" -> scd2TieredCompactSql,
    "l15_split_active" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_TO" = DATE '9999-12-31'""".stripMargin,
    "l15_split_hist" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_TO" < DATE '9999-12-31'""".stripMargin,
    // definitional as-of: both validity bounds inclusive
    "x_store_asof" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_FROM" <= DATE '2024-02-01'
         |  AND DATE '2024-02-01' <= "VALID_TO"""".stripMargin,
    "x_store_asof_boundary" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_FROM" <= DATE '2024-02-14'
         |  AND DATE '2024-02-14' <= "VALID_TO"""".stripMargin,
    // the point lookup: the as-of statement restricted to the snapshot's
    // minimum business key (min orderkey, then min linenumber within it —
    // the Spark side's orderBy-limit-1 selection)
    "x_store_asof_point" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_FROM" <= DATE '2024-02-01'
         |  AND DATE '2024-02-01' <= "VALID_TO"
         |  AND l_orderkey = (SELECT min(l_orderkey) FROM lineitem
         |        WHERE l_shipdate < DATE '1995-06-01')
         |  AND l_linenumber = (SELECT min(l_linenumber) FROM lineitem
         |        WHERE l_shipdate < DATE '1995-06-01'
         |          AND l_orderkey = (SELECT min(l_orderkey) FROM lineitem
         |                WHERE l_shipdate < DATE '1995-06-01'))""".stripMargin,
    // temporal join: the lineitem SCD2 chain joined to the orders history
    // on orderkey with intersected validity windows. The orders side uses
    // the closed form of the two-run merge (key sets equal across runs;
    // a key versions iff its modulus-53 bump changes the record): version
    // 1 closes 2024-02-14 exactly for changed keys, version 2 opens
    // 2024-02-15 for them — the same rows the five-branch chain yields
    "x_store_temporal_join" ->
      s"""$scd2Cte,
         |obase AS (
         |  SELECT o_orderkey, o_orderstatus AS orderstatus,
         |         CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice,
         |         CAST(o_orderdate AS DATE) AS orderdate
         |  FROM orders
         |),
         |ohist AS (
         |  SELECT o_orderkey, totalprice,
         |         md5(concat_ws('#?', coalesce(CAST(o_orderkey AS VARCHAR),'nan'),
         |                             coalesce(orderstatus,'nan'),
         |                             coalesce(CAST(totalprice AS VARCHAR),'nan'),
         |                             coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS record_hash_r,
         |         DATE '2024-01-01' AS vf,
         |         CASE WHEN o_orderkey % 53 = 0 THEN DATE '2024-02-14'
         |              ELSE DATE '9999-12-31' END AS vt
         |  FROM obase
         |  UNION ALL
         |  SELECT o_orderkey, CAST(totalprice + 100 AS DECIMAL(18,2)) AS totalprice,
         |         md5(concat_ws('#?', coalesce(CAST(o_orderkey AS VARCHAR),'nan'),
         |                             coalesce(orderstatus,'nan'),
         |                             coalesce(CAST(CAST(totalprice + 100 AS DECIMAL(18,2)) AS VARCHAR),'nan'),
         |                             coalesce(CAST(orderdate AS VARCHAR),'nan'))) AS record_hash_r,
         |         DATE '2024-02-15' AS vf, DATE '9999-12-31' AS vt
         |  FROM obase WHERE o_orderkey % 53 = 0
         |)
         |SELECT v.l_orderkey, v.l_linenumber, CAST(v.quantity AS DOUBLE) AS quantity,
         |       CAST(o.totalprice AS DOUBLE) AS totalprice,
         |       v."RECORD_HASH", o.record_hash_r AS "RECORD_HASH_R",
         |       greatest(v."VALID_FROM", o.vf) AS "VALID_FROM",
         |       least(v."VALID_TO", o.vt) AS "VALID_TO"
         |FROM v2 v JOIN ohist o ON v.l_orderkey = o.o_orderkey
         |WHERE greatest(v."VALID_FROM", o.vf) <= least(v."VALID_TO", o.vt)""".stripMargin,
    // the key history: v2 restricted to the minimum modulus-97 key of
    // snapshot A (the Spark side's filtered orderBy-limit-1 selection)
    "x_store_key_history" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem
         |        WHERE l_shipdate < DATE '1995-06-01' AND l_orderkey % 97 = 0)
         |  AND l_linenumber = (SELECT min(l_linenumber) FROM lineitem
         |        WHERE l_shipdate < DATE '1995-06-01'
         |          AND l_orderkey = (SELECT min(l_orderkey) FROM lineitem
         |                WHERE l_shipdate < DATE '1995-06-01'
         |                  AND l_orderkey % 97 = 0))""".stripMargin,
    // the interval audit read: window-overlap against [Feb 1, Feb 20]
    "x_store_between" ->
      s"""$scd2Cte
         |SELECT l_orderkey, l_linenumber, CAST(quantity AS DOUBLE) AS quantity,
         |       "RECORD_HASH", "VALID_FROM", "VALID_TO"
         |FROM v2 WHERE "VALID_FROM" <= DATE '2024-02-10'
         |  AND DATE '2024-01-05' <= "VALID_TO"""".stripMargin,
    "x_dedup_exact" ->
      """SELECT md5(coalesce(CAST(text AS VARCHAR), 'nan')) AS content_hash,
        |       min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "x_dedup_jaccard" ->
      s"""$docShinglesCte,
         |ex AS (SELECT doc_id AS id, unnest(shingles) AS s FROM sh),
         |joinable AS (
         |  SELECT s FROM ex GROUP BY s HAVING count(*) BETWEEN 2 AND 1000
         |),
         |fil AS (SELECT ex.* FROM ex JOIN joinable USING (s)),
         |sizes AS (SELECT id, count(*) AS n_sh FROM ex GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM fil a JOIN fil b ON a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b,
         |       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.1""".stripMargin,
    // same CTE chain as the Jaccard statement; only the denominator
    // changes — containment of the smaller shingle set (shared CTE with
    // the election twin so the derivations cannot drift)
    "x_dedup_containment" ->
      s"""$containmentInterCte
         |SELECT id_a, id_b,
         |       round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) >= 0.5""".stripMargin,
    // containment pairs through CC + the n_chars election: identical
    // ranked/losers tail as x_dedup_keep_best, over the containment CTE
    "x_dedup_containment_elect" ->
      s"""${containmentInterCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) >= 0.5
         |),
         |${duckConnectedComponents("pairs")},
         |comp AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
         |ranked AS (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.cluster_id
         |    ORDER BY d.n_chars DESC NULLS LAST, c.id) AS rn
         |  FROM comp c JOIN documents d ON d.doc_id = c.id
         |),
         |losers AS (SELECT id FROM ranked WHERE rn > 1)
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)""".stripMargin,
    "x_dedup_minhash" ->
      s"""$minhashBandedCte
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.key = b.key AND a.id < b.id""".stripMargin,
    // batch (odd ids) probes the accumulated band index (even ids): the
    // same banded derivation, restricted on each join side
    "x_dedup_minhash_incremental" ->
      s"""$minhashBandedCte
         |SELECT DISTINCT b.id AS batch_id, c.id AS corpus_id
         |FROM banded b JOIN banded c
         |  ON b.band = c.band AND b.key = c.key
         | AND b.id % 2 = 1 AND c.id % 2 = 0""".stripMargin,
    "x_dedup_minhash_verified" ->
      s"""$docShinglesCte,
         |sig AS (
         |  SELECT doc_id AS id,
         |    list_transform(range(0, 8),
         |      j -> list_min(list_transform(shingles,
         |             s -> md5(concat(CAST(j AS VARCHAR), '#', s))))) AS sig
         |  FROM sh
         |),
         |banded AS (
         |  SELECT id, g.band,
         |         md5(array_to_string(sig[g.band*2+1:g.band*2+2], '|')) AS key
         |  FROM sig, generate_series(0, 3) g(band)
         |),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.key = b.key AND a.id < b.id
         |),
         |ex AS (SELECT doc_id AS id, unnest(shingles) AS s FROM sh),
         |sizes AS (SELECT id, count(*) AS n_sh FROM ex GROUP BY id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS n_inter
         |  FROM cand c
         |  JOIN ex a ON a.id = c.id_a
         |  JOIN ex b ON b.id = c.id_b AND b.s = a.s
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b,
         |       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.id = id_a
         |JOIN sizes sb ON sb.id = id_b
         |WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.3""".stripMargin,
    "x_dedup_simhash" ->
      s"""$simhashFpCte
         |SELECT fp AS simhash, min(doc_id) AS keep_id, count(*) AS n_docs
         |FROM fp GROUP BY 1""".stripMargin,
    "x_dedup_simhash_near" ->
      s"""$simhashNearPairsCte
         |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,
    // the pairs-store build row persists exactly this pair set
    "x_stage_build_neardup_pairs" ->
      s"""$simhashNearPairsCte
         |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,
    // 64-bit twin: same pigeonhole pipeline, blocks generated from the
    // SAME hammingBlocks computation; DuckDB's arithmetic >> differs from
    // Spark's unsigned shift only above the masked width, so the block
    // values agree bit-for-bit even when the sign bit is set
    "x_dedup_simhash_wide" ->
      s"""$simhashWideNearPairsCte
         |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,
    // the wide pair graph through the SAME recursive-CC and election
    // statements as the 16-bit family
    "x_dedup_clusters_wide" ->
      s"""${simhashWideNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")}
         |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin,
    "x_dedup_keep_best_wide" ->
      s"""${simhashWideNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")},
         |comp AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
         |ranked AS (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.cluster_id
         |    ORDER BY d.n_chars DESC NULLS LAST, c.id) AS rn
         |  FROM comp c JOIN documents d ON d.doc_id = c.id
         |),
         |losers AS (SELECT id FROM ranked WHERE rn > 1)
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)""".stripMargin,
    // the blocking is an implementation detail; the contract is the O(n²)
    // definition, which the oracle states directly
    "x_dedup_editdist" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1""".stripMargin,
    // min-label connected components as a recursive CTE: cc enumerates
    // (node, reachable node) over the symmetric edge list, so min(label)
    // per node is the component minimum — the same fixpoint the iterative
    // Spark loop converges to
    "x_dedup_clusters" ->
      s"""${simhashNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")}
         |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin,
    // incremental ≡ full recompute on the union graph, so the oracle is
    // the same recursive-CC statement as x_dedup_clusters
    "x_dedup_clusters_incremental" ->
      s"""${simhashNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")}
         |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin,
    // takedown ≡ full recompute over the pairs not touching a removed id
    // (other docs' fingerprints are unchanged, so kept pairs ARE the
    // surviving corpus's pairs) — over the WIDE pair graph, the width
    // whose small components make affected-component repair meaningful
    "x_dedup_clusters_removed" ->
      s"""${simhashWideNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |kept AS (
         |  SELECT id_a, id_b FROM pairs WHERE id_a % 25 <> 3 AND id_b % 25 <> 3
         |),
         |${duckConnectedComponents("kept")}
         |SELECT id AS doc_id, min(label) AS cluster_id FROM cc GROUP BY id""".stripMargin,
    "x_dedup_cluster_stats" ->
      s"""${simhashNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")},
         |comp AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
         |szs AS (SELECT cluster_id, count(*) AS sz FROM comp GROUP BY cluster_id)
         |SELECT count(*) AS n_clusters,
         |       CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_docs_clustered,
         |       CAST(coalesce(max(sz), 0) AS BIGINT) AS max_cluster_size,
         |       CAST(coalesce(sum(sz - 1), 0) AS BIGINT) AS n_removable
         |FROM szs""".stripMargin,
    "x_dedup_canonical" ->
      s"""${simhashNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckCcLosers("pairs")}
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)""".stripMargin,
    // survivor = rank-1 by (n_chars DESC, id) within the recursive-CTE
    // component — NULLS LAST mirrors the struct-max's null-loses rule
    "x_dedup_keep_best" ->
      s"""${simhashNearPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
         |${duckConnectedComponents("pairs")},
         |comp AS (SELECT id, min(label) AS cluster_id FROM cc GROUP BY id),
         |ranked AS (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.cluster_id
         |    ORDER BY d.n_chars DESC NULLS LAST, c.id) AS rn
         |  FROM comp c JOIN documents d ON d.doc_id = c.id
         |),
         |losers AS (SELECT id FROM ranked WHERE rn > 1)
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = d.doc_id)""".stripMargin,
    // same position set (1-based starts, stride 1), raw-substring joins
    // instead of the 60-bit hashes, identical island-merge windows
    "x_dedup_spans" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 30
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS p FROM docs)
        |),
        |dup AS (
        |  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |),
        |dp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (gram)
        |),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) AS grp
        |  FROM dp
        |)
        |SELECT doc_id, min(p) AS span_start, max(p) + 29 AS span_end
        |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // the staged spans stores' accumulated content: the ingestion loop
    // over the full corpus, replayed batch-aware
    "x_stage_build_spans" -> duckSpansBatchedSql("1 = 1"),
    // after purging every 7th doc, the stores equal the ingestion loop
    // over the SURVIVOR corpus — including survivor spans that existed
    // only through a removed doc's grams, which must be gone
    "x_dedup_spans_purged" -> duckSpansBatchedSql("doc_id % 7 <> 0"),
    // strided twin: position set steps by 4 and the island-merge group key
    // subtracts row_number()*4, so runs of stride-spaced duplicated
    // positions merge exactly as the Scala window does
    "x_dedup_spans_strided" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 30
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28, 4)) AS p FROM docs)
        |),
        |dup AS (
        |  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |),
        |dp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (gram)
        |),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) AS INT) * 4 AS grp
        |  FROM dp
        |)
        |SELECT doc_id, min(p) AS span_start, max(p) + 29 AS span_end
        |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // removal twin of the span report: same position set, but a position
    // is cut only when this doc is not the gram's min-id keeper; islands
    // interval-merge (strictly-overlapping only), then the cleaned text
    // reassembles from lag-segments + string_agg + tail — equivalent to
    // the Spark fold over disjoint sorted spans
    "x_dedup_spans_removed" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 30
        |),
        |pos AS (
        |  SELECT doc_id, CAST(p AS INT) AS p, substring(text, CAST(p AS INT), 30) AS gram
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 28)) AS p FROM docs)
        |),
        |st AS (
        |  SELECT gram, min(doc_id) AS keeper FROM pos
        |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        |),
        |cut AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN st USING (gram)
        |  WHERE pos.doc_id <> st.keeper
        |),
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
        |  FROM merged m JOIN documents d USING (doc_id)
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
        |FROM documents d
        |LEFT JOIN heads h USING (doc_id)
        |LEFT JOIN tails t USING (doc_id)""".stripMargin,
    "x_dedup_incremental" ->
      """WITH h AS (
        |  SELECT doc_id, md5(coalesce(CAST(text AS VARCHAR), 'nan')) AS content_hash
        |  FROM documents
        |),
        |known AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 2 = 0),
        |novel AS (
        |  SELECT h.* FROM h LEFT JOIN known k USING (content_hash)
        |  WHERE k.content_hash IS NULL
        |)
        |SELECT doc_id, content_hash FROM (
        |  SELECT doc_id, content_hash,
        |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |  FROM novel
        |) WHERE rn = 1""".stripMargin,
    // token-run collapsing: keep w[i] iff it differs from w[i-1] (i = 1
    // always kept; w[0] is NULL in DuckDB's 1-based lists, and NULL <>
    // never passes, so the i = 1 arm carries the first token)
    "x_text_collapse" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS w
        |  FROM documents
        |)
        |SELECT doc_id,
        |  array_to_string(list_filter(list_transform(range(1, len(w) + 1),
        |    i -> CASE WHEN i = 1 OR w[i] <> w[i-1] THEN w[i] END),
        |    x -> x IS NOT NULL), ' ') AS collapsed
        |FROM toks""".stripMargin,
    // global line dedup: keeper = row_number 1 over (doc_id, p) per line
    // hash — the same lexicographic-min convention as Spark's
    // min(struct(id, p)); DuckDB list lambdas are 1-based, hence i - 1
    "x_text_dedup_lines" ->
      s"""WITH lined AS (
         |  SELECT doc_id,
         |         regexp_replace(text, '((?:\\S+ ){8})', '\\1' || chr(10), 'g') AS text
         |  FROM documents
         |),
         |sp AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM lined),
         |ex AS (
         |  SELECT doc_id, CAST(i AS INT) - 1 AS p, ls[CAST(i AS INT)] AS line
         |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i FROM sp)
         |),
         |el AS (SELECT doc_id, p, ${duckHash60("line")} AS lh FROM ex
         |       WHERE length(line) >= 1),
         |rk AS (SELECT doc_id, p,
         |              row_number() OVER (PARTITION BY lh ORDER BY doc_id, p) AS rn
         |       FROM el),
         |dl AS (SELECT doc_id, list(p) AS dp FROM rk WHERE rn > 1 GROUP BY doc_id)
         |SELECT s.doc_id,
         |       CASE WHEN d.dp IS NULL THEN s.text
         |            -- coalesce: DuckDB's array_to_string is NULL on an empty
         |            -- list, but a fully-deduplicated doc keeps empty text
         |            ELSE coalesce(array_to_string(
         |              list_filter(s.ls, (x, i) -> NOT list_contains(d.dp, i - 1)),
         |              chr(10)), '')
         |       END AS cleaned
         |FROM sp s LEFT JOIN dl d USING (doc_id)""".stripMargin,
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
    // contiguous-fill packing: pack = floor(preceding-cumsum / budget)
    // within an id-ordered shard window — byte-identical window semantics
    // in Spark and DuckDB
    // per-doc token-ID stream: the replay chain split back into symbols
    // and joined to the standard BPE vocabulary (bytes 0..255, rule at
    // rank r = id 256 + r)
    "x_text_bpe_encode" ->
      s"""WITH ${duckBpeIdCtes("doc_id % 13 = 0")}
         |SELECT doc_id, CAST(tok_pos AS INT) AS tok_pos, id AS token_id
         |FROM ord""".stripMargin,
    // packed training sequences: the x_pack_bpe pack derivation (counts
    // from the id stream, same cum/floor fill) restricted to the 1/13
    // corpus, then each pack's stream = member docs' ids in
    // (pack_pos, tok_pos) order
    "x_pack_bpe_sequences" ->
      s"""WITH ${duckBpeIdCtes("doc_id % 13 = 0")},
         |cnt AS (
         |  SELECT d.doc_id, CAST(coalesce(count(o.id), 0) AS BIGINT) AS n_tokens
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 13 = 0) d
         |  LEFT JOIN ord o ON o.doc_id = d.doc_id
         |  GROUP BY d.doc_id
         |),
         |t AS (
         |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard, n_tokens FROM cnt
         |),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM t
         |),
         |p AS (
         |  SELECT doc_id, shard,
         |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS pack_id
         |  FROM c
         |),
         |pp AS (
         |  SELECT doc_id, shard, pack_id,
         |    row_number() OVER (PARTITION BY shard, pack_id ORDER BY doc_id) AS pack_pos
         |  FROM p
         |),
         |seq AS (
         |  SELECT pp.shard, pp.pack_id, o.id,
         |    row_number() OVER (PARTITION BY pp.shard, pp.pack_id
         |                       ORDER BY pp.pack_pos, o.tok_pos) AS seq_pos
         |  FROM pp JOIN ord o ON o.doc_id = pp.doc_id
         |)
         |SELECT shard, pack_id, CAST(seq_pos AS BIGINT) AS seq_pos, id AS token_id
         |FROM seq""".stripMargin,
    "x_pack_bpe" ->
      s"""WITH tok AS (
         |  SELECT doc_id, CASE WHEN i = 1 THEN tok0 ELSE ' ' || tok0 END AS tok
         |  FROM (
         |    SELECT doc_id,
         |      unnest(string_split(text, ' ')) AS tok0,
         |      unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
         |    FROM documents
         |  )
         |),
         |sym AS (
         |  SELECT doc_id, ${duckBpeSymExpr("tok")} AS s
         |  FROM tok WHERE tok <> ''
         |),
         |cnt AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(sum(length(s) - length(replace(s, '>', ''))), 0) AS BIGINT)
         |      AS n_tokens
         |  FROM documents d LEFT JOIN sym ON sym.doc_id = d.doc_id
         |  GROUP BY d.doc_id
         |),
         |t AS (
         |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard, n_tokens FROM cnt
         |),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM t
         |),
         |p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS pack_id
         |  FROM c
         |)
         |SELECT doc_id, shard, n_tokens, pack_id,
         |  CAST(row_number() OVER (PARTITION BY shard, pack_id ORDER BY doc_id) AS BIGINT)
         |    AS pack_pos
         |FROM p""".stripMargin,
    "x_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT doc_id, shard, n_tokens, pack_id,
        |  CAST(row_number() OVER (PARTITION BY shard, pack_id ORDER BY doc_id) AS BIGINT)
        |    AS pack_pos
        |FROM p""".stripMargin,
    // groups pack as units by total tokens (window over GROUPS, keyed and
    // sharded by each group's smallest doc_id), then join back to rows
    "x_pack_groups" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 100 AS BIGINT) AS grp,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |g AS (
        |  SELECT grp, sum(n_tokens) AS grp_tokens, min(doc_id) AS grp_key
        |  FROM t GROUP BY grp
        |),
        |c AS (
        |  SELECT grp, grp_tokens, grp_key, CAST(grp_key % 8 AS BIGINT) AS shard,
        |    sum(grp_tokens) OVER (PARTITION BY grp_key % 8 ORDER BY grp_key) AS cum
        |  FROM g
        |),
        |p AS (
        |  SELECT grp, shard,
        |    CAST(floor(CAST(cum - grp_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT t.doc_id, t.grp, p.shard, p.pack_id
        |FROM t JOIN p USING (grp)""".stripMargin,
    "x_pack_summary" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t
        |),
        |p AS (
        |  SELECT shard, n_tokens,
        |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS pack_id
        |  FROM c
        |)
        |SELECT shard, pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        |       round(CAST(sum(n_tokens) AS DOUBLE) / 512.0, 6) AS fill_ratio
        |FROM p GROUP BY shard, pack_id""".stripMargin,
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
    "x_sim_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
        |      (sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))
        |    , 6) AS cos
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // 4 OR'd tables x 2 planes, global plane index t*2+p — exactly
    // srpBucketKeys(planes = 2, tables = 4); candidate pairs are
    // de-duplicated across tables before scoring, like lshTopK
    "x_sim_ann_lsh" ->
      """WITH v AS (
        |  SELECT vec_id AS id, embedding AS vv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, 2), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(vv[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * 2 + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM v, generate_series(0, 3) t(t)
        |),
        |cand AS (
        |  SELECT DISTINCT q.id AS query_id, c.id AS corpus_id
        |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |                    AND q.id < 5 AND q.id <> c.id
        |),
        |scored AS (
        |  SELECT query_id, corpus_id,
        |    round(list_sum(list_transform(range(1, 65),
        |            i -> CAST(vq.vv[i] AS DOUBLE) * CAST(vc.vv[i] AS DOUBLE)))
        |          / (vq.nrm * vc.nrm), 6) AS cos
        |  FROM cand JOIN v vq ON vq.id = query_id JOIN v vc ON vc.id = corpus_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // x_sim_ann_lsh's statement with one substitution: bucket signs come
    // from the int8 codes (same scale/round derivation as x_sim_quantize);
    // scoring still reads the original vectors — mirroring the operator's
    // quantized-candidates / exact-re-rank split
    "x_sim_ann_quantized" ->
      """WITH v AS (
        |  SELECT vec_id AS id, embedding AS vv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |),
        |s AS (
        |  SELECT vec_id AS id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings
        |),
        |qz AS (
        |  SELECT id,
        |    CASE WHEN scale = 0
        |         THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |                x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT)) END AS codes
        |  FROM s
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, 2), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(codes[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * 2 + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM qz, generate_series(0, 3) t(t)
        |),
        |cand AS (
        |  SELECT DISTINCT q.id AS query_id, c.id AS corpus_id
        |  FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |                    AND q.id < 5 AND q.id <> c.id
        |),
        |scored AS (
        |  SELECT query_id, corpus_id,
        |    round(list_sum(list_transform(range(1, 65),
        |            i -> CAST(vq.vv[i] AS DOUBLE) * CAST(vc.vv[i] AS DOUBLE)))
        |          / (vq.nrm * vc.nrm), 6) AS cos
        |  FROM cand JOIN v vq ON vq.id = query_id JOIN v vc ON vc.id = corpus_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // full PQ mirror: subspace-indexed kmeans CTEs, ADC lookup tables,
    // shortlist + exact re-rank — see duckPqSql for the parity pins
    "x_sim_pq" -> duckPqSql(m = 16, ks = 16, iters = 2, probe = 40, k = 10),
    "x_sim_ivf" ->
      s"""WITH $duckIvfAssignCtes,
        |probe AS (
        |  SELECT id AS query_id, vv AS qv, nrm AS qn, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid DESC) AS rn
        |    FROM pairs WHERE id < 5
        |  ) WHERE rn <= 8
        |),
        |scored AS (
        |  SELECT p.query_id, a.id AS corpus_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(p.qv[i] AS DOUBLE) * CAST(a.vv[i] AS DOUBLE))) / (p.qn * a.nrm), 6) AS cos
        |  FROM probe p JOIN assign a ON a.cid = p.cid AND a.id <> p.query_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, corpus_id, cos, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10""".stripMargin,
    // same per-vector max/127 scale and round-half-away-from-zero code
    // derivation as quantizeInt8; CAST of the already-integral round()
    // output is exact in both engines. codes flattened to CSV so the
    // driver's checker only ever sorts scalar cells (r6 fix).
    "x_sim_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings
        |)
        |SELECT vec_id, scale,
        |  array_to_string(
        |    CASE WHEN scale = 0
        |         THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |                x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INT)) END,
        |    ',') AS codes_csv
        |FROM s""".stripMargin,
    "x_sim_near_dup" ->
      """WITH v AS (
        |  SELECT vec_id AS id, embedding AS vv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, 4), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(vv[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * 4 + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM v, generate_series(0, 1) t(t)
        |),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.id < b2.id
        |),
        |scored AS (
        |  SELECT id_a, id_b,
        |    round(list_sum(list_transform(range(1, 65),
        |            i -> CAST(va.vv[i] AS DOUBLE) * CAST(vb.vv[i] AS DOUBLE)))
        |          / (va.nrm * vb.nrm), 6) AS cos
        |  FROM cand JOIN v va ON va.id = id_a JOIN v vb ON vb.id = id_b
        |)
        |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.4""".stripMargin,
    // batch (odd ids) probes the accumulated bucket index (even ids):
    // the same bucket derivation as x_sim_near_dup, restricted per side
    "x_sim_near_dup_incremental" ->
      """WITH v AS (
        |  SELECT vec_id AS id, embedding AS vv FROM embeddings
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, 4), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(vv[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * 4 + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM v, generate_series(0, 1) t(t)
        |)
        |SELECT DISTINCT b1.id AS batch_id, c.id AS corpus_id
        |FROM b b1 JOIN b c ON b1.tbl = c.tbl AND b1.bucket = c.bucket
        | AND b1.id % 2 = 1 AND c.id % 2 = 0""".stripMargin,
    // candidates CTE as above, then the x_sim_near_dup cosine verify
    // restricted to them
    "x_sim_near_dup_incr_verified" ->
      """WITH v AS (
        |  SELECT vec_id AS id, embedding AS vv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, 4), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(vv[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * 4 + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM v, generate_series(0, 1) t(t)
        |),
        |cand AS (
        |  SELECT DISTINCT b1.id AS batch_id, c.id AS corpus_id
        |  FROM b b1 JOIN b c ON b1.tbl = c.tbl AND b1.bucket = c.bucket
        |   AND b1.id % 2 = 1 AND c.id % 2 = 0
        |),
        |scored AS (
        |  SELECT batch_id, corpus_id,
        |    round(list_sum(list_transform(range(1, 65),
        |            i -> CAST(vb.vv[i] AS DOUBLE) * CAST(vc.vv[i] AS DOUBLE)))
        |          / (vb.nrm * vc.nrm), 6) AS cos
        |  FROM cand JOIN v vb ON vb.id = batch_id JOIN v vc ON vc.id = corpus_id
        |)
        |SELECT batch_id, corpus_id, cos FROM scored WHERE cos >= 0.4""".stripMargin,
    // same bucketed-pairs shape as x_sim_near_dup, but `planes` is the
    // size-derived value: a params CTE mirrors Similarity.autoPlanes
    // (ceil(ln(max(n/targetPerBucket, 1))/ln 2 - 1e-9), floored at 1) with
    // targetPerBucket = 64 — the shared epsilon absorbs 1-ulp ln()
    // divergence between engines at exact-power-of-two bucket counts
    "x_sim_near_dup_auto" ->
      """WITH params AS (
        |  SELECT greatest(1, CAST(ceil(ln(greatest(count(*) / 64.0, 1.0)) / ln(2.0) - 1e-9) AS INT)) AS planes
        |  FROM embeddings
        |),
        |v AS (
        |  SELECT vec_id AS id, embedding AS vv,
        |    sqrt(list_sum(list_transform(range(1, 65),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings
        |),
        |b AS (
        |  SELECT id, t.t AS tbl,
        |    array_to_string(list_transform(range(0, params.planes), p ->
        |      CASE WHEN list_sum(list_transform(range(1, 65),
        |             i -> CAST(vv[i] AS DOUBLE) *
        |                  ((strpos('0123456789abcdef',
        |                     substring(md5(concat(CAST(t.t * params.planes + p AS VARCHAR), '#', CAST(i - 1 AS VARCHAR))), 1, 1))
        |                    - 1) % 2 * 2 - 1))) > 0
        |      THEN '1' ELSE '0' END), '') AS bucket
        |  FROM v, generate_series(0, 1) t(t), params
        |),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b2.id AS id_b
        |  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.id < b2.id
        |),
        |scored AS (
        |  SELECT id_a, id_b,
        |    round(list_sum(list_transform(range(1, 65),
        |            i -> CAST(va.vv[i] AS DOUBLE) * CAST(vb.vv[i] AS DOUBLE)))
        |          / (va.nrm * vb.nrm), 6) AS cos
        |  FROM cand JOIN v va ON va.id = id_a JOIN v vb ON vb.id = id_b
        |)
        |SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.4""".stripMargin,
    "x_skew_join" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag AS returnflag,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS quantity
        |  FROM lineitem
        |),
        |dim AS (
        |  SELECT returnflag, count(*) AS n_flag,
        |         CAST(sum(quantity) AS DOUBLE) AS sum_qty
        |  FROM li GROUP BY returnflag
        |)
        |SELECT l.l_orderkey, l.l_linenumber, returnflag, d.n_flag, d.sum_qty
        |FROM li l JOIN dim d USING (returnflag)""".stripMargin,
    // plain BETWEEN join — DuckDB plans it fine at oracle scale; the
    // bucketed rewrite is the Spark side's distributed-scale concern
    "x_range_join" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS INT) AS ship_day
        |  FROM lineitem
        |),
        |win AS (
        |  SELECT o_orderkey AS win_key,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS lo,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) + 30 AS hi
        |  FROM orders WHERE o_orderkey % 601 = 0
        |)
        |SELECT win_key, l_orderkey, l_linenumber, ship_day
        |FROM li JOIN win ON ship_day BETWEEN lo AND hi""".stripMargin,
    // k-means (k=8, 2 Lloyd rounds) -> within-cluster cosine pairs ->
    // recursive-CC losers -> survivors; the clustering CTEs reuse the
    // green IVF-init/argmax and meanpool-decimal derivations
    "x_emb_semdedup" ->
      s"""WITH RECURSIVE ${duckKmeansCtes(8, 2)},
         |prs AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    round(list_sum(list_transform(range(1, 65),
         |      i -> CAST(a.vv[i] AS DOUBLE) * CAST(b.vv[i] AS DOUBLE))) / (a.nrm * b.nrm), 6) AS cos
         |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.id < b.id
         |),
         |pairs2 AS (SELECT id_a, id_b FROM prs WHERE cos >= 0.4),
         |${duckCcLosers("pairs2")}
         |SELECT e.vec_id FROM embeddings e
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id = e.vec_id)""".stripMargin,
    // the Lloyd chain's own final assignment, restricted to the batch —
    // assignment through the stored centroid frame is definitionally the
    // same argmax
    "x_emb_kmeans_incremental" ->
      s"""WITH ${duckKmeansCtes(8, 2)}
         |SELECT id AS vec_id, cid FROM a2 WHERE id % 5 = 4""".stripMargin,
    "x_emb_meanpool" ->
      """WITH e AS (SELECT vec_id % 16 AS grp, embedding FROM embeddings),
        |x AS (
        |  SELECT grp, CAST(i - 1 AS INT) AS i,
        |         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        |  FROM e, range(1, 65) t(i)
        |)
        |SELECT grp, i,
        |  round(CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / count(v), 6) AS mean
        |FROM x GROUP BY grp, i""".stripMargin,
    // drift: per-dim exact decimal means (rounded 6, the pooling
    // contract) → IEEE products → decimal reductions — digit-identical
    "x_emb_drift" ->
      """WITH ma AS (
        |  SELECT CAST(i - 1 AS INT) AS i,
        |    round(CAST(sum(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |      AS DECIMAL(28,12))) AS DOUBLE) / count(embedding[CAST(i AS INT)]), 6) AS ma
        |  FROM (SELECT embedding FROM embeddings WHERE vec_id % 2 = 0), range(1, 65) t(i)
        |  GROUP BY 1
        |),
        |mb AS (
        |  SELECT CAST(i - 1 AS INT) AS i,
        |    round(CAST(sum(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |      AS DECIMAL(28,12))) AS DOUBLE) / count(embedding[CAST(i AS INT)]), 6) AS mb
        |  FROM (SELECT embedding FROM embeddings WHERE vec_id % 2 = 1), range(1, 65) t(i)
        |  GROUP BY 1
        |),
        |s AS (
        |  SELECT sum(CAST(ma * mb AS DECIMAL(28,12))) AS sab,
        |         sum(CAST(ma * ma AS DECIMAL(28,12))) AS saa,
        |         sum(CAST(mb * mb AS DECIMAL(28,12))) AS sbb,
        |         sum(CAST((ma - mb) * (ma - mb) AS DECIMAL(28,12))) AS sd
        |  FROM ma JOIN mb USING (i)
        |)
        |SELECT round(CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)), 6)
        |         AS cos_means,
        |       round(sqrt(CAST(sd AS DOUBLE)), 6) AS l2_means,
        |       round(sqrt(CAST(saa AS DOUBLE)), 6) AS norm_a,
        |       round(sqrt(CAST(sbb AS DOUBLE)), 6) AS norm_b
        |FROM s""".stripMargin,
    "x_text_profile" -> textProfileOracle,
    "x_text_lang" -> langIdOracle,
    "x_text_logprob" ->
      s"""WITH $duckToksCte,
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(w) AS term FROM toks)
         |  GROUP BY 1, 2
         |),
         |freq AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
         |tot AS (SELECT sum(cf) AS total FROM freq)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  round(CAST(sum(CAST(ln(CAST(cf AS DOUBLE) / CAST(total AS DOUBLE))
         |                       * CAST(tf AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
         |        / CAST(sum(tf) AS DOUBLE), 6) AS logprob
         |FROM tf JOIN freq USING (term), tot
         |GROUP BY doc_id""".stripMargin,
    // bigram mirror of x_text_logprob: P(w2|w1) = cbg/cp where cp sums
    // the bigram counts sharing the prefix; 1-based list indexing, i in
    // [1, len-1] pairs w[i] with w[i+1], so <2-token docs vanish
    "x_text_bigram" ->
      s"""WITH $duckToksCte,
         |bg AS (
         |  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
         |),
         |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
         |bgf AS (SELECT w1, w2, sum(tf) AS cbg FROM tf GROUP BY 1, 2),
         |pref AS (SELECT w1, sum(cbg) AS cp FROM bgf GROUP BY 1)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(CAST(ln(CAST(cbg AS DOUBLE) / CAST(cp AS DOUBLE))
         |                       * CAST(tf AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
         |        / CAST(sum(tf) AS DOUBLE), 6) AS logprob
         |FROM tf JOIN bgf USING (w1, w2) JOIN pref USING (w1)
         |GROUP BY doc_id""".stripMargin,
    "x_text_boilerplate" ->
      s"""$docShinglesCte,
         |ex AS (SELECT doc_id, unnest(shingles) AS gram FROM sh)
         |SELECT gram, count(*) AS df FROM ex GROUP BY gram
         |ORDER BY df DESC, gram LIMIT 20""".stripMargin,
    // weights, dot products and norms mirror TextAnalysis.tfidfCosinePairs
    // operand-for-operand: round(tf*ln(1+n/df),6) weights, decimal sums
    "x_text_tfidf_pairs" ->
      s"""$docShinglesCte,
         |tf AS (
         |  SELECT id, term, count(*) AS tf
         |  FROM (SELECT doc_id AS id, unnest(w) AS term FROM toks)
         |  GROUP BY 1, 2
         |),
         |st AS (SELECT count(DISTINCT id) AS n FROM tf),
         |dfreq AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY term
         |  HAVING count(*) <= 100
         |),
         |wt AS (
         |  SELECT id, term,
         |         round(CAST(tf AS DOUBLE)
         |               * ln(1.0 + CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS w
         |  FROM tf JOIN dfreq USING (term), st
         |),
         |nrm AS (
         |  SELECT id, sum(CAST(w * w AS DECIMAL(28,12))) AS nrm FROM wt GROUP BY id
         |),
         |num AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         sum(CAST(a.w * b.w AS DECIMAL(28,12))) AS dot
         |  FROM wt a JOIN wt b ON a.term = b.term AND a.id < b.id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b,
         |       round(CAST(dot AS DOUBLE)
         |             / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6)
         |         AS cosine
         |FROM num
         |JOIN nrm na ON na.id = id_a
         |JOIN nrm nb ON nb.id = id_b
         |WHERE round(CAST(dot AS DOUBLE)
         |            / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 6) >= 0.3""".stripMargin,
    "x_text_winnow" ->
      s"""$winnowFpsCte
         |SELECT doc_id, pos, fp FROM fps""".stripMargin,
    "x_text_winnow_pairs" ->
      s"""$winnowFpsCte,
         |dfp AS (SELECT DISTINCT doc_id AS id, fp FROM fps),
         |jn AS (
         |  SELECT fp FROM dfp GROUP BY fp HAVING count(*) BETWEEN 2 AND 100
         |),
         |fl AS (SELECT id, d.fp FROM dfp d JOIN jn USING (fp))
         |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
         |FROM fl a JOIN fl b ON a.fp = b.fp AND a.id < b.id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "x_text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS w
        |  FROM documents
        |),
        |d AS (SELECT doc_id, w, len(w) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
        |terms AS (SELECT doc_id, dl, unnest(w) AS term FROM d),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        |  FROM terms WHERE term IN ('spark', 'vector', 'join', 'hash')
        |  GROUP BY doc_id, term
        |),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT doc_id,
        |    (ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2)) /
        |    (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))) AS s
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        |)
        |SELECT CAST(doc_id AS BIGINT) AS id,
        |  round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS bm25,
        |  count(*) AS n_terms
        |FROM scored GROUP BY doc_id""".stripMargin,
    // generated from the same pattern list the operator uses, so query and
    // oracle cannot drift; DuckDB needs the 'g' flag for replace-all
    "x_text_redact" -> {
      val chain = TextAnalysis.piiPatterns.foldLeft("text") { case (acc, (tag, p)) =>
        s"regexp_replace($acc, '$p', '<$tag>', 'g')"
      }
      s"SELECT doc_id, $chain AS redacted FROM documents"
    },
    "x_text_url_canonical" ->
      s"""$urlCanonCte
         |SELECT url_id, canonical_url, host FROM urlcanon""".stripMargin,
    "x_dedup_url" ->
      s"""$urlCanonCte
         |SELECT canonical_url, min(url_id) AS keep_id, count(*) AS n_dups
         |FROM urlcanon GROUP BY canonical_url""".stripMargin,
    "x_text_url_hosts" ->
      s"""$urlCanonCte
         |SELECT host, count(*) AS n_pages,
         |       count(DISTINCT canonical_url) AS n_urls
         |FROM urlcanon GROUP BY host""".stripMargin,
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
    // same bottom-k sample CTE as x_sketch_quantiles (one global group,
    // salt "mad"); med and MAD read the sorted sample / sorted absolute
    // deviations at the same floor(0.5*(m-1)) index
    "x_sketch_outliers" ->
      s"""WITH d AS (
         |  SELECT DISTINCT ${duckHashUniform("event_id", "mad")} AS u,
         |         CAST(value AS DOUBLE) AS v
         |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
         |),
         |r AS (SELECT u, v, row_number() OVER (ORDER BY u, v) AS rn FROM d),
         |s AS (SELECT list_sort(list(v)) AS vs, count(*) AS m FROM r WHERE rn <= 256),
         |model AS (
         |  SELECT vs[CAST(floor(CAST(0.5 AS DOUBLE) * (m - 1)) AS INT) + 1] AS med, m, vs
         |  FROM s
         |),
         |model2 AS (
         |  SELECT med,
         |    list_sort(list_transform(vs, x -> abs(x - med)))
         |      [CAST(floor(CAST(0.5 AS DOUBLE) * (m - 1)) AS INT) + 1] AS mad
         |  FROM model
         |)
         |SELECT e.event_id, e.value,
         |       round(abs(CAST(e.value AS DOUBLE) - med) / mad, 6) AS score
         |FROM events e, model2
         |WHERE e.event_id IS NOT NULL AND e.value IS NOT NULL AND mad > 0
         |  AND round(abs(CAST(e.value AS DOUBLE) - med) / mad, 6) > CAST(3.0 AS DOUBLE)""".stripMargin,
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
    // stride = size - overlap = 96; generate_series is inclusive like
    // Spark's sequence, and both substrings are code-point addressed
    // redundant-tail rule mirrored: a non-first start within `overlap`
    // (24) of the end is entirely contained in its predecessor and drops
    "x_text_chunks" ->
      """WITH st AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text), 96)) AS start
        |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |)
        |SELECT doc_id,
        |  CAST((start - 1) // 96 AS INT) AS chunk_idx,
        |  CAST(start AS INT) AS chunk_start,
        |  substring(text, CAST(start AS INT), 120) AS chunk_text
        |FROM st
        |WHERE start = 1 OR start + 23 < length(text)""".stripMargin,
    // the suffix is built from chr() so the oracle text is unambiguous:
    // chr(769) = combining acute, chr(8491) = Angstrom sign; DuckDB's
    // nfc_normalize must produce the same precomposed bytes as the
    // JDK Normalizer, and \s is ASCII whitespace in both regex engines
    "x_text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    nfc_normalize(text || '  cafe' || chr(769) || ' ' || chr(8491) || ' end ')
        |      AS nfc
        |  FROM documents
        |)
        |SELECT doc_id, trim(regexp_replace(nfc, '\s+', ' ', 'g')) AS norm_text,
        |       CAST(length(trim(regexp_replace(nfc, '\s+', ' ', 'g'))) AS INT) AS n_chars_norm
        |FROM raw""".stripMargin,
    // same whitespace tokenization CTE shape as x_text_quality; vocab =
    // distinct tokens of the every-5th-doc slice
    "x_text_oov" ->
      """WITH voc AS (
        |  SELECT DISTINCT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |           t -> length(t) > 0)) AS tok
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
        |           t -> length(t) > 0) AS w
        |  FROM documents WHERE doc_id % 5 <> 0
        |),
        |ex AS (SELECT doc_id, unnest(w) AS tok FROM d),
        |kn AS (
        |  SELECT doc_id, count(*) AS n_known
        |  FROM ex JOIN voc USING (tok) GROUP BY doc_id
        |)
        |SELECT d.doc_id, len(w) AS n_tokens,
        |       len(w) - coalesce(n_known, 0) AS n_oov,
        |       round(CASE WHEN len(w) = 0 THEN 0.0
        |             ELSE CAST(len(w) - coalesce(n_known, 0) AS DOUBLE) / len(w)
        |             END, 6) AS oov_rate
        |FROM d LEFT JOIN kn USING (doc_id)""".stripMargin,
    // DuckDB's entropy aggregate is log2-based and substring is
    // code-point addressed, both matching the kernel; empty list → 0.0
    // on both engines
    "x_text_entropy" ->
      """SELECT doc_id,
        |  round(list_aggregate(list_transform(range(1, length(text) + 1),
        |          i -> substring(text, i, 1)), 'entropy'), 6) AS char_entropy
        |FROM documents""".stripMargin,
    "x_text_quality" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS w
         |  FROM documents
         |),
         |$qualityMetricsCte
         |SELECT doc_id, n_tokens, mean_token_len, alpha_ratio,
         |       top_bigram_ratio, top_trigram_ratio,
         |       $qualityKeepPredicate AS keep
         |FROM m""".stripMargin,
    "x_text_report" ->
      """WITH toks AS (
        |  SELECT text, list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS w
        |  FROM documents
        |),
        |d AS (SELECT text, len(w) AS n_tok FROM toks)
        |SELECT count(*) AS n_docs,
        |  count(CASE WHEN text IS NULL THEN 1 END) AS n_null,
        |  count(CASE WHEN length(text) = 0 THEN 1 END) AS n_empty,
        |  quantile_cont(n_tok, 0.5) AS tokens_p50,
        |  quantile_cont(n_tok, 0.9) AS tokens_p90,
        |  quantile_cont(n_tok, 0.99) AS tokens_p99,
        |  round(CAST(sum(CAST(n_tok AS DECIMAL(28,6))) AS DOUBLE) / count(n_tok), 6)
        |    AS tokens_mean
        |FROM d""".stripMargin,
    "x_split_assign" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    ${duckHashUniform("doc_id", "split")} AS u
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM u""".stripMargin,
    "x_sample_stratified" ->
      s"""WITH u AS (
         |  SELECT event_id, event_type,
         |    ${duckHashUniform("event_id", "stratified")} AS u
         |  FROM events
         |)
         |SELECT event_id, event_type FROM u
         |WHERE u < CASE event_type
         |  WHEN 'click' THEN 0.5 WHEN 'view' THEN 0.1 WHEN 'purchase' THEN 1.0
         |  ELSE NULL END""".stripMargin,
    // mixture sampling: per-source fraction = least(1, target/total) with
    // the target literals produced by the SAME Sampling.budgetTargets
    // call the operator uses — interpolated via Double.toString, whose
    // shortest round-trip repr DuckDB parses back to the identical IEEE
    // double
    "x_sample_mixture" -> {
      val targetCase = graft.operators.Sampling
        .budgetTargets(10000.0, mixtureWeights)
        .map { case (g, t) => s"WHEN '$g' THEN CAST($t AS DOUBLE)" }
        .mkString(" ")
      val inList = mixtureWeights.map(w => s"'${w._1}'").mkString(", ")
      s"""WITH t AS (
         |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS total
         |  FROM documents WHERE source IN ($inList) GROUP BY source
         |),
         |f AS (
         |  SELECT source,
         |    least(CAST(1.0 AS DOUBLE),
         |          CASE source $targetCase ELSE NULL END / total) AS frac
         |  FROM t
         |)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d JOIN f USING (source)
         |WHERE ${duckHashUniform("d.doc_id", "mixture")} < frac""".stripMargin
    },
    // KMV: k-th smallest distinct hash-uniform per group; 63.0/U(64) is
    // the same double division on the same operands in both engines
    "x_sketch_distinct" ->
      s"""WITH u AS (
         |  SELECT DISTINCT event_type, ${duckHashUniform("user_id", "kmv")} AS u
         |  FROM events
         |),
         |r AS (
         |  SELECT event_type, u,
         |         row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS nd
         |  FROM u
         |)
         |SELECT event_type,
         |       round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |             ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END, 6)
         |         AS est_distinct,
         |       CAST(least(max(nd), 64) AS INT) AS n_kept
         |FROM r GROUP BY event_type""".stripMargin,
    // Count-Min: cell counts are plain sums over md5-bucketed rows, the
    // estimate is the min over the 4 hash rows — identical integer
    // arithmetic in both engines
    // the depth index is named hj, NOT j: duckHash60 embeds its argument
    // inside a list_transform lambda whose variable is j, which would
    // shadow an outer j and hash the wrong string
    "x_sketch_cms" ->
      s"""WITH cells AS (
         |  SELECT hj,
         |         ${duckHash60("CAST(l_partkey AS VARCHAR) || '#cms#' || CAST(hj AS VARCHAR)")}
         |           % 256 AS b
         |  FROM lineitem, (SELECT unnest(range(0, 4)) AS hj)
         |  WHERE l_partkey IS NOT NULL
         |),
         |sk AS (SELECT hj, b, count(*) AS c FROM cells GROUP BY hj, b),
         |cand AS (SELECT DISTINCT p_partkey FROM part WHERE p_partkey % 50 = 0),
         |pr AS (
         |  SELECT p_partkey, hj,
         |         ${duckHash60("CAST(p_partkey AS VARCHAR) || '#cms#' || CAST(hj AS VARCHAR)")}
         |           % 256 AS b
         |  FROM cand, (SELECT unnest(range(0, 4)) AS hj)
         |)
         |SELECT p_partkey, min(coalesce(c, 0)) AS est_count
         |FROM pr LEFT JOIN sk USING (hj, b)
         |GROUP BY p_partkey""".stripMargin,
    // bottom-k quantiles: the k hash-smallest DISTINCT (uniform, value)
    // pairs per group are the sample in both engines; quantile q reads
    // the sorted sample at floor(q*(m-1)) (lower-value convention)
    "x_sketch_quantiles" ->
      s"""WITH d AS (
         |  SELECT DISTINCT o_orderpriority, ${duckHashUniform("o_orderkey", "bkq")} AS u,
         |         CAST(o_totalprice AS DOUBLE) AS v
         |  FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
         |),
         |r AS (
         |  SELECT o_orderpriority, u, v,
         |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY u, v) AS rn
         |  FROM d
         |),
         |s AS (
         |  SELECT o_orderpriority, list_sort(list(v)) AS vs, count(*) AS m
         |  FROM r WHERE rn <= 256 GROUP BY o_orderpriority
         |)
         |SELECT o_orderpriority, CAST(q AS DOUBLE) AS q,
         |       round(vs[CAST(floor(CAST(q AS DOUBLE) * (m - 1)) AS INT) + 1], 6) AS est_value,
         |       CAST(m AS INT) AS n_sample
         |FROM s, (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)""".stripMargin,
    // heavy hitters are EXACT (the sketch only proposes candidates), so
    // the oracle is the definition itself; the threshold literal is cast
    // to DOUBLE so both engines compare against the identical IEEE value
    "x_sketch_heavy" ->
      """WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM e)
        |SELECT user_id, count(*) AS cnt,
        |       round(CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share
        |FROM e, n GROUP BY user_id, n
        |HAVING count(*) >= CAST(0.005 AS DOUBLE) * n""".stripMargin,
    // the fractional bound is written as (2.3 - 2), not 0.3, so both
    // engines compare against the identical IEEE double
    "x_sample_weighted" ->
      s"""WITH c AS (
         |  SELECT doc_id, g.copy FROM documents, generate_series(0, 2) g(copy)
         |)
         |SELECT doc_id, CAST(copy AS INT) AS copy FROM c
         |WHERE copy < 2
         |   OR ${duckHashUniform("doc_id", "weight#2")} < (2.3 - 2)""".stripMargin,
    // the cutpoint sample mirrors x_sketch_quantiles' bottom-k CTE (one
    // global group); tertile q literals are the operator's own doubles
    // via toString round-trip, CAST to DOUBLE because DuckDB otherwise
    // parses them as exact DECIMALs and floors q*(m-1) one ulp lower
    // than the IEEE multiply both engines must share; band = count of
    // cuts <= score
    "x_sample_band" -> {
      val q1 = s"CAST(${(1.0 / 3).toString} AS DOUBLE)"
      val q2 = s"CAST(${(2.0 / 3).toString} AS DOUBLE)"
      s"""WITH e AS (
         |  SELECT doc_id,
         |    round(list_aggregate(list_transform(range(1, length(text) + 1),
         |            i -> substring(text, i, 1)), 'entropy'), 6) AS score
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |),
         |d AS (
         |  SELECT DISTINCT ${duckHashUniform("doc_id", "band#cut")} AS u, score AS v
         |  FROM e
         |),
         |r AS (SELECT u, v, row_number() OVER (ORDER BY u, v) AS rn FROM d),
         |s AS (SELECT list_sort(list(v)) AS vs, count(*) AS m FROM r WHERE rn <= 64),
         |banded AS (
         |  SELECT e.doc_id, e.score,
         |    (CASE WHEN e.score >= s.vs[CAST(floor($q1 * (s.m - 1)) AS INT) + 1]
         |          THEN 1 ELSE 0 END +
         |     CASE WHEN e.score >= s.vs[CAST(floor($q2 * (s.m - 1)) AS INT) + 1]
         |          THEN 1 ELSE 0 END) AS band
         |  FROM e, s
         |)
         |SELECT doc_id, score, CAST(band AS INT) AS band FROM banded
         |WHERE ${duckHashUniform("doc_id", "band#keep")} <
         |      (CASE band WHEN 0 THEN 0.2 WHEN 1 THEN 0.5 ELSE 1.0 END)""".stripMargin
    },
    // the bounded-heap election is the implementation; the contract is
    // "the 10 smallest (hash-uniform, id) rows per source", which the
    // oracle states as a window rank
    "x_sample_cap" ->
      s"""WITH u AS (
         |  SELECT doc_id, source, ${duckHashUniform("doc_id", "cap")} AS u
         |  FROM documents WHERE doc_id IS NOT NULL
         |)
         |SELECT doc_id, source FROM u
         |QUALIFY row_number() OVER (PARTITION BY source ORDER BY u, doc_id) <= 10""".stripMargin,
    // the global hash order reproduces engine-for-engine: md5 of the
    // same salted string, row_number along it
    "x_sample_shuffle" ->
      """SELECT doc_id,
        |       CAST(row_number() OVER (
        |         ORDER BY md5(CAST(doc_id AS VARCHAR) || '#ord'), doc_id) - 1
        |         AS BIGINT) AS shuffle_pos
        |FROM documents""".stripMargin,
    // DuckDB reads the same on-disk JSONL fixture the Spark query ingests
    // with an equivalent explicit column spec — null literals, missing
    // nested keys, and array lengths must all agree
    "x_jsonl_scan" ->
      s"""SELECT id, title, score, CAST(len(tags) AS INT) AS n_tags,
         |       meta.lang AS lang, meta.tokens AS tokens
         |FROM read_json('$jsonlFixtureDir/docs.jsonl',
         |  format='newline_delimited',
         |  columns={id:'BIGINT', title:'VARCHAR', score:'DOUBLE',
         |           tags:'VARCHAR[]',
         |           meta:'STRUCT(lang VARCHAR, tokens BIGINT)'})""".stripMargin,
    // DuckDB reads the same on-disk fixture files the Spark query ingests;
    // the shared mediaFixtureDir value keeps the two paths in sync
    "x_media_binary" ->
      s"""SELECT regexp_extract(filename, '[^/]+$$') AS name,
         |       size AS byte_len,
         |       lower(hex(content)) AS content_hex
         |FROM read_blob('$mediaFixtureDir/*.bin')""".stripMargin,
    "x_media_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |       CAST(length(text) AS INT) AS "byteLen",
        |       md5(text) AS "contentHash",
        |       CAST(length(text) % 640 + 1 AS INT) AS width,
        |       CAST(length(text) % 480 + 1 AS INT) AS height,
        |       CASE WHEN length(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents""".stripMargin,
    "x_media_frames" ->
      """WITH fl AS (
        |  SELECT doc_id, text,
        |    list_filter(range(0, greatest(CAST(floor(length(text) / 16) AS INT), 1)),
        |      x -> x % 4 = 0) AS frames
        |  FROM documents
        |)
        |SELECT CAST(doc_id AS BIGINT) AS id,
        |       CAST(unnest(frames) AS INT) AS frame_no,
        |       md5(substring(text, unnest(frames) * 16 + 1, 16)) AS frame_hash
        |FROM fl""".stripMargin,
    "x_asof_purchase" ->
      """WITH l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |),
        |r AS (
        |  SELECT user_id, event_id AS p_event_id, CAST(ts AS TIMESTAMP) AS p_ts, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT l.user_id, l.event_id, l.ts, r.p_event_id, r.p_ts, r.p_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.p_ts""".stripMargin,
    "x_asof_tolerance" ->
      """WITH l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |),
        |r AS (
        |  SELECT user_id, event_id AS p_event_id, CAST(ts AS TIMESTAMP) AS p_ts, value AS p_value
        |  FROM events WHERE event_type = 'purchase'
        |),
        |m AS (
        |  SELECT l.user_id, l.event_id, l.ts, r.p_event_id, r.p_ts, r.p_value
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.p_ts
        |)
        |SELECT user_id, event_id, ts,
        |  CASE WHEN p_ts >= ts - INTERVAL 30 MINUTES THEN p_event_id END AS p_event_id,
        |  CASE WHEN p_ts >= ts - INTERVAL 30 MINUTES THEN p_ts END AS p_ts,
        |  CASE WHEN p_ts >= ts - INTERVAL 30 MINUTES THEN p_value END AS p_value
        |FROM m""".stripMargin,
    "x_media_phash" ->
      s"""$phashFpCte,
         |${duckHammingPairs(16, 2)}
         |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,
    "x_media_features" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |  CASE WHEN text IS NULL THEN NULL ELSE
        |    array_to_string(list_transform(range(0, 8), i ->
        |      CAST(CAST(floor((CAST(list_sum(list_transform(range(1, 5), j ->
        |        (strpos('0123456789abcdef',
        |           substring(md5(text || '#' || CAST(i AS VARCHAR)), j, 1)) - 1)
        |        * CAST(pow(16, 4 - j) AS BIGINT))) AS DOUBLE) / 65535.0 * 2 - 1)
        |        * 1e6) AS BIGINT) AS VARCHAR)), ',')
        |  END AS features_q
        |FROM documents""".stripMargin,
    "x_media_resize" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |       CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
        |       md5(text || '#64x64') AS payload_hex
        |FROM documents""".stripMargin,
    // sequential min-joins mirror funnelTimes step for step; left joins
    // keep users at the depth they reached, count(tN) skips nulls
    "x_events_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS et, CAST(ts AS TIMESTAMP) AS ts FROM events
        |),
        |s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM ev WHERE et = 'view' GROUP BY 1
        |),
        |s2 AS (
        |  SELECT s1.user_id, min(e.ts) AS t2
        |  FROM s1 LEFT JOIN ev e
        |    ON e.user_id = s1.user_id AND e.et = 'click' AND e.ts > s1.t1
        |  GROUP BY 1
        |),
        |s3 AS (
        |  SELECT s2.user_id, min(e.ts) AS t3
        |  FROM s2 LEFT JOIN ev e
        |    ON e.user_id = s2.user_id AND e.et = 'purchase' AND e.ts > s2.t2
        |  GROUP BY 1
        |)
        |SELECT 1 AS step, 'view' AS step_name, count(t1) AS n_users FROM s1
        |UNION ALL
        |SELECT 2 AS step, 'click' AS step_name, count(t2) AS n_users FROM s2
        |UNION ALL
        |SELECT 3 AS step, 'purchase' AS step_name, count(t3) AS n_users FROM s3""".stripMargin,
    // equi-join on user + the 5-minute window as a filter, grouped to
    // per-purchase counts — identical timestamp arithmetic in both engines
    "x_events_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_id AS target_id, CAST(ts AS TIMESTAMP) AS target_ts
        |  FROM events WHERE event_type = 'purchase'
        |),
        |s AS (
        |  SELECT user_id, event_id AS source_id, CAST(ts AS TIMESTAMP) AS source_ts
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT target_id, count(*) AS n_sources, min(source_ts) AS first_source_ts
        |FROM t JOIN s USING (user_id)
        |WHERE source_ts >= target_ts - INTERVAL 120 MINUTE AND source_ts <= target_ts
        |GROUP BY target_id""".stripMargin,
    "x_events_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "x_events_running" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |  CAST(row_number() OVER w AS INT) AS seq,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  CAST(floor(date_part('epoch', CAST(ts AS TIMESTAMP))) AS BIGINT) -
        |    CAST(floor(date_part('epoch', lag(CAST(ts AS TIMESTAMP), 1) OVER w)) AS BIGINT)
        |    AS gap_sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)))
        |       OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)""".stripMargin,
    "x_events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP), 1)
        |              OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) IS NULL
        |           OR CAST(floor(date_part('epoch', CAST(ts AS TIMESTAMP))) AS BIGINT) -
        |              CAST(floor(date_part('epoch', lag(CAST(ts AS TIMESTAMP), 1)
        |                OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC))) AS BIGINT)
        |              > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY 1, 2""".stripMargin,
    // native session_window twin: same split rule at FULL microsecond
    // precision (interval comparison, not floor-second epoch diff), no
    // session_no in the output (the engine tracks identity internally)
    "x_events_sessionize_native" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    coalesce(CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP), 1)
        |              OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
        |              > INTERVAL 1800 SECOND THEN 1 ELSE 0 END, 1) AS is_new
        |  FROM events
        |),
        |sess AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_no""".stripMargin,
    "x_events_top_types" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT hour, event_type, sum_value,
        |       CAST(row_number() OVER (PARTITION BY hour
        |              ORDER BY sum_value DESC, event_type ASC) AS INT) AS rank
        |FROM hourly QUALIFY rank <= 3""".stripMargin,
    "x_events_cohort" ->
      """WITH first_seen AS (
        |  SELECT user_id, CAST(min(CAST(ts AS TIMESTAMP)) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id
        |),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS active_day
        |  FROM events
        |),
        |cells AS (
        |  SELECT f.cohort_day,
        |         CAST(date_diff('day', f.cohort_day, a.active_day) AS INT) AS day_offset,
        |         count(DISTINCT a.user_id) AS n_active
        |  FROM activity a JOIN first_seen f USING (user_id)
        |  GROUP BY 1, 2
        |),
        |sizes AS (
        |  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
        |  FROM first_seen GROUP BY 1
        |)
        |SELECT c.cohort_day, c.day_offset, c.n_active, s.cohort_size,
        |       round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
        |FROM cells c JOIN sizes s USING (cohort_day)""".stripMargin,
    "x_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    "x_join_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "x_join_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,
    "x_reshape_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A'
        |           THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N'
        |           THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R'
        |           THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY 1""".stripMargin,
    "x_reshape_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric,
        |       CAST(p_retailprice AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part""".stripMargin,
    "x_reshape_crosstab" ->
      """SELECT source,
        |  count(CASE WHEN lang = 'de' THEN 1 END) AS n_de,
        |  count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
        |  count(CASE WHEN lang = 'es' THEN 1 END) AS n_es,
        |  count(CASE WHEN lang = 'fr' THEN 1 END) AS n_fr,
        |  count(CASE WHEN lang = 'zh' THEN 1 END) AS n_zh
        |FROM documents GROUP BY 1""".stripMargin,
    "x_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_l_returnflag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "x_agg_maintain" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_v,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6)
        |    AS avg_v,
        |  min(CAST(l_quantity AS DOUBLE)) AS min_v,
        |  max(CAST(l_quantity AS DOUBLE)) AS max_v
        |FROM lineitem GROUP BY 1""".stripMargin,
    "x_agg_maintain_retract" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_v,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 6)
        |    AS avg_v,
        |  min(CAST(l_quantity AS DOUBLE)) AS min_v,
        |  max(CAST(l_quantity AS DOUBLE)) AS max_v
        |FROM lineitem WHERE l_orderkey % 3 <> 2 GROUP BY 1""".stripMargin,
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
    "x_agg_rolling" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT o_orderpriority, day,
        |  CAST(rev AS DOUBLE) AS day_rev,
        |  CAST(sum(rev) OVER (PARTITION BY o_orderpriority ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll7_rev,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS INT) AS n_days
        |FROM daily""".stripMargin,
    // merged synopsis ≡ single pass (the merge law), so the oracle IS
    // x_sketch_quantiles' single-pass form on the same parameters
    "x_agg_maintain_quantile" ->
      s"""WITH d AS (
         |  SELECT DISTINCT o_orderpriority, ${duckHashUniform("o_orderkey", "bkq")} AS u,
         |         CAST(o_totalprice AS DOUBLE) AS v
         |  FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
         |),
         |r AS (
         |  SELECT o_orderpriority, u, v,
         |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY u, v) AS rn
         |  FROM d
         |),
         |s AS (
         |  SELECT o_orderpriority, list_sort(list(v)) AS vs, count(*) AS m
         |  FROM r WHERE rn <= 256 GROUP BY o_orderpriority
         |)
         |SELECT o_orderpriority, CAST(q AS DOUBLE) AS q,
         |       round(vs[CAST(floor(CAST(q AS DOUBLE) * (m - 1)) AS INT) + 1], 6) AS est_value,
         |       CAST(m AS INT) AS n_sample
         |FROM s, (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)""".stripMargin,
    // same estimator twin as x_sketch_distinct: the merged synopsis must
    // equal the single-pass KMV, so the oracle IS the single-pass form
    "x_agg_maintain_distinct" ->
      s"""WITH u AS (
         |  SELECT DISTINCT event_type, ${duckHashUniform("user_id", "kmv")} AS u
         |  FROM events
         |),
         |r AS (
         |  SELECT event_type, u,
         |         row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn,
         |         count(*) OVER (PARTITION BY event_type) AS nd
         |  FROM u
         |)
         |SELECT event_type,
         |       round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |             ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END, 6)
         |         AS est_distinct,
         |       CAST(least(max(nd), 64) AS INT) AS n_kept
         |FROM r GROUP BY event_type""".stripMargin,
    "x_fuzzy_join" ->
      """WITH clean AS (
        |  SELECT c_custkey AS cid,
        |         substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS k
        |  FROM customer
        |),
        |dirty AS (
        |  SELECT cid AS did,
        |         substr(k, 1, CAST(cid % 12 AS INT)) || 'x' ||
        |           substr(k, CAST(cid % 12 AS INT) + 2) AS k2
        |  FROM clean
        |)
        |SELECT c.cid AS left_id, d.did AS right_id,
        |       CAST(levenshtein(c.k, d.k2) AS INT) AS dist
        |FROM clean c CROSS JOIN dirty d
        |WHERE levenshtein(c.k, d.k2) <= 1""".stripMargin,
    "x_fuzzy_join_best" ->
      """WITH clean AS (
        |  SELECT c_custkey AS cid,
        |         substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS k
        |  FROM customer
        |),
        |dirty AS (
        |  SELECT cid AS did,
        |         substr(k, 1, CAST(cid % 12 AS INT)) || 'x' ||
        |           substr(k, CAST(cid % 12 AS INT) + 2) AS k2
        |  FROM clean
        |),
        |pairs AS (
        |  SELECT c.cid AS left_id, d.did AS right_id,
        |         CAST(levenshtein(c.k, d.k2) AS INT) AS dist
        |  FROM clean c CROSS JOIN dirty d
        |  WHERE levenshtein(c.k, d.k2) <= 1
        |)
        |SELECT left_id, right_id, dist FROM pairs
        |QUALIFY row_number() OVER (PARTITION BY right_id
        |                           ORDER BY dist, left_id) = 1""".stripMargin
  )

  /** DuckDB mirror of TextAnalysis.stopwordHits over token list `w`:
    * generated from the SAME stopwords val the Spark expressions use. */
  private def duckLangHits(lang: String): String = {
    val words = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(w, t -> list_contains([$words], t)))"
  }

  /** DuckDB mirror of TextAnalysis.langId's argmax (expects c_<lang>
    * count columns): fixed check order, strict > 0, 'und' fallback. */
  private def duckLangCase: String = {
    val best = s"greatest(${TextAnalysis.langOrder.map(l => s"c_$l").mkString(", ")})"
    TextAnalysis.langOrder
      .map(l => s"WHEN c_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  /** x_text_lang oracle: mirrors TextAnalysis.languageId. */
  private def langIdOracle: String = {
    val hitCols = TextAnalysis.langOrder
      .map(l => s"${duckLangHits(l)} AS c_$l").mkString(", ")
    val best = s"greatest(${TextAnalysis.langOrder.map(l => s"c_$l").mkString(", ")})"
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS w
       |  FROM documents
       |),
       |feat AS (
       |  SELECT doc_id, len(w) AS n_tokens,
       |    $hitCols
       |  FROM toks
       |)
       |SELECT doc_id,
       |  $duckLangCase AS lang,
       |  round(CAST($best AS DOUBLE) / greatest(n_tokens, 1), 6) AS confidence
       |FROM feat""".stripMargin
  }

  /** x_text_profile oracle: mirrors every TextAnalysis expression. */
  private def textProfileOracle: String = {
    def hits(lang: String): String = duckLangHits(lang)
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |         list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0) AS w
       |  FROM documents
       |),
       |feat AS (
       |  SELECT doc_id, text, w,
       |    len(w) AS n_tokens,
       |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_bpeish,
       |    ${hits("en")} AS c_en, ${hits("de")} AS c_de,
       |    ${hits("fr")} AS c_fr, ${hits("es")} AS c_es,
       |    length(text) - length(regexp_replace(text, '[^\\p{L}\\p{N} \\t\\n\\r]', '', 'g')) AS n_punct
       |  FROM toks
       |),
       |scored AS (
       |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, CAST(n_bpeish AS INT) AS n_bpeish,
       |    greatest(c_en, c_de, c_fr, c_es) AS best,
       |    CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'en'
       |         WHEN c_de = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'de'
       |         WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'fr'
       |         WHEN c_es = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'es'
       |         ELSE 'und' END AS lang_id,
       |    round(CAST(c_en AS DOUBLE) / greatest(n_tokens, 1), 6) AS stopword_ratio,
       |    round(CAST(n_punct AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
       |    round(CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
       |          / greatest(n_tokens, 1), 6) AS mean_token_len,
       |    round((least(CAST(length(text) AS DOUBLE) / 500, 1.0)
       |           + least(round(CAST(c_en AS DOUBLE) / greatest(n_tokens, 1), 6) * 5, 1.0)
       |           + (1.0 - least(round(CAST(n_punct AS DOUBLE) / greatest(length(text), 1), 6) * 5, 1.0)))
       |          / 3, 6) AS quality,
       |    list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
       |      i -> md5(substring(text, i, 8)))) AS fingerprint
       |  FROM feat
       |)
       |SELECT doc_id, n_tokens, n_bpeish, lang_id, stopword_ratio, punct_ratio,
       |       mean_token_len, quality, fingerprint
       |FROM scored""".stripMargin
  }
}
