package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-memory sketches for corpus-scale statistics.
  *
  * North-star extension: dataset cards and curation monitoring need
  * per-group cardinalities over columns whose exact distinct would be a
  * full shuffle of the column. A sketch caps the per-group state, keeps
  * the aggregation map-side combinable, and is deterministic here (hash
  * based, no RNG) so the DuckDB oracle can reproduce it bit-for-bit —
  * unlike HLL-based `approx_count_distinct`, whose registers differ
  * across engines.
  */
object Sketches {

  /** Approximate distinct count per group via k-minimum-values (KMV;
    * Beyer et al. SIGMOD'07). Values hash to uniforms in [0,1); the k-th
    * smallest distinct uniform U(k) estimates the cardinality as
    * (k-1)/U(k) (the unbiased form), exact when fewer than k distinct
    * values exist. Expected relative error is ~1/sqrt(k-2).
    *
    * Scale shape: one narrow shuffle of at-most-k-double synopses per
    * group (map-side partials pre-trim), the value payload never moves,
    * and synopses for different partitions/runs union losslessly — the
    * mergeability that lets per-shard sketches roll up to a corpus
    * total without re-reading shards.
    *
    * @return groupCols + (est_distinct rounded to 6, n_kept = min(k, d))
    */
  def approxDistinctKmv(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 64,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val kmv = udaf(graft.functions.KmvAggregator(k))
    val u = Sampling.hashUniform(col(valueCol), salt)
    // a NULL value hashes to a NULL uniform, which the aggregator's
    // non-nullable Double input turns into a job failure — NULLs are
    // not distinct values, drop them (the HLL/quantile paths agree)
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ u.as("__u")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__u")).as("__mins"))
      .withColumn("n_kept", size(col("__mins")))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("__mins"), k)), 6))
      .select((groupCols.map(col) :+ col("est_distinct") :+ col("n_kept")): _*)
  }

  /** KMV SYNOPSIS of one shard/batch of a corpus: the ≤ k smallest
    * DISTINCT hash-uniforms of `valueCol`, one row each — the mergeable,
    * persistable form of [[approxDistinctKmv]]'s state. A production
    * store keeps one synopsis per ingest batch (or partition) and
    * answers "distinct so far" by [[kmvMerge]] + [[kmvEstimate]] without
    * re-reading ANY shard — the roll-up pattern every batch-cost
    * incremental statistic here follows (Bloom synopsis, band index).
    * Bounded state: the aggregation is map-side combined at ≤ 4k doubles
    * per partial; the output is ≤ k rows regardless of shard size. */
  def kmvSynopsis(
      df: DataFrame,
      valueCol: String,
      k: Int = 64,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val kmv = udaf(graft.functions.KmvAggregator(k))
    df.filter(col(valueCol).isNotNull)
      .select(Sampling.hashUniform(col(valueCol), salt).as("__u"))
      .agg(kmv(col("__u")).as("__mins"))
      .select(explode(col("__mins")).as("u"))
  }

  /** EXACT merge of KMV synopses: the k smallest distinct uniforms of
    * the union. Lossless by the synopsis invariant — any uniform among
    * the k global smallest is among its own shard's k smallest, so the
    * merge of per-shard synopses carries every value the whole-corpus
    * synopsis would ([[kmvEstimate]] over the merge therefore EQUALS the
    * fresh whole-corpus estimate, not approximates it — the property the
    * oracle pins). Input frames are ≤ k rows each; nothing here scales
    * with the data. */
  def kmvMerge(synopses: Seq[DataFrame], k: Int = 64): DataFrame = {
    require(synopses.nonEmpty, "need at least one synopsis")
    require(k >= 2, "k must be at least 2")
    val kmv = udaf(graft.functions.KmvAggregator(k))
    synopses.reduce(_ unionByName _)
      .agg(kmv(col("u")).as("__mins"))
      .select(explode(col("__mins")).as("u"))
  }

  /** Distinct-count estimate from a (possibly merged) synopsis — the
    * same (k-1)/U(k) estimator [[approxDistinctKmv]] applies inline,
    * exact below k. One row: (est_distinct rounded to 6, n_kept). */
  def kmvEstimate(synopsis: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    synopsis.agg(sort_array(collect_list(col("u"))).as("__mins"))
      .withColumn("n_kept", least(size(col("__mins")), lit(k)))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("__mins"), k)), 6))
      .select(col("est_distinct"), col("n_kept"))
  }

  /** Bucket index of `item` under the sketch's j-th hash row: a 60-bit
    * md5 prefix of s"$item#$salt#$j" reduced mod `width` — deterministic
    * and engine-reproducible (the DuckDB oracle mirrors it digit for
    * digit). */
  private def cmsBucket(item: org.apache.spark.sql.Column, j: Int, width: Int, salt: String) =
    pmod(conv(md5(concat(item.cast("string"), lit(s"#$salt#$j"))).substr(1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-Min sketch of an item column (Cormode & Muthukrishnan,
    * J. Algorithms'05): `depth` hash rows × `width` buckets of counts.
    * Each occurrence increments one bucket per row; an item's estimate is
    * the MIN of its `depth` bucket counts — never an under-count, and an
    * over-count only when the item collides in every row.
    *
    * Scale shape: the corpus collapses to at most depth × width cells in
    * ONE map-side-combinable aggregation — a shuffle of bounded size
    * regardless of item cardinality, where an exact per-item count would
    * shuffle the full item column. Cells are plain sums, so sketches over
    * shards/batches merge by adding cells — the mergeability that lets
    * per-ingest sketches roll up to corpus totals without re-reading
    * anything. Null items are excluded (they hash to null).
    *
    * @return (j, b, c): hash-row index, bucket, count — only occupied
    *         cells; absent cells are zero
    */
  def cmsSketch(
      df: DataFrame,
      itemCol: String,
      width: Int = 1024,
      depth: Int = 4,
      salt: String = "cms"): DataFrame = {
    require(width >= 2, "width must be at least 2")
    require(depth >= 1, "depth must be at least 1")
    val buckets = array((0 until depth).map(j => cmsBucket(col(itemCol), j, width, salt)): _*)
    df.filter(col(itemCol).isNotNull)
      .select(posexplode(buckets).as(Seq("j", "b")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
  }

  /** Estimated occurrence counts for a candidate item set against a
    * [[cmsSketch]] of the corpus. The candidate side is tiny (a probe
    * list) and the sketch is bounded, so the lookup join never touches
    * the corpus — the standard heavy-hitter monitoring shape: sketch the
    * stream once, probe it for any watchlist after the fact.
    *
    * @return one row per distinct non-null candidate: (candidateCol,
    *         est_count) with est_count >= the true count
    */
  def cmsFrequencies(
      corpus: DataFrame,
      itemCol: String,
      candidates: DataFrame,
      candidateCol: String,
      width: Int = 1024,
      depth: Int = 4,
      salt: String = "cms"): DataFrame =
    cmsProbe(cmsSketch(corpus, itemCol, width, depth, salt),
      candidates, candidateCol, width, depth, salt)

  /** Probe an ALREADY-BUILT (j, b, c) sketch — fresh from [[cmsSketch]],
    * read back from a store, or rolled up by [[cmsMerge]] — for a
    * candidate set's estimated counts. Must be called with the width/
    * depth/salt the sketch was built with (the bucket derivation is the
    * contract between build and probe). */
  def cmsProbe(
      sketch: DataFrame,
      candidates: DataFrame,
      candidateCol: String,
      width: Int = 1024,
      depth: Int = 4,
      salt: String = "cms"): DataFrame = {
    val probeBuckets = array((0 until depth).map(j => cmsBucket(col(candidateCol), j, width, salt)): _*)
    candidates.select(col(candidateCol)).filter(col(candidateCol).isNotNull).distinct()
      .select(col(candidateCol), posexplode(probeBuckets).as(Seq("j", "b")))
      .join(sketch, Seq("j", "b"), "left_outer")
      .groupBy(candidateCol)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
  }

  /** EXACT merge of Count-Min sketches over disjoint shards: cell-wise
    * sum. Counts are linear in the rows, so the merged cells EQUAL the
    * cells a fresh sketch over the union would hold — per-batch sketches
    * in a store roll up to the corpus sketch without re-reading any
    * batch. Bounded: each input is ≤ depth × width rows. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _).groupBy("j", "b").agg(sum("c").as("c"))
  }

  /** EXACT heavy hitters — every item whose share of the non-null rows is
    * at least `minShare`, with its exact count — via the classic two-pass
    * shape: a bounded Misra-Gries summary proposes a candidate superset
    * (pass 1), an exact recount of only the candidates confirms (pass 2).
    *
    * Pass 1 is a single map-side-combinable aggregation whose state never
    * exceeds ~4×capacity entries per partial ([[graft.functions.MisraGriesAggregator]]);
    * the MG error bound n/(capacity+1) < n·minShare guarantees no true
    * heavy hitter is missing from the summary, so pass 2's exactness does
    * NOT depend on sketch internals. Pass 2 broadcast-joins the ≤ capacity
    * candidates against the corpus and recounts — heavy-hitter rows are
    * many, but the map-side combine collapses them to ≤ capacity groups
    * before the exchange, so both passes shuffle bounded state regardless
    * of corpus size or item cardinality. The corpus is read twice (the
    * price of exactness; a single-pass user accepts [[cmsFrequencies]]'s
    * over-count instead).
    *
    * The threshold predicate `cnt >= minShare · n` is evaluated in IEEE
    * double on both engines (the oracle casts the literal to DOUBLE), so
    * boundary behavior is identical even when minShare has no exact
    * binary representation.
    *
    * @param capacity override the MG summary size; 0 (default) derives
    *                 max(64, ceil(2/minShare)) — a 2× safety factor over
    *                 the minimum the superset guarantee needs
    * @return (itemCol — original type, cnt, share rounded to 6), one row
    *         per confirmed heavy hitter
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      minShare: Double = 0.001,
      capacity: Int = 0): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0, "minShare must be in (0, 1]")
    val cap = if (capacity > 0) capacity else math.max(64, math.ceil(2.0 / minShare).toInt)
    require((cap + 1).toDouble > 1.0 / minShare,
      s"capacity $cap cannot guarantee the candidate superset at minShare $minShare")
    val mg = udaf(graft.functions.MisraGriesAggregator(cap))
    val rows = df.filter(col(itemCol).isNotNull)
    val summary = rows.agg(
      mg(col(itemCol).cast("string")).as("__mg"),
      count(lit(1)).as("__n"))
    val cands = summary.select(explode(map_keys(col("__mg"))).as("__cand"), col("__n"))
    rows.join(broadcast(cands), col(itemCol).cast("string") === col("__cand"))
      .groupBy(col(itemCol), col("__n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minShare) * col("__n"))
      .select(col(itemCol), col("cnt"), round(col("cnt") / col("__n"), 6).as("share"))
  }

  /** Robust (median/MAD) outlier scoring — anomaly detection that a
    * skewed corpus can't fool the way it fools mean/stddev z-scores:
    * the median and the median absolute deviation both come from a
    * bottom-k hash sample of the rows (same estimator as
    * [[approxQuantilesBottomK]], lower-value convention), so one
    * aggregation pass produces a two-double model that broadcasts back
    * for a stateless per-row score. Rows with
    * `|v − median| / MAD > threshold` survive, with the score attached.
    *
    * Scale shape: the corpus crosses no wide exchange — at most k
    * (8+8)-byte pairs reach one reducer, one 2-double row broadcasts
    * back, and scoring is a per-row projection. A zero MAD (constant
    * sample) yields no outliers rather than dividing by zero: a column
    * whose sample doesn't vary gives the estimator no scale to judge
    * deviation against.
    *
    * @return input rows with `score` appended, filtered to outliers
    */
  def robustOutliers(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      threshold: Double = 3.0,
      k: Int = 256,
      salt: String = "mad"): DataFrame = {
    require(threshold > 0.0, "threshold must be positive")
    val bks = udaf(graft.functions.BottomKSampleAggregator(k))
    val clean = df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
    val medIdx = (m: org.apache.spark.sql.Column) => (floor(lit(0.5) * (m - 1)) + 1).cast("int")
    val model = clean
      .select(Sampling.hashUniform(col(idCol), salt).as("__u"),
        col(valueCol).cast("double").as("__v"))
      .agg(bks(col("__u"), col("__v")).as("__vs"))
      .select(col("__vs"), element_at(col("__vs"), medIdx(size(col("__vs")))).as("__med"))
      .select(col("__med"),
        element_at(array_sort(transform(col("__vs"), v => abs(v - col("__med")))),
          medIdx(size(col("__vs")))).as("__mad"))
    clean.crossJoin(broadcast(model))
      .withColumn("score",
        when(col("__mad") > 0.0,
          round(abs(col(valueCol).cast("double") - col("__med")) / col("__mad"), 6)))
      .filter(col("score") > threshold)
      .drop("__med", "__mad")
  }

  /** Approximate per-group quantiles from a bottom-k hash sample (Cohen
    * & Kaplan, PODC'07): the k rows with the smallest md5(id) uniforms
    * ARE a uniform k-row sample of the group — deterministic, stable
    * under repartitioning, and mergeable (bottom-k of a union = trimmed
    * union of bottom-k sets, so map-side partials apply and per-shard
    * sketches roll up). Quantile q is read from the sorted sample at
    * index floor(q·(m−1)) (lower-value convention, m = sample size) —
    * exact when the group has at most k rows, ~1/sqrt(k) rank error
    * beyond. The value payload never shuffles: at most k (8+8)-byte
    * pairs per group cross the exchange.
    *
    * Rows with a null id or null value are excluded (a null cannot be
    * hashed or ranked).
    *
    * @param qs quantiles in [0, 1], one output row per group per q
    * @return groupCols + (q, est_value rounded to 6, n_sample)
    */
  def approxQuantilesBottomK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      qs: Seq[Double],
      k: Int = 256,
      salt: String = "bkq"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "qs must be non-empty quantiles in [0, 1]")
    val bks = udaf(graft.functions.BottomKSampleAggregator(k))
    val u = Sampling.hashUniform(col(idCol), salt)
    val grouped = df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ u.as("__u") :+ col(valueCol).cast("double").as("__v")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bks(col("__u"), col("__v")).as("__vs"))
    val m = size(col("__vs"))
    grouped
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("est_value",
        round(element_at(col("__vs"), (floor(col("q") * (m - 1)) + 1).cast("int")), 6))
      .withColumn("n_sample", m)
      .select((groupCols.map(col) :+ col("q") :+ col("est_value") :+ col("n_sample")): _*)
  }

  /** QUANTILE SYNOPSIS of one shard/batch: the ≤ k hash-smallest DISTINCT
    * (uniform, value) pairs of the slice, one row each — the mergeable,
    * persistable form of [[approxQuantilesBottomK]]'s state and the
    * quantile member of the KMV/CMS/HLL synopsis-merge-estimate family.
    * A production store keeps one synopsis per ingest batch and answers
    * "token-length distribution so far" by [[quantileMerge]] +
    * [[quantileEstimate]] without re-reading ANY shard.
    *
    * Why bottom-k and not KLL or GK: GK summaries have no merge at all;
    * KLL merges, but its compaction is ORDER-SENSITIVE — under Spark's
    * nondeterministic partial-aggregate merge order the same data can
    * yield different registers run to run, which breaks both this
    * library's repartition-stability contract and any relational oracle
    * replay. The bottom-k sample's merge is a SEMILATTICE (the k
    * hash-smallest pairs of a union), so it is order-free, idempotent,
    * and lossless — the property every sketch here carries — at the
    * price of more state per unit of accuracy: by the DKW inequality a
    * k-row uniform sample bounds EVERY quantile's rank error at once,
    * P(sup error > ε) ≤ 2·exp(−2kε²), i.e. ε = sqrt(ln(2/δ) / (2k)) —
    * k = 256 gives ~8.5% rank error at 95% confidence, k = 4096 ~2%
    * (a KLL of equal size would give ~10× less; size k to the need).
    * Exact when the slice has ≤ k distinct (uniform, value) pairs. */
  def quantileSynopsis(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      k: Int = 256,
      salt: String = "bkq"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val bkp = udaf(graft.functions.BottomKPairSampleAggregator(k))
    df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(Sampling.hashUniform(col(idCol), salt).as("__u"),
        col(valueCol).cast("double").as("__v"))
      .agg(bkp(col("__u"), col("__v")).as("__s"))
      .select(explode(col("__s")).as("p"))
      .select(col("p._1").as("u"), col("p._2").as("v"))
  }

  /** EXACT merge of quantile synopses: the k hash-smallest distinct
    * (uniform, value) pairs of the union. Lossless by the same synopsis
    * invariant as [[kmvMerge]] — any pair among the k global smallest is
    * among its own shard's k smallest — so [[quantileEstimate]] over the
    * merge EQUALS the fresh whole-corpus estimate (the law the
    * `x_sketch_quantile_merged` oracle pins). Inputs are ≤ k rows each;
    * nothing here scales with the data. */
  def quantileMerge(synopses: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(synopses.nonEmpty, "need at least one synopsis")
    require(k >= 1, "k must be at least 1")
    val bkp = udaf(graft.functions.BottomKPairSampleAggregator(k))
    synopses.reduce(_ unionByName _)
      .agg(bkp(col("u"), col("v")).as("__s"))
      .select(explode(col("__s")).as("p"))
      .select(col("p._1").as("u"), col("p._2").as("v"))
  }

  /** Quantile estimates from a (possibly merged) synopsis — the same
    * lower-value-convention read as [[approxQuantilesBottomK]]: quantile
    * q is the value-sorted sample at index floor(q·(m−1)). Re-trims to
    * the k hash-smallest DISTINCT pairs first (the same `.distinct` the
    * aggregator's own trim applies), so feeding a merged-but-untrimmed
    * union is safe even when the synopses OVERLAP — duplicate (u, v)
    * pairs would otherwise occupy sample slots inside the k window and
    * bias the estimate. An empty synopsis (corpus of only null ids or
    * values) yields null est_value rows, matching the exact report's
    * degraded-input behavior. One row per q: (q, est_value rounded to
    * 6, n_sample). */
  def quantileEstimate(
      synopsis: DataFrame,
      qs: Seq[Double],
      k: Int = 256): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "qs must be non-empty quantiles in [0, 1]")
    val trimmed =
      slice(array_sort(array_distinct(collect_list(struct(col("u"), col("v"))))), 1, k)
    synopsis
      .agg(trimmed.as("__ps"))
      .select(array_sort(transform(col("__ps"), p => p.getField("v"))).as("__vs"))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("est_value",
        when(size(col("__vs")) === 0, lit(null).cast("double"))
          .otherwise(round(element_at(col("__vs"),
            (floor(col("q") * (size(col("__vs")) - 1)) + 1).cast("int")), 6)))
      .withColumn("n_sample", size(col("__vs")))
      .select(col("q"), col("est_value"), col("n_sample"))
  }

  // ---- HyperLogLog with deterministic registers ----

  /** HLL register synopsis per group (Flajolet, Fusy, Gandouet &
    * Meunier, AofA'07): each value's 60-bit md5 hash splits into a
    * bucket (`hash mod 2^p`, low bits) and a value part (`hash div
    * 2^p`, the remaining 60−p bits); register b keeps the MAX of
    * rho = (number of leading zero bits of the value part) + 1. The
    * engine's own `approx_count_distinct` is also HLL but its registers
    * are engine-private — this one is md5-derived and mirrored digit
    * for digit by the DuckDB oracle, the same determinism contract as
    * the KMV/CMS sketches above. rho is computed by STRING length of
    * the binary form (`bin`), not floating log2: `length(bin(v))` is
    * exact where `floor(log2(v))` can round across the power-of-two
    * boundary at the 48-bit widths involved.
    *
    * Unlike KMV (k doubles per group, error ~1/sqrt(k−2)), HLL state is
    * ≤ 2^p BYTES-worth of small ints per group for ~1.04/sqrt(2^p)
    * error — the standard choice when groups are many and the synopsis
    * itself must stay small. Missing buckets ARE state (register 0);
    * they are represented implicitly (absent rows) and reconstructed by
    * [[hllEstimate]], so a group's synopsis is at most 2^p rows and
    * map-side combines like every sketch here.
    *
    * @return groupCols + (b, m_reg, hll_p) — `hll_p` is the geometry the
    * synopsis was built with, carried as data so [[hllEstimate]] can
    * verify the caller's p against it instead of inferring geometry from
    * register ranges (which only catches the high-p-synopsis direction:
    * a p=4 synopsis estimated at p=8 passes every per-register bound yet
    * treats 240 never-existing buckets as empty) */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 8,
      salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    require(!groupCols.exists(Set("b", "m_reg", "hll_p")),
      "groupCols must not collide with the synopsis columns (b, m_reg, hll_p)")
    val m = 1L << p
    val w = 60 - p
    val h = conv(md5(concat(col(valueCol).cast("string"), lit(s"#$salt"))).substr(1, 15), 16, 10)
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ h.as("__h")): _*)
      .withColumn("b", pmod(col("__h"), lit(m)).cast("int"))
      .withColumn("__v", expr(s"__h div $m"))
      .withColumn("__rho",
        when(col("__v") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(col("__v")))).cast("int"))
      .groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(max(col("__rho")).as("m_reg"))
      .withColumn("hll_p", lit(p))
  }

  /** EXACT merge of HLL register synopses: per-(group, bucket) max.
    * Register max is an idempotent, commutative semilattice merge, so
    * per-shard synopses roll up to EXACTLY the whole-corpus registers —
    * [[hllEstimate]] over the merge equals the fresh estimate, the same
    * lossless-roll-up law the KMV and CMS merges carry (and what the
    * `x_sketch_hll_merged` oracle pins by reusing the fresh statement). */
  def hllMerge(synopses: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(synopses.nonEmpty, "need at least one synopsis")
    // carry the geometry through and REFUSE to blend geometries: a
    // max(hll_p) would relabel a mixed-p bucket as the larger p and the
    // downstream [[hllEstimate]] guard would pass on every row — the
    // per-bucket min/max equality check turns the overwhelmingly likely
    // bucket collision between two geometries (p=4's 16 buckets are a
    // subset of any larger p's) into an in-plan error instead
    synopses.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("b")): _*)
      .agg(max(col("m_reg")).as("m_reg"),
        min(col("hll_p")).as("__pmin"), max(col("hll_p")).as("__pmax"))
      .withColumn("hll_p",
        when(col("__pmin") === col("__pmax"), col("__pmax"))
          .otherwise(raise_error(concat(
            lit("hllMerge: synopses built with different p (min="),
            col("__pmin"), lit(", max="), col("__pmax"),
            lit(") cannot merge — their register geometries are incompatible")))))
      .drop("__pmin", "__pmax")
  }

  /** The paper's bias-correction constant α_m (small-m table, then the
    * asymptotic form). */
  def hllAlpha(m: Int): Double =
    if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
    else 0.7213 / (1.0 + 1.079 / m)

  /** α_m · m² · 2^(maxRho) — the numerator of the FIXED-POINT harmonic
    * mean, computed once Scala-side so the Spark plan and the DuckDB
    * oracle both parse the identical double literal. */
  def hllNumerator(p: Int): Double = {
    val m = 1 << p
    hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, 61 - p)
  }

  /** Cardinality estimate from a register synopsis. The harmonic-mean
    * sum Σ 2^(−M_b) is accumulated in FIXED POINT — each term scaled to
    * the integer 2^(maxRho − M_b), absent buckets contributing the
    * register-0 term — because dyadic terms summed in floating point
    * are association-order-dependent (the estimate must hash-match the
    * oracle no matter how partial aggregates merged); one double
    * division at the end is order-free. Small-range correction (linear
    * counting m·ln(m/V) when the raw estimate ≤ 2.5m and zero registers
    * exist) per the original paper.
    *
    * @return groupCols + (est_distinct rounded to 6, n_zero_regs) */
  def hllEstimate(synopsis: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val maxRho = 61 - p
    val num = hllNumerator(p)
    // Guard against a p that doesn't match the synopsis' geometry. The
    // synopsis carries its own p ([[hllRegisters]] bakes it in as
    // `hll_p`), and equality is checked per ROW inside the plan so
    // laziness is preserved — range checks on (b, m_reg) alone only
    // catch the high-p-synopsis direction (a p=4 synopsis estimated at
    // p=8 has every b < 16 < 256 and m_reg almost surely ≤ 53, yet the
    // estimate would count 240 phantom empty buckets); carried identity
    // catches both directions. The belt-and-braces range check stays for
    // tampered/corrupted register values.
    // Migration path for register synopses persisted before hll_p existed:
    // absent column = "assume the caller's p" (exactly the pre-hll_p
    // contract those stores were built under), still subject to the range
    // check below. A standing store can be upgraded once with
    // `withColumn("hll_p", lit(p))` at its next rewrite; any synopsis
    // built by the current hllRegisters/hllMerge carries the real value.
    val carried =
      if (synopsis.columns.contains("hll_p")) synopsis
      else synopsis.withColumn("hll_p", lit(p))
    val checked = carried.withColumn("__mreg",
      when(col("hll_p") === p &&
          col("b").between(0, m - 1) && col("m_reg").between(1, maxRho),
        col("m_reg"))
        .otherwise(raise_error(concat(
          lit(s"hll synopsis inconsistent with p=$p "
            + s"(expect hll_p = $p, 0 <= b < $m, 1 <= m_reg <= $maxRho): hll_p="),
          col("hll_p"), lit(", b="), col("b"), lit(", m_reg="), col("m_reg")))))
    val grouped =
      if (groupCols.isEmpty) checked.groupBy()
      else checked.groupBy(groupCols.map(col): _*)
    grouped
      .agg(
        count(lit(1)).as("__np"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRho - __mreg)")).as("__sp"))
      .withColumn("__S",
        col("__sp") + (lit(m.toLong) - col("__np")) * lit(1L << maxRho))
      .withColumn("n_zero_regs", (lit(m) - col("__np")).cast("int"))
      .withColumn("__raw", lit(num) / col("__S").cast("double"))
      .withColumn("est_distinct",
        round(
          when(col("__raw") <= lit(2.5 * m) && col("n_zero_regs") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs").cast("double")))
            .otherwise(col("__raw")), 6))
      .select((groupCols.map(col) :+ col("est_distinct") :+ col("n_zero_regs")): _*)
  }

  /** Inline per-group HLL distinct estimate — registers + estimate in
    * one statement (the [[approxDistinctKmv]] shape, HLL flavor). */
  def approxDistinctHll(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 8,
      salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p, salt), groupCols, p)
}
