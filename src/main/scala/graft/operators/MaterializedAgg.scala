package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates.
  *
  * North-star extension: a 100 TB corpus's dataset card (per-group row
  * counts, sums, extrema) cannot be recomputed from scratch per ingest
  * batch — the read alone is the cost ceiling. The classical answer
  * (Gray et al., "Data Cube", ICDE'96) is to persist PARTIAL aggregate
  * state and maintain it with batch-cost merges, splitting measures by
  * algebraic class:
  *
  *  - distributive/algebraic (count, sum, and avg = sum/count) merge AND
  *    retract: an append is a `+state`, a delete is a `-state` of just
  *    the deleted rows — maintenance cost tracks the DELTA, never the
  *    corpus;
  *  - extrema (min/max) merge but do NOT retract (deleting the current
  *    minimum says nothing about the next one); under deletes they are
  *    maintained by recomputing ONLY the groups the delete touched
  *    ([[repairGroups]]), so even the holistic part pays
  *    |touched groups' rows|, not |corpus|.
  *
  * The state is a plain DataFrame (groupCols + n, sum, min, max), so it
  * persists through the ordinary store layer — generation commits,
  * retention, and as-of reads are inherited rather than reimplemented.
  * Every function here is a single hash-aggregate shuffle on the group
  * key with map-side combine; no collect, no window over the corpus.
  */
object MaterializedAgg {

  val StateCols: Seq[String] = Seq("n_rows", "sum_v", "min_v", "max_v")

  /** Partial aggregate state of one batch: groupCols + (n_rows, sum_v,
    * min_v, max_v) with sum_v carried as DECIMAL(28,2) — decimal partial
    * sums merge associatively regardless of merge order, where a double
    * sum would drift between merge shapes (the state must hash-match the
    * recompute no matter how many batches it passed through). */
  def partialState(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(28,2)")).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** Merge partial states (any association order). Extrema stay correct
    * because min/min and max/max are idempotent semilattice merges;
    * counts/sums add. States whose extrema were invalidated by a
    * retraction carry NULL there, and NULL-skipping min/max keeps the
    * merged bound honest for the still-valid parts. */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** The retraction (negative state) of a deleted batch: merge this with
    * a standing state to delete the batch's contribution from the
    * algebraic measures. Extrema are nulled — a retraction cannot
    * witness the next-best extremum — so downstream [[finalizeView]]
    * reports NULL min/max for touched groups until [[repairGroups]]
    * recomputes them from survivors. */
  def retractState(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    partialState(df, groupCols, valueCol)
      .withColumn("n_rows", -col("n_rows"))
      .withColumn("sum_v", -col("sum_v"))
      .withColumn("min_v", lit(null).cast("double"))
      .withColumn("max_v", lit(null).cast("double"))

  /** Recompute extrema for exactly the groups present in `touched`,
    * reading only `survivors` rows of those groups (one semi-join + one
    * grouped agg over the touched slice). Returns the state with
    * repaired min/max and untouched groups passed through unchanged. */
  def repairGroups(
      state: DataFrame,
      survivors: DataFrame,
      touched: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val keys = touched.select(groupCols.map(col): _*).distinct()
    val repaired = partialState(
      survivors.join(keys, groupCols, "left_semi"), groupCols, valueCol)
      .select((groupCols.map(col) :+ col("min_v").as("__rmin") :+ col("max_v").as("__rmax")): _*)
    val flagged = keys.withColumn("__touched", lit(true))
    state
      .join(flagged, groupCols, "left_outer")
      .join(repaired, groupCols, "left_outer")
      .withColumn("min_v", when(col("__touched"), col("__rmin")).otherwise(col("min_v")))
      .withColumn("max_v", when(col("__touched"), col("__rmax")).otherwise(col("max_v")))
      .drop("__touched", "__rmin", "__rmax")
      // a group whose every row was retracted merges to n_rows = 0 and a
      // left-anti miss in the repair: it no longer exists
      .filter(col("n_rows") > 0)
  }

  /** User-facing view of a state: n_rows, sum (double), avg = sum/n
    * rounded to 6, min, max. Groups fully retracted (n_rows = 0) are
    * dropped — they have no rows, so a recompute would not emit them. */
  def finalizeView(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state
      .filter(col("n_rows") > 0)
      .select((groupCols.map(col) :+
        col("n_rows") :+
        col("sum_v").cast("double").as("sum_v") :+
        round(col("sum_v").cast("double") / col("n_rows"), 6).as("avg_v") :+
        col("min_v") :+
        col("max_v")): _*)

  /** Per-batch KMV distinct synopsis per group: the ≤ `k` smallest
    * DISTINCT hash-uniforms of `valueCol` in each group — the mergeable
    * form of a per-group COUNT(DISTINCT) for the maintained state
    * (Beyer et al. SIGMOD'07, the same estimator as
    * [[Sketches.approxDistinctKmv]] but persisted per batch). Distinct
    * is HOLISTIC: like the extrema it merges ([[mergeDistinct]]) but
    * does not retract — under deletes, recompute touched groups from
    * survivors the [[repairGroups]] way. */
  def partialDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 64,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val kmv = udaf(graft.functions.KmvAggregator(k))
    // NULL values are not distinct values; their NULL uniform would kill
    // the aggregator's non-nullable input (the HLL measure agrees)
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+
        Sampling.hashUniform(col(valueCol), salt).as("__u")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("__u")).as("mins_v"))
  }

  /** Merge per-batch distinct synopses (any association order): the k
    * smallest of the union of distinct mins is the synopsis the single
    * pass over the concatenated batches would produce — the KMV merge
    * law. Bounded state: each group's row carries ≤ k doubles in and
    * out. */
  def mergeDistinct(
      states: Seq[DataFrame],
      groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins_v"))))),
        1, k).as("mins_v"))
  }

  /** Estimate view of a distinct synopsis: (k−1)/U(k) when the synopsis
    * is full, exact count of kept mins below that ([[Sketches]]'
    * estimator, so the two surfaces cannot drift). */
  def finalizeDistinct(state: DataFrame, groupCols: Seq[String], k: Int = 64): DataFrame =
    state
      .withColumn("n_kept", size(col("mins_v")))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("mins_v"), k)), 6))
      .select((groupCols.map(col) :+ col("est_distinct") :+ col("n_kept")): _*)

  /** Per-batch HLL register synopsis per group — the MANY-GROUPS distinct
    * measure ([[partialDistinct]]'s KMV is k=64 doubles per group for
    * ~12.7% error; HLL p=8 is ≤ 2^p small-int registers for ~6.5%,
    * better accuracy per synopsis byte once groups number in the
    * millions, and the register-max merge is IDEMPOTENT, so overlapping
    * shards and replayed batches absorb instead of inflating). Delegates
    * to [[Sketches.hllRegisters]] so the maintained surface and the
    * one-shot sketch cannot drift; state is (groupCols, b, m_reg) ROWS —
    * at most 2^p per group, map-side combined. Holistic like the KMV
    * measure: merges ([[mergeDistinctHll]]) but cannot retract (a
    * register max says nothing about the runner-up) — deletes repair via
    * touched-group recompute ([[repairDistinctHll]]). */
  def partialDistinctHll(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 8,
      salt: String = "hll"): DataFrame =
    Sketches.hllRegisters(df, groupCols, valueCol, p, salt)

  /** Merge per-batch HLL synopses (any association order, duplicates
    * welcome): per-(group, bucket) register max — merged registers EQUAL
    * the fresh whole-corpus registers (the `x_agg_maintain_hll` oracle
    * answers the fresh statement). */
  def mergeDistinctHll(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    Sketches.hllMerge(states, groupCols)

  /** Estimate view of an HLL state: [[Sketches.hllEstimate]] —
    * (est_distinct, n_zero_regs) per group, p-validated in-plan. */
  def finalizeDistinctHll(state: DataFrame, groupCols: Seq[String], p: Int = 8): DataFrame =
    Sketches.hllEstimate(state, groupCols, p)

  /** Delete maintenance for the HLL measure: registers cannot retract,
    * so touched groups rebuild from survivors ([[repairGroups]]'s shape
    * adapted to a rows-per-group synopsis — drop the touched groups'
    * register rows, union the survivors' fresh registers). Cost tracks
    * |touched groups' surviving rows|, never the corpus. */
  def repairDistinctHll(
      state: DataFrame,
      survivors: DataFrame,
      touched: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      p: Int = 8,
      salt: String = "hll"): DataFrame = {
    val keys = touched.select(groupCols.map(col): _*).distinct()
    val rebuilt = Sketches.hllRegisters(
      survivors.join(keys, groupCols, "left_semi"), groupCols, valueCol, p, salt)
    state.join(keys, groupCols, "left_anti").unionByName(rebuilt)
  }

  /** Per-batch bottom-k quantile synopsis per group: the k rows with
    * the smallest DISTINCT id-hash uniforms, kept as (hash, value)
    * pairs (Cohen & Kaplan PODC'07 — a hash-bottom-k IS a uniform
    * sample, deterministic and mergeable). The hash coordinate is
    * PERSISTED ([[graft.functions.BottomKPairsAggregator]]): that is
    * what lets a later batch's synopsis union in and re-trim on the
    * same ordering, so merged ≡ single-pass. Holistic like distinct:
    * merges, does not retract — deletes repair via touched-group
    * recompute. ≤ k (double, double) pairs per group, map-side
    * combined. */
  def partialQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int = 256,
      salt: String = "bkq"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val bkp = udaf(graft.functions.BottomKPairsAggregator(k))
    val u = Sampling.hashUniform(col(idCol), salt)
    df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ u.as("__u") :+ col(valueCol).cast("double").as("__v")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bkp(col("__u"), col("__v")).as("sample_uv"))
  }

  /** Merge per-batch quantile synopses (any association order): distinct
    * pairs of the union, (hash, value)-sorted, first k — exactly the
    * trim the single pass applies, hence the merge law. */
  def mergeQuantile(
      states: Seq[DataFrame],
      groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sample_uv"))))),
        1, k).as("sample_uv"))
  }

  /** Quantile view of a synopsis: for each q in `qs`, the element at
    * floor(q · (m − 1)) of the sample's VALUES sorted ascending
    * (nearest-rank on the uniform sample — [[Sketches
    * .approxQuantilesBottomK]]'s estimator, so the two surfaces cannot
    * drift). */
  def finalizeQuantile(
      state: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "qs must be non-empty quantiles in [0, 1]")
    val vs = array_sort(transform(col("sample_uv"), p => p.getField("_2")))
    val m = size(vs)
    state
      .withColumn("__vs", vs)
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("est_value",
        round(element_at(col("__vs"), (floor(col("q") * (m - 1)) + 1).cast("int")), 6))
      .withColumn("n_sample", m)
      .select((groupCols.map(col) :+ col("q") :+ col("est_value") :+ col("n_sample")): _*)
  }

  /** Per-batch top-k synopsis per group: the k (value DESC, id ASC)-
    * first rows of the batch, kept as (value, id) pairs — the
    * leaderboard measure (top documents by score per domain, top
    * spenders per segment). The same semilattice law as the extrema and
    * bottom-k samples: the global top-k of a union is contained in the
    * union of per-shard top-k sets, so per-batch synopses merge
    * LOSSLESSLY ([[mergeTopK]] re-trims the union) — the merged
    * leaderboard EQUALS the fresh whole-corpus one, not approximates
    * it. The id tie-break makes the synopsis deterministic under equal
    * values. Holistic: merges, does not retract — deletes repair via
    * touched-group recompute like the extrema. ≤ k pairs per group
    * cross the shuffle; the window sorts batch rows, not the corpus. */
  def partialTopK(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(!groupCols.contains("top_vi"),
      "groupCols must not collide with the synopsis column (top_vi)")
    // the synopsis stores (NEGATED value, id): ascending struct order is
    // then exactly (value DESC, id ASC), so the plain array_sort both
    // engines agree on IS the leaderboard order — no comparator lambda
    // tie-break by the id CAST TO STRING: the synopsis stores ids as
    // strings, so mergeTopK's re-trim (and the VARCHAR oracle) rank
    // boundary ties lexicographically — selecting here in the id's
    // native (e.g. numeric) order would pick a different top-k set
    // whenever a value tie straddles the k boundary and the two orders
    // disagree (ids 9 vs 10), breaking merged ≡ fresh
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).cast("double").desc, col(idCol).cast("string"))
    df.filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ col(idCol) :+ col(valueCol).cast("double").as(valueCol)): _*)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct((-col(valueCol)).as("nv"), col(idCol).cast("string").as("id")))).as("top_vi"))
  }

  /** Merge per-batch top-k synopses (any association order): re-trim
    * the flattened union on the same (value DESC, id ASC) ordering.
    * Distinct pairs first: a REPLAYED batch's synopsis must be absorbed
    * (idempotent), not double-ranked. */
  def mergeTopK(
      states: Seq[DataFrame],
      groupCols: Seq[String],
      k: Int): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    require(k >= 1, "k must be at least 1")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("top_vi"))))),
        1, k).as("top_vi"))
  }

  /** Delete maintenance for the top-k measure: like the extrema, a
    * leaderboard does not retract (deleting the current #1 says nothing
    * about the next), so touched groups recompute from survivors —
    * [[repairGroups]]'s shape, |touched groups' rows| never |corpus|.
    * A touched group with no survivors leaves the state. */
  def repairTopK(
      state: DataFrame,
      survivors: DataFrame,
      touched: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    val keys = touched.select(groupCols.map(col): _*).distinct()
    val repaired = partialTopK(
      survivors.join(keys, groupCols, "left_semi"), groupCols, idCol, valueCol, k)
      .withColumnRenamed("top_vi", "__rtop")
    state
      .join(keys.withColumn("__touched", lit(true)), groupCols, "left_outer")
      .join(repaired, groupCols, "left_outer")
      .withColumn("top_vi", when(col("__touched"), col("__rtop")).otherwise(col("top_vi")))
      .drop("__touched", "__rtop")
      .filter(col("top_vi").isNotNull && size(col("top_vi")) > 0)
  }

  /** Leaderboard view of a top-k state: one row per (group, rank). */
  def finalizeTopK(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state
      .select((groupCols.map(col) :+ posexplode(col("top_vi"))): _*)
      .select((groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+
        col("col.id").as("id") :+
        (-col("col.nv")).as("value")): _*)

  /** Rolling aggregate over an ALREADY-AGGREGATED frame — the trailing
    * `precedingRows + 1`-row sum and window population per partition,
    * ordered by `orderCol`. The input is per-(group, period) partials
    * ([[partialState]] keyed by group + day), so the window sorts
    * synopsis rows — cardinality |groups| × |periods|, corpus-independent
    * — never the facts; a rolling dashboard over a 100 TB fact store
    * pays the daily partial maintenance plus this sliver-sized window.
    * ROWS (not RANGE) framing on purpose: "last N present periods" is
    * well-defined under gaps and deterministic because (partition,
    * orderCol) is unique in an aggregated frame. */
  def rollingOver(
      state: DataFrame,
      partitionCols: Seq[String],
      orderCol: String,
      valueCol: String,
      precedingRows: Int): DataFrame = {
    require(precedingRows >= 0, "precedingRows must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(-precedingRows, 0)
    state
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("n_in_window", count(lit(1)).over(w).cast("int"))
  }

  /** Rolling-window DISTINCT over maintained per-day HLL partials —
    * sums don't work for distinct (the same user on Monday and Tuesday
    * must count once in the week), but register-max does: for each
    * present day, the trailing `windowDays` days' registers merge and
    * estimate. `dailyState` is [[partialDistinctHll]] keyed by
    * groupCols + `dayCol` (exactly the state a maintenance stream keeps),
    * so the window works on synopsis rows — |groups| × |days| × ≤ 2^p —
    * never the facts: the rolling-distinct dashboard over a 100 TB event
    * store pays daily register maintenance plus this sliver-sized
    * self-join. The join is equi on groupCols with the day window as a
    * post-join range (the [[EventAnalytics.attributionJoin]] shape —
    * carry at least one group column at scale so the plan keys on it).
    * RANGE (calendar) framing on purpose, unlike [[rollingOver]]'s ROWS:
    * "the last 7 calendar days" is the distinct-users question, and the
    * per-day `n_days` output makes gap-shortened windows visible.
    *
    * @return groupCols + (dayCol, est_distinct, n_zero_regs, n_days) */
  def rollingDistinctHll(
      dailyState: DataFrame,
      groupCols: Seq[String],
      dayCol: String,
      windowDays: Int,
      p: Int = 8): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val wd = "__graft_wd"
    // the window side renames its columns up front: a self-join through
    // frame-qualified refs on a derived frame hits Spark's ambiguous-
    // self-join resolution; disjoint names sidestep it entirely
    val days = dailyState
      .select((groupCols.map(c => col(c).as(s"__w_$c")) :+
        col(dayCol).as(wd)): _*).distinct()
    // <=> on groups: a NULL group is a real group in the daily state
    // (hllRegisters only filters null VALUES) and must roll like any
    // other — plain === would silently drop it from the output
    val cond = (groupCols.map(c => col(s"__w_$c") <=> col(c)) :+
      col(dayCol).between(
        date_sub(col(wd), windowDays - 1), col(wd))).reduce(_ && _)
    val wnd = days.join(dailyState, cond)
      .select((groupCols.map(c => col(s"__w_$c").as(c)) :+ col(wd) :+
        col("b") :+ col("m_reg") :+ col("hll_p")): _*)
      .groupBy((groupCols.map(col) :+ col(wd) :+ col("b")): _*)
      .agg(max(col("m_reg")).as("m_reg"), max(col("hll_p")).as("hll_p"))
    val est = Sketches.hllEstimate(wnd, groupCols :+ wd, p)
    // n_days depends only on the (group, day) pairs: derive it from the
    // sliver-sized `days` frame joined to itself, not by re-running the
    // register join a second time
    val nDays = days.join(
        days.select((groupCols.map(c => col(s"__w_$c").as(s"__e_$c")) :+
          col(wd).as("__ed")): _*),
        (groupCols.map(c => col(s"__w_$c") <=> col(s"__e_$c")) :+
          col("__ed").between(
            date_sub(col(wd), windowDays - 1), col(wd))).reduce(_ && _))
      .groupBy((groupCols.map(c => col(s"__w_$c")) :+ col(wd).as("__nd")): _*)
      .agg(count(lit(1)).cast("int").as("n_days"))
    est.join(nDays,
        (groupCols.map(c => col(c) <=> col(s"__w_$c")) :+
          (col(wd) <=> col("__nd"))).reduce(_ && _))
      .drop((groupCols.map(c => s"__w_$c") :+ "__nd"): _*)
      .withColumnRenamed(wd, dayCol)
  }

  /** The standing merged state of a stream-maintained aggregate store
    * ([[graft.streaming.StreamingHistorization.aggMaintainStream]]'s
    * sink): per-batch partial states merged across their `ingest_batch`
    * partitions — associativity makes the partition layout invisible, so
    * the answer is identical before and after any compaction. None until
    * the first batch lands. */
  def readMaintainedState(
      spark: SparkSession,
      path: String,
      groupCols: Seq[String]): Option[DataFrame] =
    graft.sources.Store.readParquetSafe(spark, path)
      .map(df => mergeStates(Seq(df.drop("ingest_batch")), groupCols))

  /** Store-backed maintenance step: read the standing state (absent →
    * empty), merge the batch's partial (or retraction), commit as a new
    * generation — readers pinned to prior generations stay consistent,
    * and the CAS generation commit makes concurrent maintainers safe.
    * Returns the committed generation. */
  def maintainStore(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      retract: Boolean = false,
      keep: Int = 3): Long = {
    val delta =
      if (retract) retractState(batch, groupCols, valueCol)
      else partialState(batch, groupCols, valueCol)
    val merged = graft.sources.Store.readStoreLatest(spark, path) match {
      case Some((_, standing)) => mergeStates(Seq(standing, delta), groupCols)
      case None => delta
    }
    graft.sources.Store.writeStoreGeneration(merged, path, keep = keep)
  }
}
