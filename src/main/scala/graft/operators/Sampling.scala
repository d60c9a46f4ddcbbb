package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * North-star extension. `df.sample()` / `sampleBy()` draw from a seeded
  * RNG whose stream depends on partitioning — rerun the pipeline with a
  * different partition count and the sample changes. Training-data splits
  * must be a pure function of the ROW, not of the execution: a document's
  * train/val/test assignment has to survive repartitioning, engine
  * upgrades, and re-ingestion, or held-out data silently leaks into
  * training. Everything here derives a uniform from md5(id + salt), so
  * membership is reproducible in any engine with md5 (the DuckDB oracles
  * mirror it) and changing the salt re-draws the whole assignment.
  *
  * Scale shape: all operators are stateless per-row projections/filters —
  * no shuffle, no driver state, trivially parallel at any data size.
  */
object Sampling {

  /** Deterministic uniform in [0, 1): the first 8 hex digits of
    * md5(s"$id#$salt") as a 32-bit integer, scaled. 2^-32 resolution is
    * plenty for split fractions and keeps the value exactly representable
    * (and bit-identical) in any engine with md5 + double arithmetic. */
  def hashUniform(id: Column, salt: String): Column =
    conv(md5(concat(id.cast("string"), lit("#" + salt))).substr(1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Assign each row to a named split by cumulative weight ranges over the
    * hash-uniform. `splits` are (name, weight) with weights summing to <= 1;
    * the last split absorbs any remainder so every row is assigned.
    * Over-subscribed weights are rejected — they would silently starve the
    * trailing splits (an empty test set is exactly the failure this API
    * exists to prevent).
    *
    * Rows with equal `idCol` values always land in the same split — pass a
    * group/document key (not a row id) for leakage-safe grouped splits.
    * A NULL id hashes to a NULL uniform and is assigned a NULL split (kept,
    * visibly unassigned) rather than being funneled into one split. */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    // the FULL cumulative sum must stay within [0,1] (tiny epsilon for
    // float accumulation, e.g. 0.8+0.1+0.1): excess in any position —
    // including the last split's own weight — silently truncates it
    require(bounds.forall(_ <= 1.0 + 1e-9),
      s"split weights over-subscribe [0,1): cumulative bounds $bounds would starve later splits")
    val u = hashUniform(col(idCol), salt)
    val expr = splits.init.zip(bounds.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (acc, ((name, _), hi)) =>
      when(u < hi, name).otherwise(acc)
    }
    df.withColumn("split", when(u.isNotNull, expr))
  }

  /** Deterministic Bernoulli sample: keep a row iff its hash-uniform falls
    * under `fraction`. Unlike `df.sample`, membership is a pure function of
    * (id, salt) — stable under repartitioning and re-runs. Rows with a NULL
    * id are dropped (their uniform is NULL, the filter is not-true). */
  def sampleDeterministic(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashUniform(col(idCol), salt) < lit(fraction))

  /** Deterministic epoch oversampling: emit each row `floor(weight)` times
    * plus one more with probability `frac(weight)` — the standard way to
    * mix corpus sources at unequal rates (wiki ×2.5, web ×0.8, …) while
    * keeping membership a pure function of (id, salt, copy index).
    *
    * Output gains a `copy` column (0-based): copies `0..floor(w)-1` are
    * unconditional, the fractional copy draws its own uniform salted with
    * the copy index so it is independent of every other decision. A
    * weight <= 1 is plain deterministic Bernoulli (copy 0 only); NULL ids
    * drop from the fractional copy like [[sampleDeterministic]].
    *
    * Scale shape: one `explode` of a literal 0..floor(w) sequence + a
    * per-row filter — no shuffle; output size is weight × input by
    * construction. Mixing several sources = union of `sampleWithWeight`
    * calls with per-source weights (schemas must already align). */
  def sampleWithWeight(
      df: DataFrame,
      idCol: String,
      weight: Double,
      salt: String = "weight"): DataFrame = {
    require(weight >= 0, "weight must be non-negative")
    val full = math.floor(weight).toInt
    val frac = weight - full
    val copies = explode(sequence(lit(0), lit(full))).as("copy")
    df.select(col("*"), copies)
      .filter(col("copy") < full ||
        hashUniform(col(idCol), s"$salt#$full") < lit(frac))
  }

  /** Per-group cost targets for [[sampleToBudget]]: group g gets
    * budget · w_g / Σw. Exposed so an oracle/mirror can embed the SAME
    * IEEE doubles the operator uses — weight normalization is float
    * arithmetic, and recomputing it in another order can flip the last
    * bit and with it a boundary row. */
  def budgetTargets(budget: Double, weights: Seq[(String, Double)]): Seq[(String, Double)] = {
    val wsum = weights.map(_._2).sum
    weights.map { case (g, w) => g -> budget * (w / wsum) }
  }

  /** Deterministic mixture down-sampling to a cost budget — the
    * data-mixing step of a training pipeline: given per-source weights
    * (wiki 40%, web 30%, …) and a total budget in cost units (tokens,
    * chars, bytes), sample each source down to its budget share.
    *
    * Group g's keep fraction is min(1, target_g / total_g) with
    * target_g = budget · w_g / Σw and total_g = the group's cost sum;
    * a row survives iff its [[hashUniform]] falls under the fraction, so
    * membership is a pure function of (id, salt) given the group totals
    * — repartition-stable and re-runnable. Groups without a weight are
    * dropped; a group whose total already fits its target keeps every
    * row (fraction capped at 1). The realized cost of a kept group
    * concentrates around its target (Bernoulli row sampling; exactness
    * of the SHARE, not a hard byte cap).
    *
    * Scale shape: one map-side-combinable aggregation over the weighted
    * groups for the totals (a handful of rows), broadcast back as a
    * per-group fraction, then a stateless per-row filter — one scan, no
    * wide shuffle, any corpus size.
    *
    * @return the surviving rows with the input schema
    */
  def sampleToBudget(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      costCol: String,
      budget: Double,
      weights: Seq[(String, Double)],
      salt: String = "mixture"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need at least one group weight, all positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate group in weights")
    val targets = budgetTargets(budget, weights)
    val totals = df.filter(col(groupCol).isin(weights.map(_._1): _*))
      .groupBy(col(groupCol))
      .agg(sum(col(costCol)).cast("double").as("__total"))
    val targetCol = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (g, t)) => when(col(groupCol) === g, lit(t)).otherwise(acc)
    }
    val fracs = totals.select(col(groupCol),
      least(lit(1.0), targetCol / col("__total")).as("__frac"))
    df.join(broadcast(fracs), Seq(groupCol))
      .filter(hashUniform(col(idCol), salt) < col("__frac"))
      .drop("__frac")
      .select(df.columns.map(col): _*)
  }

  /** Deterministic stratified sample: per-stratum keep fractions, rows of
    * unlisted strata are dropped (mirroring `sampleBy`), as are NULL-id
    * rows. One per-row filter, no shuffle — rebalancing class skew in a
    * 100 TB corpus costs one scan. */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      salt: String = "stratified"): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    val u = hashUniform(col(idCol), salt)
    val frac = fractions.foldLeft(lit(null).cast("double")) {
      case (acc, (stratum, f)) => when(col(stratumCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** Quality-band mixture sampling: split the corpus into `fractions.size`
    * equal-population bands by a per-row score (entropy, log-prob, any
    * quality signal) and keep each band at its own rate — the
    * "sample harder from better data" recipe of quality-weighted corpus
    * construction. Band cut points are read from a bottom-k hash sample
    * ([[graft.functions.BottomKSampleAggregator]]), NOT a global sort:
    * the corpus crosses no wide exchange, the k-value sample collapses to
    * one broadcast row of `fractions.size - 1` doubles, and membership is
    * then a stateless per-row filter — two scans total at any scale.
    *
    * Band i covers scores in [cut_i, cut_i+1) (band 0 unbounded below,
    * the last band unbounded above); a row's band is the number of cuts
    * ≤ its score. Rows with a null id or score are dropped (they can be
    * neither hashed nor ranked). Keep/drop is a pure function of
    * (id, salt), repartition-stable like every sampler here. Scores
    * should be identically computable in any mirroring engine (round
    * upstream if the score is float-derived).
    *
    * @param fractions per-band keep fractions, lowest band first
    * @return kept rows plus their `band` (0-based)
    */
  def sampleByScoreBand(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      fractions: Seq[Double],
      k: Int = 256,
      salt: String = "band"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be non-empty keep rates in [0, 1]")
    val nBands = fractions.size
    // NaN drops WITH null: NaN compares greater than every double in
    // Spark, so it would satisfy every cut and land in the TOP band —
    // under ascending fractions, corrupt float-math scores would be the
    // most aggressively KEPT rows instead of excluded ones
    val clean = df.filter(col(idCol).isNotNull && col(scoreCol).isNotNull &&
      !isnan(col(scoreCol).cast("double")))
    if (nBands == 1) {
      return clean.filter(hashUniform(col(idCol), s"$salt#keep") < fractions.head)
        .withColumn("band", lit(0))
    }
    val bks = udaf(graft.functions.BottomKSampleAggregator(k))
    val cuts = clean
      .select(hashUniform(col(idCol), s"$salt#cut").as("__u"),
        col(scoreCol).cast("double").as("__v"))
      .agg(bks(col("__u"), col("__v")).as("__vs"))
      .select(array((1 until nBands).map { i =>
        // empty-sample guard: with zero clean rows the aggregator yields
        // an empty/null sample and the index would be 0 — element_at
        // throws on that unconditionally (and on any index under ANSI),
        // killing the broadcast build even though no row will ever read
        // the cuts. Null cuts are correct: there are no rows to band.
        when(coalesce(size(col("__vs")), lit(0)) === 0, lit(null).cast("double"))
          .otherwise(element_at(col("__vs"),
            (floor(lit(i.toDouble / nBands) * (size(col("__vs")) - 1)) + 1).cast("int")))
      }: _*).as("__cuts"))
    clean.crossJoin(broadcast(cuts))
      .withColumn("band",
        size(filter(col("__cuts"), c => c <= col(scoreCol).cast("double"))))
      .filter(hashUniform(col(idCol), s"$salt#keep") <
        element_at(array(fractions.map(lit): _*), col("band") + 1))
      .drop("__cuts")
  }

  /** Keep at most `maxPerGroup` rows per `groupCol` value — the
    * domain/source frequency cap of web-corpus curation (RefinedWeb §3.2,
    * FineWeb): a handful of template-heavy domains otherwise dominate the
    * mixture. Kept rows are the `maxPerGroup` smallest by
    * ([[hashUniform]], id) within the group, so the survivors are a
    * deterministic uniform subsample, not a scan-order artifact, and the
    * same rows survive on any cluster layout or re-run.
    *
    * Election runs in a bounded-heap [[graft.functions.TopKAggregator]],
    * not a `row_number` window: the window would shuffle AND sort every
    * row of the biggest domain on one reducer — the exact skew this
    * operator exists to fight — while the heap keeps O(maxPerGroup) state
    * per group and combines map-side, so a 10M-page domain sends each
    * mapper's top list across the exchange, never its 10M rows. The
    * payload only moves in the final id semi-join (AQE broadcasts it when
    * the kept set is small).
    *
    * `idCol` must be integral and unique per row (a NULL id hashes to a
    * NULL uniform; such rows are dropped, matching [[sampleStratified]]).
    * NULL group values form their own capped group. */
  def capPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      maxPerGroup: Int,
      salt: String = "cap"): DataFrame = {
    require(maxPerGroup >= 1, "maxPerGroup must be at least 1")
    // TopKAggregator keeps the LARGEST scores (ties: id asc), so feeding
    // the negated uniform elects the smallest-u rows.
    val topk = udaf(graft.functions.TopKAggregator(maxPerGroup))
    val kept = df
      .filter(col(idCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"))
      .withColumn("__score", -hashUniform(col("__id"), salt))
      .groupBy("__g")
      .agg(topk(col("__score"), col("__id")).as("tk"))
      .select(col("__g"), explode(col("tk")).as("r"))
      .select(col("__g").as("__keep_g"), col("r._2").as("__keep_id"))
    // Semi-join on (group, id), not id alone: even if the documented
    // unique-id contract is violated, an id elected in one group cannot
    // resurrect same-id rows capped out of another group.
    df.join(kept,
      df(idCol).cast("long") === kept("__keep_id") &&
        df(groupCol) <=> kept("__keep_g"), "left_semi")
  }

  /** Deterministic global training order: every row gets a contiguous
    * 0-based `shuffle_pos` by ascending md5-of-(id, salt) — a reproducible
    * corpus-wide shuffle (same salt ⇒ same order on any cluster, any
    * partitioning; new salt ⇒ fresh epoch order), the "shuffle the
    * corpus before sharding it into training files" step.
    *
    * Scale shape — the classic zipWithIndex build, NOT a global window
    * (a `Window.orderBy` with no partition key funnels the corpus
    * through ONE task, and a partitioned-window workaround pays a second
    * full-row exchange): range-exchange + sort on the hash, then
    * `zipWithIndex` — a bounded per-partition count job (whose shuffle
    * lineage the final job REUSES, no re-sort) and a map stamping
    * offset + local index. The one deliberate RDD hop in the library:
    * contiguous global enumeration has no exchange-free Catalyst form,
    * and the hop is two narrow stages over the already-sorted rows.
    * Ties cannot occur across distinct ids (the digest is of the id)
    * and duplicate ids order among themselves by id. For writing
    * shards, follow with `repartitionByRange(n, col("shuffle_pos"))`
    * so file k holds one contiguous position range.
    */
  def shufflePositions(df: DataFrame, idCol: String, salt: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val h = md5(concat(col(idCol).cast("string"), lit("#" + salt)))
    val sorted = df.withColumn("__h", h)
      .repartitionByRange(n, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
      .drop("__h")
    val schema = sorted.schema.add("shuffle_pos", org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}
