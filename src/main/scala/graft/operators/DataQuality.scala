package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data-quality profiling — the pre-publish QA gate of a
  * production pipeline (the shape popularized by Amazon Deequ): per
  * column, row/non-null/distinct counts and the derived completeness and
  * uniqueness ratios, as one small report frame a run can assert on
  * before promoting its output.
  *
  * Scale shape: ONE aggregation over the frame computes every column's
  * metrics (multiple exact distinct counts plan through Spark's Expand —
  * rows × profiled-columns map-side, standard for multi-distinct); no
  * per-column re-scan, no driver-side iteration. The report is
  * `cols.size` rows regardless of input size.
  */
object DataQuality {

  /** Per-column profile of `cols`: (column, n_rows, n_nonnull,
    * n_distinct, completeness, uniqueness). Distinct counts are EXACT
    * (nulls excluded, SQL `COUNT(DISTINCT ...)` semantics); ratios are
    * against the total row count, rounded to 6dp. Empty input yields a
    * row per column with zero counts and null ratios. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile list: ${cols.mkString(", ")}")
    val aggs =
      count(lit(1)).as("__n") +:
      cols.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = explode(array(cols.map { c =>
      struct(lit(c).as("column"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"))
    }: _*)).as("m")
    one.select(col("__n"), perCol)
      .select(
        col("m.column").as("column"),
        col("__n").as("n_rows"),
        col("m.n_nonnull").as("n_nonnull"),
        col("m.n_distinct").as("n_distinct"),
        round(when(col("__n") === 0, lit(null))
          .otherwise(col("m.n_nonnull").cast("double") / col("__n")), 6)
          .as("completeness"),
        round(when(col("__n") === 0, lit(null))
          .otherwise(col("m.n_distinct").cast("double") / col("__n")), 6)
          .as("uniqueness"))
  }

  /** Profile DRIFT between two runs of the same table (yesterday's load
    * vs today's, one source vs another): [[profileColumns]] on each side
    * joined per column, with the completeness/uniqueness deltas and the
    * row-count ratio — the schema-level shift monitor a pipeline gates
    * publishes on (a column whose completeness drops 2 points, or a key
    * whose uniqueness leaves 1.0, is a broken upstream, not a statistic).
    *
    * Scale shape: two single-pass profile aggregations (bounded output:
    * one row per profiled column each) joined on the column NAME — the
    * join is metadata-sized. `row_ratio` is NULL when side A is empty
    * (no evidence, not infinite growth). */
  def profileDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = profileColumns(a, cols).select(col("column"),
      col("n_rows").as("n_rows_a"), col("completeness").as("completeness_a"),
      col("uniqueness").as("uniqueness_a"))
    val pb = profileColumns(b, cols).select(col("column"),
      col("n_rows").as("n_rows_b"), col("completeness").as("completeness_b"),
      col("uniqueness").as("uniqueness_b"))
    pa.join(pb, Seq("column"))
      .withColumn("d_completeness",
        round(col("completeness_b") - col("completeness_a"), 6))
      .withColumn("d_uniqueness",
        round(col("uniqueness_b") - col("uniqueness_a"), 6))
      .withColumn("row_ratio",
        round(when(col("n_rows_a") === 0, lit(null))
          .otherwise(col("n_rows_b").cast("double") / col("n_rows_a")), 6))
  }

  /** Referential-integrity gate: one row per child key column set with
    * the orphan count (child rows whose non-null key has no match in the
    * parent) and the match ratio — the FK check a pipeline runs before
    * publishing a fact table against its dimensions. NULL child keys are
    * reported separately (`n_null_key`), not counted as orphans, matching
    * SQL FK semantics. When NO key is checkable — the child is empty, or
    * every child key is NULL — `match_ratio` is NULL (0 performable
    * checks is "no evidence", not "0% match"), so a `match_ratio >= t`
    * gate neither passes nor hard-fails vacuously; gate on
    * `coalesce(match_ratio, …)` to choose a policy.
    *
    * Scale shape: one left-anti equi-join on the key columns — the parent
    * side projects keys only and is typically dimension-sized, so AQE
    * broadcasts it; the child is scanned once and only (key) columns
    * shuffle if the join isn't broadcast. The report is ONE row. */
  def checkReferentialIntegrity(
      child: DataFrame,
      parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "need at least one (childKey, parentKey) pair")
    val childKeys = keys.map(_._1)
    val nonNull = childKeys.map(col(_).isNotNull).reduce(_ && _)
    val parentProj = parent.select(keys.map { case (c, p) => col(p).as(s"__p_$c") }: _*)
      .distinct()
    val joinCond = keys.map { case (c, _) => col(c) === col(s"__p_$c") }.reduce(_ && _)
    val orphans = child.filter(nonNull)
      .join(parentProj, joinCond, "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val totals = child.agg(
      count(lit(1)).as("n_rows"),
      sum(when(nonNull, 0L).otherwise(1L)).as("n_null_key"))
    totals.crossJoin(broadcast(orphans))
      .select(
        lit(childKeys.mkString(",")).as("key"),
        col("n_rows"),
        coalesce(col("n_null_key"), lit(0L)).as("n_null_key"),
        col("n_orphans"),
        round(when(
          col("n_rows") - coalesce(col("n_null_key"), lit(0L)) === 0, lit(null))
          .otherwise(
            (col("n_rows") - coalesce(col("n_null_key"), lit(0L)) - col("n_orphans"))
              .cast("double") /
              (col("n_rows") - coalesce(col("n_null_key"), lit(0L)))), 6)
          .as("match_ratio"))
  }

  /** Row-level constraint evaluation: every row gains a `violations`
    * array holding the NAME of each declared constraint it fails —
    * the expectations/quarantine pattern of declarative ingest
    * pipelines, as one stateless projection (no shuffle; the whole
    * evaluation pipelines inside the scan stage at any corpus size).
    * A predicate that evaluates to NULL (e.g. a comparison against a
    * NULL cell) counts as a VIOLATION — fail-closed, because a row the
    * constraints cannot vouch for must not reach the valid output. */
  def rowViolations(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    require(constraints.map(_._1).distinct.size == constraints.size,
      "constraint names must be unique")
    df.withColumn("violations",
      array_compact(array(constraints.map { case (name, pred) =>
        when(!coalesce(pred, lit(false)), lit(name))
      }: _*)))
  }

  /** Quarantine routing over [[rowViolations]]: (valid rows without the
    * audit column, quarantined rows with their reasons). Both sides are
    * filters over the same one-pass projection — an engine executing
    * them in one job reads the input once. */
  def splitQuarantine(
      df: DataFrame,
      constraints: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val flagged = rowViolations(df, constraints)
    (flagged.filter(size(col("violations")) === 0).drop("violations"),
      flagged.filter(size(col("violations")) > 0))
  }

  /** [[profileColumns]] plus pass/fail gating: a column passes when its
    * completeness and uniqueness meet the thresholds given for it
    * (absent thresholds don't gate). The report stays data-sized-
    * independent, so a run can `.filter(!$"pass")` and abort before
    * publishing bad output. */
  def checkColumns(
      df: DataFrame,
      minCompleteness: Map[String, Double] = Map.empty,
      minUniqueness: Map[String, Double] = Map.empty): DataFrame = {
    val cols = (minCompleteness.keySet ++ minUniqueness.keySet).toSeq.sorted
    require(cols.nonEmpty, "need at least one threshold")
    val compExpr = minCompleteness.foldLeft(lit(true)) { case (acc, (c, t)) =>
      when(col("column") === c, col("completeness") >= t && acc).otherwise(acc)
    }
    val uniqExpr = minUniqueness.foldLeft(lit(true)) { case (acc, (c, t)) =>
      when(col("column") === c, col("uniqueness") >= t && acc).otherwise(acc)
    }
    // NULL ratios (the empty-input profile) must FAIL the gate, not
    // vanish from it: pass = NULL would make the documented
    // `.filter(!$"pass")` abort check filter the row out and publish
    // the empty table — the exact failure the gate exists to stop
    profileColumns(df, cols)
      .withColumn("pass", coalesce(compExpr && uniqExpr, lit(false)))
  }
}
