package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long/wide reshaping: pivot, unpivot (melt), crosstab, rollup.
  *
  * North-star extension: the reference's users live in pandas, where
  * `pivot_table`/`melt`/`crosstab` are daily verbs; a drop-in engine
  * needs the same reshapes as single declarative plans. Re-expressed
  * Spark-first they are ordinary one-shuffle aggregations (pivot,
  * crosstab, rollup) or a zero-shuffle row expansion (melt) — nothing
  * here materializes a driver-side matrix, so all four survive 100 TB.
  */
object Reshape {

  /** Wide pivot: one row per `groupCols` tuple, one column per value in
    * `pivotValues` named `prefix + value (lowercased)`, cells aggregated
    * by `agg` over the matching rows, absent cells NULL.
    *
    * `pivotValues` is REQUIRED, not discovered: Spark's value-less
    * `pivot` first runs a separate distinct-collect over the pivot
    * column — an extra full pass plus a driver-width risk at corpus
    * scale. Declaring the vocabulary keeps this a single groupBy whose
    * map-side partials are pre-combined per pivot cell, and makes the
    * output schema static (a requirement for any downstream store).
    * Scale shape: one hash-aggregate shuffle of `|pivotValues|` partial
    * cells per group — the value payload never fans out.
    */
  def pivotAgg(
      df: DataFrame,
      groupCols: Seq[String],
      pivotCol: String,
      pivotValues: Seq[String],
      agg: Column,
      prefix: String = ""): DataFrame = {
    require(pivotValues.nonEmpty, "pivotValues must be declared (no discovery pass)")
    val names = pivotValues.map(prefix + _.toLowerCase)
    require(names.distinct.size == names.size,
      s"pivot values collide after lowercasing: ${names.mkString(", ")}")
    require(!groupCols.exists(names.contains),
      s"pivot column names ${names.mkString(", ")} collide with group columns")
    val wide = df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .agg(agg)
    val renamed = pivotValues.foldLeft(wide) { (acc, v) =>
      acc.withColumnRenamed(v, prefix + v.toLowerCase)
    }
    renamed.select((groupCols ++ pivotValues.map(v => prefix + v.toLowerCase)).map(col): _*)
  }

  /** Long melt (pandas `melt` / SQL UNPIVOT): each input row becomes
    * `valueCols.size` rows of (idCols, variable, value), values cast to
    * double for a uniform long schema. NULL cells are KEPT (a melted
    * missing metric is a fact, and dropping them would make the row
    * count data-dependent). Zero shuffle: Spark's `unpivot` is a
    * generate-style row expansion that pipelines inside the scan stage,
    * so melting a 100 TB table is a map-only pass. */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String = "variable",
      valueName: String = "value"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    df.unpivot(
      idCols.map(col).toArray,
      valueCols.map(c => col(c).cast("double")).toArray,
      varName,
      valueName)
  }

  /** Contingency table (pandas `crosstab`): rows keyed by `rowCol`, one
    * count column per declared `colValues` entry (named `n_` + value
    * lowercased), empty cells 0 — the coalesce makes the wide frame
    * total-preserving (row sums equal group counts), which a NULL cell
    * would silently break. Same single-shuffle shape as [[pivotAgg]];
    * `colValues` is declared for the same reasons. */
  def crosstabCounts(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      colValues: Seq[String]): DataFrame = {
    val wide = pivotAgg(df, Seq(rowCol), colCol, colValues, count(lit(1)), "n_")
    colValues.foldLeft(wide) { (acc, v) =>
      val c = "n_" + v.toLowerCase
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
  }

  /** Hierarchical subtotals (Gray et al., "Data Cube", ICDE'96): GROUP BY
    * ROLLUP over `groupCols` with explicit `grouping(...)` flags so
    * subtotal NULLs are distinguishable from genuine NULL group values —
    * the ambiguity the Data Cube paper's ALL pseudo-value exists to
    * avoid, encoded here as one `g_<col>` indicator per level. One
    * shuffle: Spark plans rollup as a single expand + hash aggregate,
    * and the expand multiplies rows by levels BEFORE the map-side
    * combine, so the shuffled volume is per-group partials, not data. */
  def rollupAgg(
      df: DataFrame,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val flags = groupCols.map(c => grouping(col(c)).cast("int").as(s"g_$c"))
    df.rollup(groupCols.map(col): _*)
      .agg((flags ++ aggs).head, (flags ++ aggs).tail: _*)
  }
}
