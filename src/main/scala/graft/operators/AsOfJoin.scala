package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: match every left row to the most recent
  * right row with `rightTs <= leftTs` within the same key — the lookup a
  * versioned store answers ("which version was valid when this event
  * happened"), and a first-class operator in DuckDB (`ASOF JOIN`), kdb,
  * pandas (`merge_asof`) that Spark lacks.
  *
  * Implementation is the scalable union+window formulation, not a range
  * join: both sides are tagged and unioned, one shuffle partitions by key,
  * one sort orders by (ts, side, tie), and a running `last(right_struct,
  * ignoreNulls)` carries the latest right row forward into each left row.
  * Cost is O(shuffle of both sides + per-key sort) regardless of time-range
  * density — a range-condition join explodes on wide ranges and skewed
  * keys, this does not.
  *
  * Tie semantics: a right row at exactly `leftTs` matches (at-or-before,
  * like DuckDB's `ON l.ts >= r.ts`). Right rows tied on (key, ts) are
  * ordered by `rightTieBreak` so the result is deterministic.
  *
  * Unmatched left rows keep null right columns (left-outer semantics).
  */
object AsOfJoin {

  /** @param keys        equi-join key columns (present on both sides)
    * @param leftTs      left timestamp column
    * @param rightTs     right timestamp column
    * @param rightPrefix prefix for right-side output columns (all right
    *                    columns except the keys are emitted, prefixed)
    * @param rightTieBreak right column ordering ties on (key, rightTs)
    * @param tolerance   optional staleness bound (SQL interval body, e.g.
    *                    "30 MINUTES"): a match older than `leftTs -
    *                    tolerance` is discarded (right columns null), the
    *                    standard bounded-lookback variant (pandas
    *                    merge_asof `tolerance`). Applied as a post-window
    *                    null-out — plan shape and cost are unchanged.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPrefix: String = "right_",
      rightTieBreak: Option[String] = None,
      tolerance: Option[String] = None): DataFrame = {
    // only the tolerance path reads the right ts out of the carried payload
    require(tolerance.isEmpty || !keys.contains(rightTs),
      "rightTs cannot be a join key when tolerance is set")
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    // a prefixed right name colliding with a left column would emit a
    // DataFrame with duplicate columns — unusable only LATER (ambiguous
    // reference, parquet write failure); refuse at call time
    val collisions = rightPayload.map(rightPrefix + _).filter(left.columns.contains)
    require(collisions.isEmpty,
      s"prefixed right columns collide with left columns: ${collisions.mkString(", ")} "
        + "— choose a different rightPrefix")
    val rStruct = struct(rightPayload.map(col): _*)
    val rStructType = right.select(rStruct.as("r")).schema("r").dataType
    // tie-break keeps its native type: a string cast would order numeric
    // ties lexicographically ("99.0" > "101.0")
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)

    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(true).as("__isLeft"),
        lit(null).cast(tieType).as("__tie"),
        struct(left.columns.map(col).toSeq: _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(false).as("__isLeft"),
        rightTieBreak.map(right.col).getOrElse(lit(null).cast(tieType)).as("__tie"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        rStruct.as("__r")): _*)
      // a null right timestamp would sort nulls-first and "match" left rows
      // preceding all real right rows; ASOF semantics exclude such rows.
      // Null KEY columns likewise: equi-join (and DuckDB ASOF) semantics
      // never match null = null, but partitionBy groups nulls together —
      // a null-key right row would cross-match every null-key left row.
      // Dropping them here leaves null-key LEFT rows alone in their
      // partition: retained with a null payload, the left-outer answer.
      .filter(col("__ts").isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))

    // right rows sort before left rows at equal ts (false < true), so an
    // exactly-coincident right row is visible to the left row's running last
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isLeft").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    // a stale match (null field access -> null condition -> null struct)
    // degrades to the unmatched case, preserving left-outer semantics
    // cast like the ordering path does — the payload keeps rightTs in its
    // original type (epoch long / string ts columns are supported)
    val bounded = tolerance.fold(carried)(tol => carried.withColumn("__match",
      when(col("__match." + rightTs).cast("timestamp") >= col("__ts") - expr(s"INTERVAL $tol"),
        col("__match"))))
    bounded
      .filter(col("__isLeft"))
      .select(
        left.columns.toSeq.map(c => col("__l." + c).as(c)) ++
          rightPayload.map(c => col("__match." + c).as(rightPrefix + c)): _*)
  }
}
