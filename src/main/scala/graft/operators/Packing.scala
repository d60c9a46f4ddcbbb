package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget packs for
  * training-batch assembly (context-window filling).
  *
  * North-star extension (no counterpart in the reference). Two packing
  * disciplines, both PURE FUNCTIONS of (ids, token counts, budget,
  * shards) and so repartition-stable and engine-reproducible:
  *
  *  - contiguous fill ([[packSequences]]/[[packByCount]]/[[packGroups]]):
  *    id order, a pack closes when the running total crosses the budget
  *    (packs may overflow by their last document) — one window, the
  *    cheapest shape, the default;
  *  - best-fit-decreasing ([[packBestFit]]/[[packGroupsBestFit]]):
  *    (tokens DESC, id) order into the fullest feasible open bin — packs
  *    never exceed the budget (oversized singletons aside) and padding
  *    waste drops, at the cost of a sequential per-shard pass. Plain
  *    FFD/BFD is order-sensitive; pinning the total order is what makes
  *    this variant deterministic enough for a distributed, resumable
  *    pipeline (and for a sequential-replay oracle).
  *
  * Scale shape: one hash-partitioned window per shard (`doc_id % shards`),
  * cumulative sum inside — a single shuffle of (id, shard, n_tokens)
  * triples, never the text. Shards are independent, so parallelism is
  * `shards`-wide regardless of corpus size; size `shards` ≈ cluster cores.
  * A document longer than the budget gets a pack of its own (it overflows
  * its pack; downstream truncation is a policy decision, not packing's).
  */
object Packing {

  /** Per-document pack assignment.
    *
    * @param budget  pack capacity in tokens (e.g. a context length)
    * @param shards  independent packing streams; parallelism knob
    * @return (doc_id, shard, n_tokens, pack_id, pack_pos): `pack_id` is
    *         unique within a shard; `pack_pos` is the document's 1-based
    *         position inside its pack
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      shards: Int = 32): DataFrame =
    packByCount(df, idCol, TextAnalysis.tokenCount(col(textCol)).cast("long"),
      budget, shards)

  /** [[packSequences]] over a precomputed token-count column (expression) —
    * for corpora already counted by a real tokenizer, where whitespace
    * counts would mis-size the packs. Same contiguous-fill semantics. */
  def packByCount(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1, "shards must be positive")
    // ROWS frame, not the orderBy default RANGE: under RANGE, duplicate
    // doc_id values are frame PEERS — both rows' tokens would enter each
    // row's running total, throwing every later pack boundary off
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = df.select(
        col(idCol).as("doc_id"),
        (col(idCol) % shards).cast("long").as("shard"),
        tokenCount.as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // a doc belongs to the pack its PRECEDING total lands in: floor of
      // (cum - n_tokens) / budget — contiguous fill, overflow closes packs
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")).cast("double") / budget.toDouble).cast("long"))
    assigned
      .withColumn("pack_pos",
        row_number().over(Window.partitionBy("shard", "pack_id").orderBy("doc_id"))
          .cast("long"))
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_pos")
  }

  /** Group-atomic packing: all rows of a group (a conversation's turns, a
    * document's chunks) land in the SAME pack — groups are packed as units
    * by their token totals, then the assignment joins back to rows. A
    * group is never split across packs; a group larger than the budget
    * overflows its own pack, like an oversized document in
    * [[packSequences]]. Groups order by their smallest row id, shard by
    * that key — deterministic and repartition-stable like the row form.
    *
    * Scale: one groupBy of (group, n_tokens) pairs, the group-level window
    * (group count ≪ row count), and one join back on the group key.
    *
    * @return (doc_id, grp, shard, pack_id) — one row per input row
    */
  def packGroups(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1, "shards must be positive")
    val rows = df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      tokenCount.as("n_tokens"))
    val groups = rows.groupBy("grp")
      .agg(sum(col("n_tokens")).as("grp_tokens"), min(col("doc_id")).as("grp_key"))
    // the contiguous fill inlined at GROUP level (not via packByCount)
    // so the pack assignment stays keyed on `grp` itself: joining back
    // through grp_key alone would duplicate every row of two groups that
    // share a min doc_id. grp breaks grp_key ties in the fill order, and
    // ROWS framing keeps tied keys out of each other's running totals.
    val w = Window.partitionBy("shard").orderBy("grp_key", "grp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = groups
      .withColumn("shard", (col("grp_key") % shards).cast("long"))
      .withColumn("cum", sum(col("grp_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("grp_tokens")).cast("double") / budget.toDouble)
          .cast("long"))
      .select(col("grp").as("__g"), col("shard"), col("pack_id"))
    // null-safe group join: a NULL group key is a real group (groupBy
    // collected it); a plain using-join would silently drop its rows,
    // breaking the one-row-per-input-row contract
    rows.select("doc_id", "grp")
      .join(packed, col("grp") <=> col("__g"))
      .select("doc_id", "grp", "shard", "pack_id")
  }

  /** Best-fit-decreasing packing — the padding-waste optimizer beside
    * [[packSequences]]' contiguous fill: within a shard, documents are
    * processed in (token count DESC, doc id ASC) order and each lands in
    * the FULLEST already-open bin that still fits (ties → smallest bin
    * id); no feasible bin opens a new one. A document larger than the
    * budget gets a new bin of its own (the bin overflows and is never
    * feasible again), like the oversized-document rule of the row form.
    * The assignment is a pure function of (ids, token counts, budget,
    * shards) — BFD's order-sensitivity is pinned down by the total
    * (n_tokens DESC, doc_id) order, so the result is deterministic and
    * repartition-stable, and a DuckDB recursive CTE replays it exactly.
    *
    * Scale shape: BFD is inherently SEQUENTIAL within a shard (each
    * assignment depends on every prior one), so this is the library's
    * one sanctioned `mapPartitions` — narrow (id, shard, tokens) triples
    * only (never the text), one shuffle to co-locate shards, parallelism
    * = `shards` (size ≈ cluster cores), per-doc cost O(log bins) via a
    * treemap keyed on bin fill. Null token counts pack as 0.
    *
    * @return (doc_id, shard, n_tokens, pack_id, pack_pos) — `pack_pos`
    *         is the document's 1-based assignment order inside its pack
    */
  def packBestFit(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1, "shards must be positive")
    val t = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(t.typeName),
      s"packBestFit requires an integral $idCol (got ${t.typeName})")
    val spark = df.sparkSession
    import spark.implicits._
    val triples = df.select(
        col(idCol).cast("long").as("doc_id"),
        (col(idCol) % shards).cast("long").as("shard"),
        coalesce(tokenCount.cast("long"), lit(0L)).as("n_tokens"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
    triples.mapPartitions { it =>
      // per-shard state, reset at each shard boundary (shards are
      // contiguous under the sort; several shards may share a partition)
      var curShard = Long.MinValue
      var opened = false
      var nextBin = 0L
      val binUsed = scala.collection.mutable.HashMap.empty[Long, Long]
      val binCount = scala.collection.mutable.HashMap.empty[Long, Long]
      // fill -> open bin ids at that fill (sorted, so ties pick min id)
      val byUsed = new java.util.TreeMap[Long, java.util.TreeSet[Long]]
      it.map { case (docId, shard, nTokens) =>
        if (!opened || shard != curShard) {
          curShard = shard; opened = true; nextBin = 0L
          binUsed.clear(); binCount.clear(); byUsed.clear()
        }
        val entry = byUsed.floorEntry(budget - nTokens)
        val bin =
          if (entry == null) { val b = nextBin; nextBin += 1; b }
          else {
            val b = entry.getValue.first()
            entry.getValue.remove(b)
            if (entry.getValue.isEmpty) byUsed.remove(entry.getKey)
            b
          }
        val newUsed = binUsed.getOrElse(bin, 0L) + nTokens
        binUsed(bin) = newUsed
        byUsed.computeIfAbsent(newUsed, _ => new java.util.TreeSet[Long]).add(bin)
        val pos = binCount.getOrElse(bin, 0L) + 1L
        binCount(bin) = pos
        (docId, shard, nTokens, bin, pos)
      }
    }.toDF("doc_id", "shard", "n_tokens", "pack_id", "pack_pos")
  }

  /** Group-atomic best-fit-decreasing packing — [[packGroups]]' atomicity
    * with [[packBestFit]]'s election: groups pack as units by their token
    * totals in (total DESC, group key ASC, group ASC) order into the
    * fullest feasible open bin (min-bin-id ties; a group larger than the
    * budget overflows its own bin), then the assignment joins back to
    * rows null-safely. Deterministic under the pinned total order (the
    * group column breaks grp_key ties, so two groups sharing a min doc id
    * cannot swap), repartition-stable, and replayable by the same
    * recursive-CTE oracle shape as the row form.
    *
    * Scale: one groupBy of (group, n_tokens) pairs, the sequential BFD
    * over GROUP rows (group count ≪ row count; parallelism = shards),
    * one join back on the group key. The payload never moves.
    *
    * A group whose doc ids are ALL null has a null `grp_key` and so a
    * null shard; like [[packGroups]] it packs (alone, deterministically)
    * in the null shard instead of NPE-ing inside the state machine.
    *
    * @return (doc_id, grp, shard, pack_id, pack_pos) — one row per input
    *         row; `pack_pos` is the GROUP's 1-based assignment order
    *         inside its pack (shared by all rows of the group), the
    *         [[packBestFit]] contract at group granularity
    */
  def packGroupsBestFit(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      tokenCount: Column,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1, "shards must be positive")
    // fail fast at the API boundary like packBestFit: a non-integral id
    // makes grp_key % shards null for EVERY group, and the Row-based
    // state machine below reads shard as a primitive long (packGroups
    // tolerates null shards because it stays in DataFrame land)
    val t = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(t.typeName),
      s"packGroupsBestFit requires an integral $idCol (got ${t.typeName})")
    val rows = df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      tokenCount.as("n_tokens"))
    val groups = rows.groupBy("grp")
      .agg(coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("grp_tokens"),
        min(col("doc_id")).as("grp_key"))
    val sorted = groups
      .withColumn("shard", (col("grp_key") % shards).cast("long"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("grp_tokens").desc,
        col("grp_key"), col("grp"))
    // Row-generic mapPartitions (grp may be any orderable type, incl.
    // null): rows arrive in the pinned order, the bin state machine is
    // the packBestFit one keyed per shard
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(
          "pack_id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField(
          "pack_pos", org.apache.spark.sql.types.LongType, nullable = false)))
    val iShard = sorted.schema.fieldIndex("shard")
    val iTokens = sorted.schema.fieldIndex("grp_tokens")
    val packed = sorted.mapPartitions { it =>
      var curShard = Long.MinValue
      var opened = false
      var nextBin = 0L
      val binUsed = scala.collection.mutable.HashMap.empty[Long, Long]
      val binCount = scala.collection.mutable.HashMap.empty[Long, Long]
      val byUsed = new java.util.TreeMap[Long, java.util.TreeSet[Long]]
      it.map { r =>
        // an all-null-id group's shard is null (scaladoc); key its state
        // under a sentinel no real `grp_key % shards` value can take
        val shard = if (r.isNullAt(iShard)) Long.MinValue + 1 else r.getLong(iShard)
        val t = r.getLong(iTokens)
        if (!opened || shard != curShard) {
          curShard = shard; opened = true; nextBin = 0L
          binUsed.clear(); binCount.clear(); byUsed.clear()
        }
        val entry = byUsed.floorEntry(budget - t)
        val bin =
          if (entry == null) { val b = nextBin; nextBin += 1; b }
          else {
            val b = entry.getValue.first()
            entry.getValue.remove(b)
            if (entry.getValue.isEmpty) byUsed.remove(entry.getKey)
            b
          }
        val newUsed = binUsed.getOrElse(bin, 0L) + t
        binUsed(bin) = newUsed
        byUsed.computeIfAbsent(newUsed, _ => new java.util.TreeSet[Long]).add(bin)
        val pos = binCount.getOrElse(bin, 0L) + 1L
        binCount(bin) = pos
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin :+ pos)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // null-safe group join (the packGroups contract): a NULL group is a
    // real group; a using-join would silently drop its rows
    rows.select("doc_id", "grp")
      .join(packed.select(col("grp").as("__g"), col("shard"), col("pack_id"),
          col("pack_pos")),
        col("grp") <=> col("__g"))
      .select("doc_id", "grp", "shard", "pack_id", "pack_pos")
  }

  /** Per-pack roll-up of a [[packSequences]] assignment: document count,
    * token total, and fill ratio against the budget (>1 = the pack's last
    * document overflowed). */
  def packSummary(assignment: DataFrame, budget: Long): DataFrame =
    assignment.groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_total"))
      .withColumn("fill_ratio",
        round(col("tokens_total").cast("double") / budget.toDouble, 6))
}
