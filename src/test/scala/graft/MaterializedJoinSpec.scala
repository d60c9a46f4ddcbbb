package graft

import org.apache.spark.sql.functions._

import graft.operators.MaterializedJoin

class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def li = graft.sources.Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_linenumber", "l_quantity")
  private def ord = graft.sources.Tables.orders(spark, sfDir)
    .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("insert deltas union to the from-scratch join, in any batching") {
    val keys = Seq("l_orderkey")
    val full = li.join(ord, keys)

    // batching A: left in 2, right in 3, interleaved arrivals
    val lB = (0 until 2).map(i => li.filter(pmod(col("l_orderkey"), lit(2)) === i))
    val rB = (0 until 3).map(i => ord.filter(pmod(col("l_orderkey"), lit(3)) === i))
    val a1 = MaterializedJoin.insertDelta(li.limit(0), lB(0), ord.limit(0), rB(0), keys)
    val a2 = MaterializedJoin.insertDelta(lB(0), lB(1), rB(0), rB(1), keys)
    val a3 = MaterializedJoin.insertDelta(lB(0).unionByName(lB(1)), li.limit(0),
      rB(0).unionByName(rB(1)), rB(2), keys)
    assert(rows(a1.unionByName(a2).unionByName(a3)) === rows(full))

    // batching B: everything in one batch against empty standing sides
    val b1 = MaterializedJoin.insertDelta(li.limit(0), li, ord.limit(0), ord, keys)
    assert(rows(b1) === rows(full))
  }

  test("bag semantics: duplicate rows contribute multiplicities, not sets") {
    val l = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "lv")
    val r = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "rv")
    val dl = Seq((1L, "a")).toDF("k", "lv") // a THIRD copy of an existing row
    val delta = MaterializedJoin.insertDelta(l, dl, r, r.limit(0), Seq("k"))
    // the new left copy joins both standing right matches: exactly 2 rows
    assert(delta.count() === 2)
    val view = l.join(r, Seq("k")).unionByName(delta)
    assert(rows(view) === rows(l.unionByName(dl).join(r, Seq("k"))))
  }

  test("retractByIds removes exactly the provenance-matched view rows") {
    val view = li.join(ord, Seq("l_orderkey"))
    val deleted = li.filter(col("l_linenumber") === 3)
    val retracted = MaterializedJoin.retractByIds(
      view, deleted, Seq("l_orderkey", "l_linenumber"))
    val recompute = li.filter(col("l_linenumber") =!= 3).join(ord, Seq("l_orderkey"))
    assert(rows(retracted) === rows(recompute))
    assert(retracted.count() < view.count())
  }

  test("append-only store + tombstones: readView equals the maintained statement") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mjoin").toString
    val path = s"$dir/join"
    val tombs = s"$dir/tombstones"
    val keys = Seq("l_orderkey")
    val lB = (0 until 2).map(i => li.filter(pmod(col("l_orderkey"), lit(2)) === i))

    assert(MaterializedJoin.readView(spark, path).isEmpty)
    MaterializedJoin.appendDelta(path, 0L,
      MaterializedJoin.insertDelta(li.limit(0), lB(0), ord.limit(0), ord, keys))
    MaterializedJoin.appendDelta(path, 1L,
      MaterializedJoin.insertDelta(lB(0), lB(1), ord, ord.limit(0), keys))
    val view = MaterializedJoin.readView(spark, path).get
    assert(rows(view) === rows(li.join(ord, keys)))

    // a re-delivered batch id overwrites its partition — idempotent
    MaterializedJoin.appendDelta(path, 1L,
      MaterializedJoin.insertDelta(lB(0), lB(1), ord, ord.limit(0), keys))
    assert(rows(MaterializedJoin.readView(spark, path).get) === rows(li.join(ord, keys)))

    // merge-on-read delete: tombstone left rows, physical rows untouched
    li.filter(col("l_linenumber") === 3).select("l_orderkey", "l_linenumber")
      .write.parquet(s"$tombs/ingest_batch=0")
    val masked = MaterializedJoin.readView(
      spark, path, Some(tombs), Seq("l_orderkey", "l_linenumber")).get
    assert(rows(masked) ===
      rows(li.filter(col("l_linenumber") =!= 3).join(ord, keys)))
    // the un-tombstoned view still reads everything (rows really stayed)
    assert(MaterializedJoin.readView(spark, path).get.count() === li.join(ord, keys).count())
  }

  test("refreshDimension: updated, inserted, and unmatched dim keys all converge") {
    val l = Seq((1L, "f1"), (1L, "f1b"), (2L, "f2"), (3L, "f3")).toDF("k", "fact")
    val dim0 = Seq((1L, "old1"), (2L, "old2")).toDF("k", "attr")
    val view = l.join(dim0, Seq("k"))
    // key 1 updated, key 3 newly appears in the dimension
    val updated = Seq((1L, "new1"), (3L, "new3")).toDF("k", "attr")
    val refreshed = MaterializedJoin.refreshDimension(view, l, updated, Seq("k"))
    val recompute = l.join(
      Seq((1L, "new1"), (2L, "old2"), (3L, "new3")).toDF("k", "attr"), Seq("k"))
    assert(rows(refreshed) === rows(recompute))
    // a second refresh with the same rows is idempotent
    assert(rows(MaterializedJoin.refreshDimension(refreshed, l, updated, Seq("k"))) ===
      rows(recompute))
  }

  test("insertDeltaStar folds the fact batch across all dimensions") {
    val part = graft.sources.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
    val liFull = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val b = (0 until 3).map(i => liFull.filter(pmod(col("l_orderkey"), lit(3)) === i))
    val dims = Seq((ord, Seq("l_orderkey")), (part, Seq("l_partkey")))
    val maintained = b.map(MaterializedJoin.insertDeltaStar(_, dims)).reduce(_ unionByName _)
    val full = liFull.join(ord, Seq("l_orderkey")).join(part, Seq("l_partkey"))
    assert(maintained.count() === full.count())
    assert(maintained.exceptAll(full).count() === 0)
    // both dimension probes broadcast the (growing) fact side
    val plan = MaterializedJoin.insertDeltaStar(liFull.limit(30), dims)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"dimensions must not shuffle:\n$plan")
  }

  test("applyTombstones physically drops masked rows, clears tombstones, stays appendable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mjoin_ct").toString
    val path = s"$dir/join"
    val tombs = s"$dir/tombstones"
    val keys = Seq("l_orderkey")
    val idc = Seq("l_orderkey", "l_linenumber")
    MaterializedJoin.appendDelta(path, 0L,
      MaterializedJoin.insertDelta(li.limit(0), li, ord.limit(0), ord, keys))
    li.filter(col("l_linenumber") === 3).select(idc.map(col): _*)
      .write.parquet(s"$tombs/ingest_batch=0")
    val maskedBefore = rows(MaterializedJoin.readView(spark, path, Some(tombs), idc).get)

    MaterializedJoin.applyTombstones(spark, path, tombs, idc)
    // rows physically gone: the UNMASKED view now equals the masked one
    assert(rows(MaterializedJoin.readView(spark, path).get) === maskedBefore)
    // tombstone store cleared
    assert(graft.sources.Store.readParquetSafe(spark, tombs).isEmpty)
    // re-run with no tombstones is a no-op
    MaterializedJoin.applyTombstones(spark, path, tombs, idc)
    assert(rows(MaterializedJoin.readView(spark, path).get) === maskedBefore)
    // the compacted store still accepts later batch appends
    val extra = li.filter(col("l_linenumber") === 1).limit(10)
    MaterializedJoin.appendDelta(path, 7L,
      MaterializedJoin.insertDeltaLeft(extra, ord, keys, broadcastDelta = false))
    assert(MaterializedJoin.readView(spark, path).get.count() ===
      maskedBefore.size + extra.join(ord, keys).count())
  }

  test("tombstone compaction applies and deletes ONLY the listed batches") {
    // the concurrent-append race: a tombstone batch appended AFTER the
    // compaction listed the store must survive the compaction's delete
    // (and keep masking) — simulated by handing the core a stale listing
    val dir = java.nio.file.Files.createTempDirectory("graft_mjoin_race").toString
    val path = s"$dir/join"
    val tombs = s"$dir/tombstones"
    val keys = Seq("l_orderkey")
    val idc = Seq("l_orderkey", "l_linenumber")
    MaterializedJoin.appendDelta(path, 0L,
      MaterializedJoin.insertDelta(li.limit(0), li, ord.limit(0), ord, keys))
    li.filter(col("l_linenumber") === 3).select(idc.map(col): _*)
      .write.parquet(s"$tombs/ingest_batch=0")
    // "concurrent" batch 1 lands after the (stale) listing below was taken
    li.filter(col("l_linenumber") === 4).select(idc.map(col): _*)
      .write.parquet(s"$tombs/ingest_batch=1")
    MaterializedJoin.applyTombstoneBatches(spark, path, idc,
      Seq(s"$tombs/ingest_batch=0"))
    // batch 0 applied physically; batch 1 NOT applied but still standing
    assert(rows(MaterializedJoin.readView(spark, path).get) ===
      rows(li.filter(col("l_linenumber") =!= 3).join(ord, keys)))
    assert(new java.io.File(s"$tombs/ingest_batch=1").exists())
    assert(!new java.io.File(s"$tombs/ingest_batch=0").exists())
    // the surviving batch keeps masking at read until the next compaction
    assert(rows(MaterializedJoin.readView(spark, path, Some(tombs), idc).get) ===
      rows(li.filter(col("l_linenumber") =!= 3)
        .filter(col("l_linenumber") =!= 4).join(ord, keys)))
    // the next full pass picks it up and converges
    MaterializedJoin.applyTombstones(spark, path, tombs, idc)
    assert(rows(MaterializedJoin.readView(spark, path).get) ===
      rows(li.filter(col("l_linenumber") =!= 3)
        .filter(col("l_linenumber") =!= 4).join(ord, keys)))
    assert(graft.sources.Store.readParquetSafe(spark, tombs).isEmpty)
  }

  test("tombstone compaction never deletes a listed batch it could not read") {
    // the in-flight-write race: the listing can catch a tombstone batch
    // mid-write (directory exists, no committed parquet footer yet).
    // Its ids were never applied, so deleting it would resurrect the
    // rows it masks — the batch must survive untouched for the next pass
    val dir = java.nio.file.Files.createTempDirectory("graft_mjoin_inflight").toString
    val path = s"$dir/join"
    val tombs = s"$dir/tombstones"
    val keys = Seq("l_orderkey")
    val idc = Seq("l_orderkey", "l_linenumber")
    MaterializedJoin.appendDelta(path, 0L,
      MaterializedJoin.insertDelta(li.limit(0), li, ord.limit(0), ord, keys))
    li.filter(col("l_linenumber") === 3).select(idc.map(col): _*)
      .write.parquet(s"$tombs/ingest_batch=0")
    // batch 1 is "in flight": directory listed, content not yet readable
    val inflight = new java.io.File(s"$tombs/ingest_batch=1")
    assert(inflight.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tombs/ingest_batch=1/part-00000.parquet"),
      "not a parquet footer".getBytes("UTF-8"))
    MaterializedJoin.applyTombstones(spark, path, tombs, idc)
    // the readable batch applied and was deleted; the unreadable one
    // was neither applied nor destroyed
    assert(rows(MaterializedJoin.readView(spark, path).get) ===
      rows(li.filter(col("l_linenumber") =!= 3).join(ord, keys)))
    assert(!new java.io.File(s"$tombs/ingest_batch=0").exists())
    assert(inflight.exists(), "in-flight tombstone batch must survive the compaction")
  }

  test("delta joins broadcast the delta, never shuffle the standing side") {
    val keys = Seq("l_orderkey")
    val delta = li.limit(50)
    val plan = MaterializedJoin.insertDeltaLeft(delta, ord, keys)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"standing side must not shuffle:\n$plan")
  }
}
