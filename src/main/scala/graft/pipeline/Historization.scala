package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.Currents
import graft.operators.{Cdc, MetaEnrichment}
import graft.sources.Store

/** Append-only meta-column historization: the reference's production path.
  *
  * Re-expresses `meta_column_historization` + `simulate_runs`
  * (main.py:14-34): enrich the new snapshot with meta columns, anti-join
  * against the current store on (KEY_HASH, RECORD_HASH), append the delta,
  * rewrite the store.
  *
  * One lazy Spark plan per run: scan → withColumn chain → left_anti join →
  * unionByName → partitioned write. The reference's pandas↔SQLite
  * round-trip (main.py:22) disappears; the only exchange is the anti-join
  * (broadcast when the new snapshot is small, AQE decides) and the write.
  *
  * Determinism: callers inject `loadTs` per run instead of the reference's
  * `time.sleep(2)` (main.py:31) — same effect (distinct second-granularity
  * run ids), reproducible.
  */
object Historization {

  /** One incremental run: returns the updated store content and persists it.
    *
    * @param newData the already-read new snapshot (business columns only)
    * @param storePath current-store location (partitioned Parquet)
    * @param keyColumns business-key columns (also the store partitioning)
    * @param loadTs injected run timestamp `yyyy-MM-dd HH:mm:ss`; None = wall clock
    */
  def historizeRun(
      spark: SparkSession,
      newData: DataFrame,
      storePath: String,
      keyColumns: Seq[String],
      loadTs: Option[String] = None,
      recordHashExclude: Seq[String] = Nil): DataFrame = {
    val currents = loadTs.map(Currents(_)).getOrElse(Currents.now())
    val enriched = MetaEnrichment.addMetaColumns(newData, currents, keyColumns, recordHashExclude)

    Store.readParquetSafe(spark, storePath) match {
      case None =>
        // Bootstrap: no current store yet (main.py:20-21) — everything is delta.
        Store.writeStore(enriched, storePath, keyColumns)
      case Some(stored) =>
        val current = Store.canonicalize(stored, enriched.schema)
        val delta   = Cdc.delta(current, enriched)
        val updated = current.unionByName(delta)
        // The plan reads storePath; swap-write avoids overwrite-while-reading.
        Store.writeStoreSwap(updated, storePath, keyColumns)
    }
    Store.readParquetSafe(spark, storePath).get
  }

  /** [[historizeRun]] against a catalog BUCKETED table instead of a path —
    * the production write path at scale. Run N's store is a
    * `bucketBy(KEY_HASH)` table, so run N+1's delta anti-join reads the
    * accumulated store with NO Exchange (the bucketed scan IS the shuffle
    * output; only the incoming snapshot is exchanged), and the updated
    * generation lands via [[Store.writeStoreTableSwap]] — materialize to
    * `__swap`, then an atomic catalog rename. The 100 TB shape: per run,
    * the store payload never moves; shuffle volume is O(snapshot), not
    * O(accumulated store).
    */
  def historizeRunTable(
      spark: SparkSession,
      newData: DataFrame,
      table: String,
      keyColumns: Seq[String],
      loadTs: Option[String] = None,
      buckets: Int = 256,
      recordHashExclude: Seq[String] = Nil): DataFrame = {
    val currents = loadTs.map(Currents(_)).getOrElse(Currents.now())
    val enriched = MetaEnrichment.addMetaColumns(newData, currents, keyColumns, recordHashExclude)
    if (!spark.catalog.tableExists(table)) {
      // Bootstrap (main.py:20-21): everything is delta.
      Store.writeStoreTable(enriched, table, buckets)
    } else {
      val current = Store.canonicalize(Store.readStoreTable(spark, table), enriched.schema)
      // deltaBucketed, not delta: the pair-keyed anti-join would re-shuffle
      // the store (bucketing is KEY_HASH-only); the re-keyed form reads the
      // store with zero Exchange (StoreSpec pins this on the actual plan)
      val delta = Cdc.deltaBucketed(current, enriched)
      Store.writeStoreTableSwap(current.unionByName(delta), table, buckets)
    }
    Store.readStoreTable(spark, table)
  }

  /** Multi-run driver (main.py:26-34): reset the store, feed each snapshot
    * in order with its injected timestamp, return the final store. */
  def simulateRuns(
      spark: SparkSession,
      runs: Seq[(DataFrame, String)],
      storePath: String,
      keyColumns: Seq[String]): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storePath), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(storePath), true)
    runs.foreach { case (df, loadTs) => historizeRun(spark, df, storePath, keyColumns, Some(loadTs)) }
    Store.readParquetSafe(spark, storePath).get
  }

  /** Pure (storage-free) variant of one run's transform: enrich + delta +
    * append, without persisting. This is the unit the driver's oracle can
    * check and the composable core for `foreachBatch` streaming
    * historization. */
  def historizeFrames(
      current: DataFrame,
      newData: DataFrame,
      currents: Currents,
      keyColumns: Seq[String],
      recordHashExclude: Seq[String] = Nil): DataFrame = {
    val enriched = MetaEnrichment.addMetaColumns(newData, currents, keyColumns, recordHashExclude)
    current.unionByName(Cdc.delta(current, enriched))
  }
}
