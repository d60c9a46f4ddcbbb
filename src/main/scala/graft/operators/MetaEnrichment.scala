package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.functions.HashColumns
import graft.meta.{Currents, MetaColumns}

/** Meta-column enrichment: hashes + audit literals.
  *
  * Re-expresses `add_meta_columns`
  * (src/PandasETLHelpers/MetaColumnHelpers.py:141-152): KEY_HASH,
  * RECORD_HASH, INSERT_TS/UPDATE_TS (both the run timestamp),
  * INSERT_RUN_ID/UPDATE_RUN_ID (both the run id) and DELETED — a deletion
  * *timestamp*, initialized null (the reference's `pd.to_datetime('')` ==
  * NaT), not a boolean flag.
  *
  * All literal columns constant-fold in Catalyst; the only real computation
  * is the two md5 digests, which stay in whole-stage codegen.
  */
object MetaEnrichment {

  /** Append the seven live meta columns to a snapshot frame.
    *
    * @param keyColumns business-key columns, hashed into KEY_HASH
    * @param recordHashExclude columns to leave out of RECORD_HASH (meta
    *   columns are always excluded; key columns are always included)
    */
  def addMetaColumns(
      df: DataFrame,
      currents: Currents,
      keyColumns: Seq[String],
      recordHashExclude: Seq[String] = Nil): DataFrame = {
    val hashed = HashColumns.addRecordHash(HashColumns.addKeyHash(df, keyColumns), recordHashExclude)
    hashed
      .withColumn(MetaColumns.InsertTs, lit(currents.runTs).cast(TimestampType))
      .withColumn(MetaColumns.UpdateTs, lit(currents.runTs).cast(TimestampType))
      .withColumn(MetaColumns.InsertRunId, lit(currents.runId))
      .withColumn(MetaColumns.UpdateRunId, lit(currents.runId))
      .withColumn(MetaColumns.Deleted, lit(null).cast(TimestampType))
  }

  /** Opt-in SOURCE_FILE_NAME stamp. The reference declares the column but
    * never populates it (MetaColumnHelpers.py:28) — [[addMetaColumns]]
    * faithfully leaves it absent. This helper fills the gap for file-based
    * snapshots: `input_file_name()` resolves per-row from the scan, so it
    * must run while the lineage still reaches the file source — apply it
    * directly over the read, before any exchange (a join, limit, or
    * repartition yields empty strings past its shuffle). Record hashes never include meta columns,
    * so stamping does not perturb change detection. */
  def withSourceFileName(df: DataFrame): DataFrame =
    df.withColumn(MetaColumns.SourceFileName, input_file_name())
}
