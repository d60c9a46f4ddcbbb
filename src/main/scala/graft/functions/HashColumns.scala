package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.meta.MetaColumns

/** Hash-column enrichment: md5 digests over concatenated column values.
  *
  * Re-expresses the reference's `add_hash_column` / `add_key_hash` /
  * `add_record_hash` (src/PandasETLHelpers/MetaColumnHelpers.py:91-128) as a
  * single codegen'd Spark expression: `md5(concat_ws("#?", casts...))`. The
  * reference stringifies each column with pandas `astype(str)` and then applies a
  * per-row Python md5 lambda; here the whole thing stays inside whole-stage
  * codegen — no UDF, no serialization boundary.
  *
  * Null parity (SURVEY.md §7.4#1): pandas renders missing values as the
  * string "nan", while Spark's `concat_ws` silently *skips* nulls (which
  * would change the joined string arity). We therefore wrap every input in
  * `coalesce(cast(c as string), 'nan')`. DuckDB oracle SQL must mirror the
  * same `COALESCE(CAST(c AS VARCHAR), 'nan')`.
  */
object HashColumns {

  /** The hash-input expression for one column: stringified, null→"nan". */
  def stringified(c: Column): Column = coalesce(c.cast("string"), lit(MetaColumns.NullToken))

  /** md5 over the `#?`-joined, stringified values of `columns`. */
  def hashExpr(columns: Seq[Column]): Column =
    md5(concat_ws(MetaColumns.HashSeparator, columns.map(stringified): _*))

  /** Append `hashColumnName` = md5 of the `#?`-joined values of `columns`
    * (MetaColumnHelpers.py:91-97). */
  def addHashColumn(df: DataFrame, columns: Seq[String], hashColumnName: String): DataFrame = {
    require(columns.nonEmpty, s"hash column $hashColumnName needs at least one input column")
    df.withColumn(hashColumnName, hashExpr(columns.map(col)))
  }

  /** Append KEY_HASH over the business-key columns (MetaColumnHelpers.py:108-110). */
  def addKeyHash(df: DataFrame, keyColumns: Seq[String]): DataFrame =
    addHashColumn(df, keyColumns, MetaColumns.KeyHash)

  /** Append RECORD_HASH over all business columns — every column except the
    * ten meta columns and the caller's excludes; key columns ARE included
    * (MetaColumnHelpers.py:122-128). */
  def addRecordHash(df: DataFrame, excludeColumns: Seq[String] = Nil): DataFrame = {
    val drop = MetaColumns.allSet ++ excludeColumns
    addHashColumn(df, df.columns.filterNot(drop).toSeq, MetaColumns.RecordHash)
  }
}
