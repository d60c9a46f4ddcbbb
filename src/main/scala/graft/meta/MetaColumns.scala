package graft.meta

/** Meta-column names and SCD2 constants.
  *
  * Mirrors the reference's constant block
  * (src/PandasETLHelpers/MetaColumnHelpers.py:8-52): ten meta columns, the
  * SCD2 validity bounds, and the run-id / timestamp / day formats. Only the
  * Spark-side format strings are kept (the reference carries Python `%Y...`
  * duplicates purely for pandas).
  */
object MetaColumns {
  val KeyHash: String        = "KEY_HASH"
  val RecordHash: String     = "RECORD_HASH"
  val ValidFrom: String      = "VALID_FROM"
  val ValidTo: String        = "VALID_TO"
  val InsertTs: String       = "INSERT_TS"
  val UpdateTs: String       = "UPDATE_TS"
  val InsertRunId: String    = "INSERT_RUN_ID"
  val UpdateRunId: String    = "UPDATE_RUN_ID"
  val SourceFileName: String = "SOURCE_FILE_NAME"
  val Deleted: String        = "DELETED"

  /** All meta columns, in the reference's declaration order
    * (MetaColumnHelpers.py:19-30). Record-hash computation excludes these.
    */
  val all: Seq[String] = Seq(
    KeyHash, RecordHash, ValidFrom, ValidTo, InsertTs, UpdateTs,
    InsertRunId, UpdateRunId, SourceFileName, Deleted)

  val allSet: Set[String] = all.toSet

  /** Separator used between column values in hash input
    * (MetaColumnHelpers.py:94). */
  val HashSeparator: String = "#?"

  /** pandas `astype(str)` renders NaN/None as "nan"; we reproduce that for
    * hash parity (MetaColumnHelpers.py:93-96, see SURVEY.md §7.4#1). */
  val NullToken: String = "nan"

  /** SCD2 validity bounds (MetaColumnHelpers.py:51-52). */
  val Scd2LowerBound: String = "1900-01-01"
  val Scd2UpperBound: String = "9999-12-31"

  /** Run-id / timestamp / day formats (MetaColumnHelpers.py:43-49). */
  val RunIdFormat: String = "yyyyMMddHHmmss"
  val TsFormat: String    = "yyyy-MM-dd HH:mm:ss"
  val DayFormat: String   = "yyyy-MM-dd"
}
