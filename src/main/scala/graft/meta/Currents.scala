package graft.meta

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Run context: run id, run day and run timestamp.
  *
  * Mirrors `create_currents` (src/PandasETLHelpers/MetaColumnHelpers.py:63-78).
  * The `loadTs` injection — an explicit `"yyyy-MM-dd HH:mm:ss"` string instead
  * of the wall clock — is the determinism hook the reference already supports
  * and the one we rely on for oracle/bench reproducibility (SURVEY.md §7.4#3).
  *
  * Deviation recorded: the reference formats CURRENT_RUN_DAY with the full
  * timestamp format (`MetaColumnHelpers.py:68,75`), yielding
  * `"yyyy-MM-dd 00:00:00"`, which its own SCD2 code immediately re-normalizes
  * through `date_format(..., 'yyyy-MM-dd')` (SCDHelpers.py:158,192,208). We
  * emit the clean day string directly.
  *
  * @param runId run identifier, `yyyyMMddHHmmss` (second granularity)
  * @param runDay calendar day of the run, `yyyy-MM-dd`
  * @param runTs run timestamp, `yyyy-MM-dd HH:mm:ss`
  */
final case class Currents(runId: String, runDay: String, runTs: String)

object Currents {
  private val tsFmt    = DateTimeFormatter.ofPattern(MetaColumns.TsFormat)
  private val runIdFmt = DateTimeFormatter.ofPattern(MetaColumns.RunIdFormat)
  private val dayFmt   = DateTimeFormatter.ofPattern(MetaColumns.DayFormat)

  /** Build a run context from an injected load timestamp (deterministic). */
  def apply(loadTs: String): Currents = fromDateTime(LocalDateTime.parse(loadTs, tsFmt))

  /** Build a run context from the wall clock (reference default behavior). */
  def now(): Currents = fromDateTime(LocalDateTime.now())

  private def fromDateTime(dt: LocalDateTime): Currents =
    Currents(runId = dt.format(runIdFmt), runDay = dt.format(dayFmt), runTs = dt.format(tsFmt))
}
