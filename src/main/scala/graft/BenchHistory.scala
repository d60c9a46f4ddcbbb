package graft

/** Committed per-query bench history (VERDICT r17 item 1a): every full
  * bench run appends its complete JSON line — all per-query mins — to
  * `bench_history/runs.jsonl`, which IS under version control (unlike
  * `bench_last.json`, whose gitignore entry is how rounds 1–16's
  * per-query maps were lost and why r17's +20 s tiered-SCD2 move could
  * not be decomposed from artifacts). [[Bench]] reads the most recent
  * run at the same sf dir back through [[lastFullRun]] to emit the
  * per-query drift table, turning round-over-round regression hunting
  * from prose archaeology into a machine check.
  *
  * Parsing is a bounded regex over the flat `"queries":{...}` object —
  * no JSON dependency (the build is offline), and the object is flat
  * name→number by construction.
  */
object BenchHistory {

  private val HistoryFile = java.nio.file.Paths.get("bench_history/runs.jsonl")

  /** Append one full bench JSON line; never throws (history is telemetry,
    * not a gate — a read-only checkout must not fail the bench). */
  def append(json: String): Unit =
    try {
      val dir = HistoryFile.getParent
      if (dir != null) java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(HistoryFile, (json + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      ()
    } catch { case _: Throwable => () }

  private val QueriesField = "\"queries\":\\{([^}]*)\\}".r
  private val Pair = "\"([^\"]+)\":([-+0-9.Ee]+)".r

  /** The per-query min map of the LATEST recorded CLEAN run at `sfDir`;
    * None when no history or no matching run. Runs with errors are
    * skipped as baselines: their `queries` map carries PENALTY values
    * (≥ 60 s) for the failed rows, and diffing real mins against
    * penalties would flood the tripwire with false movers. */
  def lastFullRun(sfDir: String): Option[Map[String, Double]] =
    try {
      if (!java.nio.file.Files.exists(HistoryFile)) None
      else {
        val lines = java.nio.file.Files.readAllLines(HistoryFile)
        import scala.jdk.CollectionConverters._
        lines.asScala.reverseIterator
          .find(l => l.contains("\"sf\":\"" + sfDir + "\"") &&
            l.contains("\"errors\":{}") && !l.contains("\"only\":"))
          .flatMap(l => QueriesField.findFirstMatchIn(l).map(_.group(1)))
          .map(body => Pair.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap)
          .filter(_.nonEmpty)
      }
    } catch { case _: Throwable => None }
}
