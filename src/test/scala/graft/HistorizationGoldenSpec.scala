package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.meta.MetaColumns
import graft.pipeline.Historization
import graft.sources.Store

/** Golden end-to-end scenario from the reference (main.py:36-55): feeding
  * the grades snapshots (delta feed and full feed) through two historization
  * runs converges to the same 17-row versioned store — 13 unchanged + 2 new
  * keys + 2 versions of Franklin,Benny. Fixtures read straight from the
  * read-only reference checkout.
  */
class HistorizationGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/data"
  private val keys = Seq("Lastname", "Firstname")
  private val ts1 = "2024-01-01 10:00:00"
  private val ts2 = "2024-01-02 10:00:00"

  private def runScenario(files: Seq[String]): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-golden").toString + "/current.parquet"
    val runs = files.zip(Seq(ts1, ts2)).map { case (f, ts) =>
      (Store.readCsv(spark, s"$refData/$f"), ts)
    }
    Historization.simulateRuns(spark, runs, dir, keys)
  }

  private def check(finalDf: org.apache.spark.sql.DataFrame): Unit = {
    assert(finalDf.count() === 17)
    val franklin = finalDf.filter($"Lastname" === "Franklin" && $"Firstname" === "Benny")
    assert(franklin.count() === 2)
    assert(franklin.select(MetaColumns.KeyHash).distinct().count() === 1)
    assert(franklin.select(MetaColumns.RecordHash).distinct().count() === 2)
    // two runs → two distinct insert run ids across the store
    assert(finalDf.select(MetaColumns.InsertRunId).distinct().count() === 2)
  }

  test("delta-feed scenario converges to the 17-row golden store") {
    if (Files.exists(java.nio.file.Paths.get(refData))) {
      check(runScenario(Seq("grades_delta_old.csv", "grades_delta_new.csv")))
    } else cancel("reference fixtures not available")
  }

  test("full-feed scenario converges to the same golden store") {
    if (Files.exists(java.nio.file.Paths.get(refData))) {
      val delta = runScenario(Seq("grades_delta_old.csv", "grades_delta_new.csv"))
      val full  = runScenario(Seq("grades_full_old.csv", "grades_full_new.csv"))
      check(full)
      // business content identical across feeds (meta stamps aside)
      val bizCols = full.columns.filterNot(MetaColumns.allSet).sorted.map(col).toSeq
      val d = delta.select(bizCols: _*).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq
      val f = full.select(bizCols: _*).collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString).toSeq
      assert(d === f)
    } else cancel("reference fixtures not available")
  }

  test("re-feeding an identical snapshot appends nothing (idempotence)") {
    if (Files.exists(java.nio.file.Paths.get(refData))) {
      val dir = Files.createTempDirectory("graft-idem").toString + "/current.parquet"
      val df = Store.readCsv(spark, s"$refData/grades_full_old.csv")
      Historization.simulateRuns(spark, Seq((df, ts1), (df, ts2)), dir, keys)
      val finalDf = Store.readParquetSafe(spark, dir).get
      assert(finalDf.count() === 14)
    } else cancel("reference fixtures not available")
  }
}
