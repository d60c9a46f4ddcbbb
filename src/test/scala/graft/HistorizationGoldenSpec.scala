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

  test("historizeFramesEvolving: a run that adds a column does not fork the store") {
    import graft.meta.Currents
    import graft.operators.{MetaEnrichment, SchemaEvolution}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val c1 = Currents(ts1); val c2 = Currents(ts2)
    val kcols = Seq("k")
    val run1 = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    val target = StructType(run1.schema.fields :+ StructField("src", StringType, nullable = true))
    // run 2: a re-delivered at the default (null src, same v) -> unchanged;
    // b carries a real src -> re-versions; c is new
    val run2 = Seq(("a", "1", Option.empty[String]), ("b", "2", Some("s2")),
      ("c", "3", Some("s2"))).toDF("k", "v", "src")
    val boot = MetaEnrichment.addMetaColumns(
      SchemaEvolution.prepareSchema(run1, target), c1, kcols).limit(0)
    val r1 = Historization.historizeFramesEvolving(boot, run1, c1, kcols, target)
    val r2 = Historization.historizeFramesEvolving(r1, run2, c2, kcols, target)
    val versions = r2.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(versions === Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
    // the evolved column is live: b's new version carries it
    val bSrc = r2.filter($"k" === "b" && $"INSERT_RUN_ID" === c2.runId)
      .select("src").as[Option[String]].head()
    assert(bSrc === Some("s2"))
  }

  test("historizeRunEvolving widens a store bootstrapped under an older schema") {
    import graft.meta.Currents
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft-evolve").toString + "/current.parquet"
    val kcols = Seq("k")
    val run1 = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    // bootstrap under the OLD schema (plain historizeRun, no src column)
    Historization.historizeRun(spark, run1, dir, kcols, Some(ts1))
    // run 2 mandates the widened schema
    val target = StructType(run1.schema.fields :+ StructField("src", StringType, nullable = true))
    val run2 = Seq(("a", "1", Option.empty[String]), ("c", "3", Some("s2")))
      .toDF("k", "v", "src")
    val out = Historization.historizeRunEvolving(spark, run2, dir, kcols, target, loadTs = Some(ts2))
    assert(out.columns.contains("src"))
    // pre-widening rows survive with a null default in the new column
    val r1Rows = out.filter($"INSERT_RUN_ID" === Currents(ts1).runId)
    assert(r1Rows.count() === 2)
    assert(r1Rows.filter($"src".isNull).count() === 2)
    // a, re-delivered unchanged, re-versions exactly ONCE (its record now
    // hashes with the widened column's default); c is new
    val versions = out.groupBy("k").count().as[(String, Long)].collect().toMap
    assert(versions === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("prepareSchema resolves case-drifted columns instead of defaulting over them") {
    import org.apache.spark.sql.types._
    // a case-sensitive existence check would classify "UserName" as
    // missing "username", and the default-literal withColumn (which
    // resolves case-insensitively) would REPLACE the real data
    val df = Seq(("alice", 1), ("bob", 2)).toDF("UserName", "v")
    val target = StructType(Seq(
      StructField("username", StringType, nullable = true),
      StructField("v", IntegerType, nullable = true)))
    val out = graft.operators.SchemaEvolution.prepareSchema(
      df, target, defaultValues = Map("username" -> "LOST"))
    assert(out.select("username").as[String].collect().sorted.toSeq ===
      Seq("alice", "bob"), "case-drifted column data must survive evolution")
    // a genuinely missing column still gets its default
    val out2 = graft.operators.SchemaEvolution.prepareSchema(
      df, StructType(target.fields :+ StructField("src", StringType, nullable = true)),
      defaultValues = Map("src" -> "feed1"))
    assert(out2.select("src").distinct().as[String].collect().toSeq === Seq("feed1"))
  }

  test("a coalesced batch with two payloads per key keeps one deterministic survivor") {
    import graft.streaming.StreamingHistorization
    val dir = Files.createTempDirectory("graft-hist-coalesce").toString
    // two snapshot drops coalesce into ONE micro-batch (no per-trigger
    // cap): key "a" arrives with two different payloads; a content-exact
    // dropDuplicates would append BOTH as current rows under one run id
    Seq(("a", "v1"), ("b", "x")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in/d0")
    Seq(("a", "v2")).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(
      Seq(("a", "b")).toDF("k", "v").schema).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.historizeStream(
      stream, s"$dir/store", Seq("k"), s"$dir/chk"))
    val store = Store.readParquetSafe(spark, s"$dir/store").get
    assert(store.filter($"k" === "a").count() === 1,
      "one key-unique survivor per batch, not one row per payload")
    // deterministic: the payload-order minimum survives
    assert(store.filter($"k" === "a").select("v").as[String].collect().toSeq === Seq("v1"))
  }
}
