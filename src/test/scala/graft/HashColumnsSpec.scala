package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.HashColumns
import graft.meta.MetaColumns

class HashColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("key hash matches precomputed md5 of '#?'-joined values") {
    val df = Seq(("Alfalfa", "Aloysius")).toDF("Lastname", "Firstname")
    val got = HashColumns.addKeyHash(df, Seq("Lastname", "Firstname"))
      .select(MetaColumns.KeyHash).as[String].head()
    assert(got === md5Hex("Alfalfa#?Aloysius"))
  }

  test("null values stringify as 'nan' (pandas astype(str) parity)") {
    val df = Seq(("a", Option.empty[String]), ("b", Some("x"))).toDF("c1", "c2")
    val got = HashColumns.addHashColumn(df, Seq("c1", "c2"), "H")
      .orderBy("c1").select("H").as[String].collect()
    assert(got(0) === md5Hex("a#?nan"))
    assert(got(1) === md5Hex("b#?x"))
  }

  test("doubles render with trailing .0 like pandas str()") {
    val df = Seq((40.0, "B+")).toDF("score", "grade")
    val got = HashColumns.addHashColumn(df, Seq("score", "grade"), "H")
      .select("H").as[String].head()
    assert(got === md5Hex("40.0#?B+"))
  }

  test("record hash excludes meta columns and caller excludes, keeps keys") {
    val df = Seq(("k", "v", "skip")).toDF("key", "value", "noise")
      .withColumn(MetaColumns.KeyHash, lit("deadbeef"))
    val got = HashColumns.addRecordHash(df, Seq("noise"))
      .select(MetaColumns.RecordHash).as[String].head()
    assert(got === md5Hex("k#?v"))
  }

  test("single-column hash") {
    val df = Seq(Tuple1("only")).toDF("c")
    val got = HashColumns.addHashColumn(df, Seq("c"), "H").select("H").as[String].head()
    assert(got === md5Hex("only"))
  }

  test("withSourceFileName stamps the per-row source file; hashes unaffected") {
    import graft.operators.MetaEnrichment
    import graft.meta.{Currents, MetaColumns}
    // stamp directly over the scan: an exchange (e.g. a limit's shuffle)
    // between the file source and input_file_name() yields empty strings
    val docs = MetaEnrichment.withSourceFileName(
      spark.read.parquet(s"$sfDir/documents.parquet")).limit(10)
    val enriched = MetaEnrichment.addMetaColumns(
      docs, Currents("2024-01-01 10:00:00"), Seq("doc_id"))
    val files = enriched.select(MetaColumns.SourceFileName).as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("documents.parquet")))
    // meta columns are excluded from RECORD_HASH, so stamping is hash-neutral
    val plain = MetaEnrichment.addMetaColumns(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(10),
      Currents("2024-01-01 10:00:00"), Seq("doc_id"))
    val a = enriched.select("doc_id", MetaColumns.RecordHash)
    val b = plain.select("doc_id", MetaColumns.RecordHash)
    assert(a.exceptAll(b).count() === 0)
  }
}
