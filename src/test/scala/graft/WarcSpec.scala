package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC/WET reader: fixture round-trip, the gzip-member-per-record
  * layout, and the malformed-record quarantine contract (one bad record
  * = one `parse_error` row, neighbors untouched — the
  * [[graft.operators.Multimodal]] error convention). */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_warc").toString
    graft.registry.Helpers.writeWarcFixture(d)
    d
  }

  private lazy val all = Warc.readWarc(spark, dir)
    .withColumn("fname", substring_index(col("file"), "/", -1))

  test("gzip member-per-record file parses every record with its headers") {
    val a = all.filter(col("fname") === "a.warc.gz")
      .orderBy("rec_idx")
      .select("rec_idx", "warc_type", "url", "mime", "parse_error", "text")
      .collect()
    assert(a.length === 8)
    assert(a.forall(_.isNullAt(4)), "no quarantined rows in the well-formed gz file")
    assert(a(0).getString(1) === "warcinfo" && a(0).isNullAt(2),
      "warcinfo record has no Target-URI — null url, not an error")
    assert(a(1).getString(2) === "https://w1.example.com/p1")
    assert(a(4).getString(5) === "", "zero-length payload round-trips as empty text")
    assert(a(5).getString(5) === "unicode payload: uüber straße 中文",
      "multi-byte UTF-8 payload survives the Content-Length byte accounting")
    assert(a(6).getString(1) === "response" && a(6).getString(3) === "text/html")
  }

  test("each malformed record quarantines alone at its rec_idx; neighbors parse") {
    val b = all.filter(col("fname") === "b.warc").orderBy("rec_idx")
      .select("rec_idx", "url", "parse_error").collect()
    assert(b.length === 7)
    val errs = b.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(errs.keySet === Set(0L, 2L, 4L, 6L),
      s"exactly the four malformed slots quarantine, got ${errs.keySet}")
    assert(errs(0L).startsWith("expected a WARC/ version line"))
    assert(errs(2L).startsWith("missing or invalid Content-Length"))
    assert(errs(4L).startsWith("malformed header line"))
    assert(errs(6L).startsWith("truncated payload"))
    // the good rows BETWEEN malformed records survive the resync
    val good = b.filter(_.isNullAt(2)).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(good === Map(
      1L -> "https://b1.example.com/p1",
      3L -> "https://b3.example.com/p3",
      5L -> "https://b5.example.com/page"))
  }

  test("readWet keeps exactly the good conversion records") {
    val wet = Warc.readWet(spark, dir)
      .select(substring_index(col("file"), "/", -1).as("fname"), col("rec_idx"))
      .as[(String, Long)].collect().toSet
    assert(wet === Set(("a.warc.gz", 1L), ("a.warc.gz", 2L), ("a.warc.gz", 3L),
      ("a.warc.gz", 4L), ("a.warc.gz", 5L), ("a.warc.gz", 7L),
      ("b.warc", 1L), ("b.warc", 3L)))
  }

  test("payload bytes round-trip exactly (binary surface, not just text)") {
    val body = all.filter(col("fname") === "a.warc.gz" && col("rec_idx") === 6)
      .select("payload").as[Array[Byte]].head()
    assert(new String(body, "UTF-8") === "<html><body>hello</body></html>")
  }

  test("an empty or headerless file yields no rows, never throws") {
    val d = java.nio.file.Files.createTempDirectory("graft_warc_empty")
    java.nio.file.Files.write(d.resolve("empty.warc"), Array.emptyByteArray)
    assert(Warc.readWarc(spark, d.toString).count() === 0)
  }

  private def gzMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private def record(uri: String, body: String): Array[Byte] = {
    val payload = body.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("a damaged gzip member boundary surfaces as a quarantine row, not silent truncation") {
    // OpenJDK's GZIPInputStream treats an unreadable next-member header as
    // EOF: without the leftover probe the tail of the file would vanish
    // with zero parse_error rows
    val d = java.nio.file.Files.createTempDirectory("graft_warc_gzdmg")
    val tail = "this tail is not a gzip member and must not vanish".getBytes("UTF-8")
    java.nio.file.Files.write(d.resolve("dmg.warc.gz"),
      gzMember(record("https://ok.example.com/a", "good body")) ++ tail)
    val rows = Warc.readWarc(spark, d.toString)
      .select("rec_idx", "url", "parse_error").orderBy("rec_idx").collect()
    assert(rows.length === 2)
    assert(rows(0).isNullAt(2) && rows(0).getString(1) === "https://ok.example.com/a")
    assert(rows(1).getString(2).startsWith("gzip member boundary damaged"))
  }

  test("a corrupt gzip member mid-stream costs one terminal io row, never the task") {
    val d = java.nio.file.Files.createTempDirectory("graft_warc_gzcorrupt")
    val m2 = gzMember(record("https://two.example.com/b", "second body"))
    // keep the 10-byte member header valid, flip bytes inside the deflate
    // stream — GZIPInputStream throws ZipException from read(), which the
    // old EOF-only catch turned into a failed Spark task
    for (i <- 12 until math.min(m2.length - 9, 24)) m2(i) = (m2(i) ^ 0x5a).toByte
    java.nio.file.Files.write(d.resolve("corrupt.warc.gz"),
      gzMember(record("https://one.example.com/a", "first body")) ++ m2)
    val rows = Warc.readWarc(spark, d.toString)
      .select("rec_idx", "url", "parse_error").orderBy("rec_idx").collect()
    assert(rows.length === 2, s"got ${rows.mkString("; ")}")
    assert(rows(0).isNullAt(2) && rows(0).getString(1) === "https://one.example.com/a")
    assert(rows(1).getString(2).startsWith("io error"))
  }

  test("a corrupt FIRST gzip header quarantines the file, never the task") {
    val d = java.nio.file.Files.createTempDirectory("graft_warc_gzhdr")
    // valid magic bytes, garbage after — the GZIPInputStream CONSTRUCTOR
    // parses the first header and throws
    java.nio.file.Files.write(d.resolve("hdr.warc.gz"),
      Array[Byte](0x1f, 0x8b.toByte) ++ Array.fill[Byte](40)(0x77))
    val rows = Warc.readWarc(spark, d.toString)
      .select("parse_error").collect()
    assert(rows.length === 1 && rows(0).getString(0).startsWith("io error"))
  }

  test("a WARC/ version line starting exactly at a resync chunk boundary survives") {
    // the 64 KiB line cap consumes one look-ahead byte per chunk; without
    // the pushback that byte is lost, so a version line whose 'W' lands on
    // the boundary would resync past a well-formed record
    val d = java.nio.file.Files.createTempDirectory("graft_warc_cap")
    val junk = Array.fill[Byte](64 * 1024)('x'.toByte) // no newline anywhere
    java.nio.file.Files.write(d.resolve("cap.warc"),
      junk ++ record("https://boundary.example.com/p", "body after the cap"))
    val rows = Warc.readWarc(spark, d.toString)
      .select("rec_idx", "url", "parse_error").orderBy("rec_idx").collect()
    assert(rows.length === 2, s"got ${rows.mkString("; ")}")
    assert(rows(0).getString(2).startsWith("expected a WARC/ version line"))
    assert(rows(1).isNullAt(2) && rows(1).getString(1) === "https://boundary.example.com/p",
      "the record at the chunk boundary must parse (one-byte pushback)")
  }

  test("non-ASCII header values decode as UTF-8, not per-byte Latin-1") {
    val d = java.nio.file.Files.createTempDirectory("graft_warc_utf8hdr")
    java.nio.file.Files.write(d.resolve("u.warc"),
      record("https://münchen.example/straße", "utf8 header value"))
    val rows = Warc.readWarc(spark, d.toString).select("url", "parse_error").collect()
    assert(rows.length === 1 && rows(0).isNullAt(1))
    assert(rows(0).getString(0) === "https://münchen.example/straße")
  }

  test("readWarcStream parses the same record set as the batch reader") {
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_warc_stream_out")
    val chk = java.nio.file.Files.createTempDirectory("graft_warc_stream_chk")
    val q = Warc.readWarcStream(spark, dir, maxFilesPerTrigger = Some(1))
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", chk.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out.toString)
      .withColumn("fname", substring_index(col("file"), "/", -1))
      .select("fname", "rec_idx", "warc_type", "url", "parse_error")
    val batch = all.select("fname", "rec_idx", "warc_type", "url", "parse_error")
    assert(streamed.exceptAll(batch).count() === 0 &&
      batch.exceptAll(streamed).count() === 0,
      "stream and batch must parse identical records incl. quarantine rows")
  }

  test("end to end: a WARC landing dir streams through extraction into the curation loop") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingHistorization
    val landing = java.nio.file.Files.createTempDirectory("graft_warc_landing")
    val state = java.nio.file.Files.createTempDirectory("graft_warc_curate").toString
    def rec(uri: String, body: String): Array[Byte] = {
      val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
        s"<html><body><p>$body</p></body></html>").getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val textA = (1 to 40).map(i => s"document alpha sentence $i carries plain words").mkString(" ")
    val textB = (1 to 40).map(i => s"document beta topic $i differs from everything").mkString(" ")
    // drop 1: two captures; drop 2: a re-crawl of A (exact dup) + novel B
    java.nio.file.Files.write(landing.resolve("seg0.warc"),
      rec("https://w.example/a", textA))
    java.nio.file.Files.write(landing.resolve("seg1.warc"),
      rec("https://w.example/a2", textA) ++ rec("https://w.example/b", textB))
    val bench = {
      import spark.implicits._
      Seq((900L, "held out benchmark sentence")).toDF("doc_id", "text")
    }
    val stream = Warc.responsesOf(
        Warc.readWarcStream(spark, landing.toString, maxFilesPerTrigger = Some(1)))
      .filter(col("extract_error").isNull)
      // a stable, increasing doc id from the record address (file + slot):
      // the historization convention the incremental law rides
      .select(xxhash64(col("file"), col("rec_idx")).as("doc_id"), col("text"))
    val writer = StreamingHistorization.curateMaintainStream(
      stream, bench, "doc_id", "text", s"$state/digests", s"$state/out",
      s"$state/chk", shingleN = 3,
      nearCc = Some((64, 8, s"$state/manifest", s"$state/fps", s"$state/labels")))
    StreamingHistorization.runOnce(writer)
    val out = spark.read.parquet(s"$state/out")
    assert(out.count() === 2,
      "three captures, one an exact re-crawl: two documents reach the corpus")
    val digests = graft.sources.Store.readSnapshotDeltas(spark, s"$state/manifest",
      Map("digests" -> s"$state/digests", "fps" -> s"$state/fps"),
      Map("labels" -> s"$state/labels")).get._2("digests")
    assert(digests.count() === 2, "two novel content classes ingested")
  }

  test("a newline-free misnamed binary quarantines in bounded chunks, never buffers whole") {
    // the line reader caps at 64 KiB: a file with no 0x0a bytes (a binary
    // dropped into the WARC dir) must march through in capped chunks —
    // quarantined rows, bounded memory, no exception (r18 review finding)
    val d = java.nio.file.Files.createTempDirectory("graft_warc_bin")
    val junk = Array.tabulate(300 * 1024)(i => (33 + (i * 7) % 90).toByte) // printable, no \n
    java.nio.file.Files.write(d.resolve("junk.warc"), junk)
    val rows = Warc.readWarc(spark, d.toString)
      .select("rec_idx", "parse_error").collect()
    assert(rows.length === 1 && !rows.head.isNullAt(1),
      "a structureless file costs ONE quarantine row (resync consumes the " +
        "rest in capped chunks without emitting)")
    assert(rows.head.getString(1).startsWith("expected a WARC/ version line"))
  }
}
