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
