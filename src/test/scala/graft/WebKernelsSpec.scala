package graft

import org.apache.spark.sql.functions._

import graft.functions.{WebExpressions, WebKernels}
import graft.operators.Curation
import graft.sources.Warc

/** The raw-capture text path (HTTP split → charset decode → HTML
  * extraction): adversarial vectors beyond the oracle's hand-stated
  * fixture, plus the end-to-end WARC `response` → extract →
  * [[Curation.curateIncremental]] flow. The oracle (`x_warc_html`)
  * carries the deterministic ground truth; this spec carries the error
  * frontier whose messages embed JDK exception text. */
class WebKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def viaColumns(payload: Array[Byte]): (Option[Int], Option[String],
      Option[String], Option[String], Option[String]) = {
    val row = Seq(Tuple1(payload)).toDF("payload")
      .withColumn("__h", WebExpressions.httpParseOf(col("payload")))
      .withColumn("__d", WebExpressions.charsetDecodeOf(col("__h.body"), col("__h.content_type")))
      .select(col("__h.status"), col("__h.content_type"),
        col("__d.charset"), WebExpressions.htmlTextOf(col("__d.text")), col("__h.err"))
      .head()
    def s(i: Int) = if (row.isNullAt(i)) None else Some(row.getString(i))
    (if (row.isNullAt(0)) None else Some(row.getInt(0)), s(1), s(2), s(3), s(4))
  }

  private def http(headers: Seq[String], body: Array[Byte]): Array[Byte] =
    headers.mkString("", "\r\n", "\r\n\r\n").getBytes("ISO-8859-1") ++ body

  test("corrupt gzip content-encoding costs the err column, never a throw") {
    val payload = http(
      Seq("HTTP/1.1 200 OK", "Content-Type: text/html", "Content-Encoding: gzip"),
      "definitely not gzip".getBytes("UTF-8"))
    val (st, _, cs, text, err) = viaColumns(payload)
    assert(st === Some(200) && cs.isEmpty && text.isEmpty)
    assert(err.exists(_.startsWith("undecodable gzip body")))
  }

  test("deflate content-encoding decodes both zlib-wrapped and raw streams") {
    def deflate(b: Array[Byte], raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    for (raw <- Seq(false, true)) {
      val payload = http(
        Seq("HTTP/1.1 200 OK", "Content-Type: text/html", "Content-Encoding: deflate"),
        deflate("<p>deflated</p>".getBytes("UTF-8"), raw))
      val (_, _, _, text, err) = viaColumns(payload)
      assert(err.isEmpty && text === Some("deflated"), s"raw=$raw")
    }
  }

  test("chunked framing edges: chunk past body end, missing size line") {
    val past = http(
      Seq("HTTP/1.1 200 OK", "Content-Type: text/html", "Transfer-Encoding: chunked"),
      "ff\r\nshort\r\n0\r\n\r\n".getBytes("ISO-8859-1"))
    assert(viaColumns(past)._5.exists(_.contains("chunk runs past the body")))
    val noSize = http(
      Seq("HTTP/1.1 200 OK", "Content-Type: text/html", "Transfer-Encoding: chunked"),
      "no terminator here".getBytes("ISO-8859-1"))
    assert(viaColumns(noSize)._5.exists(_.contains("no size line")))
  }

  test("no header terminator in the envelope is an err row, not a hang or throw") {
    val payload = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nno blank line ever"
      .getBytes("ISO-8859-1")
    assert(viaColumns(payload)._5 === Some("no header terminator in HTTP envelope"))
  }

  test("meta charset is only honored inside a meta tag and inside the sniff window") {
    // "charset=" in visible TEXT must not be treated as a declaration
    val inText = "<html><body><p>use charset=koi8-r for this page</p></body></html>"
    val (_, _, cs1, _, _) = viaColumns(http(
      Seq("HTTP/1.1 200 OK", "Content-Type: text/html"), inText.getBytes("UTF-8")))
    assert(cs1 === Some("utf-8"), "charset= in body text is not a declaration")
    // a declaration past the 1024-byte prescan window is not seen
    val late = "<html><head>" + ("<!-- pad -->" * 120) +
      "<meta charset=\"windows-1252\"></head><body><p>x</p></body></html>"
    val (_, _, cs2, _, _) = viaColumns(http(
      Seq("HTTP/1.1 200 OK", "Content-Type: text/html"), late.getBytes("UTF-8")))
    assert(cs2 === Some("utf-8"), "declarations beyond the sniff window fall back")
  }

  test("html extraction edges: literal <, unterminated structures, near-miss close tags") {
    def t(s: String): String = WebKernels.htmlToText(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(t("<p>3 < 5 and 7 <9 stays</p>") === "3 < 5 and 7 <9 stays",
      "a literal < before a non-tag char is text")
    assert(t("<p>cut <b>mid") === "cut mid", "unterminated tag drops cleanly")
    assert(t("<p>before<!-- never closed") === "before",
      "unterminated comment drops the remainder, not the prefix")
    assert(t("<script>if (a</b < c) { x(\"</scripty>\"); }</script><p>after</p>")
      === "after", "near-miss close tags stay inside the raw script element")
    assert(t("<script src=\"x.js\"/><p>visible</p>") === "visible",
      "a self-closed script has no raw content to skip")
    assert(t("a<br>b") === "a\nb", "void block tag breaks the line")
    assert(t("<td>c1</td><td>c2</td>") === "c1\nc2")
    assert(t("&#xFFFFFFFF; &#0; &#x; &notareference; &amp") ===
      "&#xFFFFFFFF; &#0; &#x; &notareference; &amp",
      "invalid numeric / unknown named / unterminated references stay verbatim")
    assert(t("<p>a</p> \n <p>b</p>") === "a\nb",
      "raw NBSP chars participate in whitespace-run normalization")
    assert(t("x&nbsp;&nbsp;y") === "x y",
      "decoded nbsp entities collapse as whitespace")
    assert(t("") === "" && t("   ") === "")
  }

  test("interpreted eval and codegen produce identical rows (expression twin parity)") {
    // same static kernel behind both paths by construction; drive the
    // INTERPRETED eval directly to pin the wiring (null handling, struct
    // field order) against the codegen path the DataFrame run uses
    val payload = http(
      Seq("HTTP/1.1 301 Moved", "Content-Type: text/html; charset=iso-8859-1",
        "Location: https://x"),
      "<p>redirect stub für</p>".getBytes("ISO-8859-1"))
    val viaCol = viaColumns(payload)
    val h = WebKernels.httpParse(payload)
    val d = WebKernels.charsetDecode(h.get(2, null).asInstanceOf[Array[Byte]],
      h.get(1, null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    val text = WebKernels.htmlToText(
      d.get(1, null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    assert(viaCol === ((Some(301),
      Some("text/html; charset=iso-8859-1"), Some("iso-8859-1"),
      Some(text.toString), None)))
    assert(text.toString === "redirect stub für")
  }

  test("end to end: WARC response records feed curateIncremental as a batch") {
    // three captures: two near-identical boilerplate pages (exact-dup by
    // extracted text), one unique; the pipeline gates on the EXTRACTED
    // text, so markup/charset differences that render identically dedup
    val d = java.nio.file.Files.createTempDirectory("graft_warc_e2e")
    def rec(uri: String, ct: String, body: Array[Byte]): Array[Byte] = {
      val payload = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val longText = (1 to 60).map(i => s"substantial sentence number $i with content words")
      .mkString(" ")
    val pageA = s"<html><body><p>$longText</p></body></html>"
    // same rendered text as A, different markup and charset spelling
    val pageA2 = s"<html><head><meta charset=utf-8></head><body><div>$longText</div></body></html>"
    val uniq = (1 to 60).map(i => s"completely different page talking about topic $i")
      .mkString(" ")
    val pageB = s"<html><body><p>$uniq</p></body></html>"
    java.nio.file.Files.write(d.resolve("cap.warc"),
      rec("https://s.example/a", "text/html; charset=utf-8", pageA.getBytes("UTF-8")) ++
        rec("https://s.example/a2", "text/html", pageA2.getBytes("UTF-8")) ++
        rec("https://s.example/b", "text/html; charset=utf-8", pageB.getBytes("UTF-8")))
    val batch = Warc.readResponses(spark, d.toString)
      .filter(col("extract_error").isNull)
      .select(col("rec_idx").as("doc_id"), col("text"))
    val bench = Seq((900L, "held out benchmark row")).toDF("doc_id", "text")
    val inc = Curation.curateIncremental(batch, bench, "doc_id", "text",
      Curation.emptyState(spark))
    val kept = inc.survivors.select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L),
      "the markup variant extracts to identical text and exact-dups away; " +
        "the unique page survives")
    assert(inc.novelDigests.count() === 2, "two novel content classes ingest")
  }
}
