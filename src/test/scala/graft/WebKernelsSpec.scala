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
    assert(t("&#xD800; &#55296; &#xDFFF;") === "&#xD800; &#55296; &#xDFFF;",
      "surrogate-range references stay verbatim — decoding would emit an " +
        "unpaired surrogate that mangles to ? at UTF-8 conversion")
    assert(t("&#x1F600;").codePointAt(0) === 0x1F600,
      "supplementary code points past the surrogate gap still decode")
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

  // ---- block segmentation + main-content selection ----

  private def blocksOf(html: String): Seq[(String, Int, Int)] =
    Seq(Tuple1(html)).toDF("html")
      .select(explode(WebExpressions.htmlBlocksOf(col("html"))).as("b"))
      .select(col("b.text"), col("b.links"), col("b.chars"))
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getInt(2)))

  test("htmlToBlocks matches every hand-stated oracle vector") {
    import graft.registry.WebVectors
    for (v <- WebVectors.htmlBlockVectors) {
      val got = blocksOf(v.html)
      val want = v.expBlocks.map { case (t, l) =>
        (t, l, t.count(c => !(Character.isWhitespace(c) || c == '\u00a0')))
      }
      assert(got === want, s"vec ${v.vecId}")
    }
  }

  test("parity: block texts joined with \\n equal htmlToText on newline-free markup") {
    import graft.registry.WebVectors
    for (v <- WebVectors.htmlBlockVectors if !v.html.contains("\n")) {
      val joined = blocksOf(v.html).map(_._1).mkString("\n")
      val full = Seq(Tuple1(v.html)).toDF("html")
        .select(WebExpressions.htmlTextOf(col("html"))).head().getString(0)
      assert(joined === full, s"vec ${v.vecId}")
    }
  }

  test("literal markup newline: a line break to htmlToText, a space to the block model") {
    val html = "<p>line one\nline two</p>"
    assert(blocksOf(html) === Seq(("line one line two", 0, 14)))
    val full = Seq(Tuple1(html)).toDF("html")
      .select(WebExpressions.htmlTextOf(col("html"))).head().getString(0)
    assert(full === "line one\nline two")
  }

  test("nested anchors: depth counts until the LAST close; decoded entities count") {
    val html = "<p><a href=\"x\">out <a href=\"y\">in</a> still</a> done &amp;co</p>"
    // out(3) + in(2) + still(5) counted at depth>=1; "done &co" after the
    // final close is not; the decoded '&' is one char
    assert(blocksOf(html) === Seq(("out in still done &co", 10, 17)))
  }

  test("anchor recognition edges: quoted trailing slash, unquoted value ending />, CAPS tags") {
    assert(blocksOf("<p>x <a href=\"a/\">inside</a> y</p>") === Seq(("x inside y", 6, 8)),
      "a '/' INSIDE a quoted attribute value does not self-close the anchor")
    assert(blocksOf("<p>x <a href=x/>notlink</p>") === Seq(("x notlink", 0, 8)),
      "an unquoted value ending in /> reads self-closed — the documented " +
        "lenient subset (a browser would parse href as x/)")
    assert(blocksOf("<p><A HREF=\"x\">CAPS</A> after</p>") === Seq(("CAPS after", 4, 9)),
      "tag names are case-insensitive")
  }

  test("main-content selection: body kept (links included), nav/footer/farm dropped") {
    import graft.registry.WebVectors
    val v1 = WebVectors.htmlBlockVectors.find(_.vecId == 1).get
    val main = Seq(Tuple1(v1.html)).toDF("html")
      .select(WebExpressions.mainTextOf(col("html"),
        WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity))
      .head().getString(0)
    assert(main === v1.expBlocks(2)._1 + "\n" + v1.expBlocks(4)._1,
      "the two body paragraphs, in order — nav, heading, short note, footer gone")
    val farm = WebVectors.htmlBlockVectors.find(_.vecId == 2).get
    val farmMain = Seq(Tuple1(farm.html)).toDF("html")
      .select(WebExpressions.mainTextOf(col("html"),
        WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity))
      .head().getString(0)
    assert(farmMain === "", "68 chars of pure link farm: long enough, too dense")
  }

  test("main-content boundaries: chars == minChars kept, density == max kept, one past dropped") {
    import graft.registry.WebVectors
    val v7 = WebVectors.htmlBlockVectors.find(_.vecId == 7).get
    val main = Seq(Tuple1(v7.html)).toDF("html")
      .select(WebExpressions.mainTextOf(col("html"), 40, 0.2))
      .head().getString(0)
    assert(main === v7.expBlocks.head._1,
      "40 chars / 8 links (exactly 0.2) kept; 39 chars dropped; 9 links dropped")
  }

  test("main-content null/empty posture: null html stays null, zero-block page is ''") {
    val rows = Seq(Tuple1(null: String), Tuple1("<div><script>x</script></div>"))
      .toDF("html")
      .select(WebExpressions.mainTextOf(col("html"), 40, 0.2).as("m"))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) === "")
  }

  test("responsesOf mainContent: html selected, plain text verbatim, non-text null") {
    val d = java.nio.file.Files.createTempDirectory("warc_main")
    def rec(uri: String, ct: String, body: Array[Byte]): Array[Byte] = {
      val payload = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n"
        .getBytes("ISO-8859-1") ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val body = "<div><a href=\"/\">Home</a> <a href=\"/x\">More</a></div>" +
      "<p>a real paragraph with plenty of ordinary words in it for the gate</p>"
    java.nio.file.Files.write(d.resolve("cap.warc"),
      rec("https://m.example/h", "text/html; charset=utf-8", body.getBytes("UTF-8")) ++
        rec("https://m.example/t", "text/plain", "just plain text".getBytes("UTF-8")) ++
        rec("https://m.example/p", "image/png", Array[Byte](1, 2, 3)))
    val out = Warc.responsesOf(Warc.readWarc(spark, d.toString),
        mainContent = Some((40, 0.2)))
      .select(col("rec_idx"), col("text"), col("main_text"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(out(0L)._1 ===
      Some("Home More\na real paragraph with plenty of ordinary words in it for the gate"))
    assert(out(0L)._2 ===
      Some("a real paragraph with plenty of ordinary words in it for the gate"),
      "the nav block is gone from main_text only")
    assert(out(1L)._1 === Some("just plain text") && out(1L)._2 === Some("just plain text"),
      "plain text has no blocks to select against — verbatim")
    assert(out(2L)._1 === None && out(2L)._2 === None)
  }
}
