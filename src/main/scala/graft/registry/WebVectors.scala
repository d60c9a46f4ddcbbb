package graft.registry

/** Hand-authored HTML block-segmentation / main-content vectors shared
  * between the Spark queries and the DuckDB oracle (the urlEdgeVectors
  * convention: ONE val generates both sides, so they cannot drift —
  * while the EXPECTATIONS themselves are stated, not derived: they
  * encode what [[graft.functions.WebKernels.htmlToBlocks]] and the
  * density selection must produce).
  */
private[graft] object WebVectors {

  /** One vector: the html the query feeds
    * [[graft.functions.WebExpressions.htmlBlocksOf]], and the HAND-STATED
    * expected blocks in document order as (text, links). `chars` is BY
    * DEFINITION the stated text's non-whitespace char count (block
    * normalization only collapses whitespace), so the VALUES literal
    * derives it from the stated text instead of risking a hand-count
    * drift on the one column that is pure arithmetic over another. */
  final case class HtmlBlockVector(
      vecId: Int,
      html: String,
      expBlocks: Seq[(String, Int)])

  /** The vectors. Coverage: nav/footer link bars vs body paragraphs, a
    * kept block CONTAINING a link, a pure link farm (long but dense), an
    * anchor spanning a block break (depth persists), stray `</a>` /
    * self-closed `<a/>`, entities + script content inside a block, NBSP
    * as whitespace, literal markup newlines as ordinary whitespace (the
    * documented divergence from htmlToText), whitespace-only blocks not
    * emitted, a zero-block document, and the exact minChars=40 /
    * maxLinkDensity=0.2 boundary pins (40 chars kept at links=8, dropped
    * at links=9; 39 chars dropped at links=0). */
  val htmlBlockVectors: Seq[HtmlBlockVector] = Seq(
    HtmlBlockVector(1,
      "<html><body><div class=\"nav\"><a href=\"/\">Home</a> " +
        "<a href=\"/about\">About us</a> <a href=\"/contact\">Contact</a>" +
        "</div><h1>Coffee</h1><p>Coffee is a brewed drink prepared from " +
        "roasted beans of the coffea plant, consumed worldwide since the " +
        "15th century.</p><p>Short note.</p><p>The earliest credible " +
        "evidence of coffee drinking appears in the accounts of " +
        "<a href=\"/yemen\">Yemen</a> and its Sufi monasteries around " +
        "1450.</p><div class=\"footer\"><a href=\"/tos\">Terms</a> " +
        "<a href=\"/privacy\">Privacy</a> 2024</div></body></html>",
      Seq(
        ("Home About us Contact", 18),
        ("Coffee", 0),
        ("Coffee is a brewed drink prepared from roasted beans of the " +
          "coffea plant, consumed worldwide since the 15th century.", 0),
        ("Short note.", 0),
        ("The earliest credible evidence of coffee drinking appears in " +
          "the accounts of Yemen and its Sufi monasteries around 1450.", 5),
        ("Terms Privacy 2024", 12))),
    HtmlBlockVector(2,
      "<div><a href=\"a\">alpha beta gamma delta</a> " +
        "<a href=\"b\">epsilon zeta eta theta</a> " +
        "<a href=\"c\">iota kappa lambda mu nu xi omicron pi</a></div>",
      Seq(("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi", 68))),
    HtmlBlockVector(3,
      "<p>read <a href=\"x\">the full<div>story continues here in plain " +
        "words</div></a> afterwards</p>",
      Seq(
        ("read the full", 7),
        ("story continues here in plain words", 30),
        ("afterwards", 0))),
    HtmlBlockVector(4,
      "<p>Fish &amp; chips &mdash; caf&eacute;<script>var a=\"<a>ignored" +
        "</a>\";</script> tonight&nbsp;only</p>",
      Seq(("Fish & chips — café tonight only", 0))),
    HtmlBlockVector(5,
      "</a><p>lead <a/>mark <a href=\"y\">tail</a></p>",
      Seq(("lead mark tail", 4))),
    HtmlBlockVector(6,
      "<div> </div><div><b> </b></div><p>line one\nline two stays a " +
        "single block of text</p>",
      Seq(("line one line two stays a single block of text", 0))),
    HtmlBlockVector(7,
      "<p>abcdefgh ijklmnop qrstuvwx yzabcdef <a href=\"z\">ghijklmn</a>" +
        "</p><p>abcdefgh ijklmnop qrstuvwx yzabcdef ghijklm</p>" +
        "<p>abcdefgh ijklmnop qrstuvwx yzabcde <a href=\"w\">fghijklmn</a></p>",
      Seq(
        ("abcdefgh ijklmnop qrstuvwx yzabcdef ghijklmn", 8),
        ("abcdefgh ijklmnop qrstuvwx yzabcdef ghijklm", 0),
        ("abcdefgh ijklmnop qrstuvwx yzabcde fghijklmn", 9))),
    HtmlBlockVector(8,
      "<div><script>var x = 1;</script><style>p{color:red}</style></div>",
      Seq.empty))

  private def nonWs(s: String): Int =
    s.count(c => !(Character.isWhitespace(c) || c == '\u00a0'))

  /** The main-content parameters the registry rows run and the oracle law
    * replays: jusText-ballpark density, a minChars sized to the vectors. */
  val mainMinChars: Int = 40
  val mainMaxLinkDensity: Double = 0.2

  /** VALUES literal (vec_id, block_idx, text, links, chars) of every
    * expected block. Expected texts must be single-line and quote-free —
    * they are embedded in SQL. */
  val htmlBlocksValuesSql: String = {
    require(htmlBlockVectors.flatMap(_.expBlocks.map(_._1)).forall(t =>
      !t.contains("'") && !t.contains("\n") && !t.contains("\r")),
      "html block expectations must be single-line and quote-free")
    val rows = for {
      v <- htmlBlockVectors
      ((text, links), idx) <- v.expBlocks.zipWithIndex
    } yield s"(${v.vecId}, $idx, '$text', $links, ${nonWs(text)})"
    require(rows.nonEmpty, "block vectors must state at least one block")
    rows.mkString(", ")
  }

  /** VALUES literal of every vec_id — the left side of the main-content
    * law's join (vectors whose blocks ALL fail the gate must still emit
    * an empty-string row). */
  val htmlVecIdsSql: String =
    htmlBlockVectors.map(v => s"(${v.vecId})").mkString(", ")
}
