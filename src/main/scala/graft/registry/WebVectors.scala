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

  // ---- cross-page (per-host) boilerplate vectors ----

  /** One block of a generated site page: `anchor` renders inside an
    * `<a>` (its non-ws chars are the block's stated link count), `plain`
    * after it. The page html is GENERATED from the blocks — this family
    * tests the CROSS-PAGE law ([[graft.operators.WebContent
    * .mainContentByHost]]), not the parser (`x_warc_blocks` owns that). */
  final case class SiteBlock(anchor: String, plain: String) {
    def text: String =
      if (anchor.isEmpty) plain
      else if (plain.isEmpty) anchor
      else anchor + " " + plain
    def html: String =
      "<p>" + (if (anchor.isEmpty) ""
        else "<a href=\"#\">" + anchor + "</a>" + (if (plain.isEmpty) "" else " ")) +
        plain + "</p>"
  }

  /** One site page: url (the operator derives the host), the HAND-STATED
    * canonical host the oracle pools on, and the page's blocks. */
  final case class SiteDocVector(
      docId: Int,
      url: String,
      expHost: String,
      blocks: Seq[SiteBlock]) {
    def html: String = blocks.map(_.html).mkString
  }

  private val footer = SiteBlock("", "This website and its contents are " +
    "provided for general information purposes only and come with no " +
    "warranty of any kind.")
  private val weekly = SiteBlock("", "Subscribe to the weekly newsletter " +
    "for fresh updates delivered every morning.")
  private val cafeWelcome = SiteBlock("", "Welcome to the cafe homepage " +
    "where every espresso tells a little story.")

  /** Coverage: a footer on every host-A page (cut on ALL of them — no
    * first-page keeper) that also appears on ONE host-B page (kept there:
    * the census is per host), a block repeated twice WITHIN one page only
    * (kept twice: distinct-page counting), the density law still gating
    * non-repeated blocks (a short block drops, a linky block at density
    * 12/65 keeps), and the two IDN spellings of one host pooling their
    * pages (the shared block cuts across `xn--caf-dma` and `café`). */
  val siteDocVectors: Seq[SiteDocVector] = Seq(
    SiteDocVector(1, "https://a.example/p1", "a.example", Seq(
      footer,
      SiteBlock("", "Page one tells a long and unique story about " +
        "mountain weather patterns in the north."),
      SiteBlock("", "Too short."))),
    SiteDocVector(2, "https://a.example/p2", "a.example", Seq(
      weekly,
      SiteBlock("", "Page two describes harvest seasons and the quiet " +
        "rhythm of village markets in detail."),
      weekly,
      footer)),
    SiteDocVector(3, "https://a.example/p3", "a.example", Seq(
      SiteBlock("", "Page three explains the ancient craft of building " +
        "wooden boats by hand on the coast."),
      footer)),
    SiteDocVector(4, "https://b.example/q1", "b.example", Seq(
      footer,
      SiteBlock("click here now", "for the full report on quarterly " +
        "earnings and the outlook ahead"))),
    SiteDocVector(5, "https://xn--caf-dma.example/r1", "café.example", Seq(
      cafeWelcome,
      SiteBlock("", "The roastery in the old town square opens at seven " +
        "and closes after midnight."))),
    SiteDocVector(6, "https://café.example/r2", "café.example", Seq(
      SiteBlock("", "Our beans arrive each Tuesday from small farms in " +
        "the southern highlands region."),
      cafeWelcome)),
    SiteDocVector(7, "/no/scheme", "", Seq(
      SiteBlock("", "A page with no scheme still extracts its one " +
        "substantial paragraph correctly."))))

  /** Special pages outside the generated family: a zero-block page
    * (main = empty string) and a null html (main = null). */
  val siteSpecialDocs: Seq[(Int, String, String)] = Seq(
    (90, "https://a.example/empty", "<div><script>var y = 2;</script></div>"),
    (91, "https://a.example/missing", null))

  /** The cross-page census threshold the registry row runs and the oracle
    * law replays. */
  val siteHostRepeatMin: Int = 2

  /** VALUES literal (doc_id, host, block_idx, text, links, chars) of the
    * generated pages' blocks, hosts hand-stated. */
  val siteBlocksValuesSql: String = {
    require(siteDocVectors.flatMap(_.blocks.map(_.text)).forall(t =>
      !t.contains("'") && !t.contains("\n") && !t.contains("\r")),
      "site block texts must be single-line and quote-free")
    val rows = for {
      v <- siteDocVectors
      (b, idx) <- v.blocks.zipWithIndex
    } yield s"(${v.docId}, '${v.expHost}', $idx, '${b.text}', " +
      s"${nonWs(b.anchor)}, ${nonWs(b.text)})"
    rows.mkString(", ")
  }

  /** VALUES literal (doc_id, has_html) over ALL site docs incl. the
    * specials — the oracle's doc list (null html → null main). */
  val siteDocsValuesSql: String =
    (siteDocVectors.map(v => (v.docId, true)) ++
      siteSpecialDocs.map { case (id, _, html) => (id, html != null) })
      .map { case (id, h) => s"($id, $h)" }.mkString(", ")

  // ---- steady-state (incremental) site-census vectors ----

  /** The standing corpus of the incremental family: site docs 1–4 (the
    * host-A trio + the host-B page — `siteBlocksValuesSql` filtered to
    * `doc_id <= 4` on the oracle side). */
  val siteIncStandingMaxId: Int = 4

  private val signup = SiteBlock("", "Sign up today and receive a free " +
    "starter guide with every new account you open.")

  /** The batch: coverage of every census source — doc 20 cut by STANDING
    * counts alone (host-A footer already on 3 ingested pages), doc 21 cut
    * by standing+batch ACCUMULATION (host-B footer: 1 standing + this
    * page = threshold), docs 22/23 cut by INTRA-BATCH repetition on a
    * host the store has never seen. */
  val siteIncBatchVectors: Seq[SiteDocVector] = Seq(
    SiteDocVector(20, "https://a.example/p4", "a.example", Seq(
      footer,
      SiteBlock("", "Page four compares steel and aluminium frames " +
        "across a decade of touring mileage."))),
    SiteDocVector(21, "https://b.example/q2", "b.example", Seq(footer)),
    SiteDocVector(22, "https://c.example/n1", "c.example", Seq(
      signup,
      SiteBlock("", "North branch news covers the harbour expansion and " +
        "its effect on morning traffic."))),
    SiteDocVector(23, "https://c.example/n2", "c.example", Seq(
      SiteBlock("", "South branch news reviews the night market and the " +
        "new ferry timetable changes."),
      signup)))

  /** The batch's null-html special (main = null). */
  val siteIncSpecialDocs: Seq[(Int, String, String)] = Seq(
    (24, "https://c.example/missing", null))

  /** VALUES literal (doc_id, host, block_idx, text, links, chars) of the
    * batch pages' blocks. */
  val siteIncBlocksValuesSql: String = {
    require(siteIncBatchVectors.flatMap(_.blocks.map(_.text)).forall(t =>
      !t.contains("'") && !t.contains("\n") && !t.contains("\r")),
      "site batch block texts must be single-line and quote-free")
    val rows = for {
      v <- siteIncBatchVectors
      (b, idx) <- v.blocks.zipWithIndex
    } yield s"(${v.docId}, '${v.expHost}', $idx, '${b.text}', " +
      s"${nonWs(b.anchor)}, ${nonWs(b.text)})"
    rows.mkString(", ")
  }

  /** VALUES literal (doc_id, has_html) of the batch's doc list. */
  val siteIncDocsValuesSql: String =
    (siteIncBatchVectors.map(v => (v.docId, true)) ++
      siteIncSpecialDocs.map { case (id, _, html) => (id, html != null) })
      .map { case (id, h) => s"($id, $h)" }.mkString(", ")

  /** The census-takedown family: erase ALL host-A standing pages (the
    * footer's count drops 3 → 0, so a new host-A page KEEPS it — the
    * re-opening law) while host B's page stays (its footer count still
    * accumulates to the threshold with the new host-B page — retained
    * rows keep counting). */
  val siteTakedownRemovedIds: Seq[Int] = Seq(1, 2, 3)

  /** The takedown row's batch: the host-A and host-B pages of the
    * incremental family (docs 20 and 21). */
  val siteTakedownBatchMaxId: Int = 21

  /** VALUES literal (doc_id, has_html) of the takedown row's batch. */
  val siteTakedownDocsValuesSql: String =
    siteIncBatchVectors.filter(_.docId <= siteTakedownBatchMaxId)
      .map(v => s"(${v.docId}, true)").mkString(", ")
}
