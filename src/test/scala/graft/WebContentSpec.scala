package graft

import org.apache.spark.sql.functions._

import graft.operators.WebContent
import graft.registry.WebVectors

/** Cross-page (per-host) boilerplate removal: the census law, its host
  * scoping (incl. IDN spelling pooling), distinct-page counting, and the
  * null/empty posture. The oracle row (`x_warc_main_site`) replays the
  * law in DuckDB over the stated block table; this spec pins the same
  * expectations in CI plus the guard rails. */
class WebContentSpec extends SparkSpec {
  import spark.implicits._

  private def run(hostRepeatMin: Int = WebVectors.siteHostRepeatMin): Map[Int, Option[String]] = {
    val rows = WebVectors.siteDocVectors.map(v => (v.docId, v.url, v.html)) ++
      WebVectors.siteSpecialDocs
    WebContent.mainContentByHost(rows.toDF("doc_id", "url", "html"),
        "doc_id", "url", "html", WebVectors.mainMinChars,
        WebVectors.mainMaxLinkDensity, hostRepeatMin)
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
  }

  test("the census + density law over the site vectors") {
    val got = run()
    def blockText(docId: Int, idx: Int): String =
      WebVectors.siteDocVectors.find(_.docId == docId).get.blocks(idx).text
    assert(got(1) === Some(blockText(1, 1)),
      "host-A page 1: footer cut (3 pages), unique body kept, short block dropped")
    assert(got(2) === Some(Seq(blockText(2, 0), blockText(2, 1), blockText(2, 2))
      .mkString("\n")),
      "within-page repeat stays: the weekly block sits on ONE distinct page")
    assert(got(3) === Some(blockText(3, 0)))
    assert(got(4) === Some(blockText(4, 0) + "\n" + blockText(4, 1)),
      "the SAME footer text survives on host B (census is per host); " +
        "the linky block keeps at density 12/65")
    assert(got(5) === Some(blockText(5, 1)) && got(6) === Some(blockText(6, 0)),
      "xn--caf-dma and café spellings pool one host: the shared welcome " +
        "block cuts on both pages")
    assert(got(7) === Some(blockText(7, 0)), "scheme-less url pools under the empty host")
    assert(got(90) === Some(""), "zero-block page is the empty string")
    assert(got(91) === None, "null html stays null")
  }

  test("a higher threshold keeps the host-A footer (3 pages < 4)") {
    val got = run(hostRepeatMin = 4)
    val v3 = WebVectors.siteDocVectors.find(_.docId == 3).get
    assert(got(3) === Some(v3.blocks(0).text + "\n" + v3.blocks(1).text),
      "the footer passes the density law, so past the census it stays")
  }

  test("hostRepeatMin below 2 is refused") {
    val df = Seq((1, "https://h/x", "<p>t</p>")).toDF("doc_id", "url", "html")
    intercept[IllegalArgumentException] {
      WebContent.mainContentByHost(df, "doc_id", "url", "html", hostRepeatMin = 1)
    }
  }

  test("plan shape: no cartesian product, census joins back as an equi-join") {
    val rows = WebVectors.siteDocVectors.map(v => (v.docId, v.url, v.html))
    val plan = WebContent.mainContentByHost(rows.toDF("doc_id", "url", "html"),
      "doc_id", "url", "html").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  // ---- steady-state twin ----

  private def standingDocsDf = WebVectors.siteDocVectors
    .filter(_.docId <= WebVectors.siteIncStandingMaxId)
    .map(v => (v.docId, v.url, v.html)).toDF("doc_id", "url", "html")

  private def batchDf = (WebVectors.siteIncBatchVectors
    .map(v => (v.docId, v.url, v.html)) ++ WebVectors.siteIncSpecialDocs)
    .toDF("doc_id", "url", "html")

  private def incRun(census: org.apache.spark.sql.DataFrame) =
    WebContent.mainContentByHostIncremental(batchDf, "doc_id", "url", "html",
      census, WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity,
      WebVectors.siteHostRepeatMin)

  test("incremental equals the fresh operator restricted to the batch") {
    val census = WebContent.siteCensusRows(standingDocsDf, "doc_id", "url", "html")
    val inc = incRun(census).main
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    val freshAll = WebContent.mainContentByHost(
        standingDocsDf.unionByName(batchDf), "doc_id", "url", "html",
        WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity,
        WebVectors.siteHostRepeatMin)
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    val batchIds = WebVectors.siteIncBatchVectors.map(_.docId) ++
      WebVectors.siteIncSpecialDocs.map(_._1)
    for (id <- batchIds) assert(inc(id) === freshAll(id), s"doc $id")
    // the three census sources, stated: standing-driven, accumulated,
    // intra-batch
    assert(!inc(20).get.contains("This website"), "host-A footer cut by standing counts")
    assert(inc(21) === Some(""), "host-B footer cut by standing+batch accumulation")
    assert(!inc(22).get.contains("Sign up") && !inc(23).get.contains("Sign up"),
      "intra-batch repetition on an unseen host cuts both pages")
    assert(inc(24) === None)
  }

  test("takedown re-opens the law: erased pages never count, retained pages still do") {
    val census = WebContent.siteCensusRows(standingDocsDf, "doc_id", "url", "html")
    val purged = WebContent.siteCensusTakedown(census,
      WebVectors.siteTakedownRemovedIds.toDF("doc_id"), "doc_id")
    val batch = WebVectors.siteIncBatchVectors
      .filter(_.docId <= WebVectors.siteTakedownBatchMaxId)
      .map(v => (v.docId, v.url, v.html)).toDF("doc_id", "url", "html")
    val got = WebContent.mainContentByHostIncremental(batch, "doc_id", "url", "html",
        purged, WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity,
        WebVectors.siteHostRepeatMin)
      .main.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(20).contains("This website"),
      "all host-A pages erased: the footer is no longer a template there")
    assert(got(21) === "",
      "host B's page was retained: its footer still accumulates to a cut")
    // ≡ the fresh operator over the SURVIVING corpus restricted to the batch
    val survivors = standingDocsDf
      .filter(!col("doc_id").isin(WebVectors.siteTakedownRemovedIds: _*))
      .unionByName(batch)
    val fresh = WebContent.mainContentByHost(survivors, "doc_id", "url", "html",
        WebVectors.mainMinChars, WebVectors.mainMaxLinkDensity,
        WebVectors.siteHostRepeatMin)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    for (id <- Seq(20, 21)) assert(got(id) === fresh(id), s"doc $id")
    // idempotent: ghost ids and double takedown are no-ops
    val again = WebContent.siteCensusTakedown(purged,
      (WebVectors.siteTakedownRemovedIds ++ Seq(777)).toDF("doc_id"), "doc_id")
    assert(again.count() === purged.count())
  }

  test("re-delivery converges: append novelty, re-run, identical main and empty novelty") {
    val census = WebContent.siteCensusRows(standingDocsDf, "doc_id", "url", "html")
    val first = incRun(census)
    val firstMain = first.main.collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    val grown = census.unionByName(first.novelCensus)
    val second = incRun(grown)
    val secondMain = second.main.collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(secondMain === firstMain, "the batch's own counts read from the store")
    assert(second.novelCensus.count() === 0)
    // novelty never re-states a standing row
    assert(first.novelCensus.join(census,
      Seq("host", "bh", "page"), "left_semi").count() === 0)
  }
}
