package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.WebExpressions

/** Cross-page main-content extraction — the corpus-scale tier above the
  * per-page density law ([[graft.functions.WebExpressions.mainTextOf]]).
  *
  * The per-page law cannot see TEMPLATE boilerplate: a site's cookie
  * banner, product disclaimer, or "about the author" box is long and
  * link-poor, so it passes any density gate — but it appears verbatim on
  * every page of the host. That cross-page repetition is the signal the
  * public extractors lean on (boilerpipe's site-level templates, CCNet's
  * corpus-wide duplicated-paragraph removal, scoped here to the HOST so
  * one site's legal footer cannot suppress a legitimate quote of it on
  * another site). The reference has no counterpart (`main.py:16` starts
  * at CSV).
  *
  * Law, per block of each page's [[graft.functions.WebExpressions
  * .htmlBlocksOf]] segmentation: CUT when the same block text appears on
  * at least `hostRepeatMin` DISTINCT pages of the same host (every
  * occurrence cuts — there is no "first page keeps the banner");
  * otherwise keep iff the per-page density law keeps it (≥ `minChars`
  * non-ws chars, link density ≤ `maxLinkDensity`). Surviving blocks
  * rejoin in document order with `\n`. A doc whose blocks all cut (or a
  * zero-block page) yields the empty string; a null html yields null.
  * Within-page repeats do NOT inflate the page count (distinct doc ids),
  * and hosts compare AFTER canonicalization ([[Urls.urlHost]]: case,
  * port, userinfo, IDN spelling), so `xn--` and Unicode spellings of one
  * host pool their pages; docs with no parseable host (null/relative
  * urls) pool under the empty host.
  *
  * Scale shape: the block segmentation (the same codegen'd kernel the
  * per-page path fuses into the scan) runs once for the census and once
  * for the rebuild — two scans, each fully fused, no materialized
  * intermediate to spill (callers for whom the html DECODE dominates can
  * persist the exploded frame themselves). The repetition census
  * shuffles ONLY `(host, md5(text), doc_id)` — ~48-byte rows, never
  * block text — with a map-side-combined distinct count; the census
  * result joins back as a plain equi-join on `(host, md5)` (both sides
  * spread by the hash — a mega-host cannot heap a reducer, its blocks
  * fan out across every partition), and the rebuild is one
  * `collect_list` aggregation per doc. No window over the corpus, no
  * driver materialization, no UDF.
  */
object WebContent {

  /** See the object scaladoc for the law.
    *
    * @param docs   one row per page
    * @param idCol  page id (distinct-page counting key)
    * @param urlCol page url ([[Urls.urlHost]] derives the host pool)
    * @param htmlCol raw html string
    * @return (idCol, main_text) — one row per input row
    */
  def mainContentByHost(
      docs: DataFrame,
      idCol: String,
      urlCol: String,
      htmlCol: String,
      minChars: Int = 70,
      maxLinkDensity: Double = 0.2,
      hostRepeatMin: Int = 2): DataFrame = {
    require(hostRepeatMin >= 2, "hostRepeatMin < 2 would cut every block")
    val blocks = docs
      .select(col(idCol), coalesce(Urls.urlHost(col(urlCol)), lit("")).as("__host"),
        posexplode(WebExpressions.htmlBlocksOf(col(htmlCol))))
      .select(col(idCol), col("__host"), col("pos").as("__idx"),
        col("col.text").as("__text"), col("col.links").as("__links"),
        col("col.chars").as("__chars"))
      .withColumn("__bh", md5(col("__text")))
    // the census: pages-per-(host, block) — only ids and hashes shuffle
    val boiler = blocks
      .groupBy(col("__host"), col("__bh"))
      .agg(countDistinct(col(idCol)).as("__pages"))
      .filter(col("__pages") >= hostRepeatMin)
      .select(col("__host"), col("__bh"))
    val kept = blocks
      .join(boiler, Seq("__host", "__bh"), "left_anti")
      .filter(col("__chars") >= lit(minChars) &&
        col("__links").cast("double") <=
          col("__chars").cast("double") * lit(maxLinkDensity))
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__text")))),
          b => b.getField("__text")),
        "\n").as("main_text"))
    docs.select(col(idCol), col(htmlCol))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col(htmlCol).isNotNull, coalesce(col("main_text"), lit("")))
          .as("main_text"))
  }
}
