package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontamination

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private lazy val train = Seq(
    // contains "quick brown fox" and more — heavy overlap
    (1L, "a quick brown fox jumps over a sleeping dog today"),
    // no 3-gram in common with the benchmark
    (2L, "completely unrelated text about spark physical plans"),
    // exact copy — every shingle collides
    (3L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("contamination report counts colliding 3-grams per training doc") {
    val rep = Decontamination.contaminationReport(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(rep.keySet === Set(1L, 2L, 3L))
    // doc 2: clean
    assert(rep(2L)._2 === 0L && !rep(2L)._4)
    // doc 3: exact copy — every one of its shingles hits
    assert(rep(3L)._1 === rep(3L)._2 && rep(3L)._3 === 1.0 && rep(3L)._4)
    // doc 1: partial overlap, flagged
    assert(rep(1L)._2 > 0L && rep(1L)._2 < rep(1L)._1 && rep(1L)._4)
  }

  test("minHits raises the flagging bar") {
    val strict = Decontamination.contaminationReport(
      train, bench, "doc_id", "text", n = 3, minHits = 1000L)
    assert(strict.filter($"contaminated").count() === 0)
    // counts are unchanged — only the flag moves
    assert(strict.filter($"n_hits" > 0).count() === 2)
  }

  test("decontaminate drops flagged docs and keeps clean rows untouched") {
    val clean = Decontamination.decontaminate(train, bench, "doc_id", "text", n = 3)
    assert(clean.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    assert(clean.columns.toSeq === train.columns.toSeq)
  }

  test("benchmark side is broadcast — the corpus never shuffles for hit detection") {
    val rep = Decontamination.contaminationReport(
      spark.read.parquet(s"$sfDir/documents.parquet"), bench, "doc_id", "text", n = 3)
    rep.count()
    val plan = rep.queryExecution.executedPlan.toString
    // the bench set is a broadcast hash relation built ONCE per task and
    // probed by each exploded doc shingle in O(1) — the r19 shape (the
    // r16 one-row array_intersect probe rebuilt a hash set over the WHOLE
    // benchmark per corpus row). The corpus payload must never shuffle to
    // meet the benchmark: no sort-merge/shuffled-hash join anywhere; the
    // only exchange is the narrow one-row-per-doc aggregate
    assert(plan.contains("BroadcastExchange"), "benchmark side is not broadcast")
    assert(plan.contains("BroadcastHashJoin"), "bench probe lost its broadcast hash join")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle:\n$plan")
    assert(!plan.contains("ShuffledHashJoin"), s"corpus must not shuffle:\n$plan")
  }

  test("per-benchmark attribution splits hits by suite and sums to the aggregate") {
    val suites = bench
      .unionByName(Seq((200L, "completely unrelated text about spark physical plans"))
        .toDF("doc_id", "text"))
      .withColumn("suite", when($"doc_id" === 100L, "qa").otherwise("code"))
    val by = Decontamination.contaminationByBenchmark(
      train, suites, "doc_id", "text", "suite", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc 2 collides only with the 'code' suite (its text lives there)
    assert(by.contains((2L, "code")) && !by.contains((2L, "qa")))
    // docs 1 and 3 collide only with 'qa'
    assert(by.contains((1L, "qa")) && by.contains((3L, "qa")))
    // per-doc totals equal the un-attributed report against the same bench
    // (valid here because the two suites share no shingles — a shingle in
    // BOTH suites counts once per suite in the attribution, by design)
    val agg = Decontamination.contaminationReport(train, suites, "doc_id", "text", n = 3)
      .filter($"n_hits" > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val summed = by.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(summed === agg)
  }

  test("self-decontamination flags every doc (sanity: report is exhaustive)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val rep = Decontamination.contaminationReport(docs, docs, "doc_id", "text", n = 3)
    assert(rep.filter(!$"contaminated").count() === 0)
    assert(rep.filter($"contamination" =!= 1.0).count() === 0)
  }

  // ---- span-level decontamination ----

  private lazy val spanBench = Seq(
    (100L, "0123456789ABCDEFGHIJ") // 20 chars: 10-grams at positions 1..11
  ).toDF("doc_id", "text")

  private lazy val spanTrain = Seq(
    // benchmark text embedded verbatim at chars 6..25
    (1L, "xxxxx0123456789ABCDEFGHIJyyyyy"),
    // no 10-gram in common
    (2L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    // null text: no grams, passes through the scrub untouched
    (3L, null.asInstanceOf[String]),
    // shorter than k: exempt by construction
    (4L, "012345678")
  ).toDF("doc_id", "text")

  test("contaminatedSpans localizes the quoted benchmark region exactly") {
    val spans = Decontamination.contaminatedSpans(
        spanTrain, spanBench, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // contaminated 10-gram starts: 6..16; island = [6, 16 + 9] = the
    // embedded benchmark slice, chars 6..25, and nothing else
    assert(spans === Seq((1L, 6, 25)))
  }

  test("decontaminateSpans excises the island and keeps everything else") {
    val cleaned = Decontamination.decontaminateSpans(
        spanTrain, spanBench, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(cleaned(1L) === Some("xxxxxyyyyy"))
    assert(cleaned(2L) === Some("zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
    assert(cleaned(3L) === None)
    assert(cleaned(4L) === Some("012345678"))
  }

  test("a fully-contaminated document scrubs to the empty string") {
    val copy = Seq((7L, "0123456789ABCDEFGHIJ")).toDF("doc_id", "text")
    val cleaned = Decontamination.decontaminateSpans(
        copy, spanBench, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(7L) === "")
  }

  test("span probe broadcasts the bench grams — the corpus side never shuffles") {
    val spans = Decontamination.contaminatedSpans(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(200),
      spanBench, "doc_id", "text", k = 30)
    spans.count()
    val plan = spans.queryExecution.executedPlan.toString
    // hit detection is a map-side broadcast LEFT-SEMI: the corpus's
    // exploded positions probe the (tiny) bench gram set in place; the
    // only exchange is the per-doc island window over the hit rows
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"bench grams are not broadcast-semi-probed:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus gram set shuffled:\n$plan")
  }

  test("span report ≡ scrub: cutting the reported islands reproduces the scrub") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val train = docs.filter($"doc_id" % 20 =!= 0)
    val bench = docs.filter($"doc_id" % 20 === 0)
    val viaReport = {
      val islands = Decontamination.contaminatedSpans(
          train, bench, "doc_id", "text", k = 30)
        .select($"doc_id".as("id"), $"span_start".as("s"), $"span_end".as("e"))
      graft.operators.Dedup.cutSpans(train, "doc_id", "text", islands)
    }
    val direct = Decontamination.decontaminateSpans(train, bench, "doc_id", "text", k = 30)
    assert(direct.exceptAll(viaReport).isEmpty && viaReport.exceptAll(direct).isEmpty)
  }
}
