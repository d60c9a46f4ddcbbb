package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.meta.{Currents, MetaColumns}
import graft.operators.{Cdc, MetaEnrichment, Scd2}
import graft.operators.Scd2.ValidFromMode

/** Property-based invariants over random snapshots (SURVEY.md §5.2#3):
  *
  *  - delta(x, x) = ∅ and inserts(x, y) ∪ updates(x, y) = delta(x, y),
  *    disjointly;
  *  - historization idempotence (re-feeding a snapshot adds nothing);
  *  - SCD2: per key exactly one active row, validity intervals
  *    non-overlapping, closed rows end the day before a successor opens
  *    (runs on distinct days — the same-day anomaly is SURVEY §7.4#4).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  import MetaColumns._

  private val c1 = Currents("2024-01-05 10:00:00")
  private val c2 = Currents("2024-03-10 11:00:00")

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Random snapshot: keys from a small alphabet (forcing overlap between
    * generated snapshots), random small-int values. */
  private val snapshotGen: Gen[Map[String, Int]] =
    Gen.mapOf(Gen.zip(Gen.choose(0, 25).map(i => s"k$i"), Gen.choose(0, 5)))

  private def enrich(rows: Map[String, Int], c: Currents): DataFrame =
    MetaEnrichment.addMetaColumns(rows.toSeq.toDF("k", "v"), c, Seq("k"))

  test("delta of a snapshot against itself is empty; inserts+updates partition the delta") {
    checkProp(Prop.forAll(snapshotGen, snapshotGen) { (a, b) =>
      val ea = enrich(a, c1)
      val eb = enrich(b, c2)
      val selfDelta = Cdc.delta(ea, ea).count() == 0L
      val delta = Cdc.delta(ea, eb).select("k").as[String].collect().toSet
      val ins = Cdc.inserts(ea, eb).select("k").as[String].collect().toSet
      val upd = Cdc.updates(ea, eb).select("k").as[String].collect().toSet
      selfDelta && (ins ++ upd) == delta && (ins & upd).isEmpty
    }, n = 10)
  }

  test("historization is idempotent: re-feeding the same snapshot appends nothing") {
    checkProp(Prop.forAll(snapshotGen) { a =>
      val ea = enrich(a, c1)
      val once = ea.unionByName(Cdc.delta(ea, enrich(a, c2)))
      once.count() == ea.count()
    }, n = 8)
  }

  test("collapseRuns kernel: idempotent, no adjacent duplicates, subsequence of input") {
    val tokenGen = Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "x9"))
    checkProp(Prop.forAll(tokenGen) { toks =>
      val text = toks.mkString(" ")
      val out = Seq(Tuple1(text)).toDF("text")
        .select(graft.operators.TextAnalysis.collapseTokenRuns(col("text")).as("c"))
        .as[String].head()
      val outToks = out.split(" ").filter(_.nonEmpty).toSeq
      // reference semantics computed in plain Scala
      val expected = toks.foldLeft(List.empty[String]) {
        case (acc, t) if acc.headOption.contains(t) => acc
        case (acc, t) => t :: acc
      }.reverse
      val noAdjacentDups = outToks.sliding(2).forall {
        case Seq(x, y) => x != y
        case _ => true
      }
      outToks == expected && noAdjacentDups
    }, n = 30)
  }

  test("TokenPairs kernel: parity with a plain-Scala bigram spec on random whitespace-laced text") {
    // pieces mix every \s separator with multi-byte and ASCII tokens, so
    // random concatenations cover runs, leading/trailing separators, and
    // 0/1-token texts
    val pieceGen = Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r",
      "a", "bb", "é", "日本", "x9")
    val textGen = Gen.listOf(pieceGen).map(_.mkString)
    checkProp(Prop.forAll(textGen) { text =>
      val got = Seq(Tuple1(text)).toDF("text")
        .select(explode(graft.functions.DedupExpressions.tokenPairsOf(col("text"))).as("p"))
        .select("p.w1", "p.w2").as[(String, String)].collect().toSeq
      // reference semantics in plain Scala: \s+ split, empties dropped
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val expected = if (toks.length < 2) Seq.empty else toks.zip(toks.tail)
      got == expected
    }, n = 30)
  }

  test("packSequences conserves rows and tokens for random corpora") {
    val docGen = Gen.listOfN(40, Gen.choose(0, 30))
    checkProp(Prop.forAll(docGen) { sizes =>
      val docs = sizes.zipWithIndex
        .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val assign = graft.operators.Packing.packSequences(docs, "doc_id", "text",
        budget = 16L, shards = 4)
      val rows = assign.count()
      val toks = assign.agg(sum("n_tokens")).as[Long].head()
      rows == sizes.size && toks == sizes.map(_.toLong).sum
    }, n = 8)
  }

  test("winnowing: coverage and density hold for random strings") {
    val k = 4; val w = 3
    val textGen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    checkProp(Prop.forAll(textGen) { text =>
      val sel = Seq(Tuple1(text)).toDF("text")
        .select(graft.operators.TextAnalysis.winnowFingerprints(col("text"), k, w).as("s"))
        .select(explode(col("s")).as("f")).select(col("f.p")).as[Int].collect().sorted
      val n = text.length - (k - 1)
      if (n < 1) sel.isEmpty
      else {
        // at least one selection; every full window [a, a+w-1] contains one;
        // selections are valid positions
        val covered = (1 to math.max(n - w + 1, 1)).forall(a =>
          sel.exists(p => p >= a && p <= math.min(a + w - 1, n)))
        sel.nonEmpty && covered && sel.forall(p => p >= 1 && p <= n)
      }
    }, n = 40)
  }

  test("kmv sketch: exact below k, bounded above k, for random multisets") {
    val valsGen = Gen.listOfN(60, Gen.choose(0L, 300L))
    checkProp(Prop.forAll(valsGen) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val truth = vs.distinct.size.toDouble
      val exact = graft.operators.Sketches.approxDistinctKmv(df, Seq("g"), "v", k = 512)
        .select("est_distinct").as[Double].head()
      val est = graft.operators.Sketches.approxDistinctKmv(df, Seq("g"), "v", k = 8)
        .select("est_distinct").as[Double].head()
      exact == truth && (truth < 8 || (est > 0 && est < truth * 8))
    }, n = 15)
  }

  test("SCD2 invariants: one active row per key, non-overlapping adjacent intervals") {
    checkProp(Prop.forAll(snapshotGen.suchThat(_.nonEmpty), snapshotGen) { (a, b) =>
      val v1 = Scd2.historizeDataset(enrich(a, c1), None, c1, ValidFromMode.LoadDate)
      val v2 = Scd2.historizeDataset(enrich(b, c2), Some(v1), c2, ValidFromMode.LoadDate)
      val rows = v2.select(col("k"), col(ValidFrom).cast("string"), col(ValidTo).cast("string"))
        .as[(String, String, String)].collect().toSeq
      rows.groupBy(_._1).values.forall { versions =>
        val active = versions.count(_._3 == "9999-12-31")
        val sorted = versions.sortBy(_._2)
        val chained = sorted.sliding(2).forall {
          case Seq((_, _, prevTo), (_, nextFrom, _)) =>
            prevTo < nextFrom &&
              java.time.LocalDate.parse(prevTo).plusDays(1) ==
                java.time.LocalDate.parse(nextFrom)
          case _ => true
        }
        active == 1 && chained
      }
    }, n = 8)
  }

  test("asOf invariants: at most one version per key on any day; run-day state = snapshot keys") {
    checkProp(Prop.forAll(snapshotGen.suchThat(_.nonEmpty), snapshotGen) { (a, b) =>
      val v1 = Scd2.historizeDataset(enrich(a, c1), None, c1, ValidFromMode.LoadDate)
      val v2 = Scd2.historizeDataset(enrich(b, c2), Some(v1), c2, ValidFromMode.LoadDate)
      // probe days: before history, both run days (c1 = 2024-01-05,
      // c2 = 2024-03-10), the closing boundary, far future
      val days = Seq("2024-01-04", "2024-01-05", "2024-03-09", "2024-03-10", "2030-01-01")
      val atMostOne = days.forall { d =>
        Scd2.asOf(v2, d).groupBy("k").count().filter(col("count") > 1).isEmpty
      }
      // on run-2's day the reconstruction carries run-1 keys too (SCD2
      // never deletes), so its key set is keys(a) ∪ keys(b)
      val run2Keys = Scd2.asOf(v2, "2024-03-10").select("k").as[String].collect().toSet
      // before history began, nothing is valid
      val empty = Scd2.asOf(v2, "2024-01-04").isEmpty
      atMostOne && run2Keys == (a.keySet ++ b.keySet) && empty
    }, n = 8)
  }
}
