package graft

/** Physical-plan invariants: the properties that make these operators hold
  * up at 100 TB, asserted against the actual Catalyst output so a
  * regression (a lost pushdown, a join degrading to nested-loop, an
  * accidental cartesian) fails CI instead of surfacing as a 100x slowdown
  * on a cluster.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  /** Static (pre-execution) plan — what Catalyst commits to at planning
    * time. Under AQE this is the initial adaptive plan. */
  private def planOf(name: String): String = {
    val p = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    p
  }

  /** Final plan after execution — includes AQE's runtime re-planning
    * (join-strategy switches, skew splitting, coalescing). */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    p
  }

  test("every registered query has an oracle; no oracle is orphaned") {
    // the round-4 regression class: a query registered without an oracleSql
    // entry silently downgrades the driver's check to rows-only. Since r17
    // there are NO exemptions: the contract is 100% oracle-paired (cost
    // rows without a SQL twin live in SparkEntry.benchExtras instead —
    // x_pack_bpe50k moved there once x_text_bpe50k_count oracled the 50k
    // counting path at full rule depth).
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      "queries and oracleSql drifted: " +
        s"missing=${(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted} " +
        s"orphaned=${(SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
    // bench extras are the mirror rule: never oracle-paired, never
    // shadowing a registered key (benchExtras itself enforces the latter)
    assert(SparkEntry.benchExtras.keySet.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "a bench extra has an oracle — register it as a query instead")
  }

  test("registered dumps expose only atomic-typed columns") {
    // the round-6 regression class: the driver's checker sorts every dumped
    // column with pandas, and array/map/struct cells crash that sort
    // (unhashable numpy.ndarray), leaving the query UNVERIFIED. Operators
    // may return nested types; registered dumps must flatten them
    // (array_join / getField) before exposure.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      spark.catalog.clearCache()
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(nested.isEmpty,
        s"$name dumps non-atomic columns ${nested.mkString(",")} — the driver's checker cannot sort them")
    }
  }

  test("no registered query plans a cartesian product") {
    // static check on purpose: a cartesian is a planning-time property, and
    // every query's runtime behavior is already executed by its own spec.
    // Bench extras are included: they run in the scored bench, so a plan
    // regression there is a real 100 TB regression too.
    val all = SparkEntry.queries ++ SparkEntry.benchExtras
    all.keys.toSeq.sorted.foreach { name =>
      val p = all(name)(spark, sfDir).queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      assert(!p.contains("CartesianProduct"),
        s"$name degraded to a cartesian product")
    }
  }

  test("snapshot filter and projection reach the parquet scan") {
    val p = planOf("l05_meta_enrich")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      "shipdate filter not pushed to the scan")
    // projection pruning: untouched lineitem columns must not be read
    assert(!p.contains("l_extendedprice"), "scan reads columns the query never uses")
    // the enrichment chain is one codegen'd stage over the scan — no shuffle
    assert(p.contains("*(1)"), "enrichment fell out of whole-stage codegen")
    assert(!p.contains("Exchange"), "enrichment introduced a shuffle")
  }

  test("as-of travel over the staged SCD2 store pushes the validity bounds to its scan") {
    // the staged registrations turned the as-of reads into parquet-store
    // reads — the production shape — which makes the validity-bound
    // pushdown REAL (before, the filter ran over an in-memory merge
    // result). Assert on the scan's own pushed-filter metadata rather
    // than the plan string, whose PushedFilters list truncates.
    val df = SparkEntry.queries("x_store_asof")(spark, sfDir)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    spark.catalog.clearCache()
    assert(scans.nonEmpty, "staged as-of read lost its parquet scan")
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString(";")
    assert(pushed.contains("LessThanOrEqual(VALID_FROM"),
      s"VALID_FROM bound not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(VALID_TO"),
      s"VALID_TO bound not pushed: $pushed")
  }

  test("fact-to-dimension joins broadcast the small side") {
    val p = finalPlanOf("x_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimension join is not broadcast")
  }

  test("LSH band self-joins stay equi hash joins, never nested loops") {
    Seq("x_dedup_minhash", "x_sim_near_dup").foreach { name =>
      val p = finalPlanOf(name)
      assert(
        p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("ShuffledHashJoin"),
        s"$name band join lost its equi-join keys")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name band join degraded to a nested loop")
    }
  }

  test("fuzzy join blocks on fixed-width equi keys, never a nested loop") {
    Seq("x_fuzzy_join", "x_fuzzy_join_best").foreach { name =>
      val p = finalPlanOf(name)
      assert(
        p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("ShuffledHashJoin"),
        s"$name candidate join lost its (length, segment, hash) equi keys")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name degraded to an all-pairs comparison — the PassJoin blocking is gone")
    }
  }

  test("maintained-aggregate merge is hash aggregation, no join or window") {
    // the state merge must stay a union + hash aggregate: a join-shaped or
    // windowed plan would re-key the corpus instead of merging synopses
    val p = finalPlanOf("x_agg_maintain")
    assert(p.contains("HashAggregate"), "state merge lost its hash aggregation")
    assert(!p.contains("Join"), "state merge plans a join — partials should union, not join")
  }

  test("decontamination broadcast-hash-joins the benchmark set, corpus never sort-merges") {
    // r19 shape (Decontamination.contaminationReport): the benchmark's
    // distinct shingle hashes broadcast as a hash relation built once per
    // task; exploded doc shingles probe it in O(1) and combine map-side to
    // one narrow row per doc. (The r13–r18 single-row array_intersect
    // probe was zero-shuffle but rebuilt a hash set over the WHOLE
    // benchmark per corpus row — a |bench| × |corpus| term that dominated
    // every decontamination row.) The corpus must still never shuffle to
    // MEET the benchmark: broadcast join only, and the sole shuffle is the
    // narrow per-doc aggregate exchange.
    val p = finalPlanOf("x_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "x_decontaminate lost the broadcast bench-set probe")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "x_decontaminate shuffles the corpus to meet the benchmark")
  }

  test("span decontamination broadcast-semi-probes the bench grams; the scrub joins the payload once") {
    // the corpus's exploded gram positions probe the (tiny) bench gram set
    // in a map-side broadcast LEFT-SEMI — a sort-merge shape here would
    // mean the 100 TB corpus gram stream is being shuffled to meet an
    // MB-scale benchmark
    val spans = finalPlanOf("x_decontaminate_spans")
    assert(spans.contains("BroadcastHashJoin") && spans.contains("LeftSemi"),
      "x_decontaminate_spans lost the broadcast-semi bench probe")
    assert(!spans.contains("SortMergeJoin"),
      "x_decontaminate_spans shuffles the corpus gram stream")
    // the scrub's only payload join is the one left-outer against the
    // per-doc merged-span rows (plus the same broadcast-semi gram probe)
    val scrub = finalPlanOf("x_decontaminate_scrub")
    assert(scrub.contains("BroadcastHashJoin") && scrub.contains("LeftSemi"),
      "x_decontaminate_scrub lost the broadcast-semi bench probe")
    assert(!scrub.contains("CartesianProduct") &&
      !scrub.contains("BroadcastNestedLoopJoin"),
      "x_decontaminate_scrub degraded to an all-pairs shape")
  }

  test("composed curation keeps the broadcast bench probe for its decontaminate stage") {
    // curation's other stages (dedup, media) legitimately shuffle; the
    // decontamination stage inside it must still probe the benchmark via
    // a broadcast hash relation (r19 shape), never a corpus shuffle.
    val p = finalPlanOf("x_curate")
    assert(p.contains("BroadcastHashJoin"),
      "x_curate's decontaminate stage lost the broadcast bench-set probe")
  }

  test("tiered merge's archive probe scans KEY_HASH only — the payload never loads") {
    // the property that makes the tiered layout cheap: historizeTiered's
    // only merge-path read of the history tier is the resurrection-key
    // probe, and it must column-prune to the 32-byte digest. The probe
    // runs as a side effect inside the x_scd2_tiered/_run registrations
    // (their RETURNED plan is the readTiered, which legitimately loads
    // the payload), so the pin addresses the probe plan directly over
    // the staged archive the _run row merges against.
    val (_, hp) = SparkEntry.stagedTierRuns13(spark, sfDir)
    val p = graft.operators.Scd2Tier.historyKeys(spark, hp).get
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<KEY_HASH:string>"),
      "archive probe reads more than the KEY_HASH digest — merge cost would " +
        s"scale with history payload width:\n$p")
  }

  test("bloom-routed batch delta never exchanges the standing store") {
    // the route's 100 TB claim in plan form: the store is read once,
    // map-side, under a broadcast semi-join — zero shuffle exchanges
    // anywhere in the plan, at ANY store size (the plain twin's anti-join
    // exchanges the store's pair projection once it outgrows the
    // broadcast threshold). The probe itself must be the native kernel,
    // not a literal-array SQL predicate (the 7× regression this replaced).
    val p = planOf("l09_delta_bloom")
    assert(!p.contains("Exchange hashpartitioning"),
      "bloom-routed delta gained a shuffle exchange — the store (or batch) is being exchanged")
    assert(p.contains("graft_bloom_probe"), "bloom probe lost the native kernel")
  }

  test("url blocklist gate is a broadcast equi-join over exploded suffixes, never a regex scan") {
    // the gate's 100 TB posture: rules meet the corpus through suffix
    // string EQUALITY (broadcast hash), so rule-list size never multiplies
    // scan cost; an rlike/LIKE-per-rule shape would be rules × corpus
    // regex work. x_curate_url composes the gate as curation's first stage.
    // (the composed plan legitimately contains ONE BroadcastNestedLoopJoin
    // — the single-row IdentityBroadcastMode decontaminate probe — so the
    // all-pairs pin lives on the gate's own plan, where it is exact)
    val p = finalPlanOf("x_curate_url")
    assert(p.contains("BroadcastHashJoin"),
      "blocklist gate lost its broadcast equi-join")
    val gate = graft.operators.Urls.blockedHostIds(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", "concat('https://h', doc_id % 37, '.example.com/x') AS url"),
      "doc_id", "url",
      Seq("*.example.com").toDF("rule"))
      .queryExecution.executedPlan.toString
    assert(gate.contains("BroadcastHashJoin") && gate.contains("LeftSemi"),
      s"gate probe lost the broadcast left-semi:\n$gate")
    assert(!gate.contains("BroadcastNestedLoopJoin") && !gate.contains("CartesianProduct"),
      "blocklist gate degraded to an all-pairs / regex-driven shape")
  }

  test("robots path gate: rules broadcast into a host hash equi-join, never a loop join") {
    // the PATH gate's 100 TB posture (the blocklist-gate pin's sibling):
    // parsed (host, allow, path) rules are robots-corpus-sized and
    // broadcast; the corpus meets them in ONE hash equi-join on the host
    // string with the octet-prefix test as the join's residual filter —
    // a BroadcastNestedLoopJoin here would mean the prefix test displaced
    // the equi key and every URL scans every rule
    val p = finalPlanOf("x_text_robots_paths")
    assert(p.contains("BroadcastHashJoin"),
      "robots path gate lost its broadcast host equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "robots path gate degraded to an all-pairs shape")
  }

  test("best-fit packing shuffles narrow triples only — the text never moves") {
    // packBestFit's mapPartitions is fed by a projection of (id, shard,
    // token count): the exchange must carry exactly those three columns,
    // and the scan must prune to (doc_id, text) — a plan moving the text
    // through the shuffle would ship the corpus payload to pack 8-byte
    // counts
    val df = SparkEntry.queries("x_pack_bfd")(spark, sfDir)
    // sparkPlan (pre-AQE): the adaptive wrapper hides Exchange nodes from
    // collect() until execution
    val plan = df.queryExecution.sparkPlan
    spark.catalog.clearCache()
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "packBestFit lost its shard co-location shuffle")
    exchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(!cols.contains("text"),
        s"packBestFit shuffles the payload text: ${cols.mkString(",")}")
      assert(cols.length <= 3,
        s"packBestFit shuffle wider than (id, shard, count): ${cols.mkString(",")}")
    }
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.forall(!_.metadata("ReadSchema").contains("lang")),
      "packBestFit scan reads columns the packing never uses")
  }

  test("scd2 merge executes inside whole-stage codegen") {
    val df = SparkEntry.queries("d06_scd2_merge")(spark, sfDir)
    // execute THIS QueryExecution (df.count() builds a separate one and
    // leaves df's adaptive plan unresolved — the pre-r19 pass relied on
    // the since-removed v1 cache's build plan printing codegen stars)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    // codegen'd operators print with a "*(stageId)" star prefix
    assert(p.contains("*("), "scd2 merge runs interpreted")
  }
}
