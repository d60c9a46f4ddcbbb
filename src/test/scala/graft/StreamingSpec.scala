package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Store
import graft.streaming.StreamingHistorization

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming agg over a file stream matches the batch twin") {
    val batch = graft.sources.Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft-stream").toString
    batch.write.parquet(s"$dir/in")

    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
    val agg = StreamingHistorization.windowedEventAgg(stream, windowLen = "60 minutes")
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("winagg")
      .select(col("window").getField("start").as("ws"), col("event_type"), col("n_events"))
    val expected = batch.groupBy(window(col("ts"), "60 minutes").getField("start").as("ws"),
        col("event_type")).agg(count(lit(1)).as("n_events"))
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }

  test("stateless curation operators run unchanged on a stream (quality + dedup hash)") {
    val batch = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val dir = Files.createTempDirectory("graft-stream-curate").toString
    batch.write.parquet(s"$dir/in")

    // the whole per-row curation layer is stateless projections, so the
    // SAME operator calls work on a streaming frame with no changes
    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
    val curated = graft.operators.TextAnalysis.gopherishFlags(stream, "doc_id", "text")
      .withColumn("split", graft.operators.Sampling.hashUniform(col("doc_id"), "split"))
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("curated")
    val expected = graft.operators.TextAnalysis.gopherishFlags(batch, "doc_id", "text")
      .withColumn("split", graft.operators.Sampling.hashUniform(col("doc_id"), "split"))
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }

  test("sorted-store sink keeps the skipping manifest live and absorbs re-delivery") {
    import graft.sources.StoreIndex
    val batch = spark.range(0, 6000).select(
      ($"id" % 1500).as("k"), $"id".as("row_id"), ($"id" * 7).as("v"))
    val dir = Files.createTempDirectory("graft-sorted-sink").toString
    // 4 range-disjoint input files, streamed one per micro-batch, so the
    // store accumulates range-disjoint sorted files the manifest can prune
    batch.repartitionByRange(4, $"k").write.parquet(s"$dir/in")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = StreamingHistorization.sortedStoreSink(stream, s"$dir/store", "row_id",
          Seq("k"), s"$dir/cp${java.util.UUID.randomUUID().toString.take(8)}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // full re-delivery (fresh checkpoint, same data): id-novelty absorbs
    runOnce()

    val store = spark.read.parquet(s"$dir/store")
    assert(store.count() === 6000, "re-delivery must append nothing")
    // manifest is live: a key range prunes files and matches the batch filter
    val skipped = StoreIndex.readStoreSkipping(spark, s"$dir/store", "k", 100L, 300L)
    val expected = batch.filter($"k".between(100, 300))
    // every appended file must carry the input column order: the absorber
    // anti-join moves its key to the front, and a mixed-order store would
    // seed spark.read's schema from an arbitrary file (the order became
    // scheduling-dependent — this exact assert flaked before the sink
    // re-selected the input order)
    assert(store.columns.toSeq === batch.columns.toSeq)
    assert(skipped.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(skipped).count() === 0)
    assert(skipped.inputFiles.length < store.inputFiles.length,
      "manifest must prune after streaming appends")
  }

  test("stream-maintained aggregate state equals the batch recompute under re-delivery") {
    import graft.operators.MaterializedAgg
    val batch = spark.range(0, 4000).select(
      $"id".as("fact_id"), ($"id" % 7).cast("string").as("g"), ($"id" % 13).cast("double").as("v"))
    val dir = Files.createTempDirectory("graft-agg-stream").toString
    batch.repartition(4).write.parquet(s"$dir/in")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = StreamingHistorization.aggMaintainStream(stream, "fact_id", Seq("g"), "v",
          s"$dir/state", s"$dir/ids", s"$dir/cp${java.util.UUID.randomUUID().toString.take(8)}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // full re-delivery with a fresh checkpoint: the id-novelty absorber
    // must keep every partial at zero — aggregation would double-count
    runOnce()

    val got = MaterializedAgg.finalizeView(
      MaterializedAgg.readMaintainedState(spark, s"$dir/state", Seq("g")).get, Seq("g"))
    val expected = MaterializedAgg.finalizeView(
      MaterializedAgg.partialState(batch, Seq("g"), "v"), Seq("g"))
    assert(got.collect().map(_.toSeq).toSet === expected.collect().map(_.toSeq).toSet)
    // the state store stays sliver-sized: at most |groups| rows per batch
    val perBatch = spark.read.parquet(s"$dir/state")
      .groupBy("ingest_batch").count().collect()
    assert(perBatch.forall(_.getLong(1) <= 7))
  }

  test("agg-maintain replay: a crash between the state write and the ids write cannot double-count") {
    import graft.operators.MaterializedAgg
    val batch = spark.range(0, 1000).select(
      $"id".as("fact_id"), ($"id" % 5).cast("string").as("g"), lit(1.0).as("v"))
    val dir = Files.createTempDirectory("graft-agg-replay").toString
    // crash state after batch 0 committed its PARTIAL STATE but NOT its
    // ids: the dangerous window — a naive replay would re-aggregate the
    // same facts on top of the standing partial and double every count
    MaterializedAgg.partialState(batch, Seq("g"), "v")
      .write.parquet(s"$dir/state/ingest_batch=0")
    batch.write.parquet(s"$dir/in/d0")
    // no checkpoint: the stream replays batch 0 from scratch
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingHistorization.aggMaintainStream(stream, "fact_id", Seq("g"), "v",
        s"$dir/state", s"$dir/ids", s"$dir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the replay's novelty read EXCLUDED its own batch partition and its
    // state write OVERWROTE it: merged answer identical to the recompute
    val got = MaterializedAgg.finalizeView(
      MaterializedAgg.readMaintainedState(spark, s"$dir/state", Seq("g")).get, Seq("g"))
    val want = MaterializedAgg.finalizeView(
      MaterializedAgg.partialState(batch, Seq("g"), "v"), Seq("g"))
    assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    assert(spark.read.parquet(s"$dir/ids").count() === batch.count())
  }

  test("stream-maintained join view equals the batch join under re-delivery") {
    import graft.operators.MaterializedJoin
    val dim = spark.range(0, 7).select(
      $"id".as("k"), concat(lit("dim-"), $"id").as("label"))
    val facts = spark.range(0, 3000).select(
      $"id".as("fact_id"), ($"id" % 7).as("k"), ($"id" % 13).cast("double").as("v"))
    val dir = Files.createTempDirectory("graft-join-stream").toString
    facts.repartition(3).write.parquet(s"$dir/in")

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(facts.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = StreamingHistorization.joinMaintainStream(stream, Seq("fact_id"), dim,
          Seq("k"), s"$dir/join", s"$dir/ids",
          s"$dir/cp${java.util.UUID.randomUUID().toString.take(8)}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // full re-delivery with a fresh checkpoint: the id-novelty absorber
    // must contribute nothing — a re-joined fact would duplicate rows
    runOnce()

    val got = MaterializedJoin.readView(spark, s"$dir/join").get
    val want = facts.join(dim, Seq("k"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("join-maintain replay: a crash between the delta write and the ids write cannot duplicate") {
    import graft.operators.MaterializedJoin
    val dim = spark.range(0, 5).select($"id".as("k"), concat(lit("d"), $"id").as("label"))
    val facts = spark.range(0, 800).select(
      $"id".as("fact_id"), ($"id" % 5).as("k"), lit(1.0).as("v"))
    val dir = Files.createTempDirectory("graft-join-replay").toString
    // crash state: batch 0 committed its JOIN DELTA but not its ids —
    // a naive replay would re-join the same facts and double the view
    MaterializedJoin.appendDelta(s"$dir/join", 0L,
      MaterializedJoin.insertDeltaLeft(facts, dim, Seq("k")))
    facts.write.parquet(s"$dir/in/d0")
    val stream = spark.readStream.schema(facts.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
    val q = StreamingHistorization.joinMaintainStream(stream, Seq("fact_id"), dim,
        Seq("k"), s"$dir/join", s"$dir/ids", s"$dir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = MaterializedJoin.readView(spark, s"$dir/join").get
    val want = facts.join(dim, Seq("k"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
  }

  test("stream-stream interval join matches the batch attribution join") {
    val batch = graft.sources.Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    batch.write.parquet(s"$dir/in")

    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
    val joined = StreamingHistorization.intervalJoinStream(stream, "purchase", "click", 120,
      watermarkDelay = "4 hours")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("ssjoin")
    val expected = graft.operators.EventAnalytics.attributionJoin(batch, "purchase", "click", 120)
    assert(streamed.count() > 0, "fixture must produce attributed pairs")
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }

  test("flatMapGroupsWithState sessionization matches the batch twin on closed sessions") {
    val batch = graft.sources.Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft-sessions").toString
    batch.write.parquet(s"$dir/in")

    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
    val sessions = graft.streaming.StatefulSessions.sessionizeStream(stream, gapSec = 1800)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // every gap-closed session (all but each user's last) must be emitted;
    // the final watermark advance may additionally emit last-open sessions
    // via EventTimeTimeout — those must still match batch sessions exactly
    val streamed = spark.table("sess")
      .select($"user_id".cast("long"), $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events".cast("long"))
      .collect().map(_.toSeq).toSet
    val bt = graft.operators.EventAnalytics.sessionize(batch, 30)
    val all = bt
      .select($"user_id".cast("long"), $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events".cast("long"))
      .collect().map(_.toSeq).toSet
    val lastPerUser = bt.groupBy("user_id").agg(max("session_no").as("session_no"))
    val gapClosed = bt.join(lastPerUser, Seq("user_id", "session_no"), "left_anti")
      .select($"user_id".cast("long"), $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events".cast("long"))
      .collect().map(_.toSeq).toSet
    assert(gapClosed.subsetOf(streamed), "missing gap-closed sessions")
    assert(streamed.subsetOf(all), "emitted a session the batch twin does not produce")
    assert(gapClosed.nonEmpty)
  }

  test("transformWithState sessionization agrees with the flatMapGroupsWithState form") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = graft.sources.Tables.events(spark, sfDir)
      val dir = Files.createTempDirectory("graft-tws").toString
      batch.write.parquet(s"$dir/in")
      val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in", batch.schema)
      val sessions = graft.streaming.TransformWithStateSessions.sessionizeStream(stream, 1800)
      val q = sessions.writeStream.format("memory").queryName("tws_sess")
        .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table("tws_sess")
        .select($"user_id", $"session_start".cast("string"), $"session_end".cast("string"),
          $"n_events").collect().map(_.toSeq).toSet
      // same guarantees as the flatMapGroupsWithState test: all gap-closed
      // sessions present, nothing outside the batch twin's session set
      val bt = graft.operators.EventAnalytics.sessionize(batch, 30)
      val all = bt.select($"user_id".cast("long"), $"session_start".cast("string"),
        $"session_end".cast("string"), $"n_events".cast("long"))
        .collect().map(_.toSeq).toSet
      val lastPerUser = bt.groupBy("user_id").agg(max("session_no").as("session_no"))
      val gapClosed = bt.join(lastPerUser, Seq("user_id", "session_no"), "left_anti")
        .select($"user_id".cast("long"), $"session_start".cast("string"),
          $"session_end".cast("string"), $"n_events".cast("long"))
        .collect().map(_.toSeq).toSet
      assert(gapClosed.subsetOf(streamed), "missing gap-closed sessions")
      assert(streamed.subsetOf(all), "emitted a session the batch twin does not produce")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dropDuplicatesWithinWatermark dedup stream keeps one row per key") {
    val batch = graft.sources.Tables.events(spark, sfDir).limit(200)
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    batch.write.parquet(s"$dir/in")
    batch.write.mode("append").parquet(s"$dir/in") // full re-delivery
    val stream = spark.readStream.schema(batch.schema).parquet(s"$dir/in")
    val deduped = StreamingHistorization.dedupStream(stream, "ts", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_stream").count() === 200)
  }

  test("watermarked paths accept a TIMESTAMP_NTZ event-time column (parquet timestamp[us])") {
    // Parquet `timestamp[us]` with no timezone reads back as TIMESTAMP_NTZ in
    // Spark 4; withWatermark requires TIMESTAMP. Both watermarked operators
    // must normalize rather than throw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.
    val ntz = graft.sources.Tables.events(spark, sfDir).limit(100)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assert(ntz.schema("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)
    val dir = Files.createTempDirectory("graft-ntz").toString
    ntz.write.parquet(s"$dir/in")
    val readBack = spark.read.parquet(s"$dir/in")
    assert(readBack.schema("ts").dataType === org.apache.spark.sql.types.TimestampNTZType)

    val stream = spark.readStream.schema(readBack.schema).parquet(s"$dir/in")
    val agg = StreamingHistorization.windowedEventAgg(stream, windowLen = "60 minutes")
    val q1 = agg.writeStream.format("memory").queryName("ntz_agg")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination()
    assert(spark.table("ntz_agg").count() > 0)

    val deduped = StreamingHistorization.dedupStream(stream, "ts", Seq("event_id"))
    val q2 = deduped.writeStream.format("memory").queryName("ntz_dedup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("ntz_dedup").count() === 100)
  }

  test("streaming incremental dedup matches the batch operator's digest set") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val known = docs.filter($"doc_id" % 2 === 0)
      .select(graft.functions.HashColumns.hashExpr(Seq($"text")).as("content_hash"))
    val dir = Files.createTempDirectory("graft-inc-dedup").toString
    docs.write.parquet(s"$dir/in")
    docs.write.mode("append").parquet(s"$dir/in") // full re-delivery

    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    val novel = StreamingHistorization.incrementalExactStream(stream, Seq("text"), known)
    val q = novel.writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // keep-first on a stream is arrival-order-dependent, so compare the
    // digest SET (and count) against the batch operator, not row identity
    val streamed = spark.table("inc_dedup").select("content_hash").as[String].collect().toSet
    val batchTwin = graft.operators.Dedup.incrementalExact(docs, "doc_id", Seq("text"), known)
      .select("content_hash").as[String].collect().toSet
    assert(streamed === batchTwin)
    assert(spark.table("inc_dedup").count().toInt === batchTwin.size)
  }

  test("streaming URL canon + dedup equals the batch operator under re-delivery") {
    // derived messy URLs over the documents ids: canonical twins differ in
    // scheme case / default port / param order / tracking params
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 400)
    val urls = docs.select($"doc_id".as("url_id"),
      concat(
        when($"doc_id" % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
        lit("site"), pmod($"doc_id" % 100, lit(37)).cast("string"), lit(".example.com"),
        when($"doc_id" % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/d/"), ($"doc_id" % 100).cast("string"),
        when($"doc_id" % 3 === 0, lit("?utm_source=x&a=1")).otherwise(lit("?a=1")))
        .as("url"))
    val known = urls.filter($"url_id" % 2 === 0)
      .select(graft.operators.Urls.canonicalizeUrl($"url").as("canonical_url"))
      .distinct()
    val dir = Files.createTempDirectory("graft-url-stream").toString
    urls.write.parquet(s"$dir/in")
    urls.write.mode("append").parquet(s"$dir/in") // full re-delivery

    val stream = spark.readStream.schema(urls.schema).parquet(s"$dir/in")
    val novel = StreamingHistorization.urlDedupStream(stream, "url", known)
    val q = novel.writeStream.format("memory").queryName("url_dedup")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // keep-first on a stream is arrival-order-dependent: compare the
    // CANONICAL set against the batch operator, and one row per canonical
    val streamed = spark.table("url_dedup")
      .select("canonical_url").as[String].collect().toSet
    val batchTwin = graft.operators.Urls
      .incrementalDuplicateUrls(urls, "url_id", "url", known)
      .select("canonical_url").as[String].collect().toSet
    assert(streamed === batchTwin)
    assert(spark.table("url_dedup").count().toInt === batchTwin.size)
    // no standing canonical ever re-ingests
    assert(spark.table("url_dedup")
      .join(known, Seq("canonical_url"), "left_semi").count() === 0)
  }

  test("streaming near-dup candidates equal the batch self-join under re-delivery") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-neardup-stream").toString
    // three file drops -> three micro-batches (maxFilesPerTrigger=1):
    // evens, odds, then a FULL re-delivery of every document
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$dir/in/d0")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/d1")
    docs.write.parquet(s"$dir/in/d2")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val writer = StreamingHistorization.nearDupStream(
      stream, "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/chk")
    StreamingHistorization.runOnce(writer)

    val streamed = spark.read.parquet(s"$dir/pairs")
    val streamedSet = streamed.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val batchTwin = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamedSet === batchTwin)
    assert(batchTwin.nonEmpty, "fixture sanity: candidates exist")
    // exactly-once per pair: the store holds no duplicate rows, because
    // re-delivered docs are absorbed before probing
    assert(streamed.count() === streamedSet.size)
    // the index holds each doc once (bands rows each), despite re-delivery
    val ix = spark.read.parquet(s"$dir/index")
    assert(ix.select("id").distinct().count() === docs.count())
    assert(ix.count() === docs.count() * 4)
  }

  test("replay after a partial index append recovers the missing band rows and pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val evens = docs.filter($"doc_id" % 2 === 0)
    val dir = Files.createTempDirectory("graft-partial-append").toString

    // Crash state after the evens batch: pairs fully committed (pairs are
    // written BEFORE the index), but the index append died mid-write and
    // committed only bands 0-1 of one doc. Every other even doc is whole.
    val victim = evens.select(min("doc_id")).first().getLong(0)
    graft.operators.Dedup.minhashCandidates(evens, "doc_id", "text")
      .select("id_a", "id_b").write.parquet(s"$dir/pairs")
    graft.operators.Dedup.minhashBandIndex(evens, "doc_id", "text", 3, 8, 4)
      .filter(!(col("id") === victim && col("band") >= 2))
      .write.parquet(s"$dir/index")

    // The replay: the source re-delivers the evens, then the odds arrive.
    evens.write.parquet(s"$dir/in/d0")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.nearDupStream(
      stream, "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/chk"))

    // The victim's missing band rows were re-appended (tuple-level novelty),
    // nothing was duplicated, and the pair SET equals the batch twin.
    val ix = spark.read.parquet(s"$dir/index")
    assert(ix.count() === docs.count() * 4)
    assert(ix.distinct().count() === ix.count())
    val streamedSet = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val batchTwin = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamedSet === batchTwin)
    assert(batchTwin.nonEmpty, "fixture sanity: candidates exist")
  }

  test("streaming spans equal the batch operator per ingestion prefix under re-delivery") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-spans-stream").toString
    // three micro-batches: evens, odds, then a FULL re-delivery
    val evens = docs.filter($"doc_id" % 2 === 0)
    val odds = docs.filter($"doc_id" % 2 === 1)
    evens.write.parquet(s"$dir/in/d0")
    odds.write.parquet(s"$dir/in/d1")
    docs.write.parquet(s"$dir/in/d2")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.spansStream(
      stream, "doc_id", "text",
      s"$dir/grams", s"$dir/ids", s"$dir/spans", s"$dir/chk", k = 20))

    // spans per ingestion prefix: batch 0's docs against themselves,
    // batch 1's docs against the full corpus (evens' grams standing);
    // the re-delivered batch 2 contributes NOTHING (absorbed by id)
    val want0 = graft.operators.Dedup.duplicatedSpans(evens, "doc_id", "text",
      k = 20, stride = 1).as[(Long, Long, Long)].collect().toSet
    val want1 = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
        k = 20, stride = 1)
      .filter($"doc_id" % 2 === 1).as[(Long, Long, Long)].collect().toSet
    val spans = spark.read.parquet(s"$dir/spans")
    val got = spans.select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === (want0 ++ want1))
    assert(want1.nonEmpty, "fixture sanity: cross-batch spans exist")
    // exactly-once: no duplicate span rows despite the full re-delivery,
    // and the re-delivered batch's partition is empty
    assert(spans.count() === got.size)
    assert(spans.filter($"ingest_batch" === 2).count() === 0)
    // the gram store holds each prefix's distinct hashes; the ids store
    // each doc once
    val ids = spark.read.parquet(s"$dir/ids")
    assert(ids.select("id").distinct().count() === docs.count())
    assert(ids.count() === docs.count())
    val gramsGot = spark.read.parquet(s"$dir/grams").select("gh").distinct().count()
    val gramsWant = graft.operators.Dedup.spanGramsOf(docs, "doc_id", "text", k = 20).count()
    assert(gramsGot === gramsWant)
  }

  test("spans stream replay: a crash between the gram append and the ids append cannot self-match") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 200)
    val dir = Files.createTempDirectory("graft-spans-replay").toString
    // crash state after batch 0 committed spans AND grams but NOT ids:
    // the dangerous window — a naive replay would probe its own grams
    // and flag every position of every batch-0 doc
    graft.operators.Dedup.incrementalDuplicatedSpans(
        docs.select($"doc_id".as("id"), $"text".as("t")), "id", "t",
        spark.range(0).select($"id".as("gh")), k = 20)
      .write.parquet(s"$dir/spans/ingest_batch=0")
    graft.operators.Dedup.spanGramsOf(docs, "doc_id", "text", k = 20)
      .write.parquet(s"$dir/grams/ingest_batch=0")
    // no checkpoint: the stream replays batch 0 from scratch
    docs.write.parquet(s"$dir/in/d0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.spansStream(
      stream, "doc_id", "text",
      s"$dir/grams", s"$dir/ids", s"$dir/spans", s"$dir/chk", k = 20))
    // the replay read EXCLUDED its own batch partition: result identical
    // to the batch twin, no self-match blow-up
    val got = spark.read.parquet(s"$dir/spans")
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)].collect().toSet
    val want = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text",
      k = 20, stride = 1).as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture sanity: spans exist")
    assert(spark.read.parquet(s"$dir/ids").count() === docs.count())
  }

  test("purgeSpanStores leaves the spans stores equal to a survivor-stream rebuild") {
    // takedown over the spans family: after removing every 7th doc, all
    // three stores must equal what spansStream over the SURVIVOR stream
    // would have written — including survivors' spans that existed only
    // because of a removed doc's grams (no per-id delete can see those)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val removedIds = docs.filter($"doc_id" % 7 === 0).select($"doc_id")
    val survivors = docs.filter($"doc_id" % 7 =!= 0)
    def ingest(src: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      (0 to 2).foreach(b => src.filter($"doc_id" % 3 === b).write.parquet(s"$dir/in/d$b"))
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      StreamingHistorization.runOnce(StreamingHistorization.spansStream(
        stream, "doc_id", "text",
        s"$dir/grams", s"$dir/ids", s"$dir/spans", s"$dir/chk", k = 20))
    }
    val dirA = Files.createTempDirectory("graft-spans-purge").toString
    ingest(docs, dirA)
    val replayed = graft.operators.Dedup.purgeSpanStores(
      spark, removedIds, survivors, "doc_id", "text",
      s"$dirA/grams", s"$dirA/ids", s"$dirA/spans", k = 20)
    // doc 0 sits in batch 0, so the replay cascades over the whole suffix
    assert(replayed === Seq(0L, 1L, 2L))
    val dirB = Files.createTempDirectory("graft-spans-rebuild").toString
    ingest(survivors, dirB)
    def slurp(dir: String, store: String, cols: Seq[String]) =
      spark.read.parquet(s"$dir/$store").select(cols.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    val spanCols = Seq("doc_id", "span_start", "span_end", "ingest_batch")
    assert(slurp(dirA, "spans", spanCols) === slurp(dirB, "spans", spanCols))
    assert(slurp(dirA, "ids", Seq("id", "ingest_batch")) ===
      slurp(dirB, "ids", Seq("id", "ingest_batch")))
    assert(slurp(dirA, "grams", Seq("gh", "ingest_batch")) ===
      slurp(dirB, "grams", Seq("gh", "ingest_batch")))
    // fixture sanity: the purge actually changed the spans store
    assert(slurp(dirA, "spans", spanCols).nonEmpty)
  }

  test("spans takedown stream repairs the spans family and absorbs re-delivery") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-spans-td").toString
    (0 to 2).foreach(b => docs.filter($"doc_id" % 3 === b).write.parquet(s"$dir/in/d$b"))
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.spansStream(
      stream, "doc_id", "text",
      s"$dir/grams", s"$dir/ids", s"$dir/spans", s"$dir/chk", k = 20))
    docs.write.parquet(s"$dir/docs")
    // the takedown feed: every 7th doc
    docs.filter($"doc_id" % 7 === 0).select("doc_id").write.parquet(s"$dir/rm/d0")
    def takedown(chk: String): Unit = {
      val feed = spark.readStream
        .schema(docs.select("doc_id").schema).parquet(s"$dir/rm/*")
      StreamingHistorization.runOnce(StreamingHistorization.spansTakedownStream(
        feed, s"$dir/docs", "doc_id", "text",
        s"$dir/grams", s"$dir/ids", s"$dir/spans", chk, k = 20))
    }
    takedown(s"$dir/chk_rm")
    // re-delivery: a fresh checkpoint re-applies the same removal — must
    // be the identity (ids already gone everywhere)
    takedown(s"$dir/chk_rm2")
    // all three stores equal the survivor-stream rebuild
    val survivors = docs.filter($"doc_id" % 7 =!= 0)
    val dirB = Files.createTempDirectory("graft-spans-td-rebuild").toString
    (0 to 2).foreach(b =>
      survivors.filter($"doc_id" % 3 === b).write.parquet(s"$dirB/in/d$b"))
    val streamB = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dirB/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.spansStream(
      streamB, "doc_id", "text",
      s"$dirB/grams", s"$dirB/ids", s"$dirB/spans", s"$dirB/chk", k = 20))
    def slurp(d: String, store: String, cols: Seq[String]) =
      spark.read.parquet(s"$d/$store").select(cols.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSet
    assert(slurp(dir, "spans", Seq("doc_id", "span_start", "span_end", "ingest_batch")) ===
      slurp(dirB, "spans", Seq("doc_id", "span_start", "span_end", "ingest_batch")))
    assert(slurp(dir, "ids", Seq("id", "ingest_batch")) ===
      slurp(dirB, "ids", Seq("id", "ingest_batch")))
    assert(slurp(dir, "grams", Seq("gh", "ingest_batch")) ===
      slurp(dirB, "grams", Seq("gh", "ingest_batch")))
    // and the doc store lost exactly the removed docs
    assert(spark.read.parquet(s"$dir/docs").count() === survivors.count())
  }

  test("streaming cluster maintenance converges to the full-recompute labeling") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-clmaint-stream").toString
    // three micro-batches: evens, odds, then a FULL re-delivery
    docs.filter($"doc_id" % 2 === 0).write.parquet(s"$dir/in/d0")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/d1")
    docs.write.parquet(s"$dir/in/d2")

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    val writer = StreamingHistorization.clusterMaintainStream(
      stream, "doc_id", "text",
      s"$dir/index", s"$dir/pairs", s"$dir/labels", s"$dir/chk")
    StreamingHistorization.runOnce(writer)

    val labels = spark.read.parquet(s"$dir/labels")
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val batchTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(labels === batchTwin)
    assert(batchTwin.nonEmpty, "fixture sanity: clusters exist")
    // one label per node, no duplicate rows in the swapped store
    assert(spark.read.parquet(s"$dir/labels").count() === labels.size)
    // re-delivery absorbed: the index holds each doc once (bands rows each)
    val ix = spark.read.parquet(s"$dir/index")
    assert(ix.select("id").distinct().count() === docs.count())
  }

  test("manifest-committed maintenance: labels and stats compose from one pass, never mixed") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-manifest-labels").toString
    val evens = docs.filter($"doc_id" % 2 === 0)
    evens.write.parquet(s"$dir/in/d0")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.clusterMaintainStream(
      stream, "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/labels",
      s"$dir/chk", labelsGenerations = 3,
      manifestPath = Some(s"$dir/manifest"), statsPath = Some(s"$dir/stats")))
    val paths = Map("labels" -> s"$dir/labels", "stats" -> s"$dir/stats")
    val manifests = graft.sources.Store.listGenerations(spark, s"$dir/manifest")
    assert(manifests.size === 2, "one manifest per micro-batch")
    // every retained manifest resolves a CONSISTENT pair: the pinned
    // stats row equals clusterStats of the pinned labels — for the old
    // pass as for the new (a latest-per-store read could not promise
    // this across the pass boundary)
    manifests.foreach { m =>
      val (_, pinned) = graft.sources.Store.readSnapshot(
        spark, s"$dir/manifest", paths, Some(m)).get
      val statsOfLabels = graft.operators.Dedup.clusterStats(pinned("labels"))
        .collect().head.toSeq
      assert(pinned("stats").collect().head.toSeq === statsOfLabels,
        s"manifest $m pins a mixed pass")
    }
    // and the latest labels equal the full recompute (the loop is still
    // the same loop)
    val fullTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val (_, latest) = graft.sources.Store.readSnapshot(spark, s"$dir/manifest", paths).get
    assert(latest("labels").select("id", "cluster_id")
      .as[(Long, Long)].collect().toSet === fullTwin)
    // the two passes' stats DIFFER (the fixture really crosses a pass
    // boundary, so a mixed read would have been caught)
    val s1 = graft.sources.Store.readSnapshot(spark, s"$dir/manifest", paths,
      Some(manifests.head)).get._2("stats").collect().head.toSeq
    val s2 = latest("stats").collect().head.toSeq
    assert(s1 !== s2)
  }

  test("generation-committed labels: maintenance preserves passes, takedown repairs latest") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-gen-labels").toString
    val evens = docs.filter($"doc_id" % 2 === 0)
    // two micro-batches: evens, then odds — each commits a labels GENERATION
    evens.write.parquet(s"$dir/in/d0")
    docs.filter($"doc_id" % 2 === 1).write.parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.clusterMaintainStream(
      stream, "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/labels",
      s"$dir/chk", labelsGenerations = 3))

    val gens = graft.sources.Store.listGenerations(spark, s"$dir/labels")
    assert(gens.size === 2, "one committed generation per micro-batch")
    // pass 1's labeling is PRESERVED: exactly the evens-only recompute
    val g1 = graft.sources.Store.readStoreGeneration(spark, s"$dir/labels", gens.head)
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val evensTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(evens, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(g1 === evensTwin)
    // the latest pass equals the full recompute
    val g2 = graft.sources.Store.readStoreLatest(spark, s"$dir/labels").get._2
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val fullTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(g2 === fullTwin)

    // takedown on the generation-layout labels: latest generation equals
    // the rebuild over survivors; the pre-takedown pass is still pinned
    val victim = spark.read.parquet(s"$dir/pairs")
      .select($"id_a").orderBy($"id_a").limit(1).as[Long].head()
    Seq(victim).toDF("doc_id").write.parquet(s"$dir/rm/d0")
    val feed = spark.readStream.schema(Seq(victim).toDF("doc_id").schema).parquet(s"$dir/rm/*")
    StreamingHistorization.runOnce(StreamingHistorization.takedownStream(
      feed, s"$dir/index", s"$dir/pairs", s"$dir/labels", s"$dir/chk_rm",
      labelsGenerations = 3))
    val survivors = docs.filter($"doc_id" =!= victim)
    val survivorTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(survivors, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(graft.sources.Store.readStoreLatest(spark, s"$dir/labels").get._2
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet === survivorTwin)
    // the pre-takedown generation still reads (the reader-grace contract;
    // also the erasure caveat the scaladoc documents — keep=1 to prune)
    val gens2 = graft.sources.Store.listGenerations(spark, s"$dir/labels")
    assert(gens2.size === 3)
    assert(graft.sources.Store.readStoreGeneration(spark, s"$dir/labels", gens2(1))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet === fullTwin)
  }

  test("streaming takedown repairs standing stores to the recompute without the ids") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 300)
    val dir = Files.createTempDirectory("graft-takedown-stream").toString

    // standing state: the maintenance loop ingests the whole corpus
    docs.write.parquet(s"$dir/in/d0")
    val ingest = spark.readStream.schema(docs.schema).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.clusterMaintainStream(
      ingest, "doc_id", "text", s"$dir/index", s"$dir/pairs", s"$dir/labels", s"$dir/chk_in"))
    // plus an extra per-document artifact: the exact-dedup digest store
    val digests = docs.withColumn("content_hash",
      graft.functions.HashColumns.hashExpr(Seq($"text")))
      .select("doc_id", "content_hash")
    digests.write.parquet(s"$dir/digests")

    // takedown feed: two ids that ARE paired (so cluster repair runs),
    // delivered in two micro-batches, the first re-delivered (replay)
    val paired = spark.read.parquet(s"$dir/pairs")
      .select($"id_a").distinct().orderBy($"id_a").limit(2).as[Long].collect()
    val Array(r0, r1) = paired
    Seq(r0).toDF("doc_id").write.parquet(s"$dir/rm/d0")
    Seq(r1).toDF("doc_id").write.parquet(s"$dir/rm/d1")
    Seq(r0).toDF("doc_id").write.parquet(s"$dir/rm/d2") // re-delivery
    val feed = spark.readStream.schema(Seq(r0).toDF("doc_id").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/rm/*")
    StreamingHistorization.runOnce(StreamingHistorization.takedownStream(
      feed, s"$dir/index", s"$dir/pairs", s"$dir/labels", s"$dir/chk_rm",
      extraStores = Seq((s"$dir/digests", "doc_id"))))

    // stores ≡ from-scratch rebuild over the surviving corpus
    val survivors = docs.filter(!$"doc_id".isin(r0, r1))
    val labelTwin = graft.operators.Dedup.duplicateClusters(
        graft.operators.Dedup.minhashCandidates(survivors, "doc_id", "text"))
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(spark.read.parquet(s"$dir/labels")
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet === labelTwin)
    val pairTwin = graft.operators.Dedup.minhashCandidates(survivors, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet === pairTwin)
    val ix = spark.read.parquet(s"$dir/index")
    assert(ix.filter($"id".isin(r0, r1)).count() === 0)
    assert(ix.select("id").distinct().count() === survivors.count())
    assert(spark.read.parquet(s"$dir/digests").filter($"doc_id".isin(r0, r1)).count() === 0)
    assert(pairTwin.nonEmpty, "fixture sanity: surviving pairs exist")
  }

  test("streaming decontamination equals the batch twin and is stateless under re-delivery") {
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val train = docsAll.filter($"doc_id" % 20 =!= 0)
    val bench = docsAll.filter($"doc_id" % 20 === 0)

    val dir = Files.createTempDirectory("graft-stream-decon").toString
    train.write.parquet(s"$dir/in")
    train.write.mode("append").parquet(s"$dir/in") // full re-delivery

    val stream = spark.readStream.schema(train.schema).parquet(s"$dir/in")
    val clean = StreamingHistorization.decontaminateStream(stream, bench, "text", n = 3)
    val q = clean.writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("decon_stream")
    val streamedIds = streamed.select("doc_id").as[Long].collect().toSet
    val batchIds = graft.operators.Decontamination
      .decontaminate(train, bench, "doc_id", "text", 3, 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(streamedIds === batchIds)
    // stateless by design: BOTH deliveries of every surviving doc pass
    // through — the filter decision is per-row, no state store involved
    assert(streamed.count() === 2L * batchIds.size)
    assert(batchIds.nonEmpty && batchIds.size < train.count())
  }

  test("streaming span scrub equals the batch scrub and is stateless under re-delivery") {
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val train = docsAll.filter($"doc_id" % 20 =!= 0)
    val bench = docsAll.filter($"doc_id" % 20 === 0)

    val dir = Files.createTempDirectory("graft-stream-scrub").toString
    train.write.parquet(s"$dir/in")
    train.write.mode("append").parquet(s"$dir/in") // full re-delivery

    val stream = spark.readStream.schema(train.schema).parquet(s"$dir/in")
    val scrubbed = StreamingHistorization.scrubSpansStream(
      stream, bench, "doc_id", "text", k = 30)
    val q = scrubbed.writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("scrub_stream")
      .select($"doc_id", $"text".as("cleaned")).distinct()
    val batch = graft.operators.Decontamination
      .decontaminateSpans(train, bench, "doc_id", "text", k = 30)
    // row-local fold ≡ batch explode/join/window composition, byte-for-byte
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // stateless: both deliveries scrub identically, so distinct halves the rows
    assert(spark.table("scrub_stream").count() === 2L * batch.count())
    // fixture sanity: the scrub actually rewrote something
    assert(batch.join(train, Seq("doc_id"))
      .filter($"cleaned" =!= $"text" ||
        ($"cleaned".isNull =!= $"text".isNull)).count() > 0)
  }

  test("foreachBatch historization absorbs re-delivered snapshots idempotently") {
    val dir = Files.createTempDirectory("graft-stream-hist").toString
    val snap = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    snap.write.parquet(s"$dir/in/batch0")
    // re-deliver the same content as a second file drop
    snap.write.mode("append").parquet(s"$dir/in/batch1")

    val stream = spark.readStream.schema(snap.schema).parquet(s"$dir/in/*")
    val writer = StreamingHistorization.historizeStream(
      stream, s"$dir/store", Seq("k"), s"$dir/chk")
    StreamingHistorization.runOnce(writer)

    val store = Store.readParquetSafe(spark, s"$dir/store").get
    assert(store.count() === 2) // duplicates absorbed by the hash anti-join
  }

  test("scd2 lifecycle stream: merge, delete-closure, and reopen equal the batch composition") {
    import graft.operators.Scd2
    import graft.operators.MetaEnrichment.addMetaColumns
    val dir = Files.createTempDirectory("graft-stream-scd2").toString
    val fmt = java.time.format.DateTimeFormatter.ofPattern(graft.meta.MetaColumns.TsFormat)
    // one DAY per batch so close (runDay-1) and reopen (runDay) are visibly apart
    val tsOf = (b: Long) =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(b).atTime(9, 0).format(fmt)
    val snapA = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    val snapB = Seq(("a", "9"), ("b", "2")).toDF("k", "v") // a changes, c vanishes
    val snapC = Seq(("a", "9"), ("b", "2"), ("c", "4")).toDF("k", "v") // c returns

    // drive the stream one full load per trigger (the contract)
    val writer = (s: org.apache.spark.sql.DataFrame) => StreamingHistorization
      .scd2LifecycleStream(s, s"$dir/store", Seq("k"), s"$dir/chk",
        loadTsForBatch = tsOf)
    Seq(snapA, snapB, snapC).zipWithIndex.foreach { case (snap, i) =>
      // ONE file per drop: a multi-file snapshot under maxFilesPerTrigger=1
      // would split one full load into several partial "loads"
      snap.coalesce(1).write.mode("append").parquet(s"$dir/in/drop$i")
      val stream = spark.readStream.schema(snapA.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      StreamingHistorization.runOnce(writer(stream))
    }
    val store = Store.readParquetSafe(spark, s"$dir/store").get

    // batch twin with the identical run contexts
    val Seq(c1, c2, c3) = (0L to 2L).map(b => graft.meta.Currents(tsOf(b))).toSeq
    val m = Scd2.ValidFromMode.LoadDate
    val s1 = Scd2.historizeDataset(addMetaColumns(snapA, c1, Seq("k")), None, c1, m)
    val e2 = addMetaColumns(snapB, c2, Seq("k"))
    val s2 = Scd2.closeVanished(Scd2.mergeScd2Reopen(s1, e2, c2, m), e2, c2)
    val e3 = addMetaColumns(snapC, c3, Seq("k"))
    val s3 = Scd2.closeVanished(Scd2.mergeScd2Reopen(s2, e3, c3, m), e3, c3)
    assert(store.collect().map(_.toSeq).toSet === s3.collect().map(_.toSeq).toSet)

    // the lifecycle's observable semantics: c's deleted epoch is a GAP
    import graft.meta.MetaColumns.{Deleted, ValidTo}
    assert(Scd2.asOf(store, "2024-01-02").filter($"k" === "c").count() === 0)
    assert(Scd2.asOf(store, "2024-01-03").filter($"k" === "c" && $"v" === "4").count() === 1)
    // the close carries the DELETED stamp; the reopened row does not
    assert(store.filter($"k" === "c" && col(Deleted).isNotNull).count() === 1)
    assert(store.filter($"k" === "c" && col(ValidTo) === to_date(lit("9999-12-31")))
      .select(Deleted).collect().head.isNullAt(0))
  }

  test("streaming hll maintenance absorbs re-delivery and equals the fresh estimate") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft-stream-hll").toString
    // three shards PLUS shard 0 re-delivered: the duplicate drop must not
    // inflate the estimate (register max is idempotent — no ids store).
    // No per-trigger file cap either: ANY batching merges identically.
    (0 to 2).foreach(i => events.filter(pmod(col("event_id"), lit(3)) === i)
      .write.mode("append").parquet(s"$dir/in/drop$i"))
    events.filter(pmod(col("event_id"), lit(3)) === 0)
      .write.mode("append").parquet(s"$dir/in/redrop0")
    val stream = StreamingHistorization.readParquetStream(spark, s"$dir/in/*", events.schema)
    StreamingHistorization.runOnce(StreamingHistorization.aggMaintainHllStream(
      stream, Seq("event_type"), "user_id", s"$dir/state", s"$dir/chk", p = 4))
    val got = StreamingHistorization
      .readHllEstimate(spark, s"$dir/state", Seq("event_type"), p = 4).get
    val fresh = graft.operators.Sketches.approxDistinctHll(
      events, Seq("event_type"), "user_id", p = 4)
    assert(got.collect().map(_.toSeq).toSet === fresh.collect().map(_.toSeq).toSet)
  }

  test("tiered scd2 stream equals the flat lifecycle stream's store") {
    import graft.operators.Scd2Tier
    val dir = Files.createTempDirectory("graft-stream-tier").toString
    val fmt = java.time.format.DateTimeFormatter.ofPattern(graft.meta.MetaColumns.TsFormat)
    val tsOf = (b: Long) =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(b).atTime(9, 0).format(fmt)
    val snaps = Seq(
      Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v"),
      Seq(("a", "9"), ("b", "2")).toDF("k", "v"),
      Seq(("a", "9"), ("b", "2"), ("c", "4")).toDF("k", "v"))
    snaps.zipWithIndex.foreach { case (snap, i) =>
      snap.coalesce(1).write.mode("append").parquet(s"$dir/in/drop$i")
      snap.coalesce(1).write.mode("append").parquet(s"$dir/in2/drop$i")
      val tiered = spark.readStream.schema(snaps.head.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      StreamingHistorization.runOnce(StreamingHistorization.scd2TieredStream(
        tiered, s"$dir/active", s"$dir/history", Seq("k"), s"$dir/chk",
        loadTsForBatch = tsOf))
      val flat = spark.readStream.schema(snaps.head.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in2/*")
      StreamingHistorization.runOnce(StreamingHistorization.scd2LifecycleStream(
        flat, s"$dir/flat", Seq("k"), s"$dir/chk2", loadTsForBatch = tsOf))
    }
    val tiered = Scd2Tier.readTiered(spark, s"$dir/active", s"$dir/history").get
    val flat = Store.readParquetSafe(spark, s"$dir/flat").get
    assert(tiered.collect().map(_.toSeq).toSet === flat.collect().map(_.toSeq).toSet)
    // and the active tier really is active-only (the cost-bound claim)
    import graft.meta.MetaColumns.ValidTo
    assert(spark.read.parquet(s"$dir/active")
      .filter(col(ValidTo) =!= to_date(lit("9999-12-31"))).count() === 0)
  }

  test("scd2 lifecycle batch replay is a fixpoint: same loadTs applied twice equals once") {
    val dir = Files.createTempDirectory("graft-stream-scd2-replay").toString
    val fmt = java.time.format.DateTimeFormatter.ofPattern(graft.meta.MetaColumns.TsFormat)
    val tsOf = (b: Long) =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(b).atTime(9, 0).format(fmt)
    val m = graft.operators.Scd2.ValidFromMode.LoadDate
    val snapA = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v")
    val snapB = Seq(("a", "9"), ("b", "2")).toDF("k", "v")
    StreamingHistorization.scd2LifecycleBatch(snapA, s"$dir/store", Seq("k"), m, tsOf(0))
    StreamingHistorization.scd2LifecycleBatch(snapB, s"$dir/store", Seq("k"), m, tsOf(1))
    val once = Store.readParquetSafe(spark, s"$dir/store").get.collect().map(_.toSeq).toSet
    // crash-point replay: the batch re-applies onto the already-updated store
    StreamingHistorization.scd2LifecycleBatch(snapB, s"$dir/store", Seq("k"), m, tsOf(1))
    val twice = Store.readParquetSafe(spark, s"$dir/store").get.collect().map(_.toSeq).toSet
    assert(twice === once, "replay must be byte-identical, not additive")
  }

  test("in-batch duplicate ids collapse to ONE payload-deterministic survivor") {
    // same id, different payloads, shuffled arrival orders and partition
    // counts: the survivor must be identical every time (the replay
    // determinism the maintenance streams' exactly-once rewrite needs) —
    // a bare dropDuplicates keeps whichever row a scheduling race wins
    val rows = Seq((1L, "b", 2.0), (1L, "a", 9.0), (1L, "a", 3.0),
      (2L, "z", 1.0), (3L, "k", 4.0), (3L, "k", 4.0))
    val layouts = Seq(
      rows.toDF("id", "s", "v").repartition(1),
      rows.reverse.toDF("id", "s", "v").repartition(7),
      scala.util.Random.shuffle(rows).toDF("id", "s", "v").repartition(3))
    val got = layouts.map(df =>
      StreamingHistorization.survivorFirst(df, Seq("id"))
        .collect().map(_.toSeq).toSet)
    assert(got.forall(_ === got.head))
    // and the survivor is the payload-order minimum, not an arbitrary row
    assert(got.head === Set(Seq(1L, "a", 3.0), Seq(2L, "z", 1.0), Seq(3L, "k", 4.0)))
  }

  test("paragraphMaintainStream ≡ the per-batch operator chain; re-delivery converges") {
    // the paragraph fixture: 20-token breaks + every-7th-doc case fold,
    // so exact AND near (case-variant) repeats cross the batch boundary
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter($"doc_id" < 240)
      .withColumn("text",
        when($"doc_id" % 7 === 0, upper($"text")).otherwise($"text"))
      .withColumn("text", regexp_replace($"text", "((?:\\S+ ){20})", "$1\n\n"))
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-para-stream").toString
    val evens = docs.filter($"doc_id" % 2 === 0)
    val odds = docs.filter($"doc_id" % 2 === 1)
    evens.write.parquet(s"$dir/in/d0")
    odds.write.parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.paragraphMaintainStream(
      stream, "doc_id", "text", s"$dir/hashes", s"$dir/index", s"$dir/out",
      s"$dir/chk"))
    // the hand-replayed twin: batch 1 vs an empty index, batch 2 (doc-
    // hash-novel rows only) vs batch 1's band index
    import graft.operators.Dedup
    val emptyIdx = spark.range(0).select($"id".as("lh"),
      lit(0).cast("int").as("band"), $"id".as("key"))
    val cleaned1 = Dedup.nearDedupParagraphsIncremental(
      evens, "doc_id", "text", emptyIdx)
    val idx1 = Dedup.novelParagraphBands(evens, "doc_id", "text", emptyIdx)
    val h1 = evens.select(
      graft.functions.HashColumns.hashExpr(Seq($"text")).as("content_hash")).distinct()
    val odds2 = odds
      .withColumn("__ch", graft.functions.HashColumns.hashExpr(Seq($"text")))
      .join(h1.select($"content_hash".as("__k")), $"__ch" <=> $"__k", "left_anti")
      .dropDuplicates("__ch").select("doc_id", "text")
    val cleaned2 = Dedup.nearDedupParagraphsIncremental(odds2, "doc_id", "text", idx1)
    val expected = cleaned1.unionByName(cleaned2)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.exceptAll(expected).count() === 0 &&
      expected.exceptAll(out).count() === 0,
      "streamed output must equal the per-batch operator chain")
    // re-delivery: replaying BOTH batches through a fresh checkpoint
    // appends nothing anywhere (the doc-hash absorber + novelty guards)
    val (nOut, nIdx, nHash) = (out.count(),
      spark.read.parquet(s"$dir/index").count(),
      spark.read.parquet(s"$dir/hashes").count())
    val replay = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.paragraphMaintainStream(
      replay, "doc_id", "text", s"$dir/hashes", s"$dir/index", s"$dir/out",
      s"$dir/chk2"))
    assert(spark.read.parquet(s"$dir/out").count() === nOut)
    assert(spark.read.parquet(s"$dir/index").count() === nIdx)
    assert(spark.read.parquet(s"$dir/hashes").count() === nHash)
  }

  /** Pin the file-source delivery order of parquet drops: every file of
    * drop i gets a strictly earlier modification time than drop i+1's —
    * the source orders by (mtime, path), and back-to-back writes can
    * share a millisecond, leaving the order to a UUID-part-name tiebreak. */
  private def pinDropOrder(dirs: String*): Unit =
    dirs.zipWithIndex.foreach { case (d, i) =>
      new java.io.File(d).listFiles().foreach(_.setLastModified(1700000000000L + i * 60000L))
    }

  test("curateMaintainStream ≡ sequential curateIncremental; re-delivery converges") {
    import graft.operators.Curation
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerB = "a steady rain fell across the old town square as vendors " +
      "opened their stalls and the church bell counted out the early hours again"
    val fillerC = "deep in the valley the farmers walked their fields checking " +
      "rows of young corn while clouds drifted slowly over the distant blue hills"
    val fillerF = "inside the museum hall students sketched marble statues while " +
      "guides described ancient trade routes and sunlight streamed onto polished floors"
    def url(id: Long, ads: Boolean = false) =
      s"https://${if (ads) "ads." else ""}h${id % 5}.example.com/p/$id"
    val ingested = Seq(
      (1L, fillerA, url(1)), (2L, fillerB, url(2))).toDF("doc_id", "text", "url")
    val batch = Seq(
      (10L, fillerA, url(10)),                             // exact standing hit
      (11L, fillerB.replace("again", "anew"), url(11)),    // near standing hit
      (12L, fillerC, url(12)),                             // survivor
      (13L, fillerC.replace("hills", "peaks"), url(13)),   // batch near election
      (14L, fillerA + " unique tail words here", url(1)),  // url standing hit
      (15L, fillerF, url(15, ads = true)),                 // blocklist
      (16L, fillerF, url(16))                              // decontaminated
    ).toDF("doc_id", "text", "url")
    val bench = Seq((100L, fillerF)).toDF("doc_id", "text")
    val rules = Seq(s"ads.h0.example.com").toDF("rule")
    val dir = Files.createTempDirectory("graft-curate-stream").toString
    // ONE file per drop with strictly increasing mtimes: the file source
    // takes maxFilesPerTrigger files per batch in (mtime, path) order, so
    // a multi-part drop would split one logical batch into per-FILE
    // batches in UUID-name tiebreak order — and the 12-vs-13 intra-batch
    // election would nondeterministically become a standing-store
    // election won by whichever file sorted first (a real flake this
    // test shipped with until it fired)
    ingested.coalesce(1).write.parquet(s"$dir/in/d0")
    batch.coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    val stream = spark.readStream.schema(ingested.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    def writer(chk: String) = StreamingHistorization.curateMaintainStream(
      stream, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", chk,
      urlTier = Some(("url", rules, s"$dir/canon")),
      nearDup = Some((3, 8, 4, s"$dir/bands")), shingleN = 3)
    StreamingHistorization.runOnce(writer(s"$dir/chk"))
    // the batch twin: two sequential curateIncremental runs, novelty
    // threaded between them by hand
    val inc0 = Curation.curateIncremental(ingested, bench, "doc_id", "text",
      Curation.emptyState(spark, url = true, near = true), shingleN = 3,
      urlGate = Some((ingested.select($"doc_id", $"url"), "url", rules)),
      nearDup = Some((3, 8, 4)))
    val st1 = Curation.CurationState(inc0.novelDigests,
      inc0.novelCanonical, inc0.novelBands)
    val inc1 = Curation.curateIncremental(batch, bench, "doc_id", "text", st1,
      shingleN = 3, urlGate = Some((batch.select($"doc_id", $"url"), "url", rules)),
      nearDup = Some((3, 8, 4)))
    val expected = inc0.survivors.unionByName(inc1.survivors)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.exceptAll(expected).count() === 0 &&
      expected.exceptAll(out).count() === 0,
      "streamed survivors must equal the sequential incremental runs")
    // the hand fixture's intent: only 12 survives batch 2 (plus batch 1's
    // own survivors), each tier having cut its intended doc
    assert(out.filter($"doc_id" >= 10L).select("doc_id").as[Long].collect().toSeq
      === Seq(12L))
    // re-delivery through a fresh checkpoint appends nothing anywhere
    val counts = Seq("out", "digests", "canon", "bands")
      .map(p => spark.read.parquet(s"$dir/$p").count())
    val replay = spark.readStream.schema(ingested.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.curateMaintainStream(
      replay, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", s"$dir/chk2",
      urlTier = Some(("url", rules, s"$dir/canon")),
      nearDup = Some((3, 8, 4, s"$dir/bands")), shingleN = 3))
    val after = Seq("out", "digests", "canon", "bands")
      .map(p => spark.read.parquet(s"$dir/$p").count())
    assert(after === counts, "a re-delivered stream must ingest nothing")
  }

  test("compacting the curation stores between batches changes nothing but the file count") {
    import graft.operators.Curation
    import graft.sources.Store
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerB = "a steady rain fell across the old town square as vendors " +
      "opened their stalls and the church bell counted out the early hours again"
    val fillerC = "deep in the valley the farmers walked their fields checking " +
      "rows of young corn while clouds drifted slowly over the distant blue hills"
    val d0 = Seq((1L, fillerA, "https://h1.example.com/p/1"),
      (2L, fillerB, "https://h2.example.com/p/2")).toDF("doc_id", "text", "url")
    val d1 = Seq((10L, fillerA, "https://h0.example.com/p/10"),  // exact standing hit
      (11L, fillerC, "https://h1.example.com/p/11"),             // survivor
      (12L, fillerB, "https://h2.example.com/p/2")               // url standing hit
    ).toDF("doc_id", "text", "url")
    val bench = Seq((100L, "inside the museum hall students sketched")).toDF("doc_id", "text")
    val rules = Seq("ads.h0.example.com").toDF("rule")
    def run(dir: String, compactBetween: Boolean): Unit = {
      d0.coalesce(1).write.parquet(s"$dir/in/d0")
      val s0 = spark.readStream.schema(d0.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      def writer(src: org.apache.spark.sql.DataFrame, chk: String) =
        StreamingHistorization.curateMaintainStream(
          src, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", chk,
          urlTier = Some(("url", rules, s"$dir/canon")),
          nearDup = Some((3, 8, 4, s"$dir/bands")), shingleN = 3)
      StreamingHistorization.runOnce(writer(s0, s"$dir/chk"))
      // the maintenance window: stream stopped, stores compact in place
      // (the swap write — readers see old or new, never half-compacted)
      if (compactBetween)
        Seq("digests", "canon", "bands", "out").foreach { p =>
          Store.compactStore(spark, s"$dir/$p")
        }
      d1.coalesce(1).write.parquet(s"$dir/in/d1")
      val s1 = spark.readStream.schema(d0.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      StreamingHistorization.runOnce(writer(s1, s"$dir/chk"))
    }
    val plain = Files.createTempDirectory("graft-curate-nocompact").toString
    val compacted = Files.createTempDirectory("graft-curate-compact").toString
    run(plain, compactBetween = false)
    run(compacted, compactBetween = true)
    Seq("out", "digests", "canon", "bands").foreach { p =>
      val a = spark.read.parquet(s"$plain/$p")
      val b = spark.read.parquet(s"$compacted/$p")
      assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0,
        s"$p must be content-identical across the compaction")
    }
  }

  test("a partially committed bands append converges on re-delivery (row-keyed guard)") {
    import graft.operators.Curation
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerB = "a steady rain fell across the old town square as vendors " +
      "opened their stalls and the church bell counted out the early hours again"
    val docs = Seq(
      (1L, fillerA, "https://h1.example.com/p/1"),
      (2L, fillerB, "https://h2.example.com/p/2")).toDF("doc_id", "text", "url")
    val bench = Seq((100L, "inside the museum hall students sketched"))
      .toDF("doc_id", "text")
    val rules = Seq("ads.h0.example.com").toDF("rule")
    val inc0 = Curation.curateIncremental(docs, bench, "doc_id", "text",
      Curation.emptyState(spark, url = true, near = true), shingleN = 3,
      urlGate = Some((docs.select($"doc_id", $"url"), "url", rules)),
      nearDup = Some((3, 8, 4)))
    val allBands = inc0.novelBands.get.persist()
    val dir = Files.createTempDirectory("graft-curate-partial").toString
    // simulate the crash window: out fully appended, only TWO of the
    // first doc's band rows visible, digests/canon not yet written
    val firstDoc = allBands.agg(min($"id")).head.getLong(0)
    inc0.survivors.write.parquet(s"$dir/out")
    allBands.filter($"id" === firstDoc).limit(2).write.parquet(s"$dir/bands")
    docs.coalesce(1).write.parquet(s"$dir/in/d0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.curateMaintainStream(
      stream, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", s"$dir/chk",
      urlTier = Some(("url", rules, s"$dir/canon")),
      nearDup = Some((3, 8, 4, s"$dir/bands")), shingleN = 3))
    // the gap fills exactly: full band set, no duplicates (an id-keyed
    // guard would have dropped the first doc's missing rows forever)
    val bands = spark.read.parquet(s"$dir/bands")
    assert(bands.exceptAll(allBands).count() === 0 &&
      allBands.exceptAll(bands).count() === 0,
      "re-delivery must append exactly the missing band rows")
    // every other store converged too
    assert(spark.read.parquet(s"$dir/out").exceptAll(inc0.survivors).count() === 0 &&
      inc0.survivors.exceptAll(spark.read.parquet(s"$dir/out")).count() === 0)
    assert(spark.read.parquet(s"$dir/digests").exceptAll(inc0.novelDigests).count() === 0 &&
      inc0.novelDigests.exceptAll(spark.read.parquet(s"$dir/digests")).count() === 0)
    allBands.unpersist(blocking = false)
    ()
  }

  test("curateMaintainStream nearCc: snapshot commit ≡ sequential runs; re-delivery no-op") {
    import graft.operators.Curation
    import graft.sources.Store
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerC = "deep in the valley the farmers walked their fields checking " +
      "rows of young corn while clouds drifted slowly over the distant blue hills"
    // the CurationSpec chain fixture: B pairs with standing A (hamming 5),
    // C pairs only with B (7) — C's cut is TRANSITIVE, the semantics the
    // snapshot-committed labels store exists to carry
    val chainA = ("river stones gathered along the quiet valley floor " +
      "where morning light touched tall grass and distant farms woke slowly " +
      "under pale clouds").split(" ")
    val chainB = chainA.updated(4, "narrow").mkString(" ")
    val chainC = chainA.updated(4, "narrow").updated(14, "narrow")
      .reverse.mkString(" ")
    val ingested = Seq((1L, fillerA, "https://h1.example.com/p/1"),
      (2L, chainA.mkString(" "), "https://h2.example.com/p/2"))
      .toDF("doc_id", "text", "url")
    val batch = Seq(
      (10L, fillerA, "https://h1.example.com/p/10"),  // exact standing hit
      (20L, chainB, "https://h2.example.com/p/20"),   // cc: direct pair with standing 2
      (21L, chainC, "https://h2.example.com/p/21"),   // cc: TRANSITIVE cut via 20
      (22L, fillerC, "https://h3.example.com/p/22"),  // survivor
      (23L, fillerC, "https://ads.h0.example.com/p")  // blocklist
    ).toDF("doc_id", "text", "url")
    val bench = Seq((100L, "inside the museum hall students sketched"))
      .toDF("doc_id", "text")
    val rules = Seq("ads.h0.example.com").toDF("rule")
    val dir = Files.createTempDirectory("graft-curate-cc-stream").toString
    ingested.coalesce(1).write.parquet(s"$dir/in/d0")
    batch.coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    def writer(src: org.apache.spark.sql.DataFrame, chk: String) =
      StreamingHistorization.curateMaintainStream(
        src, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", chk,
        urlTier = Some(("url", rules, s"$dir/canon")), shingleN = 3,
        nearCc = Some((64, 8, s"$dir/manifest", s"$dir/fps", s"$dir/labels")))
    val s0 = spark.readStream.schema(ingested.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(s0, s"$dir/chk"))
    // the batch twin: two sequential curateIncremental runs
    val inc0 = Curation.curateIncremental(ingested, bench, "doc_id", "text",
      Curation.emptyState(spark, url = true, nearCc = true), shingleN = 3,
      urlGate = Some((ingested.select($"doc_id", $"url"), "url", rules)),
      nearCc = Some((64, 8)))
    val st1 = Curation.CurationState(inc0.novelDigests, inc0.novelCanonical,
      None, inc0.novelFps, inc0.ccLabels)
    val inc1 = Curation.curateIncremental(batch, bench, "doc_id", "text", st1,
      shingleN = 3, urlGate = Some((batch.select($"doc_id", $"url"), "url", rules)),
      nearCc = Some((64, 8)))
    val expected = inc0.survivors.unionByName(inc1.survivors)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.exceptAll(expected).count() === 0 &&
      expected.exceptAll(out).count() === 0,
      "streamed survivors must equal the sequential incremental runs")
    assert(out.filter($"doc_id" >= 10L).select("doc_id").as[Long].collect().toSet
      === Set(22L), "exact/direct/transitive/blocklist docs all cut; 22 survives")
    // the committed snapshot state equals the sequential final state
    val snap = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps",
        "canonical" -> s"$dir/canon"),
      Map("labels" -> s"$dir/labels")).get._2
    assert(snap("labels").as[(Long, Long)].collect().sorted ===
      inc1.ccLabels.get.as[(Long, Long)].collect().sorted,
      "the snapshot labels must be the sequential run final labeling")
    val expDigests = inc0.novelDigests.unionByName(inc1.novelDigests)
    assert(snap("digests").exceptAll(expDigests).count() === 0 &&
      expDigests.exceptAll(snap("digests")).count() === 0)
    // re-delivery through a fresh checkpoint changes no store CONTENT
    // (empty delta generations and a fresh manifest pin are the only
    // artifacts — content is what the law speaks about)
    def stateContent(): Seq[Long] = {
      val m = Store.readSnapshotDeltas(spark, s"$dir/manifest",
        Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps",
          "canonical" -> s"$dir/canon"), Map("labels" -> s"$dir/labels")).get._2
      Seq(m("digests").count(), m("fps").count(), m("canonical").count(),
        m("labels").count(), spark.read.parquet(s"$dir/out").count())
    }
    val before = stateContent()
    val s1 = spark.readStream.schema(ingested.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(s1, s"$dir/chk2"))
    assert(stateContent() === before,
      "a fully re-delivered stream must change no snapshot content")
  }

  test("curateMaintainStream nearCc: a mid-commit crash leaves the prior snapshot intact") {
    import graft.operators.Curation
    import graft.sources.Store
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerB = "a steady rain fell across the old town square as vendors " +
      "opened their stalls and the church bell counted out the early hours again"
    val fillerC = "deep in the valley the farmers walked their fields checking " +
      "rows of young corn while clouds drifted slowly over the distant blue hills"
    val d0 = Seq((1L, fillerA), (2L, fillerB)).toDF("doc_id", "text")
    val d1 = Seq((10L, fillerA), (11L, fillerC)).toDF("doc_id", "text")
    val bench = Seq((100L, "inside the museum hall students sketched"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-curate-cc-crash").toString
    def writer(src: org.apache.spark.sql.DataFrame, chk: String) =
      StreamingHistorization.curateMaintainStream(
        src, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", chk,
        shingleN = 3,
        nearCc = Some((64, 8, s"$dir/manifest", s"$dir/fps", s"$dir/labels")))
    // batch 1 commits normally
    d0.coalesce(1).write.parquet(s"$dir/in/d0")
    val s0 = spark.readStream.schema(d0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(s0, s"$dir/chk"))
    val manifestGen0 = Store.listGenerations(spark, s"$dir/manifest").last
    // the sequential twin of batch 2, to forge the crash window from
    val st1 = {
      val m = Store.readSnapshotDeltas(spark, s"$dir/manifest",
        Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps"),
        Map("labels" -> s"$dir/labels")).get._2
      Curation.CurationState(m("digests"), None, None,
        Some(m("fps")), Some(m("labels")))
    }
    val inc1 = Curation.curateIncremental(d1, bench, "doc_id", "text", st1,
      shingleN = 3, nearCc = Some((64, 8)))
    // CRASH WINDOW: batch 2 appended out and committed the digests and
    // fps DELTAS, then died before labels and the manifest
    inc1.survivors.write.mode("append").parquet(s"$dir/out")
    Store.writeStoreGeneration(inc1.novelDigests, s"$dir/digests", keep = Int.MaxValue)
    Store.writeStoreGeneration(inc1.novelFps.get, s"$dir/fps", keep = Int.MaxValue)
    // the prior snapshot is INTACT: the manifest still pins batch 1 only
    assert(Store.listGenerations(spark, s"$dir/manifest").last === manifestGen0,
      "no manifest advanced during the crash window")
    val prior = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps"),
      Map("labels" -> s"$dir/labels")).get._2
    assert(prior("digests").count() === 2 && prior("labels").count() === 0,
      "snapshot readers see batch 1 state only — orphan deltas are above the pin")
    // recovery: deliver both drops through a fresh checkpoint; batch 1
    // absorbs, batch 2 recomputes against the prior snapshot and commits
    d1.coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    val s1 = spark.readStream.schema(d0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(s1, s"$dir/chk2"))
    val recovered = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps"),
      Map("labels" -> s"$dir/labels")).get._2
    // content convergence as SETS: the orphan deltas duplicate rows below
    // the new pin, which every probe absorbs — the documented artifact
    val expDigests = st1.knownDigests.unionByName(inc1.novelDigests)
    assert(recovered("digests").distinct.exceptAll(expDigests.distinct).count() === 0 &&
      expDigests.distinct.exceptAll(recovered("digests").distinct).count() === 0)
    assert(recovered("labels").as[(Long, Long)].collect().sorted ===
      inc1.ccLabels.get.as[(Long, Long)].collect().sorted)
    // out converged without duplicate survivor rows
    val out = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSeq
    assert(out.sorted === out.distinct.sorted, "the id guard absorbed the replayed out rows")
  }

  private def digestOf(t: String): String = Seq(Tuple1(t)).toDF("text")
    .select(graft.functions.HashColumns.hashExpr(Seq($"text")).as("h"))
    .as[String].head()

  test("curateTakedownSnapshot: delta-layout takedown rebases atomically; the loop resumes on it") {
    import graft.operators.Curation
    import graft.sources.Store
    val fillerA = "the quick brown fox jumps over the lazy dog near the quiet " +
      "river bank while morning light settles on the tall grass and the birds call"
    val fillerB = "a steady rain fell across the old town square as vendors " +
      "opened their stalls and the church bell counted out the early hours again"
    val fillerC = "deep in the valley the farmers walked their fields checking " +
      "rows of young corn while clouds drifted slowly over the distant blue hills"
    val bench = Seq((100L, "inside the museum hall students sketched"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-curate-cc-takedown").toString
    def writer(src: org.apache.spark.sql.DataFrame) =
      StreamingHistorization.curateMaintainStream(
        src, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", s"$dir/chk",
        shingleN = 3,
        nearCc = Some((64, 8, s"$dir/manifest", s"$dir/fps", s"$dir/labels")))
    def stream() = spark.readStream
      .schema(Seq((1L, "")).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    Seq((1L, fillerA), (2L, fillerB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/in/d0")
    Seq((10L, fillerC)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    StreamingHistorization.runOnce(writer(stream()))
    // the takedown, straight over the delta layout — no compaction first
    val removed = Seq((2L, fillerB)).toDF("doc_id", "text")
    assert(Curation.curateTakedownSnapshot(spark, s"$dir/manifest",
      s"$dir/digests", s"$dir/fps", s"$dir/labels",
      removed, "doc_id", "text").nonEmpty)
    val dp = Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps")
    def snap() = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2
    val purged = snap()
    assert(purged("digests").select("content_hash").as[String].collect().toSet
      === Set(digestOf(fillerA), digestOf(fillerC)),
      "the removed content class left the pinned digest union")
    assert(purged("fps").filter($"id" === 2L).count() === 0 &&
      purged("labels").filter($"id" === 2L).count() === 0)
    // the takedown commit is a REBASE: the delta stores pin their own
    // full generation as base, labels stays a plain full store
    val pins = Store.readManifestPins(spark, s"$dir/manifest").get._2
    assert(pins("digests")._2 === pins("digests")._1 &&
      pins("fps")._2 === pins("fps")._1)
    // the loop RESUMES on the rebased snapshot: a re-submission of the
    // removed content survives (its class re-opened), and the next
    // commit carries the base forward instead of resurrecting the
    // pre-takedown deltas
    Seq((20L, fillerB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/in/d2")
    new java.io.File(s"$dir/in/d2").listFiles()
      .foreach(_.setLastModified(1700000000000L + 2 * 60000L))
    StreamingHistorization.runOnce(writer(stream()))
    assert(spark.read.parquet(s"$dir/out").filter($"doc_id" === 20L).count() === 1,
      "the erased class re-opened for re-submission")
    val after = snap()
    assert(after("digests").select("content_hash").as[String].collect().toSet
      === Set(digestOf(fillerA), digestOf(fillerC), digestOf(fillerB)))
    assert(after("digests").count() === 3,
      "the carried base keeps the pre-takedown delta rows out of the union")
    val pins2 = Store.readManifestPins(spark, s"$dir/manifest").get._2
    assert(pins2("digests")._2 === pins("digests")._2,
      "the loop carried the rebase base forward")
    // takedown over a never-committed manifest: nothing standing, None
    assert(Curation.curateTakedownSnapshot(spark, s"$dir/none",
      s"$dir/digests", s"$dir/fps", s"$dir/labels",
      removed, "doc_id", "text") === None)
  }

  test("curateTakedownSnapshot crash window: orphan full generations leave the prior snapshot intact") {
    import graft.operators.Curation
    import graft.sources.Store
    // the near-dup chain pair (hamming 5): both docs label into ONE
    // cluster, so the takedown exercises the labeling REPAIR, not just
    // row filtering
    val chainA = ("river stones gathered along the quiet valley floor " +
      "where morning light touched tall grass and distant farms woke slowly " +
      "under pale clouds").split(" ")
    val fillerA = chainA.mkString(" ")
    val fillerB = chainA.updated(4, "narrow").mkString(" ")
    val bench = Seq((100L, "inside the museum hall students sketched"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-curate-cc-td-crash").toString
    Seq((1L, fillerA), (2L, fillerB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/in/d0")
    val src = spark.readStream
      .schema(Seq((1L, "")).toDF("doc_id", "text").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(StreamingHistorization.curateMaintainStream(
      src, bench, "doc_id", "text", s"$dir/digests", s"$dir/out", s"$dir/chk",
      shingleN = 3,
      nearCc = Some((64, 8, s"$dir/manifest", s"$dir/fps", s"$dir/labels"))))
    val manifestGen0 = Store.listGenerations(spark, s"$dir/manifest").last
    val dp = Map("digests" -> s"$dir/digests", "fps" -> s"$dir/fps")
    def digests(): Set[String] = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2("digests")
      .select("content_hash").as[String].collect().toSet
    val before = digests()
    assert(before === Set(digestOf(fillerA), digestOf(fillerB)))
    // CRASH WINDOW: a takedown died after writing its full purged
    // generations but before the manifest — stores-first, manifest-last
    Store.writeStoreGeneration(Seq(digestOf(fillerA)).toDF("content_hash"),
      s"$dir/digests", keep = Int.MaxValue)
    val fpsNow = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2("fps")
    Store.writeStoreGeneration(fpsNow.filter($"id" =!= 2L),
      s"$dir/fps", keep = Int.MaxValue)
    assert(Store.listGenerations(spark, s"$dir/manifest").last === manifestGen0 &&
      digests() === before,
      "orphan generations sit above the prior pins — readers see the intact state")
    // the re-run converges; running it twice is a no-op on content
    val removed = Seq((2L, fillerB)).toDF("doc_id", "text")
    Curation.curateTakedownSnapshot(spark, s"$dir/manifest",
      s"$dir/digests", s"$dir/fps", s"$dir/labels", removed, "doc_id", "text")
    assert(digests() === Set(digestOf(fillerA)))
    Curation.curateTakedownSnapshot(spark, s"$dir/manifest",
      s"$dir/digests", s"$dir/fps", s"$dir/labels", removed, "doc_id", "text")
    assert(digests() === Set(digestOf(fillerA)), "takedown re-runs converge")
    val labels = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2("labels")
    assert(labels.count() === 0,
      "the repair dissolved the pair's cluster: the survivor is a singleton " +
        "again (labels only ever hold paired docs)")
    val fps = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2("fps")
    assert(fps.select("id").as[Long].distinct.collect().toSet === Set(1L),
      "the survivor's fingerprints stand; the removed doc's are gone")
  }

  // ---- the site-content tier in the curation loop ----

  private val siteFillerA = "the quick brown fox jumps over the lazy dog near " +
    "the quiet river bank while morning light settles on the tall grass and the birds call"
  private val siteFillerB = "a steady rain fell across the old town square as " +
    "vendors opened their stalls and the church bell counted out the early hours again"
  private val siteFillerC = "deep in the valley the farmers walked their fields " +
    "checking rows of young corn while clouds drifted slowly over the distant blue hills"
  private val siteFooter = "this website uses cookies to improve your browsing " +
    "experience and by continuing to read our pages you accept the posted terms"
  // the bench shares the loop's textCol name — "html" here (the tier
  // replaces that column's content with the extracted main text, so the
  // decontamination compares extracted text against bench text)
  private val siteBench =
    Seq((100L, "inside the museum hall students sketched")).toDF("doc_id", "html")

  test("curateMaintainStream siteTier ≡ extraction + curation composed per batch; re-delivery converges") {
    import graft.operators.{Curation, WebContent}
    import graft.sources.Store
    // batch 0: two pages of host 1 share the footer — the census cuts it
    // INTRA-batch, both mains are the fillers alone
    val d0 = Seq(
      (1L, s"<p>$siteFillerA</p><div>$siteFooter</div>", "https://h1.example.com/p/1"),
      (2L, s"<p>$siteFillerB</p><div>$siteFooter</div>", "https://h1.example.com/p/2")
    ).toDF("doc_id", "html", "url")
    // batch 1: 10 extracts to a STANDING content class (exact cut);
    // 11 carries host 1's footer — cut by the STANDING census; 12 keeps
    // the footer on its unseen host, so its main is filler + footer
    val d1 = Seq(
      (10L, s"<p>$siteFillerA</p>", "https://h2.example.com/p/10"),
      (11L, s"<div>$siteFooter</div><p>$siteFillerC</p>", "https://h1.example.com/p/11"),
      (12L, s"<p>$siteFillerC</p><div>$siteFooter</div>", "https://h3.example.com/p/12")
    ).toDF("doc_id", "html", "url")
    val dir = Files.createTempDirectory("graft-curate-site").toString
    d0.coalesce(1).write.parquet(s"$dir/in/d0")
    d1.coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    def writer(src: org.apache.spark.sql.DataFrame, chk: String) =
      StreamingHistorization.curateMaintainStream(
        src, siteBench, "doc_id", "html", s"$dir/digests", s"$dir/out", chk,
        shingleN = 3,
        siteTier = Some(("url", s"$dir/census", 40, 0.2, 2)))
    def stream() = spark.readStream.schema(d0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(stream(), s"$dir/chk"))
    // the sequential twin: per-batch extraction against the accumulating
    // census, curation over the extracted text
    val emptyCensus = spark.range(0).select(lit(null).cast("string").as("host"),
      lit(null).cast("string").as("bh"), lit(null).cast("string").as("page"))
    val site0 = WebContent.mainContentByHostIncremental(
      d0, "doc_id", "url", "html", emptyCensus, 40, 0.2, 2)
    val b0 = d0.drop("html")
      .join(site0.main.withColumnRenamed("main_text", "html"), Seq("doc_id"))
    val inc0 = Curation.curateIncremental(b0, siteBench, "doc_id", "html",
      Curation.emptyState(spark), shingleN = 3)
    val site1 = WebContent.mainContentByHostIncremental(
      d1, "doc_id", "url", "html", site0.novelCensus, 40, 0.2, 2)
    val b1 = d1.drop("html")
      .join(site1.main.withColumnRenamed("main_text", "html"), Seq("doc_id"))
    val inc1 = Curation.curateIncremental(b1, siteBench, "doc_id", "html",
      Curation.CurationState(inc0.novelDigests), shingleN = 3)
    val expected = inc0.survivors.unionByName(inc1.survivors)
    val out = spark.read.parquet(s"$dir/out")
    assert(out.exceptAll(expected).count() === 0 &&
      expected.exceptAll(out).count() === 0,
      "streamed survivors must equal the per-batch composition")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 11L, 12L),
      "10 cut exact vs standing main; 11's footer cut by the standing census")
    // the digest store speaks CONTENT: 12's class is filler + kept footer
    val digests = spark.read.parquet(s"$dir/digests")
      .select("content_hash").as[String].collect().toSet
    assert(digests === Set(digestOf(siteFillerA), digestOf(siteFillerB),
      digestOf(siteFillerC), digestOf(siteFillerC + "\n" + siteFooter)))
    // the census store accumulated exactly the corpus census rows
    val census = spark.read.parquet(s"$dir/census")
    val expCensus = WebContent.siteCensusRows(
      d0.unionByName(d1), "doc_id", "url", "html")
    assert(census.exceptAll(expCensus).count() === 0 &&
      expCensus.exceptAll(census).count() === 0)
    // full re-delivery through a fresh checkpoint changes nothing
    val before = Seq(spark.read.parquet(s"$dir/out").count(),
      spark.read.parquet(s"$dir/digests").count(), census.count())
    StreamingHistorization.runOnce(writer(stream(), s"$dir/chk2"))
    val after = Seq(spark.read.parquet(s"$dir/out").count(),
      spark.read.parquet(s"$dir/digests").count(),
      spark.read.parquet(s"$dir/census").count())
    assert(after === before, "re-delivered batches must append nothing anywhere")
  }

  test("curateMaintainStream siteTier + nearCc: census rides the snapshot; takedown re-opens it") {
    import graft.operators.Curation
    import graft.sources.Store
    val d0 = Seq(
      (1L, s"<p>$siteFillerA</p><div>$siteFooter</div>", "https://h1.example.com/p/1"),
      (2L, s"<p>$siteFillerB</p><div>$siteFooter</div>", "https://h1.example.com/p/2")
    ).toDF("doc_id", "html", "url")
    val d1 = Seq(
      (10L, s"<p>$siteFillerA</p>", "https://h2.example.com/p/10"),
      (11L, s"<p>$siteFillerC</p>", "https://h4.example.com/p/11")
    ).toDF("doc_id", "html", "url")
    val dir = Files.createTempDirectory("graft-curate-site-cc").toString
    d0.coalesce(1).write.parquet(s"$dir/in/d0")
    d1.coalesce(1).write.parquet(s"$dir/in/d1")
    pinDropOrder(s"$dir/in/d0", s"$dir/in/d1")
    def writer(src: org.apache.spark.sql.DataFrame) =
      StreamingHistorization.curateMaintainStream(
        src, siteBench, "doc_id", "html", s"$dir/digests", s"$dir/out", s"$dir/chk",
        shingleN = 3,
        nearCc = Some((64, 8, s"$dir/manifest", s"$dir/fps", s"$dir/labels")),
        siteTier = Some(("url", s"$dir/census", 40, 0.2, 2)))
    def stream() = spark.readStream.schema(d0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(writer(stream()))
    assert(spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
      === Set(1L, 2L, 11L), "10's extracted main is a standing class")
    val dp = Map("digests" -> s"$dir/digests", "census" -> s"$dir/census")
    def pinned(name: String) = Store.readSnapshotDeltas(spark, s"$dir/manifest",
      dp, Map("labels" -> s"$dir/labels")).get._2(name)
    assert(pinned("digests").select("content_hash").as[String].collect().toSet
      === Set(digestOf(siteFillerA), digestOf(siteFillerB), digestOf(siteFillerC)))
    assert(pinned("census").select("page").distinct.as[String].collect().toSet
      === Set("1", "2", "10", "11"),
      "every batch page's census rows commit through the snapshot")
    // TAKEDOWN of host 1's two pages — removed carries the EXTRACTED
    // mains (what the deployment exported), and the census purge rides
    // the same atomic commit
    val removed = Seq((1L, siteFillerA), (2L, siteFillerB)).toDF("doc_id", "main")
    assert(Curation.curateTakedownSnapshot(spark, s"$dir/manifest",
      s"$dir/digests", s"$dir/fps", s"$dir/labels", removed, "doc_id", "main",
      censusPath = Some(s"$dir/census")).nonEmpty)
    assert(pinned("census").select("page").distinct.as[String].collect().toSet
      === Set("10", "11"), "the erased pages left the census")
    assert(pinned("digests").select("content_hash").as[String].collect().toSet
      === Set(digestOf(siteFillerC)))
    // the law RE-OPENS through the resumed loop: host 1's footer is no
    // longer a template (30 keeps it in its main — its digest proves the
    // extraction), and the erased content class accepts a re-submission
    Seq(
      (30L, s"<div>$siteFooter</div><p>$siteFillerC</p>", "https://h1.example.com/p/30"),
      (31L, s"<p>$siteFillerA</p>", "https://h5.example.com/p/31")
    ).toDF("doc_id", "html", "url").coalesce(1).write.parquet(s"$dir/in/d2")
    new java.io.File(s"$dir/in/d2").listFiles()
      .foreach(_.setLastModified(1700000000000L + 2 * 60000L))
    StreamingHistorization.runOnce(writer(stream()))
    val outAfter = spark.read.parquet(s"$dir/out").select("doc_id").as[Long]
      .collect().toSet
    assert(outAfter.contains(30L) && outAfter.contains(31L))
    val digAfter = pinned("digests").select("content_hash").as[String].collect().toSet
    assert(digAfter.contains(digestOf(siteFooter + "\n" + siteFillerC)),
      "30's main KEEPS the re-opened footer — the census forgot the erased pages")
    assert(digAfter.contains(digestOf(siteFillerA)),
      "the erased content class re-opened for re-submission")
    assert(!digAfter.contains(digestOf(siteFillerB)),
      "the carried base keeps pre-takedown digest deltas out of the union")
  }
}
