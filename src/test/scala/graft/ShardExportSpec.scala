package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis}
import graft.sources.{ShardExport, Store}

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def packLevel(shards: Int = 4) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    Packing.packSequences(docs, "doc_id", "text", budget = 512L, shards = shards)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens_total"))
  }

  test("fixed-count layout: every file full except each shard's last; round-trip reads back") {
    val dir = java.nio.file.Files.createTempDirectory("shardex").toString
    val seqs = packLevel()
    val gen = ShardExport.exportTrainingShards(seqs, dir, seqPerFile = 8)
    assert(gen === 1L)
    val manifest = ShardExport.shardManifest(spark, dir)
    // fixed count: only the max file_idx of a shard may hold < 8
    val short = manifest.as("m").join(
        manifest.groupBy("shard").agg(max("file_idx").as("last")), Seq("shard"))
      .filter($"n_seqs" =!= 8L && $"file_idx" =!= $"last")
    assert(short.count() === 0, "a non-final shard file is not full")
    assert(manifest.agg(sum("n_seqs")).as[Long].head() === seqs.count(),
      "manifest sequence total conserves")
    // round-trip: reading every shard file back yields exactly the input
    val back = ShardExport.readAllShards(spark, dir)
      .select($"shard".cast("long"), $"pack_id", $"n_docs", $"tokens_total")
    val in = seqs.select($"shard", $"pack_id", $"n_docs", $"tokens_total")
    assert(back.exceptAll(in).count() === 0 && in.exceptAll(back).count() === 0)
    // deterministic addressing: a worker reads one file by name alone and
    // gets exactly the manifest's row count for it
    val first = manifest.orderBy("shard", "file_idx")
      .select($"shard".cast("long"), $"file_idx", $"n_seqs")
      .as[(Long, Long, Long)].head()
    assert(ShardExport.readShard(spark, dir, first._1, first._2).count() === first._3)
    // the committer's output is untouched post-commit: every data file
    // under the generation keeps its part- name (no driver rename), and
    // every manifest `file` address resolves to one of those files
    val genDir = new java.io.File(Store.generationPath(dir, gen))
    val dataFiles = genDir.listFiles.filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles).filter(_.getName.startsWith("file_idx="))
      .flatMap(_.listFiles).filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles.nonEmpty && dataFiles.forall(_.getName.startsWith("part-")),
      "a data file lost its committer-assigned part- name")
    val addressed = manifest.select("file").as[String].collect()
    assert(addressed.length === dataFiles.length)
    addressed.foreach { f =>
      assert(new java.io.File(genDir, f).isFile, s"manifest file $f missing on disk")
      assert(f.split("/").last.startsWith("part-"))
    }
  }

  test("assignment is a pure function: repartition-stable, window-law shaped") {
    val seqs = packLevel()
    val a = ShardExport.shardAssignment(seqs, 8)
      .select("shard", "pack_id", "file_idx").collect().map(_.toString).sorted.toSeq
    val b = ShardExport.shardAssignment(seqs.repartition(13), 8)
      .select("shard", "pack_id", "file_idx").collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("re-export commits the next generation; a crashed build's debris is invisible") {
    val dir = java.nio.file.Files.createTempDirectory("shardex2").toString
    val seqs = packLevel()
    assert(ShardExport.exportTrainingShards(seqs, dir, seqPerFile = 8, keep = 2) === 1L)
    // simulate a writer that died mid-build: an uncommitted underscore
    // sibling must neither resolve as a generation nor break the next one
    val debris = new java.io.File(s"$dir/_gen_build_deadbeef")
    debris.mkdirs()
    java.nio.file.Files.writeString(debris.toPath.resolve("junk"), "partial")
    assert(ShardExport.exportTrainingShards(seqs.limit(3), dir, seqPerFile = 2, keep = 2) === 2L)
    assert(Store.listGenerations(spark, dir) === Seq(1L, 2L))
    assert(ShardExport.shardManifest(spark, dir).agg(sum("n_seqs")).as[Long].head() === 3L,
      "the latest generation answers the reads")
    // the previous generation stays readable for pinned readers (keep = 2)
    assert(spark.read.parquet(s"${Store.generationPath(dir, 1L)}/_shards_manifest")
      .count() > 0)
  }

  test("exportShardsStream: delta generations, key absorber, re-delivery commits nothing") {
    import graft.streaming.StreamingHistorization
    val dir = java.nio.file.Files.createTempDirectory("shardstream").toString
    val b0 = (0L until 20L).map(i => (i % 4, i, i + 100L))
      .toDF("shard", "pack_id", "tokens_total")
    // batch 1 re-delivers half of batch 0's keys (with DIFFERENT payloads,
    // which must not matter — the absorber keys on (shard, pack_id)) and
    // brings 8 new keys
    val b1 = (10L until 28L).map(i => (i % 4, i, i + 900L))
      .toDF("shard", "pack_id", "tokens_total")
    b0.coalesce(1).write.parquet(s"$dir/in/d0")
    b1.coalesce(1).write.parquet(s"$dir/in/d1")
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(
      ShardExport.exportShardsStream(stream, s"$dir/shards", seqPerFile = 4,
        s"$dir/chk"))
    assert(Store.listGenerations(spark, s"$dir/shards") === Seq(1L, 2L))
    // gen 1 = batch 0 exactly; gen 2 = batch 1's NOVEL keys with batch 1's
    // payloads (the re-delivered half absorbed, its new payloads ignored)
    def gen(g: Long) = spark.read.parquet(Store.generationPath(s"$dir/shards", g))
      .select($"shard".cast("long"), $"pack_id", $"tokens_total")
    assert(gen(1L).exceptAll(b0).count() === 0 && b0.exceptAll(gen(1L)).count() === 0)
    val novel1 = b1.filter($"pack_id" >= 20L)
    assert(gen(2L).exceptAll(novel1).count() === 0 &&
      novel1.exceptAll(gen(2L)).count() === 0)
    // stream ≡ batch layout: gen 2's manifest equals a hand export of the
    // same novel rows
    val handDir = java.nio.file.Files.createTempDirectory("shardhand").toString
    ShardExport.exportTrainingShards(novel1, handDir, seqPerFile = 4)
    val streamed = ShardExport.shardManifest(spark, s"$dir/shards")
      .select("shard", "file_idx", "n_seqs")
    val hand = ShardExport.shardManifest(spark, handDir)
      .select("shard", "file_idx", "n_seqs")
    assert(streamed.exceptAll(hand).count() === 0 && hand.exceptAll(streamed).count() === 0)
    // full re-delivery through a fresh checkpoint commits NO generation
    val replay = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
    StreamingHistorization.runOnce(
      ShardExport.exportShardsStream(replay, s"$dir/shards", seqPerFile = 4,
        s"$dir/chk2"))
    assert(Store.listGenerations(spark, s"$dir/shards") === Seq(1L, 2L),
      "a re-delivered stream must not inflate the generation log")
  }

  test("the composed path: learned tokenizer -> packed sequences -> shard files") {
    // the lifecycle the packing family exists for, end to end: train a
    // merges table, size packs by its counts, export the shards
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = TextAnalysis.validateBpeMerges(
      TextAnalysis.bpeTrainMerges(docs, "text", rounds = 4))
    val packed = Packing.packByCount(docs, "doc_id",
      TextAnalysis.bpeCount(col("text"), merges).cast("long"),
      budget = 2048L, shards = 4)
    val seqs = packed.groupBy("shard", "pack_id").agg(sum("n_tokens").as("tokens_total"))
    val dir = java.nio.file.Files.createTempDirectory("shardex3").toString
    ShardExport.exportTrainingShards(seqs, dir, seqPerFile = 4)
    assert(ShardExport.shardManifest(spark, dir).agg(sum("n_seqs")).as[Long].head()
      === seqs.count())
  }

  test("boundary metadata round-trips through the export; offsets obey the token-sum law") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val packed = Packing.packSequences(docs, "doc_id", "text", budget = 512L, shards = 4)
    val bounds = ShardExport.sequenceBoundaries(packed)
    val dir = java.nio.file.Files.createTempDirectory("shardex_bounds").toString
    ShardExport.exportTrainingShards(bounds, dir, seqPerFile = 8)
    val back = ShardExport.readAllShards(spark, dir)
      .select($"shard".cast("long"), $"pack_id", $"n_docs", $"n_tokens",
        $"doc_ids", $"doc_offsets")
      .as[(Long, Long, Long, Long, Seq[Long], Seq[Long])].collect()
    val packRows = packed
      .as[(Long, Long, Long, Long, Long)].collect() // doc_id, shard, n_tokens, pack_id, pack_pos
      .groupBy(r => (r._2, r._4))
    assert(back.length === packRows.size, "one exported row per pack")
    back.foreach { case (shard, packId, nDocs, nTokens, ids, offs) =>
      val members = packRows((shard, packId)).sortBy(_._5)
      // doc_ids reconstruct the pack membership in pack_pos order — the
      // trainer needs NO join back to the assignment table
      assert(ids === members.map(_._1).toSeq, s"doc_ids of ($shard, $packId)")
      assert(nDocs === members.length && nTokens === members.map(_._3).sum)
      // the offsets law: first member starts at 0, each next at the
      // running token sum — exactly the loss-mask boundaries
      assert(offs === members.map(_._3).scanLeft(0L)(_ + _).init.toSeq,
        s"doc_offsets of ($shard, $packId)")
    }
    // addressing one shard file through the manifest yields the same arrays
    val one = ShardExport.readShard(spark, dir, shard = 0L, fileIdx = 0L)
    assert(one.columns.toSet ===
      Set("pack_id", "n_docs", "n_tokens", "doc_ids", "doc_offsets"))
    assert(one.count() > 0)
  }

  test("an empty export refuses loudly instead of dying in the manifest re-scan") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("shard", "pack_id", "n_tokens")
    val dir = java.nio.file.Files.createTempDirectory("shardex4").toString
    val e = intercept[IllegalArgumentException] {
      ShardExport.exportTrainingShards(empty, dir, seqPerFile = 4)
    }
    assert(e.getMessage.contains("empty sequence set"))
    // nothing committed: the store has no generations
    assert(graft.sources.Store.listGenerations(spark, dir).isEmpty)
  }
}
