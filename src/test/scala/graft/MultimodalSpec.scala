package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")

  test("asMedia produces (id long, payload binary)") {
    assert(media.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("id", "long"), ("payload", "binary")))
  }

  test("decodeMeta (mapPartitions stub) agrees with its SQL twin row-for-row") {
    val typed = Multimodal.decodeMeta(media).toDF()
    val sql   = Multimodal.decodeMetaSql(media)
    val t = typed.orderBy("id").collect().map(_.toSeq).toSeq
    val s = sql.orderBy("id").collect().map(_.toSeq).toSeq
    assert(t === s)
  }

  test("feature-extract kernel equals its SQL twin; resize emits target box") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
    val media = graft.operators.Multimodal.asMedia(docs, "doc_id", "text")
    val kernel = graft.operators.Multimodal.extractFeatures(media, dims = 8)
    val sql = graft.operators.Multimodal.extractFeaturesSql(media, dims = 8)
    assert(kernel.exceptAll(sql).count() === 0)
    assert(sql.exceptAll(kernel).count() === 0)
    val resized = graft.operators.Multimodal.resizeStub(media, 64, 64)
    assert(resized.columns.toSeq === Seq("id", "width", "height", "payload"))
    assert(resized.filter(length(col("payload")) =!= 16).count() === 0) // md5 = 16 bytes
  }

  test("feature-extract kernel and SQL twin agree on null payloads (both null)") {
    val media = Seq((1L, "x".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val kernel = graft.operators.Multimodal.extractFeatures(media, dims = 4)
    val sql = graft.operators.Multimodal.extractFeaturesSql(media, dims = 4)
    assert(kernel.filter(col("id") === 2L).collect().head.isNullAt(1))
    assert(kernel.exceptAll(sql).count() === 0)
    assert(sql.exceptAll(kernel).count() === 0)
  }

  test("decode handles empty payloads without error") {
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.asMedia(empty, "doc_id", "text")).collect()
    assert(meta.head.byteLen === 0)
    assert(meta.head.width === 1 && meta.head.height === 1)
  }

  test("frame sampling emits every stride-th frame with stable hashes") {
    val frames = Multimodal.sampleFrames(media, stride = 4, frameBytes = 16)
    assert(frames.filter($"frame_no" % 4 =!= 0).count() === 0)
    val again = Multimodal.sampleFrames(media, stride = 4, frameBytes = 16)
    assert(frames.exceptAll(again).count() === 0)
  }

  test("perceptual hash: bits-bounded, deterministic, null payload -> null fp") {
    val fps = Multimodal.perceptualHash(media, bits = 16)
    assert(fps.filter($"fp".isNotNull && ($"fp" < 0 || $"fp" >= (1L << 16))).count() === 0)
    val again = Multimodal.perceptualHash(media, bits = 16)
    assert(fps.exceptAll(again).count() === 0)
    val withNull = Seq((1L, "x"), (2L, null)).toDF("doc_id", "text")
    val nf = Multimodal.perceptualHash(
      Multimodal.asMedia(withNull, "doc_id", "text"), bits = 16)
    assert(nf.filter($"id" === 2L).head.isNullAt(1))
    assert(!nf.filter($"id" === 1L).head.isNullAt(1))
  }

  test("phash kernel is value-identical to the staged HOF spec form") {
    // real corpus payloads, several widths incl. the 62-bit edge (sign-free
    // long) and the 16-bit shipped setting
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    for (bits <- Seq(16, 31, 62)) {
      val kernel = Multimodal.perceptualHash(m, bits)
      val staged = Multimodal.perceptualHashStaged(m, bits)
      assert(kernel.exceptAll(staged).count() === 0, s"bits=$bits kernel minus staged")
      assert(staged.exceptAll(kernel).count() === 0, s"bits=$bits staged minus kernel")
    }
  }

  test("phash near-dups: identical payloads pair at hamming 0; bound respected") {
    val dup = Seq((1L, "same payload bytes"), (2L, "same payload bytes"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val pairs = Multimodal.phashNearDuplicates(
        Multimodal.asMedia(dup, "doc_id", "text"), bits = 16, maxHamming = 2)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(pairs.forall(_._3 <= 2))
  }
}
