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

  /** PNG bytes of a w×h image painted by `pixel(x, y) -> rgb`. */
  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real image decode: a generated PNG's phash matches the independently derived aHash") {
    // 64x64, left half black, right half white: on the 4x4 grid (bits=16)
    // the two right columns of every row sit above the mean luma, so the
    // expected aHash is 0011 repeated — derived from the IMAGE CONTENT,
    // not from re-running the decode path
    val png = pngBytes(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val expected = java.lang.Long.parseLong("0011001100110011", 2)
    val media = Seq((1L, png)).toDF("id", "payload")
    val got = Multimodal.perceptualHashImage(media, bits = 16)
      .as[(Long, Option[Long], Option[String])].head()
    assert(got === ((1L, Some(expected), None)))
    // a JPEG payload of the same image lands in the same Hamming space
    // (JPEG is lossy; a half-black/half-white image survives exactly)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val viaJpeg = Multimodal.perceptualHashImage(
        Seq((2L, jout.toByteArray)).toDF("id", "payload"), bits = 16)
      .as[(Long, Option[Long], Option[String])].head()
    assert(viaJpeg === ((2L, Some(expected), None)))
  }

  test("real image resize: scales into the target box, quarantines corrupt payloads, stubs non-images") {
    // a solid-red PNG survives any interpolation exactly: every output
    // pixel must still be pure red at the new dimensions
    val red = pngBytes(3, 3)((_, _) => 0xff0000)
    val corrupt = red.take(12)
    val textPayload = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      (1L, red), (2L, corrupt), (3L, textPayload), (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = Multimodal.resizeImage(media, 6, 4)
      .as[(Long, Int, Int, Array[Byte], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // the real path: decoded output is a 6x4 all-red PNG
    val (w, h, resized, err) = rows(1L)
    assert((w, h) === ((6, 4)) && err.isEmpty)
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(out.getWidth === 6 && out.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 6)
      assert((out.getRGB(x, y) & 0xffffff) === 0xff0000, s"pixel ($x,$y) not red")
    // corrupt image magic: quarantined, payload null, never thrown
    assert(rows(2L)._3 === null && rows(2L)._4.exists(_.startsWith("png")))
    // non-image: byte-identical to the stub derivation
    val stub = Multimodal.resizeStub(
        Seq((3L, textPayload)).toDF("id", "payload"), 6, 4)
      .select("payload").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(rows(3L)._3, stub))
    assert(rows(3L)._4.isEmpty)
    // null payload: null out, no error
    assert(rows(4L)._3 === null && rows(4L)._4.isEmpty)
  }

  test("real audio parse: WAV metadata from javax.sound, quarantine, non-audio passthrough") {
    // a genuine 1-second mono 16-bit 8 kHz WAV generated through the
    // same public JDK API a producer would use
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](8000 * 2) // 8000 frames of silence
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val corrupt = wav.take(16) // RIFF/WAVE magic intact, body truncated
    val media = Seq(
      (1L, wav), (2L, corrupt), (3L, "not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = Multimodal.audioMeta(media)
      .as[(Long, Boolean, Option[Float], Option[Int], Option[Int],
        Option[Long], Option[Double], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    // real parse: 8 kHz, mono, 16-bit, 8000 frames, 1000 ms
    assert(rows(1L) === ((1L, true, Some(8000f), Some(1), Some(16),
      Some(8000L), Some(1000.0), None)))
    // truncated body: flagged audio, metadata quarantined, never thrown
    assert(rows(2L)._2 === true && rows(2L)._8.exists(_.startsWith("wav")))
    // non-audio and null payloads: passthrough, no error
    assert(rows(3L) === ((3L, false, None, None, None, None, None, None)))
    assert(rows(4L) === ((4L, false, None, None, None, None, None, None)))
  }

  test("real image decode: magic routing, quarantine on corrupt payloads, stub for non-images") {
    val png = pngBytes(8, 8)((x, y) => if ((x + y) % 2 == 0) 0x000000 else 0xffffff)
    // a payload that CLAIMS png by magic but is truncated garbage
    val corrupt = png.take(12)
    // a non-image payload: must keep the deterministic stub fingerprint
    val textPayload = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      (1L, png), (2L, corrupt), (3L, textPayload), (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = Multimodal.perceptualHashImage(media, bits = 16)
      .as[(Long, Option[Long], Option[String])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // real decode succeeded, no error
    assert(rows(1L)._1.isDefined && rows(1L)._2.isEmpty)
    // corrupt: quarantined, never thrown
    assert(rows(2L)._1.isEmpty && rows(2L)._2.exists(_.startsWith("png")))
    // non-image: the stub derivation, bit-identical to perceptualHash
    val stubFp = Multimodal.perceptualHash(
        Seq((3L, textPayload)).toDF("id", "payload"), bits = 16)
      .as[(Long, Long)].head()._2
    assert(rows(3L)._1 === Some(stubFp) && rows(3L)._2.isEmpty)
    // null payload: null fp, no error
    assert(rows(4L)._1.isEmpty && rows(4L)._2.isEmpty)
  }
}
