package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata.
  *
  * North-star extension. Images/audio/video ride through the engine as
  * `binary` columns plus a metadata struct; decode / feature-extraction /
  * frame-sampling run per-partition so any real decoder processes a batch
  * of blobs per task without per-row driver round-trips.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so the decode
  * kernels below are clearly-marked deterministic fakes that derive
  * "metadata" from blob length and bytes. The Spark-side contract — schema,
  * encoder, partition-batch shape, null handling — is real and tested; a
  * production deployment swaps only the function body marked STUB. One
  * path is production-true already: [[perceptualHashImage]] decodes real
  * image payloads through `javax.imageio` (public JDK API), selected per
  * row by magic bytes, with the stub derivation retained for non-image
  * fixtures and decode failures quarantined per row.
  */
object Multimodal {

  /** Typed metadata produced by media decode. */
  final case class MediaMeta(
      id: Long,
      byteLen: Int,
      contentHash: String,
      width: Int,
      height: Int,
      format: String)

  val mediaMetaSchema: StructType = Encoders.product[MediaMeta].schema

  /** Wrap a table as media rows: id plus an opaque binary payload column.
    * (Test fixtures carry text; a real pipeline reads binary files or
    * Parquet BINARY columns directly.) */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).cast("binary").as("payload"))

  /** STUB decode kernel: deterministic fake metadata from the blob bytes.
    * A real implementation calls the codec here — same signature, same
    * batch shape. */
  private def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = if (payload == null) 0 else payload.length
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(if (payload == null) Array.emptyByteArray else payload)
      .map("%02x".format(_)).mkString
    // STUB: "dimensions" derived from length so they're reproducible
    MediaMeta(id, len, hex, width = len % 640 + 1, height = len % 480 + 1,
      format = if (len % 2 == 0) "png" else "jpeg")
  }

  /** Decode a media table to typed metadata. Runs per-partition — each task
    * decodes its batch of blobs locally; no shuffle is introduced and the
    * input partitioning is preserved. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeStub(id, payload) })
  }

  /** Pure-SQL twin of [[decodeMeta]] for engines-parity checking: the same
    * deterministic fake metadata as codegen'd expressions. Exists so the
    * stub's plumbing has an oracle; a real decoder obviously has no SQL
    * twin. A NULL payload decodes as an EMPTY blob on both sides — the
    * typed row cannot carry null dimensions (primitive Int fields), so
    * the kernel's empty-blob reading is the contract and the SQL twin
    * coalesces to match rather than null-propagating into a parity gap. */
  def decodeMetaSql(media: DataFrame): DataFrame = {
    val p = coalesce(col("payload"), lit(Array.emptyByteArray))
    media.select(
      col("id"),
      length(p).cast("int").as("byteLen"),
      md5(p).as("contentHash"),
      (length(p) % 640 + 1).cast("int").as("width"),
      (length(p) % 480 + 1).cast("int").as("height"),
      when(length(p) % 2 === 0, "png").otherwise("jpeg").as("format"))
  }

  /** STUB feature extraction: a `dims`-wide deterministic fake embedding
    * per blob — feature i is the first 4 hex digits of md5(payload ++ "#i")
    * scaled to [-1, 1]. Runs per-partition like a real vision/audio encoder
    * (batch of blobs per task, one dense vector out per blob); swap the
    * function body for the model call. [[extractFeaturesSql]] is the
    * expression twin that gives the plumbing an oracle. */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          // null payload → null features, matching the SQL twin's
          // null-propagating md5(concat(null, ...))
          val fs = if (payload == null) null
          else (0 until dims).map { i =>
            md.reset()
            val hex = md.digest(payload ++ s"#$i".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            Integer.parseInt(hex.substring(0, 4), 16) / 65535.0 * 2 - 1
          }.toArray
          (id, fs)
        }
      }.toDF("id", "features")
  }

  /** Expression twin of [[extractFeatures]] (same values, pure SQL; a null
    * payload nulls the whole array, matching the kernel). */
  def extractFeaturesSql(media: DataFrame, dims: Int = 8): DataFrame =
    media.select(col("id"),
      when(col("payload").isNotNull,
        transform(sequence(lit(0), lit(dims - 1)), i =>
          conv(md5(concat(col("payload"), concat(lit("#"), i.cast("string")).cast("binary")))
            .substr(1, 4), 16, 10).cast("double") / 65535.0 * 2 - 1)).as("features"))

  /** STUB resize: emits a deterministic fake resized payload (md5-derived
    * bytes seeded by payload and target box) plus the target dimensions.
    * Real resizing replaces the payload derivation only; schema
    * (id, width, height, payload) and per-partition batch shape stay. */
  def resizeStub(media: DataFrame, width: Int, height: Int): DataFrame =
    media.select(col("id"),
      lit(width).as("width"), lit(height).as("height"),
      unhex(md5(concat(col("payload"),
        lit(s"#${width}x$height").cast("binary")))).as("payload"))

  /** REAL image resize behind the [[resizeStub]] schema — the second
    * production-true media path after [[perceptualHashImage]]: payloads
    * with a known image magic decode through `javax.imageio` (public JDK
    * API), scale into the target box with bilinear interpolation, and
    * re-encode as PNG; non-image payloads keep the stub derivation
    * byte-for-byte (so mixed fixtures stay deterministic); decode or
    * encode failures land in `decode_error` with a null payload, never
    * throw. Per-partition like every media kernel: a task decodes its
    * batch of blobs locally, no shuffle, input partitioning preserved.
    *
    * Output (id, width, height, payload, decode_error). */
  def resizeImage(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1, "target box must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map[(Long, Int, Int, Array[Byte], Option[String])] { case (id, payload) =>
          if (payload == null) (id, width, height, null, None)
          else imageMagic(payload) match {
            case None =>
              // the stub derivation, byte-identical to [[resizeStub]]
              md.reset()
              (id, width, height,
                md.digest(payload ++ s"#${width}x$height".getBytes("UTF-8")), None)
            case Some(fmt) =>
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload))
                if (img == null)
                  (id, width, height, null,
                    Some(s"$fmt: no ImageIO reader decoded the payload"))
                else {
                  val out = new java.awt.image.BufferedImage(
                    width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = out.createGraphics()
                  g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, width, height, null)
                  g.dispose()
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(out, "png", bos)
                  (id, width, height, bos.toByteArray, None)
                }
              } catch {
                case e: Exception =>
                  (id, width, height, null,
                    Some(s"$fmt: ${e.getClass.getSimpleName}: ${e.getMessage}"))
              }
          }
        }
      }.toDF("id", "width", "height", "payload", "decode_error")
  }

  /** REAL audio metadata — the third production-true media path (after
    * [[perceptualHashImage]] and [[resizeImage]]): RIFF/WAVE payloads
    * parse through `javax.sound.sampled` (public JDK API — WAV/PCM needs
    * no external codec): sample rate, channels, sample bits, frame count
    * and duration; malformed audio quarantines in `decode_error`;
    * non-audio payloads pass through flagged `is_audio = false` with
    * null metadata and NO error (a mixed corpus is not an error
    * condition). Per-partition, no shuffle, like every media kernel.
    *
    * Output (id, is_audio, sample_rate, channels, bits, frames,
    * duration_ms, decode_error). */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map[(Long, Boolean, Option[Float], Option[Int], Option[Int],
            Option[Long], Option[Double], Option[String])] { case (id, payload) =>
          val isWav = payload != null && payload.length >= 12 &&
            payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
            payload(10) == 'V' && payload(11) == 'E'
          if (!isWav) (id, false, None, None, None, None, None, None)
          else try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val f = in.getFormat
            val frames = in.getFrameLength
            val durMs =
              if (frames >= 0 && f.getSampleRate > 0)
                Some(frames * 1000.0 / f.getSampleRate)
              else None
            (id, true, Some(f.getSampleRate), Some(f.getChannels),
              Some(f.getSampleSizeInBits), Some(frames), durMs, None)
          } catch {
            case e: Exception =>
              (id, true, None, None, None, None, None,
                Some(s"wav: ${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        }
      }.toDF("id", "is_audio", "sample_rate", "channels", "bits", "frames",
        "duration_ms", "decode_error")
  }

  /** STUB frame sampling: every `stride`-th "frame" of a fake video =
    * md5 digests of fixed-size byte windows. Real frame extraction keeps
    * the same per-partition batch shape and output schema
    * (id, frame_no, frame_hash). */
  def sampleFrames(media: DataFrame, stride: Int = 4, frameBytes: Int = 16): DataFrame = {
    // stride <= 0 would make frame_no % stride NULL and silently filter
    // every frame; null payloads have NO frames (greatest(null, 1) would
    // otherwise fabricate a phantom frame 0 with a null hash)
    require(stride >= 1, "stride must be at least 1")
    require(frameBytes >= 1, "frameBytes must be at least 1")
    val nFrames = greatest(floor(length(col("payload")) / frameBytes), lit(1)).cast("int")
    media.filter(col("payload").isNotNull)
      .select(col("id"),
        posexplode(transform(sequence(lit(0), nFrames - 1),
          i => md5(col("payload").substr(i * frameBytes + 1, lit(frameBytes)))))
          .as(Seq("frame_no", "frame_hash")))
      .filter(col("frame_no") % stride === 0)
  }

  /** Average-hash perceptual fingerprint: `bits` feature values from the
    * (stubbed) decode, thresholded at their mean — the aHash recipe, with
    * the real decode's downsampled grayscale pixels replaced by the same
    * deterministic feature derivation [[extractFeaturesSql]] uses (a real
    * codec swaps the feature source only; the thresholding, fingerprint
    * packing and downstream blocking stay).
    *
    * One codegen'd kernel call per row ([[graft.functions.HashKernels
    * .phashFp]]) — the [[graft.functions.WinnowFps]] lesson applied to
    * the media path, whose three interpreted-HOF stages
    * ([[perceptualHashStaged]], kept as the executable spec) made
    * `x_media_phash` the first media-scale wall. The mean is a seeded
    * left-to-right fold, mirrored by `list_reduce` in the oracle so
    * double addition order is identical.
    *
    * @return (id, fp) — fp is a `bits`-wide long, null for null payloads
    */
  def perceptualHash(media: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 2 && bits <= 62, "need 2 <= bits <= 62")
    media.select(col("id"),
      graft.functions.DedupExpressions.phashOf(col("payload"), bits).as("fp"))
  }

  /** The staged-HOF executable spec [[perceptualHash]]'s kernel is pinned
    * against (MultimodalSpec): feature extraction, mean, and bit packing
    * as three STAGED projections. CollapseProject re-inlines an alias
    * referenced exactly once, which would push the mean fold INSIDE the
    * per-bit lambda (bits re-evaluations per row) — so the final
    * projection references `mean` twice: once in the lambda and once in a
    * semantically-neutral null guard (mean is null iff features is null),
    * which keeps the stage boundary in force. */
  def perceptualHashStaged(media: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 2 && bits <= 62, "need 2 <= bits <= 62")
    extractFeaturesSql(media, bits)
      .select(col("id"), col("features"),
        (aggregate(col("features"), lit(0.0), (a, x) => a + x) / bits).as("mean"))
      .select(col("id"),
        when(col("features").isNotNull && col("mean").isNotNull,
          aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
            acc + when(element_at(col("features"), i + 1) > col("mean"),
              pow(lit(2.0), lit(bits - 1) - i).cast("long")).otherwise(lit(0L))))
          .as("fp"))
  }

  /** Magic-byte sniff of a payload's image container. Public signatures:
    * PNG (89 50 4E 47), JPEG (FF D8 FF), GIF ("GIF8"), BMP ("BM").
    * None when no known image magic leads the payload. */
  private[operators] def imageMagic(payload: Array[Byte]): Option[String] =
    if (payload == null || payload.length < 4) None
    else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G') Some("png")
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff) Some("jpeg")
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8') Some("gif")
    else if (payload(0) == 'B' && payload(1) == 'M') Some("bmp")
    else None

  /** `bits`-cell mean-luma grid of a decoded image — the aHash
    * downsample: the image partitions into a ceil(sqrt(bits))-column
    * grid, each cell's value is the mean ITU-R BT.601 luma of its pixel
    * box, scaled to [-1, 1] like the stub features (so the shared
    * mean-threshold-pack stage is source-agnostic). */
  private def lumaGrid(img: java.awt.image.BufferedImage, bits: Int): Array[Double] = {
    val gw = math.ceil(math.sqrt(bits)).toInt
    val gh = math.ceil(bits.toDouble / gw).toInt
    val w = img.getWidth
    val h = img.getHeight
    val fs = new Array[Double](bits)
    var c = 0
    while (c < bits) {
      val cx = c % gw
      val cy = c / gw
      val x0 = (cx.toLong * w / gw).toInt
      val x1 = math.min(math.max(x0 + 1, ((cx + 1).toLong * w / gw).toInt), w)
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = math.min(math.max(y0 + 1, ((cy + 1).toLong * h / gh).toInt), h)
      var sum = 0.0
      var n = 0
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          n += 1
          x += 1
        }
        y += 1
      }
      fs(c) = if (n == 0) 0.0 else sum / n / 255.0 * 2 - 1
      c += 1
    }
    fs
  }

  /** The shared aHash tail: mean-threshold the feature cells and pack
    * MSB-first — bit-identical to the [[graft.functions.HashKernels
    * .phashFp]] packing, so real-decode and stub fingerprints live in the
    * same Hamming space. */
  private def packAHash(fs: Array[Double], bits: Int): Long = {
    var acc = 0.0
    var i = 0
    while (i < bits) { acc += fs(i); i += 1 }
    val mean = acc / bits
    var fp = 0L
    i = 0
    while (i < bits) {
      if (fs(i) > mean) fp |= 1L << (bits - 1 - i)
      i += 1
    }
    fp
  }

  /** PRODUCTION-TRUE perceptual hash: payloads carrying a known image
    * magic decode through `javax.imageio` (public JDK API — no external
    * codec dependency) into the `bits`-cell luma grid; payloads without
    * one keep the deterministic stub derivation ([[perceptualHash]]'s
    * kernel — byte fixtures stay oracle-stable); decode FAILURES
    * (truncated container, unsupported variant) land in the
    * `decode_error` quarantine column and NEVER throw — at 100 TB a
    * corrupt blob must cost one quarantined row, not the stage. The
    * mean-threshold-pack tail is shared with the stub path, so both
    * fingerprint families block and pair identically downstream
    * ([[phashNearDuplicates]]).
    *
    * Runs `mapPartitions` like [[decodeMeta]]: binary codec work has no
    * Catalyst expression form, each task decodes its batch of blobs
    * locally, input partitioning preserved, no shuffle.
    *
    * @return (id, fp, decode_error) — fp null for null payloads and
    *         quarantined rows; decode_error null unless decode failed
    */
  def perceptualHashImage(media: DataFrame, bits: Int = 16): DataFrame = {
    require(bits >= 2 && bits <= 62, "need 2 <= bits <= 62")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map[(Long, Option[Long], Option[String])] { case (id, payload) =>
          if (payload == null) (id, None, None)
          else imageMagic(payload) match {
            case None =>
              (id, Some(graft.functions.HashKernels.phashFp(payload, bits)), None)
            case Some(fmt) =>
              try {
                val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
                if (img == null) (id, None, Some(s"$fmt: no ImageIO reader decoded the payload"))
                else (id, Some(packAHash(lumaGrid(img, bits), bits)), None)
              } catch {
                case e: Exception =>
                  (id, None, Some(s"$fmt: ${e.getClass.getSimpleName}: ${e.getMessage}"))
              }
          }
        }
      }.toDF("id", "fp", "decode_error")
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance —
    * [[Dedup.hammingNearDuplicates]] pigeonhole blocking over
    * [[perceptualHash]] fingerprints. Null payloads cannot pair. */
  def phashNearDuplicates(
      media: DataFrame,
      bits: Int = 16,
      maxHamming: Int = 2,
      scope: graft.CacheScope = graft.CacheScope.Global): DataFrame =
    Dedup.hammingNearDuplicates(
      perceptualHash(media, bits).filter(col("fp").isNotNull),
      "id", "fp", bits, maxHamming, scope)
}
