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
  * production deployment swaps only the function body marked STUB.
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
    * twin. */
  def decodeMetaSql(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      length(col("payload")).cast("int").as("byteLen"),
      md5(col("payload")).as("contentHash"),
      (length(col("payload")) % 640 + 1).cast("int").as("width"),
      (length(col("payload")) % 480 + 1).cast("int").as("height"),
      when(length(col("payload")) % 2 === 0, "png").otherwise("jpeg").as("format"))

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

  /** STUB frame sampling: every `stride`-th "frame" of a fake video =
    * md5 digests of fixed-size byte windows. Real frame extraction keeps
    * the same per-partition batch shape and output schema
    * (id, frame_no, frame_hash). */
  def sampleFrames(media: DataFrame, stride: Int = 4, frameBytes: Int = 16): DataFrame = {
    val nFrames = greatest(floor(length(col("payload")) / frameBytes), lit(1)).cast("int")
    media.select(col("id"),
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
