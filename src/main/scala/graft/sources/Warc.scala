package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion — the record-delimited web-archive format every
  * public corpus recipe starts from (Common Crawl publishes WARC capture
  * files and WET text extracts; C4, RefinedWeb, FineWeb, CCNet all begin
  * at these files). The reference has no counterpart (its entry point is
  * `pd.read_csv`, `main.py:16`); this source exists so the curation loop
  * ([[graft.operators.Curation.curateIncremental]]) can be fed from the
  * real entry format: WARC record → (url, ts, mime, payload/text) →
  * [[graft.operators.Urls.canonicalizeUrl]] → gates.
  *
  * Format (ISO 28500, public spec): each record is a `WARC/x.y` version
  * line, `Name: value` header lines, an empty line, then exactly
  * `Content-Length` payload bytes, then a blank separator. Common Crawl
  * compresses ONE GZIP MEMBER PER RECORD and concatenates the members, so
  * a `.warc.gz` is itself a valid multi-member gzip stream —
  * `GZIPInputStream` walks the members transparently, and this reader
  * handles plain and gzipped files through the same byte parser (sniffed
  * by the 0x1f8b magic, not the file name).
  *
  * Scale shape: files are the unit of parallelism — one task per file via
  * the `binaryFile` source (a Common Crawl segment is ~100k files of
  * ~1 GB, far wider than any cluster), and each task is one streaming
  * pass over its file's decompressed bytes with bounded per-record state.
  * Whole-file rows cap at the 2 GB byte-array limit, which the WARC
  * ecosystem's own ~1 GB rotation convention stays under; re-splitting a
  * single file is deliberately NOT attempted (gzip members are not
  * seekable without an index).
  *
  * Malformed input follows the [[graft.operators.Multimodal]] quarantine
  * convention: a bad record costs ONE quarantined row (`parse_error` set,
  * payload fields null) — never the task — and the parser resyncs to the
  * next `WARC/` version line, so one corrupt record cannot eat the rest
  * of its file.
  */
object Warc {

  /** One parsed WARC record (or one quarantined parse failure). */
  final case class WarcRecord(
      file: String,
      rec_idx: Long,
      warc_type: Option[String],
      url: Option[String],
      ts: Option[String],
      mime: Option[String],
      n_bytes: Option[Long],
      payload: Option[Array[Byte]],
      parse_error: Option[String])

  /** Read every WARC record under `path` (file, directory, or glob —
    * `binaryFile` semantics): one row per record, one task per file.
    *
    * Columns: `file` (full path), `rec_idx` (0-based position in its
    * file, quarantined rows included — the replay-stable record address),
    * `warc_type` (`WARC-Type` header), `url` (`WARC-Target-URI`), `ts`
    * (`WARC-Date`), `mime` (`Content-Type`), `n_bytes` (payload length),
    * `payload` (raw bytes), `text` (payload decoded as UTF-8, the WET
    * consumption form), `parse_error` (null for good rows).
    *
    * @param glob optional name filter, e.g. `"*.warc.gz"`
    */
  def readWarc(spark: SparkSession, path: String, glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    parsedRecords(glob.fold(reader)(g => reader.option("pathGlobFilter", g))
      .load(path))
  }

  /** STREAMING twin of [[readWarc]]: a landing-directory file stream —
    * new `.warc`/`.warc.gz` files dropped under `path` arrive as
    * micro-batches of parsed records (the `binaryFile` format has a file
    * stream source, and the record parse is the same per-file lazy
    * iterator). File-per-task parallelism and the quarantine contract
    * carry over unchanged; files are the streaming unit too, so a
    * replayed file re-parses to the identical record set (rec_idx is
    * position-stable) — feed [[graft.streaming.StreamingHistorization
    * .curateMaintainStream]] to close the crawl-to-corpus loop
    * end-to-end.
    *
    * @param maxFilesPerTrigger bound files per micro-batch (a crawl
    *        segment drop can be thousands of files; unbounded first
    *        batches are how streaming jobs OOM their driver listing) */
  def readWarcStream(
      spark: SparkSession,
      path: String,
      glob: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // a streaming source cannot infer its schema; binaryFile's is fixed
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val reader0 = spark.readStream.format("binaryFile").schema(binaryFileSchema)
    val reader1 = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g))
    val reader = maxFilesPerTrigger.fold(reader1)(n =>
      reader1.option("maxFilesPerTrigger", n.toString))
    parsedRecords(reader.load(path))
  }

  /** The shared parse: a `binaryFile`-shaped frame (batch or streaming)
    * to one row per WARC record. */
  private def parsedRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseWarcBytes(file, bytes) }
      .toDF()
      .select(col("file"), col("rec_idx"), col("warc_type"), col("url"),
        col("ts"), col("mime"), col("n_bytes"), col("payload"),
        // UTF-8 view via the binary→string cast (never throws on stray
        // bytes, unlike `decode` which raises MALFORMED_CHARACTER_CODING):
        // the WET text surface; binary captures stay addressable through
        // `payload`
        col("payload").cast("string").as("text"),
        col("parse_error"))
  }

  /** [[readWarc]] narrowed to the rows a text pipeline consumes: good
    * (un-quarantined) records of `warcType`, projected to
    * (url, ts, mime, text). WET extracts are `conversion` records (the
    * default); raw captures are `response`. */
  def readWet(
      spark: SparkSession,
      path: String,
      glob: Option[String] = None,
      warcType: String = "conversion"): DataFrame =
    readWarc(spark, path, glob)
      .filter(col("parse_error").isNull && col("warc_type") === warcType)
      .select(col("file"), col("rec_idx"), col("url"), col("ts"),
        col("mime"), col("text"))

  /** [[readWarc]] lifted to the RAW-CAPTURE text path: good `response`
    * records → HTTP envelope split (+ chunked / gzip transfer decode) →
    * charset resolution + decode → HTML visible-text extraction — the
    * WARC-first recipe (RefinedWeb/FineWeb extract their own text from
    * `response` records rather than trusting the WET `conversion`
    * extracts, whose UTF-8-only cast mangles legacy-charset bodies).
    *
    * Columns: `file`, `rec_idx`, `url`, `ts`, `http_status`,
    * `content_type` (the HTTP header, not the WARC one), `charset` (the
    * java.nio canonical name actually used), `text` (extracted visible
    * text for HTML bodies; the decoded body verbatim for other textual
    * types), `extract_error` (null for good rows — set by malformed
    * chunking, undecodable content-codings, or a non-text body).
    *
    * Every stage is a codegen'd per-row expression
    * ([[graft.functions.WebExpressions]]) fused into the record scan —
    * no extra shuffle, no UDF; at 100 TB this runs exactly as wide as
    * the file-per-task WARC parse itself. */
  def readResponses(
      spark: SparkSession,
      path: String,
      glob: Option[String] = None): DataFrame =
    responsesOf(readWarc(spark, path, glob))

  /** The response-extraction stage over any [[readWarc]]-shaped frame —
    * batch or STREAMING ([[readWarcStream]]): every stage is a per-row
    * expression, so it composes onto a stream unchanged.
    *
    * @param mainContent when set (minChars, maxLinkDensity), HTML rows
    *        carry an extra `main_text` column — the density-selected
    *        MAIN content ([[graft.functions.WebExpressions.mainTextOf]]:
    *        nav/footer/link-farm blocks dropped), next to the keep-all
    *        `text`; non-HTML text rows carry their `text` verbatim there
    *        (plain text has no boilerplate blocks to select against) */
  def responsesOf(
      records: DataFrame,
      mainContent: Option[(Int, Double)] = None): DataFrame = {
    import graft.functions.WebExpressions._
    val http = records
      .filter(col("parse_error").isNull && col("warc_type") === "response")
      .withColumn("__http", httpParseOf(col("payload")))
    val isText = lower(coalesce(col("__http.content_type"), lit("")))
      .rlike("^(text/|application/(xhtml|xml|json))") ||
      col("__http.content_type").isNull // charset-sniff bare bodies too
    val isHtml = lower(coalesce(col("__http.content_type"), lit("")))
      .contains("html") || col("__http.content_type").isNull
    val decoded = http.withColumn("__dec",
      charsetDecodeOf(col("__http.body"), col("__http.content_type")))
    val base = Seq(
      col("file"), col("rec_idx"), col("url"), col("ts"),
      col("__http.status").as("http_status"),
      col("__http.content_type").as("content_type"),
      when(isText, col("__dec.charset")).as("charset"),
      when(isHtml, htmlTextOf(col("__dec.text")))
        .when(isText, col("__dec.text"))
        .as("text"),
      coalesce(col("__http.err"),
        when(!isText, concat(lit("non-text body: "),
          col("__http.content_type")))).as("extract_error"))
    val cols = base ++ mainContent.map { case (minChars, maxDensity) =>
      when(isHtml, mainTextOf(col("__dec.text"), minChars, maxDensity))
        .when(isText, col("__dec.text"))
        .as("main_text")
    }
    decoded.select(cols: _*)
  }

  private val GzipMagic0 = 0x1f.toByte
  private val GzipMagic1 = 0x8b.toByte

  /** [[java.util.zip.GZIPInputStream]] with the inflater's unconsumed
    * compressed-byte count exposed. OpenJDK's multi-member walk treats an
    * UNREADABLE next member header as plain EOF (readTrailer swallows the
    * header parse failure) — a damaged member boundary silently truncates
    * the rest of a .warc.gz. Unconsumed-after-EOF is the tell: a clean
    * final trailer leaves the inflater empty, a swallowed header parse
    * leaves the damaged member's bytes sitting in the buffer. */
  private final class MemberGzipStream(raw: java.io.InputStream)
      extends java.util.zip.GZIPInputStream(raw) {
    def unconsumed: Int = inf.getRemaining
  }

  /** Header/resync line cap — far above any real WARC header line, far
    * below task memory; see the readLine comment in [[parseWarcBytes]]. */
  private val MaxLineBytes = 64 * 1024

  /** Parse one file's raw bytes into a LAZY record iterator. Peak task
    * memory stays at the compressed source (the binaryFile row) plus ONE
    * decompressed record — a materialized Seq would hold a ~1 GB .warc.gz
    * file's full 3–5 GB decompressed content per task. Package-visible
    * for the parser specs; bounded state = one record's headers +
    * payload. */
  private[sources] def parseWarcBytes(
      file: String, bytes: Array[Byte]): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val raw = new java.io.ByteArrayInputStream(bytes)
    // set when an IOException must still be reported AFTER an
    // already-pending record is delivered (the error escaped from the
    // look-ahead read that followed a completed record); also carries a
    // first-gzip-header parse failure from construction
    private var terminalErr: String = null
    private var gz: MemberGzipStream = null
    private val in: java.io.DataInputStream = {
      val base: java.io.InputStream =
        if (bytes.length >= 2 && bytes(0) == GzipMagic0 && bytes(1) == GzipMagic1)
          // multi-member aware: one gzip member per record (the Common
          // Crawl layout) decompresses as one continuous stream. The
          // constructor itself parses the first member header — a corrupt
          // one must cost a quarantine row, not the task
          try { gz = new MemberGzipStream(raw); gz } catch {
            case e: java.io.IOException => terminalErr = ioMsg(e); raw
          }
        else raw
      new java.io.DataInputStream(new java.io.BufferedInputStream(base))
    }
    // a consumer that stops early (limit(n), a downstream failure) never
    // exhausts the iterator, so the inflater's native buffers would wait
    // for finalization — close at task end instead (close is idempotent)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))

    // one-byte pushback for the capped readLine exit: the byte that
    // tripped the cap is already consumed and belongs to the NEXT chunk —
    // dropping it would shear one byte per chunk, so a "WARC/" version
    // line starting exactly at a chunk boundary would lose its 'W' during
    // resync and a well-formed record would quarantine
    private var pushback: Int = -1
    private def readByte(): Int =
      if (pushback >= 0) { val b = pushback; pushback = -1; b } else in.read()

    // Byte-accurate line reader: returns the line WITHOUT its \r?\n
    // terminator, null at EOF. Bytes accumulate and decode as UTF-8 at
    // line end (WARC 1.0 headers are UTF-8-capable; a per-byte toChar
    // would mojibake non-ASCII header values); payload bytes are never
    // routed through here (readFully below). CAPPED at MaxLineBytes: a
    // newline-free misnamed binary (or a lying Content-Length routing
    // payload bytes through resync) must not buffer the whole file —
    // past the cap the chunk returns as-is (it cannot start with
    // "WARC/", so it quarantines/resyncs), the cap-tripping byte pushes
    // back, and the next call continues from it, keeping the pass
    // O(file) time at O(cap) memory.
    private def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var b = readByte()
      if (b < 0) return null
      while (b >= 0 && b != '\n' && buf.size() < MaxLineBytes) {
        buf.write(b); b = readByte()
      }
      val capped = b >= 0 && b != '\n'
      if (capped) pushback = b
      val arr = buf.toByteArray
      val n = if (!capped && arr.length > 0 && arr(arr.length - 1) == '\r')
        arr.length - 1 else arr.length
      new String(arr, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    }

    // resync after a malformed record: drop lines until the next version
    // line (or EOF) — one bad record quarantines alone, the rest of the
    // file still parses. Returns the version line to process next.
    private def resyncTo(l0: String): String = {
      var l = l0
      while (l != null && !l.startsWith("WARC/")) l = readLine()
      l
    }

    private var idx = 0L
    private var pending: WarcRecord = null
    private var truncationChecked = false

    private def emit(r: WarcRecord): WarcRecord = { idx += 1; r }
    private def quarantined(err: String): WarcRecord =
      emit(WarcRecord(file, idx, None, None, None, None, None, None, Some(err)))

    private var line =
      if (terminalErr != null) null
      else try readLine() catch {
        case e: java.io.IOException => terminalErr = ioMsg(e); null
      }

    // advance to the next record (good or quarantined), or EOF. The whole
    // walk is fenced against IOException (a corrupt gzip member mid-stream
    // throws ZipException from in.read(), not just EOF): the contract is
    // ONE quarantined row for the unreadable remainder, never a failed
    // task — the stream cannot be trusted past the throw, so the error row
    // is terminal.
    private def ioMsg(e: java.io.IOException): String =
      "io error (stream unreadable past this point): " +
        s"${e.getClass.getSimpleName}: ${e.getMessage}"

    private def advance(): Unit = {
      pending = null
      if (terminalErr != null) {
        pending = quarantined(terminalErr); terminalErr = null
        truncationChecked = true // the stream is broken, not cleanly ended
        in.close()
        return
      }
      try advanceLoop() catch {
        case e: java.io.IOException =>
          if (pending == null) pending = quarantined(ioMsg(e))
          else terminalErr = ioMsg(e)
          line = null
          truncationChecked = true
      }
      if (pending == null && line == null && gz != null && !truncationChecked) {
        // clean EOF of a gzip stream: verify every compressed byte was
        // actually inflated — OpenJDK treats an unreadable next member
        // header as EOF (readTrailer swallows the parse failure), silently
        // dropping the file's tail. The final member's 8-byte trailer is
        // read AROUND the inflater, so a clean end still reports up to 8
        // "remaining" bytes; anything beyond that is a dropped tail.
        // (Best-effort: a damaged tail shorter than a gzip header can be
        // fully consumed by the swallowed header probe and pass.)
        truncationChecked = true
        val leftover = gz.unconsumed.toLong + raw.available().toLong
        if (leftover > 8)
          pending = quarantined(s"gzip member boundary damaged: ~${leftover - 8} " +
            "compressed byte(s) left undecoded at stream end")
      }
      if (pending == null) in.close()
    }

    private def advanceLoop(): Unit = {
      while (pending == null && line != null) {
        if (line.isEmpty) line = readLine() // inter-record blank separators
        else if (!line.startsWith("WARC/")) {
          pending = quarantined(s"expected a WARC/ version line, got: ${line.take(80)}")
          line = resyncTo(readLine())
        } else {
          // header block: Name: value lines up to the first empty line
          val headers = scala.collection.mutable.Map.empty[String, String]
          var hline = readLine()
          var badHeader: Option[String] = None
          while (hline != null && hline.nonEmpty && badHeader.isEmpty) {
            val colon = hline.indexOf(':')
            if (colon <= 0)
              badHeader = Some(s"malformed header line: ${hline.take(80)}")
            else {
              headers.put(hline.substring(0, colon).trim.toLowerCase,
                hline.substring(colon + 1).trim)
              hline = readLine()
            }
          }
          val clen = headers.get("content-length").flatMap(v => v.toLongOption)
          if (badHeader.nonEmpty) {
            pending = quarantined(badHeader.get); line = resyncTo(readLine())
          } else if (clen.isEmpty || clen.exists(c => c < 0 || c > Int.MaxValue)) {
            // >2 GiB single records exceed the JVM byte-array bound (and
            // the WARC ecosystem's own rotation convention) — quarantine,
            // don't wrap
            pending = quarantined("missing or invalid Content-Length: "
              + headers.getOrElse("content-length", "<absent>"))
            line = resyncTo(readLine())
          } else {
            val want = clen.get
            val payload = new Array[Byte](want.toInt)
            val got = try { in.readFully(payload); want } catch {
              case _: java.io.EOFException => -1L
            }
            if (got < 0) {
              pending = quarantined(s"truncated payload: expected $want bytes, hit EOF")
              line = null // EOF — nothing left to resync to
            } else {
              pending = emit(WarcRecord(file, idx,
                headers.get("warc-type"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                Some(want), Some(payload), None))
              line = readLine()
            }
          }
        }
      }
    }

    advance()
    override def hasNext: Boolean = pending != null
    override def next(): WarcRecord = {
      if (pending == null) throw new NoSuchElementException("exhausted WARC iterator")
      val r = pending
      advance()
      r
    }
  }
}
