package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.10): media as opaque
  * `binary` columns bundled with typed metadata in a struct — the
  * layout a 100 TB image/audio corpus uses (bytes + sidecar metadata in
  * one row, partition-pruned by metadata, bytes only materialized for
  * surviving rows).
  *
  * The container has no image/audio codecs, so the decode step is a
  * STUB: `decodeStub` derives deterministic pseudo-features (byte
  * length, digest, head byte) instead of real pixels. Everything
  * around it — the binary column, the struct schema, the
  * per-partition batch iteration, pruning — is real and tested. In
  * production the stub body is replaced by a codec call; the Spark
  * plumbing (schema, partitioning, batch shape) is unchanged.
  */
object Multimodal {

  /** Assemble the multimodal row: payload bytes + typed metadata
    * struct. documents.text stands in for the media payload. */
  def assemble(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("lang").as("lang"),
        col("source").as("source"),
        col("n_chars").as("n_chars"),
        lit("text/plain").as("mime")).as("meta"))

  /** The decode/feature-extract stub, applied per partition over the
    * binary payloads via mapPartitions (the Scala analog of a
    * mapInPandas batch UDF: one iterator of rows per partition, so a
    * real codec could amortize per-batch setup). Deterministic fake
    * features; signature and batch shape are production-real. */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    val mm = assemble(spark, dir)
    import spark.implicits._
    val decoded = mm
      .select(col("doc_id"), col("payload"), col("meta.lang").as("lang"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        // ??? <- real codec goes here; deterministic fake for offline CI
        batch.map { case (id, bytes, lang) =>
          val head = if (bytes.nonEmpty) bytes(0).toLong & 0xff else -1L
          (id, bytes.length.toLong, head, lang)
        }
      }
      .toDF("doc_id", "byte_len", "head_byte", "lang")
    decoded.orderBy(col("doc_id"))
  }

  val decodeStubSql: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS head_byte,
      |       lang
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Metadata-first pruning: filter + project on the struct metadata
    * without touching payload bytes (Catalyst prunes the binary column
    * out of the scan — the point of the bytes+metadata layout). */
  def metaPruning(spark: SparkSession, dir: String): DataFrame =
    assemble(spark, dir)
      .filter(col("meta.lang") === "en" && col("meta.n_chars") > 200)
      .select(
        col("doc_id"),
        col("meta.source").as("source"),
        col("meta.n_chars").as("n_chars"),
        col("meta.mime").as("mime"))
      .orderBy(col("doc_id"))

  val metaPruningSql: String =
    """SELECT doc_id, source, n_chars, 'text/plain' AS mime
      |FROM documents
      |WHERE lang = 'en' AND n_chars > 200
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling stub: take every k-th byte of the payload (the
    * shape of video frame sampling), emit sample digest + stats.
    * Pure built-ins over the binary column. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 16
    // loop bound and reported length are both CHARACTER-based,
    // matching the char-positional substring sampling (a byte-based
    // bound would diverge from the oracle on multibyte text)
    Tables.documents(spark, dir)
      .withColumn("n", length(col("text")))
      .withColumn("sample", concat_ws("",
        transform(sequence(lit(0), expr(s"(n - 1) div $k")),
          i => substring(col("text"), (i * k + 1).cast("int"), lit(1)))))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_chars_total"),
        length(col("sample")).cast("long").as("n_samples"),
        md5(col("sample").cast("binary")).as("sample_md5"))
      .orderBy(col("doc_id"))
  }

  val frameSampleSql: String =
    """SELECT doc_id,
      |       CAST(length(text) AS BIGINT) AS n_chars_total,
      |       CAST(length(sample) AS BIGINT) AS n_samples,
      |       md5(sample) AS sample_md5
      |FROM (
      |  SELECT doc_id, text,
      |         array_to_string(list_transform(range((length(text) - 1) // 16 + 1),
      |           i -> substring(text, CAST(i * 16 + 1 AS INTEGER), 1)), '') AS sample
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Feature extraction over the payload: a 16-bin histogram of
    * character codes — the shape of a per-item feature vector computed
    * from raw bytes (real computation, not a stub; engine-portable
    * integer arithmetic). */
  def byteHistogram(spark: SparkSession, dir: String): DataFrame = {
    // Spark's split("") keeps a trailing empty element (Java split
    // semantics with limit -1) — drop it so binning matches DuckDB's
    // string_split exactly
    val chars = filter(split(col("text"), ""), c => c =!= "")
    val bins = (0 until 16).map { b =>
      size(filter(chars, c => ascii(c) % 16 === b)).cast("long").as(f"bin_$b%02d")
    }
    Tables.documents(spark, dir)
      .select((col("doc_id") +: bins): _*)
      .orderBy(col("doc_id"))
  }

  val byteHistogramSql: String = {
    val bins = (0 until 16)
      .map(b => f"CAST(len(list_filter(chars, c -> ascii(c) %% 16 = $b)) AS BIGINT) AS bin_$b%02d")
      .mkString(",\n      |       ")
    s"""SELECT doc_id,
       |       $bins
       |FROM (SELECT doc_id, string_split(text, '') AS chars FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Resize stub shape: normalize every payload to a fixed length
    * (truncate or right-pad), emit digest + dimensions — the
    * fixed-shape-tensor normalization step of an image pipeline. */
  def resizePayload(spark: SparkSession, dir: String): DataFrame = {
    val target = 96
    Tables.documents(spark, dir)
      .withColumn("resized", rpad(substring(col("text"), 1, target), target, " "))
      .select(
        col("doc_id"),
        length(col("resized")).cast("long").as("out_len"),
        md5(col("resized").cast("binary")).as("resized_md5"),
        (length(col("text")) > target).as("was_truncated"))
      .orderBy(col("doc_id"))
  }

  val resizePayloadSql: String =
    """SELECT doc_id,
      |       CAST(length(resized) AS BIGINT) AS out_len,
      |       md5(resized) AS resized_md5,
      |       length(text) > 96 AS was_truncated
      |FROM (SELECT doc_id, text,
      |             rpad(substring(text, 1, 96), 96, ' ') AS resized
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** REAL container-header decoding — the part of "image decode"
    * that needs byte arithmetic, not a codec: parse width / height /
    * bit depth / color type out of a PNG IHDR with pure codegen
    * expressions (binary substring → hex → base-16 conv, big-endian
    * uint32s at their spec offsets; magic validated against the
    * 8-byte PNG signature). At 100 TB this is how image corpora are
    * FILTERED — dimension/type predicates run as a map-only scan
    * over the first 26 bytes, and only surviving rows ever reach the
    * (expensive, codec-bound) pixel decode seam (`decodeStub`).
    *
    * The payloads are valid PNG headers synthesized from document
    * metadata (no codecs in the container ⇒ no real image bytes);
    * the oracle states the metadata directly, so the check is the
    * encode∘decode round-trip: a mis-parsed offset or endianness
    * breaks the match. */
  /** The parser itself, reusable over any binary column holding PNG
    * bytes: a struct of (magic_ok, width, height, bit_depth,
    * color_type) read at the IHDR spec offsets. */
  def parsePngHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be(pos: Int, len: Int) =
      conv(hex(substring(payload, pos, len)), 16, 10).cast("long")
    struct(
      (hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A")).as("magic_ok"),
      be(17, 4).as("width"), be(21, 4).as("height"),
      be(25, 1).as("bit_depth"), be(26, 1).as("color_type"))
  }

  def pngHeader(spark: SparkSession, dir: String): DataFrame = {
    val w = pmod(col("n_chars"), lit(1024)).cast("long")
    val h = pmod(col("doc_id"), lit(768)).cast("long")
    // PNG signature + IHDR chunk header + big-endian dims + depth 8,
    // truecolor (2), default compression/filter/interlace
    val png = unhex(concat(
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0802000000")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), parsePngHeader(png).as("p"))
      .select(col("doc_id"), col("p.magic_ok").as("magic_ok"),
        col("p.width").as("width"), col("p.height").as("height"),
        col("p.bit_depth").as("bit_depth"), col("p.color_type").as("color_type"))
      .orderBy(col("doc_id"))
  }

  val pngHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(n_chars % 1024 AS BIGINT) AS width,
      |       CAST(doc_id % 768 AS BIGINT) AS height,
      |       CAST(8 AS BIGINT) AS bit_depth,
      |       CAST(2 AS BIGINT) AS color_type
      |FROM documents ORDER BY doc_id""".stripMargin

  /** WAV/RIFF header decode — the audio-modality sibling of
    * [[pngHeader]], and the little-endian counterpart to its
    * big-endian parse: every multi-byte field in a RIFF container is
    * LE, so the reader reverses the byte order before the hex→long
    * conversion (a wrong endianness here produces wildly wrong sample
    * rates — exactly what the oracle round-trip catches). Same scale
    * role as the PNG path: rate/channel/duration predicates over a
    * 100 TB audio corpus run as a map-only scan of the first 44
    * header bytes, and only surviving rows reach the codec seam. */
  def parseWavHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // little-endian uint at 1-based byte offset: per-byte hex digits
    // concatenated in REVERSE byte order, then base-16 → long
    def le(pos: Int, len: Int) =
      conv(concat((len to 1 by -1).map(i => hex(substring(payload, pos + i - 1, 1))): _*),
        16, 10).cast("long")
    struct(
      (hex(substring(payload, 1, 4)) === lit("52494646") &&
        hex(substring(payload, 9, 4)) === lit("57415645")).as("magic_ok"),
      (le(21, 2) === 1).as("pcm_ok"),
      le(23, 2).as("channels"),
      le(25, 4).as("sample_rate"),
      le(35, 2).as("bits_per_sample"),
      le(41, 4).as("data_bytes"), {
        // integer-exact duration: subtract the remainder first so the
        // double division is exact (Column./ is true division; a raw
        // floor() could flip on a boundary ulp vs the oracle's `//`)
        val num = le(41, 4) * 1000
        val den = le(29, 4)
        ((num - pmod(num, den)) / den).cast("long").as("duration_ms")
      })
  }

  def wavHeader(spark: SparkSession, dir: String): DataFrame = {
    val channels = (lit(1) + pmod(col("doc_id"), lit(2))).cast("long")
    val rate = (lit(8000) + pmod(col("n_chars"), lit(8)) * 4000).cast("long")
    val blockAlign = channels * 2 // 16-bit PCM
    val byteRate = rate * blockAlign
    val dataBytes = col("n_chars").cast("long") * blockAlign
    // synthesized canonical 44-byte PCM header: RIFF<size>WAVE fmt␣
    // <16, fmt=1, channels, rate, byteRate, blockAlign, bits> data<size>
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val wav = unhex(concat(
      lit("52494646"), leHex(dataBytes + 36, 4), lit("57415645"),
      lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),
      leHex(channels, 2), leHex(rate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(lit(16L), 2),
      lit("64617461"), leHex(dataBytes, 4)))
    // int-array prefix decode (the jpeg planning-cost fix, r11): the
    // payload expression is analyzed ONCE into a bytes column; every
    // field below is a cheap element_at over that attribute, instead
    // of each of 7 struct fields re-embedding the whole synthesis +
    // per-byte hex→conv chain (~1 s of flat analyzer time at ANY sf)
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(wav, 44).as("bytes"))
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    bytes.select(col("doc_id"),
        (le(1, 4) === 0x46464952L && le(9, 4) === 0x45564157L).as("magic_ok"),
        (le(21, 2) === 1L).as("pcm_ok"),
        le(23, 2).as("channels"),
        le(25, 4).as("sample_rate"),
        le(35, 2).as("bits_per_sample"),
        le(41, 4).as("data_bytes"), {
          // integer-exact duration (see parseWavHeader note)
          val num = le(41, 4) * 1000
          val den = le(29, 4)
          ((num - pmod(num, den)) / den).cast("long").as("duration_ms")
        })
      .orderBy(col("doc_id"))
  }

  val wavHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS pcm_ok,
      |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |       CAST(8000 + (n_chars % 8) * 4000 AS BIGINT) AS sample_rate,
      |       CAST(16 AS BIGINT) AS bits_per_sample,
      |       CAST(n_chars * (1 + doc_id % 2) * 2 AS BIGINT) AS data_bytes,
      |       CAST(n_chars * (1 + doc_id % 2) * 2 * 1000
      |            // ((8000 + (n_chars % 8) * 4000) * (1 + doc_id % 2) * 2) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BMP (BITMAPINFOHEADER) parse — the third container codec beside
    * PNG (big-endian) and WAV (little-endian): 'BM' magic, LE dims
    * at fixed offsets, and the format's one real subtlety — rows pad
    * to 4-byte alignment, so the actual scan-line stride is
    * ((width·3 + 3) div 4)·4, not width·3. The parse re-derives the
    * stride and the pixel-array size from the parsed width/height,
    * and the synthesizer (canonical 54-byte header from doc fields)
    * makes the oracle a full round-trip: any endianness or
    * alignment slip breaks the hash. Same scale role as the other
    * header ops: dimension predicates prune a 100 TB image corpus
    * map-side before the codec seam. */
  def parseBmpHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def le(pos: Int, len: Int) =
      conv(concat((len to 1 by -1).map(i => hex(substring(payload, pos + i - 1, 1))): _*),
        16, 10).cast("long")
    val width = le(19, 4)
    val rowBytes = {
      val raw = width * 3 + 3
      raw - pmod(raw, lit(4L))
    }
    struct(
      (hex(substring(payload, 1, 2)) === lit("424D")).as("magic_ok"),
      (le(31, 4) === 0L).as("rgb_ok"),
      width.as("width"),
      le(23, 4).as("height"),
      le(29, 2).as("bit_count"),
      rowBytes.as("row_bytes"),
      (rowBytes * le(23, 4)).as("data_bytes"))
  }

  def bmpHeader(spark: SparkSession, dir: String): DataFrame = {
    val width = (lit(16) + pmod(col("doc_id"), lit(64))).cast("long")
    val height = (lit(16) + pmod(col("n_chars"), lit(48))).cast("long")
    val raw = width * 3 + 3
    val rowBytes = raw - pmod(raw, lit(4L))
    val dataBytes = rowBytes * height
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    // canonical 54-byte BM header: BITMAPFILEHEADER + BITMAPINFOHEADER
    val bmp = unhex(concat(
      lit("424D"), leHex(dataBytes + 54, 4), lit("00000000"), leHex(lit(54L), 4),
      leHex(lit(40L), 4), leHex(width, 4), leHex(height, 4),
      leHex(lit(1L), 2), leHex(lit(24L), 2), leHex(lit(0L), 4),
      leHex(dataBytes, 4), leHex(lit(2835L), 4), leHex(lit(2835L), 4),
      leHex(lit(0L), 4), leHex(lit(0L), 4)))
    // int-array prefix decode — same flat-analyzer-cost fix as the
    // wav path (each struct field re-embedded the synthesis tree)
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(bmp, 54).as("bytes"))
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    val pw = le(19, 4)
    val pRowBytes = { val r = pw * 3 + 3; r - pmod(r, lit(4L)) }
    bytes.select(col("doc_id"),
        (le(1, 2) === 0x4D42L).as("magic_ok"),
        (le(31, 4) === 0L).as("rgb_ok"),
        pw.as("width"),
        le(23, 4).as("height"),
        le(29, 2).as("bit_count"),
        pRowBytes.as("row_bytes"),
        (pRowBytes * le(23, 4)).as("data_bytes"))
      .orderBy(col("doc_id"))
  }

  val bmpHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS rgb_ok,
      |       CAST(16 + doc_id % 64 AS BIGINT) AS width,
      |       CAST(16 + n_chars % 48 AS BIGINT) AS height,
      |       CAST(24 AS BIGINT) AS bit_count,
      |       CAST(((16 + doc_id % 64) * 3 + 3) // 4 * 4 AS BIGINT) AS row_bytes,
      |       CAST((((16 + doc_id % 64) * 3 + 3) // 4 * 4) * (16 + n_chars % 48) AS BIGINT)
      |         AS data_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** GIF89a logical-screen-descriptor decode — the fourth header
    * codec (PNG big-endian, WAV/BMP little-endian, GIF adds a PACKED
    * BIT FIELD: one byte carrying the global-color-table flag, color
    * resolution, and the table-size exponent N, where the table is
    * 2^(N+1) RGB entries = 3·2^(N+1) bytes — the offset every real
    * GIF parser must compute before it can find the first image
    * block). Same contract as the siblings: the payload is
    * SYNTHESIZED from (doc_id, n_chars) with the exact byte layout,
    * the parser is pure codegen byte arithmetic (substring + conv +
    * div/mod bit unpacking — no UDF), and the oracle replays the
    * generating arithmetic. Bit unpacking stays integer: flag =
    * packed div 128, N = packed mod 8, entries = 2 << N. */
  def parseGifHeader(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def le(pos: Int, len: Int) =
      conv(concat((len to 1 by -1).map(i => hex(substring(payload, pos + i - 1, 1))): _*),
        16, 10).cast("long")
    val packed = le(11, 1)
    val sizeN = pmod(packed, lit(8L))
    val entries = pow(lit(2.0), sizeN + lit(1L)).cast("long") // 2^(N+1), N<=7: exact
    struct(
      (hex(substring(payload, 1, 6)) === lit("474946383961")).as("magic_ok"),
      (packed >= 128L).as("gct_flag"),
      le(7, 2).as("width"),
      le(9, 2).as("height"),
      entries.as("gct_entries"),
      (when(packed >= 128L, entries * 3L).otherwise(lit(0L))).as("gct_bytes"))
  }

  def gifHeader(spark: SparkSession, dir: String): DataFrame = {
    val width = (lit(16) + pmod(col("doc_id"), lit(256))).cast("long")
    val height = (lit(16) + pmod(col("n_chars"), lit(128))).cast("long")
    val sizeN = pmod(col("doc_id"), lit(8)).cast("long")
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    // GIF89a magic + LSD: width u16le, height u16le, packed
    // (GCT=1, color-res=7, sort=0, sizeN), bg index 0, aspect 0
    val gif = unhex(concat(
      lit("474946383961"), leHex(width, 2), leHex(height, 2),
      leHex(lit(240L) + sizeN, 1), lit("00"), lit("00")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), parseGifHeader(gif).as("p"))
      .select(col("doc_id"), col("p.magic_ok").as("magic_ok"),
        col("p.gct_flag").as("gct_flag"), col("p.width").as("width"),
        col("p.height").as("height"), col("p.gct_entries").as("gct_entries"),
        col("p.gct_bytes").as("gct_bytes"))
      .orderBy(col("doc_id"))
  }

  val gifHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS gct_flag,
      |       CAST(16 + doc_id % 256 AS BIGINT) AS width,
      |       CAST(16 + n_chars % 128 AS BIGINT) AS height,
      |       CAST(2 * power(2, doc_id % 8) AS BIGINT) AS gct_entries,
      |       CAST(6 * power(2, doc_id % 8) AS BIGINT) AS gct_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** PCM sample-level FEATURE EXTRACTION — past the header, into the
    * payload: peak amplitude, total energy, and RMS loudness over a
    * 16-sample 16-bit LE PCM window (the audio-quality gate a speech
    * corpus runs before transcription: silence/clipping detection).
    * The payload is synthesized with a deterministic amplitude law
    * (doc_id·31 + j·97 mod 4001, centered — two's-complement encoded
    * like real PCM), and the PARSER does the real work: 16-bit LE
    * reads at data offset + 2j, sign reconstruction (raw ≥ 2¹⁵ ⇒
    * raw − 2¹⁶), integer Σv² — all codegen byte arithmetic, no UDF.
    * RMS is the ONE double (√(Σv²/K) of exact integers, identical
    * both engines, rounded to milli-units). The oracle replays the
    * generating law — so a sign bug, endianness slip, or off-by-one
    * offset in the parser cannot hash-match. 16 samples ⇒ 32
    * substring+conv terms: a fixed-width codegen window, the
    * documented bounded-decode contract of this family. */
  private val rmsSamples = 16

  def audioRms(spark: SparkSession, dir: String): DataFrame = {
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val dataBytes = lit(rmsSamples.toLong * 2)
    def amp(j: Int) =
      pmod(col("doc_id") * 31 + lit(j * 97), lit(4001L)) - lit(2000L)
    val payload = concat((0 until rmsSamples)
      .map(j => leHex(pmod(amp(j) + lit(65536L), lit(65536L)), 2)): _*)
    val wav = unhex(concat(
      lit("52494646"), leHex(dataBytes + 36, 4), lit("57415645"),
      lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2),
      leHex(lit(1L), 2), leHex(lit(8000L), 4), leHex(lit(16000L), 4),
      leHex(lit(2L), 2), leHex(lit(16L), 2),
      lit("64617461"), leHex(dataBytes, 4), payload))
    def sampleAt(payloadCol: org.apache.spark.sql.Column, j: Int) = {
      val raw = conv(concat(hex(substring(payloadCol, 45 + 2 * j + 1, 1)),
        hex(substring(payloadCol, 45 + 2 * j, 1))), 16, 10).cast("long")
      when(raw >= 32768L, raw - 65536L).otherwise(raw)
    }
    // materialize the synthesized bytes BEHIND AN EAGER BOUNDARY:
    // CollapseProject would otherwise inline the ~37-term payload
    // concat into every one of the ~50 parser terms (16 samples ×
    // energy + peak + rms reuse), blowing the generated method past
    // the codegen size limit and into interpreted re-evaluation —
    // measured 27 s for 5 000 rows at sf0.1, 0.3 s with the boundary.
    // In production the payload IS a stored column, so the boundary
    // models reality, not a workaround.
    val synth = Tables.documents(spark, dir)
      .select(col("doc_id"), wav.as("wav")).localCheckpoint()
    val samples = (0 until rmsSamples).map(j => sampleAt(col("wav"), j))
    val energy = samples.map(s => s * s).reduce(_ + _)
    val peak = greatest(samples.map(abs): _*)
    synth
      .select(col("doc_id"), lit(rmsSamples.toLong).as("n_samples"),
        peak.as("peak_abs"), energy.as("energy"),
        round(sqrt(energy.cast("double") / rmsSamples) * 1000).cast("long")
          .as("rms_milli"))
      .orderBy(col("doc_id"))
  }

  val audioRmsSql: String = {
    val amps = (0 until rmsSamples)
      .map(j => s"((doc_id * 31 + ${j * 97}) % 4001) - 2000")
    s"""SELECT doc_id, CAST($rmsSamples AS BIGINT) AS n_samples,
       |       CAST(greatest(${amps.map(a => s"abs($a)").mkString(", ")}) AS BIGINT) AS peak_abs,
       |       CAST(${amps.map(a => s"($a) * ($a)").mkString(" + ")} AS BIGINT) AS energy,
       |       CAST(round(sqrt(CAST(${amps.map(a => s"($a) * ($a)").mkString(" + ")} AS DOUBLE)
       |                       / $rmsSamples) * 1000) AS BIGINT) AS rms_milli
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // JPEG SOF decode — variable-length segment walking
  // ---------------------------------------------------------------

  /** JPEG/JFIF frame-header decode — the fifth header codec, and the
    * one the fixed-offset siblings can't represent: JPEG dimensions
    * live in an SOF segment at NO fixed offset — a parser must WALK
    * the marker stream (FF xx, 2-byte big-endian length that counts
    * itself but not the marker) over whatever APPn/COM metadata
    * precedes the frame. The synthesized stream forces that: SOI →
    * APP0/JFIF (fixed 16) → COM whose length VARIES per document
    * (2 + 1 + n_chars mod 13) → SOF0 carrying
    * height = 1 + n_chars mod 997, width = 1 + doc_id mod 1499.
    * The parser is a 4-step unrolled marker walk in pure codegen
    * byte arithmetic (substr/hex/conv; `when` keeps the position
    * once SOF0/1/2 is found), so a fixed-offset shortcut or an
    * off-by-one in the length convention breaks the differential
    * hash on every document. Bounded-walk contract: real JFIF files
    * put SOF within the first few segments; production raises the
    * unroll constant. The synthesized payload is localCheckpoint-
    * materialized first — the audioRms codegen-blowup lesson; in
    * production the payload IS a stored column. */
  /** Walk cost note (two lessons measured): (1) folding the whole
    * walk into ONE Column duplicates each position expression ~6x per
    * level — a ~6^4-node tree built at CONSTRUCTION time that Catalyst
    * then spends ~28 s (data-size-independent) analyzing/optimizing;
    * (2) substr->hex->conv per byte lookup is codegen-heavy. The shape
    * real parsers use, expressed relationally: decode the bounded
    * header PREFIX into an int-array COLUMN once (53 linear conv
    * chains), then advance the walk ONE COLUMN PER STEP — each step
    * references the previous position as a plain attribute (cheap, so
    * CollapseProject correctly declines to re-inline it into its 6
    * uses). Measured 28 s -> sub-second at sf0.1. */
  def jpegPrefix(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    prefixBytes(payload, 53)

  /** Decode the first `n` payload bytes into ONE long-array column —
    * the shared planning-cost idiom (see the jpeg note above): the
    * payload expression is analyzed once, and every downstream field
    * reads plain `element_at` over the resulting attribute.
    *
    * Execution-cost subtlety (r11): the payload expression must sit
    * OUTSIDE the higher-order-function lambda. A first cut did
    * `transform(sequence(1, n), i => conv(hex(payload.substr(i, 1))))`
    * — CollapseProject inlines the (single-use) synthesis tree into
    * the lambda body, which the transform then re-evaluates once PER
    * ELEMENT: 54 × ~30 string ops per row, measured ~1 ms/row. Here
    * the payload is hexed ONCE per row and split into 2-char byte
    * chunks (`(?<=\G..)` — a zero-width match every two chars), so
    * the lambda touches only tiny strings. This also retires the
    * jpeg path's localCheckpoint workaround — a lineage cut that
    * materializes the whole scan, which is exactly what a 100 TB
    * streaming pass cannot afford. */
  /** MP3 (MPEG-1 Layer III) frame-header parse — the EIGHTH codec,
    * and the first whose fields are INDEX-CODED: bitrate and sample
    * rate live in the header as 4-/2-bit table indices, not values,
    * so the decode needs the literal ISO tables (both engines index
    * the same literals). Header: 32-bit BE word = 11 sync bits,
    * version(2)=MPEG1, layer(2)=III, protection(1), bitrate idx(4),
    * samplerate idx(2), padding(1), private(1), channel mode(2).
    * Frame length follows the spec formula 144000·kbps // rate
    * + padding — exact integer division in both engines. The payload
    * contract as for WAV/BMP: the synthesized header IS the spec and
    * the oracle replays the generator arithmetic. Scale: int-array
    * prefix decode (one analyzed bytes column, one cheap projection
    * per field — the r10/r11 flat-planner-cost discipline), pure
    * codegen byte arithmetic, map-only. */
  def mp3Header(spark: SparkSession, dir: String): DataFrame = {
    val brIdx = (lit(1) + pmod(col("doc_id"), lit(14))).cast("long")
    val srIdx = pmod(col("n_chars"), lit(3)).cast("long")
    val pad = pmod(col("doc_id"), lit(2)).cast("long")
    val mode = pmod(col("n_chars"), lit(4)).cast("long")
    // 0xFFFB-style MPEG1 Layer III header word, fields shifted in
    val word = lit(0x7FFL * (1L << 21)) + lit(3L * (1L << 19)) +
      lit(1L * (1L << 17)) + lit(1L << 16) +
      brIdx * (1L << 12) + srIdx * (1L << 10) + pad * (1L << 9) +
      mode * (1L << 6)
    def beHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    val mp3 = unhex(beHex(word, 4))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(mp3, 4).as("bytes"))
    val kbpsTable = typedLit(Seq(0L, 32L, 40L, 48L, 56L, 64L, 80L, 96L,
      112L, 128L, 160L, 192L, 224L, 256L, 320L))
    val rateTable = typedLit(Seq(44100L, 48000L, 32000L))
    val hdr = beAt(col("bytes"), 1, 4)
    def field(shift: Int, bits: Int) =
      pmod(shiftright(hdr, shift), lit(1L << bits))
    bytes
      .select(col("doc_id"),
        (field(21, 11) === 0x7FFL).as("sync_ok"),
        (field(19, 2) === 3L && field(17, 2) === 1L).as("mpeg1_l3_ok"),
        field(12, 4).as("bitrate_idx"),
        element_at(kbpsTable, field(12, 4).cast("int") + 1).as("bitrate_kbps"),
        element_at(rateTable, field(10, 2).cast("int") + 1).as("sample_rate"),
        field(9, 1).as("padding"),
        field(6, 2).as("channel_mode"))
      .withColumn("frame_bytes",
        expr("(144000 * bitrate_kbps) div sample_rate") + col("padding"))
      .orderBy(col("doc_id"))
  }

  val mp3HeaderSql: String =
    """SELECT doc_id, TRUE AS sync_ok, TRUE AS mpeg1_l3_ok,
      |       CAST(1 + doc_id % 14 AS BIGINT) AS bitrate_idx,
      |       CAST([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320]
      |         [CAST(1 + doc_id % 14 AS BIGINT) + 1] AS BIGINT) AS bitrate_kbps,
      |       CAST([44100,48000,32000][CAST(n_chars % 3 AS BIGINT) + 1] AS BIGINT)
      |         AS sample_rate,
      |       CAST(doc_id % 2 AS BIGINT) AS padding,
      |       CAST(n_chars % 4 AS BIGINT) AS channel_mode,
      |       CAST(144000 * ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320]
      |                  [CAST(1 + doc_id % 14 AS BIGINT) + 1])
      |         // ([44100,48000,32000][CAST(n_chars % 3 AS BIGINT) + 1])
      |         + doc_id % 2 AS BIGINT) AS frame_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  def prefixBytes(payload: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    transform(split(hex(payload.substr(lit(1), lit(n))), "(?<=\\G..)"),
      h => conv(h, 16, 10).cast("long"))

  /** Little-endian unsigned int of `len` bytes at 1-based `pos` over
    * a [[prefixBytes]] array — pure shift-add on attributes. */
  def leAt(bytes: org.apache.spark.sql.Column, pos: Int, len: Int): org.apache.spark.sql.Column =
    (0 until len).map(i => element_at(bytes, pos + i) * lit(1L << (8 * i)))
      .reduce(_ + _)

  /** Big-endian sibling of [[leAt]]. */
  def beAt(bytes: org.apache.spark.sql.Column, pos: Int, len: Int): org.apache.spark.sql.Column =
    (0 until len).map(i => element_at(bytes, pos + i) * lit(1L << (8 * (len - 1 - i))))
      .reduce(_ + _)

  private def jbyte(bytes: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(bytes, p.cast("int"))

  private def jbe16(bytes: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    jbyte(bytes, p) * 256L + jbyte(bytes, p + 1L)

  private def jIsSof(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    m === 65472L || m === 65473L || m === 65474L // FFC0/C1/C2

  /** One marker-walk step: stay once an SOF marker is under the
    * cursor, else skip the segment by its big-endian length (which
    * counts itself but not the marker). */
  def jpegStep(bytes: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(jIsSof(jbe16(bytes, p)), p)
      .otherwise(p + 2L + jbe16(bytes, p + 2L))

  /** The SOF payload fields at a settled walk position. */
  def jpegExtract(bytes: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      jIsSof(jbe16(bytes, p)).as("sof_found"),
      p.as("sof_offset"),
      jbyte(bytes, p + 4L).as("precision"),
      jbe16(bytes, p + 5L).as("height"),
      jbe16(bytes, p + 7L).as("width"),
      jbyte(bytes, p + 9L).as("n_components"))

  def jpegHeader(spark: SparkSession, dir: String): DataFrame = {
    def beHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((n - 1 to 0 by -1).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val comLen = (lit(1L) + pmod(col("n_chars"), lit(13L))) // payload bytes
    val height = lit(1L) + pmod(col("n_chars"), lit(997L))
    val width = lit(1L) + pmod(col("doc_id"), lit(1499L))
    // COM payload: comLen copies of one doc-derived letter byte
    val comByte = lpad(hex(lit(65L) + pmod(col("doc_id"), lit(26L))), 2, "0")
    val jpeg = unhex(concat(
      lit("FFD8"),                                    // SOI
      lit("FFE00010"), lit("4A46494600"),             // APP0 len 16, "JFIF\0"
      lit("0101"), lit("00"), lit("00010001"), lit("0000"),
      lit("FFFE"), beHex(comLen + 2L, 2),             // COM, len counts itself
      repeat(comByte, 13).substr(lit(1), (comLen * 2L).cast("int")),
      lit("FFC0"), lit("0011"), lit("08"),            // SOF0, len 17, precision 8
      beHex(height, 2), beHex(width, 2),
      lit("03"), lit("012200"), lit("021101"), lit("031101"),
      lit("FFD9")))                                   // EOI
    // no lineage cut needed: prefixBytes evaluates the synthesis
    // expression once per row (see its scaladoc) — the former
    // localCheckpoint materialized the whole scan, a non-starter for
    // a 100 TB streaming pass
    val synth = Tables.documents(spark, dir)
      .select(col("doc_id"), jpeg.as("jpeg"))
    // 4-step unrolled walk from the first post-SOI marker (1-based 3),
    // ONE COLUMN PER STEP — see the walk cost note above
    val walked = (1 to 4).foldLeft(
        synth.select(col("doc_id"), jpegPrefix(col("jpeg")).as("bytes"),
          lit(3L).as("p0"))) { (df, i) =>
      df.withColumn(s"p$i", jpegStep(col("bytes"), col(s"p${i - 1}")))
    }
    walked.select(col("doc_id"), jpegExtract(col("bytes"), col("p4")).as("p"))
      .select(col("doc_id"), col("p.sof_found").as("sof_found"),
        col("p.sof_offset").as("sof_offset"), col("p.precision").as("precision"),
        col("p.height").as("height"), col("p.width").as("width"),
        col("p.n_components").as("n_components"))
      .orderBy(col("doc_id"))
  }

  // the oracle replays the GENERATING arithmetic (sof offset =
  // 2 SOI + 18 APP0 + (2 marker + 2 + payload) COM + 1 one-based)
  val jpegHeaderSql: String =
    """SELECT doc_id, TRUE AS sof_found,
      |       CAST(25 + 1 + n_chars % 13 AS BIGINT) AS sof_offset,
      |       CAST(8 AS BIGINT) AS precision,
      |       CAST(1 + n_chars % 997 AS BIGINT) AS height,
      |       CAST(1 + doc_id % 1499 AS BIGINT) AS width,
      |       CAST(3 AS BIGINT) AS n_components
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TIFF header decode — the SIXTH container codec, and the one with
    * a property none of the others exercises: the byte order is
    * DATA-DEPENDENT. A TIFF file announces its own endianness in the
    * first two bytes ('II' → little-endian, 'MM' → big-endian), and
    * every multi-byte field after that — the 42 magic, the IFD
    * offset, tag ids, LONG values — must be read in the announced
    * order. The corpus synthesizes both flavors (even doc_id → II,
    * odd → MM), so a parser that hardwires either order fails half
    * the oracle. Layout: 8-byte header, one IFD (3 entries: 256
    * ImageWidth, 257 ImageLength, 258 BitsPerSample, all type LONG),
    * next-IFD = 0. Conditional endianness is ONE `when` over the
    * already-decoded byte array — still pure codegen arithmetic. */
  def tiffHeader(spark: SparkSession, dir: String): DataFrame = {
    val width = (lit(16) + pmod(col("doc_id"), lit(1024))).cast("long")
    val height = (lit(16) + pmod(col("n_chars"), lit(512))).cast("long")
    val bits = (lit(8) * (lit(1) + pmod(col("doc_id"), lit(2)))).cast("long")
    val le = pmod(col("doc_id"), lit(2)) === 0
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    def beHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((n - 1 to 0 by -1).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    def u(v: org.apache.spark.sql.Column, n: Int) =
      when(le, leHex(v, n)).otherwise(beHex(v, n))
    def entry(tag: Long, v: org.apache.spark.sql.Column) =
      concat(u(lit(tag), 2), u(lit(4L), 2), u(lit(1L), 4), u(v, 4))
    val tiff = unhex(concat(
      when(le, lit("49492A00")).otherwise(lit("4D4D002A")),
      u(lit(8L), 4),                       // IFD starts right after the header
      u(lit(3L), 2),
      entry(256L, width), entry(257L, height), entry(258L, bits),
      u(lit(0L), 4)))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(tiff, 50).as("bytes"))
    val isLe = element_at(col("bytes"), 1) === 0x49L
    def ua(pos: Int, len: Int) =
      when(isLe, leAt(col("bytes"), pos, len)).otherwise(beAt(col("bytes"), pos, len))
    // IFD entry i (0-based) value field sits at 11 + 12*i + 8 (1-based)
    def entryVal(i: Int) = ua(11 + 12 * i + 8, 4)
    bytes.select(col("doc_id"), isLe.as("little_endian"),
        (ua(3, 2) === 42L).as("magic_ok"),
        (ua(9, 2) === 3L).as("ifd_ok"),
        entryVal(0).as("width"), entryVal(1).as("height"),
        entryVal(2).as("bits_per_sample"))
      .orderBy(col("doc_id"))
  }

  val tiffHeaderSql: String =
    """SELECT doc_id, doc_id % 2 = 0 AS little_endian, TRUE AS magic_ok, TRUE AS ifd_ok,
      |       CAST(16 + doc_id % 1024 AS BIGINT) AS width,
      |       CAST(16 + n_chars % 512 AS BIGINT) AS height,
      |       CAST(8 * (1 + doc_id % 2) AS BIGINT) AS bits_per_sample
      |FROM documents ORDER BY doc_id""".stripMargin

  /** FLAC STREAMINFO decode — the SEVENTH codec, adding the last
    * parsing mode the family lacked: SUB-BYTE bit fields. The 8-byte
    * group after the frame-size fields packs sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5) and total samples (36) —
    * none aligned to a byte boundary — so the parser reads two
    * big-endian u32s and unpacks with exact div/mod powers of two
    * (the GIF packed-byte trick scaled up to a 64-bit field, split so
    * no intermediate exceeds a long). Duration derives as exact
    * integer division, remainder subtracted first (the WAV
    * contract). */
  def flacHeader(spark: SparkSession, dir: String): DataFrame = {
    val rate = (lit(8000) + pmod(col("n_chars"), lit(8)) * 4000).cast("long")
    val channels = (lit(1) + pmod(col("doc_id"), lit(2))).cast("long")
    val bps = lit(16L)
    val total = col("n_chars").cast("long") * channels
    def beHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((n - 1 to 0 by -1).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    // hi32 = rate<<12 | (ch−1)<<9 | (bps−1)<<4 | total>>32 (0 here)
    val hi32 = rate * lit(4096L) + (channels - 1L) * lit(512L) + (bps - 1L) * lit(16L)
    val lo32 = total // total < 2^32 in this corpus; hi bits carried above
    val flac = unhex(concat(
      lit("664C6143"),                     // "fLaC"
      lit("00"), lit("000022"),            // STREAMINFO block, length 34
      lit("1000"), lit("1000"),            // min/max blocksize 4096
      lit("000000"), lit("000000"),        // min/max framesize unknown
      beHex(hi32, 4), beHex(lo32, 4)))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(flac, 26).as("bytes"))
    // 4 magic + 4 block header + 4 blocksizes + 6 framesizes = 18
    // bytes before the packed 8-byte group
    val hi = beAt(col("bytes"), 19, 4)
    val lo = beAt(col("bytes"), 23, 4)
    // bit fields by shiftright/pmod — exact powers of two, no
    // division rounding anywhere
    val rateP = shiftright(hi, 12)
    val totalP = pmod(hi, lit(16L)) * lit(4294967296L) + lo
    bytes.select(col("doc_id"),
        (beAt(col("bytes"), 1, 4) === 0x664C6143L).as("magic_ok"),
        (element_at(col("bytes"), 5) === 0L &&
          beAt(col("bytes"), 6, 3) === 34L).as("streaminfo_ok"),
        rateP.as("sample_rate"),
        (pmod(shiftright(hi, 9), lit(8L)) + 1L).as("channels"),
        (pmod(shiftright(hi, 4), lit(32L)) + 1L).as("bits_per_sample"),
        totalP.as("total_samples"), {
          val num = totalP * 1000L
          ((num - pmod(num, rateP)) / rateP).cast("long").as("duration_ms")
        })
      .orderBy(col("doc_id"))
  }

  val flacHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS streaminfo_ok,
      |       CAST(8000 + (n_chars % 8) * 4000 AS BIGINT) AS sample_rate,
      |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |       CAST(16 AS BIGINT) AS bits_per_sample,
      |       CAST(n_chars * (1 + doc_id % 2) AS BIGINT) AS total_samples,
      |       CAST(n_chars * (1 + doc_id % 2) * 1000
      |            // (8000 + (n_chars % 8) * 4000) AS BIGINT) AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // NPY tensor header (9th codec: binary magic + ASCII dict payload)
  // ---------------------------------------------------------------

  /** NPY v1.0 header decode — the TENSOR-SHARD codec (every numpy
    * array dump in an ML data lake): 6-byte magic \\x93NUMPY, version
    * bytes, LE u16 HEADER_LEN, then an ASCII Python-dict literal
    * {'descr','fortran_order','shape'} space-padded so the data
    * section starts 64-byte aligned. The new subtlety vs the other 8
    * codecs: a MIXED parse — fixed binary fields, then TEXT inside
    * binary (substring → string → regexp field extraction), then
    * arithmetic back on the parsed values (data_bytes = rows·cols·4
    * for '<f4', alignment re-check). Synth from (doc_id, n_chars);
    * oracle replays the generating arithmetic; all map-side codegen,
    * so shape/dtype predicates prune a tensor lake before any data
    * block is read. */
  def npyHeader(spark: SparkSession, dir: String): DataFrame = {
    val rows = (lit(8) + pmod(col("doc_id"), lit(32))).cast("long")
    val cols0 = (lit(16) + pmod(col("n_chars"), lit(48))).cast("long")
    val dict = concat(lit("{'descr': '<f4', 'fortran_order': False, 'shape': ("),
      rows.cast("string"), lit(", "), cols0.cast("string"), lit("), }"))
    // pad so 10 (magic+ver+hlen) + header_len ≡ 0 (mod 64); dict + pad + '\n'
    val base = length(dict) + 1
    val pad = pmod(lit(64L) - pmod(lit(10L) + base, lit(64L)), lit(64L))
    val hlen = base + pad
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val payload = unhex(concat(lit("934E554D5059"), lit("0100"),
      leHex(hlen.cast("long"), 2),
      hex(concat(dict, rpad(lit(""), 64, " ").substr(lit(1), pad.cast("int")),
        lit("\n")).cast("binary"))))
    val withBytes = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .select(col("doc_id"), col("p"), prefixBytes(col("p"), 10).as("b"))
    val phlen = leAt(col("b"), 9, 2)
    val pdict = substring(col("p"), 11, 4096).cast("string")
    val pr = regexp_extract(pdict, "'shape': \\((\\d+), (\\d+)\\)", 1).cast("long")
    val pc = regexp_extract(pdict, "'shape': \\((\\d+), (\\d+)\\)", 2).cast("long")
    withBytes.select(col("doc_id"),
        (hex(substring(col("p"), 1, 6)) === lit("934E554D5059")).as("magic_ok"),
        (leAt(col("b"), 7, 1) === 1L && leAt(col("b"), 8, 1) === 0L).as("v1_ok"),
        phlen.as("header_len"),
        regexp_extract(pdict, "'descr': '([^']+)'", 1).as("descr"),
        (regexp_extract(pdict, "'fortran_order': (\\w+)", 1) === "False")
          .as("c_order_ok"),
        pr.as("rows"), pc.as("cols"),
        (pr * pc * 4L).as("data_bytes"),
        (pmod(lit(10L) + phlen, lit(64L)) === 0L).as("aligned_ok"))
      .orderBy(col("doc_id"))
  }

  val npyHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS v1_ok,
      |       CAST((len('{''descr'': ''<f4'', ''fortran_order'': False, ''shape'': ('
      |                 || CAST(8 + doc_id % 32 AS VARCHAR) || ', '
      |                 || CAST(16 + n_chars % 48 AS VARCHAR) || '), }') + 1
      |             + (64 - (10 + len('{''descr'': ''<f4'', ''fortran_order'': False, ''shape'': ('
      |                 || CAST(8 + doc_id % 32 AS VARCHAR) || ', '
      |                 || CAST(16 + n_chars % 48 AS VARCHAR) || '), }') + 1) % 64) % 64)
      |         AS BIGINT) AS header_len,
      |       '<f4' AS descr, TRUE AS c_order_ok,
      |       CAST(8 + doc_id % 32 AS BIGINT) AS rows,
      |       CAST(16 + n_chars % 48 AS BIGINT) AS cols,
      |       CAST((8 + doc_id % 32) * (16 + n_chars % 48) * 4 AS BIGINT) AS data_bytes,
      |       TRUE AS aligned_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // gzip member header (10th codec: flag bits + variable-length field)
  // ---------------------------------------------------------------

  /** GZIP member-header decode — the WEB-CORPUS codec (every WARC/
    * crawl shard is gzip members): 1f 8b magic, CM=8 deflate, a FLG
    * BIT FIELD, LE u32 MTIME, XFL/OS, and the new subtlety vs the
    * fixed-layout codecs: a VARIABLE-LENGTH field — FNAME is
    * NUL-terminated, so the parser must SCAN for the terminator to
    * know where the deflate stream starts (header_size = 10 + name +
    * NUL). The scan is instr over the string view of the bytes —
    * still pure codegen, no UDF. Synth from doc fields (mtime =
    * 1.7e9 + doc_id); oracle replays the arithmetic. */
  def gzipHeader(spark: SparkSession, dir: String): DataFrame = {
    val mtime = (lit(1700000000L) + col("doc_id")).cast("long")
    val name = concat(lit("doc"), col("doc_id").cast("string"), lit(".txt"))
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val payload = unhex(concat(lit("1F8B"), lit("08"), lit("08"),
      leHex(mtime, 4), lit("02"), lit("03"), hex(name.cast("binary")), lit("00")))
    val withBytes = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .select(col("doc_id"), col("p"), prefixBytes(col("p"), 10).as("b"))
    val tail = substring(col("p"), 11, 4096).cast("string")
    val nulPos = instr(tail, 0.toChar.toString)
    withBytes.select(col("doc_id"),
        (leAt(col("b"), 1, 1) === 0x1FL && leAt(col("b"), 2, 1) === 0x8BL)
          .as("magic_ok"),
        (leAt(col("b"), 3, 1) === 8L).as("deflate_ok"),
        // FLG bit 3 (0x08) = FNAME present — integer bit unpack
        (pmod(shiftright(leAt(col("b"), 4, 1), 3), lit(2L)) === 1L).as("has_fname"),
        leAt(col("b"), 5, 4).as("mtime"),
        (leAt(col("b"), 10, 1) === 3L).as("os_unix"),
        substring(tail, lit(1), nulPos - 1).as("fname"),
        (lit(10L) + nulPos).as("header_size"))
      .orderBy(col("doc_id"))
  }

  val gzipHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS deflate_ok, TRUE AS has_fname,
      |       CAST(1700000000 + doc_id AS BIGINT) AS mtime, TRUE AS os_unix,
      |       'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS fname,
      |       CAST(11 + len('doc' || CAST(doc_id AS VARCHAR) || '.txt') AS BIGINT)
      |         AS header_size
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // WARC record header (11th codec: text protocol over binary)
  // ---------------------------------------------------------------

  /** WARC/1.0 record-header decode — the CRAWL-ARCHIVE framing every
    * web-scale corpus pipeline starts from (Common-Crawl shape):
    * a TEXT protocol living in a binary column — CRLF-separated
    * headers terminated by a blank line, Content-Length framing the
    * payload. The parser finds the \\r\\n\\r\\n terminator (header
    * size), regexp-extracts WARC-Type / Target-URI host / record id /
    * Content-Length, and computes the NEXT-RECORD offset (header +
    * content + trailing CRLFCRLF) — the field a 100 TB WARC splitter
    * actually needs to hand out record-aligned splits. Synth from doc
    * fields; oracle replays the arithmetic. */
  def warcRecord(spark: SparkSession, dir: String): DataFrame = {
    val uri = concat(lit("https://site"), (col("doc_id") % 50).cast("string"),
      lit(".example.org/docs/"), col("doc_id").cast("string"))
    val hdr = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:doc-"),
      col("doc_id").cast("string"), lit(">\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), col("n_chars").cast("string"), lit("\r\n\r\n"))
    val withP = Tables.documents(spark, dir)
      .select(col("doc_id"), hdr.cast("binary").as("p"))
    val s = col("p").cast("string")
    val hdrEnd = instr(s, "\r\n\r\n") + 3L
    val clen = regexp_extract(s, "Content-Length: (\\d+)", 1).cast("long")
    withP.select(col("doc_id"),
        (substring(s, 1, 9) === "WARC/1.0\r").as("version_ok"),
        regexp_extract(s, "WARC-Type: (\\w+)", 1).as("warc_type"),
        regexp_extract(s, "WARC-Target-URI: https://([^/]+)/", 1).as("host"),
        clen.as("content_length"),
        hdrEnd.as("header_bytes"),
        (hdrEnd + clen + 4L).as("next_record_offset"))
      .orderBy(col("doc_id"))
  }

  val warcRecordSql: String =
    """SELECT doc_id, TRUE AS version_ok, 'response' AS warc_type,
      |       'site' || CAST(doc_id % 50 AS VARCHAR) || '.example.org' AS host,
      |       CAST(n_chars AS BIGINT) AS content_length,
      |       CAST(len('WARC/1.0' || chr(13) || chr(10)
      |         || 'WARC-Type: response' || chr(13) || chr(10)
      |         || 'WARC-Record-ID: <urn:uuid:doc-' || CAST(doc_id AS VARCHAR) || '>'
      |         || chr(13) || chr(10)
      |         || 'WARC-Target-URI: https://site' || CAST(doc_id % 50 AS VARCHAR)
      |         || '.example.org/docs/' || CAST(doc_id AS VARCHAR) || chr(13) || chr(10)
      |         || 'Content-Length: ' || CAST(n_chars AS VARCHAR)
      |         || chr(13) || chr(10) || chr(13) || chr(10)) AS BIGINT) AS header_bytes,
      |       CAST(len('WARC/1.0' || chr(13) || chr(10)
      |         || 'WARC-Type: response' || chr(13) || chr(10)
      |         || 'WARC-Record-ID: <urn:uuid:doc-' || CAST(doc_id AS VARCHAR) || '>'
      |         || chr(13) || chr(10)
      |         || 'WARC-Target-URI: https://site' || CAST(doc_id % 50 AS VARCHAR)
      |         || '.example.org/docs/' || CAST(doc_id AS VARCHAR) || chr(13) || chr(10)
      |         || 'Content-Length: ' || CAST(n_chars AS VARCHAR)
      |         || chr(13) || chr(10) || chr(13) || chr(10)) + n_chars + 4 AS BIGINT)
      |         AS next_record_offset
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // Parquet file framing (12th codec: END-anchored parse)
  // ---------------------------------------------------------------

  /** PARQUET FILE FRAMING decode — the engine's own storage format,
    * and the family's first END-ANCHORED parse: a parquet reader
    * starts at the TAIL ("PAR1" magic at bytes [len−4, len), LE u32
    * footer length at [len−8, len−4)), walks back to the footer
    * start, and only then knows where metadata lives — the row-group
    * data region is whatever sits between the 4-byte head magic and
    * the footer. The real footer is Thrift; this synthesizes the
    * framing with a mini ASCII metadata blob ("rows=R,cols=C") so the
    * offset arithmetic AND an in-footer field parse are both
    * round-tripped. Every offset derives from length(payload) —
    * there are no fixed positions, which is exactly what the other
    * 11 codecs never had to do. */
  def parquetFooter(spark: SparkSession, dir: String): DataFrame = {
    val rows = (lit(100) + pmod(col("doc_id"), lit(900))).cast("long")
    val cols0 = (lit(4) + pmod(col("n_chars"), lit(28))).cast("long")
    val meta = concat(lit("rows="), rows.cast("string"),
      lit(",cols="), cols0.cast("string"))
    val dataLen = (lit(64L) + pmod(col("doc_id") * 7L, lit(192L))).cast("long")
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val payload = unhex(concat(
      lit("50415231"),                         // "PAR1"
      repeat(lit("AB"), dataLen.cast("int")),  // data region (opaque)
      hex(meta.cast("binary")),                // footer blob
      leHex(length(meta).cast("long"), 4),     // footer length LE u32
      lit("50415231")))                        // tail magic
    val withP = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .withColumn("len", length(col("p")).cast("long"))
    // END-anchored: every offset below is computed from len
    def leAtDyn(pos: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(i =>
        conv(hex(substring(col("p"), (pos + i).cast("int"), lit(1))), 16, 10).cast("long") *
          lit(1L << (8 * i)))
        .reduce(_ + _)
    val flen = leAtDyn(col("len") - 7L, 4)
    val footer = substring(col("p"), (col("len") - 7L - flen).cast("int"),
      flen.cast("int")).cast("string")
    withP.select(col("doc_id"),
        (hex(substring(col("p"), 1, 4)) === lit("50415231")).as("head_magic_ok"),
        (hex(substring(col("p"), (col("len") - 3L).cast("int"), lit(4)))
          === lit("50415231")).as("tail_magic_ok"),
        flen.as("footer_len"),
        (col("len") - 12L - flen).as("data_bytes"),
        regexp_extract(footer, "rows=(\\d+)", 1).cast("long").as("num_rows"),
        regexp_extract(footer, "cols=(\\d+)", 1).cast("long").as("num_cols"))
      .orderBy(col("doc_id"))
  }

  val parquetFooterSql: String =
    """SELECT doc_id, TRUE AS head_magic_ok, TRUE AS tail_magic_ok,
      |       CAST(len('rows=' || CAST(100 + doc_id % 900 AS VARCHAR)
      |            || ',cols=' || CAST(4 + n_chars % 28 AS VARCHAR)) AS BIGINT)
      |         AS footer_len,
      |       CAST(64 + (doc_id * 7) % 192 AS BIGINT) AS data_bytes,
      |       CAST(100 + doc_id % 900 AS BIGINT) AS num_rows,
      |       CAST(4 + n_chars % 28 AS BIGINT) AS num_cols
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // TAR (ustar) header (13th codec: OCTAL-ASCII fields + checksum)
  // ---------------------------------------------------------------

  /** TAR (ustar) 512-byte header decode — the ARCHIVE framing a
    * corpus-of-tarballs pipeline splits on, and two parse flavors no
    * other codec has: numeric fields stored as OCTAL ASCII text
    * (size/mtime/chksum — parsed with conv(_, 8, 10)), and a HEADER
    * CHECKSUM the parser must RECOMPUTE over the raw bytes (sum of
    * all 512 with the chksum field read as 8 spaces) and compare to
    * the stored value — the integrity check `tar tvf` actually runs.
    * Synthetic variant is SPACE-padded (real ustar NUL-pads; DuckDB
    * VARCHARs cannot hold NUL, and the checksum arithmetic is
    * identical either way — documented deviation, same framing
    * contract). Verification is arithmetic on [[prefixBytes]]; the
    * oracle replays the generating arithmetic, octal digits and byte
    * sums included. */
  def tarHeader(spark: SparkSession, dir: String): DataFrame = {
    val name = concat(lit("doc"), col("doc_id").cast("string"), lit(".txt"))
    val mt = (lit(1700000000L) + col("doc_id")).cast("long")
    val sizeF = concat(lpad(conv(col("n_chars").cast("string"), 10, 8), 11, "0"),
      lit(" "))
    val mtimeF = concat(lpad(conv(mt.cast("string"), 10, 8), 11, "0"), lit(" "))
    val modeF = lit("0000644 ")
    val uidF = lit("0000000 ")
    val gidF = lit("0000000 ")
    val magicF = lit("ustar 00")
    // header with the chksum field as 8 spaces — the form the sum is
    // defined over
    val pre = concat(rpad(name, 100, " "), modeF, uidF, gidF, sizeF, mtimeF)
    val post = concat(lit("0"), rpad(lit(""), 100, " "), magicF)
    val h0 = rpad(concat(pre, rpad(lit(""), 8, " "), post), 512, " ")
    // prefixBytes' hex split leaves one trailing empty token -> null
    // element; the fold must be null-safe or the whole sum nulls out
    def byteSum(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (a, x) => a + coalesce(x, lit(0L)))
    val ck = byteSum(prefixBytes(h0.cast("binary"), 512))
    val ckF = concat(lpad(conv(ck.cast("string"), 10, 8), 6, "0"), lit("  "))
    val payload = rpad(concat(pre, ckF, post), 512, " ").cast("binary")
    val withP = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .withColumn("b", prefixBytes(col("p"), 512))
    val s = col("p").cast("string")
    val storedCk = conv(trim(substring(s, 149, 6)), 8, 10).cast("long")
    // recompute: total bytes − stored chksum field + 8 spaces
    val ckField = substring(s, 149, 8)
    val recomputed = byteSum(col("b")) -
      byteSum(prefixBytes(ckField.cast("binary"), 8)) + lit(8L * 32L)
    withP.select(col("doc_id"),
        trim(substring(s, 1, 100)).as("name"),
        conv(trim(substring(s, 125, 11)), 8, 10).cast("long").as("size"),
        conv(trim(substring(s, 137, 11)), 8, 10).cast("long").as("mtime"),
        storedCk.as("chksum"),
        (recomputed === storedCk).as("chksum_ok"),
        (substring(s, 258, 5) === "ustar").as("magic_ok"),
        (substring(s, 157, 1) === "0").as("is_regular_file"))
      .orderBy(col("doc_id"))
  }

  val tarHeaderSql: String =
    """WITH p8 AS (SELECT [CAST(1 AS BIGINT), 8, 64, 512, 4096, 32768, 262144,
      |                    2097152, 16777216, 134217728, 1073741824] AS pw),
      |f AS (
      |  SELECT doc_id,
      |         'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
      |         CAST(n_chars AS BIGINT) AS sz,
      |         CAST(1700000000 + doc_id AS BIGINT) AS mt
      |  FROM documents),
      |sums AS (
      |  -- octal fields are lpad('0')-ed to 11 digits, so the char sum
      |  -- is 11*48 + the base-8 digit sum
      |  SELECT doc_id, name, sz, mt,
      |         list_sum(list_transform(range(len(name)),
      |                  i -> ord(substring(name, CAST(i + 1 AS INTEGER), 1))))
      |           AS s_name,
      |         11 * 48 + list_sum(list_transform(range(11),
      |                      i -> (sz // pw[CAST(i + 1 AS INTEGER)]) % 8))
      |           AS s_size,
      |         11 * 48 + list_sum(list_transform(range(11),
      |                      i -> (mt // pw[CAST(i + 1 AS INTEGER)]) % 8))
      |           AS s_mtime
      |  FROM f CROSS JOIN p8),
      |ck AS (
      |  -- generating arithmetic of the byte sum over the 512-byte
      |  -- space-padded header with chksum read as 8 spaces:
      |  --   name: s_name + (100 - len) spaces
      |  --   mode '0000644 ', uid/gid '0000000 ' x2
      |  --   size/mtime: 11 octal chars + 1 trailing space each
      |  --   chksum-as-spaces 8x32, typeflag '0', linkname 100 spaces,
      |  --   magic 'ustar 00', tail pad (512 - 265) spaces
      |  SELECT doc_id, name, sz, mt,
      |         s_name + (100 - len(name)) * 32
      |         + (4 * 48 + 54 + 52 + 52 + 32)     -- '0000644 '
      |         + 2 * (7 * 48 + 32)                -- uid, gid
      |         + s_size + 32 + s_mtime + 32
      |         + 8 * 32 + 48 + 100 * 32
      |         + (117 + 115 + 116 + 97 + 114 + 32 + 48 + 48)  -- 'ustar 00'
      |         + (512 - 265) * 32 AS cksum
      |  FROM sums)
      |SELECT doc_id, name, sz AS size, mt AS mtime,
      |       CAST(cksum AS BIGINT) AS chksum,
      |       TRUE AS chksum_ok, TRUE AS magic_ok, TRUE AS is_regular_file
      |FROM ck ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // ZIP end-of-central-directory (14th codec: backward signature scan)
  // ---------------------------------------------------------------

  /** ZIP EOCD decode — the archive format whose directory lives at
    * the END behind a VARIABLE-length comment, so a reader cannot
    * jump to a fixed tail offset (the parquet-footer trick): it must
    * SCAN BACKWARD for the PK\0x05\0x06 signature. The scan here is a
    * greedy anchored regex over the hex view — `^((?:..)*)504B0506`
    * captures the LONGEST even-aligned prefix, i.e. finds the LAST
    * signature occurrence, exactly the spec's disambiguation rule
    * (a comment could contain the signature bytes) — still pure
    * codegen, no UDF. Parsed: entry count, central-directory size and
    * offset, comment, and the structural identity
    * cd_offset + cd_size + 22 + comment_len = file_len that a 100 TB
    * zip-shard splitter validates before trusting offsets. */
  def zipEocd(spark: SparkSession, dir: String): DataFrame = {
    val nEntries = (lit(1L) + pmod(col("doc_id"), lit(16L))).cast("long")
    val cdSize = nEntries * 55L
    val dataLen = (lit(40L) + pmod(col("doc_id") * 11L, lit(160L))).cast("long")
    val comment = concat(lit("graft-shard-"), (col("doc_id") % 50L).cast("string"))
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val payload = unhex(concat(
      repeat(lit("4D"), dataLen.cast("int")),      // local entries (opaque)
      repeat(lit("43"), cdSize.cast("int")),       // central directory (opaque)
      lit("504B0506"), lit("0000"), lit("0000"),   // EOCD sig, disk numbers
      leHex(nEntries, 2), leHex(nEntries, 2),      // entries this disk / total
      leHex(cdSize, 4),
      leHex(dataLen, 4),                           // CD offset = after data
      leHex(length(comment).cast("long"), 2),
      hex(comment.cast("binary"))))
    val withP = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .withColumn("len", length(col("p")).cast("long"))
      .withColumn("hexs", hex(col("p")))
      // backward scan: longest even-aligned prefix before the signature
      .withColumn("eocd_pos",
        (length(regexp_extract(col("hexs"), "^((?:..)*)504B0506", 1)) / 2 + 1)
          .cast("long"))
    def leAtDyn(pos: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(i =>
        conv(hex(substring(col("p"), (pos + i).cast("int"), lit(1))), 16, 10)
          .cast("long") * lit(1L << (8 * i)))
        .reduce(_ + _)
    val nE = leAtDyn(col("eocd_pos") + 10L, 2)
    val cdS = leAtDyn(col("eocd_pos") + 12L, 4)
    val cdO = leAtDyn(col("eocd_pos") + 16L, 4)
    val cLen = leAtDyn(col("eocd_pos") + 20L, 2)
    withP.select(col("doc_id"),
        nE.as("n_entries"), cdS.as("cd_size"), cdO.as("cd_offset"),
        cLen.as("comment_len"),
        substring(col("p"), (col("eocd_pos") + 22L).cast("int"),
          cLen.cast("int")).cast("string").as("comment"),
        (cdO + cdS + 22L + cLen === col("len")).as("structure_ok"))
      .orderBy(col("doc_id"))
  }

  val zipEocdSql: String =
    """SELECT doc_id,
      |       CAST(1 + doc_id % 16 AS BIGINT) AS n_entries,
      |       CAST((1 + doc_id % 16) * 55 AS BIGINT) AS cd_size,
      |       CAST(40 + (doc_id * 11) % 160 AS BIGINT) AS cd_offset,
      |       CAST(len('graft-shard-' || CAST(doc_id % 50 AS VARCHAR)) AS BIGINT)
      |         AS comment_len,
      |       'graft-shard-' || CAST(doc_id % 50 AS VARCHAR) AS comment,
      |       TRUE AS structure_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // MP4 / ISO-BMFF box walk (15th codec: nested big-endian boxes)
  // ---------------------------------------------------------------

  /** MP4 (ISO-BMFF) box-structure decode — the VIDEO container every
    * multimodal corpus carries: a sequence of [BE u32 size][4cc type]
    * boxes where metadata lives NESTED (moov ▸ mvhd), so the parser
    * chains offsets box-to-box (ftyp's size locates moov; moov's
    * header locates mvhd) instead of reading fixed positions — the
    * JPEG marker walk's sibling with 32-bit sizes and nesting instead
    * of 16-bit flat segments. Parses the ftyp brand, mvhd timescale /
    * duration (version-0 layout: content offsets +12/+16), derives
    * duration_ms exactly (duration = k·timescale by construction ⇒
    * integer division), and validates Σ box sizes = file length — the
    * record-alignment identity a 100 TB shard splitter checks. */
  def mp4Boxes(spark: SparkSession, dir: String): DataFrame = {
    val timescale = Seq(600L, 1000L, 90000L)
    val tsCol = element_at(
      array(timescale.map(lit(_)): _*), (pmod(col("doc_id"), lit(3L)) + 1L).cast("int"))
      .cast("long")
    val durSec = (lit(1L) + pmod(col("n_chars"), lit(240L))).cast("long")
    val dur = durSec * tsCol
    val mdatLen = (lit(16L) + pmod(col("doc_id") * 13L, lit(224L))).cast("long")
    def beHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    // ftyp: size 16: [16]['ftyp'][brand 'isom'][minor 0]
    // moov: size 8+108: ['moov'][mvhd size 108: ver/flags, ctime,
    //   mtime, timescale, duration, ... zero-padded]
    // mdat: size 8+mdatLen
    val mvhdContent = concat(lit("00000000"), lit("00000000"), lit("00000000"),
      beHex(tsCol, 4), beHex(dur, 4), repeat(lit("00"), 80))
    val payload = unhex(concat(
      lit("00000010"), hex(lit("ftyp").cast("binary")),
      hex(lit("isom").cast("binary")), lit("00000000"),
      beHex(lit(116L), 4), hex(lit("moov").cast("binary")),
      beHex(lit(108L), 4), hex(lit("mvhd").cast("binary")), mvhdContent,
      beHex(mdatLen + 8L, 4), hex(lit("mdat").cast("binary")),
      repeat(lit("DA"), mdatLen.cast("int"))))
    val withP = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .withColumn("len", length(col("p")).cast("long"))
    def beAtDyn(pos: org.apache.spark.sql.Column, n: Int) =
      (0 until n).map(i =>
        conv(hex(substring(col("p"), (pos + i).cast("int"), lit(1))), 16, 10)
          .cast("long") * lit(1L << (8 * (n - 1 - i))))
        .reduce(_ + _)
    def fourcc(pos: org.apache.spark.sql.Column) =
      substring(col("p"), pos.cast("int"), lit(4)).cast("string")
    val s1 = beAtDyn(lit(1L), 4)              // ftyp box size
    val brand = fourcc(lit(9L))
    val moovPos = lit(1L) + s1                // chained offset
    val s2 = beAtDyn(moovPos, 4)
    val mvhdPos = moovPos + 8L                // first child of moov
    val ts = beAtDyn(mvhdPos + 20L, 4)        // content +12 (ver/flags+ctime+mtime)
    val dr = beAtDyn(mvhdPos + 24L, 4)
    val mdatPos = moovPos + s2
    val s3 = beAtDyn(mdatPos, 4)
    withP.select(col("doc_id"),
        (fourcc(lit(5L)) === "ftyp").as("ftyp_ok"),
        brand.as("brand"),
        (fourcc(moovPos + 4L) === "moov" && fourcc(mvhdPos + 4L) === "mvhd")
          .as("moov_ok"),
        ts.as("timescale"), dr.as("duration"),
        ((dr * lit(1000L)) / ts).cast("long").as("duration_ms"),
        (s3 - 8L).as("mdat_bytes"),
        (s1 + s2 + s3 === col("len")).as("sizes_ok"))
      .orderBy(col("doc_id"))
  }

  val mp4BoxesSql: String =
    """SELECT doc_id, TRUE AS ftyp_ok, 'isom' AS brand, TRUE AS moov_ok,
      |       CAST([600, 1000, 90000][CAST(doc_id % 3 AS INTEGER) + 1] AS BIGINT)
      |         AS timescale,
      |       CAST((1 + n_chars % 240)
      |            * [600, 1000, 90000][CAST(doc_id % 3 AS INTEGER) + 1] AS BIGINT)
      |         AS duration,
      |       CAST((1 + n_chars % 240) * 1000 AS BIGINT) AS duration_ms,
      |       CAST(16 + (doc_id * 13) % 224 AS BIGINT) AS mdat_bytes,
      |       TRUE AS sizes_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // ELF header (16th codec: the code-corpus binary filter)
  // ---------------------------------------------------------------

  /** ELF64 header decode — the CODE-CORPUS ingestion filter: source
    * trees scraped at scale carry compiled artifacts (.o/.so/
    * executables) that must be ROUTED OUT of a text tokenizer's
    * input, and the 64-byte ELF header is how you tell (magic,
    * class/endianness, e_type EXEC vs DYN vs REL). Also parsed:
    * machine, entry point, section-header table offset/count — the
    * fields a binary-analysis shard splitter actually reads. All
    * fixed-offset LE arithmetic over [[prefixBytes]]; the
    * `shstrndx = shnum − 1` identity round-trips the generator. */
  def elfHeader(spark: SparkSession, dir: String): DataFrame = {
    val eType = (lit(2L) + pmod(col("doc_id"), lit(2L))).cast("long") // EXEC/DYN
    val machine = when(pmod(col("doc_id"), lit(3L)) === 0, lit(0xB7L))
      .otherwise(lit(0x3EL)) // aarch64 / x86-64
    val entry = lit(0x400000L) + col("doc_id") * 16L
    val shoff = lit(4096L) + pmod(col("doc_id") * 32L, lit(8192L))
    val phnum = (lit(1L) + pmod(col("doc_id"), lit(4L))).cast("long")
    val shnum = (lit(4L) + pmod(col("n_chars"), lit(12L))).cast("long")
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val payload = unhex(concat(
      lit("7F454C46"), lit("02"), lit("01"), lit("01"), lit("00"),
      repeat(lit("00"), 8),
      leHex(eType, 2), leHex(machine, 2), leHex(lit(1L), 4),
      leHex(entry, 8), leHex(lit(64L), 8), leHex(shoff, 8),
      leHex(lit(0L), 4), leHex(lit(64L), 2), leHex(lit(56L), 2),
      leHex(phnum, 2), leHex(lit(64L), 2), leHex(shnum, 2),
      leHex(shnum - 1L, 2)))
    val withB = Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("p"))
      .select(col("doc_id"), prefixBytes(col("p"), 64).as("b"))
    val b = col("b")
    withB.select(col("doc_id"),
        (leAt(b, 1, 4) === 0x464C457FL).as("magic_ok"),
        (leAt(b, 5, 1) === 2L).as("is_elf64"),
        (leAt(b, 6, 1) === 1L).as("is_little_endian"),
        when(leAt(b, 17, 2) === 2L, "EXEC")
          .when(leAt(b, 17, 2) === 3L, "DYN")
          .otherwise("OTHER").as("e_type"),
        when(leAt(b, 19, 2) === 0x3EL, "x86-64")
          .when(leAt(b, 19, 2) === 0xB7L, "aarch64")
          .otherwise("unknown").as("machine"),
        leAt(b, 25, 8).as("entry"),
        leAt(b, 41, 8).as("shoff"),
        leAt(b, 57, 2).as("phnum"),
        leAt(b, 61, 2).as("shnum"),
        (leAt(b, 63, 2) === leAt(b, 61, 2) - 1L).as("shstrndx_ok"))
      .orderBy(col("doc_id"))
  }

  val elfHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, TRUE AS is_elf64,
      |       TRUE AS is_little_endian,
      |       CASE WHEN doc_id % 2 = 0 THEN 'EXEC' ELSE 'DYN' END AS e_type,
      |       CASE WHEN doc_id % 3 = 0 THEN 'aarch64' ELSE 'x86-64' END AS machine,
      |       CAST(4194304 + doc_id * 16 AS BIGINT) AS entry,
      |       CAST(4096 + (doc_id * 32) % 8192 AS BIGINT) AS shoff,
      |       CAST(1 + doc_id % 4 AS BIGINT) AS phnum,
      |       CAST(4 + n_chars % 12 AS BIGINT) AS shnum,
      |       TRUE AS shstrndx_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** OGG PAGE header decode — the 17th codec, adding two parse modes
    * the family still lacked: a 64-BIT little-endian field (the
    * granule position — every prior LE field was ≤4 bytes) and a
    * FORWARD variable-length table FOLD driven by a parsed count
    * (the lacing table: `page_segments` lacing bytes whose SUM is
    * the page body size — ZIP's variable scan was backward and
    * content-anchored; this one is a dynamic `slice` + `aggregate`
    * over the decoded byte array, still whole-stage codegen). The
    * CRC field is carried verbatim (a page checksum is payload-wide;
    * the synthesized value is a deterministic stand-in the parse
    * REPORTS, not recomputes — the TAR codec owns the recomputed-
    * checksum mode). Same oracle contract as WAV/TIFF: the
    * synthesized header IS the spec, so the oracle re-derives every
    * field from the document columns. */
  def oggPage(spark: SparkSession, dir: String): DataFrame = {
    val nsegs = (lit(1) + pmod(col("doc_id"), lit(4))).cast("long")
    val granule = col("n_chars").cast("long") * 1000L + col("doc_id")
    val serial = pmod(col("doc_id") * 37L + 11L, lit(1000000L))
    val pageSeq = pmod(col("doc_id"), lit(1000L))
    val bos = pmod(col("doc_id"), lit(7)) === 0
    val crc = pmod(granule * 31L + serial, lit(4294967296L))
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val lacing = concat((0 until 4).map { i =>
      when(lit(i.toLong) < nsegs,
        lpad(hex(lit(100L) + pmod(col("doc_id") + i, lit(156L))), 2, "0"))
        .otherwise(lit(""))
    }: _*)
    val ogg = unhex(concat(
      lit("4F676753"), lit("00"),                     // "OggS", version 0
      when(bos, lit("02")).otherwise(lit("00")),      // header-type flags
      leHex(granule, 8), leHex(serial, 4), leHex(pageSeq, 4),
      leHex(crc, 4), leHex(nsegs, 1), lacing))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(ogg, 31).as("bytes"))
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    bytes.select(col("doc_id"),
        (le(1, 4) === 0x5367674FL && le(5, 1) === 0L).as("magic_ok"),
        (pmod(expr("element_at(bytes, 6) div 2"), lit(2L)) === 1L).as("is_bos"),
        le(7, 8).as("granule_position"),
        le(15, 4).as("serial"),
        le(19, 4).as("page_seq"),
        le(23, 4).as("crc32"),
        le(27, 1).as("n_segments"),
        aggregate(slice(col("bytes"), lit(28), le(27, 1).cast("int")),
          lit(0L), (acc, x) => acc + x).as("body_bytes"))
      .orderBy(col("doc_id"))
  }

  val oggPageSql: String =
    """SELECT doc_id, TRUE AS magic_ok, doc_id % 7 = 0 AS is_bos,
      |       CAST(n_chars * 1000 + doc_id AS BIGINT) AS granule_position,
      |       CAST((doc_id * 37 + 11) % 1000000 AS BIGINT) AS serial,
      |       CAST(doc_id % 1000 AS BIGINT) AS page_seq,
      |       CAST(((n_chars * 1000 + doc_id) * 31
      |             + (doc_id * 37 + 11) % 1000000) % 4294967296 AS BIGINT) AS crc32,
      |       CAST(1 + doc_id % 4 AS BIGINT) AS n_segments,
      |       CAST(list_sum(list_transform(range(1 + doc_id % 4),
      |              i -> 100 + (doc_id + i) % 156)) AS BIGINT) AS body_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** WEBP header decode — the 18th codec: a RIFF container whose
    * payload VARIANT is announced by an inner fourcc ('VP8 ' lossy /
    * 'VP8L' lossless, synthesized by doc parity), and whose lossless
    * branch carries the family's first BIT-PACKED FIELDS STRADDLING
    * BYTE BOUNDARIES — VP8L packs (width−1, height−1) as two 14-bit
    * integers inside a 32-bit little-endian word, so neither field is
    * byte-aligned and the parse must assemble the LE word first, then
    * unpack with exact div/mod powers of two (FLAC's sub-byte fields
    * were big-endian and byte-anchored). The lossy branch checks the
    * 9D 01 2A start code and reads 14-bit LE dims. */
  def webpHeader(spark: SparkSession, dir: String): DataFrame = {
    val width = (lit(16) + pmod(col("n_chars"), lit(1000))).cast("long")
    val height = (lit(16) + pmod(col("doc_id"), lit(800))).cast("long")
    val lossy = pmod(col("doc_id"), lit(2)) === 0
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val vp8lBits = (width - 1L) + (height - 1L) * lit(16384L)
    val payload = when(lossy, concat(
        lit("56503820"), leHex(lit(10L), 4),          // "VP8 ", chunk size
        lit("000000"), lit("9D012A"),                  // frame tag, start code
        leHex(width, 2), leHex(height, 2)))
      .otherwise(concat(
        lit("5650384C"), leHex(lit(5L), 4),            // "VP8L", chunk size
        lit("2F"), leHex(vp8lBits, 4)))
    val riffSize = when(lossy, lit(22L)).otherwise(lit(17L))
    val webp = unhex(concat(
      lit("52494646"), leHex(riffSize, 4), lit("57454250"), payload))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(webp, 30).as("bytes"))
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    val isLossy = le(13, 4) === 0x20385056L            // "VP8 "
    val bits = le(22, 4)
    bytes.select(col("doc_id"),
        (le(1, 4) === 0x46464952L && le(9, 4) === 0x50424557L).as("riff_ok"),
        when(isLossy, lit("VP8 ")).otherwise(lit("VP8L")).as("variant"),
        le(5, 4).as("riff_size"),
        when(isLossy, beAt(col("bytes"), 24, 3) === 0x9D012AL)
          .otherwise(le(21, 1) === 0x2FL).as("sig_ok"),
        when(isLossy, pmod(le(27, 2), lit(16384L)))
          .otherwise(pmod(bits, lit(16384L)) + 1L).as("width"),
        when(isLossy, pmod(le(29, 2), lit(16384L)))
          .otherwise(pmod(expr("""(element_at(bytes, 22)
            + element_at(bytes, 23) * 256
            + element_at(bytes, 24) * 65536
            + element_at(bytes, 25) * 16777216) div 16384"""), lit(16384L)) + 1L)
          .as("height"))
      .withColumn("pixels", col("width") * col("height"))
      .orderBy(col("doc_id"))
  }

  val webpHeaderSql: String =
    """SELECT doc_id, TRUE AS riff_ok,
      |       CASE WHEN doc_id % 2 = 0 THEN 'VP8 ' ELSE 'VP8L' END AS variant,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN 22 ELSE 17 END AS BIGINT) AS riff_size,
      |       TRUE AS sig_ok,
      |       CAST(16 + n_chars % 1000 AS BIGINT) AS width,
      |       CAST(16 + doc_id % 800 AS BIGINT) AS height,
      |       CAST((16 + n_chars % 1000) * (16 + doc_id % 800) AS BIGINT) AS pixels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** ICO directory decode — the 19th codec, adding the SENTINEL-VALUE
    * parse mode: ICONDIRENTRY stores width/height as ONE byte where
    * 0 MEANS 256 (the format outgrew its own field — the same trap as
    * MP3's `0 = invalid` bitrate index, but as a silent remap rather
    * than a reject), so a parser that trusts the raw byte under-sizes
    * every 256-pixel icon. The directory is count-driven (idCount
    * 16-byte entries); the parse walks entry 0 and re-derives the
    * first image's byte offset = 6 + 16·count, cross-checking it
    * against the stored dwImageOffset — a parsed-count × stride
    * consistency proof. Corpus: every 8th doc gets a 256-wide icon
    * (the sentinel case). */
  def icoHeader(spark: SparkSession, dir: String): DataFrame = {
    val count = (lit(1) + pmod(col("doc_id"), lit(3))).cast("long")
    val wReal = when(pmod(col("doc_id"), lit(8)) === 0, lit(256L))
      .otherwise(lit(16L) + pmod(col("n_chars"), lit(240L)))
    val hReal = (lit(16L) + pmod(col("doc_id"), lit(240L))).cast("long")
    val bpp = lit(32L)
    val imgBytes = wReal * hReal * 4L
    def leHex(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i => lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    // sentinel encode: 256 -> 0 in the one-byte dims
    def dimByte(v: org.apache.spark.sql.Column) = leHex(pmod(v, lit(256L)), 1)
    val offset = lit(6L) + count * 16L
    val entry0 = concat(
      dimByte(wReal), dimByte(hReal),
      lit("00"), lit("00"),                  // palette count, reserved
      leHex(lit(1L), 2), leHex(bpp, 2),      // planes, bpp
      leHex(imgBytes, 4), leHex(offset, 4))  // image size, offset
    val ico = unhex(concat(
      lit("0000"), leHex(lit(1L), 2), leHex(count, 2), entry0))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(ico, 22).as("bytes"))
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    // sentinel decode: 0 -> 256
    def dim(pos: Int) = when(le(pos, 1) === 0L, lit(256L)).otherwise(le(pos, 1))
    bytes.select(col("doc_id"),
        (le(1, 2) === 0L && le(3, 2) === 1L).as("magic_ok"),
        le(5, 2).as("n_images"),
        dim(7).as("width"), dim(8).as("height"),
        le(13, 2).as("bits_per_pixel"),
        le(15, 4).as("image_bytes"),
        // parsed-count x stride identity: stored offset must equal
        // the directory size the count implies
        (le(19, 4) === lit(6L) + le(5, 2) * 16L).as("offset_consistent"),
        (dim(7) * dim(8) * (le(13, 2) / 8L).cast("long") === le(15, 4))
          .as("size_consistent"))
      .orderBy(col("doc_id"))
  }

  val icoHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(1 + doc_id % 3 AS BIGINT) AS n_images,
      |       CAST(CASE WHEN doc_id % 8 = 0 THEN 256
      |                 ELSE 16 + n_chars % 240 END AS BIGINT) AS width,
      |       CAST(16 + doc_id % 240 AS BIGINT) AS height,
      |       CAST(32 AS BIGINT) AS bits_per_pixel,
      |       CAST((CASE WHEN doc_id % 8 = 0 THEN 256
      |                  ELSE 16 + n_chars % 240 END)
      |            * (16 + doc_id % 240) * 4 AS BIGINT) AS image_bytes,
      |       TRUE AS offset_consistent, TRUE AS size_consistent
      |FROM documents ORDER BY doc_id""".stripMargin

  /** SQLITE database header (20th codec) — the 1-MEANS-65536 sentinel
    * (the DUAL of ICO's 0-means-256: the 2-byte page-size field
    * outgrew its range at the TOP, so the minimum legal value was
    * repurposed), a 16-byte STRING magic (every prior magic was 2–8
    * bytes), and the family's first ENUM field (text encoding 1/2/3 →
    * name, a closed-set decode rather than arithmetic). Layout per
    * the public file-format doc: magic[0..15], BE u16 page size[16],
    * write/read versions[18..19], BE u32 page count[28], BE u32 text
    * encoding[56]. Corpus: every 8th doc gets the 65536-page-size
    * sentinel. Pure codegen byte arithmetic, no UDF. */
  def sqliteHeader(spark: SparkSession, dir: String): DataFrame = {
    def beHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    val magicHex = "53514C69746520666F726D6174203300" // "SQLite format 3\0"
    val realPage = expr("shiftleft(512L, CAST(doc_id % 8 AS INT))").cast("long")
    val storedPage = when(realPage === 65536L, lit(1L)).otherwise(realPage)
    val wv = (lit(1L) + pmod(col("doc_id"), lit(2))).cast("long")
    val pageCount = (lit(1L) + col("n_chars")).cast("long")
    val enc = (lit(1L) + pmod(col("doc_id"), lit(3))).cast("long")
    val payload = unhex(concat(
      lit(magicHex), beHexL(storedPage, 2), beHexL(wv, 1), beHexL(wv, 1),
      lit("00" * 8), beHexL(pageCount, 4), lit("00" * 24), beHexL(enc, 4)))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(payload, 60).as("bytes"))
    def be(pos: Int, len: Int) = beAt(col("bytes"), pos, len)
    bytes.select(col("doc_id"),
        (concat((1 to 16).map(i => lpad(hex(element_at(col("bytes"), i)), 2, "0")): _*)
          === lit(magicHex)).as("magic_ok"),
        // sentinel decode: 1 -> 65536
        when(be(17, 2) === 1L, lit(65536L)).otherwise(be(17, 2)).as("page_size"),
        be(19, 1).as("write_version"),
        be(29, 4).as("page_count"),
        (when(be(17, 2) === 1L, lit(65536L)).otherwise(be(17, 2)) * be(29, 4))
          .as("db_bytes"),
        when(be(57, 4) === 1L, "utf8").when(be(57, 4) === 2L, "utf16le")
          .when(be(57, 4) === 3L, "utf16be").otherwise("invalid")
          .as("text_encoding"))
      .orderBy(col("doc_id"))
  }

  val sqliteHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(512 * (1 << (doc_id % 8)) AS BIGINT) AS page_size,
      |       CAST(1 + doc_id % 2 AS BIGINT) AS write_version,
      |       CAST(1 + n_chars AS BIGINT) AS page_count,
      |       CAST(512 * (1 << (doc_id % 8)) AS BIGINT) * (1 + n_chars) AS db_bytes,
      |       CASE CAST(1 + doc_id % 3 AS BIGINT) WHEN 1 THEN 'utf8'
      |            WHEN 2 THEN 'utf16le' ELSE 'utf16be' END AS text_encoding
      |FROM documents ORDER BY doc_id""".stripMargin

  /** PCAP global header (21st codec) — ENDIANNESS SELF-DETECTION: the
    * writer emits the magic 0xA1B2C3D4 in ITS native byte order, so
    * the reader learns the byte order of every following field from
    * which of the two magic readings matches (all prior codecs fixed
    * the order per format or per field — here the FILE declares it,
    * and every field decode is conditional on that discovery).
    * 24-byte layout: magic[0], u16 major/minor[4,6], i32 tz[8],
    * u32 sigfigs[12], u32 snaplen[16], u32 linktype[20]. Corpus:
    * even docs write big-endian, odd docs little-endian. */
  def pcapHeader(spark: SparkSession, dir: String): DataFrame = {
    def beHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    def leHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * i) % 256), 2, "0")): _*)
    val isBig = pmod(col("doc_id"), lit(2)) === 0
    val snaplen = (lit(256L) + pmod(col("n_chars"), lit(65280))).cast("long")
    val linktype = (lit(1L) + pmod(col("doc_id"), lit(10))).cast("long")
    def field(v: org.apache.spark.sql.Column, n: Int) =
      when(isBig, beHexL(v, n)).otherwise(leHexL(v, n))
    val payload = unhex(concat(
      field(lit(0xA1B2C3D4L), 4), field(lit(2L), 2), field(lit(4L), 2),
      field(lit(0L), 4), field(lit(0L), 4), field(snaplen, 4),
      field(linktype, 4)))
    val bytes = Tables.documents(spark, dir)
      .select(col("doc_id"), prefixBytes(payload, 24).as("bytes"))
    def be(pos: Int, len: Int) = beAt(col("bytes"), pos, len)
    def le(pos: Int, len: Int) = leAt(col("bytes"), pos, len)
    val big = be(1, 4) === 0xA1B2C3D4L
    val lit_ = le(1, 4) === 0xA1B2C3D4L
    def rd(pos: Int, len: Int) =
      when(big, be(pos, len)).otherwise(le(pos, len))
    bytes.select(col("doc_id"),
        (big || lit_).as("magic_ok"),
        when(big, "big").when(lit_, "little").otherwise("invalid")
          .as("byte_order"),
        rd(5, 2).as("version_major"), rd(7, 2).as("version_minor"),
        rd(17, 4).as("snaplen"), rd(21, 4).as("linktype"))
      .orderBy(col("doc_id"))
  }

  val pcapHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CASE WHEN doc_id % 2 = 0 THEN 'big' ELSE 'little' END AS byte_order,
      |       CAST(2 AS BIGINT) AS version_major, CAST(4 AS BIGINT) AS version_minor,
      |       CAST(256 + n_chars % 65280 AS BIGINT) AS snaplen,
      |       CAST(1 + doc_id % 10 AS BIGINT) AS linktype
      |FROM documents ORDER BY doc_id""".stripMargin

  /** WASM module header (22nd codec) — the LEB128 VARINT: section
    * sizes are base-128 little-endian with a continuation BIT per
    * byte (the family's first variable-WIDTH integer — OGG's lacing
    * was a variable-LENGTH table of fixed bytes; this is one number
    * whose byte count the parse discovers bit by bit). Layout:
    * "\\0asm" + LE u32 version, then per section: 1-byte id + LEB128
    * size + size bytes of content. The parse decodes section 1's
    * varint (1 or 2 bytes here), advances the DYNAMIC offset
    * 9 + width + size, and proves the walk by reading section 2's
    * header there. Corpus: sizes straddle the 128 boundary so both
    * widths occur. */
  def wasmHeader(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (lit(1L) + pmod(col("doc_id"), lit(300))).cast("long").as("size"))
    val lebHex = when(col("size") < 128L, lpad(hex(col("size")), 2, "0"))
      .otherwise(concat(
        lpad(hex(pmod(col("size"), lit(128L)) + 128L), 2, "0"),
        lpad(hex(shiftright(col("size"), 7)), 2, "0")))
    val payload = unhex(concat(
      lit("0061736D"), lit("01000000"), lit("01"), lebHex,
      expr("repeat('00', CAST(size AS INT))"), lit("02"), lit("00")))
    // max payload = 8 magic/version + 1 id + 2 leb + 300 content + 2 = 313
    val bytes = base.select(col("doc_id"), prefixBytes(payload, 313).as("bytes"))
    def b(pos: org.apache.spark.sql.Column) = element_at(col("bytes"), pos.cast("int"))
    val b0 = element_at(col("bytes"), 10)
    val lebw = when(b0 >= 128L, lit(2L)).otherwise(lit(1L))
    val secSize = pmod(b0, lit(128L)) +
      when(b0 >= 128L, element_at(col("bytes"), 11) * 128L).otherwise(lit(0L))
    bytes
      .withColumn("lebw", lebw)
      .withColumn("sec1_size", secSize)
      .select(col("doc_id"),
        (beAt(col("bytes"), 1, 4) === 0x0061736DL).as("magic_ok"),
        leAt(col("bytes"), 5, 4).as("wasm_version"),
        element_at(col("bytes"), 9).as("sec1_id"),
        col("sec1_size"), col("lebw").as("leb_width"),
        b(lit(10L) + col("lebw") + col("sec1_size")).as("sec2_id"),
        b(lit(11L) + col("lebw") + col("sec1_size")).as("sec2_size"))
      .orderBy(col("doc_id"))
  }

  val wasmHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok, CAST(1 AS BIGINT) AS wasm_version,
      |       CAST(1 AS BIGINT) AS sec1_id,
      |       CAST(1 + doc_id % 300 AS BIGINT) AS sec1_size,
      |       CAST(CASE WHEN 1 + doc_id % 300 >= 128 THEN 2 ELSE 1 END AS BIGINT)
      |         AS leb_width,
      |       CAST(2 AS BIGINT) AS sec2_id, CAST(0 AS BIGINT) AS sec2_size
      |FROM documents ORDER BY doc_id""".stripMargin

  /** JAVA CLASS FILE header + constant pool (23rd codec) — the
    * TAG-DRIVEN HETEROGENEOUS RECORD walk: each constant-pool entry
    * starts with a 1-byte tag that decides the entry's LAYOUT AND
    * SIZE (tag 7 = Class: u2 index; tag 1 = Utf8: u2 length + bytes,
    * variable; tag 3 = Integer: u4 value) — unlike MP4's
    * homogeneous size-prefixed boxes or WASM's single varint, the
    * parse must DISPATCH on the tag to know how far to advance. BE
    * u2/u4 throughout, magic CAFEBABE, major version 52..61 with the
    * public major−44 Java-version mapping. The walk parses entries
    * 1–3 and proves the variable advance by landing on tag 3 at
    * offset 17 + utf8_len. */
  def classHeader(spark: SparkSession, dir: String): DataFrame = {
    def beHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        (lit(1L) + pmod(col("n_chars"), lit(40))).cast("long").as("ulen"))
    val major = (lit(52L) + pmod(col("doc_id"), lit(10))).cast("long")
    val nameIdx = (lit(2L)).cast("long") // Class entry points at the Utf8
    val payload = unhex(concat(
      lit("CAFEBABE"), beHexL(lit(0L), 2), beHexL(major, 2),
      beHexL(lit(4L), 2),                     // cp_count = entries + 1
      lit("07"), beHexL(nameIdx, 2),          // #1 Class -> name_index
      lit("01"), beHexL(col("ulen"), 2),      // #2 Utf8 length
      expr("repeat('41', CAST(ulen AS INT))"), // 'A' × ulen
      lit("03"), beHexL(col("doc_id") % 100000L, 4))) // #3 Integer
    val bytes = base
      .select(col("doc_id"), prefixBytes(payload, 64).as("bytes"))
    def be(pos: Int, len: Int) = beAt(col("bytes"), pos, len)
    def bAt(p: org.apache.spark.sql.Column) =
      element_at(col("bytes"), p.cast("int"))
    val ulen = be(15, 2)
    // dynamic advance: entry 3's tag lands right after the Utf8 bytes
    val t3pos = lit(17L) + ulen
    bytes.select(col("doc_id"),
        (be(1, 4) === 0xCAFEBABEL).as("magic_ok"),
        be(7, 2).as("major_version"),
        (be(7, 2) - 44L).as("java_version"),
        be(9, 2).as("cp_count"),
        (be(11, 1) === 7L && be(14, 1) === 1L && bAt(t3pos) === 3L)
          .as("tags_ok"),
        be(12, 2).as("class_name_index"),
        ulen.as("utf8_len"),
        (bAt(t3pos + 1L) * 16777216L + bAt(t3pos + 2L) * 65536L +
          bAt(t3pos + 3L) * 256L + bAt(t3pos + 4L)).as("const_int_value"))
      .orderBy(col("doc_id"))
  }

  val classHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(52 + doc_id % 10 AS BIGINT) AS major_version,
      |       CAST(8 + doc_id % 10 AS BIGINT) AS java_version,
      |       CAST(4 AS BIGINT) AS cp_count,
      |       TRUE AS tags_ok,
      |       CAST(2 AS BIGINT) AS class_name_index,
      |       CAST(1 + n_chars % 40 AS BIGINT) AS utf8_len,
      |       CAST(doc_id % 100000 AS BIGINT) AS const_int_value
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DNS response packet (24th codec) — the INTRA-RECORD BACKREFERENCE:
    * the answer's name field is a COMPRESSION POINTER (0xC0-flagged
    * 14-bit offset) back into the question's QNAME, so the parse must
    * detect the flag bits, extract the offset, and DEREFERENCE it —
    * no prior codec re-reads an earlier region through a stored
    * address (ELF/Parquet used end-anchored offsets to distinct
    * regions; this one aliases bytes already parsed, the RFC 1035
    * name-compression scheme). Label-chain walk (len-prefixed labels,
    * zero terminator) + BE u16/u32 fields; the pointer proof re-reads
    * the first label length THROUGH the pointer and matches it
    * against the directly-parsed one. */
  def dnsPacket(spark: SparkSession, dir: String): DataFrame = {
    def beHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        (lit(1L) + pmod(col("doc_id"), lit(10))).cast("long").as("len1"))
    val ttl = pmod(col("n_chars"), lit(86400L)).cast("long")
    val payload = unhex(concat(
      beHexL(pmod(col("doc_id"), lit(65536L)), 2), // ID
      lit("8180"),                                 // QR=response, RD/RA
      beHexL(lit(1L), 2), beHexL(lit(1L), 2),      // QDCOUNT, ANCOUNT
      beHexL(lit(0L), 2), beHexL(lit(0L), 2),      // NSCOUNT, ARCOUNT
      beHexL(col("len1"), 1),
      expr("repeat('61', CAST(len1 AS INT))"),     // label1 = 'a' × len1
      lit("036E6574"), lit("00"),                  // label2 "net", root
      beHexL(lit(1L), 2), beHexL(lit(1L), 2),      // QTYPE=A, QCLASS=IN
      lit("C00C"),                                 // answer NAME: ptr -> 12
      beHexL(lit(1L), 2), beHexL(lit(1L), 2),      // TYPE, CLASS
      beHexL(ttl, 4), beHexL(lit(4L), 2),          // TTL, RDLENGTH
      beHexL(pmod(col("doc_id"), lit(256L)), 1), lit("0A0001"))) // RDATA
    val withP = base.select(col("doc_id"), payload.as("p"))
      .withColumn("bytes", prefixBytes(col("p"), 64))
    def be(pos: Int, len: Int) = beAt(col("bytes"), pos, len)
    def bAt(p: org.apache.spark.sql.Column) =
      element_at(col("bytes"), p.cast("int"))
    val len1 = be(13, 1)
    val aoff = lit(23L) + len1 // answer record start (1-based)
    val ptrB0 = bAt(aoff)
    val ptrOff = pmod(ptrB0, lit(64L)) * 256L + bAt(aoff + 1L) // low 14 bits
    withP.select(col("doc_id"),
        (be(5, 2) === 1L && be(7, 2) === 1L).as("counts_ok"),
        (shiftright(be(3, 2), 15) === 1L).as("is_response"),
        // label-chain decode: len-prefixed labels joined with '.'
        concat(col("p").substr(lit(14), len1.cast("int")).cast("string"),
          lit("."),
          col("p").substr((lit(15L) + len1).cast("int"), lit(3)).cast("string"))
          .as("qname"),
        // pointer: flag bits 11, offset dereferences to the QNAME start
        (pmod(shiftright(ptrB0, 6), lit(4L)) === 3L).as("ptr_flag_ok"),
        ptrOff.as("ptr_target"),
        // THE BACKREFERENCE PROOF: the first label length read THROUGH
        // the pointer equals the directly-parsed one
        (bAt(ptrOff + 1L) === len1).as("ptr_deref_ok"),
        be(5, 2).as("n_questions"),
        (bAt(aoff + 6L) * 16777216L + bAt(aoff + 7L) * 65536L +
          bAt(aoff + 8L) * 256L + bAt(aoff + 9L)).as("ttl"),
        concat(bAt(aoff + 12L).cast("string"), lit("."),
          bAt(aoff + 13L).cast("string"), lit("."),
          bAt(aoff + 14L).cast("string")).as("ip_prefix"))
      .orderBy(col("doc_id"))
  }

  val dnsPacketSql: String =
    """SELECT doc_id, TRUE AS counts_ok, TRUE AS is_response,
      |       repeat('a', CAST(1 + doc_id % 10 AS INT)) || '.net' AS qname,
      |       TRUE AS ptr_flag_ok, CAST(12 AS BIGINT) AS ptr_target,
      |       TRUE AS ptr_deref_ok, CAST(1 AS BIGINT) AS n_questions,
      |       CAST(n_chars % 86400 AS BIGINT) AS ttl,
      |       CAST(doc_id % 256 AS VARCHAR) || '.10.0' AS ip_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  /** STANDARD MIDI FILE header + first track event (25th codec) —
    * two mechanisms no earlier codec exercises:
    *  1. the MSB-FIRST variable-length quantity: the delta-time's
    *     7-bit groups arrive MOST-significant-first with the
    *     continuation flag on the high bit — the exact mirror image
    *     of WASM's LSB-first LEB128, so an implementation that
    *     reuses the LEB fold decodes every multi-byte delta wrong
    *     (and the oracle, replaying the generating law, catches it);
    *  2. the DIVISION field's sign-dispatch: one u16 whose HIGH BIT
    *     selects the interpretation of its own bytes — metrical
    *     (the whole u16 = ticks/quarter) vs SMPTE, where the high
    *     byte is a NEGATIVE two's-complement frame rate (−24/−25/
    *     −29/−30 stored as 232/231/227/226) and the low byte is
    *     ticks/frame.
    * Plus the BE chunk discipline ("MThd" len=6, "MTrk" len =
    * vlq_width + 3 — the parse PROVES the variable advance by
    * checking the track length against the decoded width). All
    * codegen byte arithmetic over a deterministic synthesized
    * payload, like the rest of the codec family. */
  def midiHeader(spark: SparkSession, dir: String): DataFrame = {
    def beHexL(v: org.apache.spark.sql.Column, n: Int) =
      concat((0 until n).map(i =>
        lpad(hex(shiftright(v, 8 * (n - 1 - i)) % 256), 2, "0")): _*)
    val base = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("fmt", pmod(col("doc_id"), lit(3L)))
      .withColumn("ntrks", lit(1L) + pmod(col("doc_id"), lit(4L)))
      .withColumn("metrical", pmod(col("doc_id"), lit(2L)) === 0L)
      .withColumn("tpq", lit(96L) + pmod(col("doc_id"), lit(384L)))
      .withColumn("fps",
        when(pmod(col("doc_id"), lit(4L)) === 0L, 24L)
          .when(pmod(col("doc_id"), lit(4L)) === 1L, 25L)
          .when(pmod(col("doc_id"), lit(4L)) === 2L, 29L).otherwise(30L))
      .withColumn("tpf", lit(4L) + pmod(col("doc_id"), lit(40L)))
      .withColumn("delta", pmod(col("doc_id") * 37L, lit(2097152L)))
      .withColumn("note", pmod(col("doc_id"), lit(128L)))
      .withColumn("vlqw", when(col("delta") < 128L, 1L)
        .when(col("delta") < 16384L, 2L).otherwise(3L))
    val divHex = when(col("metrical"), beHexL(col("tpq"), 2))
      .otherwise(concat(lpad(hex(lit(256L) - col("fps")), 2, "0"),
        lpad(hex(col("tpf")), 2, "0")))
    // MSB-first groups: all but the LAST byte carry the 0x80 flag
    val vlqHex = when(col("delta") < 128L, lpad(hex(col("delta")), 2, "0"))
      .when(col("delta") < 16384L, concat(
        lpad(hex(shiftright(col("delta"), 7) + 128L), 2, "0"),
        lpad(hex(pmod(col("delta"), lit(128L))), 2, "0")))
      .otherwise(concat(
        lpad(hex(shiftright(col("delta"), 14) + 128L), 2, "0"),
        lpad(hex(pmod(shiftright(col("delta"), 7), lit(128L)) + 128L), 2, "0"),
        lpad(hex(pmod(col("delta"), lit(128L))), 2, "0")))
    val payload = unhex(concat(
      lit("4D546864"), lit("00000006"),          // "MThd", len 6
      beHexL(col("fmt"), 2), beHexL(col("ntrks"), 2), divHex,
      lit("4D54726B"), beHexL(col("vlqw") + 3L, 4), // "MTrk", len
      vlqHex, lit("90"), lpad(hex(col("note")), 2, "0"), lit("40")))
    val bytes = base.select(col("doc_id"), prefixBytes(payload, 32).as("bytes"))
    def bAt(p: org.apache.spark.sql.Column) =
      element_at(col("bytes"), p.cast("int"))
    val div = beAt(col("bytes"), 13, 2)
    val isMetrical = div < 32768L
    val b1 = bAt(lit(23L))
    val b2 = bAt(lit(24L))
    val w = when(b1 < 128L, 1L).when(b2 < 128L, 2L).otherwise(3L)
    val delta = when(b1 < 128L, b1)
      .when(b2 < 128L, (b1 - 128L) * 128L + b2)
      .otherwise((b1 - 128L) * 16384L + (b2 - 128L) * 128L + bAt(lit(25L)))
    bytes
      .withColumn("vlq_width", w)
      .select(col("doc_id"),
        (beAt(col("bytes"), 1, 4) === 0x4D546864L &&
          beAt(col("bytes"), 5, 4) === 6L &&
          beAt(col("bytes"), 15, 4) === 0x4D54726BL &&
          beAt(col("bytes"), 19, 4) === col("vlq_width") + 3L &&
          bAt(lit(23L) + col("vlq_width")) === 144L).as("magic_ok"),
        beAt(col("bytes"), 9, 2).as("format"),
        beAt(col("bytes"), 11, 2).as("ntrks"),
        when(isMetrical, "metrical").otherwise("smpte").as("division_mode"),
        when(isMetrical, div).as("ticks_per_quarter"),
        // SMPTE: high byte is −fps two's-complement → fps = 256 − hi
        when(!isMetrical, lit(256L) - shiftright(div, 8)).as("smpte_fps"),
        when(!isMetrical, pmod(div, lit(256L))).as("ticks_per_frame"),
        delta.as("delta_ticks"), col("vlq_width"),
        bAt(lit(24L) + col("vlq_width")).as("note"))
      .orderBy(col("doc_id"))
  }

  val midiHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(doc_id % 3 AS BIGINT) AS format,
      |       CAST(1 + doc_id % 4 AS BIGINT) AS ntrks,
      |       CASE WHEN doc_id % 2 = 0 THEN 'metrical' ELSE 'smpte' END
      |         AS division_mode,
      |       CASE WHEN doc_id % 2 = 0 THEN CAST(96 + doc_id % 384 AS BIGINT) END
      |         AS ticks_per_quarter,
      |       CASE WHEN doc_id % 2 = 1 THEN
      |         CAST(CASE doc_id % 4 WHEN 0 THEN 24 WHEN 1 THEN 25
      |                              WHEN 2 THEN 29 ELSE 30 END AS BIGINT) END
      |         AS smpte_fps,
      |       CASE WHEN doc_id % 2 = 1 THEN CAST(4 + doc_id % 40 AS BIGINT) END
      |         AS ticks_per_frame,
      |       CAST((doc_id * 37) % 2097152 AS BIGINT) AS delta_ticks,
      |       CAST(CASE WHEN (doc_id * 37) % 2097152 < 128 THEN 1
      |                 WHEN (doc_id * 37) % 2097152 < 16384 THEN 2
      |                 ELSE 3 END AS BIGINT) AS vlq_width,
      |       CAST(doc_id % 128 AS BIGINT) AS note
      |FROM documents ORDER BY doc_id""".stripMargin

  /** EBML (Matroska/WebM) header + Segment envelope (26th codec) —
    * the THIRD distinct varint mechanism in the family and two more
    * no earlier codec exercises:
    *  1. the EBML VINT: the encoded WIDTH is announced by the
    *     position of the first set bit of the FIRST byte (1xxxxxxx =
    *     1 byte, 01xxxxxx = 2, 001xxxxx = 3, …) and the marker bit is
    *     STRIPPED from the value — no per-byte continuation bits at
    *     all, so both the LEB128 fold (WASM) and the MSB-first VLQ
    *     fold (MIDI) decode the same bytes wrong (a 0x40 0x0F size is
    *     15 in EBML, 64 in either continuation-bit scheme, which
    *     would misplace every subsequent element);
    *  2. the ID/size ASYMMETRY: element IDs are VINTs that KEEP their
    *     marker bit (DocType is 0x4282 as stored), sizes strip it —
    *     one mechanism, two decode rules;
    *  3. the all-value-bits-set UNKNOWN-SIZE sentinel (0xFF at width
    *     1 means "size unknown", the streaming-Segment convention) —
    *     the inverse of ICO's 0-means-256 sentinel.
    * The synthesized payloads vary the header-size VINT width (1 vs
    * 2 bytes, same value — EBML permits non-minimal encodings), the
    * DocType length (webm/matroska, which MOVES every later offset —
    * the variable-advance proof), and the Segment size VINT across
    * width 1, width 3, and the unknown sentinel; the oracle replays
    * the generating law, so a wrong width rule or an unstripped
    * marker cannot hash-match. */
  def ebmlHeader(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("dtlen", when(pmod(col("doc_id"), lit(5L)) < 3L, 4L).otherwise(8L))
      .withColumn("hdrsize", col("dtlen") + 7L)
      .withColumn("ver", lit(1L) + pmod(col("doc_id"), lit(4L)))
      .withColumn("segcase", pmod(col("doc_id"), lit(3L)))
      .withColumn("segv3", pmod(col("doc_id") * 13L, lit(2097151L)))
      .withColumn("segv1", pmod(col("doc_id"), lit(127L)))
    def h2(v: org.apache.spark.sql.Column) = lpad(hex(v), 2, "0")
    val hdrSizeHex = when(pmod(col("doc_id"), lit(2L)) === 0L,
      h2(col("hdrsize") + 128L))                       // width 1: 1xxxxxxx
      .otherwise(concat(lit("40"), h2(col("hdrsize")))) // width 2: 01 marker
    val dtHex = when(col("dtlen") === 4L, lit("7765626D")) // "webm"
      .otherwise(lit("6D6174726F736B61"))                 // "matroska"
    val segHex = when(col("segcase") === 0L, lit("FF"))   // unknown sentinel
      .when(col("segcase") === 1L, concat(
        h2(shiftright(col("segv3"), 16) + 32L),           // 001xxxxx
        h2(pmod(shiftright(col("segv3"), 8), lit(256L))),
        h2(pmod(col("segv3"), lit(256L)))))
      .otherwise(h2(col("segv1") + 128L))
    val payload = unhex(concat(
      lit("1A45DFA3"), hdrSizeHex,
      lit("4282"), h2(col("dtlen") + 128L), dtHex,
      lit("4287"), lit("81"), h2(col("ver")),
      lit("18538067"), segHex))
    val withP = base.select(col("doc_id"), payload.as("p"))
      .withColumn("bytes", prefixBytes(col("p"), 32))
    def bAt(p: org.apache.spark.sql.Column) =
      element_at(col("bytes"), p.cast("int"))
    // header-size VINT: width from the first byte's leading bit
    val sb = bAt(lit(5L))
    val hdrW = when(sb >= 128L, 1L).otherwise(2L)
    val hdrSize = when(sb >= 128L, sb - 128L)
      .otherwise((sb - 64L) * 256L + bAt(lit(6L)))
    val sub = lit(5L) + hdrW                 // DocType element start
    val dtl = bAt(sub + 2L) - 128L           // its size VINT (width 1)
    val verPos = sub + 3L + dtl              // DocTypeVersion element
    val segIdPos = verPos + 4L               // Segment element
    val ssb = bAt(segIdPos + 4L)             // Segment size first byte
    val segW = when(ssb >= 128L, 1L).when(ssb >= 64L, 2L)
      .when(ssb >= 32L, 3L).otherwise(4L)
    val segVal = when(segW === 1L, ssb - 128L)
      .when(segW === 2L, (ssb - 64L) * 256L + bAt(segIdPos + 5L))
      .otherwise((ssb - 32L) * 65536L + bAt(segIdPos + 5L) * 256L +
        bAt(segIdPos + 6L))
    // all value bits set = unknown size (2^(7w) − 1)
    val segUnknown = segVal === when(segW === 1L, 127L).when(segW === 2L, 16383L)
      .when(segW === 3L, 2097151L).otherwise(268435455L)
    withP.select(col("doc_id"),
        (beAt(col("bytes"), 1, 4) === 0x1A45DFA3L &&
          bAt(sub) === 0x42L && bAt(sub + 1L) === 0x82L &&
          bAt(verPos) === 0x42L && bAt(verPos + 1L) === 0x87L &&
          bAt(verPos + 2L) === 0x81L &&
          bAt(segIdPos) * 16777216L + bAt(segIdPos + 1L) * 65536L +
            bAt(segIdPos + 2L) * 256L + bAt(segIdPos + 3L) === 0x18538067L)
          .as("magic_ok"),
        hdrW.as("hdr_vint_width"), hdrSize.as("hdr_size"),
        col("p").substr((sub + 3L).cast("int"), dtl.cast("int"))
          .cast("string").as("doctype"),
        bAt(verPos + 3L).as("doctype_version"),
        segW.as("seg_vint_width"), segUnknown.as("seg_unknown"),
        when(!segUnknown, segVal).as("seg_size"))
      .orderBy(col("doc_id"))
  }

  val ebmlHeaderSql: String =
    """SELECT doc_id, TRUE AS magic_ok,
      |       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
      |         AS hdr_vint_width,
      |       CAST(CASE WHEN doc_id % 5 < 3 THEN 11 ELSE 15 END AS BIGINT)
      |         AS hdr_size,
      |       CASE WHEN doc_id % 5 < 3 THEN 'webm' ELSE 'matroska' END AS doctype,
      |       CAST(1 + doc_id % 4 AS BIGINT) AS doctype_version,
      |       CAST(CASE doc_id % 3 WHEN 1 THEN 3 ELSE 1 END AS BIGINT)
      |         AS seg_vint_width,
      |       doc_id % 3 = 0 AS seg_unknown,
      |       CASE doc_id % 3
      |            WHEN 1 THEN CAST((doc_id * 13) % 2097151 AS BIGINT)
      |            WHEN 2 THEN CAST(doc_id % 127 AS BIGINT) END AS seg_size
      |FROM documents ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_midi_header" -> (midiHeader _),
    "mm_ebml_header" -> (ebmlHeader _),
    "mm_dns_packet" -> (dnsPacket _),
    "mm_class_header" -> (classHeader _),
    "mm_sqlite_header" -> (sqliteHeader _),
    "mm_pcap_header" -> (pcapHeader _),
    "mm_wasm_header" -> (wasmHeader _),
    "mm_ico_header" -> (icoHeader _),
    "mm_ogg_page" -> (oggPage _),
    "mm_webp_header" -> (webpHeader _),
    "mm_elf_header" -> (elfHeader _),
    "mm_tar_header" -> (tarHeader _),
    "mm_zip_eocd" -> (zipEocd _),
    "mm_mp4_boxes" -> (mp4Boxes _),
    "mm_parquet_footer" -> (parquetFooter _),
    "mm_npy_header" -> (npyHeader _),
    "mm_gzip_header" -> (gzipHeader _),
    "mm_warc_record" -> (warcRecord _),
    "mm_tiff_header" -> (tiffHeader _),
    "mm_flac_header" -> (flacHeader _),
    "mm_mp3_header" -> (mp3Header _),
    "mm_jpeg_header" -> (jpegHeader _),
    "mm_audio_rms" -> (audioRms _),
    "mm_gif_header" -> (gifHeader _),
    "mm_bmp_header" -> (bmpHeader _),
    "mm_wav_header" -> (wavHeader _),
    "mm_png_header" -> (pngHeader _),
    "mm_byte_histogram" -> (byteHistogram _),
    "mm_resize" -> (resizePayload _),
    "mm_decode_stub" -> (decodeStub _),
    "mm_meta_pruning" -> (metaPruning _),
    "mm_frame_sample" -> (frameSample _)
  )

  def oracle: Map[String, String] = Map(
    "mm_midi_header" -> midiHeaderSql,
    "mm_ebml_header" -> ebmlHeaderSql,
    "mm_dns_packet" -> dnsPacketSql,
    "mm_class_header" -> classHeaderSql,
    "mm_sqlite_header" -> sqliteHeaderSql,
    "mm_pcap_header" -> pcapHeaderSql,
    "mm_wasm_header" -> wasmHeaderSql,
    "mm_ico_header" -> icoHeaderSql,
    "mm_ogg_page" -> oggPageSql,
    "mm_webp_header" -> webpHeaderSql,
    "mm_elf_header" -> elfHeaderSql,
    "mm_tar_header" -> tarHeaderSql,
    "mm_zip_eocd" -> zipEocdSql,
    "mm_mp4_boxes" -> mp4BoxesSql,
    "mm_parquet_footer" -> parquetFooterSql,
    "mm_npy_header" -> npyHeaderSql,
    "mm_gzip_header" -> gzipHeaderSql,
    "mm_warc_record" -> warcRecordSql,
    "mm_tiff_header" -> tiffHeaderSql,
    "mm_flac_header" -> flacHeaderSql,
    "mm_mp3_header" -> mp3HeaderSql,
    "mm_jpeg_header" -> jpegHeaderSql,
    "mm_audio_rms" -> audioRmsSql,
    "mm_gif_header" -> gifHeaderSql,
    "mm_bmp_header" -> bmpHeaderSql,
    "mm_wav_header" -> wavHeaderSql,
    "mm_png_header" -> pngHeaderSql,
    "mm_byte_histogram" -> byteHistogramSql,
    "mm_resize" -> resizePayloadSql,
    "mm_decode_stub" -> decodeStubSql,
    "mm_meta_pruning" -> metaPruningSql,
    "mm_frame_sample" -> frameSampleSql
  )
}
