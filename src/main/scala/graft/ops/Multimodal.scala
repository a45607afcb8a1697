package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, chunk/frame sampling, and a decode
  * stub.
  *
  * The testdata has no real media, so the payload is derived
  * deterministically from `documents.text` (UTF-8 bytes) — documented
  * in the oracle SQL. Everything Spark-side (binary schema, per-row
  * metadata extraction, bounded frame explode, batch shape) is real;
  * only the codec byte-decode is a clearly-marked deterministic fake
  * ([[decodeStub]]), to be swapped for a real codec UDF where the
  * image/audio libraries exist.
  */
object Multimodal {

  /** Deterministic binary payload: UTF-8 bytes of `text`. */
  def payload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Typed metadata per payload: byte length, leading-bytes magic (hex),
    * sha-256 digest. Pure per-row map — no shuffle. */
  def binaryMeta(docs: DataFrame): DataFrame =
    payload(docs).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      sha2(col("payload"), 256).as("digest"))

  /** Fixed-size frame decomposition + every-`stride`-th sampling:
    * posexplode of bounded `frameSize`-byte chunks. The explode factor
    * is len/frameSize — bounded and known, so the plan's row growth is
    * predictable at 100 TB. Output: doc_id, frame_idx, frame_len,
    * frame_hex (leading-bytes fingerprint as hex — engine-neutral, so
    * the DuckDB oracle can re-derive it from the blob; xxhash64 would
    * be Spark-only). */
  def frameSample(docs: DataFrame, frameSize: Int = 64, stride: Int = 4): DataFrame = {
    // empty payloads contribute no frames — without this guard,
    // sequence(0, -1) would produce the DESCENDING sequence [0, -1]
    // (Spark's default step is -1 when stop < start) and emit a bogus
    // zero-length frame row the oracle doesn't have
    val p = payload(docs).filter(length(col("payload")) > 0)
    val nFrames = ceil(length(col("payload")).cast("double") / frameSize).cast("int")
    p.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1),
          i => substring(col("payload"), (i * frameSize) + 1, lit(frameSize)))).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        length(col("frame")).cast("bigint").as("frame_len"),
        substring(hex(col("frame")), 1, 16).as("frame_hex"))
  }

  /** STUB — deterministic fake media decode. A real deployment replaces
    * this with a codec call (image decode / audio PCM / video frame
    * extraction) in a vectorized UDF; the schema and batch shape here
    * are the real contract. The fake derives fixed "dimensions" and a
    * small feature vector from the payload bytes, so downstream plumbing
    * is testable end-to-end. */
  def decodeStub(payloadCol: Column, features: Int = 8): Column = {
    val h = xxhash64(payloadCol)
    struct(
      (pmod(h, lit(1920L)) + 1).cast("int").as("width"),
      (pmod(h / 1920L, lit(1080L)) + 1).cast("int").as("height"),
      lit(3).as("channels"),
      transform(sequence(lit(0), lit(features - 1)),
        i => pmod(xxhash64(payloadCol, i), lit(1000L)).cast("double") / 1000.0).as("features"))
  }

  /** Decoded-metadata table via the stub: doc_id + decoded struct. */
  def decoded(docs: DataFrame): DataFrame =
    payload(docs).select(col("doc_id"), decodeStub(col("payload")).as("media"))

  /** STUB — deterministic fake resize: produces a fixed-size payload of
    * exactly `outBytes` by cycling the source bytes (a real codec
    * resamples pixels; the Spark-side contract — bounded output size
    * per row, pure per-row map, binary-in/binary-out — is the real
    * part). Implemented as hex → repeat-to-cover → truncate → unhex. */
  def resizeStub(payloadCol: Column, outBytes: Int): Column = {
    val hexStr = hex(payloadCol)
    val times  = ceil(lit(outBytes * 2).cast("double") / length(hexStr)).cast("int")
    when(length(payloadCol) > 0,
      unhex(substring(repeat(hexStr, times), 1, outBytes * 2)))
      .otherwise(payloadCol)
  }

  /** Typed decode-batch contract: doc_id + payload in, typed media out. */
  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaOut(doc_id: Long, width: Int, height: Int,
                            channels: Int, features: Array[Float])

  /** Batched typed decode via `mapPartitions` — the Scala analog of a
    * vectorized (pandas-style) decode UDF: the codec is invoked once
    * per partition iterator, so per-call setup (codec init, native lib
    * handles) amortizes across the batch, and the output is a typed
    * `Dataset[MediaOut]` with a case-class Encoder.
    *
    * STUB: the per-record byte decode is [[fakeDecode]], a deterministic
    * fake — swap it for a real codec; the partitioning, batch shape and
    * schema contract stay as-is. */
  def decodeBatch(docs: DataFrame): org.apache.spark.sql.Dataset[MediaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    payload(docs).select(col("doc_id"), col("payload")).as[MediaIn]
      .mapPartitions { batch =>
        // per-partition setup would init the real codec here, once
        batch.map(m => fakeDecode(m))
      }
  }

  final case class WavOut(doc_id: Long, sample_rate: Int, channels: Int,
                          bits: Int, n_samples: Long, amp_sum: Long, amp_max: Int)

  /** REAL container decode for ONE simple format — WAV/RIFF PCM16 —
    * inside the same typed mapPartitions contract as [[decodeBatch]]
    * (exotic codecs stay stubbed; this one demonstrates the byte-level
    * path end-to-end). The fixture WAVs are genuine RIFF containers
    * built by [[buildWav]] from deterministic per-doc parameters
    * (sample rate 8/12/16 kHz by doc_id%3, 1-2 channels by doc_id%2,
    * 64+len%64 frames, PCM16 samples ((doc_id·31+k·17)%65536)−32768),
    * so the DuckDB oracle verifies the DECODED fields analytically —
    * if the chunk walk or PCM16 little-endian read is off by a byte,
    * amp_sum diverges. Pure per-row work, no shuffle. */
  def wavDecodeBatch(docs: DataFrame): org.apache.spark.sql.Dataset[WavOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => parseWav(id, buildWav(id, len)) }
      }
  }

  /** Builds a valid RIFF/WAVE container: RIFF header, 16-byte fmt
    * chunk (PCM), data chunk of interleaved little-endian int16. */
  private[graft] def buildWav(docId: Long, textLen: Int): Array[Byte] = {
    val sr = 8000 + (docId % 3).toInt * 4000
    val ch = 1 + (docId % 2).toInt
    val frames = 64 + textLen % 64
    val ns = frames * ch
    val dataSize = ns * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(ch.toShort).putInt(sr).putInt(sr * ch * 2)
      .putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < ns) {
      bb.putShort((((docId * 31 + k * 17) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /** Strict RIFF chunk walk: validates the RIFF/WAVE magics, reads the
    * fmt chunk fields, then folds the data chunk's PCM16 samples into
    * count / sum / max. Malformed input throws — per-record isolation
    * belongs to the caller, exactly like a real codec binding. */
  private[graft] def parseWav(docId: Long, bytes: Array[Byte]): WavOut = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    val riffSize = bb.getInt
    require(riffSize == bytes.length - 8, s"doc $docId: bad RIFF size")
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var sr = 0; var ch = 0; var bits = 0
    var n = 0L; var sum = 0L; var max = Int.MinValue
    while (bb.remaining() >= 8) {
      val id = tag(); val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort == 1, s"doc $docId: not PCM")
          ch = bb.getShort; sr = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
          bb.position(fmtEnd)
        case "data" =>
          require(bits == 16, s"doc $docId: data before fmt or non-16-bit")
          var off = 0
          while (off < size) {
            val s = bb.getShort.toInt
            n += 1; sum += s; if (s > max) max = s
            off += 2
          }
        case _ => bb.position(bb.position() + size + (size & 1)) // skip, pad
      }
    }
    WavOut(docId, sr, ch, bits, n, sum, max)
  }

  final case class WavFeat(doc_id: Long, n_samples: Long, channels: Int,
                           zc_n: Long, energy_l1: Long, energy_l2: Long, peak: Int)

  /** Audio FEATURE extraction over the same honest RIFF/PCM16 decode as
    * [[wavDecodeBatch]] — the "feature-extract" stage of a multimodal
    * pipeline, not just the container walk: per-channel zero-crossing
    * count (strict sign flip, prev·cur < 0 within a channel across the
    * interleaved stream — the classic voiced/unvoiced & noisiness
    * heuristic), L1 and L2 energy, and peak |amplitude|. All integer
    * folds: Σs² ≤ n·2³⁰ stays far inside BIGINT for any per-document
    * clip (a single audio file's length is bounded by its container,
    * unlike a table's row count — per-doc sums never need DECIMAL).
    * Pure per-row work in the typed mapPartitions codec contract; the
    * oracle re-derives every field analytically from the fixture
    * formula, so an interleave/channel-stride bug diverges. */
  def wavFeatureBatch(docs: DataFrame): org.apache.spark.sql.Dataset[WavFeat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => parseWavFeat(id, buildWav(id, len)) }
      }
  }

  /** Same strict RIFF walk as [[parseWav]], folding features instead of
    * the decode audit fields. Zero crossings compare each sample with
    * its predecessor IN THE SAME CHANNEL (stride = channel count over
    * the interleaved frames); a zero sample never crosses (product 0). */
  private[graft] def parseWavFeat(docId: Long, bytes: Array[Byte]): WavFeat = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", s"doc $docId: not a RIFF container")
    require(bb.getInt == bytes.length - 8, s"doc $docId: bad RIFF size")
    require(tag() == "WAVE", s"doc $docId: not a WAVE form")
    var ch = 0; var bits = 0
    var n = 0L; var zc = 0L; var l1 = 0L; var l2 = 0L; var peak = 0
    while (bb.remaining() >= 8) {
      val id = tag(); val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          require(bb.getShort == 1, s"doc $docId: not PCM")
          ch = bb.getShort; bb.getInt; bb.getInt; bb.getShort
          bits = bb.getShort
          bb.position(fmtEnd)
        case "data" =>
          require(bits == 16 && ch > 0, s"doc $docId: data before fmt or non-16-bit")
          val prev = new Array[Int](ch)
          var off = 0; var k = 0
          while (off < size) {
            val s = bb.getShort.toInt
            val c = k % ch
            if (k >= ch && prev(c) * s < 0) zc += 1
            prev(c) = s
            val a = math.abs(s)
            n += 1; l1 += a; l2 += s.toLong * s; if (a > peak) peak = a
            off += 2; k += 1
          }
        case _ => bb.position(bb.position() + size + (size & 1))
      }
    }
    WavFeat(docId, n, ch, zc, l1, l2, peak)
  }

  final case class PpmOut(doc_id: Long, width: Int, height: Int,
                          maxval: Int, n_samples: Long, pix_sum: Long, pix_max: Int)

  /** Second HONEST container decode — binary PPM (P6), the image
    * sibling of [[wavDecodeBatch]]: a real whitespace-delimited ASCII
    * header ("P6\n<w> <h>\n<maxval>\n") followed by w·h RGB byte
    * triples, genuinely built per doc by [[buildPpm]]
    * (w = 4 + len%13, h = 2 + doc_id%7, maxval 255, byte k =
    * (doc_id·7 + k·13) % 256) and strictly re-parsed by [[parsePpm]] —
    * so the oracle verifies the DECODED fields analytically and a
    * header-tokenizer or payload off-by-one diverges. Pure per-row
    * work in the same typed mapPartitions contract; no shuffle. */
  def ppmDecodeBatch(docs: DataFrame): org.apache.spark.sql.Dataset[PpmOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => parsePpm(id, buildPpm(id, len)) }
      }
  }

  /** Builds a valid binary PPM (P6) image. */
  private[graft] def buildPpm(docId: Long, textLen: Int): Array[Byte] = {
    val w = 4 + textLen % 13
    val h = 2 + (docId % 7).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = Array.tabulate(w * h * 3)(k => ((docId * 7 + k * 13) % 256).toByte)
    header ++ body
  }

  /** Strict P6 parse: magic, three whitespace-delimited ASCII decimal
    * header fields (any `\s` runs, as the spec allows), then exactly
    * w·h·3 payload bytes folded into count / sum / max. Malformed
    * input throws — per-record isolation belongs to the caller. */
  private[graft] def parsePpm(docId: Long, bytes: Array[Byte]): PpmOut = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"doc $docId: not a P6 PPM")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def nextInt(): Int = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      require(pos > start, s"doc $docId: truncated PPM header")
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    pos += 1 // the single whitespace byte that terminates the header
    require(maxval == 255, s"doc $docId: unsupported maxval $maxval")
    require(bytes.length - pos == w * h * 3,
      s"doc $docId: payload ${bytes.length - pos} != ${w * h * 3}")
    var n = 0L; var sum = 0L; var max = -1
    while (pos < bytes.length) {
      val v = bytes(pos) & 0xff
      n += 1; sum += v; if (v > max) max = v
      pos += 1
    }
    PpmOut(docId, w, h, maxval, n, sum, max)
  }

  final case class PpmFeat(doc_id: Long, width: Int, height: Int,
                           r_sum: Long, g_sum: Long, b_sum: Long,
                           r_max: Int, g_max: Int, b_max: Int,
                           r_min: Int, g_min: Int, b_min: Int)

  /** Per-CHANNEL image statistics over the honest P6 decode — the image
    * sibling of [[wavFeatureBatch]]'s channel-stride logic: the payload
    * is interleaved RGB triples, so channel = byte index mod 3, and a
    * stride bug that wavFeatureBatch's sum/max audits would miss shows
    * up here as swapped channel sums. Per-channel sum/min/max are the
    * inputs to white-balance and dead-channel screening — the cheap
    * per-image gate an image-corpus pipeline runs before any decode-
    * heavy featurization. Integer folds only; pure per-row work in the
    * typed codec contract. */
  def ppmFeatureBatch(docs: DataFrame): org.apache.spark.sql.Dataset[PpmFeat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => parsePpmFeat(id, buildPpm(id, len)) }
      }
  }

  /** Same strict header walk as [[parsePpm]], folding per-channel. */
  private[graft] def parsePpmFeat(docId: Long, bytes: Array[Byte]): PpmFeat = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"doc $docId: not a P6 PPM")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def nextInt(): Int = {
      while (pos < bytes.length && isWs(bytes(pos))) pos += 1
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      require(pos > start, s"doc $docId: truncated PPM header")
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    pos += 1
    require(maxval == 255, s"doc $docId: unsupported maxval $maxval")
    require(bytes.length - pos == w * h * 3,
      s"doc $docId: payload ${bytes.length - pos} != ${w * h * 3}")
    val sums = new Array[Long](3)
    val maxs = Array(-1, -1, -1); val mins = Array(256, 256, 256)
    var k = 0
    while (pos < bytes.length) {
      val v = bytes(pos) & 0xff; val c = k % 3
      sums(c) += v
      if (v > maxs(c)) maxs(c) = v
      if (v < mins(c)) mins(c) = v
      pos += 1; k += 1
    }
    PpmFeat(docId, w, h, sums(0), sums(1), sums(2),
      maxs(0), maxs(1), maxs(2), mins(0), mins(1), mins(2))
  }

  final case class BmpOut(doc_id: Long, width: Int, height: Int,
                          row_stride: Int, n_bytes: Long, pix_sum: Long,
                          b_sum: Long, g_sum: Long, r_sum: Long,
                          top_row_sum: Long)

  /** Third HONEST container decode — uncompressed BI_RGB BMP, a
    * genuinely different walk from the RIFF chunk tour and the ASCII
    * PPM header: little-endian BITMAPFILEHEADER/BITMAPINFOHEADER
    * structs, BGR byte order, rows stored BOTTOM-UP, and each row
    * padded to a 4-byte boundary. The fixture BMPs are real containers
    * built by [[buildBmp]] from deterministic parameters
    * (w = 3 + len%11 — every stride-pad residue 0..3 occurs,
    * h = 1 + doc_id%5, payload byte k (padding excluded, stored
    * order) = (doc_id·11 + k·19) % 256), so the DuckDB oracle replays
    * the decoded fields analytically: folding a padding byte shifts
    * the BGR channel phase (b/g/r sums diverge), and mis-ordering the
    * bottom-up rows diverges top_row_sum — the logical TOP row is the
    * LAST stored one. Pure per-row work in the typed codec contract;
    * no shuffle. */
  def bmpDecodeBatch(docs: DataFrame): org.apache.spark.sql.Dataset[BmpOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => parseBmp(id, buildBmp(id, len)) }
      }
  }

  /** Builds a valid 24-bit BI_RGB BMP: 14-byte file header, 40-byte
    * info header, bottom-up rows padded to 4 bytes with zeros. */
  private[graft] def buildBmp(docId: Long, textLen: Int): Array[Byte] = {
    val w = 3 + textLen % 11
    val h = 1 + (docId % 5).toInt
    val rowRaw = w * 3
    val stride = (rowRaw + 3) & ~3
    val imgSize = stride * h
    val bb = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54) // reserved ×2, pixel-data offset
    bb.putInt(40).putInt(w).putInt(h) // biSize, width, height (bottom-up)
      .putShort(1).putShort(24) // planes, bits per pixel
      .putInt(0).putInt(imgSize) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // ppm ×2, palette ×2
    var k = 0; var row = 0
    while (row < h) {
      var i = 0
      while (i < rowRaw) {
        bb.put(((docId * 11 + k * 19) % 256).toByte); k += 1; i += 1
      }
      var p = rowRaw
      while (p < stride) { bb.put(0.toByte); p += 1 }
      row += 1
    }
    bb.array()
  }

  /** Strict struct walk: validates both headers (magic, file size,
    * data offset, biSize, planes, 24 bpp, BI_RGB, positive height),
    * then folds each stored row's w·3 payload bytes — skipping the
    * stride padding — into total/per-channel sums, and the LAST stored
    * row (the logical top, bottom-up order) into top_row_sum.
    * Malformed input throws — per-record isolation belongs to the
    * caller, exactly like a real codec binding. */
  private[graft] def parseBmp(docId: Long, bytes: Array[Byte]): BmpOut = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bb.get() == 'B' && bb.get() == 'M',
      s"doc $docId: not a BMP container")
    require(bb.getInt == bytes.length, s"doc $docId: bad BMP file size")
    bb.getInt // reserved
    val dataOff = bb.getInt
    require(bb.getInt == 40, s"doc $docId: not a BITMAPINFOHEADER")
    val w = bb.getInt; val h = bb.getInt
    require(w > 0 && h > 0, s"doc $docId: top-down or empty BMP unsupported")
    require(bb.getShort == 1, s"doc $docId: bad plane count")
    require(bb.getShort == 24, s"doc $docId: not 24-bit")
    require(bb.getInt == 0, s"doc $docId: not BI_RGB (uncompressed)")
    val rowRaw = w * 3
    val stride = (rowRaw + 3) & ~3
    require(bytes.length - dataOff == stride * h,
      s"doc $docId: payload ${bytes.length - dataOff} != ${stride * h}")
    var n = 0L; var sum = 0L; var topSum = 0L
    val ch = new Array[Long](3)
    var row = 0
    while (row < h) {
      val base = dataOff + row * stride
      var i = 0
      while (i < rowRaw) {
        val v = bytes(base + i) & 0xff
        n += 1; sum += v; ch(i % 3) += v
        if (row == h - 1) topSum += v // last stored row = logical top
        i += 1
      }
      row += 1
    }
    BmpOut(docId, w, h, stride, n, sum, ch(0), ch(1), ch(2), topSum)
  }

  final case class PhashOut(doc_id: Long, width: Int, height: Int,
                            mean_u8: Int, c0: Long, c1: Long, c2: Long,
                            c3: Long, nbits: Int)

  /** Perceptual average-hash (aHash) over the HONEST P6 decode
    * ([[ppmDecodeBatch]]): 64 stride-sampled payload bytes, each bit =
    * "sample strictly above the image mean", shipped as four 16-bit
    * chunk columns c0..c3 (low to high) so the hamming-radius-3 pairing
    * in [[phashPairs]] is a pigeonhole equi-join on chunk values — the
    * image-domain sibling of Dedup.simhashPairs. All-integer output
    * (§5 doctrine): the mean comparison is the cross-multiplication
    * `byte·n > pix_sum`, never a float divide. Pure per-row
    * mapPartitions in the same typed codec contract as the decoders;
    * no shuffle. Sample k_i = (i·n) div 64 covers the payload
    * uniformly whatever the image size, so hashes of same-content
    * images agree across (w, h) only when the byte stream agrees —
    * which is the aHash contract, not a resize-invariance claim. */
  def phashBatch(docs: DataFrame): org.apache.spark.sql.Dataset[PhashOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, len) => phash(id, buildPpm(id, len)) }
      }
  }

  /** Strict parse (via [[parsePpm]]) + 64-bit aHash from the decoded
    * payload bytes themselves — the oracle recomputes analytically
    * from the fixture formulas, so a sampling or threshold off-by-one
    * diverges. */
  private[graft] def phash(docId: Long, bytes: Array[Byte]): PhashOut = {
    val p = parsePpm(docId, bytes) // validates container + folds pix_sum
    val n = p.width * p.height * 3
    val off = bytes.length - n     // payload starts right after the header
    var hash = 0L; var nbits = 0; var i = 0
    while (i < 64) {
      val k = (i.toLong * n / 64).toInt
      if ((bytes(off + k) & 0xff).toLong * n > p.pix_sum) {
        hash |= 1L << i; nbits += 1
      }
      i += 1
    }
    PhashOut(docId, p.width, p.height, (p.pix_sum / n).toInt,
      hash & 0xffffL, (hash >>> 16) & 0xffffL,
      (hash >>> 32) & 0xffffL, (hash >>> 48) & 0xffffL, nbits)
  }

  /** Perceptual near-duplicate image pairs at hamming ≤ 3: the four
    * 16-bit chunks pigeonhole the radius (two hashes within distance 3
    * must agree on at least one chunk), so candidate pairing is an
    * equi-join on (chunk_idx, chunk_value) — never all-pairs — and the
    * verify step scores hamming per chunk column
    * (Σ bit_count(cᵢ ⊕ cᵢ')), keeping every value non-negative 16-bit
    * so the DuckDB replay needs no signed-64 emulation. Measured chunk
    * buckets on the synthetic corpus stay ≤ ~2·10⁻² of the corpus
    * (max 81 of 5000 docs at sf0.1, candidate volume ~2·10⁵), so the
    * join is skew-safe without salting. */
  def phashPairs(docs: DataFrame): DataFrame =
    phashPairsFromSigs(phashBatch(docs).toDF()
      .select(col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3")))

  /** [[phashPairs]] over an ALREADY-COMPUTED signature table (doc_id,
    * c0..c3) — the store-fed entry point, so the family's keys share
    * one decode+hash pass (the CorpusArtifacts memo) instead of
    * re-walking every image container per key. */
  def phashPairsFromSigs(sigs: DataFrame): DataFrame =
    phashChunkPairs(sigs, rightFilter = lit(true))

  /** Incremental perceptual-hash dedup — the phash STORE cadence: the
    * old corpus's 4-chunk signatures (32 bytes/doc) persist in a
    * parquet store; a landing shard decodes and hashes ONLY its own
    * images, appends its signatures, and pairs shard-vs-(store ∪
    * shard) through the same radius-3 pigeonhole join — one join side
    * is the SHARD's chunks, so old-old pairs never become candidates
    * and history's raw media is never re-read. `isNew` marks the
    * shard by doc_id. */
  def phashIncremental(docs: DataFrame, isNew: Column => Column): DataFrame =
    phashIncrementalFromSigs(phashBatch(docs).toDF()
      .select("doc_id", "c0", "c1", "c2", "c3"), isNew)

  /** [[phashIncremental]] over an already-computed signature table —
    * the hash is per-row, so slicing a shared table by the shard
    * predicate is byte-identical to hashing each slice separately. */
  def phashIncrementalFromSigs(sigs: DataFrame,
                               isNew: Column => Column): DataFrame = {
    val spark = sigs.sparkSession
    val store = graft.sources.Scratch.dir("graft_phash_store_")
    sigs.filter(!isNew(col("doc_id"))).write.parquet(s"$store/v0")
    sigs.filter(isNew(col("doc_id"))).write.parquet(s"$store/v1")
    phashChunkPairs(spark.read.parquet(s"$store/v0", s"$store/v1"),
      rightFilter = isNew(col("doc_id")))
  }

  /** The radius-3 pigeonhole pairing over a 4-chunk signature table:
    * chunk-equality candidates (the right side restricted by
    * `rightFilter` — lit(true) pairs everything; a shard predicate
    * makes history pair only AGAINST the shard), canonical
    * (least, greatest) orientation, per-chunk hamming verify,
    * distinct (dedupes chunk multiplicity AND both orientations). */
  private def phashChunkPairs(sigs: DataFrame, rightFilter: Column): DataFrame = {
    val chunked = sigs.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3"))).as(Seq("ci", "cv")))
    def side(df: DataFrame, tag: String) = df.select(
      col("ci"), col("cv"), col("doc_id").as(s"id$tag"),
      col("c0").as(s"c0$tag"), col("c1").as(s"c1$tag"),
      col("c2").as(s"c2$tag"), col("c3").as(s"c3$tag"))
    val ham = (0 to 3).map(j =>
      bit_count(col(s"c${j}a").bitwiseXOR(col(s"c${j}b"))).cast("int"))
      .reduce(_ + _) // XOR is symmetric — orientation-independent
    side(chunked, "a").join(side(chunked.filter(rightFilter), "b"), Seq("ci", "cv"))
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** STUB — deterministic fake byte decode (same arithmetic as
    * [[decodeStub]]'s hash-derived fields, computed JVM-side). */
  private def fakeDecode(m: MediaIn): MediaOut = {
    // xxhash64-free deterministic fake: FNV-1a over the payload bytes
    var h = 0xcbf29ce484222325L
    m.payload.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    def um(x: Long, mod: Long): Long = { val r = x % mod; if (r < 0) r + mod else r }
    MediaOut(
      m.doc_id,
      (um(h, 1920L) + 1).toInt,
      (um(h / 1920L, 1080L) + 1).toInt,
      3,
      Array.tabulate(8)(i => um(h ^ (i * 0x9e3779b97f4a7c15L), 1000L).toFloat / 1000f))
  }
}
