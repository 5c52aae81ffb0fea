package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, with batch-shaped feature extraction.
  *
  * The Spark-side contract is real — schema, partition sizing, batch
  * iteration — and [[MediaCodec]] has one REAL pure-JVM implementation,
  * [[BmpCodec]] (BMP header parse: dimensions from actual bytes), plus
  * the deterministic [[FakeCodec]] stub for formats this environment has
  * no libraries for. A real deployment swaps in a JNI/javax.imageio
  * codec without touching the plan: the operator shape (mapPartitions
  * over batches of blobs, emitting fixed-width feature structs) is what
  * matters at 100 TB — blobs never shuffle, features do.
  */
object Multimodal {

  /** Canonical asset schema: id + opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Decode stub: a real implementation would wrap an image/audio codec.
    * This deterministic fake derives pseudo-features from the bytes so
    * the pipeline is testable end-to-end. */
  trait MediaCodec extends Serializable {
    def decodeDims(payload: Array[Byte]): (Int, Int)
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String]
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  // shared little-endian / magic-byte helpers for the three real codecs
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  // RIFF size fields are UNSIGNED 32-bit; the signed read goes negative
  // past 2 GiB, so size-like fields must go through this widening
  private def leUInt(b: Array[Byte], off: Int): Long =
    leInt(b, off) & 0xffffffffL
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  // JPEG segment lengths and SOF dims are BIG-endian, unlike the RIFF
  // family — one shared widened read so no sign surprises past 0x7fff
  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  // PNG chunk lengths and IHDR dims are big-endian int32 (spec caps them
  // at 2^31−1, so the signed read is safe where RIFF's was not)
  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def magic(b: Array[Byte], off: Int, s: String): Boolean =
    s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }

  /** Deterministic fake codec: dims and frame hashes derived from md5 of
    * the payload. Marks exactly where a real decoder plugs in. */
  object FakeCodec extends MediaCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      val h = md5hex(payload)
      // pseudo-dims in [16, 4111] — stands in for a real header parse
      (16 + Integer.parseInt(h.substring(0, 3), 16),
        16 + Integer.parseInt(h.substring(3, 6), 16))
    }
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String] =
      (0 until n).map(i => md5hex(payload ++ Array(i.toByte)))
  }

  /** REAL codec for one pure-JVM public format: BMP. Dimensions come
    * from an actual header parse — the 14-byte BITMAPFILEHEADER ("BM"
    * magic) followed by a BITMAPINFOHEADER whose biWidth/biHeight are
    * little-endian int32 at byte offsets 18/22 — not from a hash of the
    * bytes. A negative biHeight is the legal top-down row order and
    * reports as its magnitude. Frame samples for a still image are
    * content fingerprints (md5 of payload + sample index), the same
    * contract [[FakeCodec]] stubs; a video codec would replace them with
    * decoded-frame hashes. Malformed payloads throw — callers pick the
    * skip-vs-fail policy via [[extractFeatures]]'s `routeErrors` flag
    * (null payloads are already nulled there). */
  object BmpCodec extends MediaCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      require(payload.length >= 26 &&
        payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
        "not a BMP payload (missing BM magic or truncated header)")
      (leInt(payload, 18), math.abs(leInt(payload, 22)))
    }
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String] =
      (0 until n).map(i => md5hex(payload ++ Array(i.toByte)))
  }

  /** REAL codec for the image format a crawled corpus actually contains:
    * JPEG. Dimensions come from a marker SCAN, not a pixel decode — the
    * JPEG stream is a sequence of `0xFF`-prefixed segments, each (except
    * the standalone markers) carrying a big-endian 16-bit length, and
    * the frame header (SOF0 baseline / SOF2 progressive / any other
    * SOFn) holds height and width as big-endian 16-bit fields at payload
    * offsets 3 and 5. The scan walks segment-to-segment from SOI,
    * skipping APPn/DQT/DHT/COM by their declared lengths, and stops at
    * the first SOF — it never touches entropy-coded data, so it costs
    * O(header) bytes per asset regardless of image size, exactly what a
    * 100-TB dimension-profiling pass wants. `0xC4`/`0xC8`/`0xCC` look
    * like SOF codes but are DHT/JPG/DAC and are skipped as ordinary
    * segments. Malformed payloads throw; callers pick skip-vs-fail via
    * [[extractFeatures]]'s `routeErrors`, the BMP-path policy. */
  object JpegCodec extends MediaCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      require(payload.length >= 4 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
        "not a JPEG payload (missing SOI marker)")
      var pos = 2
      while (pos + 3 < payload.length) {
        require((payload(pos) & 0xff) == 0xff,
          "JPEG marker desync (segment length lied)")
        // consecutive 0xff bytes are legal fill before any marker
        var p = pos
        while (p + 2 < payload.length && (payload(p + 1) & 0xff) == 0xff)
          p += 1
        val marker = payload(p + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          // TEM / RST0-7 / a stray mid-stream SOI are STANDALONE markers
          // — no length field. They are nonstandard before SOS, but a
          // real crawled JPEG carrying one (e.g. two streams
          // concatenated) must be stepped over (2 bytes), not misparsed
          // as a length-bearing segment whose "length" is whatever bytes
          // follow (JPEG spec marker taxonomy, ITU T.81 §B.1.1.3)
          pos = p + 2
        } else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF payload: [len:2][precision:1][height:2][width:2][...]
          require(p + 9 <= payload.length, "truncated JPEG SOF segment")
          val h = beShort(payload, p + 5)
          val w = beShort(payload, p + 7)
          require(w > 0 && h > 0, "degenerate JPEG frame (zero dimension)")
          return (w, h)
        } else {
          require(marker != 0xda && marker != 0xd9,
            "JPEG carries no SOF before SOS/EOI")
          require(p + 4 <= payload.length, "truncated JPEG segment header")
          val len = beShort(payload, p + 2)
          require(len >= 2, "corrupt JPEG segment length")
          pos = p + 2 + len
        }
      }
      throw new IllegalArgumentException("truncated JPEG: no SOF marker found")
    }
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String] =
      (0 until n).map(i => md5hex(payload ++ Array(i.toByte)))
  }

  /** A minimal canonical JFIF header (33 bytes): SOI, a 16-byte APP0
    * JFIF segment (forcing the scan to actually walk a segment by its
    * declared length), and a one-component SOF0 — or SOF2 for
    * `progressive = true`, so both frame-marker variants are exercised.
    * Header-only consumers like [[JpegCodec]] never reach entropy-coded
    * data, the [[bmpBytes]]/[[wavBytes]] trick. */
  def jpegBytes(width: Int, height: Int,
      progressive: Boolean = false): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      "JPEG dims are unsigned 16-bit")
    val buf = java.nio.ByteBuffer.allocate(33)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0xff.toByte).put(0xd8.toByte) // SOI
      .put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte) // version 1.1
      .put(0.toByte) // density units
      .putShort(1).putShort(1) // x/y density
      .put(0.toByte).put(0.toByte) // no thumbnail
      .put(0xff.toByte) // SOF marker
      .put(if (progressive) 0xc2.toByte else 0xc0.toByte)
      .putShort(11) // SOF len: 8 + 3 per component
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(1.toByte) // one component
      .put(1.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1, quant 0
    buf.array()
  }

  /** Wrap a doc corpus as REAL JPEG assets with closed-form dimensions
    * (width = 16 + id mod 1024, height = 16 + 11·id mod 1024; odd ids
    * progressive SOF2, even baseline SOF0) — the JPEG twin of
    * [[syntheticBmpAssets]]: the engine must recover the dims by an
    * actual marker scan while the oracle computes them arithmetically. */
  def syntheticJpegAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      jpegBytes((16 + id % 1024).toInt, (16 + (id * 11) % 1024).toInt,
        progressive = id % 2 == 1))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/jpeg").as("media_type"))
  }

  /** [[syntheticJpegAssets]] with planted corruption: every 13th asset
    * truncated to its first 10 bytes (inside the APP0 segment, so the
    * marker scan runs off the end without finding a SOF), the rest the
    * same valid closed-form JFIFs — the JPEG twin of
    * [[syntheticBmpAssetsCorrupted]] for the `routeErrors` policy. */
  def syntheticJpegAssetsCorrupted(docs: DataFrame): DataFrame = {
    val mk = udf { (id: Long) =>
      val full = jpegBytes((16 + id % 1024).toInt,
        (16 + (id * 11) % 1024).toInt, progressive = id % 2 == 1)
      if (id % 13 == 0) full.take(10) else full
    }
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/jpeg").as("media_type"))
  }

  /** REAL codec for the second image format a crawled corpus actually
    * contains: PNG. Dimensions are a FIXED-OFFSET parse — the PNG spec
    * (RFC 2083 §3) mandates the 8-byte signature is followed
    * immediately by the IHDR chunk, whose big-endian int32 width and
    * height sit at byte offsets 16 and 20 unconditionally — so unlike
    * the JPEG marker scan there is nothing to walk: O(1) bytes per
    * asset. The chunk header is still validated (declared length 13,
    * type "IHDR") so a renamed-but-not-PNG payload fails loudly rather
    * than reading garbage dims. Malformed payloads throw; callers pick
    * skip-vs-fail via [[extractFeatures]]'s `routeErrors`. */
  object PngCodec extends MediaCodec {
    private val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    def decodeDims(payload: Array[Byte]): (Int, Int) = {
      require(payload.length >= 24 &&
        payload.startsWith(sig),
        "not a PNG payload (missing signature or truncated IHDR)")
      require(beInt(payload, 8) == 13 && magic(payload, 12, "IHDR"),
        "not a PNG payload (first chunk is not a 13-byte IHDR)")
      val w = beInt(payload, 16)
      val h = beInt(payload, 20)
      // spec range is 1..2^31-1: zero is degenerate, and a negative
      // signed read means a value past the spec cap — both refuse
      require(w > 0 && h > 0, "degenerate PNG frame (zero dimension)")
      (w, h)
    }
    def frameSampleHashes(payload: Array[Byte], n: Int): Seq[String] =
      (0 until n).map(i => md5hex(payload ++ Array(i.toByte)))
  }

  /** A minimal spec-valid PNG prefix (33 bytes): signature + IHDR chunk
    * (8-bit truecolor, no interlace) with a REAL CRC32 over type+data,
    * so the fixture would survive a strict chunk-level validator.
    * Header-only consumers like [[PngCodec]] never need IDAT/IEND, the
    * [[bmpBytes]]/[[jpegBytes]] trick. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "PNG dims must be positive")
    val buf = java.nio.ByteBuffer.allocate(33)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
      .putInt(13) // IHDR data length
      .put("IHDR".getBytes("US-ASCII"))
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
    val crc = new java.util.zip.CRC32()
    crc.update(buf.array(), 12, 17) // over chunk type + data
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Wrap a doc corpus as REAL PNG assets with closed-form dimensions
    * (width = 16 + id mod 1024, height = 16 + 13·id mod 1024) — the PNG
    * twin of [[syntheticJpegAssets]]: the engine must recover the dims
    * by the actual IHDR parse while the oracle computes them
    * arithmetically. */
  def syntheticPngAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      pngBytes((16 + id % 1024).toInt, (16 + (id * 13) % 1024).toInt))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/png").as("media_type"))
  }

  /** [[syntheticPngAssets]] with planted corruption: every 13th asset
    * truncated to its first 12 bytes (signature + chunk length, ending
    * before the IHDR type), the rest the same valid closed-form PNGs —
    * the PNG twin of [[syntheticJpegAssetsCorrupted]] for the
    * `routeErrors` policy. */
  def syntheticPngAssetsCorrupted(docs: DataFrame): DataFrame = {
    val mk = udf { (id: Long) =>
      val full = pngBytes((16 + id % 1024).toInt,
        (16 + (id * 13) % 1024).toInt)
      if (id % 13 == 0) full.take(12) else full
    }
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/png").as("media_type"))
  }

  /** REAL codec for one pure-JVM public AUDIO format: canonical PCM WAV.
    * (channels, sample rate, duration) come from an actual RIFF header
    * parse — "RIFF"/"WAVE" magic, the fmt chunk's little-endian channel
    * count at offset 22, sample rate at 24 and byte rate at 28, and the
    * data chunk size at 40 — duration_ms = dataSize·1000 / byteRate in
    * exact integer arithmetic. Malformed payloads throw; route or fail
    * via [[extractAudioMeta]]'s `routeErrors`, the BMP-path policy. */
  object WavCodec {
    /** (channels, sample_rate_hz, duration_ms) from the header bytes. */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Long) = {
      require(payload.length >= 44 &&
        magic(payload, 0, "RIFF") && magic(payload, 8, "WAVE") &&
        magic(payload, 12, "fmt ") && magic(payload, 36, "data"),
        "not a canonical PCM WAV payload (missing RIFF/WAVE/fmt/data)")
      val channels = leShort(payload, 22)
      val sampleRate = leInt(payload, 24)
      val byteRate = leInt(payload, 28)
      // the data-chunk size is unsigned (a >2 GiB WAV is legal); a
      // signed read would yield a silently NEGATIVE duration
      val dataSize = leUInt(payload, 40)
      require(channels > 0 && sampleRate > 0 && byteRate > 0,
        "degenerate WAV header (zero channels/rate)")
      (channels, sampleRate, dataSize * 1000L / byteRate.toLong)
    }

    /** SAMPLE-level loudness statistics — the first consumer that reads
      * past the header into the PCM data chunk: total int16 sample
      * count (channels interleaved), peak |amplitude| (|−32768| = 32768,
      * hence Int), full-scale clipped-sample count (s = ±full scale),
      * and the exact integer sum of squares (32768² × a 2³¹-sample
      * payload still fits a long with headroom). The RMS/mean-square
      * ratio is left to the caller as ONE IEEE division of these exact
      * fields — the cross-engine-parity posture everywhere else in the
      * library. Truncated data chunks throw loudly. */
    def decodeSampleStats(payload: Array[Byte]): (Long, Int, Long, Long) = {
      decodeMeta(payload) // header validation, same loud contract
      val dataSize = leUInt(payload, 40)
      require(44L + dataSize <= payload.length,
        "WAV data chunk truncated (declared size exceeds payload)")
      require(dataSize % 2 == 0, "PCM16 data chunk has odd byte length")
      val n = (dataSize / 2).toInt
      var j = 0
      var peak = 0
      var clipped = 0L
      var sumsq = 0L
      while (j < n) {
        val s = leShort(payload, 44 + 2 * j).toShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        if (s == 32767 || s == -32768) clipped += 1
        sumsq += s.toLong * s.toLong
        j += 1
      }
      (n.toLong, peak, clipped, sumsq)
    }

    /** Silence segments of the data chunk: frames group into fixed
      * windows of `window` frames (tail window partial), a window is
      * silent iff the max |sample| across all its frames and channels is
      * < `threshold`, and runs of adjacent silent windows merge into one
      * segment. Returns frame-indexed `(start_frame, end_frame_excl)`
      * intervals in order; the tail segment clamps to the real frame
      * count. All-integer arithmetic over the decoded int16 samples, so
      * an oracle can replay the classification from the closed-form
      * sample formula. */
    def decodeSilenceSegments(
        payload: Array[Byte],
        window: Int,
        threshold: Int): Seq[(Long, Long)] = {
      require(window > 0, s"silence window must be positive, got $window")
      val (ch, _, _) = decodeMeta(payload)
      val dataSize = leUInt(payload, 40)
      require(44L + dataSize <= payload.length,
        "WAV data chunk truncated (declared size exceeds payload)")
      require(dataSize % 2 == 0, "PCM16 data chunk has odd byte length")
      val n = (dataSize / 2).toInt
      require(n % ch == 0, "sample count does not divide by channels")
      val frames = n / ch
      val nWin = (frames + window - 1) / window
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var w = 0
      var runStart = -1
      while (w < nWin) {
        val f0 = w * window
        val f1 = math.min(f0 + window, frames)
        var peak = 0
        var j = f0 * ch
        val end = f1 * ch
        while (j < end) {
          val a = math.abs(leShort(payload, 44 + 2 * j).toShort.toInt)
          if (a > peak) peak = a
          j += 1
        }
        if (peak < threshold) { if (runStart < 0) runStart = w }
        else if (runStart >= 0) {
          segs += ((runStart.toLong * window,
            math.min(w.toLong * window, frames.toLong)))
          runStart = -1
        }
        w += 1
      }
      if (runStart >= 0)
        segs += ((runStart.toLong * window, frames.toLong))
      segs.toSeq
    }
  }

  /** 64-bit ENERGY-GRADIENT fingerprint of a PCM WAV — the audio
    * sibling of [[dHashBmp]], completing the text/image/audio near-dup
    * triad: channel-0 frames split into 65 equal windows of
    * `frames div 65` (the integer-exact layout an oracle replays;
    * remainder frames ignored), window energy = Σ |sample| in exact
    * longs, and bit `b` = `e(b+1) > e(b)`. Like dHash, the hash
    * encodes GRADIENTS, not values, so uniform gain changes and small
    * per-sample perturbations (re-encodes, dither) leave it (nearly)
    * fixed — which is what makes it perceptual where byte equality is
    * not. Bit 63 rides the long's sign bit; compare via XOR/bit_count.
    * Payloads shorter than 65 frames throw loudly. */
  def energyHashWav(payload: Array[Byte]): Long = {
    val (ch, _, _) = WavCodec.decodeMeta(payload)
    val dataSize = leUInt(payload, 40)
    require(44L + dataSize <= payload.length,
      "WAV data chunk truncated (declared size exceeds payload)")
    require(dataSize % 2 == 0, "PCM16 data chunk has odd byte length")
    val n = (dataSize / 2).toInt
    require(n % ch == 0, "sample count does not divide by channels")
    val frames = n / ch
    require(frames >= 65, s"energy hash needs >= 65 frames, got $frames")
    val w = frames / 65
    val e = Array.tabulate(65) { wi =>
      var s = 0L
      var f = wi * w
      val end = f + w
      while (f < end) {
        s += math.abs(leShort(payload, 44 + 2 * (f * ch)).toShort.toInt)
        f += 1
      }
      s
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (e(b + 1) > e(b)) h |= 1L << b
      b += 1
    }
    h
  }

  /** (asset_id, afp) over an asset frame — the audio twin of
    * [[extractDHash]]: blobs stay inside the scan partition, 8 bytes
    * per asset leave it, so the downstream hamming self-join never
    * moves audio bytes. */
  def extractAudioFingerprint(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets, Seq(StructField("afp", LongType)),
      payload => Seq[Any](energyHashWav(payload)), routeErrors)

  /** The near-dup fixture for [[energyHashWav]]: one mono full-PCM WAV
    * per doc — samples from a middle-square mixer
    * (`((j·2657 + id·7919)² div 256) mod 65536 − 32768`, decorrelated
    * across ids AND adjacent samples, unlike a bare LCG whose
    * triangle-wave energies alias every asset's gradient bits into the
    * same alternating pattern) — plus, for every 17th doc, a PERTURBED
    * sibling at `asset_id = doc_id + 1000000` whose every 13th sample
    * shrinks up to 5 steps toward zero: re-encode-noise scale, so
    * sibling pairs land within a small hamming distance while
    * unrelated assets stay far. Everything is integer closed-form for
    * the oracle's arithmetic replay. */
  def syntheticWavNearDupAssets(docs: DataFrame): DataFrame = {
    def samples(id: Long, perturbed: Boolean): Array[Short] = {
      val n = (260 + id % 700).toInt
      Array.tabulate(n) { j =>
        val v = j * 2657L + id * 7919L
        val base = (((v * v) / 256L) % 65536L - 32768L).toInt
        val out =
          if (perturbed && j % 13 == 0)
            base - Integer.signum(base) * math.min(5, math.abs(base))
          else base
        out.toShort
      }
    }
    val mkBase = udf((id: Long) =>
      wavBytesWithSamples(1, 16000, samples(id, perturbed = false)))
    val mkSib = udf((id: Long) =>
      wavBytesWithSamples(1, 16000, samples(id, perturbed = true)))
    docs.select(
      col("doc_id").as("asset_id"),
      mkBase(col("doc_id")).as("payload"),
      lit("audio/wav").as("media_type"))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000000L).as("asset_id"),
          mkSib(col("doc_id")).as("payload"),
          lit("audio/wav").as("media_type")))
  }

  /** REAL codec for one pure-JVM public VIDEO container: AVI. Frame
    * geometry and timing come from an actual RIFF parse — "RIFF"/"AVI "
    * magic, the LIST/hdrl wrapper, and the avih main header's
    * little-endian dwMicroSecPerFrame (offset 32), dwTotalFrames (48),
    * dwWidth (64) and dwHeight (68) — duration_ms = µsPerFrame ·
    * totalFrames / 1000 in exact integer arithmetic. Completes the
    * image ([[BmpCodec]]) / audio ([[WavCodec]]) / video triad of
    * genuine header parsers; malformed payloads throw, with the same
    * route-or-fail policy via [[extractVideoMeta]]. */
  /** GIF89a block-structure codec. Unlike the fixed-offset BMP/AVI
    * headers, GIF metadata requires WALKING the variable-length block
    * stream — global color table, extension sub-blocks, per-frame image
    * descriptors with optional local color tables and length-prefixed
    * LZW sub-blocks — so the parse is a real cursor machine over the
    * bytes, not an offset read, and every truncation fails loudly with
    * the cursor's context. Frame count = image descriptors seen before
    * the 0x3B trailer; duration sums graphic-control delays
    * (centiseconds → ms). Pixel data is skipped by length, never
    * decoded — the metadata pass an ingest pipeline runs before
    * deciding which assets are worth full LZW decode. */
  object GifCodec {
    /** (width, height, n_frames, gct_entries, duration_ms). */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int, Int, Long) = {
      require(payload.length >= 14 && magic(payload, 0, "GIF89a"),
        "not a GIF89a payload (missing signature)")
      val w = leShort(payload, 6)
      val h = leShort(payload, 8)
      val packed = payload(10) & 0xFF
      val gctEntries =
        if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1) else 0
      var off = 13 + 3 * gctEntries
      var frames = 0
      var delayCs = 0L
      var done = false
      def skipSubBlocks(): Unit = {
        var len = -1
        while (len != 0) {
          require(off < payload.length, "GIF truncated inside sub-blocks")
          len = payload(off) & 0xFF
          off += 1 + len
        }
      }
      while (!done) {
        require(off < payload.length, "GIF truncated before trailer")
        (payload(off) & 0xFF) match {
          case 0x3B => done = true
          case 0x21 =>
            require(off + 2 <= payload.length, "GIF truncated in extension")
            val label = payload(off + 1) & 0xFF
            off += 2
            if (label == 0xF9) {
              require(off + 6 <= payload.length &&
                (payload(off) & 0xFF) == 4,
                "malformed graphic control extension")
              delayCs += leShort(payload, off + 2)
            }
            skipSubBlocks()
          case 0x2C =>
            require(off + 10 <= payload.length,
              "GIF truncated in image descriptor")
            val ipacked = payload(off + 9) & 0xFF
            val lct =
              if ((ipacked & 0x80) != 0) 1 << ((ipacked & 0x07) + 1) else 0
            off += 10 + 3 * lct
            require(off < payload.length, "GIF truncated before LZW data")
            off += 1 // LZW minimum code size
            skipSubBlocks()
            frames += 1
          case b => throw new IllegalArgumentException(
            f"unknown GIF block introducer 0x$b%02x at offset $off")
        }
      }
      (w, h, frames, gctEntries, delayCs * 10L)
    }
  }

  object AviCodec {
    /** (width, height, n_frames, duration_ms) from the header bytes. */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int, Long) = {
      require(payload.length >= 88 &&
        magic(payload, 0, "RIFF") && magic(payload, 8, "AVI ") &&
        magic(payload, 12, "LIST") && magic(payload, 20, "hdrl") &&
        magic(payload, 24, "avih"),
        "not an AVI payload (missing RIFF/AVI /hdrl/avih)")
      val usPerFrame = leInt(payload, 32)
      val nFrames = leInt(payload, 48)
      val w = leInt(payload, 64)
      val h = leInt(payload, 68)
      require(usPerFrame > 0, "degenerate AVI header (zero frame period)")
      // these dwords are unsigned; values past 2^31 don't fit the Int
      // surface, and silently-negative frames/dims must not flow through
      require(nFrames >= 0 && w >= 0 && h >= 0,
        "AVI header field exceeds the signed 32-bit surface")
      (w, h, nFrames, usPerFrame.toLong * nFrames.toLong / 1000L)
    }
  }

  /** A minimal canonical AVI header (88 bytes): RIFF/AVI wrapper, LIST
    * hdrl, and a 56-byte avih main header declaring the frame period,
    * frame count and geometry — header-only consumers like [[AviCodec]]
    * never read movi data, the [[bmpBytes]]/[[wavBytes]] trick. */
  def aviBytes(width: Int, height: Int, nFrames: Int,
      usPerFrame: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(88)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(80) // riff chunk size (header-only)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII"))
      .putInt(68) // list size
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII"))
      .putInt(56) // avih cb
      .putInt(usPerFrame) // dwMicroSecPerFrame (offset 32)
      .putInt(0) // dwMaxBytesPerSec
      .putInt(0) // dwPaddingGranularity
      .putInt(0x10) // dwFlags (HASINDEX)
      .putInt(nFrames) // dwTotalFrames (offset 48)
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwStreams
      .putInt(0) // dwSuggestedBufferSize
      .putInt(width) // dwWidth (offset 64)
      .putInt(height) // dwHeight (offset 68)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    buf.array()
  }

  /** Wrap a doc corpus as REAL AVI assets with closed-form parameters
    * (width = 160 + 16·(id mod 8), height = 120 + 8·(id mod 6), frames =
    * 24 + id mod 240, µs/frame = {33333, 41708} by id mod 2) — the
    * video twin of [[syntheticBmpAssets]]/[[syntheticWavAssets]]. */
  def syntheticAviAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      aviBytes((160 + 16 * (id % 8)).toInt, (120 + 8 * (id % 6)).toInt,
        (24 + id % 240).toInt, if (id % 2 == 0) 33333 else 41708))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("video/avi").as("media_type"))
  }

  /** Video-metadata extraction over batches — the shared [[extractMeta]]
    * scaffold for the video column: (asset_id, width, height, n_frames,
    * duration_ms [, decode_error]). */
  def extractVideoMeta(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("duration_ms", LongType)),
      payload => {
        val (w, h, nf, dur) = AviCodec.decodeMeta(payload)
        Seq[Any](w, h, nf, dur) // see the audio twin's widening note
      }, routeErrors)

  /** Synthetic per-frame signature assets with closed-form SCENE RUNS:
    * `24 + id mod 240` frames whose signature steps every `1 + id mod 7`
    * frames (`sig_i = (i−1) div L`) — the fixture for [[sceneCuts]]. In
    * a real deployment the signature array comes from a decode UDF
    * emitting one perceptual hash per sampled frame ([[FakeCodec]]'s
    * `frame_hashes` shape); the closed form lets the oracle re-derive
    * the cut positions with independent arithmetic. */
  def syntheticFrameSigAssets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("asset_id"),
      expr("transform(sequence(1L, 24 + doc_id % 240)," +
        " i -> cast((i - 1) div (1 + doc_id % 7) as int))").as("frame_sigs"))

  /** Synthetic near-dup VIDEO fixture: every doc is a video of
    * `24 + id mod 240` frames whose per-frame signatures are
    * `hash(doc_id, i)` — unique across the corpus, so distinct videos
    * share no frame w-window — and every `id mod 7 == 0` doc gets a
    * TRIMMED twin under `id + 10⁹`: the same signature stream minus its
    * first `1 + id mod 3` frames, the re-upload-with-the-intro-cut
    * shape. Closed form throughout, so the oracle re-derives the
    * expected pair set AND each pair's exact shingle Jaccard
    * ((n−k−w+1)/(n−w+1)) with independent arithmetic. */
  def syntheticVideoNearDupAssets(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").as("asset_id"),
      expr("transform(sequence(1L, 24 + doc_id % 240)," +
        " i -> hash(doc_id, i))").as("frame_sigs"))
    val twins = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000000L).as("asset_id"),
        expr("transform(sequence(2L + doc_id % 3, 24 + doc_id % 240)," +
          " i -> hash(doc_id, i))").as("frame_sigs"))
    base.unionByName(twins)
  }

  /** Perceptual VIDEO near-dup pairs by frame-shingle Jaccard: a video's
    * fingerprint is the SET of its length-`w` frame-signature windows
    * (shingle key = md5 of the joined window — 16 bytes, collision-free
    * in practice), and two videos pair when the Jaccard of their
    * shingle sets clears `threshold`. Sequence shingles are what single
    * frame hashes are not: ORDER-aware (a shuffled slideshow of the
    * same frames does not match) yet TRIM-robust — cutting an intro or
    * tail removes only the shingles touching it, so a re-upload with
    * the first seconds trimmed keeps (n−k−w+1)/(n−w+1) of the original
    * set and still clears any moderate threshold (the spec and the
    * oracle pin that closed form exactly).
    *
    * Scale shape: the video BLOBS never move — per video only (id,
    * shingle-key) pairs leave the scan, bounded by frame count. Pairing
    * is the inverted-index self-join on the shingle key: Σ df² join
    * rows over shingle posting lists, and a w-frame window is
    * drastically more selective than any single frame hash, so df
    * hovers near the true duplicate multiplicity. `maxShingleDf` caps
    * pathological posting lists (a boilerplate intro shared by a
    * million videos would otherwise pay df² for windows that carry no
    * identity signal — same contract as the text join's hot-gram cap);
    * the shingle frame is materialized once so the self-join's two
    * sides share the explode. Output: (id_a, id_b, jaccard),
    * id_a < id_b; videos shorter than `w` frames have no shingles and
    * never pair. */
  def videoShingleNearDupPairs(
      assets: DataFrame,
      framesCol: String = "frame_sigs",
      idCol: String = "asset_id",
      w: Int = 4,
      threshold: Double = 0.5,
      maxShingleDf: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w > 0, s"shingle width must be positive, got $w")
    require(threshold > 0.0 && threshold <= 1.0,
      s"videoShingleNearDupPairs needs threshold in (0,1], got $threshold")
    val arr = col(framesCol)
    val shingleArr = when(size(arr) < w,
      array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(arr) - (w - 1)),
        i => md5(concat_ws(",",
          transform(slice(arr, i, lit(w)), _.cast("string")))))))
    val exploded = assets
      .select(col(idCol).as("__vid"), explode(shingleArr).as("shingle"))
    val sh = graft.functions.Materialize(
      if (maxShingleDf <= 0) exploded
      else exploded
        .withColumn("__df",
          count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("__df") <= maxShingleDf)
        .drop("__df"))
    val sizes = sh.groupBy(col("__vid")).agg(count(lit(1)).as("sz"))
    sh.select(col("shingle"), col("__vid").as("id_a"))
      .join(sh.select(col("shingle"), col("__vid").as("id_b")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("__vid").as("id_a"), col("sz").as("sa")), "id_a")
      .join(sizes.select(col("__vid").as("id_b"), col("sz").as("sb")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Scene-change detection over a per-frame signature array: a CUT is
    * every 1-based frame position whose signature differs from its
    * predecessor — the shot-boundary primitive behind frame sampling
    * ("one keyframe per scene"), highlight extraction, and
    * dedup-by-scene. Signature equality stands in for a pHash distance
    * threshold; with thresholded signatures (quantized pHash) equality
    * IS the threshold test.
    *
    * A single narrow array expression — no shuffle, no explode; the
    * signature array is let-bound once via the one-element-`transform`
    * trick (see [[Dedup.shingles]]) so the positions filter does not
    * re-evaluate the (possibly expensive) frames expression per element.
    * `mean_scene_len` = frames / scenes, one IEEE division of exact
    * ints. Output: (…, n_frames, n_cuts, cuts_csv, mean_scene_len). */
  def sceneCuts(
      assets: DataFrame,
      framesCol: String = "frame_sigs",
      idCol: String = "asset_id"): DataFrame = {
    val packed = element_at(
      transform(array(col(framesCol)), arr => {
        // null-safe inequality: a decode-failure frame (null signature)
        // IS a shot boundary against any real neighbor — plain =!= would
        // null out and silently undercount cuts around bad frames
        val cuts = when(size(arr) < 2,
          array().cast(ArrayType(IntegerType)))
          .otherwise(filter(sequence(lit(2), size(arr)),
            i => !(element_at(arr, i) <=> element_at(arr, i - 1))))
        struct(
          size(arr).cast("long").as("n_frames"),
          size(cuts).cast("long").as("n_cuts"),
          concat_ws(",", transform(cuts, _.cast("string"))).as("cuts_csv"),
          (size(arr).cast("double") /
            (size(cuts) + 1).cast("double")).as("mean_scene_len"))
      }), 1)
    assets.select(col(idCol), col(framesCol))
      .withColumn("__sc", packed)
      .select(col(idCol),
        col("__sc.n_frames").as("n_frames"),
        col("__sc.n_cuts").as("n_cuts"),
        col("__sc.cuts_csv").as("cuts_csv"),
        col("__sc.mean_scene_len").as("mean_scene_len"))
  }

  /** Keyframe sampling — the consumer [[sceneCuts]]' scaladoc promises
    * ("one keyframe per scene"): one OUTPUT ROW per detected scene,
    * carrying the scene's 1-based ordinal, its opening frame position,
    * and that frame's signature — the row stream a downstream
    * feature-extraction / embedding stage consumes instead of every
    * frame (a 24 fps corpus at scene granularity is a ~100× frame-count
    * cut before the expensive per-frame model). Scene starts are frame
    * 1 plus every cut position (same null-safe boundary rule as
    * [[sceneCuts]]); the explode is the deliverable granularity, not
    * overhead — blobs still never move, only (id, idx, pos, sig)
    * quadruples. An empty frame array yields no rows. */
  def keyframes(
      assets: DataFrame,
      framesCol: String = "frame_sigs",
      idCol: String = "asset_id"): DataFrame = {
    val starts = element_at(
      transform(array(col(framesCol)), arr => {
        val cuts = when(size(arr) < 2,
          array().cast(ArrayType(IntegerType)))
          .otherwise(filter(sequence(lit(2), size(arr)),
            i => !(element_at(arr, i) <=> element_at(arr, i - 1))))
        when(size(arr) < 1, array().cast(ArrayType(IntegerType)))
          .otherwise(concat(array(lit(1)), cuts))
      }), 1)
    assets
      .select(col(idCol), col(framesCol),
        posexplode(starts).as(Seq("__k", "start_frame")))
      .select(col(idCol), (col("__k") + 1).as("scene_idx"),
        col("start_frame"),
        element_at(col(framesCol), col("start_frame")).as("sig"))
  }

  /** Audio-video alignment: which video cut points land inside audio
    * silence — the clip-segmentation question a caption/ASR pipeline
    * asks before cutting a long asset into training clips (a cut in
    * the middle of speech truncates a sentence; a cut inside dead air
    * is free). Inputs are the two extractors' own outputs ([[keyframes]]
    * scene starts, [[extractSilenceSegments]] intervals), so the heavy
    * work — decoding blobs into scene starts and PCM peaks — already
    * happened inside the scans and only per-asset METADATA rows meet
    * here: an equi-join on asset id whose per-key fan-out is bounded by
    * media length (scenes × silence windows), never by byte size.
    * `samplesPerFrame` is the exact rational bridge between the two
    * timelines (audio frames per video frame); a cut at 1-based video
    * frame f sits at sample `(f-1)·samplesPerFrame`, and it is "silent"
    * when some interval `[s, e)` contains that sample. Output: one row
    * per asset — `n_cuts`, `n_silent_cuts` (zero-silence assets count
    * 0 via the left join; the opening scene is not a cut). */
  def alignCutsToSilence(
      scenes: DataFrame,
      silence: DataFrame,
      samplesPerFrame: Long): DataFrame = {
    require(samplesPerFrame > 0,
      s"samplesPerFrame must be positive, got $samplesPerFrame")
    val cuts = scenes.filter(col("scene_idx") > 1)
      .select(col("asset_id"),
        ((col("start_frame") - 1).cast("long") * samplesPerFrame)
          .as("cut_sample"))
    val segs = silence.select(col("asset_id"),
      col("start_frame").as("__s"), col("end_frame").as("__e"))
    cuts.join(segs, Seq("asset_id"), "left")
      .groupBy(col("asset_id"), col("cut_sample"))
      .agg(max(when(col("__s").isNotNull &&
        col("cut_sample") >= col("__s") &&
        col("cut_sample") < col("__e"), 1L).otherwise(0L)).as("__silent"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_cuts"),
        sum(col("__silent")).as("n_silent_cuts"))
  }

  /** A COMPLETE 24-bit bottom-up BMP with REAL pixel data: pixel (x, y)
    * — y counted from the top — carries (x·31 + y·17) mod 256 in all
    * three channels, the closed form the resize oracle replays. Rows
    * are stored bottom-up and padded to 4 bytes per the BMP spec, so
    * [[resizeBmpNearest]] exercises genuine stride/row-order handling,
    * not a convenient flat array. */
  def bmpBytesWithPixels(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 1024 && height <= 1024,
      "pixel fixture dims must be in [1, 1024]")
    val stride = (width * 3 + 3) / 4 * 4
    val dataSize = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54) // file size, rsvd, offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(dataSize) // BI_RGB, image size
      .putInt(0).putInt(0).putInt(0).putInt(0) // ppm, palette
    var row = 0
    while (row < height) {
      val yTop = height - 1 - row // bottom-up storage
      var x = 0
      while (x < width) {
        val v = ((x * 31 + yTop * 17) % 256).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row += 1
    }
    buf.array()
  }

  /** REAL nearest-neighbor resize of a 24-bit uncompressed bottom-up
    * BMP — an actual pixel transform (source pixel (x·srcW div dstW,
    * y·srcH div dstH) for each destination pixel, exact integer
    * arithmetic so the mapping is engine-replayable), re-encoded as a
    * spec-valid BMP. This is the thumbnail/down-res step of an image
    * ingest pipeline done for the one format this JVM can decode
    * without native libraries; a production deployment swaps the codec,
    * not the operator shape ([[extractResizeProbes]]' mapPartitions
    * batches). Malformed payloads throw; route or fail via the shared
    * `routeErrors` policy. */
  def resizeBmpNearest(
      payload: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, "target dims must be positive")
    // mirror bmpBytesWithPixels' cap: without it, 54 + stride*h for a
    // huge request overflows Int and dies with an opaque allocate error
    // instead of a contract message
    require(dstW <= 4096 && dstH <= 4096,
      s"target dims ${dstW}x$dstH exceed the 4096x4096 resize cap")
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP payload (missing BM magic or truncated header)")
    val srcW = leInt(payload, 18)
    val srcH = leInt(payload, 22)
    require(srcW > 0 && srcH > 0,
      "resize requires a positive-dimension bottom-up BMP")
    require(leShort(payload, 28) == 24 && leInt(payload, 30) == 0,
      "resize supports 24-bit uncompressed BMP only")
    val off = leInt(payload, 10)
    val srcStride = (srcW * 3 + 3) / 4 * 4
    require(off >= 54 && payload.length.toLong >= off.toLong +
      srcStride.toLong * srcH, "truncated BMP pixel data")
    val dstStride = (dstW * 3 + 3) / 4 * 4
    val buf = java.nio.ByteBuffer.allocate(54 + dstStride * dstH)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dstStride * dstH).putInt(0).putInt(54)
      .putInt(40).putInt(dstW).putInt(dstH)
      .putShort(1).putShort(24)
      .putInt(0).putInt(dstStride * dstH)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    var row = 0
    while (row < dstH) {
      val yTop = dstH - 1 - row
      val sy = yTop * srcH / dstH
      val srcRowPos = off + (srcH - 1 - sy) * srcStride
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val p = srcRowPos + sx * 3
        buf.put(payload(p)).put(payload(p + 1)).put(payload(p + 2))
        x += 1
      }
      var pad = dstStride - dstW * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row += 1
    }
    buf.array()
  }

  /** Wrap a doc corpus as REAL pixel-carrying BMP assets with
    * closed-form dims (width = 4 + id mod 13, height = 4 + id mod 11)
    * and the [[bmpBytesWithPixels]] pixel formula — the fixture for the
    * genuine resize path. */
  def syntheticPixelBmpAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      bmpBytesWithPixels((4 + id % 13).toInt, (4 + id % 11).toInt))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/bmp").as("media_type"))
  }

  /** Resize every asset to (dstW, dstH) and emit PROBE PIXELS of the
    * resized image — (out_w, out_h) re-parsed from the re-encoded
    * header plus the blue-channel values at destination (1,2), (w/2,
    * h/2) and (w−1, h−1) — so the whole decode → resize → re-encode →
    * re-decode loop sits under the oracle: with [[bmpBytesWithPixels]]'
    * closed-form source pixels and nearest-neighbor's exact integer
    * mapping, each probe is pure arithmetic in (doc_id, dims). Blobs
    * never shuffle; probes (a few ints per asset) do. */
  def extractResizeProbes(
      assets: DataFrame,
      dstW: Int,
      dstH: Int,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("out_w", IntegerType),
        StructField("out_h", IntegerType),
        StructField("p12", IntegerType),
        StructField("pmid", IntegerType),
        StructField("pend", IntegerType)),
      payload => {
        val resized = resizeBmpNearest(payload, dstW, dstH)
        val w = leInt(resized, 18)
        val h = leInt(resized, 22)
        val off = leInt(resized, 10)
        val stride = (w * 3 + 3) / 4 * 4
        def px(x: Int, y: Int): Int =
          resized(off + (h - 1 - y) * stride + x * 3) & 0xff
        Seq[Any](w, h, px(1 min (w - 1), 2 min (h - 1)),
          px(w / 2, h / 2), px(w - 1, h - 1))
      }, routeErrors)

  /** 64-bit difference hash (dHash) of a 24-bit BMP — the standard
    * perceptual image fingerprint, and the image-side analogue of
    * [[Dedup.simhash]]: nearest-neighbor down-res to 9×8
    * ([[resizeBmpNearest]]; the extra column is what lets every one of
    * the 8 horizontal gradients per row exist), grayscale by integer
    * mean of the three channels, and set bit `y·8 + x` iff
    * `gray(x+1, y) > gray(x, y)`. The hash encodes GRADIENTS, not
    * values, so uniform brightness shifts and resolution changes leave
    * it (nearly) fixed — which is what makes it perceptual where
    * [[Dedup.exactDuplicates]] over payload bytes is not. Exact integer
    * arithmetic end-to-end: every bit is closed-form in the source
    * pixels, so an independent engine can replay it. Bit 63 rides the
    * long's sign bit — consumers compare via XOR/bit_count, never by
    * magnitude. */
  def dHashBmp(payload: Array[Byte]): Long = {
    val r = resizeBmpNearest(payload, 9, 8)
    val off = leInt(r, 10)
    val stride = (9 * 3 + 3) / 4 * 4
    def gray(x: Int, y: Int): Int = {
      val p = off + (8 - 1 - y) * stride + x * 3
      ((r(p) & 0xff) + (r(p + 1) & 0xff) + (r(p + 2) & 0xff)) / 3
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(x + 1, y) > gray(x, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** (asset_id, phash) over an asset frame — the extraction step of
    * perceptual image dedup. Blobs stay inside the scan partition; 8
    * bytes per asset leave it, so the downstream hamming self-join
    * never moves image bytes. */
  def extractDHash(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets, Seq(StructField("phash", LongType)),
      payload => Seq[Any](dHashBmp(payload)), routeErrors)

  /** Integer-factor audio decimation — the audio sibling of
    * [[resizeBmpNearest]] (down-res ingest: a 44.1 kHz archive feeding
    * an 11 kHz feature extractor). Keeps every `factor`-th FRAME (all
    * channels of it, so channel alignment survives) and re-encodes a
    * spec-valid PCM WAV at `rate / factor`. No filtering/interpolation
    * by design: nearest-frame decimation is the exact-integer transform
    * whose every output byte is closed-form in the input — the property
    * that puts the whole decode → decimate → re-encode → re-decode loop
    * under the oracle, exactly as the BMP resize does for pixels. A
    * production anti-aliased resampler slots in behind the same
    * signature. Non-divisible rates and truncated/odd data chunks
    * throw loudly. */
  def decimateWav(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0, s"decimation factor must be positive, got $factor")
    WavCodec.decodeMeta(payload) // loud header validation
    val ch = leShort(payload, 22)
    val rate = leInt(payload, 24)
    require(rate % factor == 0,
      s"sample rate $rate is not divisible by decimation factor $factor")
    val dataSize = leUInt(payload, 40)
    require(44L + dataSize <= payload.length,
      "WAV data chunk truncated (declared size exceeds payload)")
    require(dataSize % (2L * ch) == 0,
      "PCM16 data chunk is not frame-aligned")
    val nFrames = (dataSize / (2L * ch)).toInt
    val nKept = (nFrames + factor - 1) / factor
    val out = new Array[Short](nKept * ch)
    var k = 0
    while (k < nKept) {
      val srcPos = 44 + 2 * (k * factor) * ch
      var c = 0
      while (c < ch) {
        out(k * ch + c) = leShort(payload, srcPos + 2 * c).toShort
        c += 1
      }
      k += 1
    }
    wavBytesWithSamples(ch, rate / factor, out)
  }

  /** Decimate every asset by `factor` and emit PROBES of the re-encoded
    * result — output rate and frame count re-parsed from the new
    * header, plus channel-0 sample values at the first, middle and last
    * kept frame re-read from the new data chunk — so the full loop sits
    * under the oracle: with [[syntheticWavAssetsWithSamples]]'
    * closed-form samples, every probe is pure arithmetic in the doc id.
    * Blobs never shuffle; probes (five longs per asset) do. */
  def extractDecimateProbes(
      assets: DataFrame,
      factor: Int,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("out_rate", LongType),
        StructField("out_frames", LongType),
        StructField("p0", LongType),
        StructField("pmid", LongType),
        StructField("pend", LongType)),
      payload => {
        val d = decimateWav(payload, factor)
        val ch = leShort(d, 22)
        val n = (leUInt(d, 40) / (2L * ch)).toInt
        def sample(frame: Int): Long =
          leShort(d, 44 + 2 * frame * ch).toShort.toLong
        Seq[Any](leInt(d, 24).toLong, n.toLong,
          sample(0), sample(n / 2), sample(n - 1))
      }, routeErrors)

  /** A minimal canonical PCM WAV header (44 bytes) DECLARING `nSamples`
    * 16-bit samples — header-only consumers like [[WavCodec]] never read
    * the sample data, the same trick [[bmpBytes]] plays. */
  def wavBytes(channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + dataSize) // riff chunk size
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .putInt(16) // PCM fmt chunk size
      .putShort(1) // audio format = PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII"))
      .putInt(dataSize)
    buf.array()
  }

  /** Wrap a doc corpus as REAL WAV assets with closed-form parameters
    * (channels = 1 + id mod 2, rate = {8000, 16000, 44100} by id mod 3,
    * samples = 1000 + id mod 9000), so the header-parse path is
    * oracle-checkable: the engine recovers the audio metadata by
    * constructing and parsing actual RIFF bytes while the oracle
    * computes the same values arithmetically. */
  def syntheticWavAssets(docs: DataFrame): DataFrame = {
    val rates = Array(8000, 16000, 44100)
    val mk = udf((id: Long) =>
      wavBytes((1 + id % 2).toInt, rates((id % 3).toInt),
        (1000 + id % 9000).toInt))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("audio/wav").as("media_type"))
  }

  /** A full canonical PCM WAV — the [[wavBytes]] header plus an actual
    * int16-LE data chunk, for consumers that read samples
    * ([[WavCodec.decodeSampleStats]]). `samples` are interleaved across
    * channels; `nFrames · channels` must equal `samples.length`. */
  def wavBytesWithSamples(
      channels: Int,
      sampleRate: Int,
      samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0,
      "interleaved sample count must divide by channels")
    val header = wavBytes(channels, sampleRate, samples.length / channels)
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(header)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** WAV assets WITH closed-form PCM data (the sample-stats twin of
    * [[syntheticWavAssets]]): ch = 1 + id mod 2, rate by id mod 3,
    * n = 200 + id mod 800 frames, and interleaved sample j =
    * ((j·2657 + id·7919) mod 65536) − 32768 — a full-range integer
    * scramble the oracle replays arithmetically while the engine must
    * recover it from real RIFF bytes. */
  def syntheticWavAssetsWithSamples(docs: DataFrame): DataFrame = {
    val rates = Array(8000, 16000, 44100)
    val mk = udf { (id: Long) =>
      val ch = (1 + id % 2).toInt
      val total = ch * (200 + id % 800).toInt
      val samples = Array.tabulate(total)(j =>
        (((j * 2657L + id * 7919L) % 65536L) - 32768L).toShort)
      wavBytesWithSamples(ch, rates((id % 3).toInt), samples)
    }
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("audio/wav").as("media_type"))
  }

  /** A spec-valid animated GIF89a: logical screen + global color table,
    * then per frame a graphic-control extension (shared `delayCs`), an
    * image descriptor, and one closed-form LZW data sub-block (skipped
    * by length — structurally real, pixel-wise fake). `gctBits` ∈ [1,8]
    * sets 2^gctBits palette entries. */
  def gifBytes(
      width: Int, height: Int, frames: Int,
      gctBits: Int, delayCs: Int): Array[Byte] = {
    require(width >= 0 && width <= 0xFFFF && height >= 0 && height <= 0xFFFF,
      "GIF dims must fit u16")
    require(frames >= 1 && gctBits >= 1 && gctBits <= 8 &&
      delayCs >= 0 && delayCs <= 0xFFFF, "GIF fixture params out of range")
    val gct = 1 << gctBits
    val perFrameData = (0 until frames).map(f => 1 + f % 10)
    val size = 13 + 3 * gct +
      perFrameData.map(l => 8 + 10 + 1 + (1 + l) + 1).sum + 1
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
      .putShort(width.toShort).putShort(height.toShort)
      .put((0x80 | (gctBits - 1)).toByte) // GCT present, size field
      .put(0.toByte).put(0.toByte) // bg index, aspect
    (0 until 3 * gct).foreach(i => buf.put(((i * 37) % 256).toByte))
    perFrameData.zipWithIndex.foreach { case (dataLen, f) =>
      buf.put(0x21.toByte).put(0xF9.toByte).put(4.toByte) // GCE
        .put(0.toByte).putShort(delayCs.toShort).put(0.toByte)
        .put(0.toByte) // GCE terminator
      buf.put(0x2C.toByte) // image descriptor
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort)
        .put(0.toByte) // no local color table
      buf.put(8.toByte) // LZW minimum code size
      buf.put(dataLen.toByte)
      (0 until dataLen).foreach(i => buf.put(((f * 31 + i) % 256).toByte))
      buf.put(0.toByte) // data terminator
    }
    buf.put(0x3B.toByte)
    buf.array()
  }

  /** GIF assets with closed-form metadata: width = 16 + id mod 1024,
    * height = 16 + 7·id mod 1024, frames = 1 + id mod 5, palette =
    * 2^(1 + id mod 8) entries, per-frame delay = 10 + id mod 90 cs —
    * the engine must recover all of it by walking real GIF blocks while
    * the oracle computes the same values arithmetically. */
  def syntheticGifAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      gifBytes((16 + id % 1024).toInt, (16 + (id * 7) % 1024).toInt,
        (1 + id % 5).toInt, (1 + id % 8).toInt, (10 + id % 90).toInt))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/gif").as("media_type"))
  }

  /** GIF metadata extraction over batches — the [[extractMeta]] scaffold
    * around [[GifCodec.decodeMeta]]: (asset_id, width, height, n_frames,
    * gct_entries, duration_ms [, decode_error]). */
  def extractGifMeta(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("gct_entries", IntegerType),
        StructField("duration_ms", LongType)),
      payload => {
        val (w, h, n, gct, dur) = GifCodec.decodeMeta(payload)
        Seq[Any](w, h, n, gct, dur)
      }, routeErrors)

  /** Mono WAV assets with closed-form LOUD/QUIET structure for the
    * silence detector: frame window w of asset id is quiet iff
    * `(w + id) % 3 == 0`; quiet samples are `((j·31 + id·17) mod 129) −
    * 64` (|v| ≤ 64), loud samples the full-range scramble. The
    * classification is emergent on both sides — the engine measures
    * per-window peaks from real RIFF bytes, the oracle replays the same
    * sample formula — so neither engine is told which windows are
    * silent. Window width 50 matches [[extractSilenceSegments]]'s
    * default; n = 200 + id mod 800 frames exercises partial tails. */
  def syntheticWavSilenceAssets(docs: DataFrame): DataFrame = {
    val mk = udf { (id: Long) =>
      val n = (200 + id % 800).toInt
      val samples = Array.tabulate(n) { j =>
        if ((j / 50 + id) % 3 == 0)
          (((j * 31L + id * 17L) % 129L) - 64L).toShort
        else
          (((j * 2657L + id * 7919L) % 65536L) - 32768L).toShort
      }
      wavBytesWithSamples(1, 8000, samples)
    }
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("audio/wav").as("media_type"))
  }

  /** Silence-segment extraction over batches: per asset, the merged
    * frame intervals whose fixed windows all peak below `threshold`
    * ([[WavCodec.decodeSilenceSegments]]) — the voice-activity /
    * dead-air trim primitive an audio ingest pipeline runs before
    * transcription. One row per segment via posexplode (seg_idx is the
    * per-asset ordinal); assets with no silence contribute no rows, and
    * the blobs never move — only (id, interval) pairs leave the scan. */
  def extractSilenceSegments(
      assets: DataFrame,
      window: Int = 50,
      threshold: Int = 256,
      routeErrors: Boolean = false): DataFrame = {
    val segType = ArrayType(StructType(Seq(
      StructField("start_frame", LongType),
      StructField("end_frame", LongType))))
    val withSegs = extractMeta(assets,
      Seq(StructField("segs", segType)),
      payload => Seq[Any](
        WavCodec.decodeSilenceSegments(payload, window, threshold)
          .map { case (s, e) => Row(s, e) }),
      routeErrors)
    withSegs
      .select(col("asset_id"),
        posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .select(col("asset_id"), col("seg_idx").cast("long").as("seg_idx"),
        col("seg.start_frame"), col("seg.end_frame"))
  }

  /** Shared batch-extraction scaffold for the three modality extractors:
    * mapPartitions (a real codec amortizes per-partition init here, the
    * batch shape `mapInPandas`/`mapInArrow` gives Python pipelines), the
    * null-payload → null-features contract, and the opt-in `routeErrors`
    * policy (catch per payload, `decode_error` column with the message,
    * `e.toString` when the exception carries none). One copy of the
    * policy — the extractors supply only their metadata schema and the
    * payload decoder. */
  private def extractMeta(
      assets: DataFrame,
      metaFields: Seq[StructField],
      decode: Array[Byte] => Seq[Any],
      routeErrors: Boolean): DataFrame = {
    val out = StructType(
      StructField("asset_id", LongType) +: (
        if (routeErrors) metaFields :+ StructField("decode_error", StringType)
        else metaFields))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(out))
    val idIdx = assets.schema.fieldIndex("asset_id")
    val payloadIdx = assets.schema.fieldIndex("payload")
    val nMeta = metaFields.length
    assets.mapPartitions { it =>
      // per-partition codec init happens here in a real implementation
      val nulls: Seq[Any] = Seq.fill(nMeta)(null)
      def mkRow(id: Long, meta: Seq[Any], err: String): Row =
        if (routeErrors) Row.fromSeq(id +: (meta :+ err))
        else Row.fromSeq(id +: meta)
      it.map { r =>
        val id = r.getLong(idIdx)
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null)
          // a null blob yields null features (no decode was attempted,
          // so no decode_error either); one absent asset must not kill
          // a corpus-wide extraction job under either policy
          mkRow(id, nulls, null)
        else if (routeErrors) {
          try mkRow(id, decode(payload), null)
          catch {
            case scala.util.control.NonFatal(e) =>
              // getMessage can be null (bare NPEs from native-binding
              // glue); a null decode_error would be indistinguishable
              // from the absent-payload row, defeating the routed policy
              val msg =
                if (e.getMessage != null) e.getMessage else e.toString
              mkRow(id, nulls, msg)
          }
        } else mkRow(id, decode(payload), null)
      }
    }(enc)
  }

  /** Audio-metadata extraction over batches — the shared [[extractMeta]]
    * scaffold for the audio column: (asset_id, channels, sample_rate,
    * duration_ms [, decode_error]). */
  def extractAudioMeta(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("channels", IntegerType),
        StructField("sample_rate", IntegerType),
        StructField("duration_ms", LongType)),
      payload => {
        val (ch, sr, dur) = WavCodec.decodeMeta(payload)
        // Seq[Any]: without the ascription Scala numerically WIDENS the
        // ints to Long to unify the element type, and the encoder then
        // rejects java.lang.Long for the INT columns
        Seq[Any](ch, sr, dur)
      }, routeErrors)

  /** Sample-level audio loudness stats over batches — the data-chunk
    * consumer ([[WavCodec.decodeSampleStats]]) under the shared
    * [[extractMeta]] scaffold: (asset_id, n_samples, peak, n_clipped,
    * sumsq [, decode_error]). Derived ratios (mean square, RMS) are one
    * IEEE division of the exact fields at read time. */
  def extractAudioStats(
      assets: DataFrame,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("n_samples", LongType),
        StructField("peak", IntegerType),
        StructField("n_clipped", LongType),
        StructField("sumsq", LongType)),
      payload => {
        val (n, peak, clipped, sumsq) = WavCodec.decodeSampleStats(payload)
        Seq[Any](n, peak, clipped, sumsq)
      }, routeErrors)

  /** A minimal valid BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    * (BI_RGB, biSizeImage 0 — legal for uncompressed — and no pixel
    * array, which header-only consumers like [[BmpCodec]] never read). */
  def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54) // bfSize
      .putShort(0).putShort(0) // reserved
      .putInt(54) // bfOffBits
      .putInt(40) // biSize
      .putInt(width).putInt(height)
      .putShort(1) // biPlanes
      .putShort(24) // biBitCount
      .putInt(0) // biCompression = BI_RGB
      .putInt(0) // biSizeImage (0 legal for BI_RGB)
      .putInt(2835).putInt(2835) // 72 DPI
      .putInt(0).putInt(0) // palette
    buf.array()
  }

  /** Wrap a doc corpus as REAL BMP assets with closed-form dimensions
    * (width = 16 + id mod 1024, height = 16 + 7·id mod 1024), so the
    * header-parse path is oracle-checkable: the engine must recover the
    * dims by actually constructing and parsing BMP bytes, while the
    * oracle computes the same values arithmetically. */
  def syntheticBmpAssets(docs: DataFrame): DataFrame = {
    val mk = udf((id: Long) =>
      bmpBytes((16 + id % 1024).toInt, (16 + (id * 7) % 1024).toInt))
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/bmp").as("media_type"))
  }

  /** Wrap a text corpus as binary assets (deterministic fake payloads) —
    * gives the binary pipeline real data to run over in tests/benchmarks. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/fake").as("media_type"))

  /** Cheap, engine-portable payload features (no codec): size + digest.
    * Pure built-ins — stays in whole-stage codegen. */
  def payloadStats(payload: Column): Seq[(String, Column)] = Seq(
    "payload_bytes" -> length(payload).cast("long"),
    "payload_md5" -> md5(payload))

  /** Exact multimodal dedup: group assets by payload digest, keep the
    * min-id copy. The digest is computed where the blob lives, so the
    * shuffle carries (16-byte digest, id) pairs — never the payloads
    * themselves, which is the whole trick at 100 TB of media. One
    * map-side-combinable aggregation. Output: (payload_md5, n_assets,
    * survivor_id). */
  def payloadDedup(
      assets: DataFrame,
      idCol: String = "asset_id",
      payloadCol: String = "payload"): DataFrame =
    assets
      .select(md5(col(payloadCol)).as("payload_md5"), col(idCol))
      .groupBy(col("payload_md5"))
      .agg(count(lit(1)).as("n_assets"), min(col(idCol)).as("survivor_id"))

  /** Feature extraction over batches: mapPartitions so a real codec would
    * amortize per-partition init (model load, native buffers), the same
    * batch shape `mapInPandas`/`mapInArrow` gives Python pipelines.
    *
    * Failure policy for malformed (non-null) payloads is the caller's
    * choice: with `routeErrors = false` (default) a decode failure
    * propagates and fails the job — right for curated corpora where a bad
    * blob means a broken upstream. With `routeErrors = true` the decode is
    * wrapped per row and failures are ROUTED, not thrown: the output gains
    * a `decode_error` string column (null on success, the decode
    * exception's message on failure, with null features), so one truncated
    * blob in 10^10 can't abort a corpus-wide extraction — callers filter
    * or quarantine on `decode_error`. Mirrors the success/error routing of
    * the multi-way sink (reference `BatchUpdate.py:557-561` routes per-row
    * failures to an error bucket), and costs nothing on the clean path. */
  def extractFeatures(
      assets: DataFrame,
      codec: MediaCodec = FakeCodec,
      frameSamples: Int = 3,
      routeErrors: Boolean = false): DataFrame =
    extractMeta(assets,
      Seq(StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("frame_hashes", ArrayType(StringType))),
      payload => {
        val (w, h) = codec.decodeDims(payload)
        Seq[Any](w, h, codec.frameSampleHashes(payload, frameSamples))
      }, routeErrors)


  /** [[syntheticBmpAssets]] with planted corruption: every 13th asset's
    * payload is truncated to its first 10 bytes (inside the 14-byte
    * BITMAPFILEHEADER, so [[BmpCodec]] rejects it), the rest are the same
    * valid closed-form BMPs. Exercises the `routeErrors` path of
    * [[extractFeatures]] against an oracle that knows exactly which rows
    * must carry a `decode_error` and which must decode. */
  def syntheticBmpAssetsCorrupted(docs: DataFrame): DataFrame = {
    val mk = udf { (id: Long) =>
      val full = bmpBytes((16 + id % 1024).toInt, (16 + (id * 7) % 1024).toInt)
      if (id % 13 == 0) full.take(10) else full
    }
    docs.select(
      col("doc_id").as("asset_id"),
      mk(col("doc_id")).as("payload"),
      lit("image/bmp").as("media_type"))
  }
}
