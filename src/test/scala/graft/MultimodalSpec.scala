package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Multimodal}

/** Multimodal binary-column plumbing: synthetic assets, payload stats,
  * and the batched feature-extraction operator over the stub codec. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "first document body"),
    (2L, "second, quite different, document"),
    (3L, "first document body"))
    .toDF("doc_id", "text")

  test("syntheticAssets: binary payload round-trips the text") {
    val back = Multimodal.syntheticAssets(docs)
      .select($"asset_id", decode($"payload", "UTF-8").as("t"))
      .as[(Long, String)].collect().toMap
    assert(back(1L) == "first document body")
    assert(back(2L) == "second, quite different, document")
  }

  test("payloadStats: byte length and md5 over the raw payload") {
    val assets = Multimodal.syntheticAssets(docs)
    val stats = Multimodal.payloadStats($"payload").foldLeft(assets) {
      case (d, (n, c)) => d.withColumn(n, c)
    }.select($"asset_id", $"payload_bytes", $"payload_md5")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats(1L)._1 == "first document body".getBytes("UTF-8").length.toLong)
    assert(stats(1L)._2.matches("[0-9a-f]{32}"))
    // identical payloads -> identical digests; different -> different
    assert(stats(1L) == stats(3L))
    assert(stats(1L)._2 != stats(2L)._2)
  }

  test("BmpCodec: parses real header bytes, not a hash of them") {
    // bottom-up BMP
    val bmp = Multimodal.bmpBytes(640, 480)
    assert(Multimodal.BmpCodec.decodeDims(bmp) == (640, 480))
    // byte-level check of the little-endian layout the parser reads
    assert((bmp(18) & 0xff) == 0x80 && (bmp(19) & 0xff) == 0x02) // 640
    // top-down BMP: negative biHeight reports as magnitude
    val topDown = Multimodal.bmpBytes(33, -77)
    assert(Multimodal.BmpCodec.decodeDims(topDown) == (33, 77))
    // dims past one little-endian byte exercise the full int32 read
    assert(Multimodal.BmpCodec.decodeDims(
      Multimodal.bmpBytes(70000, 65537)) == (70000, 65537))
    // malformed payloads fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decodeDims("XXnot a bmp".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decodeDims(bmp.take(20))
    }
  }

  test("syntheticBmpAssets: closed-form dims survive the build->parse " +
    "round trip") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticBmpAssets(docs), Multimodal.BmpCodec)
      .select($"asset_id", $"width", $"height")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(feats(1L) == (16 + 1 % 1024, 16 + 7 % 1024))
    assert(feats(2L) == (16 + 2, 16 + 14))
    assert(feats(3L) == (16 + 3, 16 + 21))
  }

  test("BmpCodec: build->parse roundtrip holds across the int32 range " +
    "(property sweep incl. negative heights)") {
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      // full positive-int32 range: widths near Int.MaxValue exercise the
      // high little-endian bytes and leInt's sign handling
      val w = rnd.nextInt(Int.MaxValue) + 1
      val h = rnd.nextInt(Int.MaxValue) + 1
      val hh = if (rnd.nextBoolean()) -h else h // top-down half the time
      assert(Multimodal.BmpCodec.decodeDims(Multimodal.bmpBytes(w, hh)) ==
        (w, h), s"dims ($w, $hh)")
    }
  }

  test("extractFeatures: routeErrors routes malformed payloads to " +
    "decode_error instead of aborting the job") {
    val wide = (1L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val assets = Multimodal.syntheticBmpAssetsCorrupted(wide)
    // default policy: one malformed payload fails the whole action
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(assets, Multimodal.BmpCodec).collect()
    }
    // routed policy: schema gains decode_error, job completes
    val feats = Multimodal.extractFeatures(
      assets, Multimodal.BmpCodec, routeErrors = true)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("asset_id", "width", "height", "frame_hashes", "decode_error"))
    val rows = feats.orderBy("asset_id").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 13 == 0) {
        // corrupted: null features, the codec's message routed
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
        assert(r.getString(4).contains("not a BMP payload"))
      } else {
        // clean: closed-form dims recovered, no error
        assert(r.getInt(1) == (16 + id % 1024).toInt, s"id $id")
        assert(r.getInt(2) == (16 + (id * 7) % 1024).toInt, s"id $id")
        assert(r.isNullAt(4))
      }
    }
    // a null payload is "absent", not "malformed": null features AND
    // null decode_error under the routed policy
    val withNull = Seq((99L, null: Array[Byte], "image/bmp"))
      .toDF("asset_id", "payload", "media_type")
    val nr = Multimodal.extractFeatures(
      withNull, Multimodal.BmpCodec, routeErrors = true).collect().head
    assert(nr.isNullAt(1) && nr.isNullAt(3) && nr.isNullAt(4))
  }

  test("JpegCodec: marker scan recovers dims (baseline + progressive), " +
    "steps over standalone markers, rejects malformed streams") {
    assert(Multimodal.JpegCodec.decodeDims(
      Multimodal.jpegBytes(640, 480)) == (640, 480))
    assert(Multimodal.JpegCodec.decodeDims(
      Multimodal.jpegBytes(33, 1027, progressive = true)) == (33, 1027))

    // standalone markers (TEM 0x01, RST0-7) carry NO length field: a
    // stream with one injected between APP0 and SOF must parse, not
    // misread the following bytes as a segment length
    val base = Multimodal.jpegBytes(100, 200)
    val withRst = base.take(20) ++
      Array(0xff.toByte, 0xd3.toByte, 0xff.toByte, 0x01.toByte) ++
      base.drop(20)
    assert(Multimodal.JpegCodec.decodeDims(withRst) == (100, 200))

    // DHT (0xc4) looks like a SOF code but is not: a DHT before the SOF
    // must be skipped by declared length, and dims still come from SOF
    val dht = Array(0xff.toByte, 0xc4.toByte, 0.toByte, 4.toByte,
      0.toByte, 0.toByte)
    assert(Multimodal.JpegCodec.decodeDims(
      base.take(20) ++ dht ++ base.drop(20)) == (100, 200))

    // a stray mid-stream SOI (two streams concatenated / encoder
    // restart) is standalone too: must step 2 bytes, not read the next
    // bytes as a segment length
    assert(Multimodal.JpegCodec.decodeDims(base.take(20) ++
      Array(0xff.toByte, 0xd8.toByte) ++ base.drop(20)) == (100, 200))

    intercept[IllegalArgumentException] { // no SOI
      Multimodal.JpegCodec.decodeDims("not a jpeg".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] { // truncated inside APP0
      Multimodal.JpegCodec.decodeDims(base.take(10))
    }
    intercept[IllegalArgumentException] { // SOS before any SOF
      Multimodal.JpegCodec.decodeDims(base.take(20) ++
        Array(0xff.toByte, 0xda.toByte, 0.toByte, 4.toByte))
    }
  }

  test("PngCodec: fixed-offset IHDR parse; corrupted and renamed " +
    "payloads fail loudly; CRC is genuine") {
    val png = Multimodal.pngBytes(640, 480)
    assert(Multimodal.PngCodec.decodeDims(png) == (640, 480))
    // byte-level check of the big-endian layout the parser reads
    assert((png(16) & 0xff) == 0 && (png(17) & 0xff) == 0 &&
      (png(18) & 0xff) == 0x02 && (png(19) & 0xff) == 0x80) // 640
    // dims past two big-endian bytes exercise the full int32 read
    assert(Multimodal.PngCodec.decodeDims(
      Multimodal.pngBytes(70000, 16777217)) == (70000, 16777217))
    // the IHDR CRC is a real CRC32 over type+data, not filler
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 17)
    assert(java.nio.ByteBuffer.wrap(png, 29, 4).getInt == crc.getValue.toInt)

    intercept[IllegalArgumentException] { // wrong signature
      Multimodal.PngCodec.decodeDims("definitely not a png".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] { // truncated before IHDR type
      Multimodal.PngCodec.decodeDims(png.take(12))
    }
    intercept[IllegalArgumentException] { // signature ok, first chunk not IHDR
      val bad = png.clone(); bad(12) = 'X'.toByte
      Multimodal.PngCodec.decodeDims(bad)
    }
    // property sweep across the positive int32 dim range
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val w = rnd.nextInt(Int.MaxValue) + 1
      val h = rnd.nextInt(Int.MaxValue) + 1
      assert(Multimodal.PngCodec.decodeDims(Multimodal.pngBytes(w, h)) ==
        (w, h), s"dims ($w, $h)")
    }
  }

  test("syntheticPngAssets: closed-form dims survive the build->parse " +
    "round trip; corrupted twin routes errors") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticPngAssets(docs), Multimodal.PngCodec)
      .select($"asset_id", $"width", $"height")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(feats(1L) == (17, 29))
    assert(feats(2L) == (18, 42))
    assert(feats(3L) == (19, 55))
    val wide = (1L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val routed = Multimodal.extractFeatures(
      Multimodal.syntheticPngAssetsCorrupted(wide), Multimodal.PngCodec,
      routeErrors = true).orderBy("asset_id").collect()
    routed.foreach { r =>
      val id = r.getLong(0)
      if (id % 13 == 0) {
        assert(r.isNullAt(1) && r.getString(4).contains("not a PNG payload"))
      } else {
        assert(r.getInt(1) == (16 + id % 1024).toInt)
        assert(r.getInt(2) == (16 + (id * 13) % 1024).toInt)
        assert(r.isNullAt(4))
      }
    }
  }

  test("resizeBmpNearest: real pixel transform — hand-checked mapping, " +
    "stride/row-order handling, re-encoded header, malformed refusal") {
    // 4x4 source, pixel (x,y from top) = (x*31 + y*17) % 256
    val src = Multimodal.bmpBytesWithPixels(4, 4)
    // source sanity: (0,0)=0, (1,0)=31, (0,1)=17, (3,3)=(93+51)%256=144
    def px(b: Array[Byte], x: Int, y: Int): Int = {
      val w = (b(18) & 0xff) | ((b(19) & 0xff) << 8)
      val h = (b(22) & 0xff) | ((b(23) & 0xff) << 8)
      val stride = (w * 3 + 3) / 4 * 4
      b(54 + (h - 1 - y) * stride + x * 3) & 0xff
    }
    assert(px(src, 0, 0) == 0 && px(src, 1, 0) == 31 &&
      px(src, 0, 1) == 17 && px(src, 3, 3) == 144)

    // downsample 4x4 -> 2x2: dst (x,y) reads src (x*4/2, y*4/2) = (2x, 2y)
    val down = Multimodal.resizeBmpNearest(src, 2, 2)
    assert(px(down, 0, 0) == 0) // src (0,0)
    assert(px(down, 1, 0) == 62) // src (2,0) = 62
    assert(px(down, 0, 1) == 34) // src (0,2) = 34
    assert(px(down, 1, 1) == 96) // src (2,2) = 62+34
    // upsample 2x2 -> 4x4 from the downsample: dst (x,y) reads (x/2, y/2)
    val up = Multimodal.resizeBmpNearest(down, 4, 4)
    assert(px(up, 0, 0) == 0 && px(up, 1, 0) == 0 &&
      px(up, 2, 0) == 62 && px(up, 3, 3) == 96)

    // odd widths exercise row padding (stride 3*3=9 -> padded 12)
    val odd = Multimodal.bmpBytesWithPixels(3, 2)
    assert(px(odd, 2, 1) == (2 * 31 + 17) % 256)
    assert(px(Multimodal.resizeBmpNearest(odd, 3, 2), 2, 1) == 79)

    intercept[IllegalArgumentException] { // not a BMP
      Multimodal.resizeBmpNearest("nope".getBytes("UTF-8"), 2, 2)
    }
    intercept[IllegalArgumentException] { // truncated pixel data
      Multimodal.resizeBmpNearest(src.take(60), 2, 2)
    }
    intercept[IllegalArgumentException] { // header-only fixture (no pixels)
      Multimodal.resizeBmpNearest(Multimodal.bmpBytes(4, 4), 2, 2)
    }
  }

  test("extractResizeProbes: closed-form probes round-trip through " +
    "decode -> resize -> re-encode -> re-decode") {
    val probes = Multimodal.extractResizeProbes(
      Multimodal.syntheticPixelBmpAssets(docs), dstW = 8, dstH = 8)
      .select($"asset_id", $"out_w", $"out_h", $"p12", $"pmid", $"pend")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    probes.values.foreach { case (id, w, h, p12, pmid, pend) =>
      assert(w == 8 && h == 8)
      val (sw, sh) = ((4 + id % 13).toInt, (4 + id % 11).toInt)
      def expect(x: Int, y: Int) =
        ((x * sw / 8) * 31 + (y * sh / 8) * 17) % 256
      assert(p12 == expect(1, 2), s"id $id p12")
      assert(pmid == expect(4, 4), s"id $id pmid")
      assert(pend == expect(7, 7), s"id $id pend")
    }
  }

  test("WavCodec: parses real RIFF header bytes; build->parse roundtrip " +
    "holds across parameter sweep; malformed payloads fail loudly") {
    val wav = Multimodal.wavBytes(2, 44100, 44100) // 1 s stereo
    assert(Multimodal.WavCodec.decodeMeta(wav) == ((2, 44100, 1000L)))
    // byte-level check of the little-endian fmt layout the parser reads
    assert((wav(24) & 0xff) == 0x44 && (wav(25) & 0xff) == 0xAC) // 44100
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val ch = 1 + rnd.nextInt(8)
      val sr = 8000 + rnd.nextInt(200000)
      val ns = 1 + rnd.nextInt(1000000)
      val (gch, gsr, gdur) =
        Multimodal.WavCodec.decodeMeta(Multimodal.wavBytes(ch, sr, ns))
      assert(gch == ch && gsr == sr, s"params ($ch, $sr, $ns)")
      assert(gdur == ns.toLong * ch * 2 * 1000L / (sr.toLong * ch * 2),
        s"duration ($ch, $sr, $ns)")
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decodeMeta("RIFFnot a wav".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decodeMeta(wav.take(40))
    }
    // the data-chunk size is UNSIGNED: a >2 GiB declared size must give
    // the true positive duration, not a silently negative one
    val big = Multimodal.wavBytes(1, 8000, 1)
    (40 until 44).foreach(i => big(i) = 0xFF.toByte) // dataSize = 2^32-1
    val (_, _, dur) = Multimodal.WavCodec.decodeMeta(big)
    assert(dur == 0xFFFFFFFFL * 1000L / 16000L && dur > 0)
  }

  test("extractAudioMeta: closed-form synthetic assets round-trip; " +
    "routeErrors routes truncated headers") {
    val wide = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val meta = Multimodal.extractAudioMeta(
      Multimodal.syntheticWavAssets(wide))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    val rates = Array(8000, 16000, 44100)
    (1L to 12L).foreach { id =>
      val exp = ((1 + id % 2).toInt, rates((id % 3).toInt),
        (1000 + id % 9000) * 1000L / rates((id % 3).toInt))
      assert(meta(id) == exp, s"id $id")
    }
    // truncated payload: routed, not thrown
    val bad = Seq((5L, Multimodal.wavBytes(1, 8000, 100).take(20),
      "audio/wav")).toDF("asset_id", "payload", "media_type")
    val routed = Multimodal.extractAudioMeta(bad, routeErrors = true)
      .collect().head
    assert(routed.isNullAt(1) && routed.getString(4).contains("WAV"))
  }

  test("AviCodec: parses real RIFF/avih header bytes; roundtrip sweep; " +
    "malformed payloads fail loudly") {
    val avi = Multimodal.aviBytes(640, 480, 240, 33333)
    assert(Multimodal.AviCodec.decodeMeta(avi) ==
      ((640, 480, 240, 33333L * 240 / 1000)))
    val rnd = new scala.util.Random(17)
    (0 until 200).foreach { _ =>
      val w = 1 + rnd.nextInt(8192); val h = 1 + rnd.nextInt(8192)
      val nf = rnd.nextInt(1000000); val us = 1 + rnd.nextInt(1000000)
      assert(Multimodal.AviCodec.decodeMeta(
        Multimodal.aviBytes(w, h, nf, us)) ==
        ((w, h, nf, us.toLong * nf / 1000L)), s"params ($w,$h,$nf,$us)")
    }
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeMeta("RIFFxxxxWAVE".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeMeta(avi.take(60))
    }
    // dwTotalFrames past the signed-int surface must fail loudly, not
    // flow through as negative frames/duration
    val overflow = Multimodal.aviBytes(10, 10, 1, 1000)
    overflow(51) = 0x80.toByte // frames = 0x80000001
    val e = intercept[IllegalArgumentException] {
      Multimodal.AviCodec.decodeMeta(overflow)
    }
    assert(e.getMessage.contains("signed 32-bit"))
  }

  test("extractVideoMeta: closed-form synthetic assets round-trip; " +
    "routeErrors routes truncated headers") {
    val wide = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val meta = Multimodal.extractVideoMeta(
      Multimodal.syntheticAviAssets(wide))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    (1L to 12L).foreach { id =>
      val us = if (id % 2 == 0) 33333L else 41708L
      val nf = 24 + id % 240
      val exp = ((160 + 16 * (id % 8)).toInt, (120 + 8 * (id % 6)).toInt,
        nf.toInt, us * nf / 1000L)
      assert(meta(id) == exp, s"id $id")
    }
    val bad = Seq((5L, Multimodal.aviBytes(10, 10, 1, 1000).take(30),
      "video/avi")).toDF("asset_id", "payload", "media_type")
    val routed = Multimodal.extractVideoMeta(bad, routeErrors = true)
      .collect().head
    assert(routed.isNullAt(1) && routed.getString(5).contains("AVI"))
  }

  test("extractFeatures: deterministic stub decode, fixed schema, batch shape") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(docs))
    assert(feats.schema.fieldNames.toSeq ==
      Seq("asset_id", "width", "height", "frame_hashes"))
    val rows = feats.orderBy("asset_id").collect()
    assert(rows.length == 3)
    val r1 = rows(0); val r3 = rows(2)
    // identical payloads -> identical features (deterministic codec)
    assert(r1.getInt(1) == r3.getInt(1) && r1.getInt(2) == r3.getInt(2))
    assert(r1.getSeq[String](3) == r3.getSeq[String](3))
    assert(r1.getSeq[String](3).length == 3)
    // dims in the stub's documented range
    assert(r1.getInt(1) >= 16 && r1.getInt(1) <= 4111)
  }

  test("sceneCuts: boundary positions, run collapsing, degenerate arrays") {
    import spark.implicits._
    val assets = Seq(
      (1L, Seq(1, 1, 2, 2, 2, 3)), // cuts at positions 3 and 6
      (2L, Seq(7, 7, 7)), // one scene, no cuts
      (3L, Seq(5)), // single frame — the <2 guard path
      (4L, Seq(1, 2, 3))) // every frame a new scene
      .toDF("asset_id", "frame_sigs")
    val got = Multimodal.sceneCuts(assets)
      .select($"asset_id", $"n_frames", $"n_cuts", $"cuts_csv",
        $"mean_scene_len")
      .as[(Long, Long, Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((6L, 2L, "3,6", 2.0)))
    assert(got(2L) == ((3L, 0L, "", 3.0)))
    assert(got(3L) == ((1L, 0L, "", 1.0)))
    assert(got(4L) == ((3L, 2L, "2,3", 1.0)))
  }

  test("sceneCuts: a null signature (decode-failure frame) is a boundary " +
    "against real neighbors, not a silently dropped transition") {
    import spark.implicits._
    val assets = Seq(
      (1L, Seq[Integer](1, null, 2)), // two boundaries around the bad frame
      (2L, Seq[Integer](null, null, 3))) // null run: one boundary at 3
      .toDF("asset_id", "frame_sigs")
    val got = Multimodal.sceneCuts(assets)
      .select($"asset_id", $"n_cuts", $"cuts_csv")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, "2,3")))
    assert(got(2L) == ((1L, "3")))
  }

  test("syntheticFrameSigAssets: closed-form runs of length 1 + id mod 7") {
    import spark.implicits._
    val docs = Seq((9L, "x")).toDF("doc_id", "text") // n = 33, L = 3
    val sigs = Multimodal.syntheticFrameSigAssets(docs)
      .select($"frame_sigs").as[Seq[Int]].head()
    assert(sigs.length == 33)
    assert(sigs.take(7) == Seq(0, 0, 0, 1, 1, 1, 2))
  }

  test("WavCodec.decodeSampleStats: hand-computed stats over a real data " +
    "chunk; full-scale extremes count as clipped; truncation throws") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, 12345)
    val wav = Multimodal.wavBytesWithSamples(2, 8000, samples)
    val (n, peak, clipped, sumsq) = Multimodal.WavCodec.decodeSampleStats(wav)
    assert(n == 6L)
    assert(peak == 32768) // |−32768|
    assert(clipped == 2L)
    assert(sumsq == samples.map(s => s.toLong * s.toLong).sum)

    // declared data size larger than the payload must fail loudly
    val truncated = wav.take(44 + 4)
    val e = intercept[IllegalArgumentException](
      Multimodal.WavCodec.decodeSampleStats(truncated))
    assert(e.getMessage.contains("truncated"))

    // header-only fixture (no samples) is a legal zero-sample payload
    val headerOnly = Multimodal.wavBytes(1, 8000, 0)
    assert(Multimodal.WavCodec.decodeSampleStats(headerOnly) ==
      ((0L, 0, 0L, 0L)))
  }

  test("GifCodec.decodeMeta: block walk recovers dims/frames/palette/" +
    "delays from real bytes; truncation and junk introducers fail loudly") {
    val gif = Multimodal.gifBytes(320, 200, frames = 3,
      gctBits = 4, delayCs = 25)
    assert(Multimodal.GifCodec.decodeMeta(gif) ==
      ((320, 200, 3, 16, 750L))) // 3 frames x 25 cs = 750 ms
    // single frame, minimal palette
    assert(Multimodal.GifCodec.decodeMeta(
      Multimodal.gifBytes(1, 1, 1, 1, 0)) == ((1, 1, 1, 2, 0L)))
    // cut inside a frame's sub-blocks → loud truncation, not a wrong count
    val e = intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeMeta(gif.dropRight(5)))
    assert(e.getMessage.contains("truncated"))
    // corrupt introducer byte
    val bad = gif.clone(); bad(13 + 3 * 16) = 0x7F
    val e2 = intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeMeta(bad))
    assert(e2.getMessage.contains("unknown GIF block"))
    // not a GIF at all
    intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeMeta("GIF87a".getBytes ++ new Array[Byte](20)))
  }

  test("WavCodec.decodeSilenceSegments: adjacent silent windows merge, " +
    "partial tail clamps, stereo peaks span both channels, loud-only and " +
    "silent-only payloads hit both degenerate shapes") {
    def wav(ch: Int, frames: Int)(v: Int => Short) =
      Multimodal.wavBytesWithSamples(ch, 8000,
        Array.tabulate(frames * ch)(v))
    // mono, window 4: frames 0-7 quiet, 8-11 loud, 12-17 quiet (tail
    // window 16-17 is partial) → segments [0,8) and [12,18)
    val mono = wav(1, 18)(j =>
      if (j < 8 || j >= 12) 10 else 5000)
    assert(Multimodal.WavCodec.decodeSilenceSegments(mono, 4, 256) ==
      Seq((0L, 8L), (12L, 18L)))
    // one loud sample in channel 1 of an otherwise-quiet frame window
    // disqualifies the window: peaks span ALL channels
    val stereo = wav(2, 8)(j => if (j == 5) 5000 else 10)
    assert(Multimodal.WavCodec.decodeSilenceSegments(stereo, 4, 256) ==
      Seq((4L, 8L)))
    // all-loud → empty; all-quiet → one full-length segment
    assert(Multimodal.WavCodec.decodeSilenceSegments(
      wav(1, 10)(_ => 5000), 4, 256).isEmpty)
    assert(Multimodal.WavCodec.decodeSilenceSegments(
      wav(1, 10)(_ => 0), 4, 256) == Seq((0L, 10L)))
  }

  test("extractAudioStats: the sample formula round-trips through real " +
    "RIFF bytes for one closed-form asset") {
    import spark.implicits._
    val id = 7L
    val docs = Seq((id, "x")).toDF("doc_id", "text")
    val row = Multimodal.extractAudioStats(
      Multimodal.syntheticWavAssetsWithSamples(docs))
      .select($"asset_id", $"n_samples", $"peak", $"n_clipped", $"sumsq")
      .as[(Long, Long, Int, Long, Long)].head()
    val ch = (1 + id % 2).toInt
    val total = ch * (200 + id % 800).toInt
    val expect = Array.tabulate(total)(j =>
      (((j * 2657L + id * 7919L) % 65536L) - 32768L).toInt)
    assert(row == ((id, total.toLong,
      expect.map(math.abs).max,
      expect.count(s => s == 32767 || s == -32768).toLong,
      expect.map(s => s.toLong * s.toLong).sum)))
  }

  test("keyframes: one row per scene with its opening frame and " +
    "signature; null boundaries split; empty arrays emit nothing") {
    val assets = Seq(
      (1L, Seq[Integer](5, 5, 7, 7, 7, 2)),
      (2L, Seq[Integer](1, null, 1)),
      (3L, Seq[Integer]()),
      (4L, Seq[Integer](9)))
      .toDF("asset_id", "frame_sigs")
    val out = Multimodal.keyframes(assets)
      .orderBy($"asset_id", $"scene_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Int])))
      .toSeq
    assert(out == Seq(
      (1L, 1, 1, Some(5)), (1L, 2, 3, Some(7)), (1L, 3, 6, Some(2)),
      (2L, 1, 1, Some(1)), (2L, 2, 2, None), (2L, 3, 3, Some(1)),
      (4L, 1, 1, Some(9))))
  }

  test("keyframes: fixture rows are closed-form — scene k opens at " +
    "k*L+1 with signature k") {
    val id = 11L
    val docs = Seq((id, "x")).toDF("doc_id", "text")
    val out = Multimodal.keyframes(
      Multimodal.syntheticFrameSigAssets(docs))
      .orderBy($"scene_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    val n = (24 + id % 240).toInt
    val l = (1 + id % 7).toInt
    val expect = (0 to (n - 1) / l).map(k => (k + 1, k * l + 1, k))
    assert(out == expect)
  }

  test("decimateWav: keeps every k-th frame channel-aligned, rewrites " +
    "the rate, re-encodes spec-valid; factor 1 is the identity") {
    // 10 stereo frames, samples 0..19 interleaved
    val src = Multimodal.wavBytesWithSamples(2, 16000,
      Array.tabulate[Short](20)(_.toShort))
    val d = Multimodal.decimateWav(src, 2)
    val (ch, rate, _) = Multimodal.WavCodec.decodeMeta(d)
    assert((ch, rate) == ((2, 8000)))
    // kept frames 0,2,4,6,8 → interleaved values [0,1, 4,5, 8,9, 12,13, 16,17]
    val vals = (0 until 10).map(j =>
      java.nio.ByteBuffer.wrap(d, 44 + 2 * j, 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort.toInt)
    assert(vals == Seq(0, 1, 4, 5, 8, 9, 12, 13, 16, 17))
    // the result is itself a decodable asset (re-encode is spec-valid)
    val (n, peak, _, _) = Multimodal.WavCodec.decodeSampleStats(d)
    assert(n == 10L && peak == 17)
    assert(Multimodal.decimateWav(src, 1).toSeq == src.toSeq)
    // a non-multiple frame count rounds UP (frames 0,4,8 of 10)
    val d4 = Multimodal.decimateWav(src, 4)
    assert(Multimodal.WavCodec.decodeSampleStats(d4)._1 == 6L)
  }

  test("decimateWav: loud failures — non-divisible rate, truncation, " +
    "bad factor") {
    val src = Multimodal.wavBytesWithSamples(1, 44100,
      Array.tabulate[Short](8)(_.toShort))
    val e = intercept[IllegalArgumentException] {
      Multimodal.decimateWav(src, 8) // 44100 % 8 != 0
    }
    assert(e.getMessage.contains("not divisible"))
    intercept[IllegalArgumentException] {
      Multimodal.decimateWav(src.take(50), 2) // truncated data chunk
    }
    intercept[IllegalArgumentException] {
      Multimodal.decimateWav(src, 0)
    }
  }

  test("dHashBmp: 64-bit gradient hash is closed-form in the source " +
    "pixels, and pigeonhole pairs equal brute-force hamming") {
    val docs = (1L to 80L).map(i => (i, "x")).toDF("doc_id", "text")
    val assets = Multimodal.syntheticPixelBmpAssets(docs)
    val hs = Multimodal.extractDHash(assets)
      .as[(Long, Long)].collect().toMap
    // closed form: gray(x,y) of the 9×8 resize = (31·sx + 17·sy) mod 256
    // with sx = x·w/9, sy = y·h/8 — replayed here independently
    def expected(id: Long): Long = {
      val (w, h) = ((4 + id % 13).toInt, (4 + id % 11).toInt)
      def gray(x: Int, y: Int): Int = (31 * (x * w / 9) + 17 * (y * h / 8)) % 256
      (for (y <- 0 until 8; x <- 0 until 8 if gray(x + 1, y) > gray(x, y))
        yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    }
    assert(hs.keySet == (1L to 80L).toSet)
    hs.foreach { case (id, ph) => assert(ph == expected(id), s"asset $id") }
    // some fixture hash must ride the sign bit, or the 64-bit banding
    // path (arithmetic shift + mask) is untested
    assert(hs.values.exists(_ < 0L), "fixture never exercises bit 63")
    val got = Dedup.hammingNearDupPairs(
      Multimodal.extractDHash(assets), "asset_id", "phash",
      bits = 64, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      a <- 1L to 80L; b <- (a + 1) to 80L
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == brute, "banding must lose no pair and add none")
  }

  test("extractDecimateProbes: fixture probes are closed-form in the " +
    "doc id — the oracle's arithmetic") {
    val id = 37L
    val docs = Seq((id, "x")).toDF("doc_id", "text")
    val row = Multimodal.extractDecimateProbes(
      Multimodal.syntheticWavAssetsWithSamples(docs), factor = 4)
      .select($"asset_id", $"out_rate", $"out_frames",
        $"p0", $"pmid", $"pend")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val ch = (1 + id % 2).toInt
    val rates = Array(8000, 16000, 44100)
    val n = (200 + id % 800).toInt
    val nk = (n + 3) / 4
    def samp(f: Long): Long = ((f * ch * 2657L + id * 7919L) % 65536L) - 32768L
    assert(row == ((id, rates((id % 3).toInt) / 4L, nk.toLong,
      samp(0L), samp((nk / 2) * 4L), samp((nk - 1) * 4L))))
  }

  test("energyHashWav: gradient bits survive integer gain halving and " +
    "the sibling perturbation; different content stays far") {
    def mix(id: Long, j: Int): Int = {
      val v = j * 2657L + id * 7919L
      (((v * v) / 256L) % 65536L - 32768L).toInt
    }
    def wav(samples: Array[Short]) =
      Multimodal.wavBytesWithSamples(1, 16000, samples)
    val s1 = Array.tabulate(650)(j => mix(1L, j).toShort)
    val h1 = Multimodal.energyHashWav(wav(s1))
    // uniform gain change (integer halving — worst case: per-sample
    // rounding noise on top of the gain) leaves the GRADIENT hash near
    // the original; a value hash would move every bit
    val half = s1.map(v => (v / 2).toShort)
    assert(java.lang.Long.bitCount(
      h1 ^ Multimodal.energyHashWav(wav(half))) <= 3,
      "gain halving must not move the gradient fingerprint")
    // the fixture's sibling perturbation stays within banding reach
    val sib = s1.zipWithIndex.map { case (v, j) =>
      if (j % 13 == 0)
        (v - Integer.signum(v) * math.min(5, math.abs(v))).toShort
      else v
    }
    assert(java.lang.Long.bitCount(
      h1 ^ Multimodal.energyHashWav(wav(sib))) <= 3)
    // genuinely different audio is far
    val other = Array.tabulate(650)(j => mix(2L, j).toShort)
    assert(java.lang.Long.bitCount(
      h1 ^ Multimodal.energyHashWav(wav(other))) > 10,
      "unrelated assets must not band-collide")
    // short payloads refuse
    intercept[IllegalArgumentException] {
      Multimodal.energyHashWav(wav(Array.tabulate(64)(_.toShort)))
    }
  }

  test("videoShingleNearDupPairs: trim-robust and order-aware, exact " +
    "closed-form jaccard, cap and edge behavior") {
    import spark.implicits._
    // hand-built: video 1 = frames 10..29 (n=20); video 2 = the same
    // minus the first 2 frames (trim twin); video 3 = video 1 REVERSED
    // (same frame multiset, different order); video 4 = unrelated;
    // video 5 = too short for one shingle
    val v1 = (10 to 29).map(_ * 101).toArray
    val assets = Seq(
      (1L, v1),
      (2L, v1.drop(2)),
      (3L, v1.reverse),
      (4L, Array.tabulate(20)(i => i * 7 + 9999)),
      (5L, v1.take(3)))
      .toDF("asset_id", "frame_sigs")
    val pairs = Multimodal.videoShingleNearDupPairs(assets, w = 4,
      threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    // only the trim twin pairs: sa = 17, sb = 15, inter = 15
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(math.abs(pairs.head._3 - 15.0 / 17.0) < 1e-12,
      s"closed-form jaccard mismatch: ${pairs.head._3}")
    // reversal shares frames but no 4-frame WINDOW: order-awareness
    // is the (1,3) absence above; heavy trim falls below threshold
    val heavy = Seq((1L, v1), (2L, v1.drop(12))).toDF("asset_id", "frame_sigs")
    assert(Multimodal.videoShingleNearDupPairs(heavy, w = 4,
      threshold = 0.5).count() == 0L,
      "a twin keeping 5/17 shingles must not clear 0.5")
    // the df cap kills a boilerplate shingle shared by every video:
    // three videos sharing ONE 4-frame intro then diverging
    val intro = Array(1, 2, 3, 4)
    val boiler = Seq(
      (1L, intro ++ Array(100, 101)),
      (2L, intro ++ Array(200, 201)),
      (3L, intro ++ Array(300, 301)))
      .toDF("asset_id", "frame_sigs")
    // each pair shares exactly the intro window: jaccard = 1/(3+3-1)
    val uncapped = Multimodal.videoShingleNearDupPairs(boiler, w = 4,
      threshold = 0.2)
    val capped = Multimodal.videoShingleNearDupPairs(boiler, w = 4,
      threshold = 0.2, maxShingleDf = 2)
    assert(uncapped.count() == 3L && capped.count() == 0L,
      "the shared intro shingle must die under the cap")
    intercept[IllegalArgumentException] {
      Multimodal.videoShingleNearDupPairs(assets, threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.videoShingleNearDupPairs(assets, w = 0)
    }
  }

  test("syntheticVideoNearDupAssets: every 7th doc carries an " +
    "intro-trimmed twin and the operator recovers exactly those pairs") {
    import spark.implicits._
    val docs = (0L until 21L).toDF("doc_id")
    val pairs = Multimodal.videoShingleNearDupPairs(
      Multimodal.syntheticVideoNearDupAssets(docs), w = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(pairs.map(p => (p._1, p._2)) ==
      Seq(0L, 7L, 14L).map(i => (i, i + 1000000000L)))
    pairs.foreach { case (a, _, j) =>
      val n = 24 + a % 240; val k = 1 + a % 3
      assert(math.abs(j - (n - k - 3).toDouble / (n - 3).toDouble) < 1e-12,
        s"closed-form jaccard mismatch for base $a: $j")
    }
  }

  test("alignCutsToSilence: a cut is silent iff its mapped sample sits " +
    "inside an interval; zero-silence assets count 0; cut-free assets " +
    "emit nothing (the census is over cuts)") {
    import spark.implicits._
    // asset 1: cuts at frames 5 and 9 -> samples 16 and 32 (spf 4);
    // [10,20) swallows 16, [30,32) misses 32 (half-open). asset 2 has a
    // cut but no silence; asset 3 has no cut at all.
    val scenes = Seq(
      (1L, 1L, 1), (1L, 2L, 5), (1L, 3L, 9),
      (2L, 1L, 1), (2L, 2L, 3),
      (3L, 1L, 1)).toDF("asset_id", "scene_idx", "start_frame")
    val silence = Seq(
      (1L, 0L, 10L, 20L), (1L, 1L, 30L, 32L))
      .toDF("asset_id", "seg_idx", "start_frame", "end_frame")
    val got = graft.functions.Multimodal
      .alignCutsToSilence(scenes, silence, samplesPerFrame = 4L)
      .orderBy($"asset_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 0L)))
  }
}
