package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary plumbing: batched partition decode is deterministic,
  * partition-layout-independent, and schema-stable.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("batched decode yields one decoded row per payload, stable schema") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val decoded = Multimodal.decodeBatched(media)
    assert(decoded.count() == media.count())
    assert(decoded.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "features"))
    val row = decoded.orderBy("doc_id").head()
    assert(row.features.length == Multimodal.FeatureDim)
    assert(row.n_bytes > 4)
  }

  test("decode results independent of partitioning (batch boundaries)") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    def fingerprint(parts: Int) =
      Multimodal.decodeBatched(
        media.repartition(parts).as[Multimodal.MediaRow])
        .collect().map(d => (d.doc_id, d.width, d.height,
          d.features.toSeq)).sortBy(_._1).toSeq
    assert(fingerprint(1) == fingerprint(7))
  }

  test("frame sampling: frames tile the payload exactly and reassemble " +
      "to the original bytes, at any partitioning") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val frames = Multimodal.frameSample(media).collect()
      .groupBy(_.doc_id)
    val payloads = media.collect().map(m => m.doc_id -> m.payload).toMap
    payloads.foreach { case (id, p) =>
      val fs = frames(id).sortBy(_.frame_no)
      // frame numbers are a gapless 0..n-1 tiling of the byte length
      assert(fs.map(_.frame_no).toSeq == (0 until fs.length))
      assert(fs.map(_.frame_len.toLong).sum == p.length.toLong)
      assert(fs.init.forall(_.frame_len == Multimodal.FrameBytes))
      // each frame's md5 matches the actual byte slice
      val md = java.security.MessageDigest.getInstance("MD5")
      fs.foreach { f =>
        val from = f.frame_no * Multimodal.FrameBytes
        md.reset()
        val hex = md.digest(java.util.Arrays.copyOfRange(p, from,
          from + f.frame_len)).map("%02x".format(_)).mkString
        assert(hex == f.frame_md5)
      }
    }
    // partitioning must not change the frame set
    val a = Multimodal.frameSample(media).collect().toSet
    val b = Multimodal.frameSample(
      media.repartition(7).as[Multimodal.MediaRow]).collect().toSet
    assert(a == b)
  }

  test("resizedDims: ≤target dims unchanged, larger ones floor-scaled " +
      "preserving aspect, never below 1") {
    import spark.implicits._
    val dims = Seq((100, 64), (128, 128), (319, 70), (70, 319), (200, 1))
      .toDF("w", "h")
    val (rw, rh) = Multimodal.resizedDims(col("w"), col("h"), 128)
    val out = dims.select(col("w"), col("h"), rw.as("rw"), rh.as("rh"))
      .as[(Int, Int, Int, Int)].collect().toSet
    assert(out == Set(
      (100, 64, 100, 64),       // within target → unchanged
      (128, 128, 128, 128),     // exactly target → unchanged
      (319, 70, 128, 28),       // floor(70·128/319) = 28
      (70, 319, 28, 128),
      (200, 1, 128, 1)))        // floor would give 0 → clamped to 1
  }

  test("decoded features join back to the metadata table") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val decoded = Multimodal.decodeBatched(media).toDF()
    val stats = decoded.groupBy("media_type")
      .agg(count(lit(1)).as("n"), max(col("n_bytes")).as("max_bytes"))
      .orderBy("media_type").collect()
    assert(stats.length == 3) // image / audio / video
    assert(stats.forall(_.getLong(1) > 0))
  }

  test("BMP decoder: build->decode round trip, bottom-up row order, " +
      "stride padding, and malformed-input rejection") {
    // hand-computed golden: docId=10, 2x2 (stride 8, 2 pad bytes/row)
    //   B(x,y) = 10+2x -> {10,12,10,12} sum 44
    //   G(x,y) = 10+3y -> {10,10,13,13} sum 46
    //   R(x,y) = 10+xy -> {10,10,10,11} sum 41
    //   logical (0,0) lives in the LAST stored row; its G = 10
    val g = Multimodal.decodeBmp24(Multimodal.buildBmp24(10L, 2, 2)).get
    assert((g.width, g.height, g.sum_b, g.sum_g, g.sum_r, g.px00_g) ==
      ((2, 2, 44L, 46L, 41L, 10)))
    // a decoder reading rows TOP-down would report px00_g = 10+3*1 = 13
    // round trip across ids/sizes incl. wrap-around past byte 255
    for (id <- Seq(0L, 7L, 250L, 100000L); (w, h) <- Seq((7, 5), (4, 3), (1, 1))) {
      val r = Multimodal.decodeBmp24(Multimodal.buildBmp24(id, w, h)).get
      val expB = (for (x <- 0 until w; _ <- 0 until h) yield (id + 2 * x) % 256).sum
      val expG = (for (_ <- 0 until w; y <- 0 until h) yield (id + 3 * y) % 256).sum
      assert((r.width, r.height, r.sum_b, r.sum_g, r.px00_g) ==
        ((w, h, expB, expG, (id % 256).toInt)), s"id=$id ${w}x$h")
    }
    // malformed payloads are rejected, not misparsed
    val ok = Multimodal.buildBmp24(3L, 7, 5)
    assert(Multimodal.decodeBmp24("JPEG".getBytes).isEmpty) // wrong magic
    assert(Multimodal.decodeBmp24(ok.take(53)).isEmpty)     // truncated header
    assert(Multimodal.decodeBmp24(ok.take(60)).isEmpty)     // truncated pixels
    val badBpp = ok.clone(); badBpp(28) = 8
    assert(Multimodal.decodeBmp24(badBpp).isEmpty)          // not 24-bpp
    val compressed = ok.clone(); compressed(30) = 1
    assert(Multimodal.decodeBmp24(compressed).isEmpty)      // RLE not supported
  }

  test("WAV decoder: chunk walking, sign extension, stereo interleave, " +
      "malformed rejection") {
    // golden: docId=2, 3 frames, 1 ch: s(i) = (62 + 7i) % 2048 - 1024
    //   -> {-962, -955, -948}; sum_abs 2865, peak 962, first -962
    val mono = Multimodal.decodeWavPcm16(
      Multimodal.buildWavPcm16(2L, 3, 8000, 1)).get
    assert((mono.sample_rate, mono.channels, mono.n_frames, mono.sum_abs,
      mono.peak, mono.first_s0) == ((8000, 1, 3L, 2865L, 962, -962)))
    // docId=4 inserts the junk LIST chunk: a parser that assumes data
    // at offset 36 would misread; chunk walking must skip it
    val withJunk = Multimodal.decodeWavPcm16(
      Multimodal.buildWavPcm16(4L, 5, 16000, 2)).get
    val exp = (for (i <- 0 until 5; ch <- 0 until 2)
      yield math.abs((4L * 31 + i * 7 + ch * 13) % 2048 - 1024)).sum
    assert((withJunk.channels, withJunk.n_frames, withJunk.sum_abs) ==
      ((2, 5L, exp)))
    // positive and negative samples both round-trip (sign extension)
    val big = Multimodal.decodeWavPcm16(
      Multimodal.buildWavPcm16(1000L, 300, 24000, 2)).get
    assert(big.n_frames == 300L && big.peak <= 1024)
    // malformed payloads
    val ok = Multimodal.buildWavPcm16(3L, 4, 8000, 1)
    assert(Multimodal.decodeWavPcm16("RIFFxxxxAVI ".getBytes ++
      new Array[Byte](40)).isEmpty)                      // not WAVE
    assert(Multimodal.decodeWavPcm16(ok.take(43)).isEmpty) // truncated
    val badFmt = ok.clone(); badFmt(20) = 3                // float PCM
    assert(Multimodal.decodeWavPcm16(badFmt).isEmpty)
    val bad8bit = ok.clone(); bad8bit(34) = 8
    assert(Multimodal.decodeWavPcm16(bad8bit).isEmpty)
  }

  test("AVI decoder: nested RIFF walk, frame-count cross-check, " +
      "bottom-up frames, malformed rejection") {
    // golden: docId=1, 2 frames of 2x2 (stride 8)
    //   B(f,x,y)=1+f+2x  -> f0 {1,3,1,3} f1 {2,4,2,4} sum 20
    //   G(f,x,y)=1+2f+3y -> f0 {1,1,4,4} f1 {3,3,6,6} sum 28
    //   R(f,x,y)=1+fx+y  -> f0 {1,1,2,2} f1 {1,2,2,3} sum 14
    //   frame0 logical (0,0) G = 1 (stored in the LAST DIB row)
    val g = Multimodal.decodeAvi(Multimodal.buildAvi(1L, 2, 2, 2)).get
    assert((g.width, g.height, g.n_frames, g.sum_b, g.sum_g, g.sum_r,
      g.f0_px00_g) == ((2, 2, 2L, 20L, 28L, 14L, 1)))
    // round trip at the query's 5x4 shape (1 pad byte per row)
    for (id <- Seq(0L, 200L, 99999L)) {
      val nf = 3 + (id % 3).toInt
      val r = Multimodal.decodeAvi(Multimodal.buildAvi(id, nf, 5, 4)).get
      val expG = (for (f <- 0 until nf; _ <- 0 until 5; y <- 0 until 4)
        yield (id + 2L * f + 3 * y) % 256).sum
      assert((r.n_frames, r.sum_g, r.f0_px00_g) ==
        ((nf.toLong, expG, (id % 256).toInt)), s"id=$id")
    }
    // malformed: header/frame mismatch rejected, not half-parsed
    val ok2 = Multimodal.buildAvi(5L, 3, 5, 4)
    val lyingHeader = ok2.clone()
    // dwTotalFrames byte: RIFF(12) + LIST hdr(12) + avih hdr(8) + 16 = 48
    lyingHeader(48) = 9
    assert(Multimodal.decodeAvi(lyingHeader).isEmpty)
    assert(Multimodal.decodeAvi("RIFFxxxxWAVE".getBytes ++
      new Array[Byte](40)).isEmpty) // not AVI
    assert(Multimodal.decodeAvi(ok2.take(ok2.length - 10)).isEmpty) // truncated
  }

  test("PNG decoder: lossless build->decode round trip via the real JDK " +
      "codec, hand-parsed IHDR fields, junk rejected") {
    for (id <- Seq(0L, 7L, 255L, 99999L)) {
      val r = Multimodal.decodePng(Multimodal.buildPng(id, 9, 6)).get
      val expR = (for (x <- 0 until 9; y <- 0 until 6)
        yield (id + x.toLong * y) % 256).sum
      val expG = (for (_ <- 0 until 9; y <- 0 until 6)
        yield (id + 3L * y) % 256).sum
      val expB = (for (x <- 0 until 9; _ <- 0 until 6)
        yield (id + 2L * x) % 256).sum
      assert((r.width, r.height, r.hdr_w, r.hdr_h, r.bit_depth) ==
        ((9, 6, 9, 6, 8)), s"id=$id")
      assert((r.sum_r, r.sum_g, r.sum_b, r.px00_g) ==
        ((expR, expG, expB, (id % 256).toInt)), s"id=$id")
    }
    assert(Multimodal.decodePng("not a png at all, clearly".getBytes)
      .isEmpty)
    // BMP magic is not PNG magic
    assert(Multimodal.decodePng(Multimodal.buildBmp24(1L, 7, 5)).isEmpty)
    // truncated PNG: signature ok but pixel data gone
    val png = Multimodal.buildPng(3L, 9, 6)
    assert(Multimodal.decodePng(png.take(40)).isEmpty)
  }

  test("JPEG decoder: marker walk to SOF0, real entropy decode, " +
      "DCT-aligned blocks re-quantize EXACTLY (no tolerance)") {
    for (id <- Seq(0L, 1L, 2L, 3L, 42L, 99999L)) {
      val r = Multimodal.decodeJpeg(Multimodal.buildJpeg(id)).get
      assert((r.width, r.height, r.sof_w, r.sof_h) == ((24, 16, 24, 16)),
        s"id=$id")
      assert((r.n_components, r.prec_bits, r.n_blocks) == ((3, 8, 6)),
        s"id=$id")
      val expSum = (for (bx <- 0 until 3; by <- 0 until 2)
        yield ((id + bx + 2L * by) % 4) * (1 + bx + 10 * by)).sum
      assert(r.block_sum === expSum, s"id=$id block levels must " +
        "re-quantize to the exact source levels")
    }
    assert(Multimodal.decodeJpeg("JFIF but not really".getBytes).isEmpty)
    assert(Multimodal.decodeJpeg(Multimodal.buildPng(1L, 9, 6)).isEmpty)
    // truncated mid-SOF (SOI + SOF0 marker, frame header cut off):
    // must reject as malformed, never throw out of the partition task
    assert(Multimodal.decodeJpeg(Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00,
      0x08, 0x01, 0x00).map(_.toByte)).isEmpty)
    val jpg = Multimodal.buildJpeg(9L)
    assert(Multimodal.decodeJpeg(jpg.take(24)).isEmpty)
  }
}
