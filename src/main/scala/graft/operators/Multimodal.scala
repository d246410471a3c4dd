package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column processing (builder brief): image/audio/video
  * payloads ride as opaque BINARY columns with typed metadata; decode /
  * feature-extract runs BATCHED per partition (the Scala analog of
  * `mapInPandas`: one iterator in, one iterator out, arbitrary batch
  * state amortized across rows — here a reusable scratch buffer).
  *
  * Real decoders ship for the formats this container can decode honestly:
  * BMP/WAV/AVI (pure byte arithmetic, below) and PNG/JPEG (the JDK's
  * dependency-free javax.imageio codecs). `decodeStub` remains only as
  * the deterministic stand-in for formats with no in-container codec
  * (WebP, MP3, H.264, ...): it derives a fixed-length "feature vector"
  * from the payload bytes. The Spark-side plumbing — schema, partition
  * batching, row shape — is identical across real and stubbed paths and
  * spec-tested (MultimodalSpec).
  */
object Multimodal {

  // ImageIO defaults to FILE-backed stream caches: every encode/decode
  // materializes (and deletes) a temp file even for a fully in-memory
  // byte-array payload. For the thousands of tiny images this engine
  // pushes through javax.imageio that is pure filesystem churn, and it
  // made the 32-way parallel JPEG pass bimodal (0.5–3.4 s run-to-run,
  // round-7 measurement). Memory-cached streams are strictly better
  // here; the object initializer runs wherever the codec closures run,
  // so executors get the setting too.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, media_type: String,
                            payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
                              n_bytes: Long, width: Int, height: Int,
                              features: Array[Float])

  val FeatureDim = 8

  /** Document ids spread across the session's full parallelism. The
    * documents table is ONE small parquet file, so its raw scan is a
    * single task — and every codec build/decode downstream would run
    * serially on one core (measured: the whole JPEG encode+decode pass
    * on 1 of 32 cores). Repartitioning just the 8-byte ids — never any
    * payload — spreads the per-row codec work across every core for one
    * tiny shuffle (guide §2.6/§6: input splits bound scan parallelism;
    * repartition right after a too-coarse read). defaultParallelism is
    * scale-adaptive: local[n] → n, a cluster → total executor cores.
    */
  private def docIds(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Deterministic stand-in for codecs absent from this container
    * (WebP, MP3, H.264, ...): byte histogram moments folded into
    * FeatureDim floats + fake dimensions from the header. Formats the
    * JDK can decode get REAL decoders below (BMP/WAV/AVI by hand,
    * PNG/JPEG via javax.imageio); a real deployment swaps this body for
    * the remaining codec calls and everything around it stays.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? <- out-of-container codec goes here; deterministic fake below
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val w = 64 + (if (payload.length > 4) (payload(4) & 0xff) else 0)
    val h = 64 + (if (payload.length > 5) (payload(5) & 0xff) else 0)
    (w, h, f)
  }

  /** Batched decode over partitions: the mapInPandas-shaped path. The
    * iterator-in/iterator-out signature lets a real codec reuse native
    * buffers across the whole partition instead of per row.
    */
  def decodeBatched(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens HERE (e.g. native codec handle)
      rows.map { m =>
        val (w, h, feats) = decodeStub(m.payload)
        DecodedRow(m.doc_id, m.media_type, m.payload.length.toLong,
          w, h, feats)
      }
    }
  }

  final case class FrameRow(doc_id: Long, frame_no: Int, frame_len: Int,
                            frame_md5: String)

  val FrameBytes = 256

  /** Frame sampling — the one-row→many-rows batch shape (a video row
    * yields ⌈n_bytes/FrameBytes⌉ frame rows). mapPartitions + flatMap is
    * the Scala analog of a mapInPandas generator: the digest (stand-in
    * for a codec/seek handle) is allocated ONCE per partition and reused
    * across every frame of every row. Frame i covers payload bytes
    * [i·FrameBytes, min(len, (i+1)·FrameBytes)) — deterministic, so the
    * DuckDB oracle reconstructs each frame's md5 byte-for-byte.
    */
  def frameSample(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition
      rows.flatMap { m =>
        val len = m.payload.length
        val n = math.max(1, (len + FrameBytes - 1) / FrameBytes)
        Iterator.tabulate(n) { i =>
          val from = i * FrameBytes
          val until = math.min(len, from + FrameBytes)
          md.reset()
          val hex = md.digest(java.util.Arrays.copyOfRange(m.payload, from,
            until)).map("%02x".format(_)).mkString
          FrameRow(m.doc_id, i, until - from, hex)
        }
      }
    }
  }

  /** Aspect-preserving downscale plan (pure column arithmetic, exact
    * across engines): dims are kept when max(w,h) ≤ target, else both
    * floor-scale by target/max (small-int double math — exact).
    */
  def resizedDims(w: org.apache.spark.sql.Column,
                  h: org.apache.spark.sql.Column,
                  target: Int): (org.apache.spark.sql.Column,
                                 org.apache.spark.sql.Column) = {
    val mx = greatest(w, h)
    def scaled(d: org.apache.spark.sql.Column) =
      when(mx <= target, d)
        .otherwise(greatest(lit(1),
          floor(d * lit(target) / mx).cast("int")))
    (scaled(w), scaled(h))
  }

  // ---- REAL decoder: uncompressed 24-bpp BMP ------------------------------
  // The codec STUB above stands in for formats whose decoders need
  // native libraries (JPEG/PNG/audio). Uncompressed BMP needs none —
  // it is pure byte arithmetic — so the engine carries an honest
  // decoder for it: header validation, little-endian fields, BOTTOM-UP
  // row order, and 4-byte row-stride padding are all real parsing that
  // the oracle checks through a build→decode round trip.

  final case class BmpRow(doc_id: Long, width: Int, height: Int,
                          sum_b: Long, sum_g: Long, sum_r: Long, px00_g: Int)

  /** Deterministic synthetic 24-bpp bottom-up BMP: pixel (x, y) has
    * B = (docId + 2x) % 256, G = (docId + 3y) % 256,
    * R = (docId + x·y) % 256 — formulas a SQL oracle reproduces
    * exactly. Rows are written bottom-up with 4-byte stride padding,
    * so a decoder that ignores either produces wrong answers.
    */
  def buildBmp24(docId: Long, w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'; le32(2, size); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h); le16(26, 1); le16(28, 24)
    le32(30, 0); le32(34, stride * h)
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * stride // bottom-up: logical row y
      var x = 0
      while (x < w) {
        b(base + x * 3) = ((docId + 2 * x) % 256).toByte
        b(base + x * 3 + 1) = ((docId + 3 * y) % 256).toByte
        b(base + x * 3 + 2) = ((docId + x.toLong * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse an uncompressed 24-bpp BMP: returns (width, height, channel
    * sums over all pixels, G of the LOGICAL top-left pixel — which
    * lives in the LAST stored row, so mishandled bottom-up order is
    * caught). None for anything that is not a well-formed uncompressed
    * 24-bpp BMP (callers fall back to [[decodeStub]]).
    */
  def decodeBmp24(p: Array[Byte]): Option[BmpRow] = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = le32(10); val w = le32(18); val h = le32(22)
    if (le16(28) != 24 || le32(30) != 0 || w <= 0 || h <= 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (off < 54 || p.length < off.toLong + stride.toLong * h) return None
    var sb = 0L; var sg = 0L; var sr = 0L
    var r = 0
    while (r < h) {
      val base = off + r * stride
      var x = 0
      while (x < w) {
        sb += p(base + x * 3) & 0xff
        sg += p(base + x * 3 + 1) & 0xff
        sr += p(base + x * 3 + 2) & 0xff
        x += 1
      }
      r += 1
    }
    val px00g = p(off + (h - 1) * stride + 1) & 0xff
    Some(BmpRow(-1L, w, h, sb, sg, sr, px00g))
  }

  /** Batched real decode: same mapPartitions shape as [[decodeBatched]];
    * rows that are not valid BMPs are dropped (a production pipeline
    * would route them to the stub/codec path instead).
    */
  def decodeBmpBatched(media: Dataset[MediaRow]): Dataset[BmpRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m =>
        decodeBmp24(m.payload).map(_.copy(doc_id = m.doc_id)))
    }
  }

  /** BMP media table from documents: every doc carries a real 7×5
    * 24-bpp bitmap (odd width → 3 bytes of row padding exercised).
    */
  def bmpFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map(id => MediaRow(id, "image", buildBmp24(id, 7, 5))))
  }

  // ---- REAL decoder: RIFF/WAVE PCM-16 audio -------------------------------
  // Same reasoning as BMP: PCM WAV needs no codec library — RIFF chunk
  // walking, little-endian header fields, and interleaved int16 frames
  // are pure byte arithmetic — so the audio modality also carries an
  // honest decoder next to the stub.

  final case class WavRow(doc_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Long, sum_abs: Long, peak: Int,
                          first_s0: Int)

  /** Deterministic PCM-16 WAV: frame i, channel ch has sample
    * s = ((docId·31 + i·7 + ch·13) % 2048) − 1024 (int16-safe, SQL-
    * reproducible). Every 4th doc gets a junk `LIST` chunk between
    * `fmt ` and `data`, so a decoder that assumes data at byte 36
    * instead of WALKING chunks misparses it.
    */
  def buildWavPcm16(docId: Long, frames: Int, sampleRate: Int,
                    channels: Int): Array[Byte] = {
    val junk = if (docId % 4 == 0) 12 else 0 // "LIST" + size + 4 payload
    val dataSize = frames * channels * 2
    val b = new Array[Byte](44 + junk + dataSize)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => b(off + i) = c }
    tag(0, "RIFF"); le32(4, b.length - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, channels)
    le32(24, sampleRate); le32(28, sampleRate * channels * 2)
    le16(32, channels * 2); le16(34, 16)
    var off = 36
    if (junk > 0) { tag(off, "LIST"); le32(off + 4, 4); off += 12 }
    tag(off, "data"); le32(off + 4, dataSize)
    var i = 0
    while (i < frames) {
      var ch = 0
      while (ch < channels) {
        val s = ((docId * 31 + i.toLong * 7 + ch * 13) % 2048 - 1024).toInt
        le16(off + 8 + (i * channels + ch) * 2, s & 0xffff)
        ch += 1
      }
      i += 1
    }
    b
  }

  /** Parse a PCM-16 RIFF/WAVE payload by WALKING its chunks (fmt may be
    * followed by LIST/INFO or other chunks before data). Returns frame
    * count, Σ|sample| and peak over all channels, and the first sample
    * of channel 0. None for non-WAV / non-PCM-16 payloads.
    */
  def decodeWavPcm16(p: Array[Byte]): Option[WavRow] = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def tag(off: Int): String =
      new String(p.slice(off, off + 4), "US-ASCII")
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1; var chans = -1; var dataOff = -1; var dataLen = -1
    while (off + 8 <= p.length && (dataOff < 0 || rate < 0)) {
      val id = tag(off); val size = le32(off + 4)
      if (size < 0 || off + 8 + size > p.length) return None
      id match {
        case "fmt " =>
          if (size < 16 || le16(off + 8) != 1 || le16(off + 8 + 14) != 16)
            return None // PCM int16 only
          chans = le16(off + 8 + 2); rate = le32(off + 8 + 4)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => () // skip unknown chunks (LIST/INFO/fact/...)
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (rate <= 0 || chans <= 0 || dataOff < 0 || dataLen % (chans * 2) != 0)
      return None
    val frames = dataLen / (chans * 2)
    var sum = 0L; var peak = 0
    var i = 0
    while (i < dataLen) {
      val s = (le16(dataOff + i) << 16) >> 16 // sign-extend int16
      val a = math.abs(s)
      sum += a; if (a > peak) peak = a
      i += 2
    }
    val first = if (frames > 0) (le16(dataOff) << 16) >> 16 else 0
    Some(WavRow(-1L, rate, chans, frames.toLong, sum, peak, first))
  }

  /** Batched real audio decode (same shape as [[decodeBmpBatched]]). */
  def decodeWavBatched(media: Dataset[MediaRow]): Dataset[WavRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m =>
        decodeWavPcm16(m.payload).map(_.copy(doc_id = m.doc_id)))
    }
  }

  /** WAV media table from documents: per-doc frame count, rate, and
    * channel count all vary with doc_id.
    */
  def wavFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map { id =>
        MediaRow(id, "audio", buildWavPcm16(id,
          frames = 50 + (id % 50).toInt,
          sampleRate = 8000 * (1 + (id % 3).toInt),
          channels = 1 + (id % 2).toInt))
      })
  }

  // ---- REAL decoder: RIFF AVI with uncompressed DIB frames ----------------
  // Completes the modality triple: video as a real container parse.
  // Uncompressed AVI is nested RIFF — a `hdrl` LIST holding the `avih`
  // main header, then a `movi` LIST holding one `00db` chunk per frame
  // of raw bottom-up DIB pixels — all walkable with byte arithmetic.

  final case class AviRow(doc_id: Long, width: Int, height: Int,
                          n_frames: Long, sum_b: Long, sum_g: Long,
                          sum_r: Long, f0_px00_g: Int)

  /** Deterministic synthetic AVI: frame f, pixel (x, y) has
    * B = (docId + f + 2x) % 256, G = (docId + 2f + 3y) % 256,
    * R = (docId + f·x + y) % 256; frames stored as bottom-up DIB rows
    * with 4-byte stride (w = 5 → 1 pad byte per row).
    */
  def buildAvi(docId: Long, frames: Int, w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val hdrlSize = 4 + 8 + 56                 // 'hdrl' + avih chunk
    val moviSize = 4 + frames * (8 + frameBytes)
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val b = new Array[Byte](total)
    def le32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => b(off + i) = c }
    tag(0, "RIFF"); le32(4, total - 8); tag(8, "AVI ")
    var off = 12
    tag(off, "LIST"); le32(off + 4, hdrlSize); tag(off + 8, "hdrl")
    tag(off + 12, "avih"); le32(off + 16, 56)
    val avih = off + 20
    le32(avih, 40000)            // dwMicroSecPerFrame (25 fps)
    le32(avih + 16, frames)      // dwTotalFrames
    le32(avih + 24, 1)           // dwStreams
    le32(avih + 32, w); le32(avih + 36, h)
    off += 8 + hdrlSize
    tag(off, "LIST"); le32(off + 4, moviSize); tag(off + 8, "movi")
    off += 12
    var f = 0
    while (f < frames) {
      tag(off, "00db"); le32(off + 4, frameBytes)
      var y = 0
      while (y < h) {
        val base = off + 8 + (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          b(base + x * 3) = ((docId + f + 2 * x) % 256).toByte
          b(base + x * 3 + 1) = ((docId + 2L * f + 3 * y) % 256).toByte
          b(base + x * 3 + 2) = ((docId + f.toLong * x + y) % 256).toByte
          x += 1
        }
        y += 1
      }
      off += 8 + frameBytes
      f += 1
    }
    b
  }

  /** Parse an uncompressed AVI: walk the top-level RIFF chunks, read
    * width/height/totalFrames from `avih` inside the `hdrl` LIST, then
    * walk the `movi` LIST counting `00db`/`00dc` frame chunks and
    * accumulating channel sums (bottom-up DIB rows, stride padding).
    * The counted frames must MATCH the header's dwTotalFrames — a
    * container whose index lies is rejected, not half-parsed. None for
    * anything that is not this shape.
    */
  def decodeAvi(p: Array[Byte]): Option[AviRow] = {
    def le32(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    def tag(off: Int): String = new String(p.slice(off, off + 4), "US-ASCII")
    if (p.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var off = 12
    var w = -1; var h = -1; var total = -1
    var frames = 0L; var sb = 0L; var sg = 0L; var sr = 0L
    var f0px00g = -1
    while (off + 8 <= p.length) {
      val id = tag(off); val size = le32(off + 4)
      if (size < 0 || off + 8 + size > p.length) return None
      if (id == "LIST" && size >= 4) {
        val sub = tag(off + 8)
        var in = off + 12
        val end = off + 8 + size
        if (sub == "hdrl") {
          while (in + 8 <= end) {
            val cid = tag(in); val csz = le32(in + 4)
            if (csz < 0 || in + 8 + csz > end) return None
            if (cid == "avih" && csz >= 40) {
              total = le32(in + 8 + 16)
              w = le32(in + 8 + 32); h = le32(in + 8 + 36)
            }
            in += 8 + csz + (csz & 1)
          }
        } else if (sub == "movi") {
          if (w <= 0 || h <= 0) return None // header must precede frames
          val stride = ((w * 3 + 3) / 4) * 4
          while (in + 8 <= end) {
            val cid = tag(in); val csz = le32(in + 4)
            if (csz < 0 || in + 8 + csz > end) return None
            if (cid == "00db" || cid == "00dc") {
              if (csz != stride * h) return None
              var r = 0
              while (r < h) {
                val base = in + 8 + r * stride
                var x = 0
                while (x < w) {
                  sb += p(base + x * 3) & 0xff
                  sg += p(base + x * 3 + 1) & 0xff
                  sr += p(base + x * 3 + 2) & 0xff
                  x += 1
                }
                r += 1
              }
              if (frames == 0)
                f0px00g = p(in + 8 + (h - 1) * stride + 1) & 0xff
              frames += 1
            }
            in += 8 + csz + (csz & 1)
          }
        }
      }
      off += 8 + size + (size & 1)
    }
    if (w <= 0 || h <= 0 || total < 0 || frames != total || frames == 0) None
    else Some(AviRow(-1L, w, h, frames, sb, sg, sr, f0px00g))
  }

  /** Batched real video decode (same shape as the other decoders). */
  def decodeAviBatched(media: Dataset[MediaRow]): Dataset[AviRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => decodeAvi(m.payload).map(_.copy(doc_id = m.doc_id)))
    }
  }

  /** AVI media table from documents: 5×4 frames, 3-5 frames per doc. */
  def aviFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map(id =>
        MediaRow(id, "video", buildAvi(id, 3 + (id % 3).toInt, 5, 4))))
  }

  /** Build a media table from documents: payload = magic + UTF-8 bytes
    * (deterministic; real pipelines read the bytes from the lake).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // same single-file-scan parallelism fix as [[docIds]]: spread the
    // rows before the per-row decode downstream (payloads here ARE the
    // text bytes, so they move through this one shuffle regardless)
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
          .as("media_type"),
        concat(encode(lit("IMG0"), "UTF-8"), encode(col("text"), "UTF-8"))
          .as("payload"))
      .as[MediaRow]
  }

  // ---- REAL decoder: PNG + JPEG via javax.imageio ------------------------
  // VERDICT r05 item 2: real crawl payloads are ~100% JPEG/PNG/WebP, and
  // the JDK ships JPEG/PNG/GIF codecs dependency-free (ImageIO). The
  // same mapPartitions batch path as the BMP/WAV/AVI parsers drives the
  // real compressed codecs here: PNG round-trips LOSSLESSLY (the oracle
  // checks exact per-channel pixel sums from the build formulas), JPEG
  // is lossy so the oracle checks the SOF0 header fields parsed by an
  // honest marker-segment walk plus tolerance-free integer features
  // (solid 8x8 blocks aligned to the DCT grid reconstruct to within DC
  // quantization error, so a /64 re-quantization of the decoded block
  // means recovers the source level EXACTLY).

  /** Deterministic RGB image with the BMP pixel formulas:
    * R = (docId + x·y) % 256, G = (docId + 3y) % 256,
    * B = (docId + 2x) % 256.
    */
  private def buildImage(docId: Long, w: Int,
                         h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId + x.toLong * y) % 256).toInt
        val g = ((docId + 3L * y) % 256).toInt
        val b = ((docId + 2L * x) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode to PNG (lossless, JDK codec). */
  def buildPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buildImage(docId, w, h), "png", bos)
    bos.toByteArray
  }

  final case class PngRow(doc_id: Long, width: Int, height: Int,
                          hdr_w: Int, hdr_h: Int, bit_depth: Int,
                          sum_r: Long, sum_g: Long, sum_b: Long,
                          px00_g: Int)

  /** Parse a PNG: the 8-byte signature and the IHDR chunk fields are
    * read by hand (big-endian width/height at offsets 16/20, bit depth
    * at 24 — IHDR is required to be the first chunk), then the full
    * pixel decode (zlib inflate + scanline unfiltering) runs through
    * the JDK's real PNG reader. None for non-PNG payloads.
    */
  def decodePng(p: Array[Byte]): Option[PngRow] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a)
    if (p.length < 33 || !sig.indices.forall(i => (p(i) & 0xff) == sig(i)))
      return None
    def be32(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    if (new String(p.slice(12, 16), "US-ASCII") != "IHDR") return None
    val hw = be32(16); val hh = be32(20); val depth = p(24) & 0xff
    // truncated/corrupt streams make the JDK reader THROW, not return
    // null — both mean "not a decodable PNG" here
    val img = scala.util.Try(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p))).getOrElse(null)
    if (img == null) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    Some(PngRow(-1L, img.getWidth, img.getHeight, hw, hh, depth,
      sr, sg, sb, (img.getRGB(0, 0) >> 8) & 0xff))
  }

  def decodePngBatched(media: Dataset[MediaRow]): Dataset[PngRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => decodePng(m.payload).map(_.copy(doc_id = m.doc_id)))
    }
  }

  /** PNG media table: every doc carries a real 9×6 RGB PNG. */
  def pngFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions(_.map(id => MediaRow(id, "image", buildPng(id, 9, 6))))
  }

  /** JPEG block geometry: 3×2 solid 8×8 blocks, gray level
    * 32 + 64·((docId + bx + 2·by) % 4) — aligned to the DCT grid so
    * each luma block is constant and reconstructs to within DC
    * quantization error (≪ 32 at the pinned 0.9 quality), making the
    * /64 re-quantization below exact.
    */
  val JpegBlocksX = 3
  val JpegBlocksY = 2

  def jpegLevel(docId: Long, bx: Int, by: Int): Int =
    32 + 64 * (((docId + bx + 2L * by) % 4).toInt)

  /** Encode to JPEG at PINNED quantization (explicit 0.9 quality),
    * through a REUSED writer — the per-partition batch state the
    * mapPartitions plumbing exists for (service lookup + writer
    * construction amortize across the whole partition).
    */
  def buildJpeg(docId: Long, writer: javax.imageio.ImageWriter): Array[Byte] = {
    val w = JpegBlocksX * 8; val h = JpegBlocksY * 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = jpegLevel(docId, x / 8, y / 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.9f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally ios.close()
    bos.toByteArray
  }

  def newJpegWriter(): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()

  /** Single-shot convenience (specs): own writer per call. */
  def buildJpeg(docId: Long): Array[Byte] = {
    val w = newJpegWriter()
    try buildJpeg(docId, w) finally w.dispose()
  }

  final case class JpegRow(doc_id: Long, width: Int, height: Int,
                           sof_w: Int, sof_h: Int, n_components: Int,
                           prec_bits: Int, n_blocks: Int, block_sum: Long)

  /** Parse a JPEG: SOI check + an honest marker-segment walk to SOF0/1/2
    * (big-endian segment lengths; precision, dims, and component count
    * read from the frame header), then the full entropy decode through
    * the JDK's real JPEG reader. Features re-quantize each 8×8 block's
    * green-channel mean to its /64 level index — EXACT integers (no
    * tolerance) because the source blocks sit on the DCT grid.
    * block_sum position-weights the level indices so a decoder that
    * scrambles block order fails the compare. None for non-JPEG input.
    */
  def decodeJpeg(p: Array[Byte]): Option[JpegRow] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    // marker walk: FFD8, then segments [FF mk len16 payload...] until a
    // start-of-frame marker (C0 baseline / C1 extended / C2 progressive)
    var off = 2
    var sof: Option[(Int, Int, Int, Int)] = None
    while (sof.isEmpty && off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return None
      val mk = p(off + 1) & 0xff
      if (mk == 0xc0 || mk == 0xc1 || mk == 0xc2) {
        // frame header fields reach p(off+9): a payload truncated
        // mid-SOF is malformed input, not a task-killing exception
        if (off + 10 > p.length) return None
        val prec = p(off + 4) & 0xff
        sof = Some((be16(off + 5), be16(off + 7), p(off + 9) & 0xff, prec))
      } else if (mk == 0xd9 || mk == 0xda) {
        return None // hit end/scan without a frame header
      } else {
        off += 2 + be16(off + 2)
      }
    }
    sof.flatMap { case (sofH, sofW, ncomp, prec) =>
      val img = scala.util.Try(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))).getOrElse(null)
      if (img == null) None
      else {
        val bw = img.getWidth / 8; val bh = img.getHeight / 8
        var blockSum = 0L
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            var s = 0L
            var y = by * 8
            while (y < by * 8 + 8) {
              var x = bx * 8
              while (x < bx * 8 + 8) {
                s += (img.getRGB(x, y) >> 8) & 0xff
                x += 1
              }
              y += 1
            }
            // mean → /64 level index; source levels are 32+64k, so any
            // decode within ±32 of the source maps back exactly
            val level = (s / 64.0 / 64.0).toInt
            blockSum += level.toLong * (1 + bx + 10 * by)
            bx += 1
          }
          by += 1
        }
        Some(JpegRow(-1L, img.getWidth, img.getHeight, sofW, sofH,
          ncomp, prec, bw * bh, blockSum))
      }
    }
  }

  def decodeJpegBatched(media: Dataset[MediaRow]): Dataset[JpegRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => decodeJpeg(m.payload).map(_.copy(doc_id = m.doc_id)))
    }
  }

  /** JPEG media table: every doc carries a real 24×16 baseline JPEG,
    * encoded through ONE writer per partition.
    */
  def jpegFromDocuments(spark: SparkSession,
                        dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    docIds(spark, dir)
      .mapPartitions { ids =>
        val writer = newJpegWriter() // per-partition batch state
        // dispose native writer structures when the TASK ends (covers
        // both full drains and failures — not just iterator exhaustion)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => writer.dispose()))
        ids.map(id => MediaRow(id, "image", buildJpeg(id, writer)))
      }
  }
}
