package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column processing (builder brief): image/audio/video
  * payloads ride as opaque BINARY columns with typed metadata; decode /
  * feature-extract runs BATCHED per partition (the Scala analog of
  * `mapInPandas`: one iterator in, one iterator out, arbitrary batch
  * state amortized across rows — here a reusable scratch buffer).
  *
  * The actual codec is STUBBED with a deterministic fake (no image/audio
  * libraries ship in this sandbox, per the brief): `decodeStub` derives a
  * fixed-length "feature vector" from the payload bytes. The Spark-side
  * plumbing — schema, partition batching, row shape — is real and
  * spec-tested (MultimodalSpec).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
                            payload: Array[Byte])
  final case class DecodedRow(doc_id: Long, media_type: String,
                              n_bytes: Long, width: Int, height: Int,
                              features: Array[Float])

  val FeatureDim = 8

  /** Deterministic stand-in for the real decoder: byte histogram moments
    * folded into FeatureDim floats + fake dimensions from the header.
    * Marked clearly as a stub — a real deployment swaps this body for
    * the codec call; everything around it stays.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? <- real codec goes here; deterministic fake below
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

  /** Build a media table from documents: payload = magic + UTF-8 bytes
    * (deterministic; real pipelines read the bytes from the lake).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
          .as("media_type"),
        concat(encode(lit("IMG0"), "UTF-8"), encode(col("text"), "UTF-8"))
          .as("payload"))
      .as[MediaRow]
  }
}
