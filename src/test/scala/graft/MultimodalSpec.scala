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
}
