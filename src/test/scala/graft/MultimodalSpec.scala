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
