package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** VERDICT r05 item 1: the sign-LSH bucket joins must be bounded by
  * duplicate-cluster size. A k-vector identical cluster (the 10^5-page
  * boilerplate case — near-identical embeddings ⇒ IDENTICAL sign
  * buckets) previously paired all members inside one bucket: O(k²)
  * cosine rows. After exact-duplicate collapse:
  *   - q_embedding_neardup emits exactly k−1 member→rep edges plus one
  *     representative row to the bucket join (linear);
  *   - q_vector_lsh computes ONE cosine per (query, distinct embedding)
  *     and explodes at most 4 member ids per group for ranking — and
  *     stays row-identical to the member-level formulation.
  */
class VectorDupScaleSpec extends SparkTestBase {

  /** k identical vectors (one hot bucket), plus a few distinct ones. */
  private def hotCorpus(k: Int, distinct: Int = 0): DataFrame = {
    import spark.implicits._
    // local vals only: an outer method reference would drag the
    // non-serializable suite instance into the RDD closures
    val tail = VectorDupScaleSpec.padTail
    val dup = spark.sparkContext.parallelize(0 until k, 4)
      .map(i => (i.toLong, Array(0.5f, -0.25f, 0.75f, 0.1f) ++ tail, 1))
    val rest = spark.sparkContext.parallelize(0 until distinct, 2)
      .map(i => (100000L + i,
        Array(0.1f + i, 0.2f - i, -0.3f + i, 0.4f + i) ++ tail, 1))
    (dup ++ rest).toDF("vec_id", "embedding", "label")
  }

  private def pad(v: Array[Float]): Array[Float] =
    v ++ VectorDupScaleSpec.padTail

  test("neardup edges grow linearly in dup-cluster size (k-1, not k^2)") {
    assert(VectorQueries.nearDupFrom(hotCorpus(100)).count() === 99L)
    assert(VectorQueries.nearDupFrom(hotCorpus(1000)).count() === 999L)
  }

  test("neardup edges all point at the elected representative, cos = 1") {
    val got = VectorQueries.nearDupFrom(hotCorpus(50)).collect()
    assert(got.length === 49)
    assert(got.forall(_.getLong(1) == 0L), "rep must be min(vec_id)")
    assert(got.map(_.getLong(2)).sorted.toSeq === (1L until 50L))
    assert(got.forall(_.getDouble(3) == 1.0))
  }

  test("lsh candidate rows are one per (query, distinct embedding), " +
      "not one per member") {
    // 1000 identical vectors: queries are vec_id % 100 == 0 (10 of
    // them); the old member-level join made 10 × 1000 = 10,000 cosine
    // rows in this bucket, the collapsed form exactly 10
    val (cand, result) = VectorQueries.lshFrom(hotCorpus(1000))
    assert(cand.count() === 10L)
    // ranking still sees real member ids: top-3 per query = the 3
    // smallest ids in the group excluding the query itself
    val rows = result.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(rows(0L) === Seq(1L, 2L, 3L))
    assert(rows(100L) === Seq(0L, 1L, 2L))
    assert(rows(900L) === Seq(0L, 1L, 2L))
  }

  test("collapsed lsh is row-identical to the member-level formulation") {
    import spark.implicits._
    // mixed corpus: two duplicate groups (one containing the query),
    // several distinct vectors, ids chosen so 0/100/200 are queries
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> pad(Array(0.5f, -0.2f, 0.3f, 0.4f)),
      100L -> pad(Array(0.5f, -0.2f, 0.3f, 0.4f)), // dup of the query group
      200L -> pad(Array(-0.5f, 0.2f, -0.3f, 0.4f)),
      3L -> pad(Array(0.5f, -0.2f, 0.3f, 0.4f)),   // dup of the query group
      4L -> pad(Array(0.51f, -0.19f, 0.29f, 0.41f)),
      5L -> pad(Array(-0.5f, 0.21f, -0.31f, 0.39f)),
      6L -> pad(Array(-0.5f, 0.2f, -0.3f, 0.4f)),  // dup of 200
      7L -> pad(Array(0.9f, 0.1f, 0.2f, 0.1f)))
    val e = vecs.map { case (id, v) => (id, v, 1) }
      .toDF("vec_id", "embedding", "label")

    val got = VectorQueries.lshFrom(e)._2
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    // member-level reference: brute force within equal sign bucket
    def bucket(v: Array[Float]) =
      v.take(12).map(x => if (x > 0) '1' else '0').mkString
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      val raw = d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Seq(0L, 100L, 200L).flatMap { qid =>
      val qv = vecs.toMap.apply(qid)
      vecs.filter { case (id, v) =>
        id != qid && bucket(v) == bucket(qv) }
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1) }
    }.sortBy(t => (t._1, t._3))
    assert(got === expected)
  }
}

object VectorDupScaleSpec {
  /** Fixed sign-alternating tail padding 4-float stems to the 12 dims
    * signBucket reads.
    */
  val padTail: Array[Float] =
    Array(0.1f, -0.1f, 0.2f, -0.2f, 0.3f, -0.3f, 0.4f, -0.4f)
}
