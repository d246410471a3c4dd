package graft

import graft.queries.DedupQueries

/** VERDICT r04 item 1: MinHash-LSH candidate generation must be bounded
  * by duplicate-cluster size. A k-doc identical cluster lands in the
  * SAME (band, sig) bucket in every band; the old bucket self-join
  * emitted ~4·k²/2 pair rows (k=1000 → 499,500 distinct pairs), the
  * representative-election form emits exactly k−1 edges (member → min
  * doc_id rep). The count assertions below distinguish the two shapes
  * directly: a quadratic plan would still produce 499,500 rows after
  * distinct, not 999.
  */
class DedupScaleSpec extends SparkTestBase {

  private def identicalCluster(k: Int) = {
    import spark.implicits._
    spark.sparkContext.parallelize(0 until k, 4)
      .map(i => (i.toLong,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "src"))
      .toDF("doc_id", "text", "source")
  }

  test("minhash candidates grow linearly in dup-cluster size (k-1, not k^2)") {
    assert(DedupQueries.minhashEdges(identicalCluster(100)).count() === 99L)
    assert(DedupQueries.minhashEdges(identicalCluster(1000)).count() === 999L)
  }

  test("minhash edges all point at the elected bucket representative") {
    val edges = DedupQueries.minhashEdges(identicalCluster(50)).collect()
    assert(edges.length === 49)
    assert(edges.forall(_.getLong(0) == 0L), "rep must be min(doc_id)")
    assert(edges.map(_.getLong(1)).sorted.toSeq === (1L until 50L))
  }

  test("minhash edges preserve near-dup connectivity on mixed corpora") {
    import spark.implicits._
    // two distinct clusters + a singleton: edges must connect each
    // cluster to its own rep and never bridge clusters
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "a"),
      (2L, "the quick brown fox jumps over the lazy dog today", "a"),
      (3L, "completely different words appear in this second group here", "b"),
      (4L, "completely different words appear in this second group here", "b"),
      (5L, "a lone document with no duplicate partner at all present", "c")
    ).toDF("doc_id", "text", "source")
    val edges = DedupQueries.minhashEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((1L, 2L), (3L, 4L)))
  }
}
