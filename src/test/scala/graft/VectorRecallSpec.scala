package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** q_embedding_neardup is APPROXIMATE (label ∧ 12-bit sign-LSH bucket
  * candidates): its DuckDB oracle mirrors the same bucket pre-filter, so
  * the oracle alone verifies engine-equality of the approximation, not
  * recall. This spec closes that gap with an EXACT all-pairs reference at
  * sf0.001 (ADVICE r02): the bucketed pair set must be a strict SUBSET of
  * the exact cosine≥0.95 pair set, must contain EVERY injected exact
  * duplicate (identical vectors always share a bucket — sign-LSH's
  * recall-1 class), and the measured recall is reported so the trade is a
  * number, not an adjective.
  */
class VectorRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("neardup edges ⊆ exact pairs, all exact dups connected, " +
      "recall measured") {
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
    // same augmentation as the query: every 10th vector duplicated
    val corpus = base.unionByName(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
        col("label")))
    val withNorm = corpus.withColumn("nrm",
      sqrt(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), _ + _)))
    val a = withNorm.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("label"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("label"), col("nrm").as("nb"))
    val cos = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _) /
      (col("na") * col("nb"))
    // EXACT reference: all pairs within a label (no bucket filter)
    val exact = a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cos, 6)).filter(col("cos") >= 0.95)
      .select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val edges = VectorQueries.defs
      .find(_.name == "q_embedding_neardup").get.fn(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // r05 semantics: the query emits candidate EDGES (rep election), so
    // every edge must still join a genuinely-similar pair...
    assert(edges.subsetOf(exact),
      s"every emitted edge must be an exact cosine≥0.95 pair; " +
        s"extras: ${edges.diff(exact).take(5)}")
    // ...and the injected exact duplicates (v, v+100000) must be
    // CONNECTED through the edge set (a duplicate group's members all
    // attach to its elected representative, possibly not to each other)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val dupPairs = base.filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
      .map(v => (v, v + 100000)).toSet
    val unconnected = dupPairs.filter { case (a, b) => find(a) != find(b) }
    assert(unconnected.isEmpty,
      s"identical vectors always share a bucket, so each duplicate must " +
        s"connect to its original; missing: ${unconnected.take(5)}")
    // connected-pair recall: exact pairs reachable through the edge set
    val connected = exact.count { case (a, b) => find(a) == find(b) }
    val recall =
      if (exact.isEmpty) 1.0 else connected.toDouble / exact.size
    info(f"sign-LSH neardup connected-pair recall at sf0.001: " +
      f"${recall * 100}%.1f%% ($connected/${exact.size} exact pairs)")
    assert(recall >= dupPairs.size.toDouble / math.max(exact.size, 1))
  }

  test("multi-probe lsh recall dominates single-bucket recall " +
      "(candidates are a superset, ranking key identical)") {
    import spark.implicits._
    val exact = VectorQueries.defs.find(_.name == "q_vector_topk").get
      .fn(spark, dir).filter(col("rank") <= 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recallOf(name: String): Double = {
      val got = VectorQueries.defs.find(_.name == name).get
        .fn(spark, dir)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val single = recallOf("q_vector_lsh")
    val multi = recallOf("q_vector_lsh_multiprobe")
    // NOTE on the absolute numbers: the synthetic corpus is near-random
    // vectors, whose exact top-3 neighbors rarely agree on ≥11 of 12
    // sign bits — so both recalls sit near zero HERE by construction.
    // Sign-LSH's recall-1 class is (near-)identical vectors, which the
    // neardup test above covers at 100%; this test pins the DOMINANCE
    // property, which holds on any corpus.
    info(f"sign-LSH top-3 recall vs exact: single-bucket " +
      f"${single * 100}%.1f%%, multi-probe(r=1) ${multi * 100}%.1f%%")
    assert(multi >= single,
      "radius-1 probing only ADDS candidates, and the approximate " +
        "top-3 ranks by the exact cosine, so recall cannot drop")
  }

  test("IVF recall ladder: non-decreasing in nprobe, and nprobe=64 " +
      "(all cells) is identical to the exact top-3") {
    import spark.implicits._
    // exact reference = the brute-force topk restricted to rank ≤ 3
    val exact = VectorQueries.defs.find(_.name == "q_vector_topk").get
      .fn(spark, dir).filter(col("rank") <= 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def ivfAt(n: Int, iters: Int = 1): Set[(Long, Long)] =
      VectorQueries.ivfWith(spark, dir, n, iters)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    val ladder = Seq(1, 2, 4).map { n =>
      val got = ivfAt(n)
      val recall = got.intersect(exact).size.toDouble / exact.size
      info(f"IVF nprobe=$n%2d recall vs exact top-3: ${recall * 100}%.1f%%")
      recall
    }
    assert(ladder.zip(ladder.tail).forall { case (a, b) => b >= a },
      s"recall must be non-decreasing in nprobe: $ladder")
    // full probe = full candidate set = exact (same (cos, id) ranking)
    assert(ivfAt(64) == exact,
      "probing every cell must reproduce the exact top-3 verbatim")
    // the guarantee is invariant in training depth: however the Lloyd
    // loop moved the centroids, probing every cell still yields the
    // full candidate set and therefore the exact verbatim top-3
    assert(ivfAt(64, iters = 2) == exact,
      "exactness at full probe must hold after a second Lloyd step")
  }
}
