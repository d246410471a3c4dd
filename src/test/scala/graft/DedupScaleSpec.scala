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

  test("connected components propagate min labels transitively " +
      "(chains need multiple rounds, not one hop)") {
    import spark.implicits._
    // 1-2-3 is a CHAIN (no 1-3 edge): doc 3 can only reach label 1
    // through a second propagation round, so this fails if the loop
    // stopped after one hop
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val verts = (1L to 7L).toDF("doc_id")
    val got = DedupQueries.connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connected components close pointer chains left by the final " +
      "contraction rounds (round-7 regression: an 8-chain mislabeled " +
      "its tail without the post-loop resolution pass)") {
    import spark.implicits._
    // long chains converge the contracted-edge check while some member
    // labels still point at a rep whose own label moved in the last
    // round — the resolution loop must follow those chains to the root
    val edges = (1L until 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val verts = (1L to 16L).toDF("doc_id")
    val got = DedupQueries.connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(got === (1L to 16L).map(_ -> 1L).toMap)
  }

  test("connected components over an empty graph is an empty label table") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val verts = Seq.empty[Long].toDF("doc_id")
    val n = DedupQueries.connectedComponents(edges, verts).count()
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(n === 0L)
  }

  test("a 1000-doc identical cluster collapses to one component") {
    val c = identicalCluster(1000)
    import org.apache.spark.sql.functions.col
    val labels = DedupQueries.connectedComponents(
      DedupQueries.minhashEdges(c), c.select("doc_id"))
    val distinctClusters =
      labels.select("cluster").distinct().collect().map(_.getLong(0)).toSeq
    val n = labels.count()
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(n === 1000L)
    assert(distinctClusters === Seq(0L), "all docs must label to min doc_id")
  }

  test("cluster-keyed split assignment can never leak near-dups across " +
      "splits (both edge endpoints share a cluster, hence a split)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mixed corpus with several multi-doc clusters
    // disjoint vocabulary per group: docs inside a group are identical,
    // docs across groups share NO shingles — 17 distinct clusters
    val docs = spark.sparkContext.parallelize(0 until 200, 4)
      .map { i =>
        val g = i % 17
        (i.toLong,
          (1 to 8).map(w => s"g${g}w$w").mkString(" "),
          "src")
      }
      .toDF("doc_id", "text", "source")
    val edges = DedupQueries.minhashEdges(docs)
    val labels = DedupQueries.connectedComponents(edges, docs.select("doc_id"))
      .withColumn("split",
        when(substring(md5(col("cluster").cast("string")), 1, 1) <= "c",
          "train").otherwise("eval"))
    val crossing = edges
      .join(labels.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(labels.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b")).count()
    val splits = labels.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(crossing === 0L, "no near-dup edge may cross the split boundary")
    // both splits populated on a 17-cluster corpus (hash balance sanity)
    assert(splits.getOrElse("train", 0L) > 0L && splits.getOrElse("eval", 0L) > 0L)
  }

  test("cluster-size histogram counts components exactly (skew monitor)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same 17-group disjoint-vocabulary corpus: i % 17 over 200 docs
    // puts 12 docs in groups 0-12 and 11 docs in groups 13-16, so the
    // histogram must be exactly {12 -> 13 clusters, 11 -> 4 clusters}.
    val docs = spark.sparkContext.parallelize(0 until 200, 4)
      .map { i =>
        val g = i % 17
        (i.toLong,
          (1 to 8).map(w => s"g${g}w$w").mkString(" "),
          "src")
      }
      .toDF("doc_id", "text", "source")
    val edges = DedupQueries.minhashEdges(docs)
    val hist = DedupQueries.connectedComponents(edges, docs.select("doc_id"))
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.SparkEntry.releaseCaches(blocking = true)
    assert(hist === Map(12L -> 13L, 11L -> 4L))
  }

  test("decontamination flags verbatim 8-gram overlap with exact hit counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val benchText = (1 to 10).map(i => s"b$i").mkString(" ") // 10 words
    val docs = Seq(
      (97L, benchText, "bench"),                    // the benchmark doc
      (1L, benchText, "train"),                     // full copy: 10-8+1 = 3 grams
      // novel text with ONE verbatim 8-word benchmark window embedded
      (2L, "novel lead in words " +
        (2 to 9).map(i => s"b$i").mkString(" ") + " novel tail", "train"),
      (3L, (1 to 12).map(i => s"c$i").mkString(" "), "train") // disjoint
    ).toDF("doc_id", "text", "source")
    val hits = DedupQueries.contaminationHits(docs, col("doc_id") % 97 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 3L, 2L -> 1L))
  }

  test("incremental dedup maps each incoming re-crawl to its corpus " +
      "original, keeps novel docs, and collapses corpus clusters to reps") {
    import spark.implicits._
    // corpus: a 1000-doc identical boilerplate cluster (ids 0-999) plus
    // two distinct docs; increment: a re-crawl of the boilerplate, a
    // re-crawl of doc 2000, and a genuinely novel doc
    val boiler = identicalCluster(1000)
    val corpusSide = boiler.unionByName(Seq(
      (2000L, "completely different words appear in this corpus doc here", "a"),
      (2001L, "yet another unrelated corpus document with other words", "a"))
      .toDF("doc_id", "text", "source"))
    val incoming = Seq(
      (100001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "in"),
      (100002L, "completely different words appear in this corpus doc here", "in"),
      (100003L, "no overlap with anything stored so far novel entirely fresh", "in")
    ).toDF("doc_id", "text", "source")
    val got = DedupQueries.incrementHits(corpusSide, incoming)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the boilerplate re-crawl maps to the CLUSTER MIN (rep election
    // collapsed 1000 corpus rows to one per bucket before the join);
    // the exact re-crawl maps to its original; the novel doc is absent
    assert(got === Map(100001L -> 0L, 100002L -> 2000L))
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
