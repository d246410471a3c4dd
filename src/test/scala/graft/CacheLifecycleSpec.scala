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
}
