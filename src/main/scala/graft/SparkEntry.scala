package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline operators) is exposed as a named query; each query with a
  * DuckDB-expressible oracle also appears in [[oracleSql]].
  */
object SparkEntry {

  /** All query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    TpchQueries.defs ++ CrawlQueries.defs ++ TextQueries.defs ++
      EventQueries.defs ++ MiscQueries.defs ++ DedupQueries.defs ++ VectorQueries.defs ++
      ExtractQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full crawl-wave scheduler composition.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_wave_schedule")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Cache contract: a few query builders `persist()` relations their
    * plans read more than once (the Jaccard shingle/pair caches). Call
    * this after consuming a batch of results to drop exactly those
    * entries — a long-lived session that never calls it (and never
    * `spark.catalog.clearCache()`) would otherwise retain one
    * MEMORY_AND_DISK entry per distinct (query, sfDir) plan.
    * [[graft.Bench]] calls it before every timed measurement;
    * [[graft.Verify]] runs one pass per JVM so release is implicit.
    */
  def releaseCaches(blocking: Boolean = false): Unit =
    graft.queries.QueryCaches.release(blocking)
}
