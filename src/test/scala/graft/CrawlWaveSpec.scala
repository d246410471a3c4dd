package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.SchedulerConfig
import graft.sources.SyntheticPages
import graft.streaming.CrawlEngine

/** End-to-end wave-loop semantics (north rule): crawl ordering and seen
  * membership are deterministic under different partitioning configs, the
  * engine resumes identically after a simulated crash between table
  * commits, and extracted text is byte-identical to the expected page
  * text.
  */
class CrawlWaveSpec extends SparkTestBase {

  private val N = 3000L

  private def cfg(parts: Int, salts: Int) = SchedulerConfig(
    topKPerHost = 5, waveSeconds = 40, politenessFixedSecs = 3,
    politenessRandMinSecs = 2, politenessRandMaxSecs = 5,
    numPartitions = parts, saltBuckets = salts, bloomShards = 4,
    maxLinksPerPage = 500)

  private def emptyRobots: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Seq[String])].toDF("host", "disallowPrefixes")
  }

  private def newEngine(parts: Int = 4, salts: Int = 4): CrawlEngine = {
    val pages = SyntheticPages.pages(spark, N)
    val e = new CrawlEngine(spark, tempDir("crawl"), pages, emptyRobots,
      cfg(parts, salts))
    e.init(SyntheticPages.seeds(spark, 40))
    e
  }

  private def stateFingerprint(e: CrawlEngine): (Seq[String], Seq[String], Seq[(String, String)]) = {
    import spark.implicits._
    val seen = e.seenUrls().select("url", "status")
      .as[(String, String)].collect().sorted.map(t => s"${t._1}|${t._2}").toSeq
    val frontier = e.frontierNow()
      .select(col("url"), col("seq").cast("string"))
      .as[(String, String)].collect().sorted.map(t => s"${t._1}|${t._2}").toSeq
    val arts = e.articlesNow().select(col("url"), col("text"))
      .as[(String, String)].collect().sorted.toSeq
    (seen, frontier, arts)
  }

  test("three waves run end-to-end with sensible stats") {
    val e = newEngine()
    val stats = e.runWaves(3)
    assert(stats.map(_.waveId) == Seq(1L, 2L, 3L))
    assert(stats.head.scheduled > 0 && stats.head.fetched > 0)
    assert(stats(1).scheduled > 0, "wave 2 schedules discovered links")
    // every fetched url became seen; seen set only grows
    val seenCount = e.seenUrls().count()
    assert(seenCount == stats.map(s => s.fetched + s.failed).sum)
    // articles extracted byte-identically: text == the page's text column
    val pages = SyntheticPages.pages(spark, N)
    val mismatch = e.articlesNow().join(pages.select(col("url"),
        col("text").as("expected")), "url")
      .filter(col("text") =!= col("expected")).count()
    assert(mismatch == 0)
    assert(e.articlesNow().count() > 0)
  }

  test("crawl ordering + state identical under different partitioning") {
    val a = newEngine(parts = 4, salts = 4)
    val b = newEngine(parts = 7, salts = 2)
    a.runWaves(3); b.runWaves(3)
    assert(stateFingerprint(a) == stateFingerprint(b))
  }

  test("resume after simulated crash reproduces the uninterrupted run") {
    val a = newEngine()
    a.runWaves(3)

    val b = newEngine()
    b.runWaves(2)
    // simulate a crash after wave 3 committed seen but not frontier or
    // articles: run wave 3 fully, then delete the frontier+articles
    // commits of wave 3 (leaving orphan data dirs behind)
    b.runWave()
    // delete last commit json of frontier and articles tables
    Seq("frontier", "articles").foreach { t =>
      val commits = Files.list(Paths.get(s"${b.root}/$t/_commits"))
        .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
      Files.delete(commits.last)
    }
    assert(b.lastCompleteWave == 2L)
    b.runWave() // repair wave 3
    assert(b.lastCompleteWave == 3L)
    assert(stateFingerprint(a) == stateFingerprint(b))
  }

  test("hot hosts are budget-capped per wave") {
    val e = newEngine()
    val s1 = e.runWave()
    // budget = floor(40 / (3 + 2..6)) in [5..8] capped by topK=5
    import spark.implicits._
    val seen = e.seenUrls()
    val perHost = seen
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .groupBy("host").count().as[(String, Long)].collect()
    assert(perHost.forall(_._2 <= 5), s"host over budget: ${perHost.toSeq}")
    assert(s1.scheduled <= perHost.length * 5L)
  }
}
