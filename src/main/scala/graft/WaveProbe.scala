package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SchedulerConfig
import graft.sources.SyntheticPages
import graft.streaming.CrawlEngine

/** Scratch instrumentation: per-Spark-job wall times inside one crawl
  * wave at a given parallelism (diagnosing the wave's serial constants).
  * args: cores [seeds] [pages]
  */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val seeds = if (args.length > 1) args(1).toInt else 200000
    val pagesN = if (args.length > 2) args(2).toLong else 1000000L
    val hosts = if (args.length > 3) args(3).toInt else 2000
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (4 * cores).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time,
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach { case (t0, name) =>
          done += ((j.jobId, name, j.time - t0)) }
    })
    val cfg = SchedulerConfig(topKPerHost = 100, waveSeconds = 1000,
      numPartitions = cores, saltBuckets = 8, bloomShards = 32)
    val robots = Seq.empty[(String, Seq[String])].toDF("host", "disallowPrefixes")
    val pages = SyntheticPages.pages(spark, pagesN, hosts, 3)
    val root = Files.createTempDirectory(s"waveprobe-$cores").toString
    val engine = new CrawlEngine(spark, root, pages, robots, cfg)
    engine.init(SyntheticPages.seeds(spark, seeds, hosts, 3))
    engine.runWave() // warm
    done.clear()
    val t0 = System.nanoTime()
    val stats = engine.runWave()
    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(f"WAVE cores=$cores wall=$wall%.2f s " +
      s"scheduled=${stats.scheduled} links=${stats.newLinks}")
    val byJob = done.sortBy(-_._3)
    byJob.take(14).foreach { case (id, name, ms) =>
      System.err.println(f"  JOB $id%3d ${ms / 1000.0}%7.2fs  ${name.take(90)}")
    }
    val sumJobs = done.map(_._3).sum / 1000.0
    System.err.println(f"  sum(jobs)=$sumJobs%.2f s; driver gap=${wall - sumJobs}%.2f s")
    spark.stop()
  }
}
