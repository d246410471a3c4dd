package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SchedulerConfig
import graft.operators.{Scheduler, SeenSet}
import graft.sources.SyntheticPages

/** Scratch instrumentation for scaling diagnosis (not part of the engine
  * surface): per-stage timings at one parallelism level.
  * args: cores
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (2 * cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), dur,
          si.numTasks, si.taskMetrics.executorRunTime))
      }
    })
    val F = 4000000L; val S = 2000000L
    val cfg = SchedulerConfig(topKPerHost = 50, waveSeconds = 400,
      numPartitions = 2 * cores, saltBuckets = 16, bloomShards = 32)
    val robots = Seq.empty[(String, Seq[String])].toDF("host", "disallowPrefixes")
    def frontier(n: Long) = {
      val id = col("id")
      spark.range(n).select(
        lower(SyntheticPages.urlOf(id, 2000, 3)).as("url"),
        lit("bench").as("source"),
        SyntheticPages.hostOf(SyntheticPages.hostIdOf(id, 2000, 3)).as("host"),
        pmod(xxhash64(SyntheticPages.hostOf(
          SyntheticPages.hostIdOf(id, 2000, 3))), lit(64L)).cast("int")
          .as("hostHash"),
        (id % 4).cast("int").as("priority"), lit(0L).as("waveDiscovered"),
        id.as("seq"), lit(0).as("attempts"), lit(0).as("depth"))
    }
    def seen(n: Long) =
      spark.range(n).select(
        lower(SyntheticPages.urlOf(col("id") * 2, 2000, 3)).as("url"))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    Scheduler.schedule(frontier(50000), seen(20000), robots, 1, cfg, None).count()
    val blooms = timed("bloom-build")(
      SeenSet.buildShardedBloom(seen(S), "url", 32, S, 0.01))
    (1 to 2).foreach { i =>
      stages.clear()
      timed(s"schedule-bloom-$i")(
        Scheduler.schedule(frontier(F), seen(S), robots, 1, cfg,
          Some(blooms)).count())
      stages.sortBy(-_._3).take(8).foreach { case (id, name, dur, nt, rt) =>
        System.err.println(f"  STAGE $id%4d $name%-60s wall=${dur / 1000.0}%7.2fs tasks=$nt%3d cpu=${rt / 1000.0}%8.2fs")
      }
    }
    spark.stop()
  }
}
