package graft

/** Per-stage timer for a shared-work driver pass (scratch tooling, not
  * engine surface): runs the named queries IN ORDER after ONE protocol
  * reset — unlike [[QueryBench]], state is deliberately shared between
  * stages, so the printout shows each stage's MARGINAL cost inside the
  * pass (what a production driver that runs the whole family actually
  * pays per stage). Usage:
  *   sbt "runMain graft.PipelineProbe q_dedup_clusters q_split_leakfree"
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = BenchProtocol.sfDir
    val spark = BenchProtocol.session()
    BenchProtocol.fresh(spark)
    val t00 = System.nanoTime()
    args.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[pipe] $n%s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(f"[pipe] TOTAL ${(System.nanoTime() - t00) / 1e9}%.3f s")
    spark.stop()
  }
}
