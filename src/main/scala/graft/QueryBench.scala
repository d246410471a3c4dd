package graft

/** Named-query timer (scratch tooling, not engine surface): best-of-N
  * wall time for each query name given as an arg, under the SAME
  * isolation protocol as [[Bench]] — both delegate to [[BenchProtocol]],
  * so the protocol cannot drift between them. Usage:
  *   sbt "runMain graft.QueryBench q_article_assembly_full q_body_extract"
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = BenchProtocol.sfDir
    val reps = BenchProtocol.reps
    val spark = BenchProtocol.session()
    args.foreach { n =>
      val times = (1 to reps).map { _ =>
        BenchProtocol.fresh(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $n%s best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
