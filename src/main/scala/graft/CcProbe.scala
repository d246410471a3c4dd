package graft

import org.apache.spark.sql.functions._

/** Scratch instrumentation (not engine surface): coarse phase timing of
  * the connected-components path at the bench scale/session shape —
  * edge build vs clustering loop vs consumer — driving the REAL
  * engine functions so the numbers can never drift from the code.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchProtocol.session()
    val dir = BenchProtocol.sfDir
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      BenchProtocol.fresh(spark)
      System.err.println(s"=== rep $rep ===")
      val corpus = {
        val d = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"), col("source"))
        val dups = d.filter(col("doc_id") % 5 === 0).select(
          (col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra trailing sentence added")).as("text"),
          col("source"))
        d.unionByName(dups)
      }
      val edges = timed("edges build+persist+count") {
        val e = graft.queries.DedupQueries.minhashEdges(corpus)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        System.err.println(s"  n_edges=${e.count()}")
        e
      }
      val labels = timed("connectedComponents (loop incl. materializations)") {
        graft.queries.DedupQueries
          .connectedComponents(edges, corpus.select("doc_id"))
      }
      System.err.println(
        s"  rounds=${graft.queries.DedupQueries.lastCcRounds}")
      timed("consumer orderBy+count")(labels.orderBy("doc_id").count())
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }
}
