package graft

import org.apache.spark.sql.functions._

/** Scratch instrumentation (not engine surface): phase-level timing of
  * the connected-components path at the bench scale/session shape, to
  * see where the wall time of the clusters family actually goes.
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
    (1 to 2).foreach { rep =>
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
      def materialize(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(true)
      val vertices = corpus.select("doc_id")
      val seed = edges.groupBy(col("doc_b").as("doc_id"))
        .agg(min(col("doc_a")).as("_rep"))
      val base = timed("base materialize")(
        materialize(vertices.join(seed, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("doc_id"), coalesce(col("_rep"), col("doc_id")))
              .as("cluster"))))
      val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val lu0 = base.select(col("doc_id").as("u"), col("cluster").as("_lu"))
      val lv0 = base.select(col("doc_id").as("v"), col("cluster").as("_lv"))
      var curEdges = timed("initial contraction")(
        materialize(sym.join(lu0, "u").join(lv0, "v")
          .filter(col("_lu") =!= col("_lv"))
          .select(col("_lu").as("u"), col("_lv").as("v"))
          .distinct()))
      var labels = timed("identity labels")(
        materialize(curEdges.select(col("u").as("doc_id")).distinct()
          .select(col("doc_id"), col("doc_id").as("cluster"))))
      var converged = timed("isEmpty")(curEdges.isEmpty)
      var rounds = 0
      while (!converged && rounds < 100) {
        timed(s"round ${rounds + 1}") {
          val hopMin = curEdges.join(
              labels.select(col("doc_id").as("u"), col("cluster").as("_lu")), "u")
            .groupBy(col("v").as("doc_id")).agg(min(col("_lu")).as("_hmin"))
          val merged = labels.join(hopMin, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("cluster"), coalesce(col("_hmin"), col("cluster")))
                .as("cluster"))
          val jumped = merged.join(
              merged.select(col("doc_id").as("cluster"), col("cluster").as("_cc2")),
              Seq("cluster"), "left")
            .select(col("doc_id"),
              coalesce(col("_cc2"), col("cluster")).as("cluster"))
          labels = timed("  labels ckpt")(materialize(jumped))
          val lu = labels.select(col("doc_id").as("u"), col("cluster").as("_lu"))
          val lv = labels.select(col("doc_id").as("v"), col("cluster").as("_lv"))
          curEdges = timed("  edges ckpt")(
            materialize(curEdges.join(lu, "u").join(lv, "v")
              .filter(col("_lu") =!= col("_lv"))
              .select(col("_lu").as("u"), col("_lv").as("v"))
              .distinct()))
          converged = timed("  isEmpty")(curEdges.isEmpty)
          rounds += 1
        }
      }
      var resolved = false
      var resRounds = 0
      while (!resolved && resRounds < 64) {
        timed(s"resolution ${resRounds + 1}") {
          val j = labels.join(
              labels.select(col("doc_id").as("cluster"), col("cluster").as("_cc2")),
              Seq("cluster"), "left")
            .select(col("doc_id"), col("cluster"),
              coalesce(col("_cc2"), col("cluster")).as("_next"))
          val next = materialize(j.select(col("doc_id"),
            col("_next").as("cluster")))
          resolved = j.filter(col("_next") =!= col("cluster")).isEmpty
          labels = next
          resRounds += 1
        }
      }
      val out = timed("resolve+consume") {
        base.join(labels.select(col("doc_id").as("cluster"),
            col("cluster").as("_f")), Seq("cluster"), "left")
          .select(col("doc_id"), coalesce(col("_f"), col("cluster")).as("cluster"))
          .orderBy("doc_id").count()
      }
      System.err.println(s"rounds=$rounds resRounds=$resRounds rows=$out")
    }
    spark.stop()
  }
}
