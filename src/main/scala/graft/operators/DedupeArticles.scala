package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's dedupe post-processor J4 (mod_dedupe.py:95-257) as an
  * engine table operation: candidate pairs must share `pubdate` and
  * differ in `module` with text sizes within 15% (the CHEAP predicates,
  * applied first exactly like the reference's pair loop,
  * mod_dedupe.py:218-237); the expensive confirmation is a deterministic
  * token-count-vector cosine ≥ threshold (stand-in for the reference's
  * spaCy similarity, mod_dedupe.py:244-257, which it ships disabled by
  * default). The SMALLER text is the victim (the reference keeps the
  * larger, mod_dedupe.py:231-237); ties break to the larger uniqueId so
  * the decision is total.
  *
  * Scale shape: the pair space is bounded by the pubdate equi-join (a
  * day's articles, not the corpus) and the cheap θ-predicates; the
  * cosine runs only on surviving candidate pairs via a shared-token
  * equi-join — never a cross join.
  */
object DedupeArticles {

  /** Victim rows (url, uniqueId, module, pubdate, cos, keptUrl) — the
    * reference's `deleted_duplicates` tombstones (session_hist.py:118-125).
    */
  def tombstones(articles: DataFrame, threshold: Double = 0.99): DataFrame = {
    val base = articles.select(
      col("url"), col("uniqueId"), col("module"), col("pubdate"),
      col("text"), col("textSize"))
      .filter(col("pubdate").isNotNull)
    val a = base.select(col("url").as("url_a"), col("uniqueId").as("id_a"),
      col("module").as("mod_a"), col("pubdate"),
      col("textSize").as("size_a"))
    val b = base.select(col("url").as("url_b"), col("uniqueId").as("id_b"),
      col("module").as("mod_b"), col("pubdate"),
      col("textSize").as("size_b"))
    val candidates = a.join(b, Seq("pubdate"))
      .filter(col("url_a") < col("url_b") &&
        col("mod_a") =!= col("mod_b") &&
        abs(col("size_a") - col("size_b")) <=
          greatest(col("size_a"), col("size_b")) * 0.15)

    val counts = base.select(col("url"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("url", "w").agg(count(lit(1)).as("n"))
    val norms = counts.groupBy("url").agg(sum(col("n") * col("n")).as("sq"))
    val dots = candidates.select("url_a", "url_b")
      .join(counts.select(col("url").as("url_a"), col("w"),
        col("n").as("na")), "url_a")
      .join(counts.select(col("url").as("url_b"), col("w"),
        col("n").as("nb")), Seq("url_b", "w"))
      .groupBy("url_a", "url_b").agg(sum(col("na") * col("nb")).as("dot"))

    candidates.join(dots, Seq("url_a", "url_b"))
      .join(norms.select(col("url").as("url_a"), col("sq").as("sqa")), "url_a")
      .join(norms.select(col("url").as("url_b"), col("sq").as("sqb")), "url_b")
      .withColumn("cos", col("dot") /
        (sqrt(col("sqa").cast("double")) * sqrt(col("sqb").cast("double"))))
      .filter(col("cos") >= threshold)
      .select(col("pubdate"),
        when(col("size_a") < col("size_b") ||
          (col("size_a") === col("size_b") && col("id_a") > col("id_b")),
          col("url_a")).otherwise(col("url_b")).as("url"),
        when(col("size_a") < col("size_b") ||
          (col("size_a") === col("size_b") && col("id_a") > col("id_b")),
          col("url_b")).otherwise(col("url_a")).as("keptUrl"),
        round(col("cos"), 6).as("cos"))
      .dropDuplicates("url")
  }

  /** Articles minus the tombstoned victims. */
  def survivors(articles: DataFrame, tomb: DataFrame): DataFrame =
    articles.join(tomb.select("url"), Seq("url"), "left_anti")
}
