package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Similarity search over the embeddings table (builder brief): exact
  * brute-force cosine top-k as the baseline, a sign-LSH-bucketed variant
  * as the scale path, and the embedding-cosine near-dup detector (the J4
  * similarity stage of mod_dedupe.py:244-257, rebuilt deterministically).
  *
  * Dot products run in double precision with a strictly sequential
  * left-fold (`aggregate` over zip_with), matching DuckDB's evaluation
  * order, so even the scores are oracle-checkable after rounding. Ranks
  * use (rounded score, neighbor id) so representation noise can't flip
  * an ordering.
  *
  * Scale shape: brute force is O(Q·N) with a broadcast query side — right
  * for reranking; the LSH path buckets by sign bits (one shuffle on the
  * bucket key) and only compares within buckets — right for N ≫ 10^8.
  */
object VectorQueries {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** q_vector_topk — brute-force cosine top-5 neighbors for every 100th
    * vector (the exact-rerank baseline). Query side is tiny → broadcast;
    * candidates stream by; no shuffle until the final per-query window
    * over Q·N rows bounded by Q≈N/100.
    */
  private def topk(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val topkSql =
    """SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM (
      |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |      round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
      |        (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
      |         sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6) AS cos
      |    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |    WHERE q.vec_id % 100 = 0))
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Sign-LSH bucket key: the sign bits of the first 12 dimensions
    * (sign of a float is exact → identical across engines).
    */
  private def signBucket(v: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(v, i + 1) > 0f, "1").otherwise("0")): _*)

  /** q_vector_lsh — bucketed ANN: compare only within equal sign-bucket,
    * top-3 per query by (cos desc, id). The 10^8-scale path: one shuffle
    * on the bucket key, no cross join.
    */
  private def lsh(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).withColumn("bucket",
      signBucket(col("embedding"), 12))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket"))
    val pairs = e.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val lshSql = {
    val bucket = (1 to 12)
      .map(i => s"CASE WHEN embedding[$i] > 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")
    s"""SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) /
       |        (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))) *
       |         sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6) AS cos
       |    FROM (SELECT *, $bucket AS bucket FROM embeddings) q
       |    JOIN (SELECT *, $bucket AS bucket FROM embeddings) e USING (bucket)
       |    WHERE q.vec_id % 100 = 0 AND e.vec_id <> q.vec_id))
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** q_vector_norms — per-label embedding stats (norm distribution). */
  private def norms(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .withColumn("nrm", norm(col("embedding")))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"))
      .orderBy("label")

  private val normsSql =
    """SELECT label, count(*) AS n,
      |  round(min(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS min_norm,
      |  round(max(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS max_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** q_embedding_neardup — J4's embedding-cosine near-dup pairs
    * (mod_dedupe.py:218-257: cheap predicates first — same label — then
    * similarity ≥ threshold; the pair keeps the smaller id first).
    */
  private def nearDup(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val a = e.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("label"))
    val b = e.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("label"))
    a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= 0.95)
      .select("label", "id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  private val nearDupSql =
    """SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
      |    (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
      |     sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) >= 0.95
      |ORDER BY id_a, id_b""".stripMargin

  /** q_vector_ivf — IVF-style ANN: coarse quantizer = the first 8
    * vectors as centroids (deterministic stand-in for trained k-means);
    * every vector is assigned to its max-cosine centroid; queries probe
    * ONLY their own cell (nprobe=1) and rank within it. The 10^9-scale
    * path: assignment is a broadcast cross of N×K, search is a join on
    * the cell id — no N×N work.
    */
  private def ivf(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("ccos", round(cosine(col("cv"), col("embedding")), 6))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cell"))
    val pairs = assigned.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val ivfSql = {
    val cos = (a: String, b: String) =>
      s"""round(list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) /
         |  (sqrt(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) *
         |   sqrt(list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))), 6)""".stripMargin
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("c.cv", "e.embedding")} DESC, c.cent_id) AS arn
       |    FROM embeddings e CROSS JOIN cents c)
       |  WHERE arn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, cell
       |      FROM assigned WHERE vec_id % 100 = 0)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY ${cos("q.qv", "a.embedding")} DESC, a.vec_id) AS rank
       |  FROM assigned a JOIN q USING (cell)
       |  WHERE a.vec_id <> q.query_id)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_vector_ivf", ivf, Some(ivfSql)),
    QueryDef("q_vector_topk", topk, Some(topkSql)),
    QueryDef("q_vector_lsh", lsh, Some(lshSql)),
    QueryDef("q_vector_norms", norms, Some(normsSql)),
    QueryDef("q_embedding_neardup", nearDup, Some(nearDupSql))
  )
}
