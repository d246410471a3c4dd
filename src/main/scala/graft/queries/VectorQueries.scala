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

  /** Dot/norm through the FUSED native expression (VectorOps.fdot):
    * same sequential left-fold doubles as the higher-order-function
    * form and DuckDB's list_inner_product — bit-identical scores —
    * minus the per-element interpreted lambda frames.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.fdot(a, b)

  private def norm(a: Column): Column =
    sqrt(graft.functions.VectorOps.fdot(a, a))

  // (cosine-with-inline-norms was deliberately removed: every call site
  // now uses cosPre with per-side precomputed norm columns)

  /** Cosine from a per-pair dot and two PRE-COMPUTED norms. The norms
    * must be bound as real columns on each side BEFORE the join: calling
    * norm() inside the pair expression re-evaluates the O(dim)
    * higher-order fold once per pair row (N norms recomputed Q times
    * each in topk) — precomputing cuts that to once per input row and is
    * float-identical (same doubles, same multiply).
    */
  private def cosPre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** The 12-bit sign-bucket expression and the rounded sequential
    * cosine, in DuckDB SQL — ONE definition each; every vector oracle
    * interpolates these so an engine-side convention change (bucket
    * width, rounding) cannot silently desynchronize one oracle.
    */
  private val bucketSql: String = (1 to 12)
    .map(i => s"CASE WHEN embedding[$i] > 0 THEN '1' ELSE '0' END")
    .mkString("concat(", ", ", ")")

  private def cosSql(a: String, b: String): String =
    s"""round(list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) /
       |        (sqrt(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) *
       |         sqrt(list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))), 6)""".stripMargin

  /** q_vector_topk — brute-force cosine top-5 neighbors for every 100th
    * vector (the exact-rerank baseline). Query side is tiny → broadcast;
    * candidates stream by; no shuffle until the final per-query window
    * over Q·N rows bounded by Q≈N/100.
    */
  private def topk(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).withColumn("nrm", norm(col("embedding")))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosPre(col("qv"), col("embedding"),
        col("qnrm"), col("nrm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val topkSql =
    s"""SELECT query_id, neighbor_id, cos, CAST(rank AS INT) AS rank FROM (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM (
      |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |      ${cosSql("q.embedding", "e.embedding")} AS cos
      |    FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |    WHERE q.vec_id % 100 = 0))
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Sign-LSH bucket key: the sign bits of the first 12 dimensions
    * (sign of a float is exact → identical across engines).
    */
  private def signBucket(v: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(v, i + 1) > 0f, "1").otherwise("0")): _*)

  /** The duplicate-augmented corpus shared by q_embedding_neardup and
    * q_lsh_bucket_sizes: every 10th vector duplicated at vec_id +
    * 100000 so the detectors have true positives at test scale. ONE
    * recipe, mirrored once in SQL ([[dupCorpusSql]]) — the two queries
    * must monitor the SAME corpus.
    */
  private def dupCorpus(base: DataFrame): DataFrame =
    base.unionByName(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"),
        col("label")))

  private val dupCorpusSql =
    """SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding, label
      |  FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  /** q_vector_lsh — bucketed ANN: compare only within equal sign-bucket,
    * top-3 per query by (cos desc, id). The 10^8-scale path: one shuffle
    * on the bucket key, no cross join.
    *
    * HOT-BUCKET BOUND (VERDICT r05 item 1): candidates collapse
    * exact-duplicate embeddings to one representative BEFORE the bucket
    * join. A web corpus's failure mode is a 10^5-page boilerplate
    * cluster whose identical embeddings share one sign bucket — pairing
    * members directly is O(k²) per query batch, the same
    * unbounded-duplicate-cluster shape the MinHash path eliminated in
    * r05. Here each distinct embedding contributes ONE cosine per query
    * plus at most its 4 smallest member ids for ranking (ties within a
    * duplicate group break by vec_id asc, so only a group's 4 smallest
    * ids can ever reach the global top-3 even after one self-exclusion)
    * — the result is row-identical to the member-level join, so the
    * DuckDB oracle keeps the straightforward member-level formulation.
    * VectorDupScaleSpec pins the linear candidate growth on a
    * 1,000-identical-embedding bucket.
    */
  private def lsh(s: SparkSession, dir: String): DataFrame =
    lshFrom(embeddings(s, dir))._2

  /** All probe buckets of `b` within Hamming radius `radius` (0 → just
    * b; 1 → b plus the 12 single-bit flips). Multi-probe is the
    * standard recall lever for LSH: a borderline pair whose one small
    * component flipped sign lands one bit away, so probing radius-1
    * buckets recovers it at 13× probe cost per QUERY (queries are the
    * N/100 sample; the big candidate side still shuffles once).
    */
  private def probeBuckets(b: Column, bits: Int, radius: Int): Column = {
    require(radius >= 0 && radius <= 1, "radius 0 or 1 supported")
    val flips = (1 to bits).map { i =>
      concat(substring(b, 1, i - 1),
        when(substring(b, i, 1) === "1", "0").otherwise("1"),
        substring(b, i + 1, bits - i))
    }
    array((b +: (if (radius == 1) flips else Nil)): _*)
  }

  /** Core of q_vector_lsh over an explicit corpus; returns
    * (pre-rank candidate rows, final result) so scale specs can count
    * candidates directly. `radius` = Hamming probe radius (multi-probe).
    */
  private[graft] def lshFrom(e0: DataFrame,
                             radius: Int = 0): (DataFrame, DataFrame) = {
    // duplicate-group collapse: rep = min vec_id, plus the 4 smallest
    // member ids (bounded state: running row_number, then a ≤4-element
    // collect per group)
    val wIds = Window.partitionBy(col("embedding")).orderBy(col("vec_id"))
    val reps = e0.select(col("vec_id"), col("embedding"))
      .withColumn("_r", row_number().over(wIds))
      .filter(col("_r") <= 4)
      .groupBy(col("embedding"))
      .agg(sort_array(collect_list(col("vec_id"))).as("m4"))
      .withColumn("bucket", signBucket(col("embedding"), 12))
      .withColumn("nrm", norm(col("embedding")))
    // each query probes its own bucket (+ neighbors at radius 1);
    // a rep lives in exactly ONE bucket and probes are distinct, so no
    // candidate dedup is needed after the join. qnrm and the base
    // bucket bind as columns BEFORE the explode so the O(dim) norm fold
    // and the 12-branch sign concat run once per QUERY, not once per
    // probe row.
    val q = e0.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qnrm", norm(col("qv")))
      .withColumn("_b0", signBucket(col("qv"), 12))
      .withColumn("bucket", explode(probeBuckets(col("_b0"), 12, radius)))
      .drop("_b0")
    // one cosine per (query, DISTINCT embedding) in the probed buckets
    val cand = reps.join(q, Seq("bucket"))
      .withColumn("cos", round(cosPre(col("qv"), col("embedding"),
        col("qnrm"), col("nrm")), 6))
      .select(col("query_id"), col("cos"), col("m4"))
    val pairs = cand
      .select(col("query_id"), col("cos"),
        explode(col("m4")).as("neighbor_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val result = pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
    (cand, result)
  }

  private val lshSql = {
    val bucket = bucketSql
    s"""SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      ${cosSql("q.embedding", "e.embedding")} AS cos
       |    FROM (SELECT *, $bucket AS bucket FROM embeddings) q
       |    JOIN (SELECT *, $bucket AS bucket FROM embeddings) e USING (bucket)
       |    WHERE q.vec_id % 100 = 0 AND e.vec_id <> q.vec_id))
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** q_lsh_bucket_sizes — the embedding-side SKEW MONITOR (the
    * q_cluster_sizes analog for sign-LSH): top-20 (label, bucket)
    * groups by DISTINCT-embedding count, with the raw member count
    * alongside. After the r06 duplicate collapse, `n_reps` is the
    * quantity that bounds the rep↔rep bucket join (`n_members` is what
    * the OLD member-level join paid) — an operator watches this to
    * catch the residual failure mode: distinct-but-near vectors piling
    * into one bucket. Two map-side-combinable aggregations + a
    * TakeOrderedAndProject head; never a pair enumeration.
    */
  private def lshBucketSizes(s: SparkSession, dir: String): DataFrame =
    dupCorpus(embeddings(s, dir)).groupBy(col("label"), col("embedding"))
      .agg(count(lit(1)).as("m"))
      .withColumn("bucket", signBucket(col("embedding"), 12))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("n_reps"), sum(col("m")).as("n_members"))
      .orderBy(col("n_reps").desc, col("label"), col("bucket"))
      .limit(20)

  private val lshBucketSizesSql = {
    val bucket = bucketSql
    s"""WITH corpus AS (
       |  $dupCorpusSql),
       |grp AS (
       |  SELECT label, embedding, count(*) AS m
       |  FROM corpus GROUP BY label, embedding)
       |SELECT label, $bucket AS bucket,
       |  count(*) AS n_reps, CAST(sum(m) AS BIGINT) AS n_members
       |FROM grp GROUP BY 1, 2
       |ORDER BY n_reps DESC, label, bucket LIMIT 20""".stripMargin
  }

  /** q_vector_lsh_multiprobe — the RECALL lever on the bucketed ANN:
    * each query probes its own sign bucket plus the 12 buckets at
    * Hamming distance 1, recovering the borderline neighbors whose one
    * small component flipped sign (the recall single-bucket sign-LSH
    * trades away — VectorRecallSpec measures the ladder). Same
    * duplicate-collapsed candidate side as q_vector_lsh: probe cost is
    * 13× per QUERY (the N/100 sample), the corpus still shuffles once.
    * The oracle mirrors the member-level multi-probe formulation (the
    * collapse is row-identical, spec-proven for the shared core).
    */
  private def lshMultiprobe(s: SparkSession, dir: String): DataFrame =
    lshFrom(embeddings(s, dir), radius = 1)._2

  private val lshMultiprobeSql = {
    val bucket = bucketSql
    val flips = (1 to 12).map { i =>
      s"""concat(substr(bucket, 1, ${i - 1}),
         |    CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END,
         |    substr(bucket, ${i + 1}, ${12 - i}))""".stripMargin
    }.mkString(",\n  ")
    s"""WITH b AS (SELECT *, $bucket AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
       |      FROM b WHERE vec_id % 100 = 0),
       |probes AS (
       |  SELECT query_id, qv, unnest([bucket,
       |  $flips]) AS bucket FROM q)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM (
       |    SELECT p.query_id, e.vec_id AS neighbor_id,
       |      ${cosSql("p.qv", "e.embedding")} AS cos
       |    FROM probes p JOIN b e USING (bucket)
       |    WHERE e.vec_id <> p.query_id))
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

  /** q_embedding_neardup — J4's embedding-cosine near-dup candidate
    * EDGES (mod_dedupe.py:218-257): exact-duplicate vectors collapse to
    * a representative (k−1 member edges per k-group, cos = 1), then
    * cheap predicates — same label AND same 12-bit sign-LSH bucket —
    * gate the cosine ≥ threshold check between the DISTINCT
    * representatives. Recall: sign-LSH finds identical and
    * near-identical vectors (equal signs); borderline 0.95 pairs whose
    * small components flip sign are traded away — the standard LSH
    * recall/cost trade (multi-probe or more tables would recover them).
    * The corpus is augmented with exact duplicate vectors (every 10th,
    * vec_id + 100000 — mirrored in the oracle) so the detector has true
    * positives to find at test scale.
    *
    * APPROXIMATE, and the DuckDB oracle mirrors the SAME rep election +
    * bucket filter: the oracle verifies engine-equality of the
    * approximation, not recall. VectorRecallSpec holds the exact-form
    * check: every emitted edge joins two vectors whose cosine ≥ 0.95,
    * every injected duplicate is connected to its original through the
    * edge set, recall measured and reported.
    */
  private def nearDup(s: SparkSession, dir: String): DataFrame =
    nearDupFrom(dupCorpus(embeddings(s, dir)))

  /** Core of q_embedding_neardup over an explicit corpus
    * (VectorDupScaleSpec feeds synthetic hot-bucket corpora).
    *
    * REPRESENTATIVE ELECTION (VERDICT r05 item 1 — the embedding-space
    * analog of the r05 MinHash fix): exact-duplicate vectors collapse
    * to one representative (min vec_id per (label, embedding)) BEFORE
    * the bucket join, so a k-member identical cluster contributes k−1
    * member→rep edges (cos = 1 by definition) plus ONE row to the
    * (label, bucket) join instead of k²/2 pairs inside the bucket. The
    * output is therefore a candidate EDGE SET — spanning connectivity,
    * exactly what the downstream clustering (q_dedup_clusters shape)
    * consumes — not the full quadratic pair enumeration, whose size is
    * itself O(k²) on the corpora where near-dup detection matters.
    * Residual bucket groups hold only DISTINCT embeddings, so the old
    * failure mode (10^5 identical boilerplate vectors in one bucket ⇒
    * ~10^10 cosine pairs) is structurally gone; the skew monitor shape
    * (q_cluster_sizes) covers the remaining distinct-but-near pileup.
    */
  private[graft] def nearDupFrom(corpus: DataFrame): DataFrame = {
    // rep election via ONE window pass over the duplicate-group
    // partition (round-7, the minhashEdges pattern): the rep rides
    // every member row, so both the member→rep edges and the rep
    // relation are filters of the same windowed frame — the round-6
    // groupBy + join-back paid a second exchange on the (label,
    // embedding) key for the same rows. Still no per-group arrays —
    // bounded state.
    val wG = Window.partitionBy(col("label"), col("embedding"))
    // persisted: THREE consumers read this windowed frame (the intra
    // edges and both sides of the rep↔rep bucket join), and the planner
    // re-runs the whole scan+window chain per consumer otherwise (the
    // round-7 before-plan shows 12 parquet scans for this query)
    val withRep = QueryCaches.track(corpus
      .withColumn("rep", min(col("vec_id")).over(wG))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val intra = withRep.filter(col("vec_id") =!= col("rep"))
      .select(col("label"), col("rep").as("id_a"),
        col("vec_id").as("id_b"), lit(1.0).as("cos"))
    val reps = withRep.filter(col("vec_id") === col("rep"))
      .select(col("label"), col("embedding"), col("rep"))
      .withColumn("bucket", signBucket(col("embedding"), 12))
      .withColumn("nrm", norm(col("embedding")))
    val a = reps.select(col("rep").as("id_a"),
      col("embedding").as("va"), col("label"), col("bucket"),
      col("nrm").as("na"))
    val b = reps.select(col("rep").as("id_b"),
      col("embedding").as("vb"), col("label"), col("bucket"),
      col("nrm").as("nb"))
    val cross = a.join(b, Seq("label", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosPre(col("va"), col("vb"),
        col("na"), col("nb")), 6))
      .filter(col("cos") >= 0.95)
      .select(col("label"), col("id_a"), col("id_b"), col("cos"))
    intra.unionByName(cross).orderBy("id_a", "id_b")
  }

  private val nearDupSql = {
    val bucket = bucketSql
    s"""WITH corpus AS (
       |  $dupCorpusSql),
       |grp AS (
       |  SELECT label, embedding, min(vec_id) AS rep
       |  FROM corpus GROUP BY label, embedding),
       |intra AS (
       |  SELECT c.label, g.rep AS id_a, c.vec_id AS id_b,
       |    CAST(1.0 AS DOUBLE) AS cos
       |  FROM corpus c JOIN grp g
       |    ON c.label = g.label AND c.embedding = g.embedding
       |  WHERE c.vec_id <> g.rep),
       |reps AS (SELECT label, rep AS vec_id, embedding, $bucket AS bucket
       |         FROM grp),
       |cross_reps AS (
       |  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${cosSql("a.embedding", "b.embedding")} AS cos
       |  FROM reps a JOIN reps b
       |    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.95)
       |SELECT label, id_a, id_b, cos FROM intra
       |UNION ALL
       |SELECT label, id_a, id_b, cos FROM cross_reps
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q_vector_ivf — IVF ANN with a trained coarse quantizer:
    *  - 64 cells, centroids = `ivfIters` deterministic Lloyd (k-means)
    *    steps from the first-64 seed vectors (assign → integer-exact
    *    per-cell mean, repeated). The per-cell mean runs in EXACT
    *    integer arithmetic (components rounded to 1e-6 and summed as
    *    BIGINT) so the trained centroids are bit-identical regardless of
    *    summation order/engine — floating avg() would be order-dependent
    *    — and the cross-iteration scores stay engine-portable because
    *    both engines fold the double dot product left-to-right over the
    *    same IEEE doubles before the 1e-6 rounding.
    *  - every vector's cell assignment is an ARGMAX AGGREGATION
    *    (max_by over an integer score encoding (cosine₆, -cent_id)),
    *    never an N×K row_number window — one map-side-combinable agg.
    *  - queries probe their top-`nprobe`=2 cells (the tiny Q×K probe
    *    ranking is the only window before the final per-query top-k).
    * The 10^9-scale shape: train on a sample, assign N×K with a
    * broadcast centroid table, search joins on the cell id — no N×N.
    * Recall vs q_vector_topk (exact) is reported in BENCH notes.
    */
  private val ivfCells = 64

  /** Probe breadth, configurable (recall↔cost knob): candidates scanned
    * scale ~linearly with nprobe while recall rises toward exact — at
    * nprobe = ivfCells the result is provably identical to the exact
    * top-k (every cell probed ⇒ full candidate set; asserted in
    * VectorRecallSpec, which also reports the measured recall ladder).
    * The oracle SQL interpolates the same constant, so the DuckDB
    * comparison stays consistent under any setting.
    */
  private val ivfNprobe =
    sys.env.getOrElse("SPARK_GRAFT_IVF_NPROBE", "2").toInt

  /** Lloyd iterations (training-quality knob): each step is one N×K
    * broadcast-argmax assignment plus one map-side-combinable mean agg,
    * so training cost is linear in iterations with no new shuffle
    * shapes. The oracle SQL chains the same number of iterations, so
    * the DuckDB comparison holds for any setting. Default 1 — MEASURED,
    * not assumed: on the synthetic embedding corpus the nprobe=1/2
    * recall ladder is identical at 1, 2, and 4 iterations and the
    * nprobe=4 rung is best at 1 (40.0% vs 33.3%) — near-uniform vectors
    * give Lloyd nothing to tighten, so extra N×K passes are pure cost
    * here. Real web-embedding corpora cluster, which is what the knob
    * is for; the exactness guarantee (nprobe = all cells ⇒ exact
    * top-k) holds at every setting and is spec-asserted at 1 AND 2.
    */
  private val ivfIters =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_IVF_ITERS", "1").toInt)

  /** Integer score encoding (cosine rounded at 1e-6, tie → smaller
    * cent_id): argmax over it is deterministic and engine-portable.
    * Takes PRE-COMPUTED norms (nv for the vector, ncv for the centroid)
    * so the N×K assignment doesn't re-fold norm(v) once per centroid.
    */
  private def centScore(v: Column, cv: Column, nv: Column, ncv: Column,
                        centId: Column): Column =
    round(dot(cv, v) / (ncv * nv) * 1e6, 0).cast("bigint") * 1000 - centId

  /** The centroid table collapsed to ONE row holding the centroid array
    * (cent_id, cv, cnrm structs): K is tiny (64), so shipping it as a
    * single broadcast row lets the N×K argmax run as a SCAN-LOCAL array
    * fold — no groupBy exchange of N rows, no join back to re-attach
    * the embedding (round-7, guide §2.4). collect_list order is
    * nondeterministic, but every consumer below is order-independent:
    * scores embed `- cent_id`, so the argmax winner and the sorted
    * probe ranking are unique regardless of array order.
    */
  private def centArray(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(col("cent_id"), col("cv"), col("cnrm")))
      .as("cs"))

  /** Scan-local cell assignment: argmax over the broadcast centroid
    * array via array_max of (score, cent_id) structs — scores are
    * distinct (the −cent_id tie-break), so the max is unique and equals
    * the old max_by(cent_id, score) aggregation row-for-row.
    */
  private def withCell(side: DataFrame, cents: DataFrame): DataFrame =
    side.crossJoin(broadcast(centArray(cents)))
      .withColumn("cell", array_max(transform(col("cs"), c =>
        struct(centScore(col("embedding"), c.getField("cv"), col("nrm"),
          c.getField("cnrm"), c.getField("cent_id")).as("s"),
          c.getField("cent_id").as("cid"))))
        .getField("cid"))
      .drop("cs")

  private def ivf(s: SparkSession, dir: String): DataFrame =
    ivfWith(s, dir, ivfNprobe)

  /** IVF search at an explicit probe breadth and Lloyd-iteration count
    * (recall ladder + exactness specs).
    */
  private[graft] def ivfWith(s: SparkSession, dir: String, nprobe: Int,
                             iters: Int = ivfIters): DataFrame = {
    // persisted: the norm-carrying base relation feeds the seeds, the
    // training sample (per Lloyd pass), the full assignment, and the
    // query sample — each consumer otherwise re-scans the table and
    // re-folds every norm
    val e = QueryCaches.track(embeddings(s, dir)
      .withColumn("nrm", norm(col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Lloyd TRAINS on a deterministic hash sample (VERDICT r05 item 5:
    // the q_sample_stratified gate — first two md5 hex chars < 'c0' is
    // a reproducible 75% rate at this SF; a 10^9-vector deployment
    // drops the threshold so training cost is independent of N while
    // the full corpus is still assigned exactly once below)
    val train = e.filter(
      substring(md5(col("vec_id").cast("string")), 1, 2) < "c0")
    // a vector's cell = scan-local argmax over the broadcast centroid
    // array ([[withCell]], round-7): the old crossJoin + max_by groupBy
    // shuffled N assignment rows and then JOINED them back to the
    // embedding table — two N-row exchanges per pass that the array
    // fold eliminates outright (the winner is identical: same scores,
    // unique by the −cent_id tie-break)
    // integer-exact per-cell mean of the assigned TRAINING vectors
    // (input rows already carry their cell — no join)
    def meanCents(assigned: DataFrame): DataFrame = assigned
      .select(col("cell"), posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1e6, 0).cast("bigint")))
        .as(Seq("pos", "c")))
      .groupBy("cell", "pos")
      .agg((sum(col("c")).cast("double") / count(lit(1)) / 1e6).as("comp"))
      .groupBy("cell").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
          x => x.getField("comp")).as("cv"))
      .select(col("cell").as("cent_id"), col("cv"))
      .withColumn("cnrm", norm(col("cv")))
    // --- train: `iters` Lloyd steps from the first-ivfCells seeds,
    //     assignments over the SAMPLE only ------------------------------
    var cents = e.filter(col("vec_id") < ivfCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
        col("nrm").as("cnrm"))
    for (_ <- 1 to iters) cents = meanCents(withCell(train, cents))
    // --- assign: final cells for the FULL corpus ----------------------
    val assigned = withCell(e, cents)
    // --- probe: each query ranks the K centroids, keeps nprobe cells —
    //     scan-local top-nprobe over the same broadcast centroid array
    //     (array_sort on (score, cent_id) structs, scores unique, so
    //     the slice equals the old row_number-over-score-desc window
    //     without the Q×K exchange) ---------------------------------
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val probes = q.crossJoin(broadcast(centArray(cents)))
      .withColumn("cell", explode(transform(
        slice(reverse(array_sort(transform(col("cs"), c =>
          struct(centScore(col("qv"), c.getField("cv"), col("qnrm"),
            c.getField("cnrm"), c.getField("cent_id")).as("s"),
            c.getField("cent_id").as("cid"))))), 1, nprobe),
        x => x.getField("cid"))))
      .select(col("query_id"), col("qv"), col("qnrm"), col("cell"))
    // --- search: only the probed cells ---------------------------------
    val pairs = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosPre(col("qv"), col("embedding"),
        col("qnrm"), col("nrm")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  private val ivfSql = {
    // raw (unrounded) cosine of a double-list pair — scoring rounds it
    def rawCos(a: String, b: String) =
      s"""(list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) /
         |  (sqrt(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) *
         |   sqrt(list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))))""".stripMargin
    def score(v: String, cv: String, cid: String) =
      s"CAST(round(${rawCos(cv, v)} * 1000000) AS BIGINT) * 1000 - $cid"
    // one Lloyd step as a CTE triple: assign to the previous centroids,
    // integer-exact component sums, per-cell mean list — chained
    // ivfIters times so the oracle trains the same way the engine does
    val lloydCtes = (1 to ivfIters).map { i =>
      val prev = if (i == 1) "seeds" else s"cents_${i - 1}"
      s"""cells_$i AS (
         |  SELECT e.vec_id,
         |    arg_max(c.cent_id, ${score("e.embedding", "c.cv", "c.cent_id")}) AS cell
         |  FROM train e CROSS JOIN $prev c GROUP BY e.vec_id),
         |scaled_$i AS (
         |  SELECT sc.cell, t.pos,
         |    CAST(round(CAST(e.embedding[t.pos] AS DOUBLE) * 1000000) AS BIGINT) AS c
         |  FROM train e JOIN cells_$i sc USING (vec_id),
         |    UNNEST(generate_series(1, len(e.embedding))) AS t(pos)),
         |cents_$i AS (
         |  SELECT cell AS cent_id, list(comp ORDER BY pos) AS cv FROM (
         |    SELECT cell, pos, CAST(sum(c) AS DOUBLE) / count(*) / 1000000 AS comp
         |    FROM scaled_$i GROUP BY cell, pos)
         |  GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""WITH train AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'c0'),
       |seeds AS (
       |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
       |  WHERE vec_id < $ivfCells),
       |$lloydCtes,
       |cents AS (SELECT cent_id, cv FROM cents_$ivfIters),
       |assigned AS (
       |  SELECT e.vec_id, e.embedding, a.cell FROM embeddings e JOIN (
       |    SELECT e2.vec_id,
       |      arg_max(c.cent_id, ${score("e2.embedding", "c.cv", "c.cent_id")}) AS cell
       |    FROM embeddings e2 CROSS JOIN cents c GROUP BY e2.vec_id) a
       |  USING (vec_id)),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |      WHERE vec_id % 100 = 0),
       |probes AS (
       |  SELECT query_id, qv, cent_id AS cell FROM (
       |    SELECT q.query_id, q.qv, c.cent_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${score("q.qv", "c.cv", "c.cent_id")} DESC) AS pr
       |    FROM q CROSS JOIN cents c)
       |  WHERE pr <= $ivfNprobe)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY round(${rawCos("p.qv", "a.embedding")}, 6) DESC,
       |               a.vec_id) AS rank
       |  FROM assigned a JOIN probes p USING (cell)
       |  WHERE a.vec_id <> p.query_id)
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_vector_ivf", ivf, Some(ivfSql)),
    QueryDef("q_vector_topk", topk, Some(topkSql)),
    QueryDef("q_vector_lsh", lsh, Some(lshSql)),
    QueryDef("q_vector_lsh_multiprobe", lshMultiprobe, Some(lshMultiprobeSql)),
    QueryDef("q_vector_norms", norms, Some(normsSql)),
    QueryDef("q_lsh_bucket_sizes", lshBucketSizes, Some(lshBucketSizesSql)),
    QueryDef("q_embedding_neardup", nearDup, Some(nearDupSql))
  )
}
