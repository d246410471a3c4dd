package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Near-duplicate detection operators for training-data pipelines
  * (builder brief) + the reference's dedupe join J4
  * (mod_dedupe.py:95-257 — cheap predicates first, similarity second,
  * smaller/older copy dropped).
  *
  * The corpus is augmented with deterministic mutated copies (doc_id +
  * 100000, text + one extra sentence) so the detectors have true
  * near-dups to find; the same augmentation is reproduced in the DuckDB
  * oracles. All hashing is md5 (identical bytes→hex in both engines), so
  * even the MinHash signatures are oracle-checkable.
  *
  * Scale shape: shingle explode → groupBy is a map-side-combinable
  * aggregation; candidate pairs come only from equal band-buckets
  * (MinHash-LSH) or shared shingles (Jaccard) — never a full cross join.
  */
object DedupQueries {

  /** Base documents and their mutated near-dup copies (every 5th doc,
    * doc_id + 100000) as separate relations — the incremental-dedup
    * query consumes them directly (its corpus/increment split IS this
    * split), everything else unions them via [[corpus]].
    */
  private def corpusParts(s: SparkSession,
                          dir: String): (DataFrame, DataFrame) = {
    val d = documents(s, dir).select(col("doc_id"), col("text"), col("source"))
    val dups = d.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" extra trailing sentence added")).as("text"),
      col("source"))
    (d, dups)
  }

  /** documents ∪ mutated near-dup copies (every 5th doc). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val (d, dups) = corpusParts(s, dir)
    d.unionByName(dups)
  }

  private val corpusSql =
    """SELECT doc_id, text, source FROM documents
      |UNION ALL
      |SELECT doc_id + 100000 AS doc_id,
      |       concat(text, ' extra trailing sentence added') AS text, source
      |FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** Prefix of every dedup oracle: corpus + exploded shingles CTEs. */
  private def withCtes(extra: String, body: String): String =
    s"WITH corpus AS ($corpusSql),\n" +
      s"sh_all AS ($shinglesSql)$extra\n$body"

  /** Word 3-gram array bound as a real column. Round-3 bound the word
    * array as a column to keep `split()` from re-running per element —
    * but under this plan shape (explode over the corpus union) Catalyst
    * still inlined it into every element-level reference, and the
    * "scan-local" shingling measured ~19 µs per shingle (≈6 s of the
    * 7-14 s every dedup bench query paid at sf0.1). The round-4 fix is
    * the native one-pass [[graft.functions.WordNgramsExpr]]: split once
    * per row, assemble grams by substring copy, whole-stage codegen.
    */
  private def withGrams(c: DataFrame, distinct: Boolean): DataFrame = {
    val raw = graft.functions.WordGrams.word_ngrams(col("text"), 3)
    c.withColumn("_grams", if (distinct) array_distinct(raw) else raw)
  }

  private val shinglesSql =
    """SELECT doc_id,
      |  array_to_string(words[i:i+2], ' ') AS shingle
      |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
      |  UNNEST(generate_series(1, len(words) - 2)) AS t(i)""".stripMargin

  /** q_dedup_minhash — MinHash-LSH banding: 4 bands, band signature b =
    * min over shingles of the b-th 8-hex-char slice of ONE md5(shingle)
    * digest; a doc pair is a near-dup candidate when it shares any band
    * bucket. A 128-bit md5 splits into four independent 32-bit hash
    * functions, so slicing gives the same LSH semantics as four salted
    * digests at a quarter of the hashing cost (VERDICT r03 item 1).
    * Signatures are hex-string mins → oracle-checkable.
    *
    * Candidate generation is REPRESENTATIVE ELECTION, not a bucket
    * self-join (VERDICT r04 item 1): groupBy (band, sig) elects rep =
    * min(doc_id) per bucket, and each member emits ONE edge (rep,
    * member). A k-doc duplicate cluster — boilerplate/mirror clusters of
    * 10⁵-10⁶ near-identical pages are routine at web scale, and they
    * land in the SAME bucket in every band — now produces k−1 edge rows
    * per band (deduped to k−1) instead of ~4·k²/2 pair rows: the join
    * output is bounded by |bands| rows TOTAL because the rep side has
    * exactly one row per join key, so no bucket can go quadratic. The
    * edges carry the same connected components as the all-pairs form
    * (every member links to its bucket's rep), which is what downstream
    * clustering consumes; the map-side partial agg also shrinks the rep
    * side to |buckets| rows before it ever shuffles.
    */
  /** (doc_id, band, sig) LSH band rows. ONE digest per shingle
    * occurrence; round-7 (guide §2.4 — remove shuffles outright): the
    * four slice-minima are now SCAN-LOCAL array folds (`transform` to
    * the per-gram digests, bound once as a real column — CollapseProject
    * keeps a non-cheap alias referenced four times un-inlined — then
    * four `array_min` passes over it), replacing the explode of every
    * shingle occurrence plus the doc-keyed aggregation exchange the
    * round-6 form paid. Same minima — min over occurrences ≡ min over
    * the array — and a doc too short for any shingle yields NULL minima,
    * filtered to match the old form (no exploded rows ⇒ no band rows).
    * stack() unpivots to (band, sig).
    */
  private def bandSigs(c: DataFrame): DataFrame = {
    val withH = withGrams(c, distinct = false)
      .withColumn("_h", transform(col("_grams"), g => md5(g)))
    def bandMin(i: Int) = array_min(transform(col("_h"),
      h => substring(h, i * 8 + 1, 8))).as(s"s$i")
    withH.select(col("doc_id"), bandMin(0), bandMin(1), bandMin(2), bandMin(3))
      .select(col("doc_id"),
        expr("stack(4, 0, s0, 1, s1, 2, s2, 3, s3) AS (band, sig)"))
      .filter(col("sig").isNotNull)
  }

  /** Candidate edges by representative election. Round-7: the rep per
    * (band, sig) bucket comes from ONE window pass (min over the bucket
    * partition) instead of the groupBy + join-back — with the band rows
    * now scan-local, the join form would recompute the whole gram+md5
    * scan on both join inputs, and the window needs one exchange where
    * agg+join needed two.
    */
  private[graft] def minhashEdges(c: DataFrame): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("sig"))
    bandSigs(c).withColumn("doc_a", min(col("doc_id")).over(wB))
      .filter(col("doc_id") > col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b")).distinct()
  }

  private def minhash(s: SparkSession, dir: String): DataFrame =
    minhashEdges(corpus(s, dir)).orderBy("doc_a", "doc_b")

  /** Connected components over candidate edges by iterative min-label
    * propagation — the clustering step that CONSUMES the (rep, member)
    * edges: every doc ends up labeled with the smallest doc_id reachable
    * through any chain of shared buckets, so "one survivor per cluster"
    * becomes a trivial groupBy(cluster) downstream.
    *
    * Scale shape (round-6 form): each round is one-hop label
    * propagation over the CONTRACTED edge relation (an equi-join of
    * edges × labels plus a map-side-combinable min-aggregation), a
    * pointer-jump (d → label(label(d)) — how members inherit their
    * rep's fresh label), and then an EDGE CONTRACTION that rewrites
    * the relation to (label(u), label(v)) with self-loops dropped and
    * duplicates merged. Contraction is what makes convergence
    * O(log diameter) in practice: over a STATIC edge set, min labels
    * travel one hop per round regardless of pointer jumping (measured
    * 45 rounds on a chain-heavy 100k corpus; 7 with contraction), and
    * the relation SHRINKS toward |clusters| as rounds proceed. Every
    * round ends in an EAGER checkpoint of labels AND edges: without it
    * the logical plan nests one union+aggregate+join per round and
    * Catalyst re-optimization blows up superlinearly (measured 0.7 s →
    * 43 s per round by round 7 at sf0.001 — a driver-side OOM, not a
    * data problem). Old round RDDs are reclaimed by the ContextCleaner
    * once dereferenced. The per-round label-sum read is a scalar
    * convergence check, never a data collect; the 100-round cap is a
    * runaway guard that THROWS rather than return partial labels.
    */
  private[graft] def connectedComponents(edges: DataFrame,
                                         vertices: DataFrame,
                                         maxRounds: Int = 100): DataFrame = {
    // Round-7 restructure (guide §2.3/§2.4 — shuffle fewer bytes, and
    // never rescan what cannot change): the round-6 loop re-materialized
    // and re-aggregated the FULL N-row label table every round even
    // though, after the star-collapse seed, only CLUSTER-REP labels can
    // still move. The loop now runs entirely on the CONTRACTED graph —
    // vertices = distinct seed labels that touch a cross-star edge,
    // a set that starts ≪ N and SHRINKS toward zero — and the N-row
    // relation is touched exactly three times total: the seed (one agg +
    // one join), the initial contraction (two joins through the seed
    // mapping), and one final resolve join against the tiny converged
    // rep-label table. Convergence is the contracted relation running
    // EMPTY (an edge surviving contraction ⇔ some label must still
    // move, so emptiness ⇔ fixpoint — exact, no confirming round),
    // replacing the per-round decimal label-sum scan over all N labels
    // with a take(1) probe of an already-materialized, shrinking frame.
    //
    // reliable checkpoint when the session has a checkpoint dir (a
    // cluster deployment should set one: localCheckpoint storage dies
    // with an executor, failing the job mid-loop); local runs use the
    // executor-local variant and skip the HDFS round trip.
    def materialize(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(true)
      else df.localCheckpoint(true)
    // Seed: star-collapse the rep edges in ONE aggregation — every
    // member's label starts at its minimum incident representative
    // (doc_a < doc_b by construction), isolated docs at their own id.
    // Equivalent to, and cheaper than, the identity seed plus a first
    // propagation round: buckets collapse onto their rep before the
    // loop, saving one full iteration over the edge relation (at web
    // scale a round is a join over the whole edge set).
    val seed = edges.groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("_rep"))
    // materialized: read three times (both contraction mappings + the
    // final resolve); leaving it lazy re-runs the seed aggregation per
    // read and measured ~0.6 s slower at sf0.1
    val base = materialize(vertices.join(seed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("_rep"), col("doc_id")))
          .as("cluster")))
    // Initial EDGE CONTRACTION through the seed labels (round-6; the
    // Kiveris-et-al. star-contraction insight): min-label propagation
    // over a STATIC edge relation is Θ(graph diameter) rounds no matter
    // how labels are pointer-jumped — measured 44-45 rounds on a sparse
    // chain-heavy 100k corpus (DedupScaleBench), where chains of
    // band-buckets link template families 40+ hops deep. Rewriting the
    // edges through the fresh labels ((u,v) → (label(u), label(v)),
    // self-loops dropped, deduped) makes each hop cross whole contracted
    // clusters and the relation SHRINK every round: convergence is
    // O(log diameter) real rounds (measured 45 → 7 on that corpus).
    // Contraction preserves reachability among the seed labels, and the
    // component minimum m keeps s(m) = m (m never appears as a doc_b),
    // so the contracted graph's component minima ARE the original ones.
    val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val lu0 = base.select(col("doc_id").as("u"), col("cluster").as("_lu"))
    val lv0 = base.select(col("doc_id").as("v"), col("cluster").as("_lv"))
    var curEdges = materialize(sym.join(lu0, "u").join(lv0, "v")
      .filter(col("_lu") =!= col("_lv"))
      .select(col("_lu").as("u"), col("_lv").as("v"))
      .distinct())
    // Rep-label table over the contracted endpoints only. It starts
    // EMPTY (conceptually identity): round 1's merge special-cases the
    // identity labels into a plain star-collapse aggregation over the
    // contracted relation, saving the identity-table checkpoint and the
    // round-1 hop join outright.
    var labels: DataFrame = null
    var converged = curEdges.isEmpty
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // hop minimum per target vertex, merged into the label table via
      // a LEFT join + least() — equivalent to a union+min over
      // (labels ∪ hop) but with the aggregation BEFORE the merge (the
      // map-side-combinable shape), and with no Union node: a union
      // whose branches share attribute ids trips constraint rewriting
      // ("key not found" in the child attribute map) once the branches
      // derive from the same checkpointed frame
      val merged =
        if (labels == null)
          // identity labels ⇒ hop min is just min(u) per v, and every
          // endpoint appears on the v side (the relation is symmetric):
          // one aggregation, no join
          curEdges.groupBy(col("v").as("doc_id"))
            .agg(min(col("u")).as("_hmin"))
            .select(col("doc_id"),
              least(col("doc_id"), col("_hmin")).as("cluster"))
        else {
          val hopMin = curEdges.join(
              labels.select(col("doc_id").as("u"), col("cluster").as("_lu")),
              "u")
            .groupBy(col("v").as("doc_id")).agg(min(col("_lu")).as("_hmin"))
          labels.join(hopMin, Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("cluster"), coalesce(col("_hmin"), col("cluster")))
                .as("cluster"))
        }
      // pointer jump: follow each label to ITS label (labels are doc
      // ids, so they are always present on the left of this join);
      // min-monotone, so the fixpoint is unchanged.
      val jumped = merged.join(
          merged.select(col("doc_id").as("cluster"), col("cluster").as("_cc2")),
          Seq("cluster"), "left")
        .select(col("doc_id"),
          coalesce(col("_cc2"), col("cluster")).as("cluster"))
      labels = materialize(jumped)
      // contract for the next round; checkpoint keeps the plan flat
      // (the same superlinear re-optimization hazard as the labels —
      // measured 0.7 s → 43 s per round by round 7 at sf0.001 when the
      // logical plan was allowed to nest)
      val lu = labels.select(col("doc_id").as("u"), col("cluster").as("_lu"))
      val lv = labels.select(col("doc_id").as("v"), col("cluster").as("_lv"))
      curEdges = materialize(curEdges.join(lu, "u").join(lv, "v")
        .filter(col("_lu") =!= col("_lv"))
        .select(col("_lu").as("u"), col("_lv").as("v"))
        .distinct())
      converged = curEdges.isEmpty
      rounds += 1
    }
    // ADVICE r05: the round cap is a runaway guard, and an unconverged
    // exit means the labels are WRONG (partially propagated) — they
    // must never flow silently into the split/histogram consumers.
    // Hitting the cap is a structural bug, not a tuning issue.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxRounds rounds; " +
        "refusing to return partially-propagated cluster labels")
    lastCcRounds = rounds
    // The graph may have fully collapsed at the seed (no contracted
    // edges, no loop rounds): the seed labels are final.
    if (labels == null) return base
    // Pointer-chain RESOLUTION: the hop only lowers labels of vertices
    // with a surviving contracted edge, so when the relation empties a
    // vertex's label can still point at a vertex whose OWN label moved
    // in the final rounds (e.g. 313→14 while 14→5 — caught against the
    // oracle at sf0.01). Close the chains by repeated label(label)
    // substitution over the small rep table: each pass halves the
    // remaining chain depth, so this terminates in O(log chain) cheap
    // passes (measured: one pass at every tested scale). The change
    // check runs BEFORE the checkpoint, so the final confirming pass
    // materializes nothing.
    var resolved = false
    var resRounds = 0
    while (!resolved && resRounds < 64) {
      // one materialization serves both the fixpoint check and the next
      // label table (both are cheap scans of the checkpointed rows) —
      // running the check as its own join execution doubled the passes'
      // join work
      val j = materialize(labels.join(
          labels.select(col("doc_id").as("cluster"), col("cluster").as("_cc2")),
          Seq("cluster"), "left")
        .select(col("doc_id"), col("cluster"),
          coalesce(col("_cc2"), col("cluster")).as("_next")))
      resolved = j.filter(col("_next") =!= col("cluster")).isEmpty
      labels = j.select(col("doc_id"), col("_next").as("cluster"))
      resRounds += 1
    }
    if (!resolved) throw new IllegalStateException(
      "connected-components pointer resolution did not close within 64 " +
        "passes; refusing to return partially-resolved cluster labels")
    // Resolve every doc through its (converged) rep label: one join of
    // the N-row seed table against the tiny rep-label table — reps not
    // in the table (fully star-collapsed components) keep their seed
    // label, which is already the component minimum.
    base.join(labels.select(col("doc_id").as("cluster"),
        col("cluster").as("_f")), Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("_f"), col("cluster")).as("cluster"))
  }

  /** Round count of the most recent [[connectedComponents]] run —
    * diagnostics only (bench/telemetry; same single-session contract as
    * QueryCaches). CC wall is rounds × per-round fixed cost (checkpoint
    * + one scalar aggregate) plus O(|edges|) join work, and on chained
    * corpora the fixed part dominates, so the round count is the number
    * that explains the wall.
    */
  @volatile private[graft] var lastCcRounds: Int = -1

  /** The finished cluster-label table (doc_id, cluster), memoized per
    * (session, sfDir) for the duration of a driver pass: three queries
    * consume it (labels, leak-free split, size histogram), and the
    * propagation loop's output is a checkpointed frame that
    * canonicalized-plan caching cannot share — without the memo each
    * consumer re-pays the whole iterative loop, which at web scale is
    * several joins over the full edge relation. Edges are persisted +
    * tracked HERE (not inside minhashEdges, which keeps
    * q_dedup_minhash's isolated plan materialization-free): the
    * clustering symmetrization reads that subtree twice (both union
    * branches), and a driver pass that also emits the edge list
    * (q_dedup_minhash) reuses the cache via canonicalized-plan dedup.
    * Memo and cache are both released via SparkEntry.releaseCaches.
    */
  private def ccLabels(s: SparkSession, dir: String): DataFrame =
    QueryCaches.memoize(("ccLabels", s, dir)) {
      val c = corpus(s, dir)
      val edges = QueryCaches.track(minhashEdges(c)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      connectedComponents(edges, c.select("doc_id"))
    }

  /** q_dedup_clusters — minhash edges → connected components:
    * (doc_id, cluster = min doc_id in its component). The oracle
    * recomputes the same fixpoint as a recursive transitive closure
    * (exact — small components — while the Spark side stays the
    * iterative O(|edges|)-per-round plan that survives web scale).
    */
  private def clusters(s: SparkSession, dir: String): DataFrame =
    ccLabels(s, dir).orderBy("doc_id")

  /** Shared DuckDB CTE chain for every clustering oracle: corpus →
    * shingles → band signatures → representative election → candidate
    * edges → symmetric closure → recursive transitive reach → per-doc
    * min-label `labels(doc_id, cluster)`. One definition keeps the
    * three clustering oracles (labels, leak-free split, size
    * histogram) on identical semantics by construction.
    */
  private val ccLabelsCtes =
    s"""WITH RECURSIVE corpus AS ($corpusSql),
       |sh_all AS ($shinglesSql),
       |bands AS (
       |  SELECT doc_id, band, min(substr(md5(shingle), band * 8 + 1, 8)) AS sig
       |  FROM sh_all, UNNEST(generate_series(0, 3)) AS bt(band)
       |  GROUP BY doc_id, band),
       |reps AS (SELECT band, sig, min(doc_id) AS doc_a FROM bands GROUP BY band, sig),
       |edges AS (
       |  SELECT DISTINCT doc_a, b.doc_id AS doc_b
       |  FROM reps JOIN bands b USING (band, sig)
       |  WHERE b.doc_id > doc_a),
       |sym AS (SELECT doc_a AS u, doc_b AS v FROM edges
       |        UNION SELECT doc_b, doc_a FROM edges),
       |reach AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |labels AS (
       |  SELECT c.doc_id,
       |    least(c.doc_id, coalesce(min(r.v), c.doc_id)) AS cluster
       |  FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
       |  GROUP BY c.doc_id)""".stripMargin

  private val clustersSql =
    s"""$ccLabelsCtes
       |SELECT doc_id, cluster FROM labels
       |ORDER BY doc_id""".stripMargin

  private val minhashSql = withCtes(
    """,
      |bands AS (
      |  SELECT doc_id, band, min(substr(md5(shingle), band * 8 + 1, 8)) AS sig
      |  FROM sh_all, UNNEST(generate_series(0, 3)) AS bt(band)
      |  GROUP BY doc_id, band),
      |reps AS (SELECT band, sig, min(doc_id) AS doc_a FROM bands GROUP BY band, sig)""".stripMargin,
    """SELECT DISTINCT doc_a, b.doc_id AS doc_b
      |FROM reps JOIN bands b USING (band, sig)
      |WHERE b.doc_id > doc_a
      |ORDER BY doc_a, doc_b""".stripMargin)

  /** q_dedup_incremental — dedup a crawl INCREMENT against the existing
    * corpus without touching the corpus side's documents: the mutated
    * `+100000` docs play today's re-crawled batch, the base documents
    * yesterday's corpus. For each incoming doc that shares any LSH band
    * bucket with the corpus, emit the minimum matching corpus doc as
    * `dup_of`; unmatched incoming docs are novel and absent.
    *
    * This is THE production shape at web scale: the corpus side
    * contributes only its band signatures — in a real pipeline those
    * are computed once per document lifetime and read from a signature
    * store, so a daily increment costs O(|batch|) signature work plus
    * one join, never a corpus re-scan (the full `q_dedup_minhash` /
    * clustering pass is re-run only when thresholds change). The join
    * is candidate-bounded the same way as the batch path: the corpus
    * side collapses to ONE representative row per (band, sig) bucket
    * before the join (min doc_id — which is exactly min over ALL
    * matching corpus docs, since every member of a shared bucket
    * shares that bucket), so a 10⁵-page boilerplate cluster in the
    * corpus meets an incoming doc as one row, and join output is
    * bounded by |incoming band rows|.
    */
  private[graft] def incrementHits(corpusSide: DataFrame,
                                   incoming: DataFrame): DataFrame = {
    val corpusReps = bandSigs(corpusSide)
      .groupBy("band", "sig").agg(min(col("doc_id")).as("dup_of"))
    bandSigs(incoming)
      .join(corpusReps, Seq("band", "sig"))
      .groupBy("doc_id").agg(min(col("dup_of")).as("dup_of"))
  }

  private def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    // the corpus/increment split IS the corpusParts split (base ids are
    // all < 100000, mutated copies all ≥ 100000 by construction), so
    // consume the branches directly instead of filtering the union —
    // the union form still scanned and augmented the opposite branch on
    // each side only to drop every row at the filter (round-7)
    val (d, dups) = corpusParts(s, dir)
    incrementHits(d, dups).orderBy("doc_id")
  }

  private val incrementalSql = withCtes(
    """,
      |bands AS (
      |  SELECT doc_id, band, min(substr(md5(shingle), band * 8 + 1, 8)) AS sig
      |  FROM sh_all, UNNEST(generate_series(0, 3)) AS bt(band)
      |  GROUP BY doc_id, band),
      |corpus_reps AS (
      |  SELECT band, sig, min(doc_id) AS dup_of FROM bands
      |  WHERE doc_id < 100000 GROUP BY band, sig)""".stripMargin,
    """SELECT b.doc_id, min(r.dup_of) AS dup_of
      |FROM bands b JOIN corpus_reps r USING (band, sig)
      |WHERE b.doc_id >= 100000
      |GROUP BY b.doc_id
      |ORDER BY doc_id""".stripMargin)

  /** q_dedup_simhash — 8-bit SimHash from md5 nibbles: bit_p = sign of
    * Σ_tokens (nibble_p(md5(token)) ≥ 8 ? +1 : −1). Equal signatures →
    * near-dup bucket.
    */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val tok = c.select(col("doc_id"),
      explode(split(col("text"), " ")).as("word"))
      .withColumn("h", md5(col("word")))
    val bitSums = (1 to 8).map { p =>
      sum(when(substring(col("h"), p, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"s$p")
    }
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = concat((1 to 8).map(p =>
      when(col(s"s$p") >= 0, "1").otherwise("0")): _*)
    sums.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }

  private val simhashSql = {
    val sums = (1 to 8).map(p =>
      s"sum(CASE WHEN substr(md5(word), $p, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s$p")
      .mkString(", ")
    val sig = (1 to 8).map(p => s"CASE WHEN s$p >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")
    s"""WITH corpus AS ($corpusSql)
       |SELECT doc_id, $sig AS simhash FROM (
       |  SELECT doc_id, $sums
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
       |  GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q_dedup_jaccard — exact n-gram Jaccard ≥ 0.6 with PREFIX-FILTERED
    * candidate generation (SSJoin/PPJoin principle): order every doc's
    * shingles by (global document-frequency asc, shingle asc); for
    * J(a,b) ≥ t the overlap is ≥ ceil(t·|a|) and ≥ ceil(t·|b|), so the
    * two docs MUST share a shingle inside each one's first
    * n − ceil(t·n) + 1 shingles. Joining only those prefixes (rarest
    * shingles first, so prefix postings lists are short by construction)
    * is a LOSSLESS filter — the result is byte-identical to the naive
    * all-pairs join (which the oracle keeps, doubling as an exactness
    * check) — while a hot shingle of frequency f no longer contributes
    * f² candidate rows unless it sits inside prefixes. t is relaxed to
    * 0.59 in the prefix length (exact integer arithmetic, no float
    * ceil) so 4-decimal rounding at the 0.6 boundary cannot drop a pair.
    */
  private def jaccard(s: SparkSession, dir: String): DataFrame = {
    // (doc_id, n, shingle), distinct — persisted because the plan reads
    // this subtree FOUR times (df ranking, prefix, and both sides of the
    // common-count join); uncached, split+transform+explode over the full
    // corpus re-runs per read (measured 31s vs ~8s at the sf0.1 bench).
    // MEMORY_AND_DISK so the exploded relation spills instead of OOMing
    // at corpus scale; CacheManager dedups by canonicalized plan, so the
    // survivors query (which re-enters here) shares the same cache entry.
    // Both persists are QueryCaches-tracked: the session owner releases
    // them via SparkEntry.releaseCaches once results are consumed.
    // ONE persisted relation now carries the doc-keyed DISTINCT gram
    // ARRAYS (round-7): the round-6 plan cached the exploded rows and
    // then re-ran the whole corpus gram scan TWICE MORE for the verify
    // step's array sides — the array relation is strictly smaller than
    // its own explosion, every consumer (prefix ranking via explode,
    // both verify sides) derives from it, and the corpus gram scan runs
    // exactly once per driver pass. MEMORY_AND_DISK so it spills
    // instead of OOMing at corpus scale; CacheManager dedups by
    // canonicalized plan, so survivors() (which re-enters here) shares
    // the same entry. Both persists are QueryCaches-tracked: the
    // session owner releases them via SparkEntry.releaseCaches.
    val docGrams = QueryCaches.track(withGrams(corpus(s, dir),
        distinct = true)
      .select(col("doc_id"), size(col("_grams")).cast("long").as("n"),
        col("_grams").as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sh = docGrams.select(col("doc_id"), col("n"),
      explode(col("grams")).as("shingle"))
    // document frequency as ONE window pass over the shingle partition
    // (round-7, guide §2.4): the agg + join-back form read the cached
    // relation twice and paid two exchanges on the shingle key; the
    // window pays one exchange plus a sort, same counts
    val wSh = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shingle"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    // persisted (round-7): BOTH sides of the candidate self-join read
    // this relation, and without the cache each side re-ran the full
    // two-window chain over the exploded shingles (the committed
    // before-plan shows two complete Window pairs — the planner does
    // not reuse the exchange across the join's sides). The prefix
    // relation is a small fraction of the exploded rows (≈41% of each
    // doc's shingles, further cut by df ≥ 2).
    val prefix = QueryCaches.track(sh
      .withColumn("df", count(lit(1)).over(wSh))
      .withColumn("r", row_number().over(wDoc))
      // prefix length = n - ceil(0.59*n) + 1, ceil in exact integers;
      // df-1 shingles stay in the RANKING (positions must count them)
      // but can never witness a pair (a shared shingle has df ≥ 2), so
      // they are dropped from the candidate join input
      .filter(col("r") <= col("n") - expr("(n*59 + 99) DIV 100") + 1 &&
        col("df") >= 2)
      .select("doc_id", "shingle", "r", "n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // PPJoin-style candidate pruning, all lossless for J ≥ 0.59:
    //  - length filter: t·nb ≤ na (and symmetric);
    //  - positional filter: the FIRST shared prefix shingle w* has no
    //    common shingle before it (positions follow one global order),
    //    so overlap ≤ 1 + min(na−ra, nb−rb) must still reach
    //    α = ceil(t(na+nb)/(1+t)); a qualifying pair always survives
    //    via w*, so `exists a passing shared shingle` is sound.
    // (A posting-list formulation — groupBy(shingle) + local pair
    // expansion — was measured 1.3-1.7× slower at bench scale because
    // the prefix relation broadcasts; the self-join stays the default.)
    val candidates = prefix.select(col("doc_id").as("doc_a"),
        col("shingle"), col("r").as("ra"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("shingle"),
        col("r").as("rb"), col("n").as("nb")), "shingle")
      .filter(col("doc_a") < col("doc_b") &&
        col("na") * 100 >= col("nb") * 59 &&
        col("nb") * 100 >= col("na") * 59 &&
        lit(1) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          expr("((na + nb)*59 + 158) DIV 159"))
      .select("doc_a", "doc_b").distinct()
    // VERIFY step, PPJoin-style: overlap of a surviving pair is computed
    // scan-locally from each doc's DISTINCT shingle ARRAY
    // (size(array_intersect)) after two doc-keyed joins — NOT by
    // re-joining the exploded shingle relation per pair, which shuffles
    // |pairs|·|shingles per doc| rows and pays an extra grouping
    // (measured ~2.3 s of the query's 4 s at the sf0.1 bench; the array
    // form carries each doc's grams once per matched pair and needs no
    // aggregation). The arrays relation is keyed by doc_id, so at corpus
    // scale these stay ordinary shuffle joins (AQE broadcasts when the
    // candidate set is small); identical `common` counts — both sides
    // are distinct sets.
    val common = candidates
      .join(docGrams.select(col("doc_id").as("doc_a"), col("n").as("na"),
        col("grams").as("ga")), "doc_a")
      .join(docGrams.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("grams").as("gb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("common"))
    // the FINAL pair set is also persisted (it is tiny — confirmed
    // pairs only): survivors() rebuilds this exact subtree, so the
    // canonicalized-plan cache hands it the finished result instead of
    // re-running the candidate+common stages a second time per pass
    QueryCaches.track(common
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("na") + col("nb") - col("common")), 4))
      .filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private val jaccardCtes =
    """,
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private val jaccardSql = withCtes(jaccardCtes,
    """SELECT doc_a, doc_b,
      |  round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) AS jaccard
      |FROM common
      |JOIN sizes na ON na.doc_id = doc_a
      |JOIN sizes nb ON nb.doc_id = doc_b
      |WHERE round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin)

  /** q_dedup_survivors — end-to-end dedupe: drop exact dups (md5) and
    * Jaccard≥0.6 near-dups, keeping the smallest doc_id (J4's keep rule
    * rebuilt deterministically: mod_dedupe.py:231-237 keeps the larger
    * text; here sizes tie so the stable tiebreak is the id).
    */
  private def survivors(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    // the keeper's source rides through the exact-dedup aggregation
    // (min_by on the same key that picks the keeper — doc_id is unique,
    // so the pair is deterministic), saving the round-6 plan's third
    // corpus scan and its doc_id-keyed join-back (round-7, guide §2.4)
    val exactKeep = c.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("source"), col("doc_id")).as("source"))
      .select("doc_id", "source")
    val nearPairs = jaccard(s, dir).select(col("doc_b").as("doc_id")).distinct()
    exactKeep.join(nearPairs, Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_survivors"))
      .orderBy("source")
  }

  private val survivorsSql = withCtes(jaccardCtes +
    """,
      |near AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM common
      |  JOIN sizes na ON na.doc_id = common.doc_a
      |  JOIN sizes nb ON nb.doc_id = common.doc_b
      |  WHERE round(CAST(common AS DOUBLE) / (na.n + nb.n - common), 4) >= 0.6),
      |exact_keep AS (
      |  SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text))""".stripMargin,
    """SELECT source, count(*) AS n_survivors
      |FROM corpus
      |WHERE doc_id IN (SELECT doc_id FROM exact_keep)
      |  AND doc_id NOT IN (SELECT doc_id FROM near)
      |GROUP BY source ORDER BY source""".stripMargin)

  /** q_dedup_reference — the faithful J4 dedupe join
    * (mod_dedupe.py:95-257): candidate pairs must share pubdate, differ
    * in module, and differ ≤15% in text size (cheap predicates FIRST,
    * exactly like the reference's pair loop), then token-count-vector
    * cosine ≥ 0.99 confirms; the smaller text (tie: larger doc_id) is
    * the removal victim (mod_dedupe.py:231-237 keeps the larger).
    */
  private def referenceDedup(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir).select(
      col("doc_id"), col("text"),
      when(col("doc_id") >= 100000, concat(col("source"), lit("_alt")))
        .otherwise(col("source")).as("module"),
      date_add(lit("2020-01-01").cast("date"),
        ((col("doc_id") % 100000) % 30).cast("int")).as("pubdate"),
      length(col("text")).cast("long").as("textSize"))
    // geometric size bucket (ratio 1/0.85): the ≤15%-of-max gap predicate
    // only pairs docs in the same or adjacent buckets, so the candidate
    // join key is (pubdate, bucket) — one side emits bucket ±1 — and a
    // day's pair space is Σ_bucket |bucket|² instead of |day|². Lossless;
    // the oracle keeps the pubdate-only join as the exactness check.
    def bucketOf(size: org.apache.spark.sql.Column) =
      floor(log(greatest(size, lit(1L)).cast("double")) /
        math.log(1.0 / 0.85)).cast("int")
    val a = c.select(col("doc_id").as("id_a"), col("module").as("mod_a"),
      col("pubdate"), col("textSize").as("size_a"),
      bucketOf(col("textSize")).as("bucket"))
    val b = c.select(col("doc_id").as("id_b"), col("module").as("mod_b"),
      col("pubdate"), col("textSize").as("size_b"))
      .withColumn("bucket", explode(array(
        bucketOf(col("size_b")) - 1, bucketOf(col("size_b")),
        bucketOf(col("size_b")) + 1)))
    val candidates = a.join(b, Seq("pubdate", "bucket"))
      .filter(col("id_a") < col("id_b") && col("mod_a") =!= col("mod_b") &&
        abs(col("size_a") - col("size_b")) <=
          greatest(col("size_a"), col("size_b")) * 0.15)
      .drop("bucket")
    // token-count-vector cosine via per-doc COUNT MAPS (round-7, guide
    // §2.3/§3.3 — shuffle doc-keyed summaries, not exploded words): the
    // old plan joined the exploded (doc_id, w, n) relation per pair on
    // (id_b, w), shuffling |pairs|·|words per doc| rows and paying an
    // extra per-pair grouping — on a hot day of k same-sized mirrored
    // copies that is k²·|words| rows through one exchange. Each doc now
    // carries ONE word→count map + its precomputed squared norm; a pair
    // costs two doc-keyed map joins and a scan-local map_zip_with dot
    // (O(|a|+|b|) per pair, no shuffle, no aggregation). Same dot — the
    // sum runs over the shared words either way — and a candidate pair
    // with no shared word gets dot 0 ⇒ cos 0 (old plan: no dots row),
    // dropped by the same ≥ 0.99 filter.
    // the map itself is built SCAN-LOCALLY by run-length-encoding the
    // sorted word array (run starts = positions whose word differs from
    // the predecessor; counts = gaps between consecutive starts): the
    // explode → groupBy(doc_id, w) → groupBy(doc_id) formulation paid
    // two exchanges over every word occurrence for the same counts.
    // Every intermediate array binds as a REAL COLUMN in its own
    // projection before any lambda references it: a subtree referenced
    // from inside a higher-order function is copied, not shared, and
    // re-evaluates once per ELEMENT (the first cut of this expression
    // recomputed array_sort(split(text)) per element — O(n² log n) per
    // row, a measured hang at sf0.1).
    // persisted: both sides of the candidate pair join read this
    // relation, and the per-row work (sort + run-length encode every
    // document's words) is the heaviest scan in the query — uncached it
    // runs twice (the before-plan shows 16 parquet scans query-wide)
    val docVecs = QueryCaches.track(c
      .withColumn("_ws", array_sort(split(col("text"), " ")))
      .withColumn("_starts", filter(
        sequence(lit(0), size(col("_ws")) - 1), i =>
          i === 0 ||
            element_at(col("_ws"), i + 1) =!= element_at(col("_ws"), i)))
      .withColumn("_se", concat(col("_starts"), array(size(col("_ws")))))
      .withColumn("wc", map_from_entries(transform(
        sequence(lit(0), size(col("_starts")) - 1), j =>
          struct(
            element_at(col("_ws"), element_at(col("_starts"), j + 1) + 1)
              .as("key"),
            (element_at(col("_se"), j + 2) -
              element_at(col("_starts"), j + 1)).cast("long").as("value")))))
      .withColumn("sq", aggregate(map_values(col("wc")), lit(0L),
        (acc, v) => acc + v * v))
      .select(col("doc_id"), col("wc"), col("sq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val scored = candidates
      .join(docVecs.select(col("doc_id").as("id_a"), col("wc").as("wca"),
        col("sq").as("sqa")), "id_a")
      .join(docVecs.select(col("doc_id").as("id_b"), col("wc").as("wcb"),
        col("sq").as("sqb")), "id_b")
      .withColumn("dot", aggregate(
        map_values(map_zip_with(col("wca"), col("wcb"), (_, x, y) => x * y)),
        lit(0L), (acc, v) => acc + coalesce(v, lit(0L))))
      .withColumn("cos", round(col("dot") /
        (sqrt(col("sqa").cast("double")) * sqrt(col("sqb").cast("double"))), 6))
      .filter(col("cos") >= 0.99)
    scored.select(col("pubdate"),
        when(col("size_a") < col("size_b"), col("id_a"))
          .otherwise(col("id_b")).as("removed"),
        when(col("size_a") < col("size_b"), col("id_b"))
          .otherwise(col("id_a")).as("kept"),
        col("cos"))
      .orderBy("removed", "kept")
  }

  private val referenceDedupSql = withCtes("" +
    """,
      |meta AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id >= 100000 THEN concat(source, '_alt') ELSE source END AS module,
      |    (DATE '2020-01-01' + INTERVAL ((doc_id % 100000) % 30) DAY)::DATE AS pubdate,
      |    CAST(length(text) AS BIGINT) AS textSize
      |  FROM corpus),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pubdate,
      |    a.textSize AS size_a, b.textSize AS size_b
      |  FROM meta a JOIN meta b ON a.pubdate = b.pubdate
      |    AND a.doc_id < b.doc_id AND a.module <> b.module
      |    AND abs(a.textSize - b.textSize) <= greatest(a.textSize, b.textSize) * 0.15),
      |counts AS (
      |  SELECT doc_id, w, count(*) AS n FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus)
      |  GROUP BY doc_id, w),
      |norms AS (SELECT doc_id, CAST(sum(n * n) AS BIGINT) AS sq FROM counts GROUP BY doc_id),
      |dots AS (
      |  SELECT cand.id_a, cand.id_b, CAST(sum(ca.n * cb.n) AS BIGINT) AS dot
      |  FROM cand
      |  JOIN counts ca ON ca.doc_id = cand.id_a
      |  JOIN counts cb ON cb.doc_id = cand.id_b AND cb.w = ca.w
      |  GROUP BY cand.id_a, cand.id_b)""".stripMargin,
    """SELECT pubdate,
      |  CASE WHEN size_a < size_b THEN id_a ELSE id_b END AS removed,
      |  CASE WHEN size_a < size_b THEN id_b ELSE id_a END AS kept,
      |  cos
      |FROM (
      |  SELECT cand.*, round(dot / (sqrt(na.sq) * sqrt(nb.sq)), 6) AS cos
      |  FROM cand JOIN dots USING (id_a, id_b)
      |  JOIN norms na ON na.doc_id = id_a
      |  JOIN norms nb ON nb.doc_id = id_b)
      |WHERE cos >= 0.99
      |ORDER BY removed, kept""".stripMargin)

  /** q_split_leakfree — leakage-free train/eval split: the split is a
    * deterministic hash of the CLUSTER label, not of the document, so
    * two near-duplicates can never land in different splits (assigning
    * by doc hash leaks eval content into train whenever a near-dup of
    * an eval doc survives in train — the classic contamination bug in
    * web-scale training sets). First hex char of md5(cluster) ≤ 'c'
    * → train (13/16 = 81.25%); byte-identical in both engines because
    * the compare is on one ASCII hex character of the same digest.
    * Scale shape: one scan-local projection over the cluster labels —
    * the split adds ZERO shuffles beyond the clustering itself.
    */
  private def splitLeakfree(s: SparkSession, dir: String): DataFrame = {
    ccLabels(s, dir)
      .select(col("doc_id"), col("cluster"),
        when(substring(md5(col("cluster").cast("string")), 1, 1) <= "c",
          "train").otherwise("eval").as("split"))
      .orderBy("doc_id")
  }

  private val splitLeakfreeSql =
    s"""$ccLabelsCtes
       |SELECT doc_id, cluster,
       |  CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 1) <= 'c'
       |       THEN 'train' ELSE 'eval' END AS split
       |FROM labels
       |ORDER BY doc_id""".stripMargin

  /** q_cluster_sizes — duplicate-cluster-size histogram: for each
    * component size, how many clusters have it. This is the production
    * monitor for the skew failure mode every pair-emitting dedup path
    * must avoid: at web scale, boilerplate/mirror clusters of 10⁵+
    * near-identical pages are routine, and THIS query — two
    * map-side-combinable aggregations over the label table, no joins,
    * no pair enumeration — is how a pipeline sees them coming before
    * any per-pair stage runs. Consumes the memoized label table, so in
    * a driver pass with the other clustering queries it is two
    * aggregations over an already-materialized frame.
    */
  private def clusterSizes(s: SparkSession, dir: String): DataFrame = {
    ccLabels(s, dir)
      .groupBy("cluster").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
      .orderBy("sz")
  }

  private val clusterSizesSql =
    s"""$ccLabelsCtes
       |SELECT sz, count(*) AS n_clusters
       |FROM (SELECT cluster, count(*) AS sz FROM labels GROUP BY cluster)
       |GROUP BY sz
       |ORDER BY sz""".stripMargin

  /** Per-doc count of distinct word 8-grams shared with the benchmark
    * side. The benchmark gram set is distinct-projected and BROADCAST:
    * eval benchmarks are megabytes while the corpus is the big side,
    * so the probe never shuffles the corpus grams — scan-local hash
    * probe, then one map-side-combinable count per doc_id. 8-grams
    * (not the dedup 3-grams) are the standard decontamination span:
    * long enough that sharing one is memorization evidence, not
    * vocabulary coincidence.
    */
  private[graft] def contaminationHits(c: DataFrame,
      isBench: Column): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .withColumn("_g", array_distinct(
        graft.functions.WordGrams.word_ngrams(col("text"), 8)))
      .select(col("doc_id"), explode(col("_g")).as("gram"))
    val bench = grams(c.filter(isBench)).select("gram").distinct()
    grams(c.filter(!isBench))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** q_decontaminate — benchmark decontamination: flag corpus docs
    * that share any 8-gram with the held-out benchmark set (docs with
    * doc_id % 97 == 0 stand in for an eval benchmark), with the count
    * of distinct shared grams as evidence weight. Complements
    * q_split_leakfree: the split stops NEAR-dup leakage structurally,
    * this catches verbatim eval text embedded inside otherwise-novel
    * train docs — the contamination mode cluster-keyed splitting
    * cannot see.
    */
  private def decontaminate(s: SparkSession, dir: String): DataFrame =
    contaminationHits(corpus(s, dir), col("doc_id") % 97 === 0)
      .orderBy("doc_id")

  private val decontaminateSql =
    s"""WITH corpus AS ($corpusSql),
       |g8 AS (
       |  SELECT DISTINCT doc_id, array_to_string(words[i:i+7], ' ') AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
       |    UNNEST(generate_series(1, len(words) - 7)) AS t(i)),
       |bench AS (SELECT DISTINCT gram FROM g8 WHERE doc_id % 97 = 0)
       |SELECT doc_id, count(*) AS n_hits
       |FROM g8 JOIN bench USING (gram)
       |WHERE doc_id % 97 <> 0
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** q_corpus_curation — the CAPSTONE keep/drop decision a training-data
    * pipeline actually ships: one row per corpus doc with the whole
    * filter chain's verdicts —
    *   is_exact_keeper: doc is the min-id of its md5(text) group;
    *   is_cluster_rep:  doc is its near-dup CLUSTER's representative
    *                    (label = component min, so rep ⇔ id = label;
    *                    implies is_exact_keeper — exact dups are
    *                    connected — but both are reported);
    *   quality_keep / lang_keep: the EXACT q_quality_score / q_lang_id
    *                    gates (shared expressions, so the capstone can
    *                    never drift from the individual monitors);
    *   keep = all of the above.
    * Scale shape: gates are scan-local; the exact-keeper side is one
    * map-side-combinable agg joined back on the hash; cluster labels
    * come from the memoized contraction loop — no new shuffle shapes.
    */
  private def curation(s: SparkSession, dir: String): DataFrame = {
    val base = corpus(s, dir)
    // the shared dedup corpus has NO byte-identical pairs (the +100000
    // copies are mutated), which would leave is_exact_keeper vacuously
    // true — so the capstone corpus adds EXACT copies of every 20th
    // base doc at +200000 (mirrored in the oracle). A copy's cluster
    // label resolves through its SOURCE id (same text ⇒ same cluster;
    // the copy can never be the rep since source id < copy id).
    val c = base.unionByName(base
      .filter(col("doc_id") < 100000 && col("doc_id") % 20 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"),
        col("source")))
    val labels = ccLabels(s, dir)
    val t = col("text")
    val nChars = length(t).cast("bigint")
    val nTokens = size(split(t, " ")).cast("bigint")
    val meanTokLenX100 =
      floor((nChars * 100).cast("double") / nTokens.cast("double"))
        .cast("bigint")
    val hits = TextQueries.stopHits(t)
    val qualityKeep = nChars.between(100, 20000) &&
      meanTokLenX100.between(200, 1200) && hits > 0
    val langKeep = hits * 100 >= nTokens * 2
    // the exact-keeper id per md5 group comes from ONE window pass over
    // the hash partition (round-7, the minhashEdges pattern): the old
    // groupBy + join-back paid two exchanges on the hash key and
    // re-evaluated the corpus-side md5 on both join inputs
    val wH = org.apache.spark.sql.expressions.Window.partitionBy(col("_h"))
    c.withColumn("_h", md5(encode(col("text"), "UTF-8")))
      .withColumn("_keeper", min(col("doc_id")).over(wH))
      .withColumn("_lk", when(col("doc_id") >= 200000,
        col("doc_id") - 200000).otherwise(col("doc_id")))
      .join(labels.select(col("doc_id").as("_lk"), col("cluster")), "_lk")
      .select(col("doc_id"),
        (col("doc_id") === col("_keeper")).as("is_exact_keeper"),
        (col("doc_id") === col("cluster")).as("is_cluster_rep"),
        qualityKeep.as("quality_keep"),
        langKeep.as("lang_keep"),
        ((col("doc_id") === col("_keeper")) &&
          (col("doc_id") === col("cluster")) &&
          qualityKeep && langKeep).as("keep"))
      .orderBy("doc_id")
  }

  private val curationSql = {
    val hits = TextQueries.stopAlternationSql
    val quality = s"""(length(text) BETWEEN 100 AND 20000
       |    AND (CAST(length(text) AS BIGINT) * 100 // CAST(len(string_split(text, ' ')) AS BIGINT)) BETWEEN 200 AND 1200
       |    AND ($hits) > 0)""".stripMargin
    val lang = s"(($hits) * 100 >= len(string_split(text, ' ')) * 2)"
    s"""$ccLabelsCtes,
       |curcorpus AS (
       |  SELECT doc_id, text, source FROM corpus
       |  UNION ALL
       |  SELECT doc_id + 200000 AS doc_id, text, source FROM corpus
       |  WHERE doc_id < 100000 AND doc_id % 20 = 0),
       |keepers AS (
       |  SELECT md5(text) AS h, min(doc_id) AS keeper
       |  FROM curcorpus GROUP BY 1)
       |SELECT c.doc_id,
       |  (c.doc_id = k.keeper) AS is_exact_keeper,
       |  (c.doc_id = l.cluster) AS is_cluster_rep,
       |  $quality AS quality_keep,
       |  $lang AS lang_keep,
       |  (c.doc_id = k.keeper AND c.doc_id = l.cluster
       |   AND $quality AND $lang) AS keep
       |FROM curcorpus c
       |JOIN keepers k ON md5(c.text) = k.h
       |JOIN labels l ON l.doc_id =
       |  CASE WHEN c.doc_id >= 200000 THEN c.doc_id - 200000
       |       ELSE c.doc_id END
       |ORDER BY c.doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_corpus_curation", curation, Some(curationSql)),
    QueryDef("q_dedup_reference", referenceDedup, Some(referenceDedupSql)),
    QueryDef("q_dedup_minhash", minhash, Some(minhashSql)),
    QueryDef("q_dedup_incremental", incrementalDedup, Some(incrementalSql)),
    QueryDef("q_dedup_clusters", clusters, Some(clustersSql)),
    QueryDef("q_split_leakfree", splitLeakfree, Some(splitLeakfreeSql)),
    QueryDef("q_cluster_sizes", clusterSizes, Some(clusterSizesSql)),
    QueryDef("q_decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("q_dedup_simhash", simhash, Some(simhashSql)),
    QueryDef("q_dedup_jaccard", jaccard, Some(jaccardSql)),
    QueryDef("q_dedup_survivors", survivors, Some(survivorsSql))
  )
}
