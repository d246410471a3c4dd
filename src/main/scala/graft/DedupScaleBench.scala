package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Dedup-at-scale evidence beyond sf0.1 (VERDICT r05 item 6): run the
  * dedup family — exact hash dedupe, MinHash-LSH candidate edges, and
  * connected-components clustering — on seeded synthetic corpora at
  * 1×/4×/16× the base size and report wall-clock growth vs corpus size.
  * The representative-election + edge-contraction design claims ~linear
  * growth; this measures it instead of asserting it.
  *
  * The corpus is deliberately SKEWED the way web text is:
  *   - one 10⁴-doc IDENTICAL cluster (boilerplate page replicated —
  *     the shape that used to go quadratic before rep election);
  *   - 5,000 template families (near-dup chains: family text with two
  *     per-doc word mutations, so cross-band bucket links form the
  *     long chains that forced pointer jumping);
  *   - a long tail of distinct documents.
  * All text derives arithmetically from doc_id (no RNG) so every run
  * and every size is reproducible; sizes share the same distribution,
  * so time ratios are size ratios, not mix shifts.
  *
  * Host caveat (BENCH/BASELINE.md): per-core clock throttling on this
  * box varies BETWEEN sessions but not with DATA size at fixed cores —
  * all sizes run inside one local[8] session back-to-back, so the
  * growth ratios are meaningful even when absolute numbers drift.
  * Writes BENCH/DEDUP_SCALE.md.
  */
object DedupScaleBench {

  private val BaseN = sys.env.getOrElse("GRAFT_DEDUP_BASE", "100000").toLong
  private val Sizes = Seq(1L, 4L, 16L)
  private val HotK = 10000L

  /** Deterministic skewed corpus of n docs, ~20 words each. */
  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    // 20-word body: family words at positions 0..19 except two per-doc
    // mutation slots, so same-family docs share ~90% of their 3-grams
    val family = pmod(xxhash64(id % 5000L), lit(100000L))
    val words = (0 until 20).map { j =>
      val fam = concat(lit("t"), pmod(family * 31 + j * 7, lit(4000L)))
      val mut = concat(lit("u"), pmod(xxhash64(id * 20 + j), lit(99991L)))
      when(pmod(id + j, lit(10L)) < 2 && id >= 2 * HotK, mut)
        .otherwise(fam)
    }
    spark.range(n).select(
      id.as("doc_id"),
      when(id < HotK, lit(("hot " * 19).trim + " cluster"))
        .otherwise(concat_ws(" ", words: _*)).as("text"),
      lit("bench").as("source"))
  }

  private def timed[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-dedup-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)

    case class Row(n: Long, tExact: Double, tEdges: Double, edges: Long,
                   tCc: Double, clusters: Long, ccRounds: Int)
    def measure(n: Long, announce: Boolean): Row = {
      val c = corpus(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count() // materialize OUTSIDE the timed windows
      // noop sink forces the FULL aggregate (a bare count() would let
      // Catalyst prune min/count and time keys-only grouping)
      val (tExact, _) = timed {
        c.groupBy(md5(encode(col("text"), "UTF-8")).as("h"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
          .write.mode("overwrite").format("noop").save()
      }
      // edge build timed once, PERSISTED, so the CC window below times
      // clustering — not a rebuild of the edges it consumes
      val edgesDf = DedupQueries.minhashEdges(c)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tEdges, edges) = timed { edgesDf.count() }
      val (tCc, clusters) = timed {
        val labels =
          DedupQueries.connectedComponents(edgesDf, c.select("doc_id"))
        labels.select("cluster").distinct().count()
      }
      SparkEntry.releaseCaches(blocking = true)
      edgesDf.unpersist(blocking = true)
      c.unpersist(blocking = true)
      val rounds = DedupQueries.lastCcRounds
      if (announce)
        println(f"[dedup-scale] n=$n%,d exact=$tExact%.2fs " +
          f"edges=$tEdges%.2fs ($edges%,d) cc=$tCc%.2fs " +
          f"($clusters%,d clusters, $rounds rounds)")
      Row(n, tExact, tEdges, edges, tCc, clusters, rounds)
    }
    // one UNTIMED warmup pass AT THE FULL BASE SHAPE: whole-stage
    // codegen compilation and JIT land here, not in the 1x row (which
    // would flatter the growth ratios the artifact exists to prove).
    // A smaller warmup would miss the paths that matter — at n ≤ 2·HotK
    // the corpus is mostly the identical hot cluster, so the template
    // chains, the multi-round CC loop, and the contraction joins would
    // first compile inside the 1x timed window.
    measure(BaseN, announce = false)
    val rows = Sizes.map(mult => measure(BaseN * mult, announce = true))

    val sb = new StringBuilder
    sb.append("# Dedup scaling vs corpus size (VERDICT r05 item 6)\n\n")
    sb.append(s"Seeded skewed corpus (one ${HotK}-doc identical " +
      "cluster, 5k near-dup template families, distinct tail), " +
      "local[8], one session, sizes back-to-back.\n\n")
    sb.append("| docs | exact s | minhash s | edges | cc s | cc rounds " +
      "| clusters | total s | growth vs prev (size x4) |\n")
    sb.append("|---|---|---|---|---|---|---|---|---|\n")
    var prev: Option[Double] = None
    rows.foreach { r =>
      val total = r.tExact + r.tEdges + r.tCc
      val growth = prev.map(p => f"x${total / p}%.2f").getOrElse("-")
      sb.append(f"| ${r.n}%,d | ${r.tExact}%.2f | ${r.tEdges}%.2f " +
        f"| ${r.edges}%,d | ${r.tCc}%.2f | ${r.ccRounds} " +
        f"| ${r.clusters}%,d | $total%.2f | $growth |\n")
      prev = Some(total)
    }
    sb.append("\nLinear-growth read: with size x4 per step, a time " +
      "growth factor near (or below) x4 per step evidences the " +
      "claimed ~O(n) dedup family: representative election bounds " +
      "every bucket, edge counts grow linearly in docs, and the CC " +
      "round count (edge contraction: O(log diameter)) is " +
      "size-independent. Since round 7 the contraction loop runs " +
      "over the CONTRACTED graph only (the N-row label table is " +
      "touched exactly three times: seed, initial contraction, final " +
      "resolve) and convergence is contracted-edge emptiness on an " +
      "already-materialized shrinking frame, so the cc wall is a few " +
      "O(N) passes plus rounds x small-relation work -- the shape " +
      "that survives a 100x scale-up.\n")
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/DEDUP_SCALE.md"), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
