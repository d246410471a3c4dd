package graft

import org.apache.spark.sql.functions._

import graft.operators.SeenSet

/** The bloom filter may only PRUNE, never decide: bloom-routed removeSeen
  * must equal the plain exact anti-join on any input (J1 invariant,
  * SURVEY.md §2.5).
  */
class SeenSetSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom-pruned anti-join equals exact anti-join") {
    // strict codegen: the probe expression generates code (referenced-
    // object call); a janino failure must fail the test, not silently
    // fall back to the interpreted walker
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try bloomEqualsExact()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  private def bloomEqualsExact(): Unit = {
    val candidates = spark.range(5000)
      .select(concat(lit("https://h"), (col("id") % 40).cast("string"),
        lit(".com/p"), col("id").cast("string")).as("url"),
        col("id"))
    val seen = spark.range(5000)
      .filter(col("id") % 3 === 0 || col("id") % 11 === 1)
      .select(concat(lit("https://h"), (col("id") % 40).cast("string"),
        lit(".com/p"), col("id").cast("string")).as("url"))

    val blooms = SeenSet.buildShardedBloom(seen, "url", 8, 5000L, 0.03)
    val exact = SeenSet.removeSeen(candidates, "url", seen, "url", None)
      .select("url").as[String].collect().sorted
    val pruned = SeenSet.removeSeen(candidates, "url", seen, "url",
      Some(blooms)).select("url").as[String].collect().sorted
    assert(pruned.toSeq == exact.toSeq)
    assert(exact.nonEmpty)
  }

  test("bloom claims containment for every seen url (no false negatives)") {
    val seen = spark.range(2000)
      .select(concat(lit("u"), col("id").cast("string")).as("url"))
    val blooms = SeenSet.buildShardedBloom(seen, "url", 4, 2000L, 0.01)
    val misses = seen.filter(
      !SeenSet.mightContain(spark, col("url"), blooms)).count()
    assert(misses == 0)
  }

  test("sharded build is independent of parallelism") {
    val seen8 = spark.range(3000).repartition(8)
      .select(concat(lit("u"), col("id").cast("string")).as("url"))
    val seen2 = spark.range(3000).repartition(2)
      .select(concat(lit("u"), col("id").cast("string")).as("url"))
    val b8 = SeenSet.buildShardedBloom(seen8, "url", 4, 3000L, 0.01)
    val b2 = SeenSet.buildShardedBloom(seen2, "url", 4, 3000L, 0.01)
    // membership decisions must agree on a probe set regardless of the
    // build parallelism (merge is associative+commutative)
    val probes = (0 until 6000).map(i => s"u$i")
    val dec8 = probes.map { p =>
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(
          b8(SeenSet.shardOf(p, 4))))
      bf.mightContainString(p)
    }
    val dec2 = probes.map { p =>
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(
          b2(SeenSet.shardOf(p, 4))))
      bf.mightContainString(p)
    }
    assert(dec8 == dec2)
  }
}
