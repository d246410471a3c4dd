package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen set (SURVEY.md §2.5 J1 / north rule "distributed
  * bloom/cuckoo URL-seen set").
  *
  * Reference semantics (`session_hist.py:349-422`): candidates are removed
  * if present in URL_LIST ∪ FAILED_URLS ∪ HTTP_ERRORS; the reference
  * chunks 5000-url NOT-IN probes against SQLite. Here: a sharded Bloom
  * filter broadcast to executors PRUNES (splits candidates into
  * definitely-new vs maybe-seen), and an exact left-anti join DECIDES the
  * maybe-seen remainder — bloom false positives can never drop a URL, they only
  * cost an extra join row. At 10^10-URL scale the bloom keeps the
  * anti-join's shuffled build side proportional to (true hits + fpp·new)
  * instead of the whole candidate set, and the definitely-new fraction
  * skips the shuffle entirely.
  */
object SeenSet {

  /** Stable shard of a url string (same function at build and probe). */
  def shardOf(url: String, shards: Int): Int = {
    val h = url.hashCode
    ((h % shards) + shards) % shards
  }

  /** Build one Bloom filter per shard, distributed: partial blooms are
    * created INSIDE each partition (nothing shipped in the task closure —
    * a broadcast zero would serialize shards × capacity bits into every
    * task binary) and merged with a tree reduction (associative,
    * order-free → deterministic result regardless of parallelism).
    * Empty input yields empty shards of the same capacity.
    */
  def buildShardedBloom(seen: DataFrame, urlCol: String, shards: Int,
                        expectedTotal: Long, fpp: Double): Array[Array[Byte]] = {
    val spark = seen.sparkSession
    import spark.implicits._
    val perShard = math.max(expectedTotal / math.max(shards, 1), 1024L)
    val urls = seen.select(col(urlCol)).as[String]
    val partials = urls.rdd.mapPartitions { iter =>
      if (iter.isEmpty) Iterator.empty
      else {
        val acc = Array.fill(shards)(BloomFilter.create(perShard, fpp))
        iter.foreach(url => acc(shardOf(url, shards)).putString(url))
        Iterator.single(acc.map(toBytes))
      }
    }
    if (partials.isEmpty())
      Array.fill(shards)(toBytes(BloomFilter.create(perShard, fpp)))
    else partials.treeReduce(mergeSharded, depth = 2)
  }

  /** Serialize one bloom. */
  private def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Merge two serialized sharded blooms built with the SAME
    * (perShardCapacity, fpp) — bitwise OR, associative and commutative,
    * so incremental per-wave merging is order-free and deterministic.
    * This is the scale path: per wave we build a bloom over the WAVE's
    * new seen urls only and OR it into the persisted filter —
    * O(wave delta + bloom bits), never an O(|seen|) rebuild.
    */
  def mergeSharded(a: Array[Array[Byte]],
                   b: Array[Array[Byte]]): Array[Array[Byte]] = {
    require(a.length == b.length,
      s"shard count mismatch: ${a.length} vs ${b.length}")
    a.zip(b).map { case (ab, bb) =>
      val af = BloomFilter.readFrom(new java.io.ByteArrayInputStream(ab))
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bb))
      af.mergeInPlace(bf)
      toBytes(af)
    }
  }

  /** Column predicate: true iff url MIGHT be in the sharded bloom. */
  def mightContain(spark: SparkSession, url: Column,
                   blooms: Array[Array[Byte]]): Column = {
    val bcast = spark.sparkContext.broadcast(blooms)
    ColumnBridge.column(
      BloomMightContainExpr(ColumnBridge.expression(url), bcast))
  }

  /** J1 removeAlreadyFetchedURLs: exact anti-join, optionally bloom-pruned.
    * Result is EXACTLY equal to `candidates LEFT ANTI JOIN seen ON url` —
    * the bloom only routes rows (SeenSetSpec asserts equality).
    */
  def removeSeen(candidates: DataFrame, urlCol: String, seen: DataFrame,
                 seenUrlCol: String,
                 blooms: Option[Array[Array[Byte]]] = None): DataFrame = {
    val seenKeys = seen.select(col(seenUrlCol).as(urlCol))
    blooms match {
      case None =>
        candidates.join(seenKeys, Seq(urlCol), "left_anti")
      case Some(b) =>
        val probe = mightContain(candidates.sparkSession, col(urlCol), b)
        val definitelyNew = candidates.filter(!probe)
        val maybeSeen = candidates.filter(probe)
          .join(seenKeys, Seq(urlCol), "left_anti")
        definitelyNew.unionByName(maybeSeen)
    }
  }
}

/** Deterministic bloom-membership probe over a broadcast sharded bloom.
  * Blooms deserialize once per executor (lazy transient), not per row.
  * Codegen calls `probe` through a referenced copy of this expression,
  * so the scheduling filter stays inside the surrounding whole-stage
  * span instead of falling back to the interpreted walker per row —
  * this sits on the per-URL hot path of every wave's schedule step.
  */
case class BloomMightContainExpr(child: Expression,
                                 bcast: Broadcast[Array[Array[Byte]]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val blooms: Array[BloomFilter] =
    bcast.value.map(b =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))

  def probe(input: UTF8String): Boolean = {
    val url = input.toString
    val shard = SeenSet.shardOf(url, blooms.length)
    blooms(shard).mightContainString(url)
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(probe(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
