package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Watermarked streaming first-seen dedup — the §2.9 shape an unbounded
  * crawl actually needs. The batch engine's seen-set (bloom + exact
  * anti-join, SeenSet.scala) answers "ever seen?" against a snapshot
  * table that grows with the crawl; on an infinite URL/document stream
  * the equivalent operator must hold its state in the STREAM, and
  * unbounded keyed state is the classic streaming OOM. This operator is
  * the bounded-state contract Structured Streaming offers for it:
  * `withWatermark(ts, delay)` + `dropDuplicatesWithinWatermark(keys)` —
  * duplicates arriving within `delay` of a key's first arrival are
  * dropped exactly; a key's state expires at FIRST-arrival event time
  * + delay (duplicates are dropped without touching the stored expiry
  * — spec-distinguished from refresh-on-duplicate semantics by an
  * eviction watermark placed between the two candidate expiries) and
  * is EVICTED during the first batch whose eviction watermark passes
  * that expiry — so total state is bounded by the keys active inside
  * one delay window (arrival rate × delay), independent of stream
  * length. The price is re-emission of a key that recurs after
  * eviction — which downstream must treat as at-least-once first-seen
  * (the engine's idempotent snapshot commits already do).
  * StreamDedupSpec pins all three behaviors (in-batch dedup,
  * cross-batch dedup within delay, eviction + re-emission beyond it)
  * on a deterministic multi-batch file stream.
  *
  * Scale shape: dedup state is hash-partitioned by key across
  * executors (one shuffle per micro-batch, same key-partitioning every
  * batch, so state never migrates); RocksDB state store holds the
  * per-key expiry — nothing is ever broadcast or collected.
  */
object StreamDedup {

  /** The operator itself, on any streaming frame: first row per key
    * passes, duplicates within `delay` of it are dropped, state evicts
    * one delay window behind the watermark.
    */
  def firstSeen(stream: DataFrame, tsCol: String, delay: String,
                keys: String*): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.toSeq)

  /** File-source wiring: one parquet file per micro-batch (files in
    * modification-time order), so batch boundaries — and therefore
    * watermark advancement and state eviction — are deterministic.
    */
  def firstSeenStream(s: SparkSession, srcDir: String, schema: StructType,
                      tsCol: String, delay: String,
                      keys: String*): DataFrame =
    firstSeen(
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir),
      tsCol, delay, keys: _*)

  /** Drain a streaming frame synchronously, collecting each
    * micro-batch's APPEND output: (batchId, rows). Driver-side test /
    * probe harness — the per-batch boundary is exactly what the
    * eviction semantics are defined over, so specs assert on it.
    */
  def collectBatches(df: DataFrame, checkpointDir: String)
      : Seq[(Long, Seq[Row])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Row])]
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        out.synchronized { out += ((id, batch.collect().toSeq)) }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    out.toSeq
  }
}
