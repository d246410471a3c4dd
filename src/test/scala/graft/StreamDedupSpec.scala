package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.streaming.StreamDedup

/** Pins the bounded-state contract of the watermarked streaming dedup:
  *  (1) duplicates inside one micro-batch collapse to the first row;
  *  (2) a duplicate arriving in a LATER batch within the watermark
  *      delay of the key's first arrival is dropped (cross-batch state);
  *  (3) a key's expiry anchors at FIRST arrival + delay — duplicates
  *      do NOT refresh it: the eviction watermark is steered BETWEEN
  *      first-arrival-anchored expiry (11:00) and last-seen-anchored
  *      expiry (11:30), so the final re-emission happens only under
  *      the former (refresh semantics would keep the state and drop
  *      the recurrence);
  *  (4) once evicted, a recurrence re-emits — the price of state
  *      bounded by arrival-rate × delay instead of stream length.
  * Batch boundaries are made deterministic by one file per trigger in
  * strictly increasing modification-time order.
  */
class StreamDedupSpec extends SparkTestBase {

  private def writeBatch(dir: String, name: String, modMinute: Int,
                         rows: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val tmp = tempDir("graft-sd-stage")
    rows.toDF("k", "ts_s")
      .select(col("k"), col("ts_s").cast("timestamp").as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.endsWith(".crc")).head
      finally listing.close()
    val dst = Paths.get(dir, name)
    Files.copy(Paths.get(part), dst)
    Files.setLastModifiedTime(dst,
      FileTime.fromMillis(1700000000000L + modMinute * 60000L))
  }

  /** Stages the five-batch scenario into a fresh source dir, runs the
    * dedup stream over it, returns batchId → sorted emitted keys.
    */
  private def runScenario(): Map[Long, Seq[String]] = {
    val src = tempDir("graft-sd-src")
    // delay = 1 hour. Batch A: k1 twice (in-batch dup), k2, k3.
    // watermark after A = 10:20 - 1h = 09:20.
    writeBatch(src, "a.parquet", 0, Seq(
      ("k1", "2021-01-01 10:00:00"), ("k1", "2021-01-01 10:05:00"),
      ("k2", "2021-01-01 10:10:00"), ("k3", "2021-01-01 10:20:00")))
    // Batch B: k1 again 30 min after first arrival — state alive
    // (watermark 09:20 < k1 expiry 11:00) => dropped. This duplicate
    // also arms the refresh probe: first-arrival expiry = 11:00,
    // last-seen expiry would be 11:30. k4 fresh. watermark after
    // B = 09:40.
    writeBatch(src, "b.parquet", 1, Seq(
      ("k1", "2021-01-01 10:30:00"), ("k4", "2021-01-01 10:40:00")))
    // Batch C: k6 at 12:15 advances the watermark (for the NEXT batch)
    // to 11:15 — deliberately BETWEEN k1's first-arrival expiry
    // (11:00) and its would-be refreshed expiry (11:30).
    writeBatch(src, "c.parquet", 2, Seq(("k6", "2021-01-01 12:15:00")))
    // Batch D: processed under eviction watermark 11:15 — k1 (expiry
    // 11:00) and k2 (11:10) evict DURING this batch; under
    // refresh-on-duplicate semantics k1 (11:30) would survive. k7 is
    // fresh. (Eviction runs as part of a batch, so the recurrence
    // probe needs this intervening batch: a k1 row HERE would still
    // match the not-yet-evicted state.) watermark after D = 12:10.
    writeBatch(src, "d.parquet", 3, Seq(("k7", "2021-01-01 13:10:00")))
    // Batch E: k1 recurs at 12:30 — above the 12:10 late-event
    // watermark, and its state is gone => RE-EMITTED. (Under refresh
    // semantics the eviction watermark here, 12:10, would ALSO have
    // evicted 11:30-expiry state — but eviction-in-batch means the
    // row is matched against state before this batch's eviction, so
    // a refreshed k1 would be DROPPED here; emission proves the
    // first-arrival anchor.)
    writeBatch(src, "e.parquet", 4, Seq(("k1", "2021-01-01 12:30:00")))

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k STRING, ts TIMESTAMP")
    val deduped = StreamDedup.firstSeenStream(
      spark, src, schema, "ts", "1 hour", "k")
    StreamDedup.collectBatches(deduped, tempDir("graft-sd-ck"))
      .map { case (id, rows) =>
        id -> rows.map(_.getString(0)).sorted
      }.filter(_._2.nonEmpty).toMap
  }

  private def assertScenario(batches: Map[Long, Seq[String]]): Unit = {
    // (1) in-batch dup collapsed; first batch emits each key once
    assert(batches(0L) === Seq("k1", "k2", "k3"))
    // (2) k1's within-delay recurrence dropped across the batch border
    assert(batches(1L) === Seq("k4"))
    assert(batches(2L) === Seq("k6"))
    assert(batches(3L) === Seq("k7"))
    // (3) eviction: k1 re-emits once its state aged out
    assert(batches(4L) === Seq("k1"))
    // corollary: within one delay window the stream result equals the
    // batch first-seen dedupe (k1 emitted exactly once in batches 0-2)
    val firstWindow = (0L to 2L).flatMap(batches.getOrElse(_, Nil))
    assert(firstWindow.count(_ == "k1") === 1)
  }

  test("streaming first-seen dedup: in-batch + within-delay dedup, " +
      "eviction and re-emission beyond the delay") {
    assertScenario(runScenario())
  }

  test("identical semantics on the RocksDB state store (the scale " +
      "path: per-key state off the executor heap)") {
    // the default HDFSBackedStateStore keeps every key's state in
    // executor heap — at web-scale arrival rates the RocksDB provider
    // is the deployable configuration, so the semantics contract must
    // hold there bit-for-bit too (provider is read at query start)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try assertScenario(runScenario())
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
