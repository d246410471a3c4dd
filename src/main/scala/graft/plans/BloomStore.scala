package graft.plans

import java.io.{DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Persisted sharded-bloom snapshots, one binary file per wave, written
  * next to the snapshot tables (SURVEY.md §4 item 2: the URL-seen filter
  * shards checkpoint with snapshot lineage, north rule "URL-seen filter
  * shards checkpoint to Iceberg").
  *
  * Layout: `<root>/<waveId padded>.bloom`, format
  * `[int shards][per shard: int len, bytes]`, written to a temp file and
  * atomically renamed — same crash discipline as [[SnapshotTable]]: a
  * partial write is never visible, and a missing wave file degrades to
  * the previous wave's filter (the bloom only PRUNES; the exact anti-join
  * decides, so a stale filter is correct, just slightly less selective).
  *
  * Scale: per wave the engine ORs in a bloom built over that wave's new
  * seen urls only — O(wave delta + bloom bits) — instead of rebuilding
  * from the full seen set, which at a 10^10-URL seen set would be an
  * O(10^10) scan every wave.
  */
final class BloomStore(root: String) {

  private val dir = Paths.get(root)
  Files.createDirectories(dir)

  private def fileFor(waveId: Long): Path = dir.resolve(f"$waveId%012d.bloom")

  /** Committed wave files only: `<digits>.bloom`. A crash between
    * createTempFile and the atomic move can leave a `.tmp-*.bloom`
    * orphan; accepting it here would make every later readAtWave throw
    * on `.toLong`, so the name filter IS the crash discipline.
    */
  private def waveFiles(): Seq[(Long, Path)] = {
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.matches("\\d+\\.bloom"))
      .map(p => p.getFileName.toString.stripSuffix(".bloom").toLong -> p)
      .toSeq.sortBy(_._1)
    finally stream.close()
  }

  /** Latest persisted shards with waveId <= `wave`, if any. */
  def readAtWave(wave: Long): Option[Array[Array[Byte]]] =
    waveFiles().filter(_._1 <= wave).lastOption.map { case (_, p) =>
      val in = new DataInputStream(Files.newInputStream(p))
      try {
        val shards = in.readInt()
        Array.fill(shards) {
          val len = in.readInt()
          in.readNBytes(len)
        }
      } finally in.close()
    }

  /** Persist shards for `waveId` (idempotent: re-writing the same wave
    * after a crash replaces the file atomically with identical content —
    * the merge is deterministic).
    */
  def write(waveId: Long, shards: Array[Array[Byte]]): Unit = {
    val tmp = Files.createTempFile(dir, ".tmp-", ".bloom")
    val out = new DataOutputStream(Files.newOutputStream(tmp))
    try {
      out.writeInt(shards.length)
      shards.foreach { s => out.writeInt(s.length); out.write(s) }
    } finally out.close()
    Files.move(tmp, fileFor(waveId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
