package graft

import org.apache.spark.sql.functions._

/** Pins session_window's merge boundary against Spark itself: an event
  * arriving EXACTLY one gap after its predecessor merges into the
  * session; one second past the gap starts a new one. The synthetic
  * events corpus carries microsecond timestamps that never land
  * exactly on the boundary, so the q_session_window oracle compare
  * cannot exercise this rule — this spec does, and it is the rule the
  * oracle SQL encodes (`> 1800`, the same convention as q_sessionize).
  */
class SessionBoundarySpec extends SparkTestBase {

  private def sessions(rows: Seq[(String, String)]): Seq[(String, Long)] = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("sw.start").cast("string"), col("n"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
  }

  test("an event exactly one gap after its predecessor MERGES; " +
      "one second past the gap starts a new session") {
    assert(sessions(Seq(
      ("u", "2021-01-01 10:00:00"), ("u", "2021-01-01 10:30:00"))) ===
      Seq(("2021-01-01 10:00:00", 2L)))
    assert(sessions(Seq(
      ("u", "2021-01-01 10:00:00"), ("u", "2021-01-01 10:30:01"))) ===
      Seq(("2021-01-01 10:00:00", 1L), ("2021-01-01 10:30:01", 1L)))
  }
}
