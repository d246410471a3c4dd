package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Event-stream operators: HTTP-error routing stats (F10+A2), GDELT-style
  * scan+filter+project+dedupe (S8), sessionization (the stateful-stream
  * shape of SURVEY.md §2.9), and time-window rollups.
  */
object EventQueries {

  /** Permanent HTTP error codes (network.py:57-68). */
  private val permanentCodes = Seq(400, 401, 403, 404, 405, 410, 451)

  /** q_http_error_stats — F10 permanent-error gate + A2 GROUP BY
    * http_code rollup (session_hist.py:563-590). Codes synthesized
    * deterministically from event_id.
    */
  private def httpErrorStats(s: SparkSession, dir: String): DataFrame = {
    val codeList = Seq(200, 301, 400, 401, 403, 404, 410, 500, 503, 451)
    val code = element_at(
      array(codeList.map(lit): _*), (col("event_id") % 10).cast("int") + 1)
    events(s, dir)
      .withColumn("http_code", code)
      .withColumn("permanent",
        col("http_code").isin(permanentCodes.map(Integer.valueOf): _*))
      .groupBy("http_code", "permanent")
      .agg(count(lit(1)).as("n"))
      .orderBy("http_code")
  }

  private val httpErrorStatsSql =
    """SELECT http_code, permanent, count(*) AS n FROM (
      |  SELECT ([200,301,400,401,403,404,410,500,503,451])[CAST(event_id % 10 AS INT) + 1] AS http_code,
      |    ([200,301,400,401,403,404,410,500,503,451])[CAST(event_id % 10 AS INT) + 1]
      |      IN (400,401,403,404,405,410,451) AS permanent
      |  FROM events)
      |GROUP BY http_code, permanent ORDER BY http_code""".stripMargin

  /** q_gdelt_scan — S8 aggregator scan (mod_in_gdelt.py:118-202):
    * filter one column to a constant, project the URL-ish column, dedupe.
    */
  private def gdeltScan(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"))
      .distinct()
      .orderBy("user_id")

  private val gdeltScanSql =
    """SELECT DISTINCT user_id FROM events
      |WHERE event_type = 'click' ORDER BY user_id""".stripMargin

  /** q_sessionize — gap-based sessionization (30-min inactivity): the
    * batch equivalent of mapGroupsWithState session windows (§2.9).
    */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_timestamp(col("ts")) -
      unix_timestamp(lag(col("ts"), 1).over(w))
    events(s, dir)
      .withColumn("new_session",
        when(gap.isNull || gap > 1800, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id")
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val sessionizeSql =
    """SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q_session_window — the same gap sessions via Spark's NATIVE
    * `session_window` (the streaming-capable formulation: in a stream
    * this exact groupBy runs with watermarked state and emits sessions
    * as they close; q_sessionize's window-function form cannot stream).
    * The DuckDB oracle rebuilds the sessions with the lag/sum trick, so
    * the two formulations are proven equivalent on the corpus — and the
    * boundary rule is the SAME as q_sessionize's: an event arriving
    * EXACTLY one gap after its predecessor MERGES into the session
    * (only `> gap` starts a new one). The corpus's microsecond
    * timestamps never land exactly on the boundary, so that rule is
    * pinned by SessionBoundarySpec against Spark itself, not by the
    * oracle compare.
    */
  private def sessionWindowAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")

  private val sessionWindowSql =
    """SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
      |FROM (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** q_hourly_rollup — time-bucketed windowed aggregation (the batch
    * shape of the Structured-Streaming wave metrics; §2.9).
    */
  private def hourlyRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
      .orderBy("hour", "event_type")

  private val hourlyRollupSql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 4) AS v
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** q_stream_hourly — REAL Structured Streaming (§2.9): file-source
    * readStream over the events parquet → windowed count/sum → memory
    * sink, drained synchronously with processAllAvailable. Epoch-aligned
    * 1-hour windows make window.start ≡ date_trunc('hour', ts), so the
    * batch oracle checks the streaming result exactly.
    */
  private def streamHourly(s: SparkSession, dir: String): DataFrame = {
    val schema = events(s, dir).schema
    // the file stream source requires a directory: stage the single
    // events file into a temp dir (read-only testdata can't be used
    // directly because it mixes table schemas)
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = s.readStream.schema(schema).parquet(stage.toString)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("v"))
    val qn = "graft_stream_hourly"
    s.catalog.dropTempView(qn) // idempotent re-runs within a session
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qn).start()
    try q.processAllAvailable() finally q.stop()
    s.table(qn).select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("v"))
      .orderBy("hour", "event_type")
  }

  private val streamHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 4) AS v
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_stream_hourly", streamHourly, Some(streamHourlySql)),
    QueryDef("q_http_error_stats", httpErrorStats, Some(httpErrorStatsSql)),
    QueryDef("q_gdelt_scan", gdeltScan, Some(gdeltScanSql)),
    QueryDef("q_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("q_session_window", sessionWindowAgg, Some(sessionWindowSql)),
    QueryDef("q_hourly_rollup", hourlyRollup, Some(hourlyRollupSql))
  )
}
