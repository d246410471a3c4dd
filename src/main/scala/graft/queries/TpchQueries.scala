package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Classic scan/filter/agg/join/window queries over the driver corpus —
  * the reference's aggregation/rollup surface (SURVEY.md §2.6 A1–A6)
  * expressed on the TPC-H-ish tables so the DuckDB oracle can check them
  * directly. Monetary aggregates are rounded to 2dp so double summation
  * ulps can't flip the hash compare.
  */
object TpchQueries {

  /** q01_pricing_summary — scan+filter+groupBy rollup (TPC-H Q1 shape;
    * maps A1/A5 per-source counter rollups).
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02_order_revenue_topn — 3-way join + agg + deterministic top-N
    * (TPC-H Q3 shape; exercises broadcast of the customer dim).
    */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, dir)
    val l = lineitem(s, dir)
    // round-7 (guide §3): apply the selective dimension FIRST — the
    // broadcast customer filter shrinks orders ~5x before the big
    // lineitem join instead of after it, so the surviving orders side
    // is small enough for AQE to broadcast and lineitem reaches its
    // partial aggregation without shuffling the dropped rows
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"))
    l.join(oc, l("l_orderkey") === oc("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q02Sql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** q03_nation_rollup — snowflake join region⋈nation⋈customer⋈orders,
    * per-nation order stats (broadcastable dims broadcast explicitly).
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val n = nation(s, dir); val r = region(s, dir)
    val c = customer(s, dir); val o = orders(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("r_name", "n_name")
  }

  private val q03Sql =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q04_semi_anti — left-semi + left-anti existence probes
    * (url_was_attempted / pending-clean J5 shape, session_hist.py:310-347):
    * customers with orders vs customers without.
    */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir); val o = orders(s, dir)
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("bucket"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("bucket"))
    withO.unionByName(withoutO)
      .groupBy("bucket").agg(count(lit(1)).as("n"),
        sum(col("c_custkey")).as("key_sum"))
      .orderBy("bucket")
  }

  private val q04Sql =
    """SELECT bucket, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum
      |FROM (
      |  SELECT c_custkey, 'has_orders' AS bucket FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |  UNION ALL
      |  SELECT c_custkey, 'no_orders' AS bucket FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q05_window_rank — per-customer order ranking + running revenue
    * (W2 FIFO-order / seq-assignment shape, SURVEY.md §2.7).
    */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .withColumn("running_price",
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("int").as("rn"),
        col("o_orderkey"), col("running_price"))
      .orderBy("o_custkey", "rn")
  }

  private val q05Sql =
    """SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, running_price FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_price
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_order_revenue_topn", q02, Some(q02Sql)),
    QueryDef("q03_nation_rollup", q03, Some(q03Sql)),
    QueryDef("q04_semi_anti", q04, Some(q04Sql)),
    QueryDef("q05_window_rank", q05, Some(q05Sql))
  )
}
