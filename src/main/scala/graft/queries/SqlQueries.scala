package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SQL-string entry point + temp-view surface (SURVEY §2.1 S7/S8 — the
  * reference's load_dim_dates path runs string SQL over a registered
  * view), plus aggregate coverage that exercises the SQL parser route
  * rather than the DataFrame DSL.
  */
object SqlQueries {

  /** spark.sql over temp views: parse → analyze (view resolution) →
    * execute. Same text runs on the DuckDB side.
    */
  val qSqlView = Q(
    "q_sql_view",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Exact percentiles (SQL `percentile`, continuous interpolation —
    * DuckDB quantile_cont equivalent).
    */
  val qPercentiles = Q(
    "q_percentiles",
    // one percentile(…, array(…)) aggregate: the three quantiles share a
    // single value buffer per group instead of three copies
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("__ps"))
      .select(
        col("l_returnflag"),
        round(element_at(col("__ps"), 1), 4).as("p50"),
        round(element_at(col("__ps"), 2), 4).as("p90"),
        round(element_at(col("__ps"), 3), 4).as("p99"))
      .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Native gap-based session_window operator (the built-in twin of the
    * lag+running-sum sessionization in EventQueries) — grouped by
    * (user, session window), never global.
    */
  val qEventsSessionWindow = Q(
    "q_events_session_window",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us")),
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER w AS TIMESTAMP)
                            >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ), sessions AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged)
      SELECT user_id, epoch_us(CAST(min(ts) AS TIMESTAMP)) AS start_us,
             count(*) AS n_events
      FROM sessions GROUP BY user_id, session_seq
      ORDER BY user_id, start_us"""))

  val all: Seq[Q] = Seq(qSqlView, qPercentiles, qEventsSessionWindow)
}
