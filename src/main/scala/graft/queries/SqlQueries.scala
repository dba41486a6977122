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

  /** Per-group percentiles, sketch-anchored: `approx_percentile` (a
    * mergeable KLL-style buffer of bounded size) is the answer; exact
    * SQL `percentile` keeps a value→count map per group, and over a
    * near-unique column like l_extendedprice that buffer approaches the
    * whole column on one reducer — the one pattern that cannot survive
    * 100 TB. The oracle is a rank contract, and deliberately NOT the
    * exact-value-band variant: verifying each sketched value v needs
    * only `count(x ≤ v) / n` — itself a single bounded conditional
    * aggregation — so the verification harness is as scale-safe as the
    * operator it checks. approx_percentile at accuracy 10000 guarantees
    * rank error ≤ 1e-4; the asserted band is ±0.05, so a hash match
    * means the sketch genuinely landed (DuckDB emits literal TRUE per
    * group, the same boolean-contract as q_approx_quantiles /
    * q_hll_distinct).
    */
  val qPercentiles = Q(
    "q_percentiles",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
      // one sketch buffer per group for all three quantiles
      val approx = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
          .as("__ap"))
      // rank check: fraction of values ≤ v_p (and < v_p) brackets p.
      // The 3-row sketch relation broadcasts; the probe side is one
      // codegen'd conditional-sum pass, constant memory per group.
      val checks = ps.zipWithIndex.flatMap { case ((_, nm), i) =>
        val v = element_at(col("__ap"), i + 1)
        Seq(
          sum(when(col("l_extendedprice") <= v, 1L).otherwise(0L)).as(s"__le_$nm"),
          sum(when(col("l_extendedprice") < v, 1L).otherwise(0L)).as(s"__lt_$nm"),
        )
      } :+ count(lit(1)).as("__n")
      li.join(broadcast(approx), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(checks.head, checks.tail: _*)
        .select(col("l_returnflag") +: ps.map { case (p, nm) =>
          ((col(s"__le_$nm").cast("double") / col("__n") >= p - 0.05) &&
            (col(s"__lt_$nm").cast("double") / col("__n") <= p + 0.05))
            .as(s"${nm}_in_band")
        }: _*)
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS p99_in_band
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

  /** NULL-aware NOT IN vs NOT EXISTS — the classic three-valued-logic
    * trap, pinned cross-engine: one NULL in the NOT IN list makes the
    * predicate UNKNOWN for every probe row (n_not_in = 0), while the
    * equivalent-looking NOT EXISTS correlates per row and returns the
    * real complement. Spark plans the NOT IN as a NULL-AWARE anti
    * join (a different physical family from the plain left-anti of
    * q_join_anti); both engines must agree on both counts or the
    * engine's NOT IN is subtly wrong at any scale.
    */
  val qNotInNull = Q(
    "q_not_in_null",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                          ELSE o_custkey END
              FROM orders WHERE year(o_orderdate) = 1995)) AS n_not_in,
          (SELECT count(*) FROM customer c
           WHERE NOT EXISTS
             (SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey
                AND year(o_orderdate) = 1995
                AND o_orderkey % 100 <> 0)) AS n_not_exists""")
    },
    Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN
           (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                        ELSE o_custkey END
            FROM orders WHERE year(o_orderdate) = 1995)) AS n_not_in,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS
           (SELECT 1 FROM orders
            WHERE o_custkey = c.c_custkey
              AND year(o_orderdate) = 1995
              AND o_orderkey % 100 <> 0)) AS n_not_exists"""))

  val all: Seq[Q] = Seq(qSqlView, qPercentiles, qEventsSessionWindow,
    qNotInNull)
}
