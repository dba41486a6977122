package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}
import graft.Tables

/** Scalar-function families beyond the reference's F1-F12 — string,
  * date/time, array/higher-order, and the remaining join variants. All
  * per-row map work (codegen'd built-ins), oracle-checked cell by cell.
  */
object FunctionQueries {

  /** String function suite over part names/types. */
  val qStringFuncs = Q(
    "q_string_funcs",
    (s, d) => Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("up"),
        lower(col("p_type")).as("lo"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        instr(col("p_type"), "BRUSHED").as("pos"),
        translate(col("p_brand"), "#", "-").as("tr"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"),
        reverse(col("p_brand")).as("rev"),
        substring(col("p_type"), 1, 5).as("head5"),
        length(trim(col("p_type"))).as("trimlen"))
      .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey,
             upper(p_brand) AS up, lower(p_type) AS lo,
             concat_ws('|', p_brand, p_type) AS joined,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             CAST(strpos(p_type, 'BRUSHED') AS INTEGER) AS pos,
             translate(p_brand, '#', '-') AS tr,
             regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel,
             reverse(p_brand) AS rev,
             substring(p_type, 1, 5) AS head5,
             CAST(length(trim(p_type)) AS INTEGER) AS trimlen
      FROM part ORDER BY p_partkey"""))

  /** Date/time function suite over order dates. */
  val qDateFuncs = Q(
    "q_date_funcs",
    (s, d) => Tables.orders(s, d)
      .withColumn("od", col("o_orderdate").cast(DateType))
      .select(
        col("o_orderkey"),
        date_add(col("od"), 30).as("plus30d"),
        add_months(col("od"), 1).as("plus1m"),
        trunc(col("od"), "MM").as("month_start"),
        last_day(col("od")).as("month_end"),
        quarter(col("od")).cast(IntegerType).as("q"),
        dayofyear(col("od")).cast(IntegerType).as("doy"),
        datediff(col("od"), lit("1995-01-01").cast(DateType)).cast(IntegerType).as("days_since"))
      .orderBy(col("o_orderkey")),
    Some("""
      -- note: od + 30 (int days) instead of a second INTERVAL literal —
      -- DuckDB 1.0 unifies all INTERVAL constants in one query
      SELECT o_orderkey,
             CAST(od + 30 AS DATE) AS plus30d,
             CAST(od + INTERVAL 1 MONTH AS DATE) AS plus1m,
             CAST(date_trunc('month', od) AS DATE) AS month_start,
             last_day(od) AS month_end,
             CAST(quarter(od) AS INTEGER) AS q,
             CAST(dayofyear(od) AS INTEGER) AS doy,
             CAST(date_diff('day', DATE '1995-01-01', od) AS INTEGER) AS days_since
      FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
      ORDER BY o_orderkey"""))

  /** Array / higher-order function suite over generated int arrays
    * (exact arithmetic — no float folds). Array-typed outputs are
    * serialized with array_join: the driver's pandas comparator cannot
    * hash raw array cells, so the oracle contract is string columns.
    */
  val qArrayFuncs = Q(
    "q_array_funcs",
    (s, d) => Tables.embeddings(s, d)
      .withColumn("arr", sequence(lit(1), (col("vec_id") % 10 + 1).cast(IntegerType)))
      .select(
        col("vec_id"),
        size(col("arr")).as("n"),
        array_max(col("arr")).as("mx"),
        array_min(col("arr")).as("mn"),
        aggregate(col("arr"), lit(0), (a, x) => a + x).as("total"),
        array_join(reverse(col("arr")), ",").as("rev"),
        array_join(slice(col("arr"), 2, 3), ",").as("mid"),
        array_contains(col("arr"), 3).as("has3"),
        array_join(transform(col("arr"), x => x * 2), ",").as("doubled"),
        array_join(filter(col("arr"), x => x % 2 === 0), ",").as("evens"))
      .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id,
             CAST(len(arr) AS INTEGER) AS n,
             list_max(arr) AS mx, list_min(arr) AS mn,
             CAST(list_sum(arr) AS INTEGER) AS total,
             coalesce(array_to_string(list_reverse(arr), ','), '') AS rev,
             coalesce(array_to_string(arr[2:4], ','), '') AS mid,
             list_contains(arr, 3) AS has3,
             coalesce(array_to_string(list_transform(arr, x -> x * 2), ','), '') AS doubled,
             coalesce(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS evens
      FROM (SELECT vec_id, CAST(range(1, CAST(vec_id % 10 + 2 AS INTEGER)) AS INTEGER[]) AS arr
            FROM embeddings)
      ORDER BY vec_id"""))

  /** Left-semi join (EXISTS as a join operator, not a subquery). */
  val qJoinSemi = Q(
    "q_join_semi",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  /** Full outer join with NULLs on both sides. */
  val qJoinFull = Q(
    "q_join_full",
    (s, d) => {
      val bigCust = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_nationkey"))
      val counts = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_pending"))
      bigCust.join(counts, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("o_custkey"), col("n_pending"))
        .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
    },
    Some("""
      SELECT c_custkey, o_custkey, n_pending
      FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 9000) c
      FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_pending FROM orders
                       WHERE o_orderstatus = 'P' GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      ORDER BY c_custkey NULLS FIRST, o_custkey NULLS FIRST"""))

  /** Explicit cross join (tiny × tiny). */
  val qJoinCross = Q(
    "q_join_cross",
    (s, d) => {
      val r1 = Tables.region(s, d).select(col("r_name").as("a"))
      val r2 = Tables.region(s, d).select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy(col("a"), col("b"))
    },
    Some("""
      SELECT r1.r_name AS a, r2.r_name AS b
      FROM region r1 CROSS JOIN region r2
      ORDER BY a, b"""))

  val all: Seq[Q] = Seq(
    qStringFuncs, qDateFuncs, qArrayFuncs, qJoinSemi, qJoinFull, qJoinCross)
}
