package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Core relational operator inventory (SURVEY.md §2.2): scans, filters,
  * projections, every join flavor (inner / left outer / semi / anti /
  * cross), hash aggregation (plain, distinct, conditional, HAVING),
  * rollup / cube / grouping sets, and top-k.
  *
  * Oracle-parity rules used throughout this package:
  *   - LARGE money sums (>= ~1e8) run in exact DECIMAL with small-precision
  *     input casts (see q01's note) — identical values in both engines at
  *     any scale; SMALL-group double aggregates use `round(x, 6)` in BOTH
  *     engines (cross-engine float noise stays far below the 5e-7
  *     half-grid); identical-double boundary cases use the floor-based
  *     stableRound6 (package object);
  *   - DuckDB sums of integers return HUGEINT → oracle casts to BIGINT to
  *     match Spark's LongType;
  *   - every query ends in a total order (unique tiebreak key), with
  *     explicit NULLS FIRST in the oracle (DuckDB defaults NULLS LAST,
  *     Spark defaults nulls first for ASC).
  *
  * Scale posture (100 TB): all joins below are key-equi joins that Catalyst
  * plans as broadcast (bounded dims: region/nation/supplier) or shuffle
  * joins with AQE skew handling; aggregations are partial+final hash aggs
  * (map-side combine), so no operator materializes unbounded state on the
  * driver.
  */
object CoreQueries {

  /** q01 — TPC-H Q1-shaped pricing summary: scan+filter+hash agg+sort.
    * Reference analog: the full-file pass of CSVIngest.java:60-86 promoted
    * to a real aggregation pipeline.
    *
    * Money SUMS run in DECIMAL: at sf0.1 the sums reach ~3e9 where the
    * cross-engine float-summation-order difference (~1e-6) exceeds the
    * round-6 half-grid (5e-7) and rounding flips. Inputs are on exact
    * decimal grids (prices 2dp, discount/tax 2dp), so casting to DECIMAL
    * before summing makes both engines compute the IDENTICAL exact
    * value at any scale. Averages stay double (error shrinks by 1/n). */
  private def q01(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val qty = col("l_quantity").cast("decimal(12,2)")
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val oneMinusDisc = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")
    val onePlusTax = lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(4,2)")
    li.filter(col("l_shipdate") <= tsLit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * oneMinusDisc).cast("double").as("sum_disc_price"),
        sum(price * oneMinusDisc * onePlusTax).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — projection + selective filter; Catalyst pushes both into the
    * parquet scan (PushedFilters + pruned ReadSchema). */
  private def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount").between(0.05, 0.07))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_discount BETWEEN 0.05 AND 0.07
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03 — TPC-H Q3-shaped shipping priority: 3-way join + agg + top-k.
    * customer is the small side at this scale; at 100 TB AQE picks the
    * join strategy, so no hint is hard-coded on the customer join. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < tsLit("1999-01-01 00:00:00"))
    val l = lineitem(s, d).filter(col("l_shipdate") > tsLit("1999-01-01 00:00:00"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        to_date(col("o_orderdate")).as("orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT o_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
      |  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** q04 — left-semi join (EXISTS): orders having any heavy lineitem. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val l = lineitem(s, d).filter(col("l_quantity") > 49)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q05 — TPC-H Q5-shaped 6-way join (region⋈nation⋈customer⋈orders⋈
    * lineitem⋈supplier). region/nation are O(10) rows at any scale →
    * explicit broadcast; the big-side joins shuffle on their keys. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") === "ASIA")
    val n = nation(s, d)
    val c = customer(s, d)
    val o = orders(s, d)
      .filter(col("o_orderdate") >= tsLit("1996-01-01 00:00:00") &&
        col("o_orderdate") < tsLit("1998-01-01 00:00:00"))
    val l = lineitem(s, d)
    val sup = supplier(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q05Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q06 — TPC-H Q6-shaped filter-only scalar aggregate (fully pushed
    * predicates, single-row result). */
  private def q06(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 6).as("revenue"))

  private val q06Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q07 — left-anti join (NOT EXISTS): customers that never placed an
    * urgent order. (Unfiltered "never ordered" is vacuously empty on this
    * data — every customer has orders — so the anti-join runs against a
    * selective subset to make the check non-trivial.) */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  private val q07Sql =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q08 — TPC-H Q13-shaped left OUTER join + double aggregation
    * (orders-per-customer distribution, null-preserving count). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    val per = c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
    per.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q08Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q09 — distinct aggregation (exact COUNT DISTINCT, two at once →
    * Spark expand + two-phase agg). */
  private def q09(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private val q09Sql =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q10 — TPC-H Q10-shaped returned-item revenue ranking, top 20. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).filter(col("l_returnflag") === "R")
    val o = orders(s, d)
    val c = customer(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** q11 — aggregation + HAVING filter on the aggregate. */
  private def q11(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(round(sum(col("l_quantity")), 6).as("sum_qty"))
      .filter(col("sum_qty") > 900)
      .orderBy(col("l_partkey"))

  private val q11Sql =
    """SELECT l_partkey, round(sum(l_quantity), 6) AS sum_qty
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING round(sum(l_quantity), 6) > 900
      |ORDER BY l_partkey""".stripMargin

  /** q12 — conditional aggregation (CASE inside SUM, TPC-H Q12 shape). */
  private def q12(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_count"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  private val q12Sql =
    """SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count,
      |  CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** q13 — ROLLUP hierarchy totals. */
  private def q13(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 6).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q13Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  round(sum(l_quantity), 6) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** q14 — CUBE over two dimensions (decimal total: see q01 note). */
  private def q14(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q14Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** q15 — GROUPING SETS (SQL surface; Spark DataFrame API has no direct
    * grouping-sets builder, so this goes through spark.sql). */
  private def q15(s: SparkSession, d: String): DataFrame =
    SqlEntry.sql(s,
      """SELECT o_orderstatus, o_orderpriority, count(1) AS n
        |FROM orders_q15
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
      "orders_q15" -> orders(s, d))

  private val q15Sql =
    """SELECT o_orderstatus, o_orderpriority, CAST(count(1) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  val defs: Map[String, Q] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_scan_filter_project" -> (q02 _),
    "q03_shipping_priority" -> (q03 _),
    "q04_semi_join_exists" -> (q04 _),
    "q05_region_revenue" -> (q05 _),
    "q06_forecast_revenue" -> (q06 _),
    "q07_anti_join" -> (q07 _),
    "q08_outer_join_custdist" -> (q08 _),
    "q09_distinct_agg" -> (q09 _),
    "q10_returned_revenue" -> (q10 _),
    "q11_having" -> (q11 _),
    "q12_conditional_agg" -> (q12 _),
    "q13_rollup" -> (q13 _),
    "q14_cube" -> (q14 _),
    "q15_grouping_sets" -> (q15 _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_scan_filter_project" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_semi_join_exists" -> q04Sql,
    "q05_region_revenue" -> q05Sql,
    "q06_forecast_revenue" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_outer_join_custdist" -> q08Sql,
    "q09_distinct_agg" -> q09Sql,
    "q10_returned_revenue" -> q10Sql,
    "q11_having" -> q11Sql,
    "q12_conditional_agg" -> q12Sql,
    "q13_rollup" -> q13Sql,
    "q14_cube" -> q14Sql,
    "q15_grouping_sets" -> q15Sql)
}
