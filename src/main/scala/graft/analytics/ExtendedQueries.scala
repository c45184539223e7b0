package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.GlobalRank

/** Second operator batch (SURVEY.md §2.2): window functions (rank /
  * running / lag / ntile / percent_rank), set operations, string / regex /
  * date / JSON scalar functions, cross + range joins, math builtins.
  *
  * Same oracle-parity discipline as [[CoreQueries]]; additionally every
  * window rank-like value is cast to INTEGER in the oracle (DuckDB ranks
  * are BIGINT, Spark's are int) and every window frame is written
  * explicitly so both engines compute the same frame.
  */
object ExtendedQueries {

  /** q16 — rank() with real ties within partitions. */
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    part(s, d)
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 5)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rnk"))
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  private val q16Sql =
    """SELECT p_brand, p_partkey, p_retailprice, rnk
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |        CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS INTEGER) AS rnk
      |      FROM part)
      |WHERE rnk <= 5
      |ORDER BY p_brand, rnk, p_partkey""".stripMargin

  /** q17 — running sum over an explicit ROWS frame (deterministic
    * accumulation order in both engines). */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 6))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q17Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q18 — lag(): days between consecutive orders per customer. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev_date")).as("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q18Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS INTEGER) AS gap_days
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q19 — per-group top-k via row_number (the scalable top-k idiom: no
    * global sort, one shuffle on the partition key). */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  private val q19Sql =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |        CAST(row_number() OVER (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** q20 — ntile + percent_rank distribution stats over customer
    * balances, on the DISTRIBUTED rank path: the stock
    * `Window.orderBy(...)` form funnels every row through a single task
    * (the classic global-window scale-killer — kept as the
    * idiom-contrast control in GlobalRankSpec), so the registered query
    * derives both stats from [[graft.operators.GlobalRank]]'s
    * range-partitioned two-pass rank instead. The sort key ends in the
    * unique c_custkey, so the global row_number IS the SQL rank() and
    * percent_rank = (rank-1)/(total-1) exactly; the row total rides the
    * broadcast offsets table — no extra pass. */
  private def q20(s: SparkSession, d: String): DataFrame = {
    val keys = Seq(col("c_acctbal"), col("c_custkey"))
    GlobalRank.withGlobalNtile(customer(s, d), keys, 4,
        rankCol = "__rk", tileCol = "balance_quartile",
        keepTotalAs = Some("__total"))
      .select(col("c_custkey"), col("balance_quartile"),
        round(when(col("__total") === 1, lit(0.0))
          .otherwise((col("__rk") - 1).cast("double") /
            (col("__total") - 1).cast("double")), 6).as("pct_rank"))
      .orderBy(col("c_custkey"))
  }

  private val q20Sql =
    """SELECT c_custkey,
      |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile,
      |  round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pct_rank
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  private def orderYearKeys(s: SparkSession, d: String, year: Int): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit(f"$year-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit(f"${year + 1}-01-01 00:00:00")))
      .select(col("o_custkey"))

  /** q56 — multiset set ops (INTERSECT ALL / EXCEPT ALL): per-key
    * multiplicities must survive (min(countA, countB) and
    * max(countA - countB, 0) respectively), which the q21/q22 set forms
    * dedup away. Output aggregates the multisets back to (op, key, n)
    * so the oracle pins every multiplicity, not just membership. */
  private def q56(s: SparkSession, d: String): DataFrame = {
    val a = orderYearKeys(s, d, 1995)
    val b = orderYearKeys(s, d, 1996)
    val i = a.intersectAll(b).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val e = a.exceptAll(b).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    i.unionByName(e)
      .select(col("op"), col("o_custkey"), col("n"))
      .orderBy(col("op"), col("o_custkey"))
  }

  private val q56Sql =
    """WITH a AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
      |b AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      |i AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
      |e AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
      |SELECT 'intersect_all' AS op, o_custkey, CAST(count(*) AS BIGINT) AS n
      |FROM i GROUP BY o_custkey
      |UNION ALL
      |SELECT 'except_all' AS op, o_custkey, CAST(count(*) AS BIGINT) AS n
      |FROM e GROUP BY o_custkey
      |ORDER BY op, o_custkey""".stripMargin

  /** q21 — INTERSECT (set semantics, dedup). */
  private def q21(s: SparkSession, d: String): DataFrame =
    orderYearKeys(s, d, 1995).intersect(orderYearKeys(s, d, 1996))
      .orderBy(col("o_custkey"))

  private val q21Sql =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** q22 — EXCEPT. */
  private def q22(s: SparkSession, d: String): DataFrame =
    orderYearKeys(s, d, 1995).except(orderYearKeys(s, d, 1996))
      .orderBy(col("o_custkey"))

  private val q22Sql =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |EXCEPT
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin

  /** q23 — UNION with dedup across two predicates. */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(col("o_totalprice") > 450000).select(col("o_orderkey"))
      .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
      .distinct()
      .orderBy(col("o_orderkey"))
  }

  private val q23Sql =
    """SELECT o_orderkey FROM orders WHERE o_totalprice > 450000
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  /** q24 — string builtins: substring/upper/length + LIKE-class filter. */
  private def q24(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").like("%e%"))
      .groupBy(upper(substring(col("p_name"), 1, 1)).as("letter"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(length(col("p_name"))), 6).as("avg_name_len"))
      .orderBy(col("letter"))

  private val q24Sql =
    """SELECT upper(substring(p_name, 1, 1)) AS letter,
      |  CAST(count(*) AS BIGINT) AS n_parts,
      |  round(avg(length(p_name)), 6) AS avg_name_len
      |FROM part
      |WHERE p_name LIKE '%e%'
      |GROUP BY upper(substring(p_name, 1, 1))
      |ORDER BY letter""".stripMargin

  /** q25 — regexp_extract: trailing word of the part name. */
  private def q25(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("last_word"))

  private val q25Sql =
    """SELECT regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM part
      |GROUP BY regexp_extract(p_name, '([a-z]+)$', 1)
      |ORDER BY last_word""".stripMargin

  /** q26 — date part extraction (year/quarter/month). */
  private def q26(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"))
      .orderBy(col("yr"), col("qtr"))

  private val q26Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, qtr""".stripMargin

  /** q27 — date_trunc to month boundaries. */
  private def q27(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 6).as("qty"))
      .orderBy(col("ship_month"))

  private val q27Sql =
    """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(sum(l_quantity), 6) AS qty
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY ship_month""".stripMargin

  /** q28 — JSON extraction from the events.props payload column. */
  private def q28(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        round(avg(col("k")), 6).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val q28Sql =
    """SELECT event_type,
      |  CAST(count(k) AS BIGINT) AS n_with_k,
      |  round(avg(k), 6) AS avg_k,
      |  max(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q29 — cross join (explicit cartesian on bounded inputs). */
  private def q29(s: SparkSession, d: String): DataFrame = {
    val r1 = region(s, d).select(col("r_name").as("name_a"))
    val r2 = region(s, d).select(col("r_name").as("name_b"))
    r1.crossJoin(r2).orderBy(col("name_a"), col("name_b"))
  }

  private val q29Sql =
    """SELECT r1.r_name AS name_a, r2.r_name AS name_b
      |FROM region r1 CROSS JOIN region r2
      |ORDER BY name_a, name_b""".stripMargin

  /** q30 — range (interval) self-join: same-user event pairs within 60s,
    * via the binned interval join ([[graft.operators.RangeJoin]]) — the
    * join key is (user_id, 60s-bin), so bucket sizes stay bounded at any
    * scale instead of quadratic-per-user. */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"))
    graft.operators.RangeJoin
      .pairsWithin(e, key = "user_id", idCol = "event_id", tsCol = "ts", seconds = 60,
        carryLeft = Seq("event_type"))
      .groupBy(col("event_type_a").as("first_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("first_type"))
  }

  private val q30Sql =
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events)
      |SELECT e1.event_type AS first_type, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM ev e1 JOIN ev e2
      |  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
      | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECONDS
      |GROUP BY e1.event_type
      |ORDER BY first_type""".stripMargin

  /** q43 — RANGE window frame: per-customer rolling 30-day order total.
    * Both engines order by epoch seconds with a numeric RANGE frame so
    * the frame semantics are identical. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-2592000L, Window.currentRow)
    orders(s, d)
      .withColumn("epoch_s",
        // o_orderdate is TIMESTAMP_NTZ; cast is identity under the UTC session TZ
        unix_micros(col("o_orderdate").cast("timestamp")) / lit(1000000L))
      .withColumn("rolling_30d", round(sum(col("o_totalprice")).over(w), 6))
      .select(col("o_custkey"), col("o_orderkey"), col("rolling_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q43Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 1000000
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 6) AS rolling_30d
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q31 — math builtins (sqrt/ln/ceil) under aggregation. sqrt/ln sums
    * are not on a decimal grid, so they round at 4 (error ~1e-11 ≪ 5e-5
    * boundary margin). */
  private def q31(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(sqrt(col("l_quantity"))), 4).as("sqrt_qty_sum"),
        round(avg(log(col("l_extendedprice"))), 6).as("avg_ln_price"),
        sum(ceil(col("l_discount") * 10)).as("ceil_disc_sum"))
      .orderBy(col("l_returnflag"))

  private val q31Sql =
    """SELECT l_returnflag,
      |  round(sum(sqrt(l_quantity)), 4) AS sqrt_qty_sum,
      |  round(avg(ln(l_extendedprice)), 6) AS avg_ln_price,
      |  CAST(sum(CAST(ceil(l_discount * 10) AS BIGINT)) AS BIGINT) AS ceil_disc_sum
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q54 — IGNORE NULLS window navigation: per customer in order-date
    * order, carry forward the most recent finished-order price
    * (`last(..., ignoreNulls)` — the gap-filling idiom), plus the
    * partition's 2nd-ever order price (`nth_value`). The nullable
    * column is synthesized (price visible only on status 'F') so the
    * skip-nulls path is actually exercised on every partition. Frames
    * are bounded ROWS frames over a unique (date, key) order — fully
    * deterministic in both engines; no arithmetic, so no rounding. */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("f_price",
        when(col("o_orderstatus") === "F", col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"),
        last(col("f_price"), ignoreNulls = true).over(w).as("last_f_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q54Sql =
    """SELECT o_custkey, o_orderkey,
      |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS)
      |    OVER w AS last_f_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val defs: Map[String, Q] = Map(
    "q56_set_ops_all" -> (q56 _),
    "q54_ignore_nulls" -> (q54 _),
    "q16_window_rank" -> (q16 _),
    "q17_window_running_sum" -> (q17 _),
    "q18_window_lag" -> (q18 _),
    "q19_topk_per_group" -> (q19 _),
    "q20_ntile_percent_rank" -> (q20 _),
    "q21_set_intersect" -> (q21 _),
    "q22_set_except" -> (q22 _),
    "q23_set_union" -> (q23 _),
    "q24_string_funcs" -> (q24 _),
    "q25_regexp_extract" -> (q25 _),
    "q26_date_parts" -> (q26 _),
    "q27_date_trunc" -> (q27 _),
    "q28_json_extract" -> (q28 _),
    "q29_cross_join" -> (q29 _),
    "q30_range_join" -> (q30 _),
    "q31_math_funcs" -> (q31 _),
    "q43_range_frame_window" -> (q43 _))

  val oracle: Map[String, String] = Map(
    "q56_set_ops_all" -> q56Sql,
    "q54_ignore_nulls" -> q54Sql,
    "q16_window_rank" -> q16Sql,
    "q17_window_running_sum" -> q17Sql,
    "q18_window_lag" -> q18Sql,
    "q19_topk_per_group" -> q19Sql,
    "q20_ntile_percent_rank" -> q20Sql,
    "q21_set_intersect" -> q21Sql,
    "q22_set_except" -> q22Sql,
    "q23_set_union" -> q23Sql,
    "q24_string_funcs" -> q24Sql,
    "q25_regexp_extract" -> q25Sql,
    "q26_date_parts" -> q26Sql,
    "q27_date_trunc" -> q27Sql,
    "q28_json_extract" -> q28Sql,
    "q29_cross_join" -> q29Sql,
    "q30_range_join" -> q30Sql,
    "q31_math_funcs" -> q31Sql,
    "q43_range_frame_window" -> q43Sql)
}
