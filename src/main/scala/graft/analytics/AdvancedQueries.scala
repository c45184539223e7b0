package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Third operator batch: subqueries (scalar + correlated), exact
  * percentiles, approximate distinct (HLL sketch), pivot, and array
  * aggregation — rounding out the SURVEY §2.2 aggregation/function rows.
  */
object AdvancedQueries {

  /** q32 — scalar subquery: parts above the global average price. The
    * single-row aggregate is broadcast (a 1-row cross join), never
    * recomputed per row. */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    val avgPrice = p.agg(avg(col("p_retailprice")).as("global_avg"))
    p.join(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("global_avg"))
      .select(col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  private val q32Sql =
    """SELECT p_partkey, p_retailprice
      |FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** q33 — correlated aggregate subquery (TPC-H Q17 shape): revenue of
    * small-quantity orders vs the part's own average, decorrelated into
    * a per-key aggregate join (what Catalyst does to the subquery form). */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_limit"))
    l.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_limit"))
      // exact decimal sum, then one double division: both engines divide
      // the identical double, so round-2 is stable (see q01 note)
      .agg(round(sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0, 2)
        .as("avg_yearly"))
  }

  private val q33Sql =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS pk, avg(l_quantity) * 0.2 AS qty_limit
      |      FROM lineitem GROUP BY l_partkey) p
      |  ON l.l_partkey = p.pk
      |WHERE l.l_quantity < p.qty_limit""".stripMargin

  /** q34 — exact interpolated percentiles (median / p90). */
  private def q34(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"))
      .orderBy(col("l_returnflag"))

  private val q34Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q35 — HLL approximate distinct next to the exact count. The raw
    * sketch value differs per engine, so the driver-checkable output is
    * the exact count plus the TOLERANCE VERDICT (|approx-exact| within
    * 5% of exact — HLL rsd is 2%, observed error ≤ 1.3%); the oracle
    * asserts the verdict must be true. */
  private def q35(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .select(col("l_linestatus"), col("exact_orders"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          col("exact_orders") * 0.05).as("within_tol"))
      .orderBy(col("l_linestatus"))

  private val q35Sql =
    """SELECT l_linestatus,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  true AS within_tol
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** q36 — pivot: order status columns per year (decimal sums, q01 note;
    * final DOUBLE cast gives both engines one canonical physical type —
    * Spark's DECIMAL(22,2) vs DuckDB's DECIMAL(38,2) hash differently in
    * the driver even when values are identical). */
  private def q36(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")))
      .select(col("yr"),
        col("F").cast("double").as("F"),
        col("O").cast("double").as("O"),
        col("P").cast("double").as("P"))
      .orderBy(col("yr"))

  private val q36Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS P
      |FROM orders
      |GROUP BY 1
      |ORDER BY yr""".stripMargin

  /** q37 — array aggregation: sorted distinct type list per brand.
    * The list is emitted as a joined string — the driver's pandas harness
    * cannot hash numpy arrays, so arrays are serialized at the output
    * boundary (operator semantics unchanged). */
  private def q37(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .groupBy(col("p_brand"))
      .agg(array_join(sort_array(collect_set(col("p_type"))), "|").as("types"),
        count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))

  private val q37Sql =
    """SELECT p_brand,
      |  array_to_string(list_sort(list(DISTINCT p_type)), '|') AS types,
      |  CAST(count(*) AS BIGINT) AS n_parts
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q42 — custom bounded-heap top-k aggregate
    * ([[graft.functions.TopKAggregate]]): per-priority top-3 order keys
    * by total price, computed with partial aggregation instead of a
    * window sort. Oracle = DuckDB's ordered-list slice; q19 is the
    * window-idiom control. */
  private def q42(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKAggregate
        .topKBy(col("o_totalprice"), col("o_orderkey"), 3).as("topk"))
      // serialized at the output boundary: the driver's pandas harness
      // cannot hash array cells
      .select(col("o_orderpriority"),
        array_join(col("topk").cast("array<string>"), "|").as("top_orders"))
      .orderBy(col("o_orderpriority"))

  private val q42Sql =
    """SELECT o_orderpriority,
      |  array_to_string((list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3], '|') AS top_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q45 — theta (non-equi inner) join: suppliers paired with customers
    * holding a strictly larger balance in the same nation. The nation
    * equi-key carries the shuffle; the inequality is the theta part. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
    val c = customer(s, d)
    sup.join(c, col("s_nationkey") === col("c_nationkey") &&
        col("c_acctbal") > col("s_acctbal"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_richer_customers"))
      .orderBy(col("s_suppkey"))
  }

  private val q45Sql =
    """SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_richer_customers
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
      |GROUP BY s_suppkey
      |ORDER BY s_suppkey""".stripMargin

  /** q46 — approximate quantile sketch (percentile_approx) next to the
    * exact percentile. Like q35, the sketch value is engine-specific, so
    * the checkable output is the exact median plus the tolerance verdict
    * (approx within 2% relative — observed ≤ 0.14% at accuracy 1000). */
  private def q46(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("exact_median"),
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_median"))
      .select(col("l_returnflag"), col("exact_median"),
        (abs(col("approx_median") - col("exact_median")) <=
          col("exact_median") * 0.02).as("within_tol"))
      .orderBy(col("l_returnflag"))

  private val q46Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
      |  true AS within_tol
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q60 — KMV distinct-count sketch ([[graft.functions.KmvSketch]])
    * next to the exact count: mergeable bounded state (k=64 longs per
    * group, map-side combinable) over the portable quadratic hash, so
    * unlike HLL (q35, range-checked only) the DuckDB oracle replays the
    * ESTIMATE itself bit-for-bit — hash, k-th order statistic, and the
    * one double divide. */
  private def q60(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"),
        round(graft.functions.KmvSketch.kmvDistinct(col("o_custkey"), 64), 6)
          .as("kmv_estimate"))
      .orderBy(col("o_orderpriority"))

  private val q60Sql: String = {
    val (ka, kb, kc) = graft.functions.KmvSketch.Consts
    s"""WITH x AS (
       |  SELECT DISTINCT o_orderpriority AS g,
       |    ((o_custkey % 1000000007) + 1000000007) % 1000000007 AS xm
       |  FROM orders),
       |h AS (
       |  SELECT DISTINCT g,
       |    ((($ka * ((xm * xm) % 1000000007) + $kb * xm + $kc) % 1000000007)
       |      + 1000000007) % 1000000007 AS hv
       |  FROM x),
       |r AS (SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rk FROM h),
       |est AS (
       |  SELECT g, count(*) AS nh, max(CASE WHEN rk = 64 THEN hv END) AS kth
       |  FROM r WHERE rk <= 64 GROUP BY g),
       |ex AS (
       |  SELECT o_orderpriority AS g, count(DISTINCT o_custkey) AS exact_distinct
       |  FROM orders GROUP BY 1)
       |SELECT ex.g AS o_orderpriority, CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       |  round(CASE WHEN est.nh < 64 THEN CAST(est.nh AS DOUBLE)
       |    ELSE 63.0 * 1000000007 / greatest(est.kth, 1) END, 6) AS kmv_estimate
       |FROM ex JOIN est USING (g)
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** q62 — statistical aggregates (corr / covar_samp / stddev_samp /
    * linear-regression slope+intercept / median) per return flag. The
    * co-moments are accumulated as EXACT decimal sums (2-dp money
    * values are exact in DECIMAL; sums and products stay exact), and
    * the closed-form statistics are then one identical double-precision
    * expression per engine — so unlike a streaming Welford/co-moment
    * implementation, whose low bits depend on merge order, both engines
    * compute bit-identical statistics from bit-identical aggregates.
    * Scale shape: one hash aggregate with full map-side partials; the
    * final formulas are literal column math on the 6 aggregate values.
    * StatsAggSpec pins this decimal path against Spark's built-in
    * `corr`/`covar_samp`/`regr_slope` within float tolerance. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val dx = col("l_quantity").cast("decimal(12,2)")
    val dy = col("l_extendedprice").cast("decimal(12,2)")
    val agg = lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(dx).as("sx"), sum(dy).as("sy"),
        sum(dx * dx).as("sxx"), sum(dy * dy).as("syy"),
        sum(dx * dy).as("sxy"),
        median(col("l_quantity")).as("med"))
    val n = col("n_rows").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    agg.select(col("l_returnflag"), col("n_rows"),
        stableRound6((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("corr_qty_price"),
        stableRound6((sxy - sx * sy / n) / (n - lit(1.0))).as("covar_qty_price"),
        stableRound6(sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))))
          .as("stddev_qty"),
        stableRound6(slope).as("regr_slope"),
        stableRound6((sy - slope * sx) / n).as("regr_intercept"),
        stableRound6(col("med")).as("median_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q62Sql =
    """WITH agg AS (
      |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS dsx,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS dsy,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS dsxx,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS dsyy,
      |    sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS dsxy,
      |    quantile_cont(l_quantity, 0.5) AS med
      |  FROM lineitem GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n_rows, CAST(n_rows AS DOUBLE) AS n, med,
      |    CAST(dsx AS DOUBLE) AS sx, CAST(dsy AS DOUBLE) AS sy,
      |    CAST(dsxx AS DOUBLE) AS sxx, CAST(dsyy AS DOUBLE) AS syy,
      |    CAST(dsxy AS DOUBLE) AS sxy
      |  FROM agg)
      |SELECT l_returnflag, n_rows,
      |  floor((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
      |    * 1000000.0 + 0.5)/1000000.0 AS corr_qty_price,
      |  floor((sxy - sx*sy/n) / (n - 1.0) * 1000000.0 + 0.5)/1000000.0 AS covar_qty_price,
      |  floor(sqrt((n*sxx - sx*sx) / (n * (n - 1.0))) * 1000000.0 + 0.5)/1000000.0 AS stddev_qty,
      |  floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1000000.0 + 0.5)/1000000.0 AS regr_slope,
      |  floor((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n
      |    * 1000000.0 + 0.5)/1000000.0 AS regr_intercept,
      |  floor(med * 1000000.0 + 0.5)/1000000.0 AS median_qty
      |FROM d
      |ORDER BY l_returnflag""".stripMargin

  /** q61 — time-interval RANGE window frames, through the SQL surface
    * (the frame spec only exists in SQL syntax): each event's trailing
    * 10-minute per-user activity (count + decimal value sum — decimal
    * because engines disagree on double summation order inside range
    * frames: DuckDB's segment tree vs Spark's sequential buffer), rolled
    * up to per-user burstiness. Peers at equal timestamps are included
    * by RANGE in both engines. */
  private def q61(s: SparkSession, d: String): DataFrame =
    SqlEntry.sql(s, """
      WITH w AS (
        SELECT user_id,
          count(*) OVER win AS roll_n,
          sum(CAST(value AS DECIMAL(12,2))) OVER win AS roll_v
        FROM graft_q61_events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
      )
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(max(roll_n) AS BIGINT) AS max_burst,
        CAST(max(roll_v) AS DOUBLE) AS max_roll_value
      FROM w GROUP BY user_id ORDER BY user_id""",
      "graft_q61_events" -> events(s, d))

  private val q61Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |w AS (
      |  SELECT user_id,
      |    count(*) OVER win AS roll_n,
      |    sum(CAST(value AS DECIMAL(12,2))) OVER win AS roll_v
      |  FROM ev
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts
      |    RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(roll_n) AS BIGINT) AS max_burst,
      |  CAST(max(roll_v) AS DOUBLE) AS max_roll_value
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q55 — the SQL entry point + LATERAL: every other query enters via
    * the DataFrame API; this one registers temp views and runs
    * `spark.sql` with a LATERAL correlated subquery (the per-row
    * derived table Spark 3.2+ supports), pinning that a reference user
    * who writes SQL, not Scala, gets the same engine: Catalyst
    * decorrelates the lateral aggregate into the same left-outer
    * agg-join a hand-written DataFrame plan would use. Views go through
    * [[SqlEntry]]: per-invocation unique names, dropped before the
    * builder returns, so concurrent builds never race on catalog state. */
  private def q55(s: SparkSession, d: String): DataFrame =
    SqlEntry.sql(s, """
      SELECT c.c_custkey, c.c_mktsegment, l.n_orders, l.top_price
      FROM graft_q55_customer c,
      LATERAL (
        SELECT count(o_orderkey) AS n_orders, max(o_totalprice) AS top_price
        FROM graft_q55_orders o WHERE o.o_custkey = c.c_custkey
      ) l
      WHERE c.c_acctbal > 9000
      ORDER BY c.c_custkey""",
      "graft_q55_customer" -> customer(s, d),
      "graft_q55_orders" -> orders(s, d))

  private val q55Sql =
    """SELECT c.c_custkey, c.c_mktsegment,
      |  CAST(l.n_orders AS BIGINT) AS n_orders, l.top_price
      |FROM customer c,
      |LATERAL (
      |  SELECT count(o_orderkey) AS n_orders, max(o_totalprice) AS top_price
      |  FROM orders o WHERE o.o_custkey = c.c_custkey
      |) l
      |WHERE c.c_acctbal > 9000
      |ORDER BY c.c_custkey""".stripMargin

  /** q58 — recursive CTE (new in Spark 4): each part key under 200
    * walks its ancestor chain in the implicit tree `parent(n) = n/4`
    * until the root, emitting per-node depth and a path checksum. The
    * recursion is data-driven iteration INSIDE one SQL statement — the
    * surface hierarchical queries (org charts, BOM explosions, graph
    * reachability) need; both engines run the same recursive shape
    * (only the integer-division operator differs: `div` vs `//`).
    * Depth is bounded (log₄ 200 ≈ 4), far under either engine's
    * recursion limit. */
  private def q58(s: SparkSession, d: String): DataFrame =
    SqlEntry.sql(s, """
      WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
        FROM graft_q58_part WHERE p_partkey < 200
        UNION ALL
        SELECT node, cur div 4 AS cur, depth + 1 FROM anc WHERE cur > 0)
      SELECT node, CAST(max(depth) AS INT) AS depth_to_root,
        CAST(sum(cur) AS BIGINT) AS path_sum
      FROM anc GROUP BY node ORDER BY node""",
      "graft_q58_part" -> part(s, d))

  private val q58Sql =
    """WITH RECURSIVE anc AS (
      |  SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
      |  FROM part WHERE p_partkey < 200
      |  UNION ALL
      |  SELECT node, cur // 4 AS cur, depth + 1 FROM anc WHERE cur > 0)
      |SELECT node, CAST(max(depth) AS INTEGER) AS depth_to_root,
      |  CAST(sum(cur) AS BIGINT) AS path_sum
      |FROM anc GROUP BY node ORDER BY node""".stripMargin

  /** q59 — UNPIVOT/melt (the inverse of q36's pivot): per-flag metrics
    * widened by aggregation, then melted to (flag, metric, value) rows —
    * the wide→long reshape feeding metric stores and plotting layers.
    * All three metrics cast to DOUBLE first (both engines require a
    * common value type); metric NAMES come from the column names, so
    * the two engines must agree on those too. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val agg = lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity")), 6).cast("double").as("sum_qty"),
        round(avg(col("l_extendedprice")), 6).cast("double").as("avg_price"),
        count(lit(1)).cast("double").as("n_items"))
    agg.unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("avg_price"), col("n_items")),
        variableColumnName = "metric", valueColumnName = "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  private val q59Sql =
    """WITH agg AS (
      |  SELECT l_returnflag,
      |    CAST(round(sum(l_quantity), 6) AS DOUBLE) AS sum_qty,
      |    CAST(round(avg(l_extendedprice), 6) AS DOUBLE) AS avg_price,
      |    CAST(count(*) AS DOUBLE) AS n_items
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, value
      |FROM agg UNPIVOT (value FOR metric IN (sum_qty, avg_price, n_items))
      |ORDER BY l_returnflag, metric""".stripMargin

  /** q63 — cumulative DISTINCT count over a window: each event carries
    * how many distinct event types its user has produced up to and
    * including it. Neither engine's window aggregate surface does this
    * directly at scale — Spark has no `count(DISTINCT) OVER` at all,
    * and a `collect_set` frame would hold every distinct value in the
    * window buffer — so both sides run the exact DECOMPOSITION:
    * mark each (user, type)'s FIRST occurrence with a row_number, then
    * running-sum the 0/1 marks. Two window passes over per-user
    * partitions, state = one long per row, no value set materialized
    * anywhere. The user-id filter bounds the dumped output; the
    * (ts, event_id) order key makes both passes tie-free. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d).filter(col("user_id") % 25 === 0)
    val first = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("__q63_first",
        when(row_number().over(first) === 1, 1L).otherwise(0L))
      .withColumn("distinct_types_so_far", sum(col("__q63_first")).over(cum))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("distinct_types_so_far"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q63Sql =
    """WITH ev AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events WHERE user_id % 25 = 0),
      |f AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM ev)
      |SELECT user_id, event_id, event_type,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS distinct_types_so_far
      |FROM f
      |ORDER BY user_id, event_id""".stripMargin

  /** q64 — ORDERED-SET string aggregation (`LISTAGG ... WITHIN GROUP`,
    * the SQL:2016 ordered-set aggregate Spark grew in 4.x): each
    * nation's top-5 suppliers by account balance concatenated in rank
    * order. The top-5 cut runs as a per-nation window (bounded groups),
    * so the listagg buffer holds at most 5 names per group — the
    * discipline that keeps ordered aggregation viable at scale (an
    * unbounded LISTAGG over a hot group is a single-buffer OOM, exactly
    * like an unbounded collect_list). DuckDB spells the same aggregate
    * string_agg(... ORDER BY ...); the (balance DESC, suppkey) order
    * key is tie-free so both engines must produce byte-equal strings. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier(s, d)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 5)
      .groupBy(col("s_nationkey"))
      .agg(expr(
        "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_acctbal DESC, s_suppkey)")
          .as("top_suppliers"),
        count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))
  }

  private val q64Sql =
    """WITH rk AS (
      |  SELECT s_nationkey, s_name, s_acctbal, s_suppkey,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey) AS rk
      |  FROM supplier)
      |SELECT s_nationkey,
      |  string_agg(s_name, ',' ORDER BY s_acctbal DESC, s_suppkey) AS top_suppliers,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM rk WHERE rk <= 5
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin

  /** q65 — inverse-distribution ORDERED-SET aggregates
    * (`PERCENTILE_DISC` / `PERCENTILE_CONT ... WITHIN GROUP`, SQL:2016):
    * per order priority, the discrete quartiles (actual row values —
    * audit-friendly, no interpolation artifacts) and the interpolated
    * median of the order totals. Both engines implement the standard's
    * semantics (disc = first value whose cumulative distribution ≥ p;
    * cont = linear interpolation), and the order key is a DECIMAL cast
    * of the price so cross-engine comparison is exact; the cont median
    * interpolates two decimals in double — one rounding guards the
    * boundary. Distributed shape: per-group sort inside a hash
    * aggregate, no global window. */
  private def q65(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("o_price", col("o_totalprice").cast("decimal(12,2)"))
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_price)")
          .cast("double").as("p25_disc"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_price)")
          .cast("double").as("p50_disc"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_price)")
          .cast("double").as("p90_disc"),
        round(expr(
          "percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(o_price AS DOUBLE))"),
          4).as("p50_cont"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val q65Sql =
    """SELECT o_orderpriority,
      |  CAST(percentile_disc(0.25) WITHIN GROUP
      |    (ORDER BY CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS p25_disc,
      |  CAST(percentile_disc(0.5) WITHIN GROUP
      |    (ORDER BY CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS p50_disc,
      |  CAST(percentile_disc(0.9) WITHIN GROUP
      |    (ORDER BY CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS p90_disc,
      |  round(percentile_cont(0.5) WITHIN GROUP
      |    (ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)), 4) AS p50_cont,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q66 — ANSI FILTER-clause aggregates (SQL:2003): per return flag,
    * plain, filtered, filtered-DECIMAL-sum and filtered-DISTINCT
    * aggregates in ONE grouping pass — the idiom that replaces N
    * self-joins or CASE pyramids with per-aggregate predicates (each
    * FILTER gates its own partial aggregation; map-side combine keeps
    * one shuffle). The sum runs in DECIMAL (exact, order-independent)
    * and casts to double only at the edge. */
  private def q66(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_heavy"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(14,2))) FILTER (WHERE l_discount > 0.05)")
          .cast("double").as("rev_disc"),
        expr("count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')")
          .as("supp_f"))
      .orderBy(col("l_returnflag"))

  private val q66Sql =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)))
      |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_disc,
      |  CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS supp_f
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q67 — the CUSTOM-EXPRESSION SQL surface end-to-end: the fused
    * codegen hash family ([[graft.functions.StringPolyHash]] /
    * TokenHashes / ShingleHashCombine) registered as SQL functions
    * ([[graft.functions.GraftFunctions]], same registrations
    * `GraftExtensions` installs permanently) and driven from PURE SQL
    * text over a temp view — fingerprints, token counts and 3-gram
    * shingle counts per language. The DuckDB oracle replays the
    * polynomial hash character-by-character, so a hash match proves the
    * SQL registration path evaluates the exact same codegen'd
    * arithmetic as the Column API. */
  private def q67(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    SqlEntry.sql(s,
      """WITH f AS (
        |  SELECT doc_id, lang, string_poly_hash(text) AS fp,
        |         size(token_hashes(text)) AS n_tok,
        |         size(shingle_hashes(token_hashes(text), 3)) AS n_sh
        |  FROM DOCS)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fp,
        |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        |       CAST(sum(n_sh) AS BIGINT) AS sum_sh,
        |       CAST(min(fp) AS BIGINT) AS min_fp
        |FROM f GROUP BY lang
        |ORDER BY lang""".stripMargin,
      "DOCS" -> documents(s, d))
  }

  private val q67Sql =
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text)+1),
      |        i -> CAST(ascii(text[i]) AS BIGINT))),
      |      (acc, ch) -> (acc*31 + ch) % 1000000007) AS fp,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |g AS (SELECT doc_id, lang, fp, n_tok,
      |    CASE WHEN n_tok >= 3 THEN n_tok - 2 ELSE 0 END AS n_sh FROM f)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fp,
      |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      |  CAST(sum(n_sh) AS BIGINT) AS sum_sh,
      |  CAST(min(fp) AS BIGINT) AS min_fp
      |FROM g GROUP BY lang
      |ORDER BY lang""".stripMargin

  val defs: Map[String, Q] = Map(
    "q67_sql_expression_surface" -> (q67 _),
    "q66_filtered_agg" -> (q66 _),
    "q65_inverse_distribution" -> (q65 _),
    "q64_listagg" -> (q64 _),
    "q63_window_distinct" -> (q63 _),
    "q60_kmv_distinct" -> (q60 _),
    "q61_interval_range_frame" -> (q61 _),
    "q62_stats_agg" -> (q62 _),
    "q59_unpivot" -> (q59 _),
    "q58_recursive_cte" -> (q58 _),
    "q55_sql_lateral" -> (q55 _),
    "q45_theta_join" -> (q45 _),
    "q46_approx_quantile" -> (q46 _),
    "q42_topk_aggregate" -> (q42 _),
    "q32_scalar_subquery" -> (q32 _),
    "q33_correlated_subquery" -> (q33 _),
    "q34_percentiles" -> (q34 _),
    "q35_approx_distinct" -> (q35 _),
    "q36_pivot" -> (q36 _),
    "q37_array_agg" -> (q37 _))

  val oracle: Map[String, String] = Map(
    "q67_sql_expression_surface" -> q67Sql,
    "q66_filtered_agg" -> q66Sql,
    "q65_inverse_distribution" -> q65Sql,
    "q64_listagg" -> q64Sql,
    "q63_window_distinct" -> q63Sql,
    "q60_kmv_distinct" -> q60Sql,
    "q61_interval_range_frame" -> q61Sql,
    "q62_stats_agg" -> q62Sql,
    "q59_unpivot" -> q59Sql,
    "q58_recursive_cte" -> q58Sql,
    "q55_sql_lateral" -> q55Sql,
    "q45_theta_join" -> q45Sql,
    "q46_approx_quantile" -> q46Sql,
    "q42_topk_aggregate" -> q42Sql,
    "q32_scalar_subquery" -> q32Sql,
    "q33_correlated_subquery" -> q33Sql,
    "q34_percentiles" -> q34Sql,
    "q35_approx_distinct" -> q35Sql,
    "q36_pivot" -> q36Sql,
    "q37_array_agg" -> q37Sql)
}
