package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Tables._

/** Fourth batch: deeper TPC-H shapes — agg-on-agg scalar subqueries
  * (Q15), ratio-of-conditional-sums market share (Q8), subquery + anti
  * join (Q22) — plus schema-full JSON parsing (from_json vs q28's
  * path extraction). */
object TpchShapeQueries {

  /** q57 — Q9 shape (product-line profit): five-way join filtered by a
    * part-name pattern, profit = revenue − cost (retail price stands in
    * for the absent partsupp supply cost), aggregated by supplier
    * nation × order year. Money math follows the q01 decimal
    * convention: exact DECIMAL products/sums, one DOUBLE cast at the
    * output boundary — per-(nation, year) groups reach ~1e7, where a
    * reordered double sum could flip the 6th decimal. */
  private def q57(s: SparkSession, d: String): DataFrame = {
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val oneMinusDisc = lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)")
    val cost = col("p_retailprice").cast("decimal(12,2)") *
      col("l_quantity").cast("decimal(12,2)") * lit(0.05).cast("decimal(3,2)")
    lineitem(s, d)
      .join(part(s, d).filter(col("p_name").like("%a%")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(price * oneMinusDisc - cost).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q57Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |           - CAST(p_retailprice AS DECIMAL(12,2))
      |             * CAST(l_quantity AS DECIMAL(12,2))
      |             * CAST(0.05 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%a%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** q38 — Q15 shape: supplier(s) achieving the maximum revenue.
    * The max is itself an aggregate over an aggregate. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("mr"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q38Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** q39 — Q8 shape: per-year share of AMERICA-customer revenue served
    * by NATION_1 suppliers (ratio of conditional sum to total sum). */
  private def q39(s: SparkSession, d: String): DataFrame = {
    val custNation = nation(s, d).select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val suppNation = nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val amer = region(s, d).filter(col("r_name") === "AMERICA")
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(amer), col("n_regionkey") === col("r_regionkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_1",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("mkt_share"))
      .orderBy(col("yr"))
  }

  private val q39Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  round(sum(CASE WHEN sn.n_name = 'NATION_1'
      |                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
      |      / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY 1
      |ORDER BY yr""".stripMargin

  /** q40 — Q22 shape: well-funded customers (balance above the global
    * average) who never placed an urgent order, aggregated per nation. */
  private def q40(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val avgBal = c.agg(avg(col("c_acctbal")).as("ab"))
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 6).as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  private val q40Sql =
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
      |  round(sum(c_acctbal), 6) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** q41 — schema-full JSON parsing: from_json into a typed struct
    * (vs q28's string-path extraction). */
  private def q41(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    events(s, d)
      .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n_k_values"),
        sum(col("k")).as("k_sum"))
      .orderBy(col("event_type"))
  }

  private val q41Sql =
    """SELECT event_type,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_k_values,
      |  CAST(sum(k) AS BIGINT) AS k_sum
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q44 — NOT IN subquery (null-aware anti join; keys are non-null here
    * so the semantics match a plain anti join, but Catalyst must still
    * plan the null-aware variant): orders from customers outside the
    * BUILDING segment. */
  private def q44(s: SparkSession, d: String): DataFrame =
    SqlEntry.sql(s,
      """SELECT o_orderpriority, count(1) AS n
        |FROM orders_q44
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer_q44 WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      "orders_q44" -> orders(s, d),
      "customer_q44" -> customer(s, d))

  private val q44Sql =
    """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n
      |FROM orders
      |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val defs: Map[String, Q] = Map(
    "q44_not_in_subquery" -> (q44 _),
    "q38_top_supplier" -> (q38 _),
    "q39_market_share" -> (q39 _),
    "q40_rich_idle_customers" -> (q40 _),
    "q41_from_json_struct" -> (q41 _),
    "q57_profit_by_nation_year" -> (q57 _))

  val oracle: Map[String, String] = Map(
    "q44_not_in_subquery" -> q44Sql,
    "q38_top_supplier" -> q38Sql,
    "q39_market_share" -> q39Sql,
    "q40_rich_idle_customers" -> q40Sql,
    "q41_from_json_struct" -> q41Sql,
    "q57_profit_by_nation_year" -> q57Sql)
}
