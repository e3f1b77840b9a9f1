package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.2): scans, filters,
  * aggregations, joins (inner/left/semi/anti/full), sort/limit top-k,
  * set ops, scalar functions.
  *
  * Conventions shared with the DuckDB oracles (driver compare hashes
  * values after sorting columns by name):
  *  - every query ends in a deterministic ORDER BY (unique tie-break key);
  *  - double aggregates are `round`ed so cross-engine summation-order ulp
  *    noise cannot flip a hash;
  *  - date/timestamp output columns are cast to string.
  *
  * Scale posture (100 TB): every query is a declarative plan — filters and
  * projections reach the parquet scan via Catalyst pushdown; dimension
  * sides of joins (region/nation/supplier/customer at TPC-H ratios) are
  * explicitly `broadcast` so the fact table never shuffles for them.
  */
object RelQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q1-style pricing summary: scan → filter → groupBy → agg → sort. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_extendedprice"), 6).as("avg_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Global top-k by sort: largest orders. */
  def q02TopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 2).as("total_price"),
        $"o_orderdate".cast("date").cast("string").as("order_date"))
      .orderBy($"total_price".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q3-style shipping priority: 3-way join, grouped revenue, top-k.
    * customer is the small side → broadcast; orders⋈lineitem shuffles on
    * the join key only after both are filtered. */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1997-06-30").cast("timestamp_ntz")
    val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val o = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
    val l = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .select($"l_orderkey", $"revenue",
        $"o_orderdate".cast("date").cast("string").as("order_date"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Semi-join (EXISTS): orders having a high-quantity lineitem, counted
    * by priority. */
  def q04PriorityCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val big = t(s, dir, "lineitem").filter($"l_quantity" >= 48).select($"l_orderkey")
    o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q5-style local supplier volume: 6-way join with broadcast dims. */
  def q05LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = t(s, dir, "region").filter($"r_name" === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
    val l = t(s, dir, "lineitem")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q6-style forecast revenue: pure scan+filter+agg — the whole
    * predicate reaches the parquet reader. */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
              $"l_shipdate" < lit("1997-01-01").cast("timestamp_ntz") &&
              $"l_discount" >= 0.02 && $"l_discount" <= 0.04 &&
              $"l_quantity" < 24)
      .agg(round(coalesce(sum($"l_extendedprice" * $"l_discount"), lit(0.0)), 2).as("revenue"))
  }

  /** Anti-join (NOT EXISTS): customers with no recent order, by segment. */
  def q07CustomersNoOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp_ntz"))
      .select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left outer join with null handling: per-customer order stats. */
  def q08CustomerOrderStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(
        count($"o_orderkey").as("n_orders"),
        round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy($"total_spent".desc, $"c_custkey")
      .limit(100)
  }

  /** Full outer join over distinct key sets: nation presence. */
  def q09NationPresence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cn = t(s, dir, "customer").select($"c_nationkey".cast("int").as("ck")).distinct()
    val sn = t(s, dir, "supplier").select($"s_nationkey".cast("int").as("sk")).distinct()
    cn.join(sn, $"ck" === $"sk", "full_outer")
      .select(
        coalesce($"ck", $"sk").as("nationkey"),
        $"ck".isNotNull.as("has_customer"),
        $"sk".isNotNull.as("has_supplier"))
      .orderBy($"nationkey")
  }

  /** TPC-H Q10-style returned items: revenue lost to returns per customer. */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_nationkey")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_top_orders" -> (q02TopOrders _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_priority_count" -> (q04PriorityCount _),
    "q05_local_supplier_volume" -> (q05LocalSupplierVolume _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q07_customers_no_orders" -> (q07CustomersNoOrders _),
    "q08_customer_order_stats" -> (q08CustomerOrderStats _),
    "q09_nation_presence" -> (q09NationPresence _),
    "q10_returned_items" -> (q10ReturnedItems _),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
        |FROM orders
        |ORDER BY total_price DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q04_priority_count" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04
        |  AND l_quantity < 24""".stripMargin,
    "q07_customers_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q08_customer_order_stats" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 100""".stripMargin,
    "q09_nation_presence" ->
      """SELECT coalesce(ck, sk) AS nationkey,
        |  ck IS NOT NULL AS has_customer,
        |  sk IS NOT NULL AS has_supplier
        |FROM (SELECT DISTINCT CAST(c_nationkey AS INT) AS ck FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT CAST(s_nationkey AS INT) AS sk FROM supplier) s
        |ON ck = sk
        |ORDER BY nationkey""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
  )
}
