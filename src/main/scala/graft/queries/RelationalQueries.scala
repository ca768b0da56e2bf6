package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsofJoin, Relational}

/** Relational operator surface (SURVEY §2b): joins of every type, windows,
  * rollup/cube/grouping sets, set ops, string/date functions, range and
  * as-of joins. Every query has a DuckDB oracle; every aggregate over
  * doubles goes through decimal(18,2) (exact) and back to double; every
  * result carries an explicit deterministic ORDER BY.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private val one = lit(1).cast("decimal(18,2)")

  // q2: filter + projection — both pushed into the parquet scan.
  def filterPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).orders
      .filter($"o_orderstatus" === "F" &&
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  // q3: multi-way shuffle join star query — revenue per nation.
  // nation (25 rows) broadcasts; customer⋈orders⋈lineitem shuffle on keys.
  def joinRevenueByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  // q4: broadcast dimension join — revenue per brand.
  def broadcastJoinBrand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.lineitem
      .join(broadcast(t.part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(dsum($"l_extendedprice").as("total_price"),
        dsum($"l_quantity").as("total_qty"))
      .orderBy($"p_brand")
  }

  // q5: left outer join preserving zero-order customers.
  def leftJoinOrderCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("total_spent"))
      .orderBy($"c_custkey")
  }

  // q6: left-anti join (reference J1 / idempotent-insert filter):
  // customers with no event activity (non-degenerate on every sf).
  def antiJoinNoOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val active = t.events.select($"user_id".as("c_custkey")).distinct()
    Relational.idempotentAppend(t.customer, active, "c_custkey")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  // q7: left-semi join (EXISTS).
  def semiJoinWithOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val big = t.orders.filter($"o_totalprice" > 400000.0)
      .withColumnRenamed("o_custkey", "c_custkey")
    t.customer.join(big, Seq("c_custkey"), "left_semi")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  // q8: full outer join of two pre-aggregated sides.
  def fullOuterNationCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val c = t.customer.groupBy($"c_nationkey".as("nationkey")).agg(count(lit(1)).as("n_customers"))
    val p = t.supplier.groupBy($"s_nationkey".as("nationkey")).agg(count(lit(1)).as("n_suppliers"))
    c.join(p, Seq("nationkey"), "full_outer")
      .select($"nationkey", coalesce($"n_customers", lit(0L)).as("n_customers"),
        coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
      .orderBy($"nationkey")
  }

  // q9: per-group top-k via window rank (one shuffle, no global sort).
  def windowTopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    Relational.topKPerGroup(t.orders, Seq($"o_custkey"),
        Seq($"o_totalprice".desc, $"o_orderkey".asc), 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  // q10: running (cumulative) sum per customer — decimal-exact frame agg.
  def windowRunningSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).orders
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum(dec($"o_totalprice")).over(w).cast("double").as("running_total"))
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  // q11: lag — days since the customer's previous order.
  def windowLagDays(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables(s, dir).orders
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)).as("days_since_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  // q12: rollup with subtotal rows + grouping markers.
  def rollupQty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).lineitem
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  // q13: cube over two order dimensions.
  def cubeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).orders
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(dsum($"o_totalprice").as("total"), count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"o_orderstatus", $"o_orderpriority")
  }

  // q14: explicit GROUPING SETS via SQL.
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).lineitem.createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  // q15/16/17: set operations.
  def setUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val a = t.customer.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey".as("custkey"))
    val b = t.orders.filter($"o_totalprice" > 450000.0).select($"o_custkey".as("custkey"))
    a.union(b).distinct().orderBy($"custkey")
  }

  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val a = t.customer.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey".as("custkey"))
    val b = t.orders.select($"o_custkey".as("custkey"))
    a.intersect(b).orderBy($"custkey")
  }

  def setExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val a = t.customer.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
    val b = t.orders.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
    a.except(b).orderBy($"custkey")
  }

  // q18: distinct aggregates (exact).
  def distinctAggs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  // q19: global top-k — TakeOrderedAndProject, no full sort at scale.
  def topKGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).orders
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  // q20: string function battery over part.
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).part
      .select($"p_partkey",
        lower($"p_name").as("lname"),
        upper($"p_brand").as("ubrand"),
        substring($"p_type", 1, 5).as("type5"),
        length($"p_name").cast("long").as("name_len"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        split_part($"p_name", lit(" "), lit(1)).as("first_word"),
        regexp_replace($"p_name", "[aeiou]", "").as("novowels"),
        $"p_name".contains("a").as("has_a"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy($"p_partkey")
  }

  // q21: date/time function battery over orders.
  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).orders
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("plus30"),
        datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")).as("days_since_epoch0"),
        unix_timestamp($"o_orderdate").as("epoch_sec"))
      .orderBy($"o_orderkey")
  }

  // q22: conditional aggregation (CASE WHEN inside aggregates).
  def caseWhenAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).lineitem
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"l_returnflag" === "R", dec($"l_quantity")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("returned_qty"),
        count(when($"l_discount" > 0.05, 1)).as("n_high_discount"),
        (count(when($"l_tax" === 0.0, 1)).cast("double") / count(lit(1))).as("tax_free_ratio"))
      .orderBy($"l_linestatus")
  }

  // q23: range (non-equi) join predicate on top of the equi key.
  def rangeJoinShipWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.lineitem.join(t.orders,
        $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" >= $"o_orderdate" &&
        $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_shipped_60d"), dsum($"l_quantity").as("qty"))
      .orderBy($"o_orderpriority")
  }

  // q24: as-of join — latest purchase at-or-before each event, per user.
  // Scalable union+window formulation (see operators.AsofJoin).
  def asofLastPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir).events
    // Dedupe right side to one row per (user_id, ts) for deterministic ties.
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("purchase_id"))
    AsofJoin.asof(ev.select($"event_id", $"user_id", $"ts"), purchases,
        key = Seq("user_id"), tsCol = "ts", rightValueCols = Seq("purchase_id"))
      .select($"event_id", $"user_id", $"asof_purchase_id".as("purchase_id"))
      .orderBy($"event_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_filter_pushdown" -> filterPushdown _,
    "q3_join_revenue_by_nation" -> joinRevenueByNation _,
    "q4_broadcast_join_brand" -> broadcastJoinBrand _,
    "q5_left_join_order_counts" -> leftJoinOrderCounts _,
    "q6_anti_join_no_orders" -> antiJoinNoOrders _,
    "q7_semi_join_with_orders" -> semiJoinWithOrders _,
    "q8_full_outer_nation_counts" -> fullOuterNationCounts _,
    "q9_window_top_orders" -> windowTopOrders _,
    "q10_window_running_sum" -> windowRunningSum _,
    "q11_window_lag_days" -> windowLagDays _,
    "q12_rollup_qty" -> rollupQty _,
    "q13_cube_orders" -> cubeOrders _,
    "q14_grouping_sets" -> groupingSets _,
    "q15_set_union" -> setUnion _,
    "q16_set_intersect" -> setIntersect _,
    "q17_set_except" -> setExcept _,
    "q18_distinct_aggs" -> distinctAggs _,
    "q19_topk_global" -> topKGlobal _,
    "q20_string_funcs" -> stringFuncs _,
    "q21_date_funcs" -> dateFuncs _,
    "q22_case_when_agg" -> caseWhenAgg _,
    "q23_range_join_ship_window" -> rangeJoinShipWindow _,
    "q24_asof_last_purchase" -> asofLastPurchase _
  )

  val oracles: Map[String, String] = Map(
    "q2_filter_pushdown" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q3_join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_broadcast_join_brand" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q5_left_join_order_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q6_anti_join_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT user_id FROM events)
        |ORDER BY c_custkey""".stripMargin,
    "q7_semi_join_with_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q8_full_outer_nation_counts" ->
      """SELECT coalesce(c.nationkey, p.nationkey) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers, coalesce(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) p
        |USING (nationkey)
        |ORDER BY nationkey""".stripMargin,
    "q9_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q10_window_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q11_window_lag_days" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS INTEGER) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_rollup_qty" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q13_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n, CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q14_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q15_set_union" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0
        |ORDER BY custkey""".stripMargin,
    "q16_set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT SELECT o_custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q17_set_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "q18_distinct_aggs" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q19_topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q20_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        |  substring(p_type, 1, 5) AS type5, CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        |  contains(p_name, 'a') AS has_a, trim('  pad  ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q21_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch0,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q22_case_when_agg" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_qty,
        |  count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_high_discount,
        |  CAST(count(CASE WHEN l_tax = 0.0 THEN 1 END) AS DOUBLE) / count(*) AS tax_free_ratio
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q23_range_join_ship_window" ->
      """SELECT o_orderpriority, count(*) AS n_shipped_60d,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q24_asof_last_purchase" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id, p.purchase_id
        |FROM events e ASOF JOIN purchases p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin
  )
}
