package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query (so the DuckDB-oracle hash compare is
  * byte-stable):
  *   - money/quantity aggregates go through `decimal(18,2)` (exact sums,
  *     engine-independent) and are cast back to double at the end;
  *   - every result has an explicit ORDER BY on a deterministic key;
  *   - column names are aliased identically in Spark and oracle SQL.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** sum(cast(c as decimal(18,2))) cast back to double — exact, portable. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary over lineitem.
    */
  def entry(spark: SparkSession): DataFrame =
    q1PricingSummary(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  /** Q1: full-scan hash aggregate with map-side partial aggregation; the
    * shipdate filter is pushed to the parquet scan (PushedFilters). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = (c: String) => col(c).cast("decimal(18,2)")
    t(spark, dir).lineitem
      .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
          * (lit(1).cast("decimal(18,2)") + dec("l_tax")))
          .cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _)
  ) ++ graft.queries.RelationalQueries.defs ++ graft.queries.TextQueries.defs ++
    graft.queries.DedupQueries.defs ++ graft.queries.VectorQueries.defs ++
    graft.queries.EventsQueries.defs ++ graft.queries.RelationalQueries2.defs ++
    graft.queries.MultimodalQueries.defs ++ graft.queries.TrainingDataQueries.defs ++
    graft.queries.WarehouseQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.queries.RelationalQueries.oracles ++ graft.queries.TextQueries.oracles ++
    graft.queries.DedupQueries.oracles ++ graft.queries.VectorQueries.oracles ++
    graft.queries.EventsQueries.oracles ++ graft.queries.RelationalQueries2.oracles ++
    graft.queries.MultimodalQueries.oracles ++ graft.queries.TrainingDataQueries.oracles ++
    graft.queries.WarehouseQueries.oracles
}
