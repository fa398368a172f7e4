package graft.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Exprs._

/** DWS province rollup — the reference's ProvinceStatsSqlApp:
  * 10 s tumbling event-time window × province dims, with
  * `count(distinct order_id)` and `sum(split_total_amount)`
  * (reference gmall-time/.../app/dws2/ProvinceStatsSqlApp.java:51-80).
  *
  * Spark-first restatement: orders(fact) joined to the two small
  * dimension tables with explicit `broadcast()` (dim join J3 collapses
  * from per-record async RPC to a broadcast hash join — reference
  * gmall-time/.../app/func/DimAsyncFunction.java:34-92), then a single
  * hash aggregate. `count(distinct)` goes through Catalyst's distinct
  * expand rewrite with partial aggregation — no driver-side state.
  * At 100 TB the only shuffle is the final aggregation on the
  * (window, province) key, which is low-cardinality.
  */
object ProvinceStats {
  /** province_id/province_name ↔ nation (FIXTURES.md §B). */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = Tables.nation(spark, dir)

    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(
        tumbleStart(col("o_orderdate"), 10).as("stt"),
        col("n_nationkey").cast("int").as("province_id"),
        col("n_name").as("province_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_ct"),
        sumCents(col("o_totalprice")).as("order_amount_cents"))
  }

  /** The reference's ACTUAL entry form is SQL text over registered
    * tables (ProvinceStatsSqlApp.java:51-80 assembles the query as a
    * string; the keyword app likewise) — the same statement here runs
    * through `spark.sql` over temp views. Semantically identical to
    * [[apply]] (same oracle), and it exercises the engine's SQL
    * surface: Catalyst plans SQL text and DataFrame calls into the
    * same physical plan, so everything PLANS.md audits holds for SQL
    * users too. */
  def sqlForm(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(
      """SELECT CAST(floor(unix_timestamp(o_orderdate) / 10) * 10 AS BIGINT) AS stt,
        |       CAST(n_nationkey AS INT) AS province_id,
        |       n_name AS province_name,
        |       count(DISTINCT o_orderkey) AS order_ct,
        |       sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS order_amount_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3""".stripMargin)
  }

  val oracle: String =
    """SELECT CAST(floor(epoch(o_orderdate)/10)*10 AS BIGINT) AS stt,
      |       CAST(n_nationkey AS INTEGER) AS province_id,
      |       n_name AS province_name,
      |       count(DISTINCT o_orderkey) AS order_ct,
      |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS order_amount_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY 1, 2, 3""".stripMargin
}
