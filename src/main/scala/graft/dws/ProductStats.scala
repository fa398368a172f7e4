package graft.dws

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Exprs._

/** DWS product stats (A2–A4): the reference unions seven fact streams
  * into `ProductStats` partials keyed by sku_id, reduces them in a 10 s
  * tumbling window — carrying HashSets of order ids for exact windowed
  * distinct counts — then enriches with four dims (reference
  * gmall-time/.../app/dws2/ProductStatsApp.java:257-411,
  * sets :304-313).
  *
  * Spark-first: the carried-HashSet distinct count is exactly what
  * Catalyst's `countDistinct` expand/partial-aggregate rewrite does,
  * minus the hand-rolled state (ProductStats.java:77-87 →
  * `countDistinct("order_id")`). Conditional metrics (refunds, good
  * comments) are `when(...)` counters over the same scan instead of
  * extra unioned streams. Dims join AFTER aggregation (J4) — at 100 TB
  * that means broadcasting dims against the small aggregate, not the
  * raw fact.
  *
  * Metric mapping onto lineitem: click_ct↔line count, order_ct↔exact
  * distinct orders, order_amount↔extendedprice, refund_*↔returnflag='R'
  * lines, good_comment_ct↔linestatus='F' (appraise '1201' analog,
  * GmallConstant.java:23).
  */
object ProductStats {
  /** Pre-dim aggregate keyed by (window, sku) — the full 13-metric
    * ProductStats shape (app/bean2/ProductStats.java:24-91), each
    * reference metric mapped onto a lineitem column/flag:
    * click↔line count, favor↔returnflag 'A', cart↔quantity of 'N'
    * lines, order_ct↔exact distinct orders, payment↔discounted
    * amount, paid_order_ct↔distinct 'F' orders, refund↔'R' lines,
    * comment↔high-tax lines, good_comment↔'F' lines.
    *
    * Shape: TWO-LEVEL aggregation instead of `countDistinct` in the
    * metric list. With distincts present, Catalyst rewrites the whole
    * aggregate through a 3-way `expand` (one projection per distinct
    * group + one for the 11 plain metrics) — 3× the shuffle rows, all
    * metric columns riding along (measured 4.8 s vs 2.4 s at sf0.1).
    * Grouping first by (window, sku, order) makes both distincts plain
    * counts/sums at the second level — order_ct = count of per-order
    * rows, paid_order_ct = sum of the per-order max-'F' flag — and
    * every other metric distributes over the finer key. Both levels
    * stay partial+final; the second shuffles only the already-reduced
    * (window, sku, order) frame. */
  def aggregated(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // ONE exchange for both aggregation levels (r20, guide §2.4):
      // hash(stt, sku_id) clusters correctly for the finer
      // (stt, sku_id, l_orderkey) key too (partition exprs ⊂ group
      // keys), so EnsureRequirements inserts no further exchange for
      // either groupBy — before, the plan paid two full-width
      // shuffles back to back (29.3 MB + 27.7 MB at sf0.1) although
      // the first level barely reduces (596k of 600k rows survive:
      // a lineitem row is already nearly unique per (date, sku,
      // order), which also made the map-side partial agg pure
      // overhead). No explicit partition count — AQE still sizes it.
      .repartition(tumbleStart(col("l_shipdate"), 10),
        col("l_partkey"))
      .groupBy(
        tumbleStart(col("l_shipdate"), 10).as("stt"),
        col("l_partkey").as("sku_id"),
        col("l_orderkey"))
      .agg(
        count(lit(1)).as("click_ct"),
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("favor_ct"),
        sum(when(col("l_returnflag") === "N", cents(col("l_quantity")))
          .otherwise(0L)).as("cart_ct_x100"),
        sum(cents(col("l_quantity"))).as("order_sku_num_x100"),
        sumCents(col("l_extendedprice")).as("order_amount_cents"),
        // exact decimal arithmetic at scale 4 (a double->decimal(2) cast
        // here hits half-cent ties that Spark HALF_UP and DuckDB round
        // differently), then x10000 -> BIGINT at the output boundary —
        // integer minor units render identically in every engine, and
        // the aggregate becomes a plain map-side-combinable long sum
        sum((money(col("l_extendedprice")) *
            (lit(java.math.BigDecimal.ONE).cast("decimal(4,2)") -
             col("l_discount").cast("decimal(4,2)")) * 10000)
          .cast("long")).as("payment_amount_tenk"),
        max(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("paid_f"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("refund_order_ct"),
        sum(when(col("l_returnflag") === "R", cents(col("l_extendedprice")))
          .otherwise(0L)).as("refund_amount_cents"),
        sum(when(col("l_tax") > 0.05, 1L).otherwise(0L)).as("comment_ct"),
        sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("good_comment_ct"))
      .groupBy(col("stt"), col("sku_id"))
      .agg(
        sum(col("click_ct")).as("click_ct"),
        sum(col("favor_ct")).as("favor_ct"),
        sum(col("cart_ct_x100")).as("cart_ct_x100"),
        count(lit(1)).as("order_ct"),
        sum(col("order_sku_num_x100")).as("order_sku_num_x100"),
        sum(col("order_amount_cents")).as("order_amount_cents"),
        sum(col("payment_amount_tenk")).as("payment_amount_tenk"),
        sum(col("paid_f")).as("paid_order_ct"),
        sum(col("refund_order_ct")).as("refund_order_ct"),
        sum(col("refund_amount_cents")).as("refund_amount_cents"),
        sum(col("comment_ct")).as("comment_ct"),
        sum(col("good_comment_ct")).as("good_comment_ct"))

  /** A2 + J4: aggregate, then broadcast-join the sku dim. */
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    // J4: the join input is the post-aggregation frame (one row per
    // (window, sku)); part scales linearly with sf, so no forced
    // broadcast — AQE picks the strategy from runtime sizes.
    aggregated(spark, dir)
      .join(p, col("sku_id") === p("p_partkey"))
      .select(
        col("stt"), col("sku_id"),
        col("p_name").as("sku_name"), col("p_brand").as("tm_id"),
        col("click_ct"), col("favor_ct"), col("cart_ct_x100"),
        col("order_ct"), col("order_sku_num_x100"), col("order_amount_cents"),
        col("payment_amount_tenk"), col("paid_order_ct"),
        col("refund_order_ct"), col("refund_amount_cents"),
        col("comment_ct"), col("good_comment_ct"))
  }

  /** Bench-mode variant for the 100-TB distinct-count hazard (SURVEY
    * §7.5): exact windowed countDistinct carries (window, sku, order)
    * triples through a double shuffle; approx_count_distinct (HLL++)
    * keeps one sketch per group — same query shape, rows-only checked
    * (the estimate is not oracle-comparable). */
  def approx(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    Tables.lineitem(spark, dir)
      .groupBy(
        tumbleStart(col("l_shipdate"), 10).as("stt"),
        col("l_partkey").as("sku_id"))
      .agg(
        count(lit(1)).as("click_ct"),
        // rsd 0.05 (the HLL++ default): sketch size grows ~1/rsd² —
        // 0.02 meant ~2.7k registers PER GROUP riding the shuffle
        // (measured 4.0 s vs 1.3 s at sf0.1 for zero accuracy need:
        // per-(window,sku) cardinalities are small enough that the
        // sketch stays in exact sparse mode either way)
        approx_count_distinct(col("l_orderkey"), 0.05).as("order_ct"),
        sumCents(col("l_extendedprice")).as("order_amount_cents"))
      .join(p, col("sku_id") === p("p_partkey"))
      .select(col("stt"), col("sku_id"), col("p_name").as("sku_name"),
        col("click_ct"), col("order_ct"), col("order_amount_cents"))
  }

  val oracle: String =
    """SELECT CAST(floor(epoch(l_shipdate)/10)*10 AS BIGINT) AS stt,
      |       l_partkey AS sku_id,
      |       p_name AS sku_name,
      |       p_brand AS tm_id,
      |       count(*) AS click_ct,
      |       CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS favor_ct,
      |       CAST(sum(CASE WHEN l_returnflag = 'N'
      |                     THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS cart_ct_x100,
      |       count(DISTINCT l_orderkey) AS order_ct,
      |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS order_sku_num_x100,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS order_amount_cents,
      |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS payment_amount_tenk,
      |       count(DISTINCT CASE WHEN l_linestatus = 'F' THEN l_orderkey END) AS paid_order_ct,
      |       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS refund_order_ct,
      |       CAST(sum(CASE WHEN l_returnflag = 'R'
      |                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS refund_amount_cents,
      |       CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS comment_ct,
      |       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS good_comment_ct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2, 3, 4""".stripMargin
}
