package graft.ads

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RollupsSpec extends SparkSpec {
  import spark.implicits._

  test("pivotSegment: one row per nation, declared segment columns") {
    val out = Rollups.pivotSegment(spark, Sf)
    assert(out.columns.toSeq === "n_name" +: Rollups.Segments)
    val rows = out.collect()
    assert(rows.length === 25)
    // every cell non-null (coalesced) and totals add up to |customer|
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total === spark.read.parquet(s"$Sf/customer.parquet").count())
  }

  test("gmvRollup: three levels in one aggregate, totals consistent") {
    val out = Rollups.gmvRollup(spark, Sf).collect()
    val leaves = out.filter(_.getLong(2) == 0L)
    val years = out.filter(_.getLong(2) == 1L)
    val grand = out.filter(_.getLong(2) == 3L)
    assert(grand.length === 1)
    assert(leaves.map(_.getLong(3)).sum === grand.head.getLong(3))
    assert(years.map(_.getLong(3)).sum === grand.head.getLong(3))
    assert(years.forall(_.isNullAt(1)), "year subtotals have NULL month")
  }

  test("gmvRollup plan: one Expand, not one job per level") {
    val plan = Rollups.gmvRollup(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup must compile to Expand:\n$plan")
  }

  test("gmvMa7: RANGE frame shrinks across date gaps") {
    val out = Rollups.gmvMa7(spark, Sf).collect()
    assert(out.head.getLong(3) === 1L, "first day has a 1-day window")
    assert(out.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 7L))
    // verify every window against an explicit recompute
    val daily = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val d = r.getLong(0)
      val win = (d - 6 to d).flatMap(daily.get)
      assert(r.getLong(3) === win.length.toLong)
      assert(r.getLong(2) === win.sum / win.length)
    }
  }

  test("priceMedian: lower-discrete median, no raw-order sort") {
    val out = Rollups.priceMedian(spark, Sf)
    val rows = out.collect()
    assert(rows.length === 5)
    // cross-check one segment against a driver-side exact recompute
    val seg = rows.head.getString(0)
    val vals = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[Long].collect().sorted
    val expected = vals((vals.length + 1) / 2 - 1)
    assert(rows.head.getLong(2) === expected)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(c_mktsegment"),
      s"median window must be segment-keyed:\n$plan")
  }
  test("gmvCube: all four grouping sets, marginals consistent") {
    import org.apache.spark.sql.functions._
    val out = Rollups.gmvCube(spark, Sf).collect()
    val gids = out.map(_.getLong(2)).toSet
    assert(gids === Set(0L, 1L, 2L, 3L),
      "cube emits detail, both marginals, and the grand total")
    val grand = out.filter(_.getLong(2) == 3L)
    assert(grand.length === 1)
    val detailGmv = out.filter(_.getLong(2) == 0L).map(_.getLong(3)).sum
    assert(grand.head.getLong(3) === detailGmv,
      "grand total equals the sum of detail cells")
    // the priority marginal (gid=2: yr null, prio set) is what ROLLUP
    // cannot express — it must aggregate across every year
    val prioMarg = out.filter(r => r.getLong(2) == 2L).map(_.getLong(3)).sum
    assert(prioMarg === detailGmv, "column marginal covers all mass")
  }

  test("gmvGroupingSets: ONLY the two declared marginals, both total") {
    val out = Rollups.gmvGroupingSets(spark, Sf).collect()
    // gid 1 = (yr) set (prio grouped away), gid 2 = (prio) set — no
    // detail (0), no grand total (3): the minimal-statement property
    assert(out.map(_.getLong(2)).toSet === Set(1L, 2L),
      "grouping sets must emit exactly the declared marginals")
    val yrGmv = out.filter(_.getLong(2) == 1L).map(_.getLong(3)).sum
    val prioGmv = out.filter(_.getLong(2) == 2L).map(_.getLong(3)).sum
    assert(yrGmv === prioGmv, "both marginals cover the same mass")
    // Expand fans out × the DECLARED set count, not 2^dims
    val plan = Rollups.gmvGroupingSets(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"grouping sets compile to Expand:\n$plan")
  }

  test("metricsMelt: 3 long rows per day, values equal the wide aggregate") {
    val out = Rollups.metricsMelt(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val wide = graft.Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) DIV 86400000").as("day"),
        col("user_id"), col("event_type"))
      .groupBy("day")
      .agg(count(lit(1)).as("pv"),
        count_distinct(col("user_id")).as("uv"),
        count_distinct(col("event_type")).as("types"))
      .collect()
    assert(wide.nonEmpty && out.size === wide.length * 3,
      "melt emits one row per (day, metric)")
    wide.foreach { r =>
      val d = r.getLong(0)
      assert(out((d, "pv")) === r.getLong(1))
      assert(out((d, "uv")) === r.getLong(2))
      assert(out((d, "types")) === r.getLong(3))
    }
    // the melt itself is a LOCAL Expand sitting ABOVE every exchange
    // (pre-order plan print: the unpivot Expand must appear before any
    // Exchange line — a multi-distinct aggregate's Expand would print
    // BELOW its exchange, which is exactly the hazard this query's
    // two-level shape avoids)
    val planStr = Rollups.metricsMelt(spark, Sf)
      .queryExecution.executedPlan.toString
    val (ex, exch) = (planStr.indexOf("Expand"), planStr.indexOf("Exchange"))
    assert(ex >= 0, s"unpivot must compile to Expand:\n$planStr")
    assert(exch < 0 || ex < exch,
      s"the melt's Expand must be LOCAL (above every exchange):\n$planStr")
  }

  test("metricsMelt: null user_id / event_type excluded from the distincts") {
    // the sf corpora carry no nulls in these columns, so the board
    // oracle can't see the divergence this guards: the two-level
    // device's OUTER count must count the KEY (null group → 0), not
    // rows, to match count(DISTINCT x)'s null exclusion
    import java.sql.Timestamp
    val dir = java.nio.file.Files
      .createTempDirectory("graft_melt_nulls").toString
    val t = Timestamp.valueOf("2024-01-02 03:00:00")
    Seq(
      (1L, t, Some(7L), Some("view"), 0.0, "{}"),
      (2L, t, Some(7L), Some("cart"), 0.0, "{}"),
      (3L, t, None: Option[Long], None: Option[String], 0.0, "{}"),
      (4L, t, Some(8L), Some("view"), 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Rollups.metricsMelt(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("pv") === 4L, "pv counts ALL rows, nulls included")
    assert(out("uv") === 2L, "uv excludes the null user_id group")
    assert(out("types") === 2L, "types excludes the null event_type group")
  }
}
