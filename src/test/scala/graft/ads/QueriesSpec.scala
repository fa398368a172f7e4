package graft.ads

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("gmvGrowth: lag chain and sign-split ppm equal a driver recompute") {
    val daily = Queries.gmvGrowth(spark, Sf)
      .select("dt", "gmv_cents", "prev_cents", "diff_cents", "growth_ppm")
      .collect()
    assert(daily.length > 2)
    assert(daily.head.isNullAt(2) && daily.head.isNullAt(4),
      "first day has no base")
    daily.sliding(2).foreach { case Array(p, c) =>
      assert(c.getLong(2) === p.getLong(1), "prev is literally lag(gmv)")
      val diff = c.getLong(1) - c.getLong(2)
      assert(c.getLong(3) === diff)
      val exp = if (diff >= 0) 1000000L * diff / c.getLong(2)
        else -(1000000L * -diff / c.getLong(2))
      assert(c.getLong(4) === exp, s"truncate-toward-zero ppm at ${c.getString(0)}")
    }
    // the corpus is not monotone: both signs must occur or the
    // sign-split branch is untested
    val signs = daily.drop(1).map(r => r.getLong(3) >= 0).distinct
    assert(signs.length === 2, "need both up and down days")
  }

  test("rfm: bins are balanced quintiles and 1 = best orientation") {
    val out = Queries.rfm(spark, Sf)
      .select("custkey", "recency_days", "frequency", "monetary_cents",
        "r_bin", "f_bin", "m_bin", "segment")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val n = out.length
    Seq[(String, Array[Long])](
      ("r", out.map(_._5)), ("f", out.map(_._6)), ("m", out.map(_._7)))
      .foreach { case (name, bins) =>
        val byBin = bins.groupBy(identity).view.mapValues(_.length)
        assert(byBin.keySet === (1L to 5L).toSet, s"$name covers 1..5")
        // ntile balance: sizes differ by at most 1
        assert(byBin.values.max - byBin.values.min <= 1,
          s"$name quintiles balanced over $n customers")
      }
    // orientation: a bin-1 recency customer is at least as recent as
    // any bin-5 one; bin-1 monetary spends at least as much as bin-5
    val r1max = out.filter(_._5 === 1L).map(_._2).max
    val r5min = out.filter(_._5 === 5L).map(_._2).min
    assert(r1max <= r5min, "r_bin 1 = most recent")
    val m1min = out.filter(_._7 === 1L).map(_._4).min
    val m5max = out.filter(_._7 === 5L).map(_._4).max
    assert(m1min >= m5max, "m_bin 1 = highest spend")
    out.foreach { case (_, _, _, _, r, f, m, seg) =>
      assert(seg === r * 100 + f * 10 + m)
    }
  }

  test("topBrandRegion: exactly the 3 best brands per region, ranked") {
    val out = Queries.topBrandRegion(spark, Sf)
      .as[(String, String, Long, Long)].collect()
    val regions = out.map(_._1).distinct
    assert(regions.length === 5, "all 5 TPC-H regions present")
    out.groupBy(_._1).foreach { case (region, rows) =>
      assert(rows.map(_._4).sorted.toSeq === Seq(1L, 2L, 3L), s"$region ranks")
      // ranked by revenue desc with brand tiebreak
      val byRank = rows.sortBy(_._4)
      byRank.sliding(2).foreach { case Array(hi, lo) =>
        assert(hi._3 > lo._3 || (hi._3 === lo._3 && hi._2 < lo._2))
      }
    }
    // rank-3 revenue really is the 3rd best: recompute one region fully
    val region = regions.head
    val full = graft.Tables.lineitem(spark, Sf)
      .join(graft.Tables.supplier(spark, Sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.nation(spark, Sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, Sf).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .join(graft.Tables.part(spark, Sf), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(graft.func.Exprs.sumCents(col("l_extendedprice")).as("rev"))
      .as[(String, Long)].collect()
      .sortBy { case (b, r) => (-r, b) }.take(3).map(_._2)
    assert(out.filter(_._1 === region).sortBy(_._4).map(_._3).toSeq
      === full.toSeq)
  }

  test("copurchase: array pair expansion equals a self-join recompute") {
    val it = graft.Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey").distinct()
    val ref = it.as("a").join(it.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= Queries.CopurchaseMinSupport)
      .as[(Long, Long, Long)].collect()
      .sortBy { case (pa, pb, s) => (-s, pa, pb) }
      .take(Queries.CopurchaseTopC).zipWithIndex
      .map { case ((pa, pb, s), i) => (i + 1L, pa, pb, s) }
    val got = Queries.copurchase(spark, Sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === ref.toSeq)
  }

  test("copurchase: no self-join, top-k is take-ordered (plan shape)") {
    val plan = Queries.copurchase(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must not be a full sort exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"pair expansion must be array-side, not a fact self-join:\n$plan")
  }

  test("rfm: customer-sized windows are keyed, not single-partition") {
    // Since r20 each quintile step checkpoints its input (the plan-
    // doubling fix), so the COMPOSED query's final plan only shows the
    // last step — assert the keyed-window property on the device
    // itself, per rank key, exactly as rfm invokes it.
    import spark.implicits._
    val base = (1L to 50L).map(i =>
        (i, i % 7, i % 5, i * 100L, i % 3))
      .toDF("custkey", "recency_days", "frequency", "monetary_cents",
        "_mband")
    for ((k, asc, within) <- Seq(
        ("recency_days", true, Seq($"custkey")),
        ("frequency", false, Seq($"custkey")),
        ("_mband", false, Seq($"monetary_cents".desc, $"custkey")))) {
      val plan = Queries.rfmQuintile(base, k, asc, within, "bin")
        .queryExecution.executedPlan.toString
      // the rank runs under a key-partitioned window (the curriculum
      // distributed-rank device); the only single-partition windows
      // are the tiny per-key offsets frames behind broadcasts
      assert(plan.contains(s"hashpartitioning($k"),
        s"$k rank must run under a key-partitioned window:\n$plan")
      assert(!plan.contains("ntile("),
        s"quintiles must be positional arithmetic, not global ntile:\n$plan")
    }
    // and the composed query stays ntile-free end to end (the last
    // step's window is the one visible past the checkpoints)
    val full = Queries.rfm(spark, Sf).queryExecution.executedPlan.toString
    assert(full.contains("hashpartitioning(_mband"),
      s"final quintile must stay key-partitioned:\n$full")
    assert(!full.contains("ntile("),
      s"quintiles must be positional arithmetic, not global ntile:\n$full")
  }
}
