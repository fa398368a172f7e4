package graft.func

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: exact Morton interleave") {
    val out = Seq((15L, 0L), (0L, 15L), (255L, 255L), (0L, 0L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    assert(out(0) === 85L)     // 0b01010101: a in even bits
    assert(out(1) === 170L)    // 0b10101010: b in odd bits
    assert(out(2) === 65535L)  // all 16 bits set
    assert(out(3) === 0L)
  }

  test("zorderStats: buckets carry narrow envelopes on BOTH dimensions") {
    val stats = ZOrder.zorderStats(spark, Sf).collect()
    assert(stats.nonEmpty)
    val li = graft.Tables.lineitem(spark, Sf)
      .agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
    val partRange = (li.getLong(1) - li.getLong(0)).max(1L)
    val suppRange = (li.getLong(3) - li.getLong(2)).max(1L)
    def avgWidth(lo: Int, hi: Int): Double =
      stats.map(r => (r.getLong(hi) - r.getLong(lo)).toDouble).sum / stats.length
    // the locality property: the average per-bucket envelope is far
    // narrower than the global range on BOTH columns at once — a
    // single-column sort can deliver this for one column only
    assert(avgWidth(2, 3) < partRange * 0.5,
      s"part envelopes must shrink: ${avgWidth(2, 3)} vs $partRange")
    assert(avgWidth(4, 5) < suppRange * 0.5,
      s"supp envelopes must shrink: ${avgWidth(4, 5)} vs $suppRange")
    // conservation: bucket rows sum to the table
    assert(stats.map(_.getLong(1)).sum ===
      graft.Tables.lineitem(spark, Sf).count())
  }

  test("min/max row-group skipping: the range-sorted layout reads only " +
      "the matching range's rows (executed-scan numOutputRows)") {
    // the file-INTERNAL level of the layout story — partition pruning
    // skips directories, bucketing skips shuffles, and parquet footer
    // min/max stats skip ROW GROUPS. Range-partitioning the write
    // gives every file a disjoint key range, so an equality filter's
    // pushed predicate rules out all but one file's row groups at the
    // footer; the same rows spread hash-uniformly leave every row
    // group's [min,max] straddling the key and NOTHING skips. The
    // scan's own numOutputRows metric (rows the reader materialized,
    // BEFORE the residual FilterExec) is the ground truth.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rowgroup_skip").toString
    val ev = graft.Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"))
    val n = ev.count()
    ev.repartitionByRange(8, col("user_id"))
      .write.mode("overwrite").parquet(s"$dir/ranged")
    ev.repartition(8, col("event_id")) // user_id spread across all files
      .write.mode("overwrite").parquet(s"$dir/scattered")
    // probe = the MEDIAN user key: an extreme key (global min/max)
    // would legitimately be outside some scattered files' [min,max]
    // and get skipped there too, breaking the no-skip contrast
    val users = ev.select("user_id").distinct()
      .sort("user_id").collect().map(_.getLong(0))
    val probe = users(users.length / 2)
    def scanOut(path: String): (Long, Set[Long]) = {
      val q = spark.read.parquet(path).filter(col("user_id") === probe)
      q.queryExecution.toRdd.count()
      val scans = graft.PlanWalk.allScans(q.queryExecution.executedPlan)
      assert(scans.size === 1)
      // the predicate must be PUSHED for footer stats to apply at all
      assert(scans.head.toString.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id"),
        s"filter must push to the scan:\n${scans.head}")
      (scans.head.metrics("numOutputRows").value,
        q.select("event_id").as[Long].collect().toSet)
    }
    val (rangedRows, rangedIds) = scanOut(s"$dir/ranged")
    val (scatteredRows, scatteredIds) = scanOut(s"$dir/scattered")
    assert(rangedIds === scatteredIds, "layout must never change answers")
    // scattered: every row group straddles the probe key -> row-group
    // stats skip nothing. Tolerance rather than === n (r17-ADVICE):
    // dictionary filtering and column-index (page-level) filtering —
    // parquet reader defaults that vary across parquet-mr/Spark
    // versions — can legitimately drop some pages even here; the real
    // check is the ranged-vs-scattered CONTRAST, not an exact count.
    assert(scatteredRows >= (n * 9) / 10,
      s"scattered layout should read (nearly) everything: $scatteredRows vs $n")
    // ranged: only the one file whose range holds the probe key
    // survives the footer check (~n/8 of the rows)
    assert(rangedRows <= n / 4,
      s"ranged layout should skip most row groups: $rangedRows of $n")
  }
}
