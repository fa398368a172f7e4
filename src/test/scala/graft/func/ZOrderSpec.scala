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
}
