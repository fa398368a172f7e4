package graft.ads

import graft.SparkSpec

class ItemRankSpec extends SparkSpec {
  import spark.implicits._

  test("itemRank: hand-computed 4-round recurrence on a path graph") {
    // path 1 - 2 - 3 (unit weights): the center node collects from
    // both leaves every round; leaves each get half of the center
    val out = ItemRank.itemRankOf(
      Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("pa", "pb", "support"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rounds (leaf, center): (575000, 1850000) -> (936250, 1127500)
    //   -> (629187, 1741625) -> (890190, 1219617)
    assert(out(1L) === 890190L)
    assert(out(3L) === 890190L)
    assert(out(2L) === 1219617L)
  }

  test("itemRank: symmetric graph gives symmetric scores; hub dominates") {
    // star: hub 10 connected to 11, 12, 13
    val out = ItemRank.itemRankOf(
      Seq((10L, 11L, 2L), (10L, 12L, 2L), (10L, 13L, 2L))
        .toDF("pa", "pb", "support"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(11L) === out(12L) && out(12L) === out(13L))
    assert(out(10L) > out(11L), "hub centrality exceeds the spokes'")
  }

  test("itemRank on sf data: every graph node scored, base respected") {
    val out = ItemRank.itemRank(spark, Sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) >= ItemRank.BasePpm),
      "teleport mass is a floor on every score")
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }
}
