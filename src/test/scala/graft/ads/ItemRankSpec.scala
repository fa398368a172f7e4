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
  test("triangles: K4 plus a pendant, counted once each") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant edge (1,5)
    val pairs = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(1L,5L))
      .toDF("pa", "pb")
    val r = ItemRank.trianglesOf(pairs).collect().head
    assert(r.getAs[Long]("n_edges") === 7L)
    // degrees 4,3,3,3,1 -> wedges = 6 + 3*3 + 0 = 15
    assert(r.getAs[Long]("n_wedges") === 15L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    // 3*4/15 in ppm
    assert(r.getAs[Long]("clustering_ppm") === 800000L)
  }

  test("triangles at Sf: closed wedges never exceed all wedges") {
    val r = ItemRank.triangles(spark, Sf).collect().head
    assert(r.getAs[Long]("n_triangles") * 3 <= r.getAs[Long]("n_wedges"))
    assert(r.getAs[Long]("clustering_ppm") <= 1000000L)
  }

  test("triangles plan: keyed joins only — src-keyed wedges, " +
      "(b,c)-keyed semi close, no cartesian") {
    // the documented 100 TB shape (ItemRank.trianglesOf): the wedge
    // self-join shuffles on src, the closing check is a LEFT SEMI
    // keyed on (b, c), and nothing falls back to a cartesian.
    // Forcing shuffle joins makes the keys visible at smoke scale.
    withForcedShuffleJoins {
      val plan = ItemRank.triangles(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"no cartesian anywhere in the triangle plan:\n$plan")
      assert(plan.contains("LeftSemi"),
        s"the closing check must be a LEFT SEMI join:\n$plan")
      assert("hashpartitioning\\(src".r.findFirstIn(plan).nonEmpty,
        s"wedge join must shuffle on src:\n$plan")
      assert("hashpartitioning\\(b[#,]".r.findFirstIn(plan).nonEmpty,
        s"semi close must shuffle on (b, c):\n$plan")
    }
  }
}
