package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest at-or-before right row per key") {
    val left = Seq(
      (1L, 5L, "e1"),   // before any right row -> null
      (1L, 10L, "e2"),  // ties right t=10 -> matches it (<=)
      (1L, 25L, "e3"),  // after both -> t=20 wins
      (2L, 50L, "e4")   // key with no right rows -> null
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, 100L),
      (1L, 20L, 200L)
    ).toDF("rk", "rt", "payload")

    val out = AsOf.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .select("ev", "payload").as[(String, Option[Long])].collect().toMap

    assert(out("e1").isEmpty)
    assert(out("e2").contains(100L))
    assert(out("e3").contains(200L))
    assert(out("e4").isEmpty)
  }

  test("asOf fails fast when an input carries a reserved internal name") {
    val left = Seq((1L, 5L, "x")).toDF("k", "t", "__side")
    val right = Seq((1L, 5L, 9L)).toDF("rk", "rt", "payload")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOf(left, right, "k", "rk", "t", "rt", Seq("payload"))
    }
    assert(e.getMessage.contains("__side"))
    val rightBad = Seq((1L, 5L, 9L)).toDF("rk", "rt", "__p")
    intercept[IllegalArgumentException] {
      AsOf.asOf(left.withColumnRenamed("__side", "ev"), rightBad,
        "k", "rk", "t", "rt", Seq("__p"))
    }
  }

  test("asOf takes the latest right ROW atomically; null keys never match") {
    val left = Seq(
      (Some(1L), 20L, "e1"),  // latest right row has b=null: must NOT backfill
      (None: Option[Long], 20L, "e2")  // null key: no match ever
    ).toDF("k", "t", "ev")
    val right = Seq(
      (Some(1L), Some(5L), Some(1L), Some(2L)),
      (Some(1L), Some(10L), Some(9L), None), // latest for k=1: (a=9, b=null)
      (None: Option[Long], Some(10L), Some(7L), Some(7L)), // null key: dropped
      (Some(1L), None: Option[Long], Some(8L), Some(8L))   // null time: dropped
    ).toDF("rk", "rt", "a", "b")

    val out = AsOf.asOf(left, right, "k", "rk", "t", "rt", Seq("a", "b"))
      .select("ev", "a", "b").as[(String, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("e1") === ((Some(9L), None)))  // not (9, 2) column-mixing
    assert(out("e2") === ((None, None)))
  }

  test("asOf equals the join+row_number reference form on real tables") {
    val got = AsOf.latestOrderQuery(spark, Sf)
    // reference form: explode all qualifying (event, order) pairs,
    // keep rank-1 by latest order date — quadratic but obviously right
    val ev = graft.Tables.events(spark, Sf).select(
      col("event_id"), col("user_id"),
      graft.func.Exprs.epochMs(col("ts")).as("ts_ms"))
    val ord = graft.Tables.orders(spark, Sf)
      .select(col("o_custkey"),
        graft.func.Exprs.epochMs(col("o_orderdate")).as("o_date_ms"),
        col("o_orderkey"))
      .groupBy("o_custkey", "o_date_ms")
      .agg(max("o_orderkey").as("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("o_date_ms").desc)
    val ref = ev.join(ord,
        ev("user_id") === ord("o_custkey") &&
        ord("o_date_ms") <= ev("ts_ms"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey").as("ref_orderkey"))

    val joined = got.select(col("event_id"), col("o_orderkey"))
      .join(ref, Seq("event_id"))
    assert(joined.count() === ev.count())
    assert(joined.filter(!(col("o_orderkey") <=> col("ref_orderkey"))).count() === 0)
  }
}
