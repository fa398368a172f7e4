package graft.func

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join equals the plain join on a hot-key fixture") {
    // 90% of fact rows share one hot key — the shape that melts a
    // single reducer at scale
    val fact = ((1 to 900).map(i => (i.toLong, 7L)) ++
      (901 to 1000).map(i => (i.toLong, (i % 5).toLong)))
      .toDF("row_id", "k")
    val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e")).toDF("dk", "name")

    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "name").as[(Long, String)].collect().toSet
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk",
        col("row_id"), buckets = 8)
      .select("row_id", "name").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._2 == "hot") == 900)
  }

  test("approx product stats keeps group structure, estimates within 10%") {
    val exact = graft.dws.ProductStats.aggregated(spark, Sf)
      .select("stt", "sku_id", "order_ct")
      .as[(Long, Long, Long)].collect()
      .map { case (s, k, c) => (s, k) -> c }.toMap
    val approx = graft.dws.ProductStats.approx(spark, Sf)
      .select("stt", "sku_id", "order_ct")
      .as[(Long, Long, Long)].collect()
      .map { case (s, k, c) => (s, k) -> c }.toMap
    assert(approx.keySet == exact.keySet, "same groups")
    val maxErr = exact.map { case (k, e) =>
      math.abs(approx(k) - e).toDouble / math.max(e, 1L) }.max
    assert(maxErr <= 0.1, s"worst relative HLL error $maxErr")
  }
}
