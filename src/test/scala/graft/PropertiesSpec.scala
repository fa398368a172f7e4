package graft

import org.apache.spark.sql.functions._

/** SURVEY §5 property tests: algebraic laws the operators must hold at
  * any scale — permutation invariance (shuffles reorder rows),
  * union-of-partials = aggregate-of-whole (map-side combine), and
  * dedup idempotence. Seeded generators (not ScalaCheck) so every run
  * exercises the identical 20 cases deterministically. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases: Seq[List[(Long, Long)]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(20)(List.fill(1 + rnd.nextInt(30))(
      (1L + rnd.nextInt(5), rnd.nextInt(100).toLong)))
  }

  test("windowed sum is invariant under input permutation") {
    val rnd = new scala.util.Random(7)
    cases.foreach { xs =>
      val a = xs.toDF("k", "v").groupBy("k").agg(sum("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = rnd.shuffle(xs).toDF("k", "v")
        .repartition(3).groupBy("k").agg(sum("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b)
    }
  }

  test("union-of-partials equals aggregate-of-whole") {
    cases.filter(_.size >= 2).foreach { xs =>
      val (l, r) = xs.splitAt(xs.size / 2)
      val whole = xs.toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val partial = l.toDF("k", "v").unionByName(r.toDF("k", "v"))
        .groupBy("k").agg(sum("v").as("s"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(whole == partial)
    }
  }

  test("dedupLatest is idempotent and keeps the max ts per key") {
    cases.foreach { xs =>
      val df = xs.toDF("k", "ts")
      val once = sinks.Sinks.dedupLatest(df, Seq("k"), "ts")
      val twice = sinks.Sinks.dedupLatest(once, Seq("k"), "ts")
      assert(once.collect().toSet == twice.collect().toSet)
      val expect = xs.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      assert(once.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        expect)
    }
  }
}
