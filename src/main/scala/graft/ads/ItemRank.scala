package graft.ads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Item importance over the co-purchase graph — weighted PageRank in
  * exact integer ppm, the "customers also buy" ranking signal the
  * reference's top-N dashboards imply but never compute (its surface
  * stops at per-item counts; a recommender reads centrality). The
  * iterative-graph-propagation algorithm class, expressed Spark-first:
  * edges stay a distributed frame, each round is one keyed join + one
  * aggregate, and the driver holds only the loop counter — the same
  * shape as [[graft.llm.Dedup.closureKeepers]]' pointer doubling.
  *
  * Scoring is bit-portable: scores start at 1e6 ppm; each round every
  * node receives Σ_u (score(u)·w(u,v) DIV W(u)) from its in-neighbors
  * (per-EDGE floor division, then sum — order-free), damped as
  * 150000 + (850000·Σ) DIV 1e6. Fixed [[Rounds]] rounds, no float,
  * no convergence test — both engines replay the identical recurrence.
  *
  * Scale shape (100 TB): the pair graph is support-filtered (≥
  * [[Queries.CopurchaseMinSupport]] co-occurrences), so edges ≪
  * lineitem; per round the propagation is ONE src-keyed broadcast-or-
  * hash join plus ONE dst-keyed map-side-combined aggregate — 4×2
  * bounded exchanges total, and `localCheckpoint` truncates the
  * logical plan each round (the closure loop's device) so analysis
  * stays O(1) per round. No adjacency collect, no driver matrices.
  */
object ItemRank {
  /** Fixed propagation rounds (chained-CTE depth in the oracle). */
  val Rounds = 4
  /** Teleport mass in ppm (1 − damping). */
  val BasePpm = 150000L
  /** Damping factor in ppm. */
  val DampPpm = 850000L

  def itemRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS pa, y AS pb))))""".stripMargin))
        .as("g"))
      .select(col("g.pa").as("pa"), col("g.pb").as("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      .filter(col("support") >= Queries.CopurchaseMinSupport)
    itemRankOf(pairs)
  }

  /** [[itemRank]] over any undirected (pa, pb, support) pair frame —
    * public for tests. */
  def itemRankOf(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"),
      col("support").as("w"))
      .union(pairs.select(col("pb").as("src"), col("pa").as("dst"),
        col("support").as("w")))
    val wout = edges.groupBy("src").agg(sum("w").as("w_out"))
    // LAZY localCheckpoint: every round joins against e2 — without it
    // the pair-graph construction re-executes once per round
    // (PLANS.md rule #17; the per-round score checkpoint below only
    // truncates the SCORE lineage)
    val e2 = edges.join(wout, Seq("src")).localCheckpoint(false)
    var scores = wout.select(col("src"), lit(1000000L).as("score"))
    (1 to Rounds).foreach { _ =>
      scores = e2.join(scores, Seq("src"))
        .select(col("dst"), expr("score * w DIV w_out").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
        .select(col("dst").as("src"),
          (lit(BasePpm) + expr(s"($DampPpm * cin) DIV 1000000"))
            .as("score"))
        // LAZY, unlike the closure loop's eager round checkpoint: no
        // driver decision reads per-round state here, so the rounds
        // chain into ONE job at the terminal action while the logical
        // plan still truncates per round
        .localCheckpoint(false)
    }
    scores.select(col("src").as("item"), col("score").as("rank_ppm"))
  }

  lazy val itemRankOracle: String = {
    def round(k: Int): String =
      s"""s$k AS (SELECT dst AS node,
         |  CAST($BasePpm + ($DampPpm * sum((score * w) // w_out)) // 1000000
         |       AS BIGINT) AS score
         |FROM e2 JOIN s${k - 1} ON e2.src = s${k - 1}.node GROUP BY 1)"""
        .stripMargin
    s"""WITH it AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |sup AS MATERIALIZED (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
       |         CAST(count(*) AS BIGINT) AS support
       |  FROM it a JOIN it b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= ${Queries.CopurchaseMinSupport}),
       |e AS MATERIALIZED (
       |  SELECT pa AS src, pb AS dst, support AS w FROM sup
       |  UNION ALL SELECT pb, pa, support FROM sup),
       |wo AS MATERIALIZED (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM e GROUP BY 1),
       |e2 AS MATERIALIZED (SELECT src, dst, w, w_out FROM e JOIN wo USING (src)),
       |s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM wo),
       |${(1 to Rounds).map(round).mkString(",\n")}
       |SELECT node AS item, score AS rank_ppm FROM s$Rounds""".stripMargin
  }
}
