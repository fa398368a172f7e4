package graft.ads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Materialize.MatOps

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

  /** Support-filtered co-purchase pair graph (pa < pb by
    * construction) — shared by [[itemRank]] and [[triangles]].
    *
    * LAZY localCheckpoint: both consumers fan the pair frame out into
    * 3+ plan branches (the self-union's two sides + degree/weight
    * aggregates + the count data cards), and the per-branch checkpoint
    * boundaries downstream defeat Spark's ReuseExchange across them —
    * the r20 stage profile showed the full mining pipeline (lineitem
    * scan → collect_set → pair explode → support aggregate) executing
    * 3× inside q_ads_triangles' final plan alone and 2–3× in
    * q_ads_item_rank (~4.3 task-cpu-s per copy at sf0.1). One
    * materialization per query invocation; never reused across
    * invocations, so bench timings stay honest (the
    * [[graft.llm.Dedup.shingleSetsShared]] device). */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
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
      .matLazily

  def itemRank(spark: SparkSession, dir: String): DataFrame =
    itemRankOf(copurchasePairs(spark, dir))

  /** Directed-edge rows per round partition: each propagation-round
    * task does O(1) arithmetic per edge (~µs), so millions of rows
    * amortize the per-task constant (codegen warm-up, shuffle-writer
    * setup, scheduling) that the r20 profile showed dominating tiny
    * round stages — 4 rounds × 20 tasks over 7k cached rows cost
    * ~9.3 task-cpu-s (~125 ms/task) before the round parallelism was
    * derived from the edge census (0.5 s after). At 10⁹–10¹⁰ edges
    * this still yields hundreds–thousands of partitions. */
  val RoundEdgesPerPartition = 4000000L

  /** [[itemRank]] over any undirected (pa, pb, support) pair frame —
    * public for tests. */
  def itemRankOf(pairs: DataFrame): DataFrame = {
    // edge census (one tiny count over the checkpointed pair frame —
    // the RangeJoin auto-mitigation idiom): the round parallelism is
    // DERIVED from data size instead of inheriting whatever partition
    // count the mining aggregate happened to finish with (scale-blind
    // both ways: 20 near-empty tasks at sf0.1, too FEW at 100 TB)
    val roundParts = math.max(1L,
      (2L * pairs.count() + RoundEdgesPerPartition - 1) /
        RoundEdgesPerPartition).toInt
    val edges = pairs.select(col("pa").as("src"), col("pb").as("dst"),
      col("support").as("w"))
      .union(pairs.select(col("pb").as("src"), col("pa").as("dst"),
        col("support").as("w")))
    // LAZY localCheckpoint: wout feeds the e2 join AND the score-init
    // frame; without it the union + weight aggregate runs once per
    // consumer (the copurchasePairs note — branch-local checkpoint
    // boundaries defeat ReuseExchange between the two plans)
    val wout = edges.groupBy("src").agg(sum("w").as("w_out"))
      .matLazily
    // LAZY localCheckpoint: every round joins against e2 — without it
    // the pair-graph construction re-executes once per round
    // (PLANS.md rule #17; the per-round score checkpoint below only
    // truncates the SCORE lineage)
    // src-keyed repartition at the derived count: every round joins on
    // src, so the cached layout is already the join's partitioning,
    // and each round stage runs `roundParts` tasks instead of the
    // mining aggregate's leftover partitioning
    val e2 = edges.join(wout, Seq("src"))
      .repartition(roundParts, col("src")).matLazily
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
        .matLazily
    }
    scores.select(col("src").as("item"), col("score").as("rank_ppm"))
  }

  /** Triangle count + global clustering coefficient over the
    * co-purchase graph — the graph-density data card (how cliquey is
    * "bought together"), computed with DEGREE-ORDERED ORIENTATION:
    * every undirected edge is directed from its lower-(deg, id)
    * endpoint to the higher one, so each vertex's out-degree is
    * O(√E) and each triangle is enumerated exactly once at its
    * min-order apex. This is the device that makes distributed
    * triangle counting skew-proof — a hub vertex never fans out its
    * full neighborhood, because almost all its edges point INTO it.
    *
    * Scale shape (100 TB of orders): edges are support-filtered
    * (≪ lineitem); the wedge join is src-keyed over the oriented
    * edge list (out-degree-bounded fan-out), and the closing check
    * is a (b, c)-keyed LEFT SEMI join against the same oriented
    * list — three bounded exchanges, no vertex ever materializes
    * its neighborhood in one task. All-integer output: edge count,
    * wedge count Σ deg·(deg−1)/2, triangle count, and the global
    * clustering coefficient 3·T/wedges in ppm. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    trianglesOf(copurchasePairs(spark, dir))

  /** [[triangles]] over any undirected (pa, pb) pair frame, pa < pb. */
  def trianglesOf(pairs: DataFrame): DataFrame = {
    val und = pairs.select(col("pa"), col("pb"))
    // LAZY localCheckpoint: deg feeds both orientation-join sides and
    // the wedge-count aggregate — three branches that would each
    // re-run the degree union+aggregate (copurchasePairs note)
    val deg = und.select(col("pa").as("v"))
      .unionByName(und.select(col("pb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .matLazily
    val fwd = expr("da < db OR (da = db AND pa < pb)")
    // LAZY localCheckpoint: the oriented edge list feeds the wedge
    // join TWICE and the closing semi join (PLANS.md rule #17)
    val e = und
      .join(deg.select(col("v").as("pa"), col("deg").as("da")), Seq("pa"))
      .join(deg.select(col("v").as("pb"), col("deg").as("db")), Seq("pb"))
      .select(
        when(fwd, col("pa")).otherwise(col("pb")).as("src"),
        when(fwd, col("pb")).otherwise(col("pa")).as("dst"),
        when(fwd, col("db")).otherwise(col("da")).as("ddeg"))
      .matLazily
    val wedges = e.as("x").join(e.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddeg") < col("y.ddeg") ||
            (col("x.ddeg") === col("y.ddeg") && col("x.dst") < col("y.dst"))))
      .select(col("x.dst").as("b"), col("y.dst").as("c"))
    val tri = wedges
      .join(e.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    val nw = deg.agg(sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    tri.crossJoin(broadcast(ne)).crossJoin(broadcast(nw))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN 0 " +
          "ELSE 1000000 * 3 * n_triangles DIV n_wedges END")
          .as("clustering_ppm"))
  }

  lazy val trianglesOracle: String =
    s"""WITH it AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |sup AS MATERIALIZED (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM it a JOIN it b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= ${Queries.CopurchaseMinSupport}),
       |dg AS MATERIALIZED (
       |  SELECT v, CAST(count(*) AS BIGINT) AS deg
       |  FROM (SELECT pa AS v FROM sup UNION ALL SELECT pb FROM sup)
       |  GROUP BY 1),
       |e AS MATERIALIZED (
       |  SELECT CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND pa < pb)
       |              THEN pa ELSE pb END AS src,
       |         CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND pa < pb)
       |              THEN pb ELSE pa END AS dst,
       |         CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND pa < pb)
       |              THEN b.deg ELSE a.deg END AS ddeg
       |  FROM sup JOIN dg a ON sup.pa = a.v JOIN dg b ON sup.pb = b.v),
       |w AS (SELECT x.dst AS b, y.dst AS c
       |      FROM e x JOIN e y ON x.src = y.src AND
       |        (x.ddeg < y.ddeg OR (x.ddeg = y.ddeg AND x.dst < y.dst))),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w
       |      WHERE EXISTS (SELECT 1 FROM e
       |                    WHERE e.src = w.b AND e.dst = w.c)),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM sup),
       |nw AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
       |       FROM dg)
       |SELECT n_edges, n_wedges, n_triangles,
       |       CAST(CASE WHEN n_wedges = 0 THEN 0
       |            ELSE (1000000 * 3 * n_triangles) // n_wedges END
       |         AS BIGINT) AS clustering_ppm
       |FROM t, ne, nw""".stripMargin

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
