package graft.func

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.func.Materialize.MatOps

/** Skew-mitigation utilities for hot-key joins at 100 TB.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when ONE key dominates so heavily that even
  * split partitions of it overwhelm executors (e.g. the null/default
  * key of a fact table, or a viral item id). The pattern: spread the
  * fact side across `buckets` salt values derived deterministically
  * from a high-cardinality column, replicate the (small) build side
  * once per salt value, and join on (key, salt) — the hot key's rows
  * land on `buckets` reducers instead of one.
  */
object Skew {
  /** Salted equi-join of a skewed fact against a replicable dim.
    *
    * @param saltFrom high-cardinality fact column that spreads the hot
    *                 key's rows (e.g. a row id); deterministic, so the
    *                 join result is reproducible
    * @param buckets  salt fan-out (= max reducers per hot key)
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: Column, buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Driver-checkable salted-join query: lineitem×supplier through the
    * salted path, rolled up per supplier nation. Salting must be
    * RESULT-INVISIBLE — the oracle is the plain equi-join (no salt
    * anywhere), so any row duplicated or dropped by the
    * salt/replicate/join plumbing fails the hash compare. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val sup = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    saltedEquiJoin(li, sup, "l_suppkey", "s_suppkey", col("l_orderkey"), 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("li_ct"),
        Exprs.sumCents(col("l_quantity")).as("qty_cents"))
  }

  val saltedJoinOracle: String =
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS li_ct,
      |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_cents
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY 1""".stripMargin

  /** Join-key skew report — the diagnostic that DECIDES between plain
    * shuffle, AQE skew split, and [[saltedEquiJoin]]: for each
    * candidate join key, the key count, total rows, the heaviest
    * key's row count and its corpus share in ppm, and the
    * heavy-to-mean ratio in milli-units. All integer.
    *
    * Scale shape: one map-side-combined count per key (the exchange
    * carries one row per key per task), then a key-space-sized
    * argmax; the per-key frame never returns to the driver — the
    * report is |keys audited| rows. The ratio product
    * 1000·max_rows·n_keys stays in BIGINT while max_rows·n_keys <
    * 9.2e15 — beyond that (extreme-cardinality audits) the
    * accumulator moves to DECIMAL(38,0) on both engines, same shape
    * (the embedDimStats convention). */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    def keyStats(df: DataFrame, key: String, label: String): DataFrame = {
      val counts = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .matLazily // feeds totals AND the argmax branch
      val tot = counts.agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"))
      val top = counts.orderBy(col("c").desc, col("k")).limit(1)
        .select(col("c").as("max_rows"))
      tot.crossJoin(top)
        .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"),
          col("max_rows"),
          expr("1000000 * max_rows DIV n_rows").as("max_share_ppm"),
          expr("1000 * max_rows * n_keys DIV n_rows").as("skew_ratio_milli"))
    }
    keyStats(graft.Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(keyStats(graft.Tables.lineitem(spark, dir), "l_suppkey",
        "lineitem.l_suppkey"))
      .unionByName(keyStats(graft.Tables.events(spark, dir), "user_id",
        "events.user_id"))
  }

  val skewReportOracle: String = {
    def one(table: String, key: String, label: String): String =
      s"""SELECT '$label' AS join_key, n_rows, n_keys, max_rows,
         |       CAST(1000000 * max_rows // n_rows AS BIGINT) AS max_share_ppm,
         |       CAST(1000 * max_rows * n_keys // n_rows AS BIGINT)
         |         AS skew_ratio_milli
         |FROM (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
         |             CAST(count(*) AS BIGINT) AS n_keys,
         |             CAST(max(c) AS BIGINT) AS max_rows
         |      FROM (SELECT $key, count(*) AS c FROM $table GROUP BY 1))"""
        .stripMargin
    Seq(one("lineitem", "l_orderkey", "lineitem.l_orderkey"),
      one("lineitem", "l_suppkey", "lineitem.l_suppkey"),
      one("events", "user_id", "events.user_id"))
      .mkString("\nUNION ALL\n")
  }
}
