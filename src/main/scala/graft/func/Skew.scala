package graft.func

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
