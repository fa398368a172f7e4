package graft.func

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout statistics — the multi-column
  * data-skipping device: interleaving the bits of two normalized
  * sort dimensions makes rows that are close in BOTH dimensions land
  * in the same region of the one-dimensional key, so equal-width
  * key ranges ("files") carry NARROW min/max envelopes on every
  * dimension at once and a predicate on either column can skip most
  * of them. Single-column sorting gives that property for one
  * column only.
  *
  * The query reports, per Z-bucket (top [[ZBits]] bits of the
  * interleaved key — the "file" a writer would cut), the row count
  * and both dimensions' min/max — exactly the footer statistics a
  * data-skipping reader consults. Everything is exact integer
  * arithmetic (normalization is `v·2^bits DIV (max+1)`), so the
  * DuckDB oracle replays the full curve.
  *
  * Scale shape (100 TB): the z-key is a projection (16 codegen'd
  * bit terms); the per-bucket stats are ONE map-side-combined
  * aggregate bounded by 2^[[ZBits]] buckets per task. A real writer
  * would range-partition by z before writing — the stats here are
  * the layout-quality report that decision reads. */
object ZOrder {
  /** Bits per dimension (z-key = 2·ZBits wide; buckets = 2^ZBits). */
  val ZBits = 8

  /** Bit-interleave of two [[ZBits]]-bit values: a in even positions,
    * b in odd. */
  def zValue(a: Column, b: Column): Column =
    (0 until ZBits).map { k =>
      (shiftright(a, k).bitwiseAND(1).cast("long") * (1L << (2 * k))) +
        (shiftright(b, k).bitwiseAND(1).cast("long") * (1L << (2 * k + 1)))
    }.reduce(_ + _)

  private def zSql(a: String, b: String): String =
    (0 until ZBits).map(k =>
      s"((($a >> $k) & 1) * ${1L << (2 * k)} + " +
        s"(($b >> $k) & 1) * ${1L << (2 * k + 1)})")
      .mkString("(", " + ", ")")

  /** Per-Z-bucket layout stats over lineitem's (partkey, suppkey) —
    * two independently-queried dimensions a single-column sort can
    * serve only one of. */
  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val mx = li.agg(max("l_partkey").as("mp"), max("l_suppkey").as("ms"))
    li.crossJoin(broadcast(mx))
      .select(col("l_partkey"), col("l_suppkey"),
        expr(s"l_partkey * ${1 << ZBits} DIV (mp + 1)").as("a"),
        expr(s"l_suppkey * ${1 << ZBits} DIV (ms + 1)").as("b"))
      .select(col("l_partkey"), col("l_suppkey"),
        shiftright(zValue(col("a"), col("b")), ZBits).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
  }

  lazy val zorderStatsOracle: String = {
    val z = zSql("a", "b")
    s"""WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms
       |            FROM lineitem),
       |n AS (SELECT l_partkey, l_suppkey,
       |             l_partkey * ${1 << ZBits} // (mp + 1) AS a,
       |             l_suppkey * ${1 << ZBits} // (ms + 1) AS b
       |      FROM lineitem, mx),
       |zb AS (SELECT l_partkey, l_suppkey,
       |              CAST(($z) >> $ZBits AS BIGINT) AS bucket
       |       FROM n)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(min(l_partkey) AS BIGINT) AS min_part,
       |       CAST(max(l_partkey) AS BIGINT) AS max_part,
       |       CAST(min(l_suppkey) AS BIGINT) AS min_supp,
       |       CAST(max(l_suppkey) AS BIGINT) AS max_supp
       |FROM zb GROUP BY 1""".stripMargin
  }
}
