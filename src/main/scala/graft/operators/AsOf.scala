package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.Exprs

/** As-of join: for each left row, the single latest right row whose
  * time is at-or-before the left row's time, per key — the
  * point-in-time lookup (latest dim version, last prior order, rate
  * as-of trade) that Spark's built-in join set does not express
  * directly. Extends the reference's interval-join family
  * (gmall-time/.../app/dwm2/OrderWideApp2.java:171-185 bounds both
  * sides; as-of is the one-sided unbounded-lower limit of it).
  *
  * Composition, not a custom physical operator (escalation tier (a)):
  * tag both inputs, union them, and take a running
  * `last(payload, ignoreNulls)` over (key, time) — ONE hash shuffle on
  * the key plus a partition-local sort, intermediate size exactly
  * |left| + |right|. At 100 TB this beats the equi-join + filter +
  * row_number form, which materializes |left| × |matching right| rows
  * before pruning (quadratic in orders-per-customer). Time-range
  * partition pruning composes on top when the right side is
  * date-partitioned.
  *
  * Contract: key and time columns are LONG (pre-convert timestamps to
  * epoch ms — also sidesteps Spark 4's LTZ/NTZ comparison rules);
  * ties (right.time == left.time) MATCH (`<=` semantics, right row
  * sorts first); the right side must be unique per (key, time) —
  * pre-aggregate otherwise, or the winner among tied right rows is
  * undefined under either engine.
  */
object AsOf {
  /** Generic as-of join. `payload` columns from `right` are appended
    * to every `left` row (all null when no right row precedes it).
    *
    * The payload travels as ONE struct column: `last(ignoreNulls)`
    * applied per payload column would backfill a NULL field of the
    * latest right row from OLDER right rows — a row that exists
    * nowhere on the right. The struct is non-null exactly on right
    * rows (even when every field inside is null), so the running last
    * picks the latest right ROW atomically, matching ASOF-join
    * semantics. Right rows with a null key OR null time are dropped up
    * front (an equi-key never matches on null, and `t >= null` is
    * never true — nulls-first window order would otherwise make such a
    * row everyone's oldest match); null-key left rows survive with a
    * null payload. */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(c => !leftCols.contains(c)),
      s"payload ${payload.mkString(",")} collides with left columns")
    // the internal tag/key columns would be silently shadowed (wrong
    // results, not an analyzer error) if either input already uses them
    val reserved = Seq("__k", "__t", "__side", "__p")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with asOf-internal " +
        s"names (${reserved.mkString(",")}) — rename them before joining")
    val lSchema = left.schema
    val payloadStruct = struct(payload.map(col): _*)
    val lSide = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(1).as("__side") +: (leftCols.map(col) :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType)
          .as("__p")): _*)
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +:
        lit(0).as("__side") +:
        (leftCols.map(c => lit(null).cast(lSchema(c).dataType).as(c)) :+
          payloadStruct.as("__p")): _*)
    // right rows (side 0) sort before left rows at equal time, so an
    // exactly-simultaneous right row is visible to the left row (<=).
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(col("__side") +: (leftCols.map(col) :+
        last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Concrete query: each behavior event joined as-of to the user's
    * most recent at-or-before order (events.user_id × orders.o_custkey,
    * orders deduped to one per (custkey, date) by max orderkey so the
    * tie winner is engine-independent). */
  def latestOrderQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      Exprs.epochMs(col("ts")).as("ts_ms"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        Exprs.epochMs(col("o_orderdate")).as("o_date_ms"),
        col("o_orderkey"))
      .groupBy("o_custkey", "o_date_ms")
      .agg(max("o_orderkey").as("o_orderkey"))
    asOf(ev, ord, "user_id", "o_custkey", "ts_ms", "o_date_ms",
      Seq("o_orderkey", "o_date_ms"))
      .withColumn("days_since",
        when(col("o_date_ms").isNotNull,
          expr("(ts_ms - o_date_ms) DIV 86400000")))
  }

  /** DuckDB states the same operator natively (ASOF LEFT JOIN picks
    * the greatest right time <= left time per key). */
  val latestOrderOracle: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
      |o AS (SELECT o_custkey, epoch_ms(o_orderdate) AS o_date_ms,
      |             max(o_orderkey) AS o_orderkey
      |      FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts_ms, o.o_orderkey, o.o_date_ms,
      |       CASE WHEN o.o_date_ms IS NOT NULL
      |            THEN (e.ts_ms - o.o_date_ms) // 86400000 END AS days_since
      |FROM e ASOF LEFT JOIN o
      |  ON e.user_id = o.o_custkey AND e.ts_ms >= o.o_date_ms""".stripMargin
}
