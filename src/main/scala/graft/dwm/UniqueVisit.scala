package graft.dwm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** DWM daily unique-visitor dedup (T2): the reference keys by `mid`,
  * holds the last-visit date in TTL'd keyed state and emits only the
  * first visit per mid per day (reference
  * gmall-time/.../app/dwm2/UV2.java:61-112, TTL :77-78).
  *
  * Spark-first: one `row_number()` window over (mid, day) — the 1-day
  * state TTL is implicit in the partition key, so there is no state to
  * expire. At 100 TB this is a single hash shuffle on (mid, day);
  * skew-safe because the key includes the day.
  */
object UniqueVisit {
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("event_id"),
        col("user_id").as("mid"),
        to_date(col("ts")).cast("string").as("dt"))
  }

  val oracle: String =
    """WITH ranked AS (
      |  SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
      |         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT event_id, user_id AS mid, dt
      |FROM ranked WHERE rn = 1""".stripMargin
}
