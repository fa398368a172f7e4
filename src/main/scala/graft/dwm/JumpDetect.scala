package graft.dwm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** DWM bounce ("user jump") detection (T3): the reference uses a CEP
  * pattern — session-entry page followed by any page within 10 s; the
  * timeout side output is the bounce stream (reference
  * gmall-time/.../app/dwm/UserJumpDetailApp.java:89-148; the v2 rewrite
  * has an always-false entry predicate at UJump2.java:107 — intended
  * semantics implemented here).
  *
  * Spark has no CEP; the NFA-with-timeout collapses to lag/lead over an
  * event-time-ordered per-mid window: entry = gap from previous event >
  * sessionGapMs, bounce = entry whose next event is also beyond the
  * gap. One shuffle on mid, no state machine, no timers — and unlike
  * CEP it is trivially parallel at 100 TB.
  *
  * The reference's 10 s timeout is scaled to 30 min because the
  * testdata event stream has minute-scale inter-arrival times; the
  * operator is parameterized so both semantics are covered by tests.
  */
object JumpDetect {
  val SessionGapMs = 1800000L // 30 min

  def bounces(spark: SparkSession, dir: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col("mid")).orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("mid"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("next_ms", lead(col("ts_ms"), 1).over(w))
      .filter(
        (col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs) &&
        (col("next_ms").isNull || col("next_ms") - col("ts_ms") > gapMs))
      .select("event_id", "mid", "ts_ms")
  }

  def apply(spark: SparkSession, dir: String): DataFrame =
    bounces(spark, dir, SessionGapMs)

  val oracle: String =
    s"""WITH t AS (
       |  SELECT event_id, user_id AS mid, epoch_ms(ts) AS ts_ms,
       |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms,
       |         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ms
       |  FROM events)
       |SELECT event_id, mid, ts_ms FROM t
       |WHERE (prev_ms IS NULL OR ts_ms - prev_ms > $SessionGapMs)
       |  AND (next_ms IS NULL OR next_ms - ts_ms > $SessionGapMs)""".stripMargin
}
