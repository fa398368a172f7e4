package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink layer: the Spark-batch restatement of the reference's four
  * write paths.
  *
  *  - [[writeDedupLatest]] — K3/K4: the Phoenix upsert + ClickHouse
  *    ReplacingMergeTree contract (keep the max-ts row per key;
  *    re-writing the same batch is a no-op — idempotent stores,
  *    reference gmall-time/.../utils/ClickHouseUtil.java:18-20 and
  *    app/func/DimSink.java:41-93). One hash shuffle on the key;
  *    `overwrite` makes replays idempotent.
  *  - [[writeRouted]] — K2: the dynamic-topic Kafka sink
  *    (per-record topic from a routing column,
  *    utils/MyKafkaUtil.java:38-44) as a `partitionBy` parquet write:
  *    one pass, one directory per "topic", no per-topic re-scan.
  *  - [[writeDropTransient]] — K4's `@TransientSink` column skip
  *    (bean/TransientSink.java:16-19): drop helper columns at the
  *    sink boundary instead of annotating beans.
  */
object Sinks {
  /** Keep-latest upsert write: among rows sharing `keys`, only the one
    * with the highest `tsCol` (ties → arbitrary-but-deterministic via
    * the full ordering) survives, then overwrite `path`. */
  def writeDedupLatest(df: DataFrame, keys: Seq[String], tsCol: String,
      path: String): Unit =
    dedupLatest(df, keys, tsCol).write.mode("overwrite").parquet(path)

  /** The dedup transform alone (unit-testable without IO). */
  def dedupLatest(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, monotonically_increasing_id())
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Dynamic-topic fan-out: one write partitioned by the routing
    * column — `path/<routeCol>=<topic>/part-*.parquet`. */
  def writeRouted(df: DataFrame, routeCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(routeCol).parquet(path)

  /** Drop transient (not-for-sink) columns before a write. */
  def writeDropTransient(df: DataFrame, transientCols: Seq[String],
      path: String): Unit =
    df.drop(transientCols: _*).write.mode("overwrite").parquet(path)

  /** Bucketed table write: pre-shuffles once at write time so later
    * equi-joins and aggregations on `bucketCols` are co-located — no
    * Exchange at read time. The 100-TB pattern for fact↔fact joins
    * that repeat every run (e.g. orders×lineitem on the order key):
    * pay the shuffle once, amortize it across every downstream query.
    * (Parquet + catalog table; `sortBy` keeps bucket files
    * merge-join-friendly.) */
  def writeBucketed(df: DataFrame, bucketCols: Seq[String], buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** K5: stats re-publish — the same frame written to its primary
    * store AND re-published for downstream SQL consumers (reference
    * app/dws2/ProductStatsApp.java:421-424). The input is computed
    * once (cache) and written twice. */
  def publishBoth(df: DataFrame, primaryPath: String,
      republishPath: String): Unit = {
    val cached = df.cache()
    try {
      cached.write.mode("overwrite").parquet(primaryPath)
      cached.write.mode("overwrite").parquet(republishPath)
    } finally cached.unpersist()
  }

  /** Read back a routed "topic" (for tests and downstream jobs). */
  def readTopic(spark: SparkSession, path: String, routeCol: String,
      topic: String): DataFrame =
    spark.read.parquet(path).filter(col(routeCol) === topic)
}
