package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2, expressed as
  * a pure `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL the driver hash-compares against.
  * Column names and types are aligned on both sides (decimals for
  * money, BIGINT counts, floor-scaled ratios) so hashes match exactly.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    dws.ProvinceStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dws_province_stats" -> (dws.ProvinceStats(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_dws_province_stats" -> dws.ProvinceStats.oracle
  )
}
