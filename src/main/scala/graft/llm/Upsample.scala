package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.func.{Exprs, OracleSql}

/** Fractional epoch upsampling — the mixture side the down-sampling
  * operators (CorpusOps.mixtureSample / mixtureTemperature) don't
  * cover: when a language's target weight EXCEEDS its natural share,
  * training data pipelines repeat its documents a fractional number of
  * epochs (the Llama/Gopher "epochs per source" knob). A factor of
  * 2.4 means every doc appears twice and a deterministic 40% of docs
  * appear a third time.
  *
  * The per-language factor (ppm, in [1×, 3×]) is md5-derived from the
  * language code so the operator is closed-form at any scale factor;
  * the fractional part is resolved per document by the same salted
  * md5-bucket device as mixture sampling — reproducible, uniform
  * (modulo bias ≈ 6·10⁻⁷), and independent of the sampling buckets
  * because the salt differs.
  *
  * Scale shape (100 TB): pure projection plus a bounded `explode`
  * (fan-out ≤ 3 — the factor cap, not data-dependent). Zero shuffles
  * (plan-asserted); the scan reads only (doc_id, lang). Epoch ids are
  * emitted explicitly so a downstream shuffle/pack pass can treat each
  * repeat as a distinct sequence-layout unit.
  */
object Upsample {
  /** ppm denominator for factors and fractional buckets. */
  val Ppm = 1000000L

  /** Factor range above 1×: md5(lang) maps into [0, 2e6] additional
    * ppm, i.e. factors in [1.0, 3.0]. */
  val FactorSpanPpm = 2000001L

  /** Per-language repeat factor in ppm (≥ [[Ppm]] = at least 1×). */
  def factorPpm(lang: Column): Column =
    lit(Ppm) +
      conv(substring(md5(concat(lit("up:"), lang)), 1, 8), 16, 10)
        .cast("long") % FactorSpanPpm

  def upsample(spark: SparkSession, dir: String): DataFrame =
    upsampleOf(Tables.documents(spark, dir))

  /** [[upsample]] over any (doc_id, lang) frame — public for tests.
    * One output row per (doc, epoch); epoch is 1-based. */
  def upsampleOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .withColumn("fppm", factorPpm(col("lang")))
      .withColumn("reps",
        expr(s"fppm DIV $Ppm") +
          when(Exprs.md5Bucket(col("doc_id"), "up2:", 10, Ppm)
            < col("fppm") % Ppm, 1L).otherwise(0L))
      .select(
        col("doc_id"),
        col("lang"),
        explode(sequence(lit(1L), col("reps"))).as("epoch"))

  lazy val upsampleOracle: String = {
    val factor =
      s"$Ppm + (${OracleSql.hexNibbles("md5('up:' || lang)", 8)}) % $FactorSpanPpm"
    val bucket =
      s"(${OracleSql.hexNibbles("md5('up2:' || CAST(doc_id AS VARCHAR))", 10)}) % $Ppm"
    s"""WITH d AS MATERIALIZED (
       |  SELECT doc_id, lang, $factor AS fppm, $bucket AS bucket
       |  FROM documents)
       |SELECT doc_id, lang,
       |       CAST(unnest(range(1, fppm // $Ppm
       |         + CASE WHEN bucket < fppm % $Ppm THEN 1 ELSE 0 END + 1))
       |         AS BIGINT) AS epoch
       |FROM d""".stripMargin
  }
}
