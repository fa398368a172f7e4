package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — the compliance pass every public
  * training-data pipeline runs before release (C4 strips lines by
  * blocklist; Dolma and BigScience ROTS redact emails / phone numbers
  * / IP addresses with regex scanners). Two operators:
  *
  *   - [[piiScan]]: per-document counts by PII class (email, phone,
  *     IPv4) plus a has_pii flag — the audit report.
  *   - [[piiRedact]]: the cleaned corpus — every match replaced by a
  *     typed placeholder token, counts carried alongside so the
  *     redaction is verifiable row-by-row.
  *
  * The synthetic `documents.text` is alphabetic-only (TESTDATA.md), so
  * the scanners run over a deterministically RENDERED contact-card
  * corpus derived from `customer` — the same constant-folded fixture
  * device as the display/display-action render in
  * [[graft.dwd.LogNested]]: the render is a pure projection whose
  * expression both engines evaluate bit-identically, and the operator
  * under test is the regex scan/replace, not the fixture.
  *
  * Scale shape (100 TB): both operators are single-pass doc-local
  * projections — ZERO shuffles, no joins, no state. The regexes run
  * as Spark's native `RegExpExtractAll` / `RegExpReplace` expressions
  * inside whole-stage codegen (no UDF), so the pass is scan-bound and
  * embarrassingly parallel; column pruning reaches the parquet scan
  * (only the rendered columns' inputs are read). Patterns are
  * RE2-compatible (no backrefs / lookaround), so the DuckDB oracle
  * evaluates the identical automaton.
  */
object Pii {
  /** Email pattern — RE2-safe subset of the HTML5 email regex. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-shaped phone: 3-3-4 digit groups, dash-separated. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (scanner-grade: no octet range check). */
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Contact-card fixture render over `customer` — valid in BOTH
    * Spark SQL and DuckDB verbatim (concat/CASE/%/lpad/CAST only; no
    * backslashes, so Spark's string-literal escaping is not in play).
    * ~58% of rows carry at least one PII hit (custkey mod 3/4/5). */
  val RenderSql: String =
    """concat(
      | 'customer ', c_name, ' segment ', lower(c_mktsegment),
      | CASE WHEN c_custkey % 3 = 0 THEN concat(' contact user', CAST(c_custkey AS STRING), '@mail', CAST(c_custkey % 7 AS STRING), '.example.com') ELSE '' END,
      | CASE WHEN c_custkey % 4 = 0 THEN concat(' phone ', CAST(100 + c_custkey % 900 AS STRING), '-', lpad(CAST(c_custkey * 7 % 1000 AS STRING), 3, '0'), '-', lpad(CAST(c_custkey * 13 % 10000 AS STRING), 4, '0')) ELSE '' END,
      | CASE WHEN c_custkey % 5 = 0 THEN concat(' from 10.', CAST(c_custkey % 256 AS STRING), '.0.', CAST(c_custkey % 100 AS STRING)) ELSE '' END)"""
      .stripMargin

  /** The rendered corpus: (doc_id, text). */
  def rendered(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("doc_id"), expr(RenderSql).as("text"))

  private def countRe(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Per-document PII audit: counts by class + total + flag. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanOf(rendered(spark, dir))

  /** [[piiScan]] over any (doc_id, text) frame — public for tests. */
  def piiScanOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      countRe(col("text"), EmailRe).as("n_emails"),
      countRe(col("text"), PhoneRe).as("n_phones"),
      countRe(col("text"), IpRe).as("n_ips"))
      .withColumn("pii_total",
        col("n_emails") + col("n_phones") + col("n_ips"))
      .withColumn("has_pii",
        when(col("pii_total") > 0, 1L).otherwise(0L))

  /** The redacted corpus: matches replaced by typed placeholders.
    * Email first (its domain contains digit-dot runs), then IP, then
    * phone — the oracle applies the identical order. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOf(rendered(spark, dir))

  /** [[piiRedact]] over any (doc_id, text) frame — public for tests. */
  def piiRedactOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          IpRe, "[IP]"),
        PhoneRe, "[PHONE]").as("clean_text"),
      (countRe(col("text"), EmailRe) + countRe(col("text"), PhoneRe) +
        countRe(col("text"), IpRe)).as("n_redacted"))

  private val renderedCte =
    s"r AS (SELECT c_custkey AS doc_id, $RenderSql AS text FROM customer)"

  lazy val piiScanOracle: String =
    s"""WITH $renderedCte,
       |s AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$IpRe')) AS BIGINT) AS n_ips
       |FROM r)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |       n_emails + n_phones + n_ips AS pii_total,
       |       CAST(CASE WHEN n_emails + n_phones + n_ips > 0
       |            THEN 1 ELSE 0 END AS BIGINT) AS has_pii
       |FROM s""".stripMargin

  lazy val piiRedactOracle: String =
    s"""WITH $renderedCte
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '[EMAIL]', 'g'),
       |    '$IpRe', '[IP]', 'g'),
       |    '$PhoneRe', '[PHONE]', 'g') AS clean_text,
       |  CAST(len(regexp_extract_all(text, '$EmailRe'))
       |     + len(regexp_extract_all(text, '$PhoneRe'))
       |     + len(regexp_extract_all(text, '$IpRe')) AS BIGINT) AS n_redacted
       |FROM r""".stripMargin
}
