package graft.func

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** U1 stand-in for the reference's `ik_analyze` Chinese-segmentation
  * UDTF (reference gmall-time/.../app/func/KeywordUDTF.java:12-22,
  * core utils/KeywordUtil.java:15-34, registered
  * app/dws2/KeywordStatspp.java:36).
  *
  * The IK dictionary is an external artifact (not reproducible
  * offline — SURVEY.md §7.5), so the operator CONTRACT is fixed
  * instead: a deterministic `String => Seq[String]` segmentation that
  * lower-cases and splits on non-alphanumeric runs. Crucially it is a
  * pure Column expression (`split` + `filter`), NOT a Scala UDF — it
  * stays inside whole-stage codegen and is pushable/pruneable, which a
  * UDF-based tokenizer would break at 100 TB.
  */
object Tokenizer {
  private[graft] val Uppers = ('A' to 'Z').mkString
  private[graft] val Lowers = ('a' to 'z').mkString

  /** Tokenize into an array column; empty strings removed.
    * Oracle equivalent: list_filter(string_split_regex(
    * translate(x, 'A..Z', 'a..z'), '[^a-z0-9]+'), t -> t <> '').
    *
    * Lower-casing is ASCII-ONLY `translate`, not `lower` — r13's
    * unicode corpus caught the drift: Java's full case mapping
    * expands U+0130 'İ' to 'i' + combining U+0307 (so Spark minted a
    * token DuckDB didn't, and any two engines disagree on such
    * inputs), while simple per-codepoint mappings don't. Since the
    * split keeps only [a-z0-9] runs, non-ASCII letters were never
    * token material — translating exactly A-Z makes the contract
    * locale- and engine-independent with identical output on ASCII. */
  def tokens(c: Column): Column =
    filter(split(translate(c, Uppers, Lowers), "[^a-z0-9]+"),
      t => t =!= "")

  /** One row per token (the UDTF shape — explode of the array). */
  def explodeTokens(c: Column): Column = explode(tokens(c))
}
