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
  /** Tokenize into an array column; empty strings removed.
    * Oracle equivalent: list_filter(string_split_regex(lower(x),
    * '[^a-z0-9]+'), t -> t <> ''). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** One row per token (the UDTF shape — explode of the array). */
  def explodeTokens(c: Column): Column = explode(tokens(c))
}
