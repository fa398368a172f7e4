package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, and a per-partition "decode" stage.
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder (md5-derived dimensions);
  * everything around it — the binary column, the typed record schema,
  * the `mapPartitions` batch shape, the partitioning — is the real
  * production plumbing. Swapping `decodeStub` for a JNI/codec call is
  * the only change needed for real media.
  *
  * Scale notes: `mapPartitions` keeps per-partition setup (a real
  * decoder's native context) amortized across the batch, exactly like
  * a Pandas-UDF `mapInPandas` stage; the stage is narrow (no shuffle),
  * so media decode parallelizes with input splits at 100 TB.
  */
object Multimodal {
  /** Opaque media blob + metadata, pre-decode. */
  case class MediaRecord(doc_id: Long, format: String, blob: Array[Byte])

  /** Post-decode metadata row. */
  case class MediaMeta(doc_id: Long, format: String, n_bytes: Long,
    width: Int, height: Int, channels: Int, frames: Int)

  private val Formats = Seq("png", "jpeg", "wav")

  /** Binary-column media table synthesized from `documents` (the text
    * bytes stand in for an encoded media payload). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(
        array(Formats.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
        .as("format"),
      encode(col("text"), "UTF-8").as("blob"))

  /** FAKE DECODER (deterministic stub): derives media dimensions from
    * the payload's md5 — stands in for an image/audio decode the
    * container cannot run. Real integration point: replace the body
    * with the codec call; the signature and batch shape stay. */
  def decodeStub(format: String, blob: Array[Byte]): (Int, Int, Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(blob)
    def b(i: Int): Int = d(i) & 0xff
    val width = 16 + b(0) % 64
    val height = 16 + b(1) % 64
    val channels = 1 + b(2) % 4
    val frames = if (format == "wav") 1 + b(3) % 30 else 1
    (width, height, channels, frames)
  }

  /** Decode stage: typed Dataset → mapPartitions → typed Dataset.
    * One decoder "context" per partition (the `digest` instance here,
    * a native handle in real life). */
  def decoded(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val (w, h, c, f) = decodeStub(r.format, r.blob)
        MediaMeta(r.doc_id, r.format, r.blob.length.toLong, w, h, c, f)
      }
    }
  }

  /** Oracle-checkable metadata projection of the decode stage. */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()

  /** The oracle replays the stub's md5 arithmetic on the text bytes
    * (hex-nibble pairs = digest bytes; ASCII text ⇒ blob == text). */
  val metaOracle: String = {
    def byteSql(i: Int): String =
      s"((instr('0123456789abcdef', m[${2 * i + 1}]) - 1) * 16 + instr('0123456789abcdef', m[${2 * i + 2}]) - 1)"
    s"""WITH t AS (SELECT doc_id,
       |             ['png','jpeg','wav'][CAST(doc_id % 3 + 1 AS INTEGER)] AS format,
       |             strlen(text) AS n_bytes, md5(text) AS m
       |           FROM documents)
       |SELECT doc_id, format, CAST(n_bytes AS BIGINT) AS n_bytes,
       |       CAST(16 + ${byteSql(0)} % 64 AS INTEGER) AS width,
       |       CAST(16 + ${byteSql(1)} % 64 AS INTEGER) AS height,
       |       CAST(1 + ${byteSql(2)} % 4 AS INTEGER) AS channels,
       |       CAST(CASE WHEN format = 'wav' THEN 1 + ${byteSql(3)} % 30 ELSE 1 END AS INTEGER) AS frames
       |FROM t""".stripMargin
  }
}
