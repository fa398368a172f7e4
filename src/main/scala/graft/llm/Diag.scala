package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch diagnostic — not part of the library; deleted after use
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("diag").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val snips = Seq(
      "smile 😀 flag 🇫🇷 emoji",
      "café café combining",
      "中文分词 mixed ASCII 日本語",
      "שלום rtl مرحبا text",
      "zwj 👨‍👩‍👧 family",
      "TÜRKİYE straße UPPER lower ǅungla")
    snips.toDF("s").select(col("s"), lower(col("s")).as("lo"),
      length(col("s")).as("len"),
      graft.func.Tokenizer.tokens(col("s")).as("toks"))
      .collect().foreach { r =>
        println(s"SNIP ${r.getString(0)} | lower=${r.getString(1)} | " +
          s"len=${r.getInt(2)} | toks=${r.getSeq[String](3).mkString(",")}")
      }
    spark.stop()
  }
}
