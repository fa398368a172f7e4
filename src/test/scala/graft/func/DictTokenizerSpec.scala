package graft.func

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DictTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("ASCII contract identical to the regex tokenizer") {
    val texts = Seq("Key AGG row", "a1 b2  c3", "", "x", "hello,world!42")
    texts.foreach { t =>
      val viaRegex = Seq(t).toDF("text")
        .select(Tokenizer.tokens(col("text"))).as[Seq[String]].collect().head
      assert(DictTokenizer.segment(t) === viaRegex, s"on '$t'")
    }
    assert(DictTokenizer.segment(null) === Nil)
    // whole-corpus parity: the property that lets the dict keyword
    // query share the regex form's oracle
    val corpus = graft.Tables.documents(spark, Sf).select("text")
    val viaRegex = corpus.select(Tokenizer.explodeTokens(col("text")).as("k"))
      .groupBy("k").count().as[(String, Long)].collect().toMap
    val viaDict = corpus.as[String].flatMap(DictTokenizer.segment)
      .toDF("k").groupBy("k").count().as[(String, Long)].collect().toMap
    assert(viaDict === viaRegex)
  }

  test("CJK: dictionary words longest-first, bigram fallback between") {
    // 数据 and 分析 are lexicon words; the char between them is not
    assert(DictTokenizer.segment("数据分析") === Seq("数据", "分析"))
    // longest match wins: 关键词 (3) beats any 2-char prefix match
    assert(DictTokenizer.segment("关键词统计") === Seq("关键词", "统计"))
    // unmatched single char between words → itself
    assert(DictTokenizer.segment("数据的查询") === Seq("数据", "的", "查询"))
    // unmatched stretch ≥ 2 → overlapping bigrams (CJKAnalyzer shape)
    assert(DictTokenizer.segment("天地人") === Seq("天地", "地人"))
    // mixed script: ASCII runs and CJK runs tokenize independently
    assert(DictTokenizer.segment("spark数据, SQL查询!") ===
      Seq("spark", "数据", "sql", "查询"))
    // deterministic: rerun bit-identical
    val s = "数据分析天地人关键词spark42"
    assert(DictTokenizer.segment(s) === DictTokenizer.segment(s))
  }

  test("keyword stats dict form equals the regex form on this corpus") {
    val regex = graft.dws.KeywordStats(spark, Sf)
      .as[(String, String, Long)].collect().toSeq
    val dict = graft.dws.KeywordStats.dictForm(spark, Sf)
      .as[(String, String, Long)].collect().toSeq
    assert(dict === regex && dict.nonEmpty)
  }
}
