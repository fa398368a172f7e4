package graft.func

import scala.collection.mutable.ArrayBuffer

/** Dictionary-shaped segmenter — the ik_analyze operator SHAPE one
  * step closer than [[Tokenizer]]'s regex stand-in (reference
  * gmall-time/.../utils/KeywordUtil.java:15-34 runs IKSegmenter in
  * smart mode; the IK dictionary itself is an external artifact, so
  * SURVEY.md §7.5 fixes a deterministic contract instead):
  *
  *  - ASCII alphanumeric runs tokenize EXACTLY like
  *    [[Tokenizer.tokens]] (lowercase, split on everything else) —
  *    bit-identical on ASCII-only corpora, asserted in spec, which is
  *    what lets the dict form share the regex form's DuckDB oracle.
  *  - CJK runs go through forward maximum matching (the standard
  *    greedy longest-match segmentation) against an embedded
  *    demonstration lexicon; maximal unmatched stretches fall back to
  *    overlapping character bigrams (the Lucene CJKAnalyzer shape),
  *    single leftover chars to themselves.
  *
  * Everything is deterministic: no dictionary ranking, no ambiguity
  * resolution beyond longest-then-leftmost. The lexicon is a plain
  * `Set[String]` so a real deployment swaps in its wordlist without
  * touching the algorithm. JVM-side by nature (per-char imperative
  * scan — the documented [[graft.llm.Dedup.shingleSets]] escalation);
  * the ASCII-only hot path of the keyword job stays on the codegen'd
  * Column form.
  */
object DictTokenizer {
  /** Demonstration lexicon: common analytics/commerce vocabulary.
    * Pluggable — the contract is the matching algorithm, not this
    * word list. */
  val Lexicon: Set[String] = Set(
    "数据", "查询", "分析", "用户", "商品", "订单", "统计", "关键词",
    "搜索", "点击", "购物", "支付", "时间", "窗口", "排序", "聚合",
    "索引", "系统", "平台", "报表", "实时", "离线", "计算", "引擎",
    "模型", "训练", "语言", "文本", "去重", "采样")

  private val MaxWordLen = Lexicon.map(_.length).max

  /** CJK Unified Ideographs (+ extension A) — the blocks the lexicon
    * path handles; everything else non-alphanumeric is a separator,
    * exactly like the regex contract. */
  def isCjk(c: Char): Boolean =
    (c >= '一' && c <= '鿿') || (c >= '㐀' && c <= '䶿')

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Deterministic segmentation; null-safe (null → no tokens, the
    * [[Tokenizer]] parity case). */
  def segment(text: String): Seq[String] = {
    if (text == null) return Nil
    // ASCII-only lowercasing — the shared tokenizer contract
    // (Tokenizer.scala: Java's full toLowerCase expands U+0130 and
    // disagrees with per-codepoint engines; CJK has no case anyway)
    val s = {
      val sb = new java.lang.StringBuilder(text.length)
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        sb.append(if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch)
        i += 1
      }
      sb.toString
    }
    val out = ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (isAlnum(c)) {
        var j = i + 1
        while (j < n && isAlnum(s(j))) j += 1
        out += s.substring(i, j)
        i = j
      } else if (isCjk(c)) {
        var j = i + 1
        while (j < n && isCjk(s(j))) j += 1
        segmentCjkRun(s.substring(i, j), out)
        i = j
      } else i += 1
    }
    out.toSeq
  }

  /** Forward maximum matching over one CJK run; unmatched stretches →
    * overlapping bigrams (length ≥ 2) or the single char (length 1). */
  private def segmentCjkRun(run: String, out: ArrayBuffer[String]): Unit = {
    val n = run.length
    var i = 0
    var unmatchedStart = -1
    def flushUnmatched(end: Int): Unit = if (unmatchedStart >= 0) {
      if (end - unmatchedStart == 1) out += run.substring(unmatchedStart, end)
      else {
        var k = unmatchedStart
        while (k < end - 1) { out += run.substring(k, k + 2); k += 1 }
      }
      unmatchedStart = -1
    }
    while (i < n) {
      var l = math.min(MaxWordLen, n - i)
      var hit = 0
      while (l >= 2 && hit == 0) {
        if (Lexicon.contains(run.substring(i, i + l))) hit = l else l -= 1
      }
      if (hit > 0) {
        flushUnmatched(i)
        out += run.substring(i, i + hit)
        i += hit
      } else {
        if (unmatchedStart < 0) unmatchedStart = i
        i += 1
      }
    }
    flushUnmatched(n)
  }
}
