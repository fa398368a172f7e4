package graft.func

/** DuckDB-oracle SQL fragments that must mirror a Spark-side
  * expression exactly. Centralized so the tokenizer regex and the
  * hex-nibble integer decode live in ONE place per engine — a change
  * to either side that isn't mirrored here breaks the oracle compare
  * loudly instead of drifting per-operator. */
object OracleSql {
  /** DuckDB equivalent of [[Tokenizer.tokens]] over a `text` column —
    * ASCII-translate lowercasing, NOT lower(): utf8proc's simple case
    * mapping and Java's full mapping disagree on U+0130 'İ'
    * (Tokenizer.scala, r13). */
  val toks: String =
    s"list_filter(string_split_regex(translate(text, " +
      s"'${graft.func.Tokenizer.Uppers}', '${graft.func.Tokenizer.Lowers}')," +
      s" '[^a-z0-9]+'), t -> t <> '')"

  /** Integer value of the first `n` hex nibbles of VARCHAR column `m`
    * (DuckDB has no conv(); rebuild from instr arithmetic — exact in
    * BIGINT for n ≤ 15). */
  def hexNibbles(m: String, n: Int): String = hexNibblesAt(m, 1, n)

  /** Integer value of `n` hex nibbles of VARCHAR column `m` starting
    * at 1-based position `start` — the oracle twin of Spark's
    * `conv(substring(m, start, n), 16, 10)`. */
  def hexNibblesAt(m: String, start: Int, n: Int): String =
    (1 to n)
      .map(k =>
        s"(instr('0123456789abcdef', $m[${start + k - 1}]) - 1) * ${1L << (4 * (n - k))}")
      .mkString("(", " + ", ")")
}
