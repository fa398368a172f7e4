package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  test("wordBreak: DP finds the minimum tiling, including aliases") {
    // dictionary = top-20 words of THIS corpus. Frequencies: ab×4,
    // abc×3, c×3, zq×1 (and a tail) — all ≤ 20 distinct words, so
    // every word is in the dictionary.
    val docs = Seq(
      (1L, "ab ab ab ab abc abc abc c c c zq"),
      (2L, "ab c"),          // 'abc' → 1 word beats ab+c = 2
      (3L, "abc ab"),        // 'abcab': abc+ab or ab+... min = 2
      (4L, ""),              // empty → trivially segmentable, 0 words
      (5L, "ab x ab"))       // 'abxab': 'x' appears once → in dict too
      .toDF("doc_id", "text")
    val out = Segmentation.wordBreakOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // doc 2: ns = "abc" — the DP must prefer the single word 'abc'
    assert(out(2L) === ((3L, 1L, 1L)))
    assert(out(3L) === ((5L, 1L, 2L)))
    assert(out(4L) === ((0L, 1L, 0L)))
    assert(out(5L) === ((5L, 1L, 3L)))
  }

  test("wordBreak: words evicted from the budgeted dictionary reject") {
    // 21 distinct words of freq 2 — the top-20 dict keeps w01..w20 by
    // the word-asc tiebreak and EVICTS w21; 'zz' (freq 1) also misses
    val docs = (1 to 21).map(i => (i.toLong, f"w$i%02d w$i%02d")) :+
      (100L, "zz")
    val out = Segmentation.wordBreakOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 1L, "kept word tiles")
    assert(out(20L) === 1L, "boundary word kept by the asc tiebreak")
    assert(out(21L) === 0L, "evicted word cannot tile its own doc")
    assert(out(100L) === 0L, "sub-budget-frequency word rejected")
  }

  test("cdcChunks: chunks tile each doc exactly and contiguously") {
    val out = Segmentation.cdcChunks(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 1L, "first chunk starts at 1")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + a._4, "chunks are contiguous")
          assert(b._2 === a._2 + 1L)
        case _ =>
      }
      assert(cs.forall(_._4 > 0L), "no empty chunk")
    }
  }

  test("cdcChunks: boundaries resynchronize after an insertion") {
    // THE content-defined property: prepending text shifts only the
    // chunks before the first surviving boundary — the fixed-window
    // chunker would shift every chunk after the edit
    val base = ("the quick brown fox jumps over the lazy dog and then " +
      "walks back home across the wide green field at dusk ") * 8
    val docs = Seq((1L, base), (2L, "inserted prefix words " + base))
      .toDF("doc_id", "text")
    val chunks = Segmentation.cdcChunksOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3))
    val a = chunks.filter(_._1 == 1L).map(_._2).toSeq
    val b = chunks.filter(_._1 == 2L).map(_._2).toSeq
    // ~850 unspaced chars at 1/61 boundary density (CdcD = 61): this
    // fixed fixture chunks multiple times (deterministic — verified
    // once, holds forever)
    assert(a.length > 2 && b.length > 2,
      s"fixture must produce several chunks: a=$a b=$b")
    // the chunk-length sequences share a common suffix once the
    // rolling window clears the edit (same char suffix → same hashes)
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(common.nonEmpty,
      s"chunk tails must realign after the edit: a=$a b=$b")
    assert(a != b, "the edit must move at least the leading chunk")
  }

  test("wordBreak at Sf: every doc of only-top-vocab words tiles") {
    val out = Segmentation.wordBreak(spark, Sf)
    val rows = out.collect()
    assert(rows.length === 500)
    // a doc that tiles reports min_words ≤ ns_len (each word ≥ 1 char)
    rows.filter(_.getLong(2) == 1L).foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
    }
    // untiled docs exist at Sf (vocab is 31 words, dict keeps 20)
    assert(rows.exists(_.getLong(2) == 0L))
    assert(rows.exists(_.getLong(2) == 1L))
  }
}
