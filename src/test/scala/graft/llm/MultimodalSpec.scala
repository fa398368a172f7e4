package graft.llm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub is deterministic and in-range") {
    val (w1, h1, c1, f1) = Multimodal.decodeStub("png", "payload".getBytes)
    val (w2, h2, c2, f2) = Multimodal.decodeStub("png", "payload".getBytes)
    assert((w1, h1, c1, f1) == ((w2, h2, c2, f2)))
    assert(w1 >= 16 && w1 < 80 && h1 >= 16 && h1 < 80)
    assert(c1 >= 1 && c1 <= 4 && f1 == 1)
    val (_, _, _, fw) = Multimodal.decodeStub("wav", "payload".getBytes)
    assert(fw >= 1 && fw <= 30, "wav gets a frame count")
  }

  test("resize fits the thumb box and samples the real payload") {
    val th = Multimodal.resized(spark, Sf).cache()
    val bad = th.filter(t =>
      t.t_width < 1 || t.t_width > Multimodal.ThumbSide ||
      t.t_height < 1 || t.t_height > Multimodal.ThumbSide ||
      math.max(t.t_width, t.t_height) != Multimodal.ThumbSide ||
      t.thumb_len != t.t_width.toLong * t.t_height ||
      t.thumb_sum <= 0).count()
    assert(bad == 0)
  }

  test("frame sampling explodes every FrameStride-th frame only") {
    import org.apache.spark.sql.functions._
    val fr = Multimodal.frameSample(spark, Sf).cache()
    assert(fr.filter(col("frame_idx") % Multimodal.FrameStride =!= 0).count() == 0)
    assert(fr.filter(col("frame_idx") >= col("n_frames")).count() == 0)
    // every media record contributes frame 0
    assert(fr.filter(col("frame_idx") === 0).count() ==
      graft.Tables.documents(spark, Sf).count())
  }

  test("mapPartitions decode: typed output, one row per media record") {
    val meta = Multimodal.decoded(spark, Sf).cache()
    val n = graft.Tables.documents(spark, Sf).count()
    assert(meta.count() == n)
    val bad = meta.filter(m =>
      m.width < 16 || m.width >= 80 || m.channels < 1 || m.channels > 4 ||
      (m.format != "wav" && m.frames != 1)).count()
    assert(bad == 0)
    assert(meta.select("format").distinct().as[String].collect().toSet ==
      Set("png", "jpeg", "wav"))
  }
  test("phashDups: identical payloads pair at hamming 0; alien absent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy sleeping dog again"
    val media = Seq(
      (1L, "png", base.getBytes("UTF-8")),
      (2L, "png", base.getBytes("UTF-8")),        // exact copy
      (3L, "png", ("zzz 999 " * 12).getBytes("UTF-8")), // alien bytes
      (4L, "png", Array.empty[Byte]))              // empty: no hash
      .toDF("doc_id", "format", "blob")
    val out = Multimodal.phashDupsOf(media)
      .as[(Long, Long, Long)].collect()
    assert(out.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 0L),
      s"identical payloads must pair at hamming 0: ${out.toSeq}")
    assert(!out.exists(r => r._1 == 4L || r._2 == 4L),
      "empty payload carries no hash")
  }

  test("phashDups plan: band-bucketed equijoin candidates, no all-pairs") {
    // the documented shape (Multimodal.phashDupsOf): candidates come
    // from an equijoin on (band, v) — the SimHash band device — with
    // the id inequality as a residual condition, never a cartesian /
    // nested-loop all-pairs. Forced-shuffle mode surfaces the keys.
    withForcedShuffleJoins {
      val plan = Multimodal.phashDups(spark, Sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"band blocking must stay an equijoin:\n$plan")
      assert("hashpartitioning\\(band".r.findFirstIn(plan).nonEmpty,
        s"candidate join must shuffle on the (band, v) bucket:\n$plan")
    }
  }
}
