package graft

import graft.ops.Multimodal

/** The stub decoder's plumbing contract: binary in, typed features out,
  * deterministic, and consistent with the expression-level metadata query.
  */
class MultimodalSpec extends SparkSuite {

  test("decode produces one feature row per media row, deterministic") {
    val feats = Multimodal.decode(spark, sf).collect()
    assert(feats.length == 500)
    val again = Multimodal.decode(spark, sf).collect()
    assert(feats.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }

  test("stub features agree with the expression-level metadata query") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.mediaMeta(spark, sf)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("checksum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getString(3))).toMap
    Multimodal.decode(spark, sf).collect().foreach { f =>
      val (nb, w, ck) = meta(f.doc_id)
      assert(f.n_bytes == nb && f.width == w && f.checksum == ck)
    }
  }

  test("resize: one output per media row, target dims, size proportional to area") {
    val out = Multimodal.resize(spark, sf, 64, 64).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.media.length == 64 * 64 / 64))
    val big = Multimodal.resize(spark, sf, 128, 128).collect()
    assert(big.forall(_.media.length == 128 * 128 / 64))
  }

  test("frame sampling: stride-4 indices bounded by the stub frame count") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    val nFrames = Multimodal.decode(spark, sf).collect()
      .map(f => f.doc_id -> f.n_frames).toMap
    frames.foreach { r =>
      val idx = r.getAs[Long]("frame_idx")
      assert(idx % 4 == 0)
      assert(idx < nFrames(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("frame_ms") == idx * 100)
    }
    // every video doc appears (stride samples at least frame 0)
    assert(frames.map(_.getAs[Long]("doc_id")).distinct.length ==
      nFrames.count { case (id, _) => id % 3 == 2 })
  }
}
