package graft

import graft.ops.Multimodal

/** The multimodal plumbing around the stubbed codec: schema, typed
  * Dataset boundary, determinism, batch shape. */
class MultimodalSpec extends SparkSpec {

  test("media table carries binary content with consistent byte counts") {
    import spark.implicits._
    val bad = Multimodal.mediaTable(spark, sfDir)
      .filter(org.apache.spark.sql.functions.octet_length($"content") =!= $"n_bytes")
    assert(bad.count() == 0)
  }

  test("decode stub is deterministic and shape-stable") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5, "histogram must be normalized")
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq == Seq.fill(16)(0f))
  }

  test("frame sampling: videos sample every 64 bytes, stills sample once") {
    assert(Multimodal.frameOffsets("video/mp4", 200).toSeq == Seq(0, 64, 128, 192))
    assert(Multimodal.frameOffsets("image/png", 200).toSeq == Seq(0))
    assert(Multimodal.frameOffsets("video/mp4", 0).toSeq == Seq.empty)
  }

  test("extractFeatures yields one 16-dim vector per document") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    assert(feats.count() == docs)
    assert(feats.filter(_.features.length != 16).count() == 0)
    // video rows must have ceil(n_bytes/64) frames, others exactly 1
    assert(feats.filter(f => f.mime.startsWith("video/") &&
      f.frame_offsets.length != (f.n_bytes + 63) / 64).count() == 0)
    assert(feats.filter(f => !f.mime.startsWith("video/") &&
      f.frame_offsets.length != 1).count() == 0)
    feats.unpersist()
  }
}
