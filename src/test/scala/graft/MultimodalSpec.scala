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

  test("extractFeatures yields one feature vector per document (pixels for images, 16-bin stub otherwise)") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    assert(feats.count() == docs)
    // image rows decode to W*H RGB pixel features; audio/video fall to the stub
    val pixelDims = Multimodal.Png.W * Multimodal.Png.H * 3
    assert(feats.filter(f => f.mime == "image/png" &&
      f.features.length != pixelDims).count() == 0)
    assert(feats.filter(f => f.mime != "image/png" &&
      f.features.length != 16).count() == 0)
    // video rows must have ceil(n_bytes/64) frames, others exactly 1
    assert(feats.filter(f => f.mime.startsWith("video/") &&
      f.frame_offsets.length != (f.n_bytes + 63) / 64).count() == 0)
    assert(feats.filter(f => !f.mime.startsWith("video/") &&
      f.frame_offsets.length != 1).count() == 0)
    feats.unpersist()
  }

  test("synthesized PNGs are real PNGs: ImageIO round-trips the exact generator pixels") {
    val bytes = Multimodal.Png.synth(3L)
    // PNG magic + constant stored-block length (what the meta oracle states)
    assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(bytes.length == Multimodal.Png.SynthBytes)
    assert(Multimodal.Png.synth(999L).length == Multimodal.Png.SynthBytes)
    val feats = Multimodal.decodeImage(bytes)
      .getOrElse(fail("ImageIO could not decode the synthesized PNG"))
    assert(feats.length == Multimodal.Png.W * Multimodal.Png.H * 3)
    for {
      y <- 0 until Multimodal.Png.H
      x <- 0 until Multimodal.Png.W
      c <- 0 until 3
    } {
      val idx = (y * Multimodal.Png.W + x) * 3 + c
      val expected = Multimodal.Png.pixel(3L, y, x, c) / 255f
      assert(feats(idx) == expected, s"pixel ($x,$y,$c): ${feats(idx)} != $expected")
    }
  }

  test("image rows flow decoded pixels end-to-end through extractFeatures") {
    // doc_id % 3 == 0 -> image/png in the mediaTable mime rotation
    val imgDoc = Multimodal.extractFeatures(spark, sfDir)
      .filter(_.doc_id == 3L).head()
    assert(imgDoc.mime == "image/png")
    assert(imgDoc.n_bytes == Multimodal.Png.SynthBytes)
    val expected = for {
      y <- 0 until Multimodal.Png.H
      x <- 0 until Multimodal.Png.W
      c <- 0 until 3
    } yield Multimodal.Png.pixel(3L, y, x, c) / 255f
    assert(imgDoc.features.toSeq == expected)
  }

  test("decodeImage rejects non-image bytes (fallback path stays reachable)") {
    assert(Multimodal.decodeImage("definitely not a png".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("image near-dup: a one-bit edit collides via an intact band; far pairs stay out") {
    import spark.implicits._
    // base hash, a 1-bit variant (near-dup), and a far hash that still
    // shares band 0 (candidate but must FAIL the exact verify)
    val base = (0x0123456789ABCDEFL >>> 32, 0x0123456789ABCDEFL & 0xFFFFFFFFL)
    val oneBit = (base._1 ^ 1L, base._2)
    val far = (base._1 ^ 0xFFFF0000L, base._2 ^ 0xFFFFFFF0L)
    val ph = Seq(
      (0L, base._1, base._2),
      (1L, oneBit._1, oneBit._2),
      (2L, far._1, far._2))
      .toDF("doc_id", "phash_hi", "phash_lo")
    val pairs = Multimodal.nearDupOf(ph)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.keySet == Set((0L, 1L)),
      s"only the 1-bit variant is a near-dup: $pairs")
    assert(pairs((0L, 1L)) == 1, "exact Hamming must be reported")
  }

  test("image_phash bits equal a driver-side recompute from the pixel formula") {
    import Multimodal.Png
    val got = Multimodal.imagePhash(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got.keySet.forall(_ % 3 == 0))
    got.keys.take(5).foreach { id =>
      val lums = (for (y <- 0 until Png.H; x <- 0 until Png.W)
        yield (0 until 3).map(c => Png.pixel(id, y, x, c)).sum).toIndexedSeq
      val total = lums.sum
      def pack(lo: Int, hi: Int): Long = (lo until hi)
        .map(i => if (64 * lums(i) > total) 1L << (i - lo) else 0L).sum
      assert(got(id) == ((pack(32, 64), pack(0, 32))),
        s"decode→hash must be bit-exact for doc $id")
    }
  }
}
