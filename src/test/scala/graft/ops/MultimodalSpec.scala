package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("binary media table round-trips bytes with typed metadata") {
    val media = Multimodal.mediaTable(spark, sf)
    val row = media.filter(_.doc_id == 0L).head()
    assert(row.format == "png" && row.media.nonEmpty)
    // bytes are the utf-8 text, so length matches n_chars
    val nChars = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .head().getAs[Long]("n_chars")
    assert(row.media.length == nChars)
  }

  test("partition-wise feature extraction is deterministic and normalized") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.mean_byte).toSeq == again.map(_.mean_byte).toSeq)
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, "histogram must normalize")
      assert(f.histogram.length == Multimodal.FakeCodec.bins)
      assert(f.n_bytes > 0)
    }
  }

  test("frame sampling keeps every k-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, sf).limit(5), frameBytes = 64, every = 4)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getAs[Int]("frame_no") % 4 == 0)
      assert(r.getAs[Int]("frame_bytes") <= 64)
    }
  }
}
