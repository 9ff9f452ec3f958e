package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def magic(bytes: Array[Byte], fmt: String): Boolean = fmt match {
    case "png"  => bytes.take(8).map(_ & 0xFF).startsWith(Seq(0x89, 0x50, 0x4E, 0x47))
    case "jpeg" => (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
    case "wav"  => new String(bytes.take(4), "US-ASCII") == "RIFF" &&
                   new String(bytes.slice(8, 12), "US-ASCII") == "WAVE"
  }

  test("media table stages genuinely encoded bytes (magic numbers per format)") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.map(_.format).toSet == Set("png", "jpeg", "wav"))
    rows.foreach { r =>
      assert(magic(r.media, r.format),
        s"doc ${r.doc_id} (${r.format}) bytes lack the codec header")
    }
  }

  test("image decode recovers exact dimensions; PNG round-trips pixels losslessly") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val meta = media.collect().map(r => r.doc_id -> r).toMap
    feats.filter(f => f.format == "png" || f.format == "jpeg").foreach { f =>
      assert(f.decoded_w == meta(f.doc_id).width &&
        f.decoded_h == meta(f.doc_id).height,
        s"doc ${f.doc_id}: codec dims ${f.decoded_w}x${f.decoded_h} != metadata")
    }
    // PNG is lossless: decoding must reproduce the rendered pixels
    // bit-for-bit, so the decoded mean equals the render-side mean.
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    feats.filter(_.format == "png").take(10).foreach { f =>
      val img = Multimodal.Codecs.renderImage(
        docs(f.doc_id).getBytes("UTF-8"), f.decoded_w, f.decoded_h)
      val (_, _, _, expectedMean) = Multimodal.Codecs.decodeImage(
        Multimodal.Codecs.encodeImage(img, "png"))
      assert(math.abs(f.mean_byte - expectedMean) < 1e-12,
        s"doc ${f.doc_id}: PNG round-trip mean drifted")
    }
  }

  test("wav decode recovers the exact sample count and PCM values") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().filter(_.format == "wav")
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val expected = (f.doc_id % 768 + 256).toInt
      assert(f.decoded_w == expected,
        s"doc ${f.doc_id}: decoded $expected samples expected, got ${f.decoded_w}")
    }
    // WAV PCM is lossless: re-render one doc's samples and compare the mean.
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f = feats.head
    val samples = Multimodal.Codecs.renderSamples(
      docs(f.doc_id).getBytes("UTF-8"), f.decoded_w, f.doc_id)
    val (n, _, mean) = Multimodal.Codecs.decodeWav(Multimodal.Codecs.encodeWav(samples))
    assert(n == samples.length && math.abs(mean - f.mean_byte) < 1e-12)
  }

  test("thumbnails preserve aspect ratio, bound dims, and re-encode as real PNG") {
    val thumbs = Multimodal.thumbnails(Multimodal.mediaTable(spark, sf),
      maxW = 16, maxH = 16).collect()
    assert(thumbs.nonEmpty)
    thumbs.foreach { t =>
      assert(t.format != "wav")
      assert(t.thumb_w <= 16 && t.thumb_h <= 16 && t.thumb_w >= 1 && t.thumb_h >= 1)
      // aspect preserved within integer rounding
      val origRatio = t.orig_w.toDouble / t.orig_h
      val thumbRatio = t.thumb_w.toDouble / t.thumb_h
      assert(math.abs(origRatio - thumbRatio) / origRatio < 0.35,
        s"doc ${t.doc_id}: ratio drifted $origRatio -> $thumbRatio")
      // output is genuinely PNG and decodable at the reported dims
      assert(magic(t.thumb, "png"))
      val (w, h, _, _) = Multimodal.Codecs.decodeImage(t.thumb)
      assert(w == t.thumb_w && h == t.thumb_h)
    }
    // images already inside the bounds pass through unscaled
    val big = Multimodal.thumbnails(Multimodal.mediaTable(spark, sf),
      maxW = 4096, maxH = 4096).collect()
    big.foreach(t => assert(t.thumb_w == t.orig_w && t.thumb_h == t.orig_h))
  }

  test("partition-wise feature extraction is deterministic and normalized") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.mean_byte).toSeq == again.map(_.mean_byte).toSeq)
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, "histogram must normalize")
      assert(f.histogram.length == Multimodal.Codecs.bins)
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
