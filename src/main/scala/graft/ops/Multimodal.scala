package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch functions — the
  * Scala/JVM shape of the mapInPandas pattern (iterator-of-batches in,
  * iterator-of-batches out; the executor never materializes the whole
  * partition).
  *
  * The codec boundary is REAL, using only JDK-shipped codecs (no
  * external libraries): PNG and JPEG rows are encoded/decoded with
  * `javax.imageio.ImageIO`, WAV rows with `javax.sound.sampled`
  * (PCM 16-bit mono). The media table stages genuine encoded bytes
  * (PNG magic `\x89PNG`, JPEG `\xFFD8`, RIFF/WAVE headers) rendered
  * deterministically from each document's text, and feature
  * extraction decodes those bytes back to pixels/samples before
  * computing histograms — so q38 exercises an actual
  * bytes→codec→features path end-to-end, executor-side.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row: bytes + metadata, as a training pipeline would stage
    * them after crawling (content in the row, not a URI, so the scan
    * is the only I/O). */
  case class MediaRow(doc_id: Long, format: String, width: Int, height: Int,
                      media: Array[Byte])

  /** Decoded features. For images `decoded_w/decoded_h` are the pixel
    * dimensions read back from the codec; for audio `decoded_w` is the
    * sample count and `decoded_h` is 1. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
                           decoded_w: Int, decoded_h: Int,
                           histogram: Array[Double], mean_byte: Double)

  /** JDK-only codecs. Image side: `ImageIO` (PNG lossless, JPEG
    * lossy); audio side: `javax.sound.sampled` WAV (PCM 16-bit LE
    * mono, 8 kHz). All encode/decode calls are per-row, thread-safe
    * (fresh reader/writer per call), and run on executors inside
    * mapPartitions. `ImageIO.setUseCache(false)` keeps the codec off
    * the executor's local disk. */
  object Codecs {
    val bins = 16
    locally {
      // BufferedImage needs no display, but pin headless so the AWT
      // toolkit never probes for one on an executor.
      System.setProperty("java.awt.headless", "true")
      ImageIO.setUseCache(false)
    }
    private val wavFormat = new AudioFormat(8000f, 16, 1, true, false)

    /** Deterministic pixel pattern: the document's text bytes tiled
      * across the raster, mixed with the coordinates so the histogram
      * is non-degenerate. Pure function of (text, w, h). */
    def renderImage(text: Array[Byte], w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val n = math.max(text.length, 1)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val t = if (text.isEmpty) 0 else text((y * w + x) % n) & 0xFF
          val r = t
          val g = (t + x * 7) & 0xFF
          val b = (t + y * 13) & 0xFF
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    def encodeImage(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
      out.toByteArray
    }

    /** Deterministic PCM samples: a doc-keyed sine carrier modulated
      * by the text bytes. Pure function of (text, nSamples, seed). */
    def renderSamples(text: Array[Byte], nSamples: Int, seed: Long): Array[Short] = {
      val n = math.max(text.length, 1)
      Array.tabulate(nSamples) { i =>
        val t = if (text.isEmpty) 0 else text(i % n) & 0xFF
        val phase = 2.0 * math.Pi * i * ((seed % 37) + 3) / 128.0
        ((math.sin(phase) * 12000) + (t - 128) * 64).toInt
          .max(Short.MinValue).min(Short.MaxValue).toShort
      }
    }

    def encodeWav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xFF).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), wavFormat, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode an image via ImageIO and reduce to a normalized 16-bin
      * luminance histogram + mean luminance (0..255). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Double], Double) = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "ImageIO could not decode media bytes")
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Double](bins)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
          hist(lum * bins / 256) += 1.0
          sum += lum
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ((w, h, hist.map(_ / n), sum / n))
    }

    /** Decode a WAV via javax.sound and reduce to a normalized 16-bin
      * amplitude histogram + mean, with samples mapped to 0..255 via
      * the high byte (so image and audio features share a scale). */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Double], Double) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val pcm = ais.readAllBytes()
      ais.close()
      val nSamples = pcm.length / 2
      val hist = new Array[Double](bins)
      var sum = 0.0
      var i = 0
      while (i < nSamples) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort
        val u = (s >> 8) + 128 // 0..255
        hist(u * bins / 256) += 1.0
        sum += u
        i += 1
      }
      val n = math.max(nSamples, 1)
      ((nSamples, hist.map(_ / n), sum / n))
    }
  }

  /** Stage the documents table as a media table holding REAL encoded
    * media: each row's text renders to a tiny deterministic image
    * (PNG or JPEG via ImageIO) or waveform (WAV via javax.sound),
    * cycling formats by doc_id. Dimensions stay small (≤63×47 px /
    * ≤1023 samples) so the table is cheap at bench scale while the
    * codec path stays genuine. Encoding happens executor-side in the
    * same mapPartitions shape the decode uses. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // r15: the synthetic media corpus is FIXTURE GENERATION (text →
    // encoded PNG/JPEG/WAV bytes), not the codec operator any q38*
    // query audits — yet all six of them re-encoded the whole corpus
    // per call. Build it once per (JVM, corpus) into a scratch store
    // (the trade-edges/keeper-closure sharing discipline); every
    // consumer's real work — decode, thumbnail, perceptual hash —
    // still runs from the stored bytes per call. Rows are
    // deterministic in (doc_id, text), so the store is
    // content-equivalent to the inline generation it replaces.
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (key, _) = ScratchStores.corpusKey(docs, dir)
    val path = ScratchStores.pathFor(key, "graft-media-table") { p =>
      mediaRowsOf(docs).write.mode("overwrite").parquet(p)
    }
    spark.read.parquet(path).as[MediaRow]
  }

  private def mediaRowsOf(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val fmt = (id % 3) match {
            case 0 => "png"
            case 1 => "jpeg"
            case _ => "wav"
          }
          val textBytes = text.getBytes("UTF-8")
          fmt match {
            case "wav" =>
              val nSamples = (id % 768 + 256).toInt
              val bytes = Codecs.encodeWav(
                Codecs.renderSamples(textBytes, nSamples, id))
              MediaRow(id, fmt, nSamples, 1, bytes)
            case imgFmt =>
              val w = (id % 48 + 16).toInt
              val h = (id % 32 + 16).toInt
              val bytes = Codecs.encodeImage(
                Codecs.renderImage(textBytes, w, h), imgFmt)
              MediaRow(id, imgFmt, w, h, bytes)
          }
        }
      }
  }

  /** Partition-wise feature extraction — the mapInPandas analog:
    * one JVM call per partition, streaming through the iterator.
    * Dispatches to the real codec per format. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.format match {
          case "wav" =>
            val (n, hist, mean) = Codecs.decodeWav(r.media)
            MediaFeatures(r.doc_id, r.format, r.media.length, n, 1, hist, mean)
          case _ =>
            val (w, h, hist, mean) = Codecs.decodeImage(r.media)
            MediaFeatures(r.doc_id, r.format, r.media.length, w, h, hist, mean)
        }
      }
    }
  }

  /** Decode → bilinear-resize → re-encode, the thumbnailing step of
    * an image pipeline, on real JDK machinery (Graphics2D drawImage
    * with bilinear interpolation; deterministic for a given JDK).
    * Aspect ratio is preserved and images already within bounds pass
    * through unscaled. Audio rows pass through untouched. */
  case class Thumb(doc_id: Long, format: String, orig_w: Int, orig_h: Int,
                   thumb_w: Int, thumb_h: Int, thumb_bytes: Int,
                   thumb: Array[Byte])

  def resizeImage(img: BufferedImage, maxW: Int, maxH: Int): BufferedImage = {
    val scale = math.min(1.0,
      math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
    if (scale >= 1.0) img
    else {
      val w = math.max(1, math.round(img.getWidth * scale).toInt)
      val h = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      out
    }
  }

  /** Partition-wise thumbnailing of the image rows (PNG output for
    * lossless downstream reads regardless of input format). */
  def thumbnails(media: Dataset[MediaRow], maxW: Int = 16,
                 maxH: Int = 16): Dataset[Thumb] = {
    import media.sparkSession.implicits._
    media.filter(r => r.format != "wav").mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        require(img != null, s"undecodable media for doc ${r.doc_id}")
        val small = resizeImage(img, maxW, maxH)
        val bytes = Codecs.encodeImage(small, "png")
        Thumb(r.doc_id, r.format, img.getWidth, img.getHeight,
          small.getWidth, small.getHeight, bytes.length, bytes)
      }
    }
  }

  /** Frame sampling: slice the blob into fixed-size "frames" and keep
    * every k-th — the video-pipeline access pattern (explode keeps it
    * one row per frame, partition-local). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
                   every: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (frame, i) => (r.doc_id, i, frame.length, frame) }
    }.toDF("doc_id", "frame_no", "frame_bytes", "frame")
  }

  /** Registered (rows-only) query: encode→decode→featurize
    * end-to-end through the real JDK codecs. Deterministic (pure
    * functions of doc text + id), so ScalaTest pins round-trip
    * exactness for the lossless legs; no SQL oracle (codec ops
    * aren't expressible). */
  val features: Q = (s, d) => {
    extractFeatures(mediaTable(s, d)).toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("decoded_w"), col("decoded_h"),
        round(col("mean_byte"), 4).as("mean_byte"),
        round(element_at(col("histogram"), 1), 4).as("hist_bin0"))
      .orderBy(col("doc_id"))
  }

  /** Registered (rows-only) query: decode→resize→re-encode through
    * the real codec, reporting dims and re-decoded thumbnail stats
    * (decoding our own thumbnail proves the re-encode leg). */
  val thumbs: Q = (s, d) => {
    import s.implicits._
    thumbnails(mediaTable(s, d)).mapPartitions { rows =>
      rows.map { t =>
        val (w, h, _, mean) = Codecs.decodeImage(t.thumb)
        (t.doc_id, t.format, t.orig_w, t.orig_h, w, h, t.thumb_bytes, mean)
      }
    }.toDF("doc_id", "format", "orig_w", "orig_h", "thumb_w", "thumb_h",
        "thumb_bytes", "thumb_mean")
      .select(col("doc_id"), col("format"), col("orig_w"), col("orig_h"),
        col("thumb_w"), col("thumb_h"), col("thumb_bytes"),
        round(col("thumb_mean"), 4).as("thumb_mean"))
      .orderBy(col("doc_id"))
  }

  // ---- image near-dup dedup (perceptual hash) ------------------------

  /** 64-bit average-hash (aHash) of an image: bilinear 8x8
    * downsample, per-cell luminance, one bit per cell thresholded at
    * the mean. The classic perceptual fingerprint — re-encoding
    * (PNG<->JPEG), mild rescaling, and small pixel noise move it a
    * few bits; unrelated images differ in ~32. Deterministic for a
    * given JDK, like every codec leg here. */
  def perceptualHash(img: BufferedImage): Long = {
    val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val lum = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      lum(i) = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
        114 * (rgb & 0xFF)) / 1000
      sum += lum(i)
      i += 1
    }
    val mean = sum / 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** 64-bit DCT perceptual hash (pHash — the second image tier,
    * VERDICT r6 #7): 32x32 bilinear luminance downsample, 2-D DCT-II
    * (unnormalized, the public pHash/imagehash convention), keep the
    * top-left 8x8 low-frequency block, one bit per coefficient
    * thresholded at the block's MEDIAN. [[perceptualHash]] (aHash)
    * thresholds raw intensities at their mean, which is brittle under
    * gamma/contrast maps — a monotone intensity shift moves every
    * pixel AND the mean, flipping whichever bits sat near it. The DCT
    * form compares low-frequency STRUCTURE against its own median
    * instead: a monotone map rescales the AC spectrum roughly
    * uniformly, so the above/below-median pattern survives shifts
    * that flip aHash bits (MultimodalSpec pins a gamma copy the aHash
    * radius-6 band loses and this tier keeps). The honest caveat,
    * measured in ProbeDct: the stability argument needs BROADBAND
    * low-frequency content (photographs, textures) — on a
    * sparse-spectrum synthetic most of the 8x8 block is near-zero and
    * those bits wobble a few positions under any re-encode, which is
    * why q38f runs NEXT TO q38c as a second tier, not instead of it.
    * Same cost class (one 32x32 resample + a 32->8 partial DCT per
    * image), same downstream machinery — the hash drops into the
    * chunk-bucket pair join unchanged. Deterministic pure-JVM
    * arithmetic like every codec leg here. */
  def dctHash(img: BufferedImage): Long = {
    val n = 32
    val small = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, n, n, null)
    g.dispose()
    val lum = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val rgb = small.getRGB(x, y)
        lum(y)(x) = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000.0
        x += 1
      }
      y += 1
    }
    // separable partial DCT-II: only the first 8 frequencies of each
    // dimension are kept, so compute 8 columns, not 32
    val cosT = Array.tabulate(8, n)((k, i) =>
      math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n)))
    val rows8 = Array.ofDim[Double](n, 8) // DCT along x, 8 freqs
    y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < n) { s += lum(y)(x) * cosT(u)(x); x += 1 }
        rows8(y)(u) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](64) // DCT along y over the 8 columns
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rows8(yy)(u) * cosT(v)(yy); yy += 1 }
        block(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val sorted = block.clone().sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var h = 0L
    var i = 0
    while (i < 64) { if (block(i) > median) h |= (1L << i); i += 1 }
    h
  }

  /** (doc_id, phash) for the IMAGE rows — the codec boundary is this
    * one mapPartitions; everything after is plain int64 columns. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame =
    imageHashesWith(media, perceptualHash)

  /** [[imageHashes]] with the DCT tier's hash — identical plumbing. */
  def dctImageHashes(media: Dataset[MediaRow]): DataFrame =
    imageHashesWith(media, dctHash)

  private def imageHashesWith(media: Dataset[MediaRow],
                              hashOf: BufferedImage => Long): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => r.format != "wav").mapPartitions { rows =>
      rows.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.media))
        require(img != null, s"undecodable media for doc ${r.doc_id}")
        (r.doc_id, hashOf(img))
      }
    }.toDF("doc_id", "phash")
  }

  /** Near-dup PAIRS at Hamming <= `radius` over 64-bit perceptual
    * hashes (modality-blind: images via [[perceptualHash]], audio via
    * [[envelopeHash]]) — [[Dedup]]'s simhash tier applied to media:
    * identical hashes collapse to one representative first (n
    * re-posts of one asset are 1 index row, their pairs reconstructed
    * at Hamming 0), candidates come from the four disjoint 16-bit
    * chunk buckets (pigeonhole: Hamming <= 3 cannot miss all four;
    * wider radii trade recall exactly like the text tier), buckets
    * are capped at [[Dedup.bucketCap]] lowest ids, and every exchange
    * carries (id, long) — never media bytes. */
  /** The exploded (doc_id, phash, chunk, ckey) bucket view: four
    * disjoint 16-bit chunks per 64-bit hash (the simhash chunk
    * geometry). */
  private[ops] def phashChunkIndex(hashes: DataFrame): DataFrame = {
    val chunks = (0 until 4).map(c => struct(lit(c).as("chunk"),
      shiftright(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey")))
    hashes.select(col("doc_id"), col("phash"), explode(array(chunks: _*)).as("tb"))
      .select(col("doc_id"), col("phash"),
        col("tb.chunk").as("chunk"), col("tb.ckey").as("ckey"))
  }

  def phashNearDupPairs(hashes: DataFrame, radius: Int = 3): DataFrame = {
    val members = hashes.select(col("phash"), col("doc_id"))
    val reps = hashes.groupBy(col("phash")).agg(min(col("doc_id")).as("doc_id"))
    val idx = Dedup.capBuckets(phashChunkIndex(reps), Seq("chunk", "ckey"), "doc_id")
    val repPairs = idx.select(col("chunk"), col("ckey"),
        col("doc_id").as("ra"), col("phash").as("ph_a"))
      .join(idx.select(col("chunk"), col("ckey"),
        col("doc_id").as("rb"), col("phash").as("ph_b")), Seq("chunk", "ckey"))
      .filter(col("ra") < col("rb"))
      .dropDuplicates("ra", "rb")
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= radius)
      .select(col("ph_a"), col("ph_b"), col("hamming"))
    val cross = repPairs
      .join(members.select(col("phash").as("ph_a"), col("doc_id").as("ma")), Seq("ph_a"))
      .join(members.select(col("phash").as("ph_b"), col("doc_id").as("mb")), Seq("ph_b"))
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("hamming"))
    val within = members.select(col("phash"), col("doc_id").as("doc_a"))
      .join(members.select(col("phash"), col("doc_id").as("doc_b")), Seq("phash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }

  /** 64-bit amplitude-envelope hash of PCM samples — the audio twin
    * of [[perceptualHash]]: the clip is split into 64 equal windows,
    * each window reduced to its mean |amplitude|, and each bit set
    * iff its window is louder than the clip mean. VOLUME-invariant by
    * construction (uniform gain scales every window and the mean
    * alike), tolerant of small edits localized to few windows;
    * unrelated clips differ in ~32 bits. Works on the decoded sample
    * array, so the codec boundary stays in the caller's
    * mapPartitions. */
  def envelopeHash(samples: Array[Short]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val win = new Array[Double](64)
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 64 / n).toInt
      win(w) += math.abs(samples(i).toDouble)
      cnt(w) += 1
      i += 1
    }
    var mean = 0.0
    var w = 0
    while (w < 64) {
      if (cnt(w) > 0) win(w) /= cnt(w)
      mean += win(w)
      w += 1
    }
    mean /= 64.0
    var h = 0L
    w = 0
    while (w < 64) { if (win(w) > mean) h |= (1L << w); w += 1 }
    h
  }

  /** (doc_id, phash) for the AUDIO rows: decode WAV -> PCM ->
    * envelope hash, one mapPartitions at the codec boundary. The
    * resulting hashes pair through the same [[imageNearDupPairs]]
    * machinery (it is modality-blind: chunk buckets + Hamming over
    * int64). */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => r.format == "wav").mapPartitions { rows =>
      rows.map { r =>
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
        val pcm = ais.readAllBytes()
        ais.close()
        val samples = Array.tabulate(pcm.length / 2)(i =>
          ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort)
        (r.doc_id, envelopeHash(samples))
      }
    }.toDF("doc_id", "phash")
  }

  /** The dedup-audit report body shared by q38c/q38d: pair counts per
    * Hamming band plus corpus-side totals, the numbers a curator
    * reads before trusting a media-dedup pass (the q34b shape for
    * media). Bands are STATIC rows so the report has a fixed 3-row
    * schema on any corpus, including the zero-pair one — this driver
    * corpus renders unrelated media, so zeros here are the true
    * answer; the planted-truth quality bars live in MultimodalSpec. */
  private def phashBandReport(s: SparkSession, hashes0: DataFrame): DataFrame = {
    import s.implicits._
    // materialized (two-consumer rule): reps + members + count subtrees
    val hashes = Dedup.materializedSketch(hashes0)
    val pairs = phashNearDupPairs(hashes, radius = 6)
      .withColumn("band",
        when(col("hamming") === 0, "h0_identical")
          .when(col("hamming") <= 3, "h1_3_near")
          .otherwise("h4_6_similar"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_pairs"))
    val bands = Seq("h0_identical", "h1_3_near", "h4_6_similar").toDF("band")
    bands.join(pairs, Seq("band"), "left")
      .select(col("band"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .crossJoin(broadcast(hashes.agg(
        count(lit(1)).as("n_assets"),
        countDistinct(col("phash")).as("n_distinct_hashes"))))
      .orderBy(col("band"))
  }

  /** q38c: image near-dup audit (aHash). */
  val imageDedupReport: Q = (s, d) => phashBandReport(s, imageHashes(mediaTable(s, d)))

  /** q38f: image near-dup audit, DCT-pHash tier — the same band
    * report over [[dctImageHashes]]; catches gamma/contrast-shifted
    * copies the aHash tier (q38c) misses. */
  val imageDctDedupReport: Q = (s, d) => phashBandReport(s, dctImageHashes(mediaTable(s, d)))

  /** q38d: audio near-dup audit (amplitude-envelope hash). */
  val audioDedupReport: Q = (s, d) => phashBandReport(s, audioHashes(mediaTable(s, d)))

  /** Incremental image dedup (q38e): pair an ingest DELTA's images
    * against the standing corpus's STORED perceptual hashes — the
    * q61/q67c operating mode for pixels. The standing corpus
    * contributes 8 bytes per image from a [[PhashIndexStore]]
    * (committed as round 0 per (JVM, corpus content), appended per
    * ingest round in a real pipeline, compactable); only the delta
    * crosses the codec boundary. Steady-state cost: O(delta) decode +
    * an id-only bucket join. Output is the (n_delta, n_corpus,
    * n_pairs) accounting row plus per-band pair counts — the audit a
    * curator reads per ingest round. */
  val imageDedupIncremental: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val (key, wm) = ScratchStores.corpusKey(docs, d)
    val path = ScratchStores.pathFor(key, "graft-phash-index") { p =>
      new PhashIndexStore(s, p).appendRound(
        imageHashes(mediaTable(s, d).filter(r => r.doc_id <= wm)), round = 0L)
    }
    val store = new PhashIndexStore(s, path)
    // materialized (two-consumer rule): pair join + accounting read
    // delta concurrently; pairs feeds the 3-band join twice
    val delta = Dedup.materializedSketch(
      imageHashes(mediaTable(s, d).filter(r => r.doc_id > wm)))
    val pairs = Dedup.materializedSketch(store.newPairsAgainst(delta, radius = 6))
    val bands = Seq("h0_identical", "h1_3_near", "h4_6_similar").toDF("band")
    bands.join(
        pairs.withColumn("band",
            when(col("hamming") === 0, "h0_identical")
              .when(col("hamming") <= 3, "h1_3_near")
              .otherwise("h4_6_similar"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_pairs")),
        Seq("band"), "left")
      .select(col("band"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .crossJoin(broadcast(delta.agg(count(lit(1)).as("n_delta_assets"))))
      .crossJoin(broadcast(store.index.agg(count(lit(1)).as("n_corpus_assets"))))
      .orderBy(col("band"))
  }

  val queries: Map[String, Q] = Map(
    "q38_multimodal_features" -> features, // rows-only: codec path not SQL-expressible
    "q38b_multimodal_thumbnails" -> thumbs, // rows-only: resize leg
    "q38c_image_phash_dedup" -> imageDedupReport, // rows-only: perceptual-hash audit
    "q38d_audio_phash_dedup" -> audioDedupReport, // rows-only: envelope-hash audit
    "q38e_image_dedup_incremental" -> imageDedupIncremental, // rows-only: stored-index delta mode
    "q38f_image_dct_dedup" -> imageDctDedupReport, // rows-only: DCT-pHash second tier
  )

  val oracle: Map[String, String] = Map.empty
}

/** The STORED half of incremental image dedup (q38e): a persistent
  * parquet artifact of `(doc_id, phash, ingest_round)` — 16 bytes per
  * image — appended once per ingest round with the same
  * dynamic-partition-overwrite idempotence as the other round stores
  * and compactable through [[CompactableRoundStore]]. The delta pair
  * join reads it pre-bucketed on the delta's own chunk keys, so a
  * dedup round costs O(delta x bucket collisions), never O(corpus),
  * and the corpus never re-decodes a single image. */
class PhashIndexStore(spark: SparkSession, val path: String)
    extends CompactableRoundStore {

  override protected def storeSpark: SparkSession = spark
  /** Hash rows are doc-disjoint across rounds: folding is identity. */
  override protected def mergeRounds(rows: DataFrame): DataFrame = rows

  def exists: Boolean = graft.flights.StarWarehouse.pathExists(spark, path)

  /** The standing (doc_id, phash) index across committed rounds. */
  def index: DataFrame = readAll

  /** Commit `hashes` (doc_id, phash) as ingest round `round` —
    * idempotent under retry (partition overwrite). */
  def appendRound(hashes: DataFrame, round: Long): Unit =
    commitRound(hashes.select(col("doc_id"), col("phash")), round)

  /** Near-dup pairs between a DELTA's hashes and the standing corpus:
    * delta-bucket x corpus-bucket join (no delta x delta, no
    * corpus x corpus), Hamming-verified. `beforeRound` is the
    * streaming replay guard, as everywhere. */
  def newPairsAgainst(deltaHashes: DataFrame, radius: Int = 3,
                      beforeRound: Option[Long] = None): DataFrame = {
    val deltaIdx = Multimodal.phashChunkIndex(
        deltaHashes.select(col("doc_id"), col("phash")))
      .select(col("chunk"), col("ckey"),
        col("doc_id").as("new_doc"), col("phash").as("ph_n"))
    val corpusIdx = Multimodal.phashChunkIndex(
        beforeRound.foldLeft(index)((ix, r) =>
          ix.filter(col("ingest_round") < r))
          .select(col("doc_id"), col("phash")))
      .select(col("chunk"), col("ckey"),
        col("doc_id").as("old_doc"), col("phash").as("ph_o"))
    deltaIdx.join(corpusIdx, Seq("chunk", "ckey"))
      .dropDuplicates("new_doc", "old_doc")
      .withColumn("hamming", bit_count(col("ph_n").bitwiseXOR(col("ph_o"))))
      .filter(col("hamming") <= radius)
      .select(col("new_doc"), col("old_doc"), col("hamming"))
  }
}
