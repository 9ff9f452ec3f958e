package graft.ops

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
  * The actual codec step is STUBBED (this container carries no
  * image/audio libraries): [[FakeCodec.decode]] is a deterministic
  * stand-in keyed on the bytes, clearly marked, swappable for a real
  * JNI/library call. Everything around it — the binary schema, the
  * typed Dataset boundary, partition-wise batching, the feature
  * column layout — is real and tested (MultimodalSpec).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media row: bytes + metadata, as a training pipeline would stage
    * them after crawling (content in the row, not a URI, so the scan
    * is the only I/O). */
  case class MediaRow(doc_id: Long, format: String, width: Int, height: Int,
                      media: Array[Byte])

  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
                           histogram: Array[Double], mean_byte: Double)

  /** STUB boundary: a real build links an image/audio codec here.
    * Deterministic byte-level "decode" keeps the pipeline testable. */
  object FakeCodec {
    val bins = 16
    def decode(bytes: Array[Byte]): (Array[Double], Double) = {
      val hist = new Array[Double](bins)
      var sum = 0.0
      bytes.foreach { b =>
        val u = b & 0xFF
        hist(u * bins / 256) += 1.0
        sum += u
      }
      val n = math.max(bytes.length, 1)
      ((0 until bins).map(hist(_) / n).toArray, sum / n)
    }
  }

  /** Stage the documents table as a media table: utf-8 bytes play the
    * media blob; metadata derives deterministically from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("doc_id") % 640 + 32).cast(IntegerType).as("width"),
        (col("doc_id") % 480 + 32).cast(IntegerType).as("height"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Partition-wise feature extraction — the mapInPandas analog:
    * one JVM call per partition, streaming through the iterator. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (hist, mean) = FakeCodec.decode(r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, hist, mean)
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

  /** Registered (rows-only) query: feature extraction end-to-end.
    * The mean_byte/histogram values are deterministic, so ScalaTest
    * pins them; no SQL oracle (binary ops aren't expressible). */
  val features: Q = (s, d) => {
    extractFeatures(mediaTable(s, d)).toDF()
      .select(col("doc_id"), col("format"), col("n_bytes"),
        round(col("mean_byte"), 4).as("mean_byte"),
        round(element_at(col("histogram"), 1), 4).as("hist_bin0"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q38_multimodal_features" -> features, // rows-only: binary stub path
  )

  val oracle: Map[String, String] = Map.empty
}
