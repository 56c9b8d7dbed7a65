package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked deterministic STUB (image/audio codec
  * libraries are not available in this environment); the Spark-side plumbing
  * is real and is the point: schema, `Dataset[T]` encoders, batched
  * `mapPartitions` iteration (the Scala analogue of `mapInPandas` — the
  * batch loop is where a vectorized decoder would run), and a narrow,
  * shuffle-free plan that scales linearly.
  */
object Multimodal {

  /** A media row: binary payload + id. In a real pipeline the payload is a
    * JPEG/PNG/WAV blob column read straight from parquet. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Extracted features. Longs everywhere for stable cross-engine compare. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

  val BatchSize = 64

  /** Attach a binary media column (here: utf-8 bytes of the text — the
    * fixtures ship no real media; the column is genuinely `binary` so the
    * downstream plumbing is exercised for real). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would decode image headers / sample frames here,
    * one batch at a time (batch shape mirrors Arrow-batch processing). */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length.toLong
    MediaFeatures(r.doc_id, n, 64L + n % 640L, 64L + (n * 7L) % 480L, "fake/raw")
  }

  /** Batched partition-local feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // grouped(): explicit batch boundary — a vectorized decoder (or an
        // Arrow batch handoff) would process `batch` as one unit
        it.grouped(BatchSize).flatMap { batch => batch.iterator.map(decodeStub) }
      }
      .toDF()
  }
}
