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

  final case class ResizedImage(
      doc_id: Long, orig_w: Long, orig_h: Long, out_w: Long, out_h: Long,
      scale: Double)

  /** Aspect-preserving fit-into-box resize plan: decode dims (stub), pick
    * scale = min(tw/w, th/h) rounded to 4 dp, emit output dims. The
    * pixel-resample step is the stubbed part; the per-record batch loop is
    * where a real SIMD/codec resize would run. One narrow projection-shaped
    * pass — no shuffle, scales linearly. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Long = 224L, targetH: Long = 224L): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map { r =>
          val f = decodeStub(r)
          // HALF_UP to match SQL round() semantics (half-even would flip
          // boundary values against an external checker)
          val scale = BigDecimal(math.min(
              targetW.toDouble / f.width, targetH.toDouble / f.height))
            .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
          ResizedImage(r.doc_id, f.width, f.height,
            math.floor(f.width * scale).toLong, math.floor(f.height * scale).toLong,
            scale)
        })
      }
      .toDF()
  }

  final case class SampledFrame(doc_id: Long, frame_idx: Long, byte_off: Long)

  /** Frame sampling plan for video-shaped payloads: the stub treats the
    * payload as `n_bytes / 100 + 1` fixed-size frames and emits every
    * `everyN`-th frame's (index, byte offset) — the fan-out row shape real
    * frame extraction has (one input row → many frame rows), batched
    * partition-locally, no shuffle. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      everyN: Long = 4L): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.flatMap { r =>
          val nFrames = r.media.length.toLong / 100L + 1L
          (0L until nFrames by everyN).iterator
            .map(i => SampledFrame(r.doc_id, i, i * 100L))
        })
      }
      .toDF()
  }
}
