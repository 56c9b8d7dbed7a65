package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed in partition-local batches.
  *
  * The header decoders are REAL byte-level parsers (PNG IHDR, JPEG SOFn
  * marker scan, GIF logical screen descriptor, WAV RIFF/fmt chunk walk) —
  * no codec library needed for container metadata. Pixel decode / resample
  * stays out of scope (no codec libs in this environment); what a training
  * pipeline needs from a 100 TB media column first is exactly this: cheap,
  * shuffle-free header metadata (dims, sample rate, duration, corruption
  * flags) to route/filter payloads before any expensive decode.
  *
  * Scale shape: every op here is one batched `mapPartitions` pass over the
  * binary column (the batch loop is where a vectorized/Arrow decoder would
  * slot in) — a narrow projection, no shuffle, linear in bytes scanned.
  */
object Multimodal {

  /** A media row: binary payload + id. In a real pipeline the payload is a
    * JPEG/PNG/WAV blob column read straight from parquet. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Decoded container metadata. Image formats fill width/height; audio
    * fills sample_rate/channels/duration_ms; undecodable payloads are
    * format="unknown" with all metadata NULL (never an exception — corrupt
    * bytes are data, not errors, at corpus scale). */
  final case class DecodedMedia(
      doc_id: Long, format: String,
      width: Option[Long], height: Option[Long],
      sample_rate: Option[Long], channels: Option[Long],
      duration_ms: Option[Long], n_bytes: Long)

  val BatchSize = 64

  /** Attach a binary media column (utf-8 bytes of the text — used by ops
    * that only need *a* binary payload, e.g. frame sampling). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  // ---------------------------------------------------------------------
  // Fixture synthesis: real container bytes, deterministic from doc_id.
  // Dimensions/rates are simple arithmetic in doc_id so an external oracle
  // can recompute the expected decode output WITHOUT parsing bytes — the
  // decoder below never sees doc_id arithmetic, only the payload.
  // ---------------------------------------------------------------------

  /** doc_id % 5: 0=PNG, 1=JPEG, 2=GIF, 3=WAV, 4=corrupt (truncated sig). */
  private[graft] def synthPayload(id: Long): Array[Byte] = (id % 5) match {
    case 0 => pngBytes(1 + id % 512, 1 + (id * 3) % 512, (id % 100).toInt)
    case 1 => jpegBytes(1 + id % 1024, 1 + (id * 7) % 1024, (id % 100).toInt)
    case 2 => gifBytes(1 + id % 600, 1 + (id * 5) % 400)
    case 3 => wavBytes(1 + id % 2, 8000 * (1 + (id / 5) % 5), (1000 + (id % 4500) * 2).toInt)
    case _ => Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++
      Array.fill((id % 7).toInt)(0.toByte) // PNG sig cut mid-signature
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32; crc.update(t); crc.update(data)
    ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
  }

  /** 8-byte signature + IHDR(13) + IDAT(filler) + IEND. Size 57+filler. */
  private[graft] def pngBytes(w: Long, h: Long, filler: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = ByteBuffer.allocate(13).putInt(w.toInt).putInt(h.toInt)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    sig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", Array.fill(filler)(0xAB.toByte)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** SOI + APP0(JFIF) + COM(filler) + DQT + SOF0 + EOI. Size 114+filler.
    * The COM and DQT segments before SOF0 force the decoder to actually
    * walk the marker stream, not grab a fixed offset. */
  private[graft] def jpegBytes(w: Long, h: Long, filler: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m); val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF); out.write(payload)
    }
    marker(0xD8) // SOI
    seg(0xE0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0, 14-byte JFIF payload
    seg(0xFE, Array.fill(filler)('c'.toByte)) // COM
    seg(0xDB, Array.fill(65)(1.toByte)) // DQT: pq/tq + 64 entries
    val sof = ByteBuffer.allocate(15).put(8.toByte)
      .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)).array()
    seg(0xC0, sof) // SOF0 baseline
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** GIF89a header + logical screen descriptor + trailer. Size 14. */
  private[graft] def gifBytes(w: Long, h: Long): Array[Byte] =
    ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
      .put("GIF89a".getBytes("US-ASCII"))
      .putShort(w.toShort).putShort(h.toShort)
      .put(0x70.toByte).put(0.toByte).put(0.toByte)
      .put(0x3B.toByte).array()

  /** Canonical 44-byte RIFF/WAVE header (PCM16) + silent data chunk. */
  private[graft] def wavBytes(ch: Long, rate: Long, dataLen: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort) // PCM, channels
      .putInt(rate.toInt).putInt((rate * ch * 2).toInt) // rate, byte rate
      .putShort((ch * 2).toShort).putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array() // data bytes stay zero (silence)
  }

  /** Synthesize a real media payload per document (format round-robin by
    * doc_id). One narrow mapPartitions pass — the fixture side of the
    * decode round-trip. */
  def synthesizeMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map(id => MediaRecord(id, synthPayload(id))))
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Byte-level header decoders. Bounds-checked; any structural violation
  // (bad signature, truncated chunk, CRC mismatch) → None, never a throw.
  // ---------------------------------------------------------------------

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => b(i + k) == s.charAt(k).toByte)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: full 8-byte signature, first chunk must be IHDR (per spec) with
    * length 13 and a valid CRC32 over type+data. */
  private[graft] def decodePng(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 8 + 25 || !PngSig.indices.forall(i => b(i) == PngSig(i))) return None
    if (be32(b, 8) != 13L || !ascii(b, 12, "IHDR")) return None
    val crc = new CRC32; crc.update(b, 12, 4 + 13)
    if ((crc.getValue & 0xFFFFFFFFL) != be32(b, 29)) return None
    Some((be32(b, 16), be32(b, 20)))
  }

  /** JPEG: SOI then walk the marker segments (skipping APPn/COM/DQT/...)
    * until a SOFn frame header; dims live there as BE16 height, width. */
  private[graft] def decodeJpeg(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var pos = 2
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) return None
      val m = b(pos + 1) & 0xFF
      if (m == 0xD9) return None // EOI before any SOF
      val segLen = be16(b, pos + 2)
      if (segLen < 2 || pos + 2 + segLen > b.length) return None
      val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
      if (isSof) {
        if (segLen < 7) return None
        return Some((be16(b, pos + 7).toLong, be16(b, pos + 5).toLong)) // (w, h)
      }
      pos += 2 + segLen
    }
    None
  }

  /** GIF: GIF87a/GIF89a signature + LE16 logical screen dims. */
  private[graft] def decodeGif(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 10) return None
    if (!ascii(b, 0, "GIF87a") && !ascii(b, 0, "GIF89a")) return None
    Some((le16(b, 6).toLong, le16(b, 8).toLong))
  }

  /** WAV: RIFF/WAVE container; walk chunks (word-aligned) to find `fmt `
    * (rate, channels, byte rate) and `data` (payload size → duration). */
  private[graft] def decodeWav(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
    var pos = 12
    var rate = -1L; var ch = -1L; var byteRate = -1L; var dataLen = -1L
    while (pos + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val size = le32(b, pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return None
      if (ascii(b, pos, "fmt ") && size >= 16) {
        ch = le16(b, pos + 10).toLong
        rate = le32(b, pos + 12)
        byteRate = le32(b, pos + 16)
      } else if (ascii(b, pos, "data")) dataLen = size
      pos += 8 + size.toInt + (size.toInt & 1) // odd chunks are padded
    }
    if (rate <= 0 || ch <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some((rate, ch, dataLen * 1000L / byteRate))
  }

  /** Decode one payload to typed metadata; never throws. */
  private[graft] def decodeHeader(id: Long, b: Array[Byte]): DecodedMedia = {
    val n = b.length.toLong
    decodePng(b).map { case (w, h) =>
      DecodedMedia(id, "png", Some(w), Some(h), None, None, None, n)
    }.orElse(decodeJpeg(b).map { case (w, h) =>
      DecodedMedia(id, "jpeg", Some(w), Some(h), None, None, None, n)
    }).orElse(decodeGif(b).map { case (w, h) =>
      DecodedMedia(id, "gif", Some(w), Some(h), None, None, None, n)
    }).orElse(decodeWav(b).map { case (rate, ch, dur) =>
      DecodedMedia(id, "wav", None, None, Some(rate), Some(ch), Some(dur), n)
    }).getOrElse(
      DecodedMedia(id, "unknown", None, None, None, None, None, n))
  }

  /** Batched partition-local header decode over a binary media column. */
  def decodeHeaders(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // grouped(): explicit batch boundary — a vectorized decoder (or an
        // Arrow batch handoff) would process `batch` as one unit
        it.grouped(BatchSize).flatMap(_.iterator.map(r => decodeHeader(r.doc_id, r.media)))
      }
      .toDF()
  }

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Option[Long], height: Option[Long],
      format: String)

  /** Image-feature projection of the header decode (dims + format). */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map { r =>
          val d = decodeHeader(r.doc_id, r.media)
          MediaFeatures(d.doc_id, d.n_bytes, d.width, d.height, d.format)
        })
      }
      .toDF()
  }

  final case class ResizedImage(
      doc_id: Long, orig_w: Long, orig_h: Long, out_w: Long, out_h: Long,
      scale: Double)

  /** Aspect-preserving fit-into-box resize plan over decoded image dims:
    * scale = min(tw/w, th/h) rounded to 4 dp, emit output dims. Non-image
    * payloads (no dims) are dropped. The pixel-resample step is where a
    * SIMD/codec resize would run; the routing metadata is the real part. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      targetW: Long = 224L, targetH: Long = 224L): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.flatMap { r =>
          val d = decodeHeader(r.doc_id, r.media)
          for (w <- d.width; h <- d.height) yield {
            // HALF_UP to match SQL round() semantics (half-even would flip
            // boundary values against an external checker)
            val scale = BigDecimal(math.min(
                targetW.toDouble / w, targetH.toDouble / h))
              .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
            ResizedImage(r.doc_id, w, h,
              math.floor(w * scale).toLong, math.floor(h * scale).toLong, scale)
          }
        })
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Perceptual image hashing: real uncompressed BMP payloads (the one
  // mainstream image container with codec-free pixel access), a real
  // byte-level pixel decoder, and dHash over the decoded luma — the
  // missing image counterpart of the text dedup families. Pixel values in
  // the fixture are arithmetic in doc_id (like the dims above) so an
  // external oracle recomputes the hash without parsing bytes; the
  // engine-side decoder only ever sees the payload.
  // ---------------------------------------------------------------------

  /** Real 24bpp BITMAPINFOHEADER BMP: 14-byte file header, 40-byte info
    * header, BGR rows padded to 4 bytes, BOTTOM-UP row order (positive
    * height, per the format). `px(x, y)` is the grayscale value at
    * TOP-DOWN coordinates. */
  private[graft] def bmpBytes(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataLen = rowBytes * h
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-array offset
    bb.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val y = h - 1 - row // bottom-up storage
      for (x <- 0 until w) {
        val v = (px(x, y) & 0xFF).toByte
        bb.put(v).put(v).put(v) // grayscale: B = G = R
      }
      for (_ <- w * 3 until rowBytes) bb.put(0.toByte)
    }
    bb.array()
  }

  /** Fixture BMPs, deterministic from doc_id: 27×16 grayscale gradient
    * `px(x, y) = (17·(id/4) + 7x + 13y + id%4) mod 256` — docs sharing
    * `id/4` differ only by a tiny brightness offset, so they land within a
    * small Hamming distance of each other under [[imageDHash]] (the
    * near-duplicate structure an image-dedup fixture needs). `id % 17 = 0`
    * payloads are truncated (corrupt) and must drop out of the hash. */
  def synthesizeBmpMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map { id =>
          val media =
            if (id % 17 == 0) Array[Byte]('B'.toByte, 'M'.toByte, 3, 0)
            else bmpBytes(27, 16, (x, y) =>
              ((17 * (id / 4) + 7 * x + 13 * y + id % 4) % 256).toInt)
          MediaRecord(id, media)
        })
      }
      .toDF()
  }

  /** Real 8-bit GRAYSCALE PNG (color type 0): signature, IHDR, one IDAT
    * holding the zlib-deflated filter-0 scanlines, IEND — a hand-rolled
    * but fully spec-conformant encoder (java.util.zip IS zlib), so the
    * payload exercises a real PNG decoder end to end. `px(x, y)` is the
    * gray value at top-down coordinates. */
  private[graft] def pngGrayBytes(w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + w samples/row
    for (y <- 0 until h; x <- 0 until w)
      raw(y * (w + 1) + 1 + x) = (px(x, y) & 0xFF).toByte
    pngEncode(w, h, colorType = 0, raw)
  }

  /** Real 8-bit GRAY+ALPHA PNG (color type 4, 2 bytes/pixel) — the
    * container variant whose decode lands on a 2-component
    * gray-colorspace BufferedImage: the raster band-0 read must treat it
    * exactly like pure gray (r16 ADVICE — getRGB's linear-gray → sRGB
    * conversion would compress adjacent-pixel ties). Spec fixture. */
  private[graft] def pngGrayAlphaBytes(w: Int, h: Int,
      px: (Int, Int) => Int, alpha: Int = 255): Array[Byte] = {
    val raw = new Array[Byte](h * (w * 2 + 1))
    for (y <- 0 until h; x <- 0 until w) {
      raw(y * (w * 2 + 1) + 1 + 2 * x) = (px(x, y) & 0xFF).toByte
      raw(y * (w * 2 + 1) + 2 + 2 * x) = (alpha & 0xFF).toByte
    }
    pngEncode(w, h, colorType = 4, raw)
  }

  /** Shared PNG assembly: zlib-deflate the filter-0 scanlines, wrap in
    * signature + IHDR(colorType) + IDAT + IEND. */
  private def pngEncode(w: Int, h: Int, colorType: Int,
      raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte) // bit depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Fixture PNGs: the SAME 27×16 grayscale gradient (and corrupt rule)
    * as [[synthesizeBmpMedia]], packaged as real compressed PNGs — the
    * decode path is [[decodeImageIO]] instead of the hand BMP parser,
    * and PNG is lossless, so the arithmetic dHash oracle pins that the
    * codec path reproduces the exact pixels the formula predicts. */
  def synthesizePngMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map { id =>
          val media =
            if (id % 17 == 0) PngSig.take(4) ++ Array[Byte](0, 0) // truncated
            else pngGrayBytes(27, 16, (x, y) =>
              ((17 * (id / 4) + 7 * x + 13 * y + id % 4) % 256).toInt)
          MediaRecord(id, media)
        })
      }
      .toDF()
  }

  /** Fixture GIFs: the same gradient (and corrupt rule) as the BMP/PNG
    * fixtures, ENCODED through the JDK's own GIF writer — the palette
    * container. 256-level grayscale fits a GIF palette exactly, so the
    * round trip is lossless and the shared arithmetic dHash oracle pins
    * the palette decode path the way it pins the zlib path. */
  def synthesizeGifMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.iterator.map { id =>
          val media =
            if (id % 17 == 0) "GIF89a".getBytes("US-ASCII").take(4)
            else {
              val img = new java.awt.image.BufferedImage(27, 16,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val raster = img.getRaster
              for (y <- 0 until 16; x <- 0 until 27)
                raster.setSample(x, y,
                  0, ((17 * (id / 4) + 7 * x + 13 * y + id % 4) % 256).toInt)
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "gif", out)
              out.toByteArray
            }
          MediaRecord(id, media)
        })
      }
      .toDF()
  }

  /** Fixture JPEGs: the same 27×16 gradient (and corrupt rule) as the
    * BMP/PNG/GIF fixtures, encoded through the JDK's own JPEG writer —
    * the LOSSY container that dominates real crawls. Unlike those three,
    * the decoded pixels are NOT the formula's (DCT quantization noise),
    * so the near-dup gate entry's oracle derives pairs from the same-JVM
    * decoded-luma dump ([[imageLumaGrid]]) instead of the arithmetic
    * mirror — the codec is the one link that cannot be re-derived in
    * SQL, and everything downstream of it (grid sampling, gradient
    * bits, Hamming distances, the blocked pair mine) is. `id % 17 = 0`
    * payloads are a truncated SOI/APP0 prefix (corrupt) and must drop. */
  def synthesizeJpegMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.iterator.map { id =>
          val media =
            if (id % 17 == 0)
              Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
            else {
              val img = new java.awt.image.BufferedImage(27, 16,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val raster = img.getRaster
              for (y <- 0 until 16; x <- 0 until 27)
                raster.setSample(x, y,
                  0, ((17 * (id / 4) + 7 * x + 13 * y + id % 4) % 256).toInt)
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "jpg", out)
              out.toByteArray
            }
          MediaRecord(id, media)
        })
      }
      .toDF()
  }

  final case class LumaSample(doc_id: Long, r: Long, c: Long, luma: Long)

  /** The 9×8 dHash SAMPLING GRID of every decodable image, one row per
    * grid cell — the same-JVM evidence dump a LOSSY container's near-dup
    * oracle derives pairs from: [[dhashOf]] reads exactly
    * `grid(r, c) = luma(⌊c·w/9⌋, ⌊r·h/8⌋)` and emits
    * `bit(r, c) = grid(r, c) < grid(r, c+1)`, so a SQL mirror over these
    * rows re-derives the hash bits AND the pairwise Hamming mine without
    * trusting either — only the codec decode itself (which has no SQL
    * form) is taken from the JVM. Grid-vs-hash consistency is
    * spec-pinned ([[imageDHash]] == bits folded from this frame).
    * Corrupt payloads drop, like every decoder path here. */
  def imageLumaGrid(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.iterator.flatMap { rec =>
          decodeImagePixels(rec.media).iterator.flatMap { case (w, h, luma) =>
            for (r <- 0 until 8; c <- 0 until 9)
              yield LumaSample(rec.doc_id, r.toLong, c.toLong,
                luma(c * w / 9, r * h / 8).toLong)
          }
        })
      }
      .toDF()
  }

  /** Codec-backed pixel decode via `javax.imageio` (public JDK API, no
    * added dependency; executors run it headless) — the path for the
    * container formats real crawls carry (PNG, JPEG, GIF). Undecodable
    * payloads → None, like every decoder here. Luma matches
    * [[decodeBmp]]'s (r+g+b)/3 so the two paths hash identically on
    * identical pixels. */
  private[graft] def decodeImageIO(
      b: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        // non-palette GRAY-COLORSPACE images (grayscale PNG/JPEG,
        // including gray+ALPHA — color type 4 PNGs, numComponents 2 but
        // one COLOR component): read the STORED sample from band 0 —
        // getRGB would push it through a linear-gray → sRGB color-space
        // conversion (64 → 137), a monotone but wrong luma that can
        // collapse adjacent-pixel ties, so identical pixels carried in
        // gray vs gray+alpha containers would hash apart (r16 ADVICE).
        // Palette (GIF) and RGB images take the getRGB path, where the
        // value is already the intended color.
        val cm = img.getColorModel
        val grayBand = !cm.isInstanceOf[java.awt.image.IndexColorModel] &&
          cm.getColorSpace.getType == java.awt.color.ColorSpace.TYPE_GRAY &&
          cm.getNumColorComponents == 1
        val luma =
          if (grayBand) {
            val raster = img.getRaster
            (x: Int, y: Int) => raster.getSample(x, y, 0)
          } else { (x: Int, y: Int) =>
            val rgb = img.getRGB(x, y)
            (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
          }
        Some((img.getWidth, img.getHeight, luma))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel decode across every supported image container: the hand BMP
    * parser first (codec-free), then `javax.imageio` for PNG/JPEG/GIF. */
  private[graft] def decodeImagePixels(
      b: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] =
    decodeBmp(b).orElse(decodeImageIO(b))

  /** Real BMP decode: validate the BM signature, header sizes, 24bpp
    * uncompressed, then expose a TOP-DOWN luma accessor over the padded
    * bottom-up (or top-down, negative-height) pixel array. Structural
    * violations → None, like the other decoders. */
  private[graft] def decodeBmp(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val off = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return None
    val w = le32(b, 18).toInt
    val rawH = le32(b, 22).toInt
    val topDown = rawH < 0
    // Long-domain abs: math.abs(Int.MinValue) is NEGATIVE and would
    // slip through an `h == 0` guard into the bounds check (r11 advice)
    val h = math.abs(rawH.toLong).toInt
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // cap dims so a malformed header can't overflow the Int row math
    // below (a real payload this size could never fit in a task anyway);
    // rowBytes computed in Long first for the same reason
    val MaxDim = 1 << 20
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      rawH == Int.MinValue || bpp != 24 || compression != 0L) return None
    val rowBytesL = (w.toLong * 3 + 3) / 4 * 4
    if (off < 54 || off + rowBytesL * h > b.length) return None
    val rowBytes = rowBytesL.toInt
    val luma = (x: Int, y: Int) => {
      val row = if (topDown) y else h - 1 - y
      val p = off.toInt + row * rowBytes + x * 3
      ((b(p) & 0xFF) + (b(p + 1) & 0xFF) + (b(p + 2) & 0xFF)) / 3
    }
    Some((w, h, luma))
  }

  /** dHash (difference hash): nearest-neighbor sample a 9×8 luma grid —
    * `grid(r, c) = luma(⌊c·w/9⌋, ⌊r·h/8⌋)` — and emit 64 horizontal
    * gradient bits, `bit(r·8+c) = grid(r, c) < grid(r, c+1)`. Robust to
    * uniform brightness/contrast shifts (gradients survive), which is the
    * property that makes it a perceptual hash rather than a byte hash. */
  private[graft] def dhashOf(w: Int, h: Int, luma: (Int, Int) => Int): Long = {
    var hash = 0L
    var k = 0
    var r = 0
    while (r < 8) {
      val y = r * h / 8
      var c = 0
      while (c < 8) {
        if (luma(c * w / 9, y) < luma((c + 1) * w / 9, y)) hash |= (1L << k)
        k += 1; c += 1
      }
      r += 1
    }
    hash
  }

  final case class ImageHash(doc_id: Long, dhash: Long)

  /** Per-image 64-bit dHash over a binary image column — BMP via the
    * hand parser, PNG/JPEG/GIF via `javax.imageio`
    * ([[decodeImagePixels]]): one batched partition-local decode pass,
    * undecodable payloads dropped (corrupt bytes are data). Feed the
    * result to [[graft.pipeline.Dedup.imageHashPairs]] for blocked
    * near-dup pairs. */
  def imageDHash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // in-memory ImageIO: no disk-backed stream cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.iterator.flatMap { rec =>
          decodeImagePixels(rec.media).map { case (w, h, luma) =>
            ImageHash(rec.doc_id, dhashOf(w, h, luma))
          }
        })
      }
      .toDF()
  }

  /** Fixture WAVs with real PCM16 CONTENT, deterministic from doc_id:
    * 512 mono samples `s(i) = ((fg·(i² + 3i + 7)) mod 65537) mod 2048
    * − 1024 + 3·(id mod 4)` with the per-group multiplier
    * `fg = (⌊id/4⌋ · 2654435761) mod 65537 + 1`. The quadratic index
    * polynomial times a group hash modulo the PRIME 65537 makes block
    * energies effectively random ACROSS groups (zero accidental
    * Hamming-3 collisions at fixture scale — an earlier 65536 modulus
    * collapsed the waveform to `fg mod 2048` and aliased half the
    * corpus), while docs sharing `⌊id/4⌋` differ only by a ±9 DC shift
    * and land within Hamming distance ≤ 5 of each other — near-dup
    * structure with a real boundary at maxDist 3. `id % 17 = 0` payloads
    * are truncated (corrupt) and must drop out of the fingerprint. */
  def synthesizeWavAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.map { id =>
          val media =
            if (id % 17 == 0) Array[Byte]('R'.toByte, 'I'.toByte, 'F'.toByte)
            else {
              val g = id / 4
              val fg = (g * 2654435761L) % 65537L + 1L
              val b = wavBytes(1, 8000, 512 * 2)
              val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
              var i = 0L
              while (i < 512) {
                val s = ((fg * (i * i + 3 * i + 7)) % 65537L) % 2048L -
                  1024L + 3L * (id % 4)
                bb.putShort((44 + 2 * i).toInt, s.toShort)
                i += 1
              }
              b
            }
          MediaRecord(id, media)
        })
      }
      .toDF()
  }

  /** PCM16 WAV sample accessor: walk the RIFF chunks for `fmt ` (must be
    * PCM, 16-bit) and `data`, then expose (sampleCount, i ⇒ signed LE16)
    * over the data chunk without copying. Any structural violation →
    * None. Channels are NOT deinterleaved — the energy fingerprint below
    * is channel-agnostic by design. */
  private[graft] def decodeWavPcm16(b: Array[Byte]): Option[(Int, Int => Int)] = {
    if (b.length < 12 || !ascii(b, 0, "RIFF") || !ascii(b, 8, "WAVE")) return None
    var pos = 12
    var bits = -1
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val size = le32(b, pos + 4)
      if (size < 0 || size > b.length) return None
      if (ascii(b, pos, "fmt ") && size >= 16 && pos + 8 + 16 <= b.length) {
        fmtOk = le16(b, pos + 8) == 1 // PCM
        bits = le16(b, pos + 8 + 14)
      } else if (ascii(b, pos, "data")) {
        dataOff = pos + 8
        dataLen = size.toInt
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || bits != 16 || dataOff < 0 || dataLen < 2 ||
      dataOff + dataLen > b.length) return None
    val n = dataLen / 2
    Some((n, (i: Int) => {
      val p = dataOff + 2 * i
      (b(p) & 0xFF) | (b(p + 1).toInt << 8) // signed LE16
    }))
  }

  /** 64-bit audio energy fingerprint (the audio analogue of [[dhashOf]]):
    * split the PCM stream into 64 equal blocks of `n/64` samples, sum
    * |amplitude| per block, and emit the 64 CYCLIC energy-gradient bits
    * `bit(b) = e(b) > e((b+1) mod 64)`. Gradients survive uniform gain /
    * small DC shifts — the property that makes it perceptual rather than
    * a byte hash — so re-encoded or slightly re-leveled copies land
    * within a small Hamming distance. Streams shorter than 64 samples
    * carry no 64-block structure → None. */
  private[graft] def energyFingerprintOf(n: Int, sample: Int => Int): Option[Long] = {
    val per = n / 64
    if (per == 0) return None
    val e = new Array[Long](64)
    var b = 0
    while (b < 64) {
      var acc = 0L
      var i = b * per
      val end = i + per
      while (i < end) { acc += math.abs(sample(i).toLong); i += 1 }
      e(b) = acc
      b += 1
    }
    var hash = 0L
    b = 0
    while (b < 64) {
      if (e(b) > e((b + 1) % 64)) hash |= (1L << b)
      b += 1
    }
    Some(hash)
  }

  final case class AudioHash(doc_id: Long, afp: Long)

  /** Per-clip 64-bit energy fingerprint over a binary WAV column: one
    * batched partition-local decode pass, undecodable payloads dropped.
    * Feed the result to [[graft.pipeline.Dedup.imageHashPairs]] (the
    * generic blocked 64-bit Hamming pair join — nothing in it is
    * image-specific) with `hashCol = "afp"` for near-dup audio pairs. */
  def audioFingerprint(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.iterator.flatMap { rec =>
          decodeWavPcm16(rec.media).flatMap { case (n, sample) =>
            energyFingerprintOf(n, sample).map(AudioHash(rec.doc_id, _))
          }
        })
      }
      .toDF()
  }

  final case class SampledFrame(doc_id: Long, frame_idx: Long, byte_off: Long)

  /** Frame sampling plan for video-shaped payloads: treat the payload as
    * `n_bytes / 100 + 1` fixed-size frames and emit every `everyN`-th
    * frame's (index, byte offset) — the fan-out row shape real frame
    * extraction has (one input row → many frame rows), batched
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
