package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and decode / feature-extraction
  * runs as a BATCHED `mapPartitions` pass — the Scala-native analog of a
  * `mapInPandas` Pandas UDF (same contract: iterator of fixed-size
  * batches in, iterator of result batches out, one partition per task).
  *
  * The reference treats visuals the same way: raw bytes + metadata dicts
  * flowing to an external model (rafalpronko/pdf-parser
  * `app/models/chunk.py:19-29` VisualChunk, batch loop
  * `app/processing/multimodal/multimodal_embedder.py:89-113`).
  *
  * ==== STUB BOUNDARY ====
  * No image/audio codecs exist in this offline container, so
  * [[MediaCodec.decodeStub]] is a clearly-marked DETERMINISTIC FAKE: it
  * derives "decoded" features purely from the byte payload with integer
  * arithmetic (reproducible in the DuckDB oracle). Swapping in a real
  * codec (javax.imageio / ffmpeg bindings) changes ONLY that function —
  * the schema, batching, partitioning and job shape stay as-is.
  *
  * Exception: `media_type = "pdf"` payloads get a REAL decode —
  * [[graft.extract.PdfFile]] (object scan → FlateDecode inflate →
  * content-stream text extraction) needs only the JDK, so PDF binaries
  * flow through the actual extractor and `sig` carries the text digest.
  */
object Multimodal {

  /** Input row: opaque payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      meta: Map[String, String])

  /** Extracted features (decode-stub output). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      sig: String, // hex prefix of the payload
      width: Int, // stub-decoded dimensions
      height: Int,
      n_frames: Int) // >1 only for video (frame sampling)

  /** Default batch size, mirroring the reference's embed batch of 100
    * (`multimodal_embedder.py:90`).
    */
  val DefaultBatchSize = 100

  object MediaCodec {
    private val HexDigits = "0123456789abcdef".toCharArray

    private def hexPrefix(b: Array[Byte], n: Int): String = {
      val len = math.min(n, b.length)
      val out = new Array[Char](len * 2)
      var i = 0
      while (i < len) {
        out(i * 2) = HexDigits((b(i) >> 4) & 0xf)
        out(i * 2 + 1) = HexDigits(b(i) & 0xf)
        i += 1
      }
      new String(out)
    }

    /** REAL decode for embedded PDF images: the native file reader scans
      * `/Subtype /Image` XObjects — width/height come from the first
      * image's stream dictionary, n_frames counts the images. No pixel
      * codec involved (DCT payloads pass through as the jpeg bytes).
      */
    def decodePdfImage(row: MediaRow): MediaFeatures = {
      val imgs = graft.extract.PdfFile.images(row.payload)
      val first = imgs.headOption
      MediaFeatures(
        row.doc_id, row.media_type, row.payload.length.toLong,
        hexPrefix(row.payload, 8),
        width = first.map(_.width).getOrElse(0),
        height = first.map(_.height).getOrElse(0),
        n_frames = imgs.size)
    }

    /** REAL decode for PDF binaries: text via the native file reader;
      * width/height report page count and total extracted lines.
      */
    def decodePdf(row: MediaRow): MediaFeatures = {
      val pages = graft.extract.PdfFile.extract(row.payload)
      MediaFeatures(
        row.doc_id, row.media_type, row.payload.length.toLong,
        hexPrefix(row.payload, 8),
        width = pages.size,
        height = pages.map(_.lines.size).sum,
        n_frames = 1)
    }

    /** STUB decode: deterministic fake features from raw bytes (see class
      * doc). A real implementation would parse the container format here.
      */
    def decodeStub(row: MediaRow): MediaFeatures = {
      val n = row.payload.length.toLong
      MediaFeatures(
        row.doc_id, row.media_type, n,
        hexPrefix(row.payload, 8),
        width = (1L + n % 1024L).toInt,
        height = (1L + (n * 31L) % 768L).toInt,
        n_frames = if (row.media_type == "video") (n % 7L).toInt + 1 else 1)
    }

    /** Batched decode: the whole batch is visible at once (a real codec
      * would amortize model/codec init across it, exactly like a Pandas
      * UDF batch).
      */
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map {
        case r if r.media_type == "pdf" => decodePdf(r)
        case r if r.media_type == "pdf_image" => decodePdfImage(r)
        case r => decodeStub(r)
      }
  }

  implicit private val featEnc: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** The distributed pass: per partition, group rows into fixed-size
    * batches and decode batch-wise. Order within a partition is preserved
    * (batch boundaries don't reorder), so output is deterministic under a
    * deterministic input partitioning.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(MediaCodec.decodeBatch)
    }
}
