package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, MediaFeatures}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def row(id: Long, kind: String, n: Int): MediaRow =
    MediaRow(id, kind, Array.tabulate(n)(i => ((id + i) % 251).toByte), Map("k" -> "v"))

  test("decode stub is deterministic and media-type aware") {
    val img = Multimodal.MediaCodec.decodeStub(row(1, "image", 2000))
    val img2 = Multimodal.MediaCodec.decodeStub(row(1, "image", 2000))
    assert(img == img2)
    assert(img.n_bytes == 2000)
    assert(img.width == 1 + 2000 % 1024 && img.height == 1 + (2000 * 31) % 768)
    assert(img.n_frames == 1)
    val vid = Multimodal.MediaCodec.decodeStub(row(2, "video", 2000))
    assert(vid.n_frames == 2000 % 7 + 1)
    assert(img.sig.length == 16 && img.sig.matches("[0-9a-f]+"))
  }

  test("batch shape: full batches plus remainder, order preserved") {
    var batchSizes = Vector.empty[Int]
    val rows = (0 until 257).map(i => row(i, "image", 10 + i))
    val out = rows.grouped(Multimodal.DefaultBatchSize).flatMap { b =>
      batchSizes :+= b.size
      Multimodal.MediaCodec.decodeBatch(b)
    }.toVector
    assert(batchSizes == Vector(100, 100, 57))
    assert(out.map(_.doc_id) == (0 until 257).map(_.toLong))
  }

  test("distributed extraction over a Dataset of binary payloads") {
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      row(i, Seq("image", "audio", "video")(i % 3), 100 + i))
    val ds = spark.createDataset(rows).repartition(7)
    val feats = Multimodal.extractFeatures(ds, batchSize = 64)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 500)
    assert(feats.map(_.doc_id).toVector == (0 until 500).map(_.toLong).toVector)
    // features match the single-node stub exactly (partitioning-independent)
    rows.foreach { r =>
      assert(feats(r.doc_id.toInt) == Multimodal.MediaCodec.decodeStub(r))
    }
  }

  test("pdf binaries take the REAL decode path (pages and lines counted)") {
    import spark.implicits._
    // a minimal real PDF file: one uncompressed content stream
    val pdfBytes = ("%PDF-1.4\n" +
      "1 0 obj << /Length 60 >> stream\n" +
      "BT /F1 12 Tf 72 720 Td (Alpha line) Tj 72 700 Td (Beta line) Tj ET" +
      "\nendstream endobj\n%%EOF\n").getBytes("ISO-8859-1")
    val rows = Seq(
      Multimodal.MediaRow(0L, "pdf", pdfBytes, Map("source" -> "upload")),
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3), Map.empty))
    val feats = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(feats(0).width == 1, "one page")
    assert(feats(0).height == 2, "two extracted lines")
    // non-pdf types still use the stub
    assert(feats(1) == Multimodal.MediaCodec.decodeStub(rows(1)))
  }
}
