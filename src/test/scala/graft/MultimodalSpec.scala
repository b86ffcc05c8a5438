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
}
