package graft

import graft.extract.PdfFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.Deflater

/** The `graft-pdf` DataSourceV2 connector: a directory of PDF files as a
  * Spark table, one input partition per file, with path-filter file
  * pruning and column pruning pushed into the source.
  */
class PdfDirectorySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def pdf(pages: Seq[String], withImage: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    pages.zipWithIndex.foreach { case (cs, i) =>
      val z = deflate(cs)
      w(s"${3 + i} 0 obj << /Length ${z.length} /Filter /FlateDecode >> stream\n")
      out.write(z)
      w("\nendstream endobj\n")
    }
    if (withImage) {
      val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2, 3)
      w(s"9 0 obj << /Subtype /Image /Width 4 /Height 2 /Filter /DCTDecode /Length ${jpeg.length} >> stream\n")
      out.write(jpeg)
      w("\nendstream endobj\n")
    }
    w("%%EOF\n")
    out.toByteArray
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pdfsrc").toString
    def cs(t: String) = s"BT /F1 12 Tf 72 720 Td ($t) Tj ET"
    Files.write(java.nio.file.Paths.get(d, "a.pdf"),
      pdf(Seq(cs("alpha page one"), cs("alpha page two"))))
    Files.write(java.nio.file.Paths.get(d, "b.pdf"),
      pdf(Seq(cs("bravo only page")), withImage = true))
    Files.write(java.nio.file.Paths.get(d, "c.pdf"),
      pdf(Seq(cs("charlie page"))))
    Files.write(java.nio.file.Paths.get(d, "notes.txt"), "not a pdf".getBytes)
    d
  }

  test("pages mode: one row per page, native-extracted text, per-file partitions") {
    val df = spark.read.format("graft-pdf").load(dir)
    val rows = df.orderBy("path", "page").collect()
    assert(rows.length == 4, "2 + 1 + 1 pages; the .txt file is ignored")
    assert(rows.head.getAs[String]("path").endsWith("a.pdf"))
    assert(rows.head.getAs[String]("text").contains("alpha page one"))
    assert(rows.map(_.getAs[Int]("page")).toSeq == Seq(0, 1, 0, 0))
    assert(rows.forall(r => r.getAs[Int]("n_chars") == r.getAs[String]("text").length))
    // parallelism shape: one input partition per file
    assert(df.rdd.getNumPartitions == 3)
  }

  test("path filters prune FILES at planning time, not rows at runtime") {
    val df = spark.read.format("graft-pdf").load(dir)
      .filter(col("path") === s"$dir/b.pdf")
    assert(df.count() == 1)
    assert(df.rdd.getNumPartitions == 1, "pruned scan plans one file partition")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("files=1 of 3"), s"scan description must show pruning:\n$plan")
  }

  test("images mode: metadata listing never inflates; bytes arrive when selected") {
    val meta = spark.read.format("graft-pdf").option("content", "images").load(dir)
      .select("path", "width", "height", "format")
      .collect()
    assert(meta.length == 1)
    assert(meta.head.getAs[Int]("width") == 4 && meta.head.getAs[Int]("height") == 2)
    assert(meta.head.getAs[String]("format") == "jpeg")

    val full = spark.read.format("graft-pdf").option("content", "images").load(dir)
      .filter(col("path").endsWith("b.pdf")).select("bytes").collect()
    val direct = PdfFile.images(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "b.pdf"))).head.data
    assert(full.head.getAs[Array[Byte]]("bytes").sameElements(direct))
  }

  test("pure SQL DDL surface: CREATE TABLE ... USING graft-pdf") {
    spark.sql(s"CREATE TABLE IF NOT EXISTS pdf_corpus USING `graft-pdf` OPTIONS (path '$dir')")
    try {
      // the catalog hands the location over as a file: URI — rows must
      // still come back, queryable with plain SQL
      val n = spark.sql(
        "SELECT count(*) FROM pdf_corpus WHERE n_chars > 0").head().getLong(0)
      assert(n == 4)
      val top = spark.sql(
        "SELECT text FROM pdf_corpus ORDER BY n_chars DESC LIMIT 1")
        .head().getString(0)
      assert(top.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS pdf_corpus")
  }

  test("reads the reference's real sample corpus identically to direct extraction") {
    val raw = new java.io.File("/root/reference/data/raw")
    assume(raw.isDirectory)
    val viaSource = spark.read.format("graft-pdf").load(raw.toString)
      .groupBy("path").agg(count(lit(1)).as("pages"), sum("n_chars").as("chars"))
      .collect().map(r => (new java.io.File(r.getAs[String]("path")).getName,
        r.getAs[Long]("pages"), r.getAs[Long]("chars"))).sortBy(_._1)
    val direct = raw.listFiles().filter(_.getName.endsWith(".pdf"))
      .map { f =>
        val pages = PdfFile.extract(Files.readAllBytes(f.toPath))
        (f.getName, pages.size.toLong,
          pages.map(p => p.lines.map(_.text).mkString("\n").length.toLong).sum)
      }.filter(_._2 > 0).sortBy(_._1)
    assert(viaSource.toSeq == direct.toSeq)
  }
}
