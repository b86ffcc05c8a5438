package graft.sources

import graft.extract.PdfFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector over a DIRECTORY OF PDF FILES — the
  * reference's upload corpus (`data/raw/`, `app/storage/
  * file_storage.py`) exposed as a Spark table:
  *
  *   spark.read.format("graft-pdf").load(dir)                 — page rows
  *   spark.read.format("graft-pdf").option("content", "images").load(dir)
  *                                                            — image rows
  *
  * Shape for scale: ONE InputPartition PER FILE (a 1M-file corpus is a
  * 1M-task scan — the planner packs tasks onto executors; no file is
  * ever split mid-parse because the object graph is whole-file), all
  * parsing executor-side via the native [[PdfFile]] reader (CID/
  * ToUnicode decode included). Two prunings are pushed INTO the source:
  *
  *  - file pruning: `EqualTo`/`In` filters on `path` drop non-matching
  *    files at PLANNING time — a path-filtered read parses one file,
  *    not the corpus (visible as `files=k of n` in the scan
  *    description);
  *  - column pruning: in image mode, the decoded payload is skipped
  *    entirely when `bytes` is not in the required schema (metadata
  *    listings never inflate image streams).
  */
class PdfDirectorySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PdfDirectorySource.schemaFor(options.get("content"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PdfDirectoryTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-pdf needs .load(<directory>)")),
      Option(properties.get("content")).getOrElse("pages"))
}

object PdfDirectorySource {
  val PagesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  val ImagesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("obj_num", IntegerType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  def schemaFor(content: String): StructType =
    if (content == "images") ImagesSchema else PagesSchema

  def listPdfs(dir: String): Seq[String] = {
    // SQL DDL (`CREATE TABLE ... USING graft-pdf`) hands the location
    // over as a file: URI ("file:/x" or "file:///x"); .load() hands a
    // plain path — accept both (textual strip: URI.create would choke
    // on unencoded spaces in real directory names)
    val normalized =
      if (dir.startsWith("file:")) "/" + dir.stripPrefix("file:").dropWhile(_ == '/')
      else dir
    val d = java.nio.file.Paths.get(normalized)
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(d))(
      _.iterator().asScala
        .filter(_.getFileName.toString.toLowerCase(java.util.Locale.ROOT)
          .endsWith(".pdf"))
        .map(_.toString).toVector.sorted)
  }
}

private class PdfDirectoryTable(dir: String, content: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-pdf:$dir"
  override def schema(): StructType = PdfDirectorySource.schemaFor(content)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PdfScanBuilder(dir, content)
}

private class PdfScanBuilder(dir: String, content: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pathFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PdfDirectorySource.schemaFor(content)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("path", _: String) => true
      case In("path", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    val wanted = accepted.flatMap {
      case EqualTo("path", v: String) => Seq(v)
      case In("path", vs) => vs.map(_.asInstanceOf[String]).toSeq
      case _ => Nil
    }.toSet
    if (accepted.nonEmpty) pathFilter = Some(wanted)
    pushed = accepted
    // accepted filters are fully enforced by file pruning (exact path
    // match) — Spark need not re-evaluate them
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new PdfScan(dir, content, pathFilter, required)
}

private class PdfScan(dir: String, content: String,
    pathFilter: Option[Set[String]], required: StructType)
    extends Scan with Batch {

  private val all = PdfDirectorySource.listPdfs(dir)
  private val files = pathFilter match {
    case Some(keep) => all.filter(keep)
    case None => all
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pdf $content files=${files.size} of ${all.size}"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => PdfFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PdfReaderFactory(content, required.fieldNames)
}

private case class PdfFilePartition(path: String) extends InputPartition

private class PdfReaderFactory(content: String, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[PdfFilePartition].path
    if (content == "images") new ImageReader(path, fields)
    else new PageReader(path, fields)
  }
}

private class PageReader(path: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val pages = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (PdfFile.looksPdfFile(bytes)) PdfFile.extract(bytes)
    else Vector.empty
  }
  private val utf8Path = UTF8String.fromString(path)
  private var i = -1
  override def next(): Boolean = { i += 1; i < pages.size }
  override def get(): InternalRow = {
    val p = pages(i)
    val text = p.lines.map(_.text).mkString("\n")
    new GenericInternalRow(fields.map {
      case "path" => utf8Path
      case "page" => p.page
      case "text" => UTF8String.fromString(text)
      case "n_chars" => text.length
    }.asInstanceOf[Array[Any]])
  }
  override def close(): Unit = ()
}

private class ImageReader(path: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  // column pruning with teeth: when `bytes` is not required, a metadata
  // listing never materializes (or inflates) the image payloads
  private val needBytes = fields.contains("bytes")
  private val imgs = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (PdfFile.looksPdfFile(raw)) PdfFile.images(raw, withData = needBytes)
    else Vector.empty
  }
  private val utf8Path = UTF8String.fromString(path)
  private var i = -1
  override def next(): Boolean = { i += 1; i < imgs.size }
  override def get(): InternalRow = {
    val m = imgs(i)
    new GenericInternalRow(fields.map {
      case "path" => utf8Path
      case "obj_num" => m.objNum
      case "page" => m.page
      case "width" => m.width
      case "height" => m.height
      case "format" => UTF8String.fromString(m.format)
      case "bytes" => if (needBytes) m.data else null
    }.asInstanceOf[Array[Any]])
  }
  override def close(): Unit = ()
}
