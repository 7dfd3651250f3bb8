package graft.sources

import graft.core.UnsupportedFormatError
import graft.util.Fs
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Excel (`.xlsx`) reads without Apache POI (absent from this classpath).
  *
  * An xlsx file is a ZIP of XML parts; the subset a data table needs —
  * the first worksheet's cell grid, the shared-string table, inline
  * strings, numbers, booleans — parses with the JDK's own StAX. The
  * reference reads excel as a first-class source format
  * (`src/polars_incremental/sources/file.py:150-154`, `pl.read_excel`),
  * so a documented rejection would leave a real coverage hole.
  *
  * Shape: row 1 is the header (polars' `read_excel` default); every data
  * cell surfaces as a nullable string (numbers keep their literal
  * spelling, booleans become true/false, date cells surface as their
  * underlying serial-number string — documented: no style-table date
  * decoding). Callers wanting types pass a schema and get a cast.
  *
  * Scale: xlsx is not splittable and capped at ~1M rows by the format
  * itself, so the unit of parallelism is the FILE — `binaryFiles`
  * distributes whole files to executors, each parsed in memory (an xlsx
  * that fits the format limits fits comfortably in an executor). Only the
  * header file is touched on the driver.
  */
object XlsxSupport {

  /** Entries of the zip we care about, loaded into memory (sharedStrings
    * may be stored after the sheets; streaming one pass isn't enough). */
  private def zipEntries(in: InputStream): Map[String, Array[Byte]] = {
    val zip = new ZipInputStream(in)
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      Iterator.continually(zip.getNextEntry).takeWhile(_ != null).foreach { e =>
        val name = e.getName
        if (name == "xl/sharedStrings.xml" || name == "xl/workbook.xml" ||
            name == "xl/_rels/workbook.xml.rels" ||
            (name.startsWith("xl/worksheets/") && name.endsWith(".xml")))
          out(name) = zip.readAllBytes()
        zip.closeEntry()
      }
    } finally zip.close()
    out.toMap
  }

  private val xmlFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** All `<t>` text concatenated per `<si>` (covers plain and rich-text
    * shared strings). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => cur.clear()
              case "t" => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => out += cur.toString
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** First sheet's zip path: workbook sheet order -> r:id -> rels target;
    * falls back to the lexicographically first worksheet part. */
  private def firstSheetPath(entries: Map[String, Array[Byte]]): String = {
    val viaRels = for {
      wb <- entries.get("xl/workbook.xml")
      rels <- entries.get("xl/_rels/workbook.xml.rels")
      rid <- firstSheetRid(wb)
      target <- relTarget(rels, rid)
    } yield if (target.startsWith("/")) target.stripPrefix("/")
      else s"xl/${target.stripPrefix("./")}"
    viaRels.filter(entries.contains).getOrElse {
      entries.keys.filter(_.startsWith("xl/worksheets/")).toSeq.sorted.headOption
        .getOrElse(throw new UnsupportedFormatError("xlsx has no worksheets"))
    }
  }

  private def firstSheetRid(workbook: Array[Byte]): Option[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(workbook))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          (0 until r.getAttributeCount).foreach { i =>
            if (r.getAttributeLocalName(i) == "id") return Some(r.getAttributeValue(i))
          }
        }
      }
      None
    } finally r.close()
  }

  private def relTarget(rels: Array[Byte], rid: String): Option[String] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(rels))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val attrs = (0 until r.getAttributeCount)
            .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
          if (attrs.get("Id").contains(rid)) return attrs.get("Target")
        }
      }
      None
    } finally r.close()
  }

  /** Column index from a cell reference: "BC23" -> 54. */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1

  /** The cell grid of one xlsx, as rows of nullable strings (ragged rows
    * preserved; missing cells null). */
  private[sources] def parseGrid(bytes: Array[Byte]): Seq[Array[String]] = {
    val entries = zipEntries(new ByteArrayInputStream(bytes))
    val shared = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheet = entries(firstSheetPath(entries))
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(sheet))
    val rows = Seq.newBuilder[Array[String]]
    val row = mutable.ArrayBuffer.empty[String]
    var cellCol = -1
    var cellType = "n"
    var inV = false
    val v = new StringBuilder
    def endCell(): Unit = if (cellCol >= 0) {
      while (row.size <= cellCol) row += null
      val raw = v.toString
      row(cellCol) = cellType match {
        case _ if raw.isEmpty && cellType != "inlineStr" => null
        case "s" => shared.lift(raw.trim.toInt).orNull
        case "b" => if (raw.trim == "1") "true" else "false"
        case _ => raw // n, str (formula result), inlineStr (v holds <is><t>)
      }
      cellCol = -1; v.clear()
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row.clear()
              case "c" =>
                v.clear(); cellType = "n"; cellCol = row.size // default: next col
                (0 until r.getAttributeCount).foreach { i =>
                  r.getAttributeLocalName(i) match {
                    case "r" => cellCol = colIndex(r.getAttributeValue(i))
                    case "t" => cellType = r.getAttributeValue(i)
                    case _ =>
                  }
                }
              case "v" | "t" => inV = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => inV = false
              case "c" => endCell()
              case "row" => rows += row.toArray
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  /** Distributed read: header (row 1 of the first file, driver-side), then
    * whole files parsed on executors. All columns StringType; pass
    * `schema` to cast by column name. */
  def read(spark: SparkSession, paths: Seq[String],
      schema: Option[StructType] = None): DataFrame = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val head = {
      val in = Fs.fs(new Path(paths.head), conf).open(new Path(paths.head))
      try parseGrid(in.readAllBytes())
      finally in.close()
    }
    val header = head.headOption.getOrElse(
      throw new UnsupportedFormatError(s"xlsx has no rows: ${paths.head}"))
      .zipWithIndex.map { case (h, i) => Option(h).getOrElse(s"_c$i") }
    val width = header.length
    val stringSchema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = spark.sparkContext.binaryFiles(paths.mkString(","))
      .flatMap { case (_, pds) => parseGrid(pds.toArray()).drop(1) }
      .map(cells => Row.fromSeq((0 until width).map(i =>
        if (i < cells.length) cells(i) else null)))
    val df = spark.createDataFrame(rows, stringSchema)
    schema match {
      case Some(s) =>
        import org.apache.spark.sql.functions.col
        df.select(s.fields.toSeq.map(f =>
          (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
           else org.apache.spark.sql.functions.lit(null).cast(f.dataType)).as(f.name)): _*)
      case None => df
    }
  }
}
