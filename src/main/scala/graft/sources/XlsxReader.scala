package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Minimal pure-JVM .xlsx reader (java.util.zip + StAX, no external deps):
  * enough of ECMA-376 SpreadsheetML to read workbook grids the way the
  * reference reads Excel bytes with `pd.read_excel(..., header=None)`
  * (core_local/azure_common_scrapers.py:66-79) — first worksheet, shared
  * strings, inline strings, raw numeric cell text.
  *
  * Driver-side by design: these grids are config-bounded to tens of cells
  * (schema work, not data work); distribution starts at the DataFrame that
  * GridSource builds from the parsed grid.
  */
object XlsxReader {

  /** 0-based column index of an A1 column ref: "A" -> 0, "K" -> 10,
    * "AA" -> 26. */
  def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter)
      .foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  private val xmlFactory = {
    val f = XMLInputFactory.newInstance()
    // never resolve external entities from untrusted workbook XML
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** `xl/sharedStrings.xml`: one entry per `<si>`, concatenating every
    * `<t>` text run (rich-text strings have several). */
  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val rd = xmlFactory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(rd.getText)
        case XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "t"  => inT = false
            case "si" => out += cur.toString; cur = null
            case _    =>
          }
        case _ =>
      }
    }
    rd.close()
    out.result()
  }

  /** One worksheet's `sheetData` as sparse (row, col) -> cell text. Cell
    * types handled: `s` (shared string), `inlineStr`, and everything else
    * as the raw `<v>` text (numbers keep their stored lexical form, which
    * is what the downstream string-typed grid wants). */
  private def parseSheet(in: InputStream,
                         shared: Vector[String]): Map[(Int, Int), String] = {
    val rd = xmlFactory.createXMLStreamReader(in)
    val cells = mutable.Map.empty[(Int, Int), String]
    var rowIdx = -1
    var colIdx = -1
    var cellType = "n"
    var collecting = false
    val text = new StringBuilder
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "row" =>
              rowIdx = Option(rd.getAttributeValue(null, "r"))
                .map(_.toInt - 1).getOrElse(rowIdx + 1)
              colIdx = -1
            case "c" =>
              val ref = rd.getAttributeValue(null, "r")
              colIdx = if (ref != null) colIndex(ref) else colIdx + 1
              cellType = Option(rd.getAttributeValue(null, "t")).getOrElse("n")
              text.clear()
            case "v" => collecting = true
            case "t" if cellType == "inlineStr" => collecting = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if collecting =>
          text.append(rd.getText)
        case XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "v" | "t" => collecting = false
            case "c" =>
              val s = cellType match {
                case "s" => shared(text.toString.trim.toInt)
                case _   => text.toString
              }
              if (s.nonEmpty && rowIdx >= 0 && colIdx >= 0)
                cells((rowIdx, colIdx)) = s
            case _ =>
          }
        case _ =>
      }
    }
    rd.close()
    cells.toMap
  }

  /** Read the first worksheet of an .xlsx file as a dense row-major grid
    * (null = empty cell). The first sheet is `xl/worksheets/sheet1.xml`
    * in every writer we need to read; if absent, the lexicographically
    * first xml entry under `xl/worksheets/` is used. */
  def readFirstSheet(path: String): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zip.entries().asScala.map(_.getName).toVector
      val shared = entries.find(_ == "xl/sharedStrings.xml") match {
        case Some(e) => parseSharedStrings(zip.getInputStream(zip.getEntry(e)))
        case None    => Vector.empty
      }
      val sheetName = entries.find(_ == "xl/worksheets/sheet1.xml")
        .orElse(entries.filter(n =>
          n.startsWith("xl/worksheets/") && n.endsWith(".xml")).sorted.headOption)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no worksheet entry found"))
      val cells = parseSheet(zip.getInputStream(zip.getEntry(sheetName)), shared)
      if (cells.isEmpty) Vector.empty
      else {
        val maxRow = cells.keysIterator.map(_._1).max
        val maxCol = cells.keysIterator.map(_._2).max
        Vector.tabulate(maxRow + 1)(r =>
          Vector.tabulate(maxCol + 1)(c => cells.getOrElse((r, c), null)))
      }
    } finally zip.close()
  }
}
