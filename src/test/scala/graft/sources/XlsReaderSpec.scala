package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** BIFF8 `.xls` read path (VERDICT r8 missing item 1: the reference's 15
  * production EDB workbooks are legacy `.XLS` — core_local/config.py:32-116).
  * Round-trips through [[XlsWriter]] plus hand-crafted record streams for
  * the record types the writer never emits (FORMULA, STRING, BOOLERR,
  * LABEL), so the reader is not just agreeing with its twin. */
class XlsReaderSpec extends AnyFunSuite {

  private def tmpXls(): String =
    Files.createTempFile("graft-xls", ".xls").toString

  // ---- record-level encoders used by the hand-crafted stream tests

  private def rec(op: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + data.length)
    out(0) = op.toByte; out(1) = (op >> 8).toByte
    out(2) = data.length.toByte; out(3) = (data.length >> 8).toByte
    System.arraycopy(data, 0, out, 4, data.length)
    out
  }
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)
  private def f64(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    Array.tabulate(8)(i => (bits >>> (8 * i)).toByte)
  }

  test("RK encodings: int, int/100, truncated double, NUMBER fallback") {
    assert(XlsWriter.rkEncode("2016").contains((2016 << 2) | 2))
    assert(XlsWriter.rkEncode("-7").contains((-7 << 2) | 2))
    assert(XlsWriter.rkEncode("104.25").contains((10425 << 2) | 3))
    // 0.375 is dyadic but not a /100 integer: truncated-double form
    val rkDouble = XlsWriter.rkEncode("0.375")
    assert(rkDouble.isDefined && (rkDouble.get & 3) == 0)
    assert(XlsWriter.rkEncode("3.14159").isEmpty) // needs a NUMBER record
    // every encodable form decodes back to the same lexical text
    for (t <- Seq("2016", "-7", "104.25", "-104.25", "0.375", "-0.375", "0.5"))
      assert(XlsReader.numText(t.toDouble) == t)
  }

  test("small grid round-trips through the mini-stream (stream < 4096B)") {
    val grid = Vector(
      Vector(null, "2016", "2017", "2018"),
      Vector("July", "104", "104.25", "3.14159"),
      Vector("August", "-7", "0.375", null),
      Vector("café 日本語", "0.5", null, "text"))
    val path = tmpXls()
    XlsWriter.write(path, grid)
    assert(Files.size(java.nio.file.Paths.get(path)) % 512 == 0)
    val back = XlsReader.readFirstSheet(path)
    assert(back == grid)
  }

  test("large grid uses regular FAT chains and CONTINUE-split SST") {
    // 400 distinct 40-char strings -> SST payload ~17KB: forces >=2
    // CONTINUE records incl. mid-string splits; stream > 4096B exercises
    // the regular-FAT path; numeric column adds MULRK runs
    val grid = Vector.tabulate(400)(r =>
      Vector(s"row-$r-" + ("x" * 34).take(34 - s"$r".length), s"$r", s"$r.25", f"${r * 7}%d"))
    val path = tmpXls()
    XlsWriter.write(path, grid)
    val back = XlsReader.readFirstSheet(path)
    assert(back == grid)
  }

  test("non-canonical numeric text survives as text; plain-form large doubles") {
    // cells whose numeric decode would NOT reproduce the original text are
    // kept as LABELSST strings, never silently rewritten by a round-trip
    val grid = Vector(
      Vector("0.50", "2016.0", "007", "1e3"),
      Vector("1.0E20", "0.5", "2016", "100000000000000000000"))
    val path = tmpXls()
    XlsWriter.write(path, grid)
    assert(XlsReader.readFirstSheet(path) == grid)
    // the non-integral fallback is plain notation (no "1.0E20" text)
    assert(XlsReader.numText(1.0e20) == "100000000000000000000")
    assert(XlsReader.numText(1.5e16) == "15000000000000000")
    assert(XlsReader.numText(1.0e-7) == "0.0000001")
    assert(XlsReader.numText(0.5) == "0.5")
  }

  test("a single SST string spanning several CONTINUE records round-trips") {
    // one 20k-char Latin-1 string (~20KB body) must split across >=2
    // CONTINUEs after the SST record itself; a wide (UTF-16) sibling of
    // 12k chars (~24KB) splits repeatedly on 2-byte boundaries
    val narrow = Iterator.continually("abcdefgh").flatten.take(20000).mkString
    val wide = ("日本語テキスト" * 2000).take(12000)
    val grid = Vector(Vector(narrow), Vector(wide), Vector("tail"))
    val path = tmpXls()
    XlsWriter.write(path, grid)
    assert(XlsReader.readFirstSheet(path) == grid)
  }

  test("FORMULA cached results, STRING, BOOLERR, inline LABEL records") {
    // globals: BOF + BOUNDSHEET(plyPos) + EOF; sheet: hand-crafted records
    val bofG = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
    val eof = rec(0x000A, Array.emptyByteArray)
    val name = "S".getBytes("ISO-8859-1")
    val boundsheetLen = 4 + 4 + 2 + 2 + name.length
    val plyPos = bofG.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085, le32(plyPos) ++ le16(0) ++ Array[Byte](name.length.toByte, 0) ++ name)

    val bofS = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
    // FORMULA with a cached numeric result (tail != FFFF)
    val fNum = rec(0x0006, le16(0) ++ le16(0) ++ le16(15) ++ f64(42.5) ++ le16(0) ++ le32(0) ++ le16(0))
    // FORMULA with a cached string result: 00 .. FF FF tail, then STRING
    val fStr = rec(0x0006, le16(0) ++ le16(1) ++ le16(15) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ le16(0) ++ le32(0) ++ le16(0))
    val strRec = rec(0x0207, le16(5) ++ Array[Byte](0) ++ "hello".getBytes("ISO-8859-1"))
    // FORMULA with a cached boolean result: 01 00 <b> .. FF FF
    val fBool = rec(0x0006, le16(0) ++ le16(2) ++ le16(15) ++
      Array[Byte](1, 0, 1, 0, 0, 0, -1, -1) ++ le16(0) ++ le32(0) ++ le16(0))
    val boolerr = rec(0x0205, le16(1) ++ le16(0) ++ le16(15) ++ Array[Byte](0, 0))
    val boolerrErr = rec(0x0205, le16(1) ++ le16(1) ++ le16(15) ++ Array[Byte](0x2A, 1))
    val label = rec(0x0204, le16(1) ++ le16(2) ++ le16(15) ++
      le16(4) ++ Array[Byte](0) ++ "text".getBytes("ISO-8859-1"))
    val wideLabel = rec(0x0204, le16(2) ++ le16(0) ++ le16(15) ++
      le16(2) ++ Array[Byte](1) ++ "é日".getBytes("UTF-16LE"))

    val stream = bofG ++ boundsheet ++ eof ++
      bofS ++ fNum ++ fStr ++ strRec ++ fBool ++ boolerr ++ boolerrErr ++ label ++ wideLabel ++ eof
    val path = tmpXls()
    Files.write(java.nio.file.Paths.get(path),
      XlsWriter.cfbContainer("Workbook", stream))
    val grid = XlsReader.readFirstSheet(path)
    assert(grid(0)(0) == "42.5")     // FORMULA numeric
    assert(grid(0)(1) == "hello")    // FORMULA string via STRING
    assert(grid(0)(2) == "TRUE")     // FORMULA boolean
    assert(grid(1)(0) == "FALSE")    // BOOLERR boolean
    assert(grid(1)(1) == null)       // BOOLERR error -> empty cell
    assert(grid(1)(2) == "text")     // inline LABEL, compressed
    assert(grid(2)(0) == "é日") // inline LABEL, wide
  }

  test("EDB fixture .xls twin matches its CSV grid cell-for-cell") {
    val csv = scala.io.Source.fromFile("fixtures/edb_auto_sales.csv")
    val rows = try csv.getLines().toVector.map(_.split(",", -1).toVector)
    finally csv.close()
    val path = tmpXls()
    XlsWriter.write(path, rows)
    val back = XlsReader.readFirstSheet(path)
    // CSV empty cells come back null; compare with that normalization
    val expect = rows.map(_.map(v => if (v == null || v.isEmpty) null else v))
    val width = expect.map(_.length).max
    val padded = back.map(r => r.padTo(width, null))
    assert(padded == expect.map(_.padTo(width, null)))
  }

  test("SST rich-text runs and extended data are skipped without desync") {
    // real Excel files carry formatting runs (grbit 0x08) and far-east
    // extension blocks (grbit 0x04) in SST strings; the reader must skip
    // both or every later LABELSST index resolves to the wrong string
    val sst = rec(0x00FC, le32(3) ++ le32(3) ++
      (le16(5) ++ Array[Byte](0x00) ++ "plain".getBytes("ISO-8859-1")) ++
      (le16(4) ++ Array[Byte](0x08) ++ le16(1) ++                  // rich, 1 run
        "bold".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 1, 0)) ++ // run data
      (le16(3) ++ Array[Byte](0x04) ++ le32(2) ++                  // ext, 2 bytes
        "ext".getBytes("ISO-8859-1") ++ Array[Byte](9, 9)))
    val bofG = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
    val eof = rec(0x000A, Array.emptyByteArray)
    val name = "S".getBytes("ISO-8859-1")
    val boundsheetLen = 4 + 4 + 2 + 2 + name.length
    val plyPos = bofG.length + boundsheetLen + sst.length + eof.length
    val boundsheet = rec(0x0085, le32(plyPos) ++ le16(0) ++ Array[Byte](name.length.toByte, 0) ++ name)
    val bofS = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0))
    val cells = (0 until 3).map(c =>
      rec(0x00FD, le16(0) ++ le16(c) ++ le16(15) ++ le32(c))).reduce(_ ++ _)
    val stream = bofG ++ boundsheet ++ sst ++ eof ++ bofS ++ cells ++ eof
    val path = tmpXls()
    Files.write(java.nio.file.Paths.get(path),
      XlsWriter.cfbContainer("Workbook", stream))
    val grid = XlsReader.readFirstSheet(path)
    assert(grid(0) == Vector("plain", "bold", "ext"))
  }

  test("BIFF5 workbook: Book stream, byte-string LABELs, no SST") {
    // pre-97 files: stream is named "Book", vers 0x0500, labels carry
    // 8-bit byte strings inline (no shared-string table)
    val bofG = rec(0x0809, le16(0x0500) ++ le16(0x0005) ++ le16(0) ++ le16(0))
    val eof = rec(0x000A, Array.emptyByteArray)
    val name = "S".getBytes("ISO-8859-1")
    val boundsheetLen = 4 + 4 + 2 + 2 + name.length
    val plyPos = bofG.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085, le32(plyPos) ++ le16(0) ++ Array[Byte](name.length.toByte, 0) ++ name)
    val bofS = rec(0x0809, le16(0x0500) ++ le16(0x0010) ++ le16(0) ++ le16(0))
    val label = rec(0x0204, le16(0) ++ le16(0) ++ le16(15) ++
      le16(5) ++ "hello".getBytes("ISO-8859-1"))
    val num = rec(0x0203, le16(0) ++ le16(1) ++ le16(15) ++ f64(12.5))
    val rk = rec(0x027E, le16(1) ++ le16(0) ++ le16(15) ++ le32((42 << 2) | 2))
    val stream = bofG ++ boundsheet ++ eof ++ bofS ++ label ++ num ++ rk ++ eof
    val path = tmpXls()
    Files.write(java.nio.file.Paths.get(path),
      XlsWriter.cfbContainer("Book", stream))
    val grid = XlsReader.readFirstSheet(path)
    assert(grid == Vector(Vector("hello", "12.5"), Vector("42", null)))
  }
}
