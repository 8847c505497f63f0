package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Minimal pure-JVM legacy `.XLS` (BIFF8, Excel 97-2003) reader — no
  * external deps, just the two public binary specs:
  *
  *   - [MS-CFB]: the OLE2 compound-file container (512-byte sectors, FAT /
  *     mini-FAT / DIFAT chains, directory tree) that wraps the workbook;
  *   - [MS-XLS]: the BIFF8 record stream (`Workbook` stream) — SST shared
  *     strings (with CONTINUE splits), BOUNDSHEET offsets, and the cell
  *     records NUMBER / RK / MULRK / LABELSST / LABEL / BOOLERR / FORMULA
  *     (+ cached STRING results).
  *
  * This closes the reference's real ingest format: all 15 production EDB
  * workbooks are legacy `.XLS` files (`I_AUTO.XLS`, `I_BANKRUPT.XLS`, … —
  * core_local/config.py:32-116) parsed there by `pd.read_excel(...,
  * header=None)` (core_local/azure_common_scrapers.py:66-79). Like
  * [[XlsxReader]], this runs driver-side by design: grids are
  * config-bounded to tens of cells (schema work, not data work) and
  * distribution starts at the DataFrame GridSource builds from the grid.
  *
  * Output contract matches [[XlsxReader.readFirstSheet]]: first worksheet
  * as a dense row-major grid of cell text (null = empty cell), numbers in
  * their shortest lexical form ("2016", "104.25") so a grid round-trips
  * against its CSV twin.
  */
object XlsReader {

  // ------------------------------------------------------------- CFB layer

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect   = 0xFFFFFFFF

  private case class DirEntry(name: String, objType: Int, start: Int, size: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Extract a named stream from a CFB container; `Workbook` (BIFF8) with
    * `Book` (BIFF5/7) as fallback. */
  private def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 512 &&
      i32(bytes, 0) == 0xE011CFD0 && i32(bytes, 4) == 0xE11AB1A1,
      "not an OLE2/CFB file (bad signature)")
    val sectorShift = u16(bytes, 30)
    val sectorSize  = 1 << sectorShift
    val miniShift   = u16(bytes, 32)
    val miniSize    = 1 << miniShift
    val numFat      = i32(bytes, 44)
    val firstDir    = i32(bytes, 48)
    val miniCutoff  = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat  = i32(bytes, 68)
    val idsPerSector = sectorSize / 4

    def sectorBytes(sid: Int): Array[Byte] = {
      val off = (sid + 1) << sectorShift
      java.util.Arrays.copyOfRange(bytes, off, math.min(off + sectorSize, bytes.length))
    }

    // DIFAT: 109 header entries + optional chained DIFAT sectors
    val fatSectorIds = {
      val ids = Vector.newBuilder[Int]
      var i = 0
      while (i < 109) {
        val v = i32(bytes, 76 + i * 4)
        if (v != FreeSect) ids += v
        i += 1
      }
      var difat = firstDifat
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard < (1 << 16)) {
        val sec = sectorBytes(difat)
        var j = 0
        while (j < idsPerSector - 1) {
          val v = i32(sec, j * 4)
          if (v != FreeSect) ids += v
          j += 1
        }
        difat = i32(sec, (idsPerSector - 1) * 4)
        guard += 1
      }
      ids.result().take(math.max(numFat, 0))
    }

    val fat: Array[Int] = {
      val out = new Array[Int](fatSectorIds.length * idsPerSector)
      var k = 0
      fatSectorIds.foreach { sid =>
        val sec = sectorBytes(sid)
        var j = 0
        while (j < idsPerSector) { out(k) = i32(sec, j * 4); j += 1; k += 1 }
      }
      out
    }

    def readChain(start: Int, limit: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard <= fat.length) {
        buf.write(sectorBytes(sid))
        sid = if (sid < fat.length) fat(sid) else EndOfChain
        guard += 1
      }
      val all = buf.toByteArray
      if (limit >= 0 && limit < all.length)
        java.util.Arrays.copyOfRange(all, 0, limit.toInt) else all
    }

    // Directory entries (128 bytes each) from the directory chain
    val dirBytes = readChain(firstDir, -1L)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dirBytes, o + 64) // bytes incl. UTF-16 null terminator
      val name =
        if (nameLen >= 2)
          new String(dirBytes, o, nameLen - 2, StandardCharsets.UTF_16LE)
        else ""
      DirEntry(name, dirBytes(o + 66) & 0xFF, i32(dirBytes, o + 116),
        i32(dirBytes, o + 120).toLong & 0xFFFFFFFFL)
    }.toVector

    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB: no root directory entry"))
    val wb = entries.find(e => e.objType == 2 &&
        (e.name.equalsIgnoreCase("Workbook") || e.name.equalsIgnoreCase("Book")))
      .getOrElse(throw new IllegalArgumentException(
        s"CFB: no Workbook stream (entries: ${entries.map(_.name).mkString(", ")})"))

    if (wb.size >= miniCutoff) readChain(wb.start, wb.size)
    else {
      // mini-stream: sectors of the ROOT stream, addressed by the mini-FAT
      val miniStream = readChain(root.start, root.size)
      val miniFat: Array[Int] = {
        val raw = readChain(firstMiniFat, -1L)
        Array.tabulate(raw.length / 4)(j => i32(raw, j * 4))
      }
      val buf = new java.io.ByteArrayOutputStream()
      var sid = wb.start
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect && guard <= miniFat.length) {
        val off = sid << miniShift
        buf.write(java.util.Arrays.copyOfRange(
          miniStream, off, math.min(off + miniSize, miniStream.length)))
        sid = if (sid < miniFat.length) miniFat(sid) else EndOfChain
        guard += 1
      }
      val all = buf.toByteArray
      if (wb.size < all.length)
        java.util.Arrays.copyOfRange(all, 0, wb.size.toInt) else all
    }
  }

  // ------------------------------------------------------------ BIFF layer

  /** Cursor over an SST payload split across CONTINUE records. Raw reads
    * (headers, rich-text/ext skips) cross chunk boundaries transparently;
    * only mid-character continues re-read the option-flags byte, per
    * [MS-XLS] 2.5.293 (XLUnicodeRichExtendedString continuation). */
  private final class SstCursor(chunks: Vector[Array[Byte]]) {
    private var ci = 0
    private var off = 0
    private def ensure(): Unit = {
      while (ci < chunks.length && off >= chunks(ci).length) { ci += 1; off = 0 }
    }
    def hasMore: Boolean = { ensure(); ci < chunks.length }
    def u8: Int = { ensure(); val v = chunks(ci)(off) & 0xFF; off += 1; v }
    def u16: Int = u8 | (u8 << 8)
    def u32: Long = u16.toLong | (u16.toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val avail = chunks(ci).length - off
        val take = math.min(left, avail.toLong).toInt
        off += take; left -= take
      }
    }
    /** Bytes remaining in the current chunk, WITHOUT advancing: 0 exactly
      * at a chunk boundary, which is the mid-character-continue signal the
      * char loop keys on (the next u8 then advances and reads the repeated
      * flags byte). An eager ensure() here would skip the boundary and
      * misread that flags byte as character data. */
    def chunkRemaining: Int =
      if (ci < chunks.length && off < chunks(ci).length) chunks(ci).length - off
      else 0
    def readBytes(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var k = 0
      while (k < n) {
        ensure()
        val take = math.min(n - k, chunks(ci).length - off)
        System.arraycopy(chunks(ci), off, out, k, take)
        off += take; k += take
      }
      out
    }
  }

  /** One XLUnicodeRichExtendedString: header, characters (re-reading the
    * flags byte at each mid-character CONTINUE boundary), then rich-text
    * runs and extended data skipped. */
  private def readUnicodeString(cur: SstCursor): String = {
    val cch = cur.u16
    var grbit = cur.u8
    val cRun = if ((grbit & 0x08) != 0) cur.u16 else 0
    val cbExt = if ((grbit & 0x04) != 0) cur.u32 else 0L
    val sb = new java.lang.StringBuilder(cch)
    var left = cch
    while (left > 0) {
      if (cur.chunkRemaining == 0) grbit = cur.u8 // continued mid-characters
      val wide = (grbit & 0x01) != 0
      val bytesPer = if (wide) 2 else 1
      val n = math.min(left, cur.chunkRemaining / bytesPer)
      if (n == 0)
        throw new IllegalArgumentException("BIFF: string split mid-character")
      val raw = cur.readBytes(n * bytesPer)
      if (wide) sb.append(new String(raw, StandardCharsets.UTF_16LE))
      else sb.append(new String(raw, StandardCharsets.ISO_8859_1))
      left -= n
    }
    cur.skip(cRun.toLong * 4 + cbExt)
    sb.toString
  }

  /** Decode an RKRec value: 30-bit payload, bit0 = divide by 100, bit1 =
    * payload is a signed int (else the high 30 bits of an IEEE double). */
  private[sources] def rkText(rk: Int): String = {
    val div100 = (rk & 1) != 0
    if ((rk & 2) != 0) {
      val i = rk >> 2 // arithmetic shift keeps the sign
      if (div100)
        java.math.BigDecimal.valueOf(i.toLong, 2).stripTrailingZeros.toPlainString
      else i.toString
    } else {
      val d = java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
      numText(if (div100) d / 100.0 else d)
    }
  }

  /** Shortest lexical form for a double: integral values without the
    * trailing ".0", and ALWAYS plain (non-scientific) notation — Excel
    * text semantics and the CSV/xlsx fixture dialect both have no "1.0E20"
    * form, so the fallback re-expands the shortest repr via BigDecimal
    * (trailing zeros stripped) instead of echoing Double.toString. */
  def numText(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else if (d.isNaN || d.isInfinite) d.toString
    else new java.math.BigDecimal(d.toString).stripTrailingZeros.toPlainString

  /** Read the first worksheet of a legacy `.xls` workbook as a dense
    * row-major grid (null = empty cell) — same contract as
    * [[XlsxReader.readFirstSheet]]. */
  def readFirstSheet(path: String): Vector[Vector[String]] = {
    val stream = workbookStream(Files.readAllBytes(Paths.get(path)))
    val bb = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)

    // ---- pass 1: workbook globals — BIFF version, SST, first-sheet offset
    var biffVers = 0x0600
    var firstSheetPos = -1
    val sstChunks = Vector.newBuilder[Array[Byte]]
    var inSst = false
    var pos = 0
    var globalsDone = false
    while (!globalsDone && pos + 4 <= stream.length) {
      val op = bb.getShort(pos) & 0xFFFF
      val len = bb.getShort(pos + 2) & 0xFFFF
      val data = pos + 4
      op match {
        case 0x0809 | 0x0409 | 0x0209 | 0x0009 => // BOF (BIFF8/5/4/2)
          if (len >= 2) biffVers = bb.getShort(data) & 0xFFFF
          inSst = false
        case 0x0085 => // BOUNDSHEET: lbPlyPos of the sheet's BOF
          if (firstSheetPos < 0) firstSheetPos = bb.getInt(data)
          inSst = false
        case 0x00FC => // SST: [cstTotal u32][cstUnique u32][strings...]
          sstChunks += java.util.Arrays.copyOfRange(stream, data, data + len)
          inSst = true
        case 0x003C if inSst => // CONTINUE extending the SST
          sstChunks += java.util.Arrays.copyOfRange(stream, data, data + len)
        case 0x000A => globalsDone = true // EOF of the globals substream
        case _ => inSst = false
      }
      pos = data + len
    }
    if (biffVers != 0x0600 && biffVers != 0x0500)
      throw new UnsupportedOperationException(
        f"BIFF version 0x$biffVers%04X not supported (need BIFF8 or BIFF5/7)")
    val biff8 = biffVers == 0x0600

    val sst: Vector[String] = {
      val chunks = sstChunks.result()
      if (chunks.isEmpty) Vector.empty
      else {
        val cur = new SstCursor(chunks)
        cur.u32 // cstTotal (with repeats)
        val unique = cur.u32.toInt
        Vector.fill(unique)(readUnicodeString(cur))
      }
    }

    // ---- pass 2: first worksheet substream from the BOUNDSHEET offset
    if (firstSheetPos < 0) firstSheetPos = pos // single-substream fallback
    val cells = mutable.Map.empty[(Int, Int), String]
    def put(r: Int, c: Int, s: String): Unit =
      if (s != null && s.nonEmpty) cells((r, c)) = s

    var p = firstSheetPos
    var sheetDone = false
    var pendingString: Option[(Int, Int)] = None // FORMULA awaiting STRING
    while (!sheetDone && p + 4 <= stream.length) {
      val op = bb.getShort(p) & 0xFFFF
      val len = bb.getShort(p + 2) & 0xFFFF
      val d = p + 4
      op match {
        case 0x0203 => // NUMBER: rw, col, ixfe, IEEE double
          put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF,
            numText(bb.getDouble(d + 6)))
        case 0x027E => // RK: rw, col, ixfe, RKRec
          put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF,
            rkText(bb.getInt(d + 6)))
        case 0x00BD => // MULRK: rw, colFirst, [ixfe+rk]*, colLast
          val rw = bb.getShort(d) & 0xFFFF
          val colFirst = bb.getShort(d + 2) & 0xFFFF
          val n = (len - 6) / 6
          var i = 0
          while (i < n) {
            put(rw, colFirst + i, rkText(bb.getInt(d + 4 + i * 6 + 2)))
            i += 1
          }
        case 0x00FD => // LABELSST: rw, col, ixfe, isst
          val isst = bb.getInt(d + 6)
          if (isst >= 0 && isst < sst.length)
            put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF, sst(isst))
        case 0x0204 => // LABEL: inline string (BIFF8 unicode / BIFF5 bytes)
          val rw = bb.getShort(d) & 0xFFFF
          val col = bb.getShort(d + 2) & 0xFFFF
          val cch = bb.getShort(d + 6) & 0xFFFF
          val s =
            if (!biff8)
              new String(stream, d + 8, cch, StandardCharsets.ISO_8859_1)
            else {
              val wide = (stream(d + 8) & 0x01) != 0
              if (wide) new String(stream, d + 9, cch * 2, StandardCharsets.UTF_16LE)
              else new String(stream, d + 9, cch, StandardCharsets.ISO_8859_1)
            }
          put(rw, col, s)
        case 0x0205 => // BOOLERR: bBoolErr + fError (errors -> empty cell)
          if ((stream(d + 7) & 0xFF) == 0)
            put(bb.getShort(d) & 0xFFFF, bb.getShort(d + 2) & 0xFFFF,
              if ((stream(d + 6) & 0xFF) != 0) "TRUE" else "FALSE")
        case 0x0006 => // FORMULA: 8-byte cached result, special if tail FFFF
          val rw = bb.getShort(d) & 0xFFFF
          val col = bb.getShort(d + 2) & 0xFFFF
          if ((bb.getShort(d + 12) & 0xFFFF) == 0xFFFF) {
            (stream(d + 6) & 0xFF) match {
              case 0 => pendingString = Some((rw, col)) // STRING record follows
              case 1 => put(rw, col, if ((stream(d + 8) & 0xFF) != 0) "TRUE" else "FALSE")
              case _ => // error / empty-string result -> empty cell
            }
          } else put(rw, col, numText(bb.getDouble(d + 6)))
        case 0x0207 => // STRING: cached text result of the preceding FORMULA
          pendingString.foreach { case (rw, col) =>
            val cch = bb.getShort(d) & 0xFFFF
            val s =
              if (!biff8) new String(stream, d + 2, cch, StandardCharsets.ISO_8859_1)
              else {
                val wide = (stream(d + 2) & 0x01) != 0
                if (wide) new String(stream, d + 3, cch * 2, StandardCharsets.UTF_16LE)
                else new String(stream, d + 3, cch, StandardCharsets.ISO_8859_1)
              }
            put(rw, col, s)
          }
          pendingString = None
        case 0x000A => sheetDone = true // EOF of the worksheet substream
        case _ => // DIMENSIONS, ROW, BLANK, MULBLANK, formatting... ignored
      }
      p = d + len
    }

    if (cells.isEmpty) Vector.empty
    else {
      val maxRow = cells.keysIterator.map(_._1).max
      val maxCol = cells.keysIterator.map(_._2).max
      Vector.tabulate(maxRow + 1)(r =>
        Vector.tabulate(maxCol + 1)(c => cells.getOrElse((r, c), null)))
    }
  }
}
