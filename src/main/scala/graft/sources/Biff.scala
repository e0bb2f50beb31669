package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Legacy `.xls` (BIFF8-in-CFB) reader/writer, JDK-only — completes the
  * reference's `FromFile` surface (mbf_compliance.py:57-63 accepts `.xls`
  * via pandas/xlrd; S5). Like [[Excel]], this is a DRIVER-side report/
  * annotation surface: .xls tables in the wild are small; the distributed
  * path in and out of the engine stays parquet/TSV.
  *
  * Two public formats are implemented from their specifications:
  *
  *  - MS-CFB: the OLE2 compound-file container — 512-byte sectors, a FAT
  *    of sector chains, a directory of streams, and a 64-byte-sector
  *    "ministream" for streams under 4096 bytes.
  *  - MS-XLS (BIFF8): the `Workbook` stream — (id, length, payload)
  *    records; shared strings in SST (+CONTINUE), cells as LABELSST /
  *    NUMBER / RK / MULRK / LABEL / BOOLERR / FORMULA.
  *
  * The reader handles both regular-FAT and ministream storage, SST
  * continuation (including the re-stated compression flag at CONTINUE
  * boundaries inside character runs), and both compressed (latin-1) and
  * UTF-16LE strings. BIFF5 (`Book` stream, version < 0x0600) is rejected
  * with a clear error. The writer emits spec-correct files — ministream
  * when the workbook is small, regular sectors beyond the 4096 cutoff —
  * so round-trips exercise both container paths.
  */
object Biff {

  // ------------------------- little-endian helpers -------------------------

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF
  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def f64(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (b(o + i) & 0xFFL); i -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }
  private def putU16(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += (v & 0xFF).toByte; b += ((v >> 8) & 0xFF).toByte
  }
  private def putI32(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += (v & 0xFF).toByte; b += ((v >> 8) & 0xFF).toByte
    b += ((v >> 16) & 0xFF).toByte; b += ((v >> 24) & 0xFF).toByte
  }
  private def putF64(b: ArrayBuffer[Byte], v: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { b += (bits & 0xFF).toByte; bits >>>= 8; i += 1 }
  }

  // ------------------------------ CFB reader ------------------------------

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD
  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private final case class DirEntry(name: String, objType: Int, startSect: Int, size: Long)

  /** Extract a named stream ("Workbook"/"Book") from a CFB container. */
  private[sources] def cfbStream(bytes: Array[Byte], wanted: Set[String]): Array[Byte] = {
    require(bytes.length >= 512 && CfbMagic.indices.forall(i => bytes(i) == CfbMagic(i)),
      "not a compound (OLE2) file — legacy .xls expected")
    val sectorSize = 1 << u16(bytes, 30)
    val miniSize = 1 << u16(bytes, 32)
    val firstDir = i32(bytes, 48)
    val cutoff = i32(bytes, 56)
    val firstMiniFat = i32(bytes, 60)
    val firstDifat = i32(bytes, 68)
    def sector(id: Int): Int = (id + 1) * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    val fatSectIds = ArrayBuffer.empty[Int]
    var o = 76
    while (o < 512) { val v = i32(bytes, o); if (v != FreeSect && v != EndOfChain) fatSectIds += v; o += 4 }
    var difat = firstDifat
    while (difat != EndOfChain && difat != FreeSect) {
      val base = sector(difat)
      var i = 0
      while (i < sectorSize - 4) {
        val v = i32(bytes, base + i)
        if (v != FreeSect && v != EndOfChain) fatSectIds += v
        i += 4
      }
      difat = i32(bytes, base + sectorSize - 4)
    }
    val fat = new Array[Int](fatSectIds.length * (sectorSize / 4))
    fatSectIds.zipWithIndex.foreach { case (sid, k) =>
      val base = sector(sid)
      var i = 0
      while (i < sectorSize / 4) { fat(k * (sectorSize / 4) + i) = i32(bytes, base + i * 4); i += 1 }
    }
    def chain(start: Int): Array[Byte] = {
      val out = ArrayBuffer.empty[Byte]
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard <= fat.length) {
        require(s >= 0 && s < fat.length,
          s"corrupt CFB: FAT chain sector $s out of bounds (${fat.length} entries)")
        val base = sector(s)
        out ++= java.util.Arrays.copyOfRange(bytes, base, math.min(base + sectorSize, bytes.length))
        s = fat(s); guard += 1
      }
      out.toArray
    }

    val dirBytes = chain(firstDir)
    val entries = (0 until dirBytes.length / 128).map { e =>
      val base = e * 128
      val nameLen = u16(dirBytes, base + 64)
      val name =
        if (nameLen >= 2)
          new String(dirBytes, base, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      // v3 writers leave garbage in the high size dword — mask to u32
      val size = i32(dirBytes, base + 120).toLong & 0xFFFFFFFFL
      DirEntry(name, u8(dirBytes, base + 66), i32(dirBytes, base + 116), size)
    }
    val root = entries.find(_.objType == 5).getOrElse(
      throw new IllegalArgumentException("CFB file has no root directory entry"))
    val target = entries.find(e => e.objType == 2 && wanted.contains(e.name)).getOrElse(
      throw new IllegalArgumentException(
        s"no ${wanted.mkString("/")} stream; found: ${entries.map(_.name).filter(_.nonEmpty).mkString(", ")}"))

    val raw =
      if (target.size >= cutoff) chain(target.startSect)
      else {
        // ministream: 64-byte sectors inside the root entry's chain,
        // addressed by the separate mini-FAT
        val miniStream = chain(root.startSect)
        val miniFatBytes = chain(firstMiniFat)
        val out = ArrayBuffer.empty[Byte]
        var s = target.startSect
        var guard = 0
        while (s != EndOfChain && s != FreeSect && guard * 4 <= miniFatBytes.length) {
          require(s >= 0 && (s + 1) * 4 <= miniFatBytes.length,
            s"corrupt CFB: mini-FAT chain sector $s out of bounds")
          val base = s * miniSize
          out ++= java.util.Arrays.copyOfRange(miniStream, base,
            math.min(base + miniSize, miniStream.length))
          s = i32(miniFatBytes, s * 4); guard += 1
        }
        out.toArray
      }
    java.util.Arrays.copyOfRange(raw, 0, math.min(target.size, raw.length.toLong).toInt)
  }

  // ----------------------------- BIFF8 reader -----------------------------

  /** Cursor over SST payload segments (SST + CONTINUE records). At a
    * segment boundary INSIDE a character run, the new segment begins with
    * a fresh compression-flag byte (MS-XLS 2.5.293); header fields and
    * skip runs continue byte-wise without one. */
  private final class SegCursor(segs: IndexedSeq[Array[Byte]]) {
    private var seg = 0
    private var off = 0
    // segment the LAST byte was read from — a CONTINUE boundary between it
    // and the next char read means a fresh flag byte (MS-XLS 2.5.293)
    private var lastSeg = 0
    private def ensure(): Unit = {
      while (seg < segs.length && off >= segs(seg).length) { seg += 1; off = 0 }
    }
    def hasMore: Boolean = { ensure(); seg < segs.length }
    def readU8(): Int = {
      ensure(); val v = u8(segs(seg), off); off += 1; lastSeg = seg; v
    }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readI32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = { var i = 0; while (i < n) { readU8(); i += 1 } }
    /** Read `cch` characters honoring the per-segment flag-byte rule:
      * whenever the character run crosses into a new CONTINUE segment
      * (including a run that STARTS in a fresh segment after its header),
      * the first byte of that segment restates the compression flag. */
    def readChars(cch: Int, initialCompressed: Boolean): String = {
      val sb = new StringBuilder(cch)
      var compressed = initialCompressed
      var remaining = cch
      var curSeg = lastSeg
      while (remaining > 0) {
        ensure()
        require(seg < segs.length, "truncated SST string")
        if (seg != curSeg) { compressed = (readU8() & 1) == 0; curSeg = seg }
        val avail = segs(seg).length - off
        if (avail <= 0) { seg += 1; off = 0 }
        else if (compressed) {
          val n = math.min(remaining, avail)
          var i = 0
          while (i < n) { sb += (segs(seg)(off + i) & 0xFF).toChar; i += 1 }
          off += n; remaining -= n; lastSeg = seg
        } else {
          val n = math.min(remaining, avail / 2)
          // Excel splits character runs at character granularity; a lone
          // dangling byte is padding — advance defensively
          if (n == 0) { seg += 1; off = 0 }
          else {
            var i = 0
            while (i < n) { sb += u16(segs(seg), off + i * 2).toChar; i += 1 }
            off += n * 2; remaining -= n; lastSeg = seg
          }
        }
      }
      sb.toString
    }
  }

  private def parseSst(segs: IndexedSeq[Array[Byte]]): IndexedSeq[String] = {
    val cur = new SegCursor(segs)
    cur.skip(4) // total refs
    val unique = cur.readI32()
    val out = new ArrayBuffer[String](unique)
    var i = 0
    while (i < unique && cur.hasMore) {
      val cch = cur.readU16()
      val flags = cur.readU8()
      val compressed = (flags & 1) == 0
      val rich = (flags & 8) != 0
      val ext = (flags & 4) != 0
      val cRun = if (rich) cur.readU16() else 0
      val cbExt = if (ext) cur.readI32() else 0
      out += cur.readChars(cch, compressed)
      cur.skip(cRun * 4 + cbExt)
      i += 1
    }
    out.toIndexedSeq
  }

  private def rkValue(rk: Int): Double = {
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Read the FIRST worksheet of a .xls into (header, dense string rows) —
    * the same contract as [[Excel.readSheet]]. Numbers render via
    * Double.toString (type inference re-parses them downstream). */
  def readSheet(path: String): (Seq[String], Seq[Seq[Option[String]]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = cfbStream(bytes, Set("Workbook", "Book"))
    var pos = 0
    var sst: IndexedSeq[String] = IndexedSeq.empty
    val cells = scala.collection.mutable.TreeMap.empty[(Int, Int), String]
    var bofDepth = 0
    var inFirstSheet = false
    var doneFirstSheet = false
    var pendingStringCell: Option[(Int, Int)] = None
    while (pos + 4 <= wb.length && !doneFirstSheet) {
      val id = u16(wb, pos)
      val sz = u16(wb, pos + 2)
      val o = pos + 4
      if (id == 0) { doneFirstSheet = true } // zero padding past the last record
      else id match {
        case 0x0809 => // BOF
          val ver = u16(wb, o)
          val dt = u16(wb, o + 2)
          require(ver == 0x0600 || dt != 0x0005,
            s"BIFF version 0x${ver.toHexString} unsupported (BIFF8/.xls 97+ only)")
          bofDepth += 1
          if (bofDepth == 2) inFirstSheet = true
        case 0x000A => // EOF
          if (inFirstSheet) { inFirstSheet = false; doneFirstSheet = true }
        case 0x00FC => // SST (+ CONTINUEs)
          val segs = ArrayBuffer(java.util.Arrays.copyOfRange(wb, o, o + sz))
          var p = o + sz
          while (p + 4 <= wb.length && u16(wb, p) == 0x003C) {
            val csz = u16(wb, p + 2)
            segs += java.util.Arrays.copyOfRange(wb, p + 4, p + 4 + csz)
            p += 4 + csz
          }
          sst = parseSst(segs.toIndexedSeq)
        case 0x00FD if inFirstSheet => // LABELSST
          val idx = i32(wb, o + 6)
          if (idx >= 0 && idx < sst.length)
            cells((u16(wb, o), u16(wb, o + 2))) = sst(idx)
        case 0x0203 if inFirstSheet => // NUMBER
          cells((u16(wb, o), u16(wb, o + 2))) = f64(wb, o + 6).toString
        case 0x027E if inFirstSheet => // RK
          cells((u16(wb, o), u16(wb, o + 2))) = rkValue(i32(wb, o + 6)).toString
        case 0x00BD if inFirstSheet => // MULRK
          val row = u16(wb, o)
          val colFirst = u16(wb, o + 2)
          val n = (sz - 6) / 6
          var k = 0
          while (k < n) {
            cells((row, colFirst + k)) = rkValue(i32(wb, o + 4 + k * 6 + 2)).toString
            k += 1
          }
        case 0x0204 if inFirstSheet => // LABEL (BIFF8 unicode)
          val cch = u16(wb, o + 6)
          val compressed = (u8(wb, o + 8) & 1) == 0
          val s =
            if (compressed) new String(wb, o + 9, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
            else new String(wb, o + 9, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          cells((u16(wb, o), u16(wb, o + 2))) = s
        case 0x0205 if inFirstSheet => // BOOLERR
          if (u8(wb, o + 7) == 0) // skip error cells
            cells((u16(wb, o), u16(wb, o + 2))) = u8(wb, o + 6).toString
        case 0x0006 if inFirstSheet => // FORMULA (cached result)
          val special = u16(wb, o + 12) == 0xFFFF
          if (!special) cells((u16(wb, o), u16(wb, o + 2))) = f64(wb, o + 6).toString
          else if (u8(wb, o + 6) == 0) // string result: value in next STRING record
            pendingStringCell = Some((u16(wb, o), u16(wb, o + 2)))
        case 0x0207 if inFirstSheet => // STRING (formula string result)
          pendingStringCell.foreach { rc =>
            val cch = u16(wb, o)
            val compressed = (u8(wb, o + 2) & 1) == 0
            cells(rc) =
              if (compressed) new String(wb, o + 3, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
              else new String(wb, o + 3, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
          }
          pendingStringCell = None
        case _ =>
      }
      if (id != 0) pos = o + sz
    }
    if (cells.isEmpty) return (Seq.empty, Seq.empty)
    val maxRow = cells.keys.map(_._1).max
    val maxCol = cells.keys.map(_._2).max
    val dense = (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.get((r, c))): Seq[Option[String]]
    }
    (dense.head.map(_.getOrElse("")), dense.tail)
  }

  // ----------------------------- BIFF8 writer -----------------------------

  private def record(id: Int, payload: ArrayBuffer[Byte]): ArrayBuffer[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    putU16(out, id); putU16(out, payload.length); out ++= payload
    out
  }

  private def unicodeStr8(s: String): ArrayBuffer[Byte] = {
    // BOUNDSHEET sheet names: 8-bit length + flags + chars
    val b = ArrayBuffer.empty[Byte]
    val compressed = s.forall(_ <= 0xFF)
    b += math.min(s.length, 31).toByte
    b += (if (compressed) 0 else 1).toByte
    s.take(31).foreach { ch =>
      if (compressed) b += ch.toByte else putU16(b, ch.toInt)
    }
    b
  }

  private def sstEntry(s: String): ArrayBuffer[Byte] = {
    val b = ArrayBuffer.empty[Byte]
    val compressed = s.forall(_ <= 0xFF)
    putU16(b, s.length)
    b += (if (compressed) 0 else 1).toByte
    s.foreach { ch => if (compressed) b += ch.toByte else putU16(b, ch.toInt) }
    b
  }

  /** Write DataFrames as sheets of one .xls (driver-side collect — the
    * same report-size contract as [[Excel.writeXlsx]]). */
  def writeXls(filename: String, sheets: Seq[(String, org.apache.spark.sql.DataFrame)]): Unit = {
    // gather cell grids + the shared string table
    val grids = sheets.map { case (_, df) =>
      val header = df.columns.toSeq.map(_.asInstanceOf[Any])
      header +: df.collect().toSeq.map(_.toSeq)
    }
    // BIFF8 hard limits: u16 row, u8-addressable columns. Fail loudly —
    // silent u16 wrap-around would overwrite rows 0..k with rows 65536+k
    grids.foreach { g =>
      require(g.length <= 65536,
        s".xls sheets hold at most 65536 rows (incl. header), got ${g.length}; use parquet/TSV for large frames")
      require(g.headOption.forall(_.length <= 256),
        s".xls sheets hold at most 256 columns, got ${g.headOption.fold(0)(_.length)}")
    }
    val strings = ArrayBuffer.empty[String]
    val sstIndex = scala.collection.mutable.HashMap.empty[String, Int]
    var totalRefs = 0
    def internString(s: String): Int = {
      totalRefs += 1
      sstIndex.getOrElseUpdate(s, { strings += s; strings.length - 1 })
    }
    def isNum(v: Any): Boolean = v match {
      case _: Double | _: Float | _: Int | _: Long | _: Short | _: Byte |
           _: java.math.BigDecimal => true
      case _ => false
    }
    grids.foreach(_.foreach(_.foreach {
      case null => ()
      case v if isNum(v) => ()
      case _: Boolean => ()
      case other => internString(other.toString); ()
    }))

    // sheet substreams
    val sheetStreams = grids.map { grid =>
      val b = ArrayBuffer.empty[Byte]
      val bof = ArrayBuffer.empty[Byte]
      putU16(bof, 0x0600); putU16(bof, 0x0010) // BIFF8, worksheet
      putU16(bof, 0x0DBB); putU16(bof, 0x07CC); putI32(bof, 0); putI32(bof, 0)
      b ++= record(0x0809, bof)
      grid.zipWithIndex.foreach { case (row, r) =>
        row.zipWithIndex.foreach { case (v, c) =>
          val p = ArrayBuffer.empty[Byte]
          putU16(p, r); putU16(p, c); putU16(p, 0x000F) // xf
          v match {
            case null => ()
            case n if isNum(n) =>
              putF64(p, n match {
                case d: Double => d
                case f: Float => f.toDouble
                case bd: java.math.BigDecimal => bd.doubleValue()
                case other => other.toString.toDouble
              })
              b ++= record(0x0203, p)
            case bool: Boolean =>
              p += (if (bool) 1 else 0).toByte; p += 0.toByte
              b ++= record(0x0205, p)
            case other =>
              putI32(p, sstIndex(other.toString))
              b ++= record(0x00FD, p)
          }
        }
      }
      b ++= record(0x000A, ArrayBuffer.empty[Byte])
      b
    }

    // globals: BOF + BOUNDSHEETs (+SST) + EOF; boundsheet offsets need the
    // globals length, which depends on the boundsheet record sizes only
    val bofG = ArrayBuffer.empty[Byte]
    putU16(bofG, 0x0600); putU16(bofG, 0x0005)
    putU16(bofG, 0x0DBB); putU16(bofG, 0x07CC); putI32(bofG, 0); putI32(bofG, 0)
    val globalsBof = record(0x0809, bofG)
    val boundPayloads = sheets.map { case (name, _) =>
      val p = ArrayBuffer.empty[Byte]
      putI32(p, 0) // offset backpatched below
      p += 0.toByte; p += 0.toByte // visible, worksheet
      p ++= unicodeStr8(name)
      p
    }
    // SST split into CONTINUE records at STRING boundaries whenever the
    // current record would exceed the BIFF payload cap (8224) — a u16
    // record length silently wraps past 65535, corrupting large string
    // tables; boundary splits need no restated flag byte on read
    val RecordCap = 8224
    val sstRecords = ArrayBuffer.empty[(Int, ArrayBuffer[Byte])] // (id, payload)
    var sstCur = ArrayBuffer.empty[Byte]
    putI32(sstCur, totalRefs); putI32(sstCur, strings.length)
    strings.foreach { s =>
      val e = sstEntry(s)
      require(e.length <= RecordCap, s"single SST string too long: ${s.length} chars")
      if (sstCur.length + e.length > RecordCap) {
        sstRecords += ((if (sstRecords.isEmpty) 0x00FC else 0x003C, sstCur))
        sstCur = ArrayBuffer.empty[Byte]
      }
      sstCur ++= e
    }
    sstRecords += ((if (sstRecords.isEmpty) 0x00FC else 0x003C, sstCur))
    val sstLen = sstRecords.map(_._2.length + 4).sum
    val globalsLen = globalsBof.length +
      boundPayloads.map(_.length + 4).sum + sstLen + 4
    val offsets = sheetStreams.scanLeft(globalsLen)((acc, s) => acc + s.length)
    boundPayloads.zipWithIndex.foreach { case (p, i) =>
      val off = offsets(i)
      p(0) = (off & 0xFF).toByte; p(1) = ((off >> 8) & 0xFF).toByte
      p(2) = ((off >> 16) & 0xFF).toByte; p(3) = ((off >> 24) & 0xFF).toByte
    }
    val wb = ArrayBuffer.empty[Byte]
    wb ++= globalsBof
    boundPayloads.foreach(p => wb ++= record(0x0085, p))
    sstRecords.foreach { case (id, p) => wb ++= record(id, p) }
    wb ++= record(0x000A, ArrayBuffer.empty[Byte])
    sheetStreams.foreach(wb ++= _)
    writeCfb(filename, "Workbook", wb.toArray)
  }

  // ------------------------------ CFB writer ------------------------------

  private def writeCfb(filename: String, streamName: String, stream: Array[Byte]): Unit = {
    val sectorSize = 512
    val miniSize = 64
    val useMini = stream.length < 4096

    // sector plan: [dir][ (miniFAT + ministream container) | stream ][FAT...]
    val miniSectors = if (useMini) (stream.length + miniSize - 1) / miniSize else 0
    val containerBytes = miniSectors * miniSize
    val containerSecs = (containerBytes + sectorSize - 1) / sectorSize
    val miniFatSecs = if (useMini) (miniSectors * 4 + sectorSize - 1) / sectorSize else 0
    val streamSecs = if (useMini) 0 else (stream.length + sectorSize - 1) / sectorSize
    val dataSecs = 1 + miniFatSecs + containerSecs + streamSecs // incl. dir
    var fatSecs = 1
    while ((dataSecs + fatSecs) * 4 > fatSecs * sectorSize)
      fatSecs += 1
    require(fatSecs <= 109, "xls report too large for the header DIFAT")
    val total = dataSecs + fatSecs
    val dirSect = 0
    val miniFatFirst = 1
    val containerFirst = miniFatFirst + miniFatSecs
    val streamFirst = if (useMini) -1 else 1
    val fatFirst = dataSecs

    val fat = Array.fill(fatSecs * sectorSize / 4)(FreeSect)
    fat(dirSect) = EndOfChain
    def chainRange(first: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { fat(first + i) = if (i == n - 1) EndOfChain else first + i + 1; i += 1 }
    }
    if (useMini) { chainRange(miniFatFirst, miniFatSecs); chainRange(containerFirst, containerSecs) }
    else chainRange(streamFirst, streamSecs)
    (0 until fatSecs).foreach(i => fat(fatFirst + i) = FatSect)

    val out = ArrayBuffer.empty[Byte]
    // header
    out ++= CfbMagic
    out ++= Array.fill[Byte](16)(0) // CLSID
    putU16(out, 0x003E); putU16(out, 0x0003) // minor, major (v3)
    putU16(out, 0xFFFE) // byte order
    putU16(out, 9); putU16(out, 6) // sector/minisector shifts
    out ++= Array.fill[Byte](6)(0)
    putI32(out, 0) // numDirSectors (v3: 0)
    putI32(out, fatSecs)
    putI32(out, dirSect)
    putI32(out, 0) // transaction signature
    putI32(out, 4096) // mini cutoff
    putI32(out, if (useMini) miniFatFirst else EndOfChain)
    putI32(out, miniFatSecs)
    putI32(out, EndOfChain) // first DIFAT sector
    putI32(out, 0) // numDifatSectors
    (0 until 109).foreach(i => putI32(out, if (i < fatSecs) fatFirst + i else FreeSect))
    require(out.length == 512)

    def dirEntry(name: String, objType: Int, child: Int, start: Int, size: Long): Array[Byte] = {
      val e = ArrayBuffer.empty[Byte]
      name.foreach(ch => putU16(e, ch.toInt))
      putU16(e, 0)
      while (e.length < 64) e += 0.toByte
      putU16(e, (name.length + 1) * 2)
      e += objType.toByte
      e += 1.toByte // black
      putI32(e, -1); putI32(e, -1); putI32(e, child) // left, right, child
      e ++= Array.fill[Byte](16)(0) // CLSID
      putI32(e, 0) // state
      e ++= Array.fill[Byte](16)(0) // timestamps
      putI32(e, start)
      putI32(e, size.toInt); putI32(e, 0)
      e.toArray
    }
    // directory sector: Root + stream + 2 free entries
    val dir = ArrayBuffer.empty[Byte]
    dir ++= dirEntry("Root Entry", 5, 1,
      if (useMini) containerFirst else EndOfChain,
      if (useMini) containerBytes.toLong else 0L)
    dir ++= dirEntry(streamName, 2, -1,
      if (useMini) 0 else streamFirst, stream.length.toLong)
    dir ++= Array.fill[Byte](128)(0)
    dir ++= Array.fill[Byte](128)(0)
    out ++= dir

    if (useMini) {
      // miniFAT sectors
      val mf = ArrayBuffer.empty[Byte]
      (0 until miniSectors).foreach(i =>
        putI32(mf, if (i == miniSectors - 1) EndOfChain else i + 1))
      while (mf.length < miniFatSecs * sectorSize) mf += 0xFF.toByte
      out ++= mf
      // ministream container (stream data in 64-byte minisectors)
      out ++= stream
      while (out.length < 512 + (1 + miniFatSecs + containerSecs) * sectorSize) out += 0.toByte
    } else {
      out ++= stream
      while (out.length < 512 + (1 + streamSecs) * sectorSize) out += 0.toByte
    }
    // FAT sectors
    fat.foreach(v => putI32(out, v))
    require(out.length == 512 + total * sectorSize)

    val fos = new java.io.FileOutputStream(filename)
    try fos.write(out.toArray) finally fos.close()
  }
}
