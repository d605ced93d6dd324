package graft.sources.jetmdb

import java.nio.charset.Charset

import graft.sources.jetmdb.JetMdbFormat._

/** Jet3 (`.mdb`, Access 97) page-format parser — the version decades
  * of archived Access files actually carry, and what migration tools
  * get fed. Derived, like [[JetMdbFormat]], from the PUBLICLY
  * documented Jet3/4 layout differences (the mdbtools project's
  * HACKING format notes); no code from any implementation.
  *
  * DOCUMENTED PROFILE (stated explicitly because public sources vary
  * in detail and no real Access-97 file exists in this offline
  * environment; the fixture writer emits the SAME profile so round
  * trips are byte-exact, and `RealFixtureSpec` is the env-gated hook
  * for proving a genuine `.mdb` the day one exists):
  *   - 2048-byte pages; header version byte 0x00 at offset 0x14;
  *   - TDEF page: 0x02 0x01, u32 next-TDEF @4 (single-page only),
  *     u32 tdef_len @8, u32 num_rows @12, u32 autonumber @16,
  *     u8 table_type @20, u16 max_cols @21, u16 num_var_cols @23,
  *     u16 num_cols @25, u32 num_idx @27, u32 num_real_idx @31,
  *     used/free page pointers @35/@39, num_real_idx × 8 index-header
  *     bytes @43, then 18-byte column descriptors
  *     (u8 type @0, u16 col_num @1, u16 offset_V @3, u16 col_num @5,
  *     u16 sort @7, u16 misc @9, u16 unknown @11, u8 flags @13
  *     [0x01 fixed, 0x02 nullable], u16 offset_F @14, u16 len @16),
  *     then u8-length-prefixed SINGLE-BYTE (CP1252) column names;
  *   - data page: 0x01 0x01, u16 free @2, u32 owning TDEF @4,
  *     u16 row count @8, u16 row offsets from @10 (flag bits as
  *     Jet4: 0x8000 deleted, 0x4000 overflow — rejected, mask
  *     0x1FFF);
  *   - row: u8 column count @0, fixed region, var data, then from the
  *     row end backwards: null bitmask (bit CLEAR = null, BOOL value
  *     lives in the bit), u8 var-column count, (varCols+1) u8 offsets
  *     from row start (last = end of data);
  *   - values: same inline encodings as Jet4 (little-endian ints,
  *     MONEY int64·1e-4, OLE-date double) EXCEPT text, which is
  *     single-byte CP1252 (Jet3 predates the UCS-2 switch).
  *
  * SCOPE (honest rejections, never misparses): rows larger than 255
  * bytes (the u8 var-offset form — longer rows use Jet3's jump-table
  * extension, out of profile), GUID/NUMERIC columns (NUMERIC did not
  * exist in Jet3; GUID arrived with replication), and the index
  * section (skipped, not parsed). MEMO is IN profile since round 11 —
  * Access 97 databases with Memo fields are the common migration
  * case: the same 12-byte in-row header and three LVAL storage forms
  * as Jet4 (inline / single-LVAL / chained type-2), with Jet3 page
  * geometry (2048-byte pages, row directory at @8/@10) and CP1252
  * payloads (no UCS-2, no compression flag — both postdate Jet3).
  * OLE is IN profile since round 12 — embedded objects are the next
  * most common Jet3 payload after Memo (they feed the multimodal
  * layer): identical header + LVAL machinery, payload surfaced as
  * raw bytes. Every rejection names the jetcsv escape
  * route: `mdb-export` any Jet3 file to CSV and read it with
  * `spark.read.format("jetcsv")` — the export path old tooling
  * already supports.
  */
object Jet3Format {

  val PageSize = 2048

  private val cp1252: Charset = Charset.forName("windows-1252")

  private def escape(what: String): String =
    s"jetmdb/jet3: $what is outside the Jet3 reader's profile — " +
      "export the table to CSV (mdb-export) and read it with " +
      "format(\"jetcsv\") instead"

  /** Version check on page 0 (caller already matched the magic):
    * 0x00 = Jet3. */
  def isJet3(page0: Array[Byte]): Boolean =
    page0.length > 0x14 && u8(page0, 0x14) == 0x00

  /** Parse a single-page Jet3 TDEF. Callers holding a page fetcher
    * should prefer [[parseTdefChained]] (r12 — wide Access-97 tables
    * spill their TDEF exactly like Jet4's). */
  def parseTdef(page: Array[Byte], pageNum: Int): JetTableDef = {
    // type check FIRST: a non-TDEF page must say so, not claim a
    // chain exists (r12 review)
    if (u8(page, 0) != 0x02)
      throw new JetMdbFormat.NotATdefException(
        s"jetmdb/jet3: page $pageNum is not a TDEF (type ${u8(page, 0)})")
    require(page.length < 2 * PageSize && i32(page, 4) == 0,
      s"jetmdb/jet3: multi-page TDEF at $pageNum needs the chained " +
        "parse path (parseTdefChained)")
    parseTdefBuffer(page, pageNum)
  }

  /** Multi-page TDEF chains, Jet3 geometry — the chain walk itself is
    * geometry-independent and SHARED with the Jet4/ACE path
    * ([[JetMdbFormat.chainTdefBuffer]]; r12 review de-duplicated the
    * two verbatim copies). */
  def parseTdefChained(
      pageNum: Int, pages: Int => Array[Byte]): JetTableDef =
    parseTdefBuffer(
      JetMdbFormat.chainTdefBuffer(pageNum, pages, "jetmdb/jet3"),
      pageNum)

  private def parseTdefBuffer(
      page: Array[Byte], pageNum: Int): JetTableDef = {
    if (u8(page, 0) != 0x02)
      throw new JetMdbFormat.NotATdefException(
        s"jetmdb/jet3: page $pageNum is not a TDEF (type ${u8(page, 0)})")
    val numRows = i32(page, 12)
    val tableType = u8(page, 20)
    val numVarCols = u16(page, 23)
    val numCols = u16(page, 25)
    val numRealIdx = i32(page, 31)
    var off = 43 + numRealIdx * 8
    val cols = new Array[JetColumn](numCols)
    var i = 0
    while (i < numCols) {
      val t = u8(page, off)
      // NUMERIC (0x10) postdates Jet3; GUID remains out of profile.
      // MEMO long values are in profile since round 11, OLE since
      // round 12 — both ride the same 12-byte header + three LVAL
      // storage forms ([[resolveMemo]]), OLE just skips the CP1252
      // decode and surfaces raw bytes (BinaryType), feeding the
      // multimodal layer the way the Jet4 reader's OLE does
      if (t == T_NUMERIC || t == T_GUID)
        throw new UnsupportedOperationException(
          escape(f"column type 0x$t%02x"))
      val colNum = u16(page, off + 1)
      val offV = u16(page, off + 3)
      val flags = u8(page, off + 13)
      val offF = u16(page, off + 14)
      val len = u16(page, off + 16)
      cols(i) = JetColumn("", t, colNum, (flags & 0x01) != 0, offF, offV,
        len, autoNumber = (flags & 0x04) != 0)
      off += 18
      i += 1
    }
    i = 0
    while (i < numCols) {
      val n = u8(page, off)
      off += 1
      val name = new String(page, off, n, cp1252)
      cols(i) = cols(i).copy(name = name)
      off += n
      i += 1
    }
    require(cols.count(c => !c.fixed && c.typeCode != T_BOOL) == numVarCols,
      s"jetmdb/jet3: TDEF var-column count mismatch on page $pageNum")
    JetTableDef(pageNum, numRows, tableType, cols.toSeq)
  }

  /** Row extents of a Jet3 data page owned by `tdefPage` — row count
    * at @8, offsets from @10 (vs Jet4's @12/@14); flags identical. */
  def dataRowExtents(
      page: Array[Byte], tdefPage: Int): Seq[(Int, Int)] = {
    if (u8(page, 0) != 0x01 || i32(page, 4) != tdefPage) return Nil
    val nRows = u16(page, 8)
    val out = Vector.newBuilder[(Int, Int)]
    var i = 0
    var prevStart = PageSize
    while (i < nRows) {
      val raw = u16(page, 10 + 2 * i)
      val start = raw & 0x1FFF
      val deleted = (raw & 0x8000) != 0
      val overflow = (raw & 0x4000) != 0
      if (!deleted && overflow)
        throw new IllegalArgumentException(
          s"jetmdb/jet3: overflow row $i on a page owned by TDEF " +
            s"$tdefPage (flag 0x4000): moved-row pointers are out of " +
            "scope; compact the database before migrating")
      if (!deleted) out += ((start, prevStart))
      prevStart = start
      i += 1
    }
    out.result()
  }

  /** Extent [start, end) of row `rowIdx` on a Jet3 page regardless of
    * owner — the LVAL lookup path (a memo pointer addresses a specific
    * row on a long-value page). Jet3 data pages keep the row count at
    * @8 and offsets from @10 (vs Jet4's @12/@14). */
  def rowExtent(page: Array[Byte], rowIdx: Int): (Int, Int) = {
    val nRows = u16(page, 8)
    require(rowIdx < nRows,
      s"jetmdb/jet3: LVAL row $rowIdx out of range ($nRows rows)")
    val start = u16(page, 10 + 2 * rowIdx) & 0x1FFF
    val end =
      if (rowIdx == 0) PageSize
      else u16(page, 10 + 2 * (rowIdx - 1)) & 0x1FFF
    (start, end)
  }

  /** Resolve a Jet3 memo 12-byte in-row value to its payload bytes —
    * the same three storage forms as the Jet4 reader
    * ([[JetMdbFormat.resolveMemo]]): inline (flag 0x80, payload after
    * the header), single-LVAL (flag 0x40, one row on an "LVAL"-owned
    * page), and chained type-2 (flag 0x00, [next-pointer][chunk] rows
    * walked until the declared length is collected). Only the page
    * geometry differs (2048-byte pages, row directory at @8/@10). */
  def resolveMemo(
      page: Array[Byte], s: Int, e: Int,
      lval: Int => Array[Byte]): Array[Byte] = {
    require(e - s >= 12,
      s"jetmdb/jet3: memo header truncated (${e - s} bytes)")
    val hdr = i32(page, s)
    val len = hdr & 0xFFFFFF
    val flags = (hdr >>> 24) & 0xFF
    if ((flags & MemoInline) != 0) {
      require(s + 12 + len <= e, "jetmdb/jet3: inline memo overruns its row")
      java.util.Arrays.copyOfRange(page, s + 12, s + 12 + len)
    } else if ((flags & MemoSingleLval) != 0) {
      require(lval != null,
        "jetmdb/jet3: LVAL memo encountered but no page fetcher supplied")
      val ptr = i32(page, s + 4)
      val lvalPage = lval(ptr & 0xFFFFFF)
      require(i32(lvalPage, 4) == LvalOwner,
        s"jetmdb/jet3: memo pointer targets a non-LVAL page ${ptr & 0xFFFFFF}")
      val (ls, le) = rowExtent(lvalPage, (ptr >>> 24) & 0xFF)
      require(le - ls >= len, "jetmdb/jet3: LVAL row shorter than memo length")
      java.util.Arrays.copyOfRange(lvalPage, ls, ls + len)
    } else {
      require(lval != null,
        "jetmdb/jet3: LVAL memo encountered but no page fetcher supplied")
      val out = new java.io.ByteArrayOutputStream(len)
      var ptr = i32(page, s + 4)
      var remaining = len
      var hops = 0
      while (remaining > 0) {
        require(ptr != 0,
          s"jetmdb/jet3: chained LVAL ended $remaining bytes short")
        hops += 1
        require(hops <= len + 1, "jetmdb/jet3: chained LVAL pointer cycle")
        val lvalPage = lval(ptr & 0xFFFFFF)
        require(i32(lvalPage, 4) == LvalOwner,
          s"jetmdb/jet3: chain pointer targets a non-LVAL page ${ptr & 0xFFFFFF}")
        val (ls, le) = rowExtent(lvalPage, (ptr >>> 24) & 0xFF)
        require(le - ls >= 4, "jetmdb/jet3: chained LVAL row too short")
        val chunk = math.min(le - ls - 4, remaining)
        out.write(lvalPage, ls + 4, chunk)
        remaining -= chunk
        ptr = i32(lvalPage, ls)
      }
      out.toByteArray
    }
  }

  /** Decode one Jet3 row (u8 column count, u8 var offsets — the
    * ≤255-byte row profile; larger rows are rejected, never
    * misparsed). `wanted` prunes decode like the Jet4 path — for MEMO
    * that skips the LVAL page fetches entirely; `lval` fetches a page
    * by number for memo indirection (null → inline-only). */
  def decodeRow(
      page: Array[Byte], start: Int, end: Int,
      tdef: JetTableDef,
      lval: Int => Array[Byte] = null,
      wanted: Array[Boolean] = null): Array[Any] = {
    if (end - start > 255)
      throw new UnsupportedOperationException(
        escape(s"a ${end - start}-byte row (u8-offset rows cap at 255; " +
          "longer rows use the jump-table form)"))
    val nCols = u8(page, start)
    val bitmaskSz = (nCols + 7) / 8
    val maskOff = end - bitmaskSz
    def notNull(colNum: Int): Boolean =
      (u8(page, maskOff + colNum / 8) & (1 << (colNum % 8))) != 0
    val hasVar =
      tdef.columns.exists(c => !c.fixed && c.typeCode != T_BOOL)
    val varCount = if (hasVar) u8(page, maskOff - 1) else 0
    // u8 var offset table: (varCount+1) entries below the count byte,
    // offsets from row start, entry varCount = end of data
    val varTabOff = maskOff - 1 - (varCount + 1)
    def varExtent(idx: Int): (Int, Int) = {
      // ascending entries, profile choice mirroring the Jet4 u16 form
      // (public sources disagree on Jet3's in-row table order; the
      // fixture writer emits this same profile)
      val s = u8(page, varTabOff + idx)
      val e = u8(page, varTabOff + idx + 1)
      (start + s, start + e)
    }
    val fixedBase = start + 1
    val out = new Array[Any](tdef.columns.length)
    var i = 0
    while (i < tdef.columns.length) {
      val c = tdef.columns(i)
      out(i) =
        if (wanted != null && !wanted(i)) null
        else if (c.typeCode == T_BOOL)
          java.lang.Boolean.valueOf(notNull(c.colNum))
        else if (!notNull(c.colNum)) null
        else if (c.fixed) decodeFixed(page, fixedBase + c.offsetF, c)
        else {
          val (s, e) = varExtent(c.offsetV)
          if (c.typeCode == T_MEMO)
            // Jet3 memo payload is single-byte CP1252 (no UCS-2, no
            // compression flag — both postdate Jet3)
            new String(resolveMemo(page, s, e, lval), cp1252)
          else if (c.typeCode == T_OLE)
            // OLE: same 12-byte header + LVAL forms as memo, payload
            // surfaced as raw bytes (r12 — BinaryType downstream)
            resolveMemo(page, s, e, lval)
          else new String(page, s, e - s, cp1252)
        }
      i += 1
    }
    out
  }

  private def decodeFixed(p: Array[Byte], off: Int, c: JetColumn): Any =
    c.typeCode match {
      case T_BYTE => (u8(p, off)).toShort
      case T_INT => i16(p, off)
      case T_LONG => java.lang.Integer.valueOf(i32(p, off))
      case T_MONEY => java.math.BigDecimal.valueOf(i64(p, off), 4)
      case T_FLOAT => java.lang.Float.valueOf(f32(p, off))
      case T_DOUBLE => java.lang.Double.valueOf(f64(p, off))
      case T_DATETIME => oleDateToMicros(f64(p, off))
      case T_TEXT => // fixed-width text: single-byte field
        new String(p, off, c.length, cp1252)
      case other =>
        throw new UnsupportedOperationException(
          escape(f"fixed type 0x$other%02x"))
    }

  /** Jet3 catalog walk: MSysObjects TDEF at page 2, same Name/Id/Type
    * contract as Jet4. */
  def readCatalog(
      pageCount: Int, pages: Int => Array[Byte]): Seq[CatalogEntry] = {
    val sysTdef =
      JetMdbFormat.withEncryptedHint(parseTdefChained(2, pages))
    require(
      Seq("Name", "Id", "Type").forall(n => sysTdef.columns.exists(
        _.name == n)),
      "jetmdb/jet3: MSysObjects TDEF lacks Name/Id/Type columns")
    val nameIdx = sysTdef.columns.indexWhere(_.name == "Name")
    val idIdx = sysTdef.columns.indexWhere(_.name == "Id")
    val typeIdx = sysTdef.columns.indexWhere(_.name == "Type")
    (1 until pageCount).flatMap { pn =>
      val page = pages(pn)
      dataRowExtents(page, 2).map { case (s, e) =>
        val row = decodeRow(page, s, e, sysTdef)
        CatalogEntry(
          String.valueOf(row(nameIdx)),
          row(idIdx).asInstanceOf[Integer].intValue() & 0x00FFFFFF,
          row(typeIdx) match {
            case sv: java.lang.Short => sv.intValue()
            case iv: Integer => iv.intValue()
            case other => String.valueOf(other).toInt
          })
      }
    }
  }
}
