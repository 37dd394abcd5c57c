package graft

import graft.sources.xlsx.XlsxParser
import org.scalacheck.Gen

/** Property-based round-trip law for the XLSX writer/reader pair:
  * any table of XML-valid cell strings written by `XlsxParser.write`
  * must read back cell-identical (nulls included). Exercises XML
  * escaping, sparse rows, wide tables (two-letter column refs past
  * Z), and unicode — the corners a fixed fixture misses. */
class XlsxPropertySpec extends SparkSpec {

  // XML 1.0 forbids most control chars; the writer's domain is
  // printable text (spreadsheet cells), so generate in that domain —
  // including the characters that MUST be escaped (& < >) and
  // non-ASCII.
  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('&', '<', '>', '"', '\'', ' ', 'á', 'ç', '€', '中'))),
    Gen.const(""),
    Gen.const(null: String))

  private val tableGen: Gen[(Seq[String], Seq[Seq[String]])] = for {
    nCols <- Gen.choose(1, 60) // past 26 (AA…) and into BA+ two-letter refs
    nRows <- Gen.choose(0, 12)
    // headers must be non-null; duplicates fine for the raw parser
    header <- Gen.listOfN(nCols, Gen.identifier.map(_.take(8)))
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cellGen))
  } yield (header.toSeq, rows.map(_.toSeq))

  test("write → parse round-trips arbitrary printable tables (200 cases)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_prop").toString
    val cases = Gen.listOfN(200, tableGen).sample.getOrElse(Seq.empty)
    assert(cases.nonEmpty)
    cases.zipWithIndex.foreach { case ((header, rows), i) =>
      val path = s"$dir/t$i.xlsx"
      XlsxParser.write(path, header, rows)
      val back = XlsxParser.parse(path)
      assert(back.headOption.map(_.toSeq).getOrElse(Seq.empty) === header,
        s"case $i header")
      // the parser right-trims absent trailing cells; pad for compare
      val gotRows = back.drop(1).map(r => r.padTo(header.length, null: String))
      // empty-string cells legitimately read back as "" or null
      // (inline-str with empty <t> — normalize both sides to null)
      def norm(rs: Seq[Seq[String]]) =
        rs.map(_.map(c => if (c == null || c.isEmpty) null else c))
      assert(norm(gotRows) === norm(rows), s"case $i rows")
    }
  }

  test("inferSchema unification lattice: promotions and fallbacks") {
    import graft.sources.xlsx.XlsxTypeInference.unify
    import org.apache.spark.sql.types._
    assert(unify(Seq("1", "-42", null, "")) === LongType)
    assert(unify(Seq("1", "2.5")) === DoubleType)          // long ∪ double → double
    assert(unify(Seq("1.0E7", ".5", "+3")) === DoubleType)
    assert(unify(Seq("true", "FALSE")) === BooleanType)
    assert(unify(Seq("2023-03-15", "1999-12-31")) === DateType)
    assert(unify(Seq("2023-03-15", "2023-03-15 23:59:58")) === TimestampNTZType)
    assert(unify(Seq("1", "x")) === StringType)            // mixed → string
    assert(unify(Seq("2023-13-45")) === StringType)        // shape ok, invalid date
    assert(unify(Seq(null, "")) === StringType)            // all-null column
    // long overflow promotes to double (lossy but numeric — the same
    // lattice Spark's CSV inference applies), not to string
    assert(unify(Seq("99999999999999999999")) === DoubleType)
  }

  test("typed round-trip: random typed tables infer + read back value-identical (40 cases)") {
    import org.apache.spark.sql.types._
    val longGen = Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(_.toString)
    val doubleGen = Gen.chooseNum(-1e6, 1e6).map(_.toString)
    val boolGen = Gen.oneOf("true", "false", "TRUE", "False")
    val dateGen = Gen.chooseNum(-10000L, 30000L).map(java.time.LocalDate.ofEpochDay(_).toString)
    val tsGen = for {
      d <- Gen.chooseNum(0L, 30000L); s <- Gen.chooseNum(0L, 86399L)
    } yield java.time.LocalDate.ofEpochDay(d).atStartOfDay.plusSeconds(s)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val colTypes = Seq[(Gen[String], DataType)](
      (longGen, LongType), (doubleGen, DoubleType), (boolGen, BooleanType),
      (dateGen, DateType), (tsGen, TimestampNTZType))
    // ~10% nulls in every generated column — inference must skip them
    def withNulls(g: Gen[String]): Gen[String] =
      Gen.frequency(9 -> g, 1 -> Gen.const(null: String))

    val caseGen = for {
      nCols <- Gen.choose(1, 5)
      cols <- Gen.listOfN(nCols, Gen.oneOf(colTypes))
      nRows <- Gen.choose(1, 20)
      // row 0 all non-null: an all-null column legitimately infers
      // string, which is not the shape under test here
      row0 <- Gen.sequence[List[String], String](cols.map(_._1))
      rest <- Gen.listOfN(nRows - 1, Gen.sequence[List[String], String](cols.map(c => withNulls(c._1))))
    } yield (cols.map(_._2), row0 :: rest)

    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_typed").toString
    val cases = Gen.listOfN(40, caseGen).sample.getOrElse(Seq.empty)
    assert(cases.nonEmpty)
    cases.zipWithIndex.foreach { case ((types, rows), i) =>
      val path = s"$dir/t$i.xlsx"
      // leading row-index column keeps the comparison order-stable
      val header = "idx" +: types.indices.map(c => s"c$c")
      val indexed = rows.zipWithIndex.map { case (r, ri) => ri.toString +: r }
      graft.sources.xlsx.XlsxParser.write(path, header, indexed)
      val df = spark.read.format("xlsx").option("inferSchema", true).load(path)
      val expected = StructType(StructField("idx", LongType) +:
        types.zipWithIndex.map { case (t, c) => StructField(s"c$c", t) })
      assert(df.schema === expected, s"case $i schema")
      val got = df.orderBy("idx").collect()
      indexed.zip(got).foreach { case (exp, row) =>
        types.zipWithIndex.foreach { case (t, c) =>
          val cell = exp(c + 1)
          val actual = row.get(c + 1)
          if (cell == null) assert(actual == null, s"case $i col $c null")
          else t match {
            case LongType => assert(actual === cell.toLong)
            case DoubleType => assert(actual === cell.toDouble)
            case BooleanType => assert(actual === cell.toLowerCase.toBoolean)
            case DateType => assert(actual === java.sql.Date.valueOf(cell))
            case TimestampNTZType => assert(actual === java.time.LocalDateTime.parse(
              cell, java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
            case other => fail(s"unexpected $other")
          }
        }
      }
    }
  }

  // ---------- hand-built workbooks for the parser corners the engine's
  // own writer never produces (foreign-tool workbooks) ----------

  private def writeZip(path: String, entries: Seq[(String, String)]): Unit = {
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try entries.foreach { case (n, c) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }

  private val ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  private def workbookXml(date1904: Boolean): String =
    s"""<workbook xmlns="$ns">""" +
      (if (date1904) """<workbookPr date1904="1"/>""" else "<workbookPr/>") +
      """<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>"""

  // xf 0 = general, xf 1 = builtin date (14), xf 2 = custom date code,
  // xf 3 = custom NON-date code (plain number) — a date conversion on
  // xf 3 would be a false positive
  private val stylesXml: String =
    s"""<styleSheet xmlns="$ns">""" +
      """<numFmts count="2">""" +
      """<numFmt numFmtId="164" formatCode="yyyy&quot;x&quot;mm.dd"/>""" +
      """<numFmt numFmtId="165" formatCode="0.00"/></numFmts>""" +
      """<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14"/>""" +
      """<xf numFmtId="164"/><xf numFmtId="165"/></cellXfs></styleSheet>"""

  private def sheetXml(cells: String): String =
    s"""<worksheet xmlns="$ns"><sheetData>$cells</sheetData></worksheet>"""

  private def buildWorkbook(path: String, date1904: Boolean, cells: String): Unit =
    writeZip(path, Seq(
      "xl/workbook.xml" -> workbookXml(date1904),
      "xl/styles.xml" -> stylesXml,
      "xl/worksheets/sheet1.xml" -> sheetXml(cells)))

  test("typed write → typed read round-trips dates and timestamps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_twr").toString
    val df = Seq(
      (1L, java.sql.Date.valueOf("2023-03-15"), java.time.LocalDateTime.of(2023, 3, 15, 23, 59, 58)),
      (2L, java.sql.Date.valueOf("1999-12-31"), java.time.LocalDateTime.of(2000, 1, 1, 0, 0, 1)),
      // sub-second precision must NOT silently truncate
      (3L, java.sql.Date.valueOf("2024-02-29"),
        java.time.LocalDateTime.of(2024, 2, 29, 12, 0, 0, 500000000)))
      .toDF("id", "d", "t")
    df.write.format("xlsx").mode("overwrite").save(dir)
    val back = spark.read.format("xlsx").option("inferSchema", true).load(dir)
      .orderBy("id").collect()
    assert(back.map(_.getAs[java.sql.Date]("d")).toSeq ===
      Seq(java.sql.Date.valueOf("2023-03-15"), java.sql.Date.valueOf("1999-12-31"),
        java.sql.Date.valueOf("2024-02-29")))
    assert(back.map(_.getAs[java.time.LocalDateTime]("t")).toSeq ===
      Seq(java.time.LocalDateTime.of(2023, 3, 15, 23, 59, 58),
        java.time.LocalDateTime.of(2000, 1, 1, 0, 0, 1),
        java.time.LocalDateTime.of(2024, 2, 29, 12, 0, 0, 500000000)))
  }

  test("mode=FAILFAST surfaces malformed typed cells; PERMISSIVE nulls them") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_mode").toString
    val path = s"$dir/m.xlsx"
    XlsxParser.write(path, Seq("id", "n"), Seq(Seq("1", "10"), Seq("2", "oops")))
    val schema = StructType(Seq(StructField("id", LongType), StructField("n", LongType)))
    // PERMISSIVE (default): malformed cell reads as null
    val perm = spark.read.format("xlsx").schema(schema).load(path)
      .orderBy("id").collect()
    assert(perm(1).isNullAt(1))
    // FAILFAST: scan aborts with file/column context
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("xlsx").schema(schema).option("mode", "FAILFAST")
        .load(path).collect()
    }
    assert(e.getMessage.contains("FAILFAST") ||
      Option(e.getCause).exists(_.getMessage.contains("FAILFAST")))
  }

  test("multi-sheet workbooks: select by name, by 1-based index, default first; OPC rels honored") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_sheets").toString
    val path = s"$dir/multi.xlsx"
    // sheet order in workbook.xml differs from the zip entry naming,
    // and "Dados" lives in a NON-conventional entry (data2.xml) — a
    // foreign-tool shape only the r:id → rels indirection resolves
    val wb =
      s"""<workbook xmlns="$ns" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Resumo" sheetId="1" r:id="rId1"/>""" +
        """<sheet name="Dados" sheetId="2" r:id="rId2"/></sheets></workbook>"""
    val rels =
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="t" Target="worksheets/data2.xml"/>""" +
        "</Relationships>"
    def sheetOf(v: String) =
      s"""<worksheet xmlns="$ns"><sheetData><row r="1">""" +
        s"""<c r="A1" t="inlineStr"><is><t>$v</t></is></c></row></sheetData></worksheet>"""
    writeZip(path, Seq(
      "xl/workbook.xml" -> wb,
      "xl/_rels/workbook.xml.rels" -> rels,
      "xl/worksheets/sheet1.xml" -> sheetOf("resumo-a1"),
      "xl/worksheets/data2.xml" -> sheetOf("dados-a1")))

    assert(XlsxParser.sheetEntries(path).map(_._1) === Seq("Resumo", "Dados"))
    assert(XlsxParser.parse(path).head.head === "resumo-a1")            // default: first
    assert(XlsxParser.parse(path, Some("Dados")).head.head === "dados-a1") // by name
    assert(XlsxParser.parse(path, Some("2")).head.head === "dados-a1")     // by index
    intercept[IllegalArgumentException] { XlsxParser.parse(path, Some("Nope")) }

    // DSv2 surface: option("sheet", ...) reaches the reader
    val df = spark.read.format("xlsx").option("sheet", "Dados").load(path)
    assert(df.columns.toSeq === Seq("dados-a1")) // row 1 is the header
  }

  test("date-styled numeric cells resolve through the 1900 and 1904 date systems") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_dates").toString
    val cells =
      """<row r="1">""" +
        """<c r="A1" s="1"><v>45000</v></c>""" +   // builtin date fmt
        """<c r="B1" s="2"><v>45000</v></c>""" +   // custom date fmt
        """<c r="C1" s="3"><v>45000</v></c>""" +   // custom NUMBER fmt — stays raw
        """<c r="D1"><v>45000</v></c>""" +          // no style — stays raw
        """<c r="E1" s="1"><v>1.5</v></c>""" +      // fractional → date + time
        """</row>"""
    buildWorkbook(s"$dir/d1900.xlsx", date1904 = false, cells)
    buildWorkbook(s"$dir/d1904.xlsx", date1904 = true, cells)
    val r1900 = XlsxParser.parse(s"$dir/d1900.xlsx").head
    val r1904 = XlsxParser.parse(s"$dir/d1904.xlsx").head
    val exp1900 = java.time.LocalDate.of(1899, 12, 30).plusDays(45000).toString
    val exp1904 = java.time.LocalDate.of(1904, 1, 1).plusDays(45000).toString
    assert(r1900(0) === exp1900)
    assert(r1900(1) === exp1900)
    assert(r1900(2) === "45000") // number-formatted: NOT a date
    assert(r1900(3) === "45000") // unstyled: NOT a date
    assert(r1900(4) === "1900-01-01 12:00:00") // serial 1.5, 1900 system
    assert(r1904(0) === exp1904) // same serial, 1904 epoch
    // the two date systems are 1462 days apart (the classic corruption
    // signature when the flag is dropped)
    assert(java.time.LocalDate.parse(r1904(0)).toEpochDay -
      java.time.LocalDate.parse(r1900(0)).toEpochDay === 1462L)
  }

  test("duration/time-only formats stay raw; uppercase date codes and bad numFmts handled") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_fmt").toString
    val styles =
      s"""<styleSheet xmlns="$ns">""" +
        """<numFmts count="4">""" +
        """<numFmt numFmtId="164" formatCode="[h]:mm"/>""" +          // elapsed duration
        """<numFmt numFmtId="165" formatCode="YYYY-MM-DD"/>""" +      // uppercase date (ECMA case-insensitive)
        """<numFmt formatCode="0.00"/>""" +                            // missing id: must not abort the parse
        """<numFmt numFmtId="166" formatCode="mm:ss"/></numFmts>""" + // minutes:seconds, not a date
        """<cellXfs count="5"><xf numFmtId="0"/><xf numFmtId="164"/>""" +
        """<xf numFmtId="165"/><xf numFmtId="20"/><xf numFmtId="166"/></cellXfs></styleSheet>"""
    writeZip(s"$dir/f.xlsx", Seq(
      "xl/workbook.xml" -> workbookXml(date1904 = false),
      "xl/styles.xml" -> styles,
      "xl/worksheets/sheet1.xml" -> sheetXml(
        """<row r="1">""" +
          """<c r="A1" s="1"><v>36.5</v></c>""" +   // [h]:mm duration: raw serial, not 1900-02-05
          """<c r="B1" s="2"><v>45000</v></c>""" +  // YYYY-MM-DD: a date despite the case
          """<c r="C1" s="3"><v>0.75</v></c>""" +   // builtin 20 (h:mm, time-only): raw
          """<c r="D1" s="4"><v>0.75</v></c>""" +   // mm:ss custom: raw
          """</row>""")))
    val row = XlsxParser.parse(s"$dir/f.xlsx").head
    assert(row(0) === "36.5")
    assert(row(1) === java.time.LocalDate.of(1899, 12, 30).plusDays(45000).toString)
    assert(row(2) === "0.75")
    assert(row(3) === "0.75")
  }

  test("Excel 1900-leap-year quirk: serials below and above the phantom Feb 29") {
    assert(XlsxParser.dateSerialToIso(1, date1904 = false) === "1900-01-01")
    assert(XlsxParser.dateSerialToIso(59, date1904 = false) === "1900-02-28")
    // serial 60 is Excel's nonexistent 1900-02-29; like most readers we
    // land it on March 1 (same day as serial 61 — the 1-day overlap is
    // the quirk itself)
    assert(XlsxParser.dateSerialToIso(60, date1904 = false) === "1900-03-01")
    assert(XlsxParser.dateSerialToIso(61, date1904 = false) === "1900-03-01")
    assert(XlsxParser.dateSerialToIso(0, date1904 = true) === "1904-01-01")
  }

  test("seconds-rounding to midnight rolls to the next day in date-only form") {
    // 45000.9999999 * 86400 rounds to a full day of seconds — one
    // instant, one representation: same string as the integral serial
    assert(XlsxParser.dateSerialToIso(45000.9999999, date1904 = false)
      === XlsxParser.dateSerialToIso(45001.0, date1904 = false))
    assert(!XlsxParser.dateSerialToIso(45000.9999999, date1904 = false).contains(":"))
    // a genuine near-midnight time still renders with the time part
    assert(XlsxParser.dateSerialToIso(45000.99998, date1904 = false)
      === "2023-03-15 23:59:58")
  }

  test("malformed style attribute (non-numeric s) is ignored, not a parse abort") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_bads").toString
    buildWorkbook(s"$dir/bad.xlsx", date1904 = false,
      """<row r="1">""" +
        """<c r="A1" s="x"><v>45000</v></c>""" + // bogus style index
        """<c r="B1" s="1"><v>45000</v></c>""" + // healthy date cell after it
        """</row>""")
    val row = XlsxParser.parse(s"$dir/bad.xlsx").head
    assert(row(0) === "45000") // unparseable style = not a date style
    assert(row(1) === java.time.LocalDate.of(1899, 12, 30).plusDays(45000).toString)
  }

  test("rich-text inline strings concatenate all runs; t=d literals pass through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_rich").toString
    val cells =
      """<row r="1">""" +
        """<c r="A1" t="inlineStr"><is><r><rPr/><t>hello </t></r><r><t>world</t></r></is></c>""" +
        """<c r="B1" t="d"><v>2024-02-29T12:00:00</v></c>""" +
        """<c r="AA1" t="inlineStr"><is><t>col27</t></is></c>""" +
        """<c r="AB1" t="inlineStr"><is><t xml:space="preserve"> pad </t></is></c>""" +
        """</row>"""
    buildWorkbook(s"$dir/rich.xlsx", date1904 = false, cells)
    val row = XlsxParser.parse(s"$dir/rich.xlsx").head
    assert(row(0) === "hello world")
    assert(row(1) === "2024-02-29T12:00:00")
    assert(row(26) === "col27")  // AA resolves to ordinal 26
    assert(row(27) === " pad ")
    assert(row(2) === null)      // gap columns padded as null
  }
}
