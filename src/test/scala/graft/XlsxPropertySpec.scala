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
    nCols <- Gen.choose(1, 30) // > 26 exercises AA-style column refs
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
}
