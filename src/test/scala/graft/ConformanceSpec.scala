package graft

import graft.api.Graft
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}

/** Reference-conformance fixture (FIXTURES.md §B): replays
  * /root/reference/main.py:6–16 row by row, covering every branch of
  * the main.py:12 predicate, plus the ScalaCheck partition law of
  * SURVEY.md §5.2.3. */
class ConformanceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("bucket", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("size", LongType, nullable = true)))

  // (bucket, name, size, expectedKeep) — exactly FIXTURES.md §B
  private val fixture: Seq[(String, String, java.lang.Long, Boolean)] = Seq(
    ("b1", "minha-pasta/relatorio.xlsx", 1024L, true),
    ("b1", "minha-pasta/sub/deep.xlsx", 2048L, true),
    ("b1", null, 10L, false),
    ("b1", "", 10L, false),
    ("b1", "minha-pasta/notas.csv", 99L, false),
    ("b1", "outra-pasta/plan.xlsx", 99L, false),
    ("b1", "minha-pasta.xlsx", 99L, false),
    ("b1", "minha-pasta/X.XLSX", 99L, false),
    ("b1", "minha-pasta/.xlsx", 12L, true),
    (null, "minha-pasta/a.xlsx", null, true))

  private def fixtureDf = spark.createDataFrame(
    spark.sparkContext.parallelize(fixture.map(f => Row(f._1, f._2, f._3))), schema)

  private val accept = Graft.objectNameAccept(col("name"), "minha-pasta/", ".xlsx")

  test("every fixture row lands on its expected side of the predicate") {
    val got = fixtureDf
      .withColumn("keep", coalesce(accept, lit(false)))
      .collect()
      .map(r => (Option(r.getAs[String]("name")), r.getAs[Boolean]("keep")))
      .toMap
    fixture.foreach { case (_, name, _, expected) =>
      assert(got(Option(name)) === expected, s"name=$name")
    }
  }

  test("kept rows format per main.py:16 with nulls flowing through") {
    val kept = fixtureDf.filter(coalesce(accept, lit(false)))
      .select(format_string("gs://%s/%s (size=%s)",
        col("bucket"), col("name"), col("size")).as("line"))
      .collect().map(_.getString(0)).sorted
    assert(kept.contains("gs://b1/minha-pasta/relatorio.xlsx (size=1024)"))
    // null bucket/size flow into the formatted output, as in python
    assert(kept.contains("gs://null/minha-pasta/a.xlsx (size=null)"))
    assert(kept.length === fixture.count(_._4))
  }

  test("partition law holds for arbitrary inputs (ScalaCheck)") {
    val genName: Gen[String] = Gen.oneOf(
      Gen.const(null: String),
      Gen.const(""),
      Gen.alphaNumStr,
      Gen.alphaNumStr.map("minha-pasta/" + _),
      Gen.alphaNumStr.map("minha-pasta/" + _ + ".xlsx"),
      Gen.alphaNumStr.map(_ + ".xlsx"))
    val prop = Prop.forAll(Gen.listOfN(30, genName)) { names =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(names.map(n => Row("b", n, 1L))), schema)
      val keep = df.filter(coalesce(accept, lit(false))).count()
      val reject = df.filter(!coalesce(accept, lit(false))).count()
      keep + reject == names.length
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
