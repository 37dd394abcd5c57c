package graft

import graft.operators.RefPipeline
import org.apache.spark.sql.functions._

/** Reference-conformance: the accept/reject split must replay
  * /root/reference/main.py:12's predicate semantics exactly,
  * including the edge cases (null name ≅ missing payload, case
  * sensitivity, prefix-without-suffix). */
class RefPipelineSpec extends SparkSpec {

  test("accept ∪ reject partitions the input (filter partition law)") {
    val total = Tables.events(spark, sf).count()
    val accepted = RefPipeline.ingestFilter(spark, sf).count()
    val rejected = RefPipeline.rejectSplit(spark, sf).count()
    assert(accepted + rejected === total)
    assert(accepted > 0 && rejected > 0)
  }

  test("accepted rows are exactly the minha-pasta/*.xlsx names") {
    val uris = RefPipeline.ingestFilter(spark, sf)
      .select(col("uri")).collect().map(_.getString(0))
    assert(uris.nonEmpty)
    assert(uris.forall(_.startsWith("gs://")))
    assert(uris.forall(_.contains("/minha-pasta/")))
    assert(uris.forall(_.endsWith(".xlsx")))
    // case sensitivity: python str.endswith('.xlsx') rejects '.XLSX'
    assert(!uris.exists(_.endsWith(".XLSX")))
  }

  test("reject reasons cover null-name, wrong-prefix, wrong-suffix") {
    val reasons = RefPipeline.rejectSplit(spark, sf)
      .select(col("reason")).distinct().collect().map(_.getString(0)).toSet
    assert(reasons === Set("null-name", "wrong-prefix", "wrong-suffix"))
  }

  test("uri format matches main.py:16 gs://{bucket}/{name}") {
    val row = RefPipeline.ingestFilter(spark, sf).head()
    val uri = row.getAs[String]("uri")
    assert(uri.matches("gs://tma-[0-9]/minha-pasta/.*\\.xlsx"))
  }

  test("malformed ingest records are quarantined, not fatal (PERMISSIVE + corrupt column)") {
    // production ingestion survives bad records: PERMISSIVE mode parses
    // what it can and lands the raw text of broken rows in a corrupt
    // column for a quarantine side-output — the same accept/reject
    // split shape as the reference's filter, applied to parse failures
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_badrec").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/events.json"),
      """{"event_id": 1, "name": "minha-pasta/a.xlsx"}
        |{"event_id": 2 "name": "broken json"}
        |{"event_id": 3, "name": "minha-pasta/b.xlsx"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache() // cache: corrupt-record queries need the full row materialized
    val good = df.filter(col("_corrupt_record").isNull)
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2)
    assert(good.select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(quarantined.count() === 2) // raw text preserved for replay
    df.unpersist()
  }
}
