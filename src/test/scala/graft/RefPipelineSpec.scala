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
}
