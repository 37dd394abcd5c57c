package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-16 optimization-equivalence pins: each test locks an
  * optimized operator's output to the independent shape it replaced
  * (the oracle gate checks engine-vs-DuckDB; these check
  * optimized-vs-reference-shape inside the engine, on sf0.001). */
class Round16OpsSpec extends SparkSpec {

  test("rag context: single-pass multi-query bm25 equals per-query bm25Rank calls") {
    // reconstruct the operator's chunk table and rank each rag query
    // independently through the public bm25Rank — the exact shape the
    // r16 single-pass fold replaced
    val ragQueries = Seq(
      (1L, Seq("vector", "hash")), (2L, Seq("stream", "window")),
      (3L, Seq("dup", "key")))
    val chunks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(graft.api.Graft.chunkOverlap(col("text"), window = 50, stride = 30))
          .as(Seq("chunk_idx", "chunk")))
      .select(concat(col("doc_id"), lit(":"), col("chunk_idx")).as("chunk_id"),
        col("chunk"))
    val expected = ragQueries.map { case (qid, terms) =>
      val top = graft.api.Graft.bm25Rank(chunks, "chunk", "chunk_id", terms, topK = 3)
        .collect()
      qid -> top.map(r => (r.getString(0), r.getAs[Long]("score_micro")))
    }.toMap
    val got = TextAnalysis.ragContext(spark, sf).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("top_score_micro"),
          r.getAs[String]("context"))).toMap
    ragQueries.foreach { case (qid, _) =>
      val exp = expected(qid)
      val (nChunks, topScore, context) = got(qid)
      assert(nChunks === exp.length.toLong, s"query $qid chunk count")
      assert(topScore === exp.map(_._2).max, s"query $qid top score")
      // provenance tags appear in bm25 score order (desc, id tie-break)
      val tagOrder = exp.sortBy { case (id, s) => (-s, id) }.map { case (id, _) => s"[$id]" }
      val positions = tagOrder.map(context.indexOf)
      assert(positions.forall(_ >= 0), s"query $qid missing tags: $tagOrder vs $context")
      assert(positions === positions.sorted, s"query $qid tag order")
    }
  }

  test("weighted median: two-level parallel prefix equals the single serial window") {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val qty = round(col("l_quantity")).cast("long")
    val byFlag = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("cents"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), cents.as("cents"), qty.as("w"))
      .groupBy(col("l_returnflag"), col("cents")).agg(sum(col("w")).as("w"))
      .withColumn("cumw", sum(col("w")).over(byFlag))
      .withColumn("total", sum(col("w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))))
      .filter(col("cumw") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("median_cents"), max(col("total")).as("total_weight"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = Aggregations.weightedMedian(spark, sf).collect()
      .map(r => (r.getString(0),
        math.round(r.getDouble(1) * 100), r.getLong(2))).toSet
    assert(got === ref)
  }
}
