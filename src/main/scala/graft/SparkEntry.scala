package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Sources
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own module and contributes a map
  * of named queries plus (where SQL-expressible) a DuckDB oracle query
  * with identical column names/ordering — the driver hash-compares the
  * two (Verify.scala).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's entire dataflow (source → project →
    * filter + side-output → format → sink, main.py:5–17) as one query. */
  def entry(spark: SparkSession): DataFrame =
    RefPipeline.ingestFilter(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefPipeline.queries ++
      Analytics.queries ++
      Joins.queries ++
      Aggregations.queries ++
      StatsOps.queries ++
      MlEval.queries ++
      Windows.queries ++
      SortsAndSets.queries ++
      Scalars.queries ++
      CustomAggs.queries ++
      Extras.queries ++
      Dedup.queries ++
      CorpusOps.queries ++
      Similarity.queries ++
      TextAnalysis.queries ++
      Multimodal.queries ++
      TimeSeries.queries ++
      WarehouseEtl.queries ++
      Layout.queries ++
      GraphOps.queries ++
      GeoOps.queries ++
      Sources.queries ++
      SqlSurface.queries ++
      Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (sketch-based ops) get the
    * driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RefPipeline.oracle ++
      Analytics.oracle ++
      Joins.oracle ++
      Aggregations.oracle ++
      StatsOps.oracle ++
      MlEval.oracle ++
      Windows.oracle ++
      SortsAndSets.oracle ++
      Scalars.oracle ++
      CustomAggs.oracle ++
      Extras.oracle ++
      Dedup.oracle ++
      CorpusOps.oracle ++
      Similarity.oracle ++
      TextAnalysis.oracle ++
      Multimodal.oracle ++
      TimeSeries.oracle ++
      WarehouseEtl.oracle ++
      Layout.oracle ++
      GraphOps.oracle ++
      GeoOps.oracle ++
      Sources.oracle ++
      SqlSurface.oracle ++
      Streams.oracle
}
