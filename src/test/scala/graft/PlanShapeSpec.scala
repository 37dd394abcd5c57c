package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, RowDataSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** PLAN-SHAPE CONTRACT (r10 verdict task #2) — the physical-plan
  * sibling of the RegistrySpec output-type contract: no registered
  * query may plan a DATA-SIZED single-partition exchange.
  *
  * `Exchange SinglePartition` funnels its entire input through ONE
  * task — the shape behind every unpartitioned `Window.orderBy` /
  * `ntile` / global `row_number`, and a straight scale-killer at
  * 100 TB (BENCH_r10_sf1 measured 4.9× at 10× data on `win_ntile`
  * before its histogram rewrite). The engine's own discipline is that
  * ONLY bounded tables may collapse to one partition: compact value
  * histograms (cardinality capped by the value domain — cents,
  * micro-units — not the row count), ≤1e6-key score tables, k-row
  * bucket frames, calendar spines.
  *
  * The structural test: a single-partition exchange is flagged when a
  * raw SCAN is reachable below it without crossing an AGGREGATE.
  * Every bounded-by-construction table in this engine is the output
  * of a groupBy on a compact key, so crossing an aggregate is the
  * plan-level witness of the boundedness argument; a scan reaching
  * the exchange un-aggregated means full rows are being funneled.
  * Aggregates on DATA-SIZED keys (per-customer, per-doc) still pass
  * structurally — those windows are customer-sized, documented
  * per-op (e.g. `q_rfm`'s measured-revert note), and bounded by an
  * entity population rather than the fact-table row count; the named
  * allowlist below exists for any case that needs a human-carried
  * bound instead.
  */
class PlanShapeSpec extends SparkSpec {

  /** Queries allowed to keep a flagged shape, each with its bound. */
  private val allow: Map[String, String] = Map.empty

  private def isScan(p: SparkPlan): Boolean = p match {
    case _: FileSourceScanExec | _: BatchScanExec | _: RowDataSourceScanExec => true
    case _ => false
  }

  /** A raw scan is reachable below `p` without crossing an aggregate. */
  private def scanNoAgg(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => false
    case s if isScan(s) => true
    case other => other.children.exists(scanNoAgg)
  }

  /** Flagged single-partition exchanges in the query's physical plan.
    * `sparkPlan` predates EnsureRequirements (no exchanges yet) and
    * under AQE `executedPlan` wraps the tree in AdaptiveSparkPlanExec,
    * so the check plans with AQE off — the static exchange structure
    * is exactly what this contract is about. */
  private def flagged(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition && scanNoAgg(e.child) => e
      }
    } finally spark.conf.set(key, prev)
  }

  test("no registered query plans a data-sized Exchange SinglePartition") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allow.contains(name) =>
        val bad = flagged(fn(spark, sf))
        if (bad.nonEmpty) Some(name -> bad.size) else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"data-sized single-partition exchanges in: ${offenders.mkString(", ")}")
  }

  test("allowlist entries name real queries (a rename can't silently un-gate)") {
    assert(allow.keySet.subsetOf(SparkEntry.queries.keySet), allow.keys.toString())
  }

  test("NEGATIVE CONTROL: the detector flags the pre-r11 win_ntile shape") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val bad = Tables.orders(spark, sf)
      .withColumn("q", ntile(4).over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    assert(flagged(bad).nonEmpty,
      "detector failed to flag a data-sized global ntile")
  }
}
