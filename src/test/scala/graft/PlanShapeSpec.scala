package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, RowDataSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

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

  /** Queries allowed a both-sides-unaggregated loop join, each with the
    * human-carried bound that makes it safe. The shared pattern: one
    * side is a LITERAL key-range probe set (`vec_id < nQueries`,
    * nQueries ≤ 10; `doc_id < 200`) — bounded by a constant predicate
    * on a unique dense key, which the `scanNoAgg` witness cannot see
    * (a filter is structurally indistinguishable from a data-sized
    * one). Cost is O(probeConst · N): one stream-side scan, never
    * N². Any NEW loop join must either aggregate a side or earn an
    * entry here with its bound. */
  private val allowLoop: Map[String, String] = {
    val qBounded = "broadcast side = literal probe set (vec_id < nQueries, " +
      "nQueries ≤ 10 constant, unique key) → O(nQ·N) single corpus scan"
    Map(
      "join_theta_pairs" -> ("both sides = region table, fixed 5 rows at " +
        "ANY scale factor (TPC-H spec) → ≤ 25 pairs"),
      "dedup_band_recall" -> ("both sides = doc_id < 200 literal probe " +
        "(recallProbeN const) → ≤ 200² shingle compares, a diagnostic audit"),
      "sim_topk_bruteforce" -> (qBounded + "; the documented exact baseline " +
        "the ANN variants are recall-audited against"),
      "sim_topk_native" -> qBounded,
      "sim_mips_topk" -> qBounded,
      "sim_maxsim_topk" -> qBounded,
      "sim_radius_search" -> qBounded,
      "sim_hamming_topk" -> qBounded,
      "sim_pq_topk" -> qBounded,
      "sim_mrl_recall" -> qBounded,
      "sim_recall_at_k" -> qBounded,
      "sim_rbo_audit" -> (qBounded + "; the loop join is the inherited " +
        "brute-force truth ranking the IVF route's prefix order is " +
        "RBO-scored against — same bound as sim_recall_at_k"),
      "sim_filtered_ann" -> (qBounded + "; the loop join is the " +
        "filtered-EXACT truth branch the approx route is recall-joined " +
        "against — the approx branch itself is a cell equi join"),
      "sim_retrieval_metrics" -> qBounded,
      "sim_hybrid_rrf" -> qBounded,
      "sim_vector_arith" -> qBounded)
  }

  private def withStaticPlan[A](df: org.apache.spark.sql.DataFrame)(
      f: SparkPlan => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      f(df.queryExecution.executedPlan)
    } finally spark.conf.set(key, prev)
  }

  /** Flagged single-partition exchanges in the query's physical plan.
    * `sparkPlan` predates EnsureRequirements (no exchanges yet) and
    * under AQE `executedPlan` wraps the tree in AdaptiveSparkPlanExec,
    * so the check plans with AQE off — the static exchange structure
    * is exactly what this contract is about. */
  private def flagged(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] =
    withStaticPlan(df) { plan =>
      plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition && scanNoAgg(e.child) => e
      }
    }

  /** The OTHER two scale-killers (r11 verdict task #4): a
    * CartesianProduct or BroadcastNestedLoopJoin whose BOTH sides reach
    * a raw scan un-aggregated is an O(|L|·|R|) pair enumeration over
    * data-sized inputs. One aggregated side is the engine's sanctioned
    * pattern (`crossJoin(broadcast(<1-row census>))`, query-bounded
    * broadcast sides, |cells|²-bounded self-joins) and passes the same
    * `scanNoAgg` witness. */
  private def flaggedLoopJoins(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] =
    withStaticPlan(df) { plan =>
      plan.collect {
        case j: CartesianProductExec
            if scanNoAgg(j.left) && scanNoAgg(j.right) => j
        case j: BroadcastNestedLoopJoinExec
            if scanNoAgg(j.left) && scanNoAgg(j.right) => j
      }
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

  test("no registered query plans a both-sides-unaggregated loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !allowLoop.contains(name) =>
        val bad = flaggedLoopJoins(fn(spark, sf))
        if (bad.nonEmpty) Some(name -> bad.map(_.nodeName).distinct.mkString("+"))
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"data-sized loop joins in: ${offenders.mkString(", ")}")
  }

  test("allowlist entries name real queries (a rename can't silently un-gate)") {
    assert(allow.keySet.subsetOf(SparkEntry.queries.keySet), allow.keys.toString())
    assert(allowLoop.keySet.subsetOf(SparkEntry.queries.keySet),
      allowLoop.keys.toString())
  }

  test("NEGATIVE CONTROL: the loop-join detector flags a scan×scan cross join") {
    val bad = Tables.nation(spark, sf).crossJoin(Tables.region(spark, sf))
    assert(flaggedLoopJoins(bad).nonEmpty,
      "detector failed to flag a both-sides-raw-scan cross join")
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
