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

  /** GLOBAL-WINDOW AUDIT (r16, VERDICT item 7): every query that plans
    * a WindowExec with NO partition spec must carry a human-reviewed
    * boundedness argument here. The scanNoAgg witness above already
    * rejects raw-scan-fed global windows; this register covers the
    * residual class — windows over AGGREGATE outputs — where the
    * bound is the aggregate's key domain and only a human can say
    * whether that domain is a value histogram (fixed), a calendar
    * spine (fixed), a test/replicate grid (fixed), or an ENTITY
    * population (grows with the business, documented as such). A new
    * query adding a global window fails until it earns an entry. */
  private val allowGlobalWindow: Map[String, String] = {
    val hourly = "rides the global HOURLY/period series — an aggregate " +
      "keyed by time bucket, bounded by the calendar span of the data, " +
      "not its row count"
    val testStat = "rides a per-group/per-test statistic or rank table — " +
      "bounded by the test's group/replicate/bucket design, not the corpus"
    val valueHist = "rides a value histogram — key domain is the bounded " +
      "value space (cents/micro-units/buckets), not the row count"
    val scoreTable = "rides the model-score distribution table — bounded " +
      "by the score quantization (score_milli domain), not the row count"
    val entity = "ENTITY-KEYED: rides a per-customer/per-doc aggregate — " +
      "bounded by the entity population, which grows with the business; " +
      "a total order over entities is what the operator computes, " +
      "documented per-op"
    val vocab = "rides the term/vocabulary histogram — Heaps-law " +
      "sublinear in the corpus; the rank axis is what the statistic is " +
      "defined over"
    val tiny = "rides a constant-size artifact (hop census, threshold " +
      "grid, probe set, snapshot boundary) — rows fixed by the operator's " +
      "own constants"
    Map(
      // time-series family: the global per-period series
      "ts_acf" -> hourly, "ts_arch_test" -> hourly,
      "ts_backtest_smape" -> hourly, "ts_changepoint" -> hourly,
      "ts_cusum" -> hourly, "ts_ewma" -> hourly,
      "ts_forecast_select" -> hourly, "ts_hampel" -> hourly,
      "ts_holt_damped" -> hourly, "ts_holt_winters" -> hourly,
      "ts_hurst" -> hourly, "ts_hw_seasonal" -> hourly,
      "ts_level_shift" -> hourly, "ts_ljung_box" -> hourly,
      "ts_rolling_corr" -> hourly, "ts_seasonal_strength" -> hourly,
      "ts_stl_decompose" -> hourly, "ts_theil_sen" -> hourly,
      "ts_turning_points" -> hourly, "ts_variance_ratio" -> hourly,
      "ts_xcorr" -> hourly, "ts_yoy_growth" -> hourly,
      "win_moving_median" -> hourly,
      // statistical tests: per-group statistics / rank tables
      "agg_benford" -> valueHist, "agg_bootstrap_ci" -> testStat,
      "agg_chi2" -> testStat, "agg_cramers_v" -> testStat,
      "agg_gini" -> valueHist, "agg_hdr_percentiles" -> valueHist,
      "agg_histogram_eqdepth" -> valueHist, "agg_ks_test" -> valueHist,
      "agg_mann_whitney" -> valueHist, "agg_median_ci" -> valueHist,
      "agg_mutual_info" -> testStat, "agg_spearman" -> valueHist,
      "stats_anderson_darling" -> valueHist, "stats_bh_fdr" -> testStat,
      "stats_dunn" -> testStat, "stats_effect_sizes" -> testStat,
      "stats_kruskal_wallis" -> valueHist, "stats_mood_median" -> valueHist,
      "stats_runs_test" -> hourly, "stats_wilcoxon_signed" -> valueHist,
      // ML evaluation: score-distribution tables
      "ml_auc" -> scoreTable, "ml_best_threshold" -> scoreTable,
      "ml_bootstrap_auc" -> scoreTable, "ml_conformal" -> scoreTable,
      "ml_decision_stump" -> scoreTable, "ml_ece" -> scoreTable,
      "ml_fairness_audit" -> scoreTable, "ml_gain_deciles" -> scoreTable,
      "ml_hosmer_lemeshow" -> scoreTable, "ml_ks_score" -> scoreTable,
      "ml_pr_auc" -> scoreTable, "ml_propensity_match" -> scoreTable,
      "ml_psi_drift" -> scoreTable,
      "ml_sprt" -> (tiny + "; input additionally capped at n_max=20000 " +
        "rows by TakeOrderedAndProject"),
      // corpus scoring: per-doc quality/score tables
      "corpus_curriculum" -> entity, "corpus_dsir_weights" -> entity,
      "corpus_negative_samples" -> entity, "corpus_quality_qnorm" -> entity,
      "corpus_temperature_mix" -> entity,
      // analytics over entity populations
      "q_pareto" -> entity, "q_rfm" -> (entity + " (measured-revert note " +
        "on the op: the per-customer quantile rank IS the deliverable)"),
      "q_segment_migration" -> entity, "q_survival" -> entity,
      // text statistics over vocabularies
      "text_burstiness" -> vocab, "text_coverage_curve" -> vocab,
      "text_zipf_fit" -> vocab,
      // constant-size artifacts
      "graph_eff_diameter" -> (tiny + " (per-hop census, ≤ 5 rows)"),
      "dedup_threshold_curve" -> tiny, "etl_scd4" -> tiny,
      "sim_vector_arith" -> tiny,
      "win_ntile" -> (valueHist + " (the r11 histogram rewrite — the " +
        "window ranks the cents histogram, not the orders)"))
  }

  private def globalWindows(df: org.apache.spark.sql.DataFrame): Int =
    withStaticPlan(df) { plan =>
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }.size
    }

  test("every query planning a global (no-partition) window carries a boundedness argument") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = globalWindows(fn(spark, sf))
      if (n > 0) {
        seen += name
        if (!allowGlobalWindow.contains(name)) offenders += s"$name($n)"
      }
    }
    assert(offenders.isEmpty,
      s"global windows without a boundedness entry: ${offenders.mkString(", ")}")
    // stale entries are flagged too — the register must match the code
    val stale = allowGlobalWindow.keySet -- seen
    assert(stale.isEmpty, s"allowGlobalWindow entries with no global window: $stale")
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
