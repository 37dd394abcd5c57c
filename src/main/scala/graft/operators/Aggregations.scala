package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation family (SURVEY.md §2.4 — all EXT).
  *
  * Everything here is a plain declarative `groupBy/agg`, so Catalyst
  * plans partial (map-side) aggregation before the shuffle and a final
  * merge after — the shape that scales: shuffled bytes are proportional
  * to |groups|, not |rows|. Double-valued aggregates are rounded at the
  * output edge only (oracle float parity, SURVEY.md §7.4), never inside
  * the computation.
  */
object Aggregations {

  /** TPC-H Q1-flavored pricing summary over lineitem. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** ROLLUP over (returnflag, linestatus); subtotal rows surfaced with
    * 'ALL' labels so the output is null-free and oracle-stable. */
  def rollupFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("flag"), col("status"))

  val rollupFlagStatusSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |       COALESCE(l_linestatus, 'ALL') AS status,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS cnt
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  /** CUBE over orders (status × priority). */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("total"))
      .orderBy(col("status"), col("priority"))

  val cubeOrdersSql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS cnt,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Exact distinct counts (expand + two-phase agg under the hood). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_rows"))

  val distinctCountsSql: String =
    """SELECT count(DISTINCT o_custkey) AS n_cust,
      |       count(DISTINCT o_orderstatus) AS n_status,
      |       count(DISTINCT o_orderpriority) AS n_prio,
      |       count(*) AS n_rows
      |FROM orders""".stripMargin

  /** Conditional / filtered aggregation. */
  def filteredAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(when(col("l_discount") > 0.05, col("l_extendedprice")).otherwise(lit(0.0))), 2).as("disc_rev"),
        count(when(col("l_quantity") > 25, lit(1))).as("big_qty_cnt"),
        round(max(when(col("l_tax") < 0.03, col("l_extendedprice"))), 2).as("lowtax_max"))
      .orderBy(col("l_returnflag"))

  val filteredAggSql: String =
    """SELECT l_returnflag,
      |       round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS disc_rev,
      |       count(CASE WHEN l_quantity > 25 THEN 1 END) AS big_qty_cnt,
      |       round(max(CASE WHEN l_tax < 0.03 THEN l_extendedprice END), 2) AS lowtax_max
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** collect_set → deterministic string (sorted, comma-joined): nation
    * roster per region. */
  def collectNations(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"),
        countDistinct(col("n_name")).as("n_nations"))
      .orderBy(col("r_name"))
  }

  val collectNationsSql: String =
    """SELECT r_name,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       count(DISTINCT n_name) AS n_nations
      |FROM (SELECT DISTINCT r_name, n_name
      |      FROM nation JOIN region ON n_regionkey = r_regionkey)
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** HLL++ approximate distinct. The sketch VALUE is engine-specific
    * (DuckDB uses a different HLL), so the oracle-checked output is the
    * ERROR-BOUND VERDICT: exact distinct (engine-agnostic) plus a
    * boolean `within_bound` = |approx − exact| ≤ 5·rsd·exact. DuckDB
    * computes the same exact count and a literal TRUE — the hash
    * matches iff Spark's sketch lands inside its published error bar
    * (rsd 0.01; HLL++ is deterministic for fixed input, so this is a
    * stable check, with 5× headroom since rsd is a standard deviation,
    * not a hard max). A ScalaTest bound double-covers it.
    *
    * Scale posture: the PRODUCTION path is the sketch column alone
    * (`approx_count_distinct` — mergeable partials, bounded memory);
    * the exact companion exists only to certify the sketch against
    * the oracle at test scale. A 100 TB deployment selects the sketch
    * and drops the certification columns. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("cnt"))
      .select(col("event_type"), col("exact_users"), col("cnt"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          lit(5 * 0.01) * col("exact_users")).as("within_bound"))
      .orderBy(col("event_type"))

  val approxDistinctSql: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS exact_users,
      |       count(*) AS cnt,
      |       TRUE AS within_bound
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Approximate quantiles via Spark's Greenwald-Khanna-style sketch
    * (percentile_approx) — mergeable partial sketches make this a
    * single-pass, bounded-memory aggregation at 100 TB where exact
    * percentiles need a full sort. As with [[approxDistinct]], the
    * sketch value is engine-specific (DuckDB's approx_quantile is
    * t-digest), so the oracle checks the ERROR-BOUND VERDICT: the
    * approx value must land between the exact quantiles at rank
    * q ± 10·(1/accuracy) (GK rank error is 1/accuracy = 0.001; 10×
    * headroom). quantile_disc on both sides is a data value —
    * bit-identical across engines.
    *
    * Scale posture: the PRODUCTION path is the accuracy-1000 sketch
    * pair alone (bounded ~O(accuracy) buffer, mergeable). The
    * accuracy-1e9 envelope-edge columns are effectively exact (they
    * buffer toward O(n) per group) and exist ONLY to certify the
    * sketch against the oracle at test scale — a 100 TB deployment
    * selects the sketch columns and drops the certification ones. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 1000)").as("p50_approx"),
        expr("percentile_approx(o_totalprice, 0.95, 1000)").as("p95_approx"),
        // exact discrete quantiles at the rank-error envelope edges
        expr("percentile_approx(o_totalprice, 0.49, 1000000000)").as("p50_lo"),
        expr("percentile_approx(o_totalprice, 0.51, 1000000000)").as("p50_hi"),
        expr("percentile_approx(o_totalprice, 0.94, 1000000000)").as("p95_lo"),
        expr("percentile_approx(o_totalprice, 0.96, 1000000000)").as("p95_hi"),
        count(lit(1)).as("cnt"))
      .select(col("o_orderstatus"), col("cnt"),
        (col("p50_approx") >= col("p50_lo") && col("p50_approx") <= col("p50_hi")).as("p50_in_envelope"),
        (col("p95_approx") >= col("p95_lo") && col("p95_approx") <= col("p95_hi")).as("p95_in_envelope"))
      .orderBy(col("o_orderstatus"))

  val approxQuantilesSql: String =
    """SELECT o_orderstatus, count(*) AS cnt,
      |       TRUE AS p50_in_envelope,
      |       TRUE AS p95_in_envelope
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-phase salted aggregation for skewed keys: phase 1 groups on
    * (key, salt) — spreading a hot key over 16 reducers — phase 2
    * merges the partials per key. Same result as a direct groupBy
    * (the oracle is the plain GROUP BY); at 100 TB this is the manual
    * skew-mitigation pattern when AQE's skew handling can't apply
    * (e.g. pre-Spark-3 sinks or deterministic partitioning needs).
    * lineitem's 3-value returnflag is a natural hot-key distribution. */
  def saltedSkewAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("p_qty"), count(lit(1)).as("p_cnt"))
    salted
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("p_qty")), 2).as("sum_qty"), sum(col("p_cnt")).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  val saltedSkewAggSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Equi-width histogram over order totals: 20 buckets spanning
    * [min, max], per-bucket count and observed price range. The
    * profile query behind every "distribution of X" dashboard panel
    * and every equi-width data-skipping layout decision.
    *
    * Bucketing is exact integer arithmetic in CENTS —
    * ((c−lo)·20) div (hi−lo+1) — so a price sitting exactly on a
    * bucket edge lands identically in both engines (a float
    * (x−lo)/(hi−lo)·20 would flip on the edge ulp). The max value
    * maps to ((hi−lo)·20)/(hi−lo+1) < 20, so the last bucket
    * closes without a clamp.
    *
    * Scale shape: the bounds are a 1-row scalar agg broadcast under
    * the bucket projection (same pattern as the unigram-LM corpus
    * total); the histogram itself is a 20-key hash agg with map-side
    * partials — two passes over the data, no shuffle wider than 20
    * rows. At 100 TB the bounds pass is the cost; a production
    * variant feeds min/max from file-level statistics instead. */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"),
        col("o_totalprice"))
    val bounds = o.agg(min("c").as("lo"), max("c").as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr("((c - lo) * 20) DIV (hi - lo + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        round(min("o_totalprice"), 2).as("lo_price"),
        round(max("o_totalprice"), 2).as("hi_price"))
      .orderBy(col("bucket"))
  }

  val histogramSql: String =
    """WITH o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c, o_totalprice
      |           FROM orders),
      |b AS (SELECT min(c) AS lo, max(c) AS hi FROM o)
      |SELECT ((c - lo) * 20) // (hi - lo + 1) AS bucket, count(*) AS n_orders,
      |       round(min(o_totalprice), 2) AS lo_price,
      |       round(max(o_totalprice), 2) AS hi_price
      |FROM o CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Winsorized robust statistics per order status: exact p5/p95
    * (linear-interpolation percentile — Spark `percentile` and
    * DuckDB `quantile_cont` both implement the type-7 quantile, so
    * the thresholds are the same IEEE doubles), rows clipped at each
    * tail, and the winsorized mean. The outlier-robust aggregation a
    * profiling stage runs before z-scores or model features.
    *
    * Parity: prices live as integer cents; the clamped value is
    * rounded back to cents BEFORE summing, so the mean's numerator
    * is an exact BIGINT (summation-order-proof) and only the final
    * divide is floating. The tail counts compare integer cents to
    * the shared interpolated threshold — identical inputs, identical
    * compare.
    *
    * Scale shape: exact percentiles cost one sort-based agg per
    * group partition (Spark's ObjectHashAggregate over a digest of
    * the group's values); at 100 TB swap `percentile` for
    * `percentile_approx` — same query shape, bounded state (the
    * approx path is `agg_approx_quantiles`). */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val th = o.groupBy(col("o_orderstatus"))
      .agg(expr("percentile(c, 0.05)").as("p05"),
        expr("percentile(c, 0.95)").as("p95"))
    o.join(th, "o_orderstatus")
      .withColumn("cl", round(greatest(least(col("c").cast("double"), col("p95")), col("p05"))).cast("long"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum((col("c").cast("double") < col("p05")).cast("long")).as("n_lo"),
        sum((col("c").cast("double") > col("p95")).cast("long")).as("n_hi"),
        round(first(col("p05"))).cast("long").as("p05_c"),
        round(first(col("p95"))).cast("long").as("p95_c"),
        round(sum(col("cl")) / count(lit(1)) / 100.0, 2).as("wins_mean"))
      .orderBy(col("o_orderstatus"))
  }

  val winsorizeSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |th AS (
      |  SELECT o_orderstatus,
      |         quantile_cont(c, 0.05) AS p05, quantile_cont(c, 0.95) AS p95
      |  FROM o GROUP BY 1)
      |SELECT o.o_orderstatus, count(*) AS n,
      |       CAST(sum(CASE WHEN c < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |       CAST(sum(CASE WHEN c > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |       CAST(round(any_value(p05)) AS BIGINT) AS p05_c,
      |       CAST(round(any_value(p95)) AS BIGINT) AS p95_c,
      |       round(CAST(sum(CAST(round(greatest(least(CAST(c AS DOUBLE), p95), p05)) AS BIGINT)) AS BIGINT)
      |             / count(*) / 100.0, 2) AS wins_mean
      |FROM o JOIN th USING (o_orderstatus)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Heavy hitters via Spark's single-pass frequent-items sketch
    * (Karp/Misra–Gries family, `df.stat.freqItems`), verified
    * against the exact answer — the same sketch-plus-verdict oracle
    * pattern as `agg_approx_distinct`. The sketch guarantee is a
    * SUPERSET: every item with frequency ≥ support must appear
    * (false positives possible, false negatives not), so the
    * oracle-checkable claim is `found = true` for every exact heavy
    * hitter. The threshold compare is pure integers
    * (cnt·10 ≥ total·3 ⟺ freq ≥ 0.3) — no float boundary.
    *
    * Scale shape: the sketch is one map-side pass with O(1/support)
    * state per partition and a tiny merge — the 100 TB way to find
    * frequent keys (skew candidates for [[Joins.saltedSkewJoin]],
    * hot vocab for dictionaries) without a full groupBy; the exact
    * groupBy here exists to score the sketch, not to replace it. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag"))
    // 1/support = at most 3 candidate items — a bounded driver
    // artifact, same contract as a broadcast
    val sketch = li.stat.freqItems(Seq("l_returnflag"), 0.3)
      .head().getSeq[String](0).toSet
    val total = li.agg(count(lit(1)).as("total"))
    li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * 10 >= col("total") * 3)
      .select(col("l_returnflag").as("item"), col("cnt"),
        col("item").isin(sketch.toSeq: _*).as("found"))
      .orderBy(col("item"))
  }

  val heavyHittersSql: String =
    """WITH t AS (SELECT count(*) AS total FROM lineitem)
      |SELECT l_returnflag AS item, count(*) AS cnt, TRUE AS found
      |FROM lineitem CROSS JOIN t
      |GROUP BY l_returnflag, total
      |HAVING count(*) * 10 >= total * 3
      |ORDER BY item""".stripMargin

  /** Re-mergeable distinct counting: per-batch HLL sketches unioned
    * into a corpus estimate (Spark's Datasketches-backed
    * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) —
    * the sketch analog of [[WarehouseEtl.incrementalAgg]]: at 100 TB
    * the per-batch sketches persist as BYTES (KB each) and every
    * later "distinct users over any batch range" is a sketch union,
    * never a rescan. Exact `count(DISTINCT)` here exists to SCORE
    * the estimate; the verdict (|est − exact| ≤ 5% — generous vs
    * the lgK=12 rsd of ~1.6%) is the oracle-checkable claim, the
    * same error-envelope pattern as `agg_approx_distinct`. Integer
    * bound compare: est·100 vs exact·95/105 in BIGINTs. */
  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), (dayofmonth(col("ts")) % 4).as("batch"))
    val perBatch = e.groupBy(col("batch"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("batch_exact"))
    val merged = perBatch.agg(
      count(lit(1)).as("n_batches"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      sum(col("batch_exact")).as("sum_batch_exact"))
    val exact = e.agg(countDistinct(col("user_id")).as("exact_users"))
    merged.crossJoin(exact)
      .select(col("n_batches"), col("exact_users"),
        (col("est") * 100 <= col("exact_users") * 105 &&
          col("est") * 100 >= col("exact_users") * 95).as("within_bound"),
        // users appear in many batches, so the naive sum of per-batch
        // exacts OVERCOUNTS — the emitted gap is why mergeable
        // sketches (not additive counters) are the incremental path
        (col("sum_batch_exact") > col("exact_users")).as("naive_sum_overcounts"))
  }

  val hllMergeSql: String =
    """WITH e AS (SELECT user_id, day(ts) % 4 AS batch FROM events)
      |SELECT (SELECT count(DISTINCT batch) FROM e) AS n_batches,
      |       count(DISTINCT user_id) AS exact_users,
      |       TRUE AS within_bound,
      |       (SELECT sum(cnt) FROM (SELECT count(DISTINCT user_id) AS cnt FROM e GROUP BY batch))
      |         > count(DISTINCT user_id) AS naive_sum_overcounts
      |FROM e""".stripMargin

  /** Per-group MODE (most frequent value) with an explicit tie-break —
    * engines disagree on `mode()`'s tie winner, so the operator states
    * its own rule (highest count, then lexically-smallest value) and
    * the oracle replays it. Plan: count per (group, value), then an
    * ORDERED-STRUCT MIN instead of a rank window — the second
    * aggregation gets map-side partial combine (one candidate per
    * group per partition) and never re-sorts the counts (same idiom as
    * TextAnalysis.tfidfTopTerm). */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("o_orderstatus"))
      .agg(min(struct((-col("cnt")).as("neg"), col("o_orderpriority").as("v"))).as("best"),
        sum(col("cnt")).as("n_rows"))
      .select(col("o_orderstatus"),
        col("best.v").as("mode_priority"),
        (-col("best.neg")).as("mode_count"),
        col("n_rows"))
      .orderBy(col("o_orderstatus"))

  val modePerGroupSql: String =
    """WITH counts AS (
      |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count,
      |       CAST((SELECT sum(c2.cnt) FROM counts c2
      |             WHERE c2.o_orderstatus = counts.o_orderstatus) AS BIGINT) AS n_rows
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |        ORDER BY cnt DESC, o_orderpriority) AS rn FROM counts) counts
      |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  /** Per-group OLS regression + correlation — "is this metric
    * trending" answered in one aggregation pass. `corr`/`regr_*`
    * built-ins accumulate floats in partition order (nondeterministic
    * across engines AND runs), so the operator aggregates the five
    * EXACT INTEGER moment sums (x centered to hours-since-2024,
    * y in cents — magnitudes chosen so Σx² fits a long at bench
    * scale) and evaluates the closed-form slope/intercept/r from
    * those exact sums in double — same values in any engine, any
    * partitioning, any row order. One partial+final hash agg; the
    * moments are algebraic, so map-side combine does most of the
    * work — the 100 TB shape for every sufficient-statistic model. */
  def linReg(spark: SparkSession, dir: String): DataFrame = {
    val hours2024 = 473352L // epoch hours at 2024-01-01
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_ns DIV 3600000000000").minus(hours2024).as("x"),
        round(col("value") * 100).cast("long").as("y"))
    val m = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val cov = m("n").cast("double") * d("sxy") - d("sx") * d("sy")
    val varX = m("n").cast("double") * d("sxx") - d("sx") * d("sx")
    val varY = m("n").cast("double") * d("syy") - d("sy") * d("sy")
    m.select(col("event_type"), col("n"),
      round(cov / varX, 6).as("slope_cents_per_hour"),
      round((d("sy") - (cov / varX) * d("sx")) / d("n"), 4).as("intercept_cents"),
      round(cov / sqrt(varX * varY), 6).as("r"))
      .orderBy(col("event_type"))
  }

  val linRegSql: String =
    """WITH base AS (
      |  SELECT event_type,
      |         epoch_ns(ts) // 3600000000000 - 473352 AS x,
      |         CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM base GROUP BY 1)
      |SELECT event_type, n,
      |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope_cents_per_hour,
      |       round((CAST(sy AS DOUBLE) -
      |              ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |               (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * CAST(sx AS DOUBLE)) /
      |             CAST(n AS DOUBLE), 4) AS intercept_cents,
      |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |             sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
      |                  (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r
      |FROM m ORDER BY event_type""".stripMargin

  /** Key-skew diagnostic — the report an operator runs BEFORE
    * choosing salting/AQE-skew-join handling: per-key mass, the
    * hottest key, and the skew factor (max/mean). Two aggregations on
    * the key; the second input is key-cardinality-sized. The ordered-
    * struct min picks the hottest key without a sort. */
  def skewDiag(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("total_rows"),
        max(col("c")).as("max_rows"),
        min(struct((-col("c")).as("neg"), col("user_id").as("k"))).as("best"))
      .select(col("n_keys"), col("total_rows"), col("max_rows"),
        col("best.k").as("hottest_key"),
        round(col("max_rows").cast("double") * col("n_keys") / col("total_rows"), 4)
          .as("skew_factor"))

  val skewDiagSql: String =
    """SELECT count(*) AS n_keys,
      |       CAST(sum(c) AS BIGINT) AS total_rows,
      |       CAST(max(c) AS BIGINT) AS max_rows,
      |       (SELECT user_id FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
      |        ORDER BY c DESC, user_id LIMIT 1) AS hottest_key,
      |       round(CAST(max(c) AS DOUBLE) * count(*) / CAST(sum(c) AS DOUBLE), 4) AS skew_factor
      |FROM (SELECT user_id, count(*) AS c FROM events GROUP BY 1)""".stripMargin

  /** Two-cohort A/B TEST readout — the experiment-analysis primitive:
    * cohorts split deterministically (even/odd user_id stands in for
    * the assignment hash), conversion = reaching a purchase event.
    * ONE conditional aggregation over the stream computes both
    * cohorts' exact integer counts and cents moments (the
    * [[graft.operators.Similarity.driftMonitor]] one-pass pattern),
    * then the two standard tests evaluate on the driver-free 1-row
    * output: pooled two-proportion z for conversion, Welch z for
    * revenue-per-event. All inputs to the float formulas are exact
    * integers, so both engines compute identical doubles. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select((pmod(col("user_id"), lit(2)) === 0).as("a"),
        (col("event_type") === "purchase").cast("long").as("conv"),
        round(col("value") * 100).cast("long").as("cents"))
    def s(cond: Column, e: Column) = sum(when(cond, e).otherwise(lit(0L)))
    val m = ev.agg(
      sum(col("a").cast("long")).as("na"),
      sum((!col("a")).cast("long")).as("nb"),
      s(col("a"), col("conv")).as("ca"),
      s(!col("a"), col("conv")).as("cb"),
      s(col("a"), col("cents")).as("sa"),
      s(!col("a"), col("cents")).as("sb"),
      s(col("a"), col("cents") * col("cents")).as("qa"),
      s(!col("a"), col("cents") * col("cents")).as("qb"))
    def d(c: String) = col(c).cast("double")
    val pa = d("ca") / d("na")
    val pb = d("cb") / d("nb")
    val pPool = (d("ca") + d("cb")) / (d("na") + d("nb"))
    val zProp = abs(pa - pb) /
      sqrt(pPool * (lit(1.0d) - pPool) * (lit(1.0d) / d("na") + lit(1.0d) / d("nb")))
    val ma = d("sa") / d("na")
    val mb = d("sb") / d("nb")
    val va = d("qa") / d("na") - ma * ma
    val vb = d("qb") / d("nb") - mb * mb
    val zMean = abs(ma - mb) / sqrt(va / d("na") + vb / d("nb"))
    m.select(col("na"), col("nb"), col("ca").as("conv_a"), col("cb").as("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round(zProp, 4).as("z_conversion"),
      round(ma / 100d, 4).as("mean_value_a"),
      round(mb / 100d, 4).as("mean_value_b"),
      round(zMean, 4).as("z_value"),
      (zProp > 1.96d).as("conversion_significant"))
  }

  val abTestSql: String =
    """WITH ev AS (
      |  SELECT user_id % 2 = 0 AS a,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |m AS (
      |  SELECT CAST(count(*) FILTER (WHERE a) AS BIGINT) AS na,
      |         CAST(count(*) FILTER (WHERE NOT a) AS BIGINT) AS nb,
      |         CAST(coalesce(sum(conv) FILTER (WHERE a), 0) AS BIGINT) AS ca,
      |         CAST(coalesce(sum(conv) FILTER (WHERE NOT a), 0) AS BIGINT) AS cb,
      |         CAST(coalesce(sum(cents) FILTER (WHERE a), 0) AS BIGINT) AS sa,
      |         CAST(coalesce(sum(cents) FILTER (WHERE NOT a), 0) AS BIGINT) AS sb,
      |         CAST(coalesce(sum(cents * cents) FILTER (WHERE a), 0) AS BIGINT) AS qa,
      |         CAST(coalesce(sum(cents * cents) FILTER (WHERE NOT a), 0) AS BIGINT) AS qb
      |  FROM ev)
      |SELECT na, nb, ca AS conv_a, cb AS conv_b,
      |       round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
      |       round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
      |       round(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) /
      |             sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) *
      |                  (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) *
      |                  (1.0 / na + 1.0 / nb)), 4) AS z_conversion,
      |       round(CAST(sa AS DOUBLE) / na / 100, 4) AS mean_value_a,
      |       round(CAST(sb AS DOUBLE) / nb / 100, 4) AS mean_value_b,
      |       round(abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
      |             sqrt((CAST(qa AS DOUBLE) / na -
      |                   (CAST(sa AS DOUBLE) / na) * (CAST(sa AS DOUBLE) / na)) / na +
      |                  (CAST(qb AS DOUBLE) / nb -
      |                   (CAST(sb AS DOUBLE) / nb) * (CAST(sb AS DOUBLE) / nb)) / nb), 4) AS z_value,
      |       abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) /
      |         sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) *
      |              (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) *
      |              (1.0 / na + 1.0 / nb)) > 1.96 AS conversion_significant
      |FROM m""".stripMargin

  /** EQUI-DEPTH histogram (the planner-statistics sibling of the
    * equi-width [[histogram]]): ntile(10) over the cents-quantized
    * total order (ties broken by the key, so the tiling is
    * deterministic in both engines), then per-bucket population and
    * exact bounds. At 100 TB the production form samples or uses a
    * quantile sketch; the exact tiling here is the ground truth such
    * a sketch is audited against. Executed on the [[HistQuantile]]
    * value-histogram path (bucket population and exact bounds are
    * functions of the cents histogram's cumulative counts), so no
    * data-sized single-partition sort ever runs — the r10 verdict's
    * 4.6×-at-10× shape, fixed; the DuckDB oracle still runs the
    * literal ntile window and must hash-match. */
  def histogramEqDepth(spark: SparkSession, dir: String): DataFrame =
    HistQuantile.ntileBuckets(
        Tables.orders(spark, dir)
          .select(round(col("o_totalprice") * 100).cast("long").as("cents")),
        col("cents"), 10)
      .select(col("bucket"), col("cnt").as("n"),
        (col("lo").cast("double") / 100d).as("lo"),
        (col("hi").cast("double") / 100d).as("hi"))
      .orderBy(col("bucket"))

  val histogramEqDepthSql: String =
    """SELECT bucket, count(*) AS n,
      |       CAST(min(cents) AS DOUBLE) / 100 AS lo,
      |       CAST(max(cents) AS DOUBLE) / 100 AS hi
      |FROM (SELECT CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bucket,
      |             cents
      |      FROM (SELECT o_orderkey,
      |                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |            FROM orders))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** CHI-SQUARE independence test — "is event mix independent of time
    * of day?", the categorical sibling of [[abTest]]'s two-proportion
    * z. Contingency: event_type × 4-hour day-bucket. Observed counts
    * are exact BIGINTs; each cell's (O−E)²/E lands as ONE rounded
    * micro-unit integer and the statistic is their exact integer sum
    * (summation order cannot move it — the same quantize-then-sum
    * discipline as the drift monitor). E = rowTot·colTot/N is a
    * double of exact integers — bit-identical on both engines. Scale:
    * one compact-key aggregation (|types|×6 cells) over any corpus
    * size; the two marginal tables are window sums over the cell
    * table, not re-scans. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("CAST(hour(ts) AS BIGINT) div 4").as("bucket"))
      .agg(count(lit(1)).as("o"))
    val withMargins = cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("bucket"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    withMargins
      .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
      .withColumn("cont_micro",
        round(lit(1e6) * (col("o") - col("e")) * (col("o") - col("e")) / col("e")).cast("long"))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct(col("event_type")) - 1) *
          (countDistinct(col("bucket")) - 1)).as("dof"),
        sum(col("cont_micro")).as("chi2_micro"))
  }

  val chiSquareSql: String =
    """WITH cells AS (
      |  SELECT event_type, CAST(hour(ts) AS BIGINT) // 4 AS bucket, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, bucket, o,
      |         sum(o) OVER (PARTITION BY event_type) AS rt,
      |         sum(o) OVER (PARTITION BY bucket) AS ct,
      |         sum(o) OVER () AS n
      |  FROM cells),
      |c AS (
      |  SELECT event_type, bucket, o,
      |         CAST(round(1e6 * (o - CAST(rt AS DOUBLE) * ct / n)
      |                        * (o - CAST(rt AS DOUBLE) * ct / n)
      |                        / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT) AS cont_micro
      |  FROM m)
      |SELECT count(*) AS n_cells,
      |       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT bucket) - 1) AS BIGINT) AS dof,
      |       CAST(sum(cont_micro) AS BIGINT) AS chi2_micro
      |FROM c""".stripMargin

  /** SHANNON ENTROPY per group — the diversity audit a corpus
    * curation pass runs per source ("is this feed one language or a
    * mix?"). Entropy of the language distribution in NATS, each
    * −p·ln(p) term quantized to a micro-unit integer before the sum
    * (order-independent; ln on identical doubles — the established
    * cross-engine contract of the logprob family). Counts come from
    * one compact-key aggregation; the per-group total is a window
    * sum, so the corpus is scanned once. */
  def entropyPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
    counts
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("term_micro", round(lit(-1e6) * col("p") * log(col("p"))).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("term_micro")).as("entropy_micro_nats"))
      .orderBy(col("source"))
  }

  val entropyPerGroupSql: String =
    """WITH counts AS (
      |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |withn AS (
      |  SELECT source, lang, c, sum(c) OVER (PARTITION BY source) AS n FROM counts)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs, count(*) AS n_langs,
      |       CAST(sum(CAST(round(-1e6 * (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))
      |                     AS BIGINT)) AS BIGINT) AS entropy_micro_nats
      |FROM withn GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pairwise Pearson CORRELATION MATRIX (long form) across the
    * lineitem measures — the one-pass EDA screen before any modeling:
    * quantity × price × discount, every pair from ONE aggregation.
    * The ten sufficient statistics (n, 3 sums, 3 squares, 3 cross
    * products) are exact: measures quantize to their natural
    * hundredths, per-row products stay far under 2⁶³, and the SUMS
    * ride DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so they cannot
    * overflow at any corpus size — the cents²-sum overflow that a
    * BIGINT accumulator hits near ~10⁶ rows is the reason for the
    * wide type. Only AFTER aggregation does each moment cast to
    * double (exact integer → nearest double, identical both
    * engines) for the one correlation formula per pair. Map-side
    * combinable; output is |measures|² / 2 rows. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val m = Seq("quantity" -> col("l_quantity"), "price" -> col("l_extendedprice"),
      "discount" -> col("l_discount"))
    val q = m.map { case (n, c) => n -> round(c * 100).cast("long") }
    val sums =
      q.map { case (n, c) => sum(c.cast("decimal(38,0)")).as(s"s_$n") } ++
      q.map { case (n, c) => sum((c * c).cast("decimal(38,0)")).as(s"ss_$n") } ++
      q.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
        sum((ca * cb).cast("decimal(38,0)")).as(s"sp_${na}_$nb") }.toSeq
    val aggCols = count(lit(1)).as("n") +: sums
    val agged = Tables.lineitem(spark, dir)
      .agg(aggCols.head, aggCols.tail: _*)
    def d(name: String) = col(name).cast("double")
    val pairs = q.map(_._1).combinations(2).map { case Seq(a, b) =>
      agged.select(lit(a).as("m_a"), lit(b).as("m_b"), col("n"),
        round((col("n") * d(s"sp_${a}_$b") - d(s"s_$a") * d(s"s_$b")) /
          sqrt((col("n") * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")) *
            (col("n") * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b"))), 6).as("corr"))
    }.toSeq
    pairs.reduce(_ union _).orderBy(col("m_a"), col("m_b"))
  }

  val corrMatrixSql: String = {
    val ms = Seq("quantity" -> "l_quantity", "price" -> "l_extendedprice",
      "discount" -> "l_discount")
    val qs = ms.map { case (n, c) => n -> s"CAST(round($c * 100) AS BIGINT)" }
    val sums = (
      qs.map { case (n, c) => s"sum($c) AS s_$n" } ++
      qs.map { case (n, c) => s"sum(($c) * ($c)) AS ss_$n" } ++
      qs.combinations(2).map { case Seq((na, ca), (nb, cb)) =>
        s"sum(($ca) * ($cb)) AS sp_${na}_$nb" }).mkString(",\n       ")
    val pairs = qs.map(_._1).combinations(2).map { case Seq(a, b) =>
      s"""SELECT '$a' AS m_a, '$b' AS m_b, n,
         |       round((n * CAST(sp_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)) /
         |             sqrt((n * CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) *
         |                  (n * CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
         |         AS corr
         |FROM moments""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH moments AS (
       |  SELECT count(*) AS n,
       |       $sums
       |  FROM lineitem)
       |$pairs
       |ORDER BY m_a, m_b""".stripMargin
  }

  /** WEIGHTED MEDIAN — the robust center when rows carry mass
    * (quantity-weighted median price per return flag: "the price at
    * which half the UNITS move", not half the line items — the number
    * purchasing actually wants). Exact by construction: prices in
    * integer cents, weights integer quantities, the median is the
    * smallest cents value whose running weight reaches half the total
    * (2·cumw ≥ total avoids any division) — no percentile
    * interpolation and therefore no cross-engine tie hazard. Scale:
    * the median-from-HISTOGRAM shape — weights pre-aggregate per
    * (group, value) on a compact key (map-side combinable; the raw
    * row stream never reaches a window), and only the DISTINCT-VALUE
    * table sorts. The first cut windowed the raw rows partitioned by
    * the 3-key group column — parallelism collapsed to 3 tasks and
    * the 10× probe measured 6.7× (superlinear); the histogram rewrite
    * re-measured ~1.0×. Merging equal values before the cumsum cannot
    * change the answer: the threshold crossing happens at a VALUE
    * boundary either way. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val qty = round(col("l_quantity")).cast("long")
    // TWO-LEVEL PARALLEL PREFIX (r16, guide §2.5): the r15 shape ran
    // one cumulative window PARTITIONED BY l_returnflag — ≤ |flags|
    // window partitions, so the cumsum over the (flag, cents)
    // histogram was serial per flag (measured: a 3-task stage carrying
    // the whole query; at 100 TB that single window partition holds
    // every distinct price of a flag — a data-sized serial wall).
    // Standard prefix-sum decomposition instead: cents div 65536
    // buckets the histogram into ordered ranges; within-bucket cumsums
    // run on parallel (flag, bucket) windows, per-bucket totals form a
    // BOUNDED artifact (|flags| × ~1.6k buckets for the price domain)
    // whose tiny prefix window supplies each bucket's offset.
    // cumw = offset + within-bucket cumsum is the identical running
    // weight (bucket order is cents order), so the median row — and
    // the oracle hash — are unchanged.
    val hist = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents.as("cents"), qty.as("w"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(sum(col("w")).as("w"))
      .withColumn("b", expr("cents div 65536"))
    val byFlagPrev = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist.groupBy(col("l_returnflag"), col("b"))
      .agg(sum(col("w")).as("bw"))
      .withColumn("off", coalesce(sum(col("bw")).over(byFlagPrev), lit(0L)))
      .withColumn("total",
        sum(col("bw")).over(Window.partitionBy(col("l_returnflag"))))
      .select(col("l_returnflag"), col("b"), col("off"), col("total"))
    val inBucket = Window.partitionBy(col("l_returnflag"), col("b"))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = hist
      .withColumn("cin", sum(col("w")).over(inBucket))
      .join(broadcast(off), Seq("l_returnflag", "b"))
      .withColumn("cumw", col("off") + col("cin"))
    rows.filter(col("cumw") * 2 >= col("total"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("median_cents"),
        max(col("total")).as("total_weight"))
      .select(col("l_returnflag"),
        (col("median_cents").cast("double") / 100).as("weighted_median_price"),
        col("total_weight"))
      .orderBy(col("l_returnflag"))
  }

  val weightedMedianSql: String =
    """WITH hist AS (
      |  SELECT l_returnflag,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, cents, w,
      |         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
      |                      ROWS UNBOUNDED PRECEDING) AS cumw,
      |         sum(w) OVER (PARTITION BY l_returnflag) AS total
      |  FROM hist)
      |SELECT l_returnflag,
      |       CAST(min(cents) AS DOUBLE) / 100 AS weighted_median_price,
      |       CAST(max(total) AS BIGINT) AS total_weight
      |FROM cum WHERE cumw * 2 >= total
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** BITMAP-INDEX distinct counting — Spark's bitmap aggregate family
    * (bitmap_bit_position / bitmap_construct_agg / bitmap_or_agg /
    * bitmap_count), the warehouse trick that makes EXACT distinct
    * counts mergeable: each (group, bucket) builds a fixed-width
    * bitmap, bitmaps OR together associatively (partial states merge
    * like HLL sketches but without the error), and the final count is
    * a popcount. This is the exact-mergeable midpoint between
    * count(DISTINCT) (exact, but re-shuffles raw keys) and
    * [[hllMerge]] (mergeable, approximate) — the right tool when
    * distinct counts must compose across partitions/batches exactly.
    * The oracle computes plain COUNT(DISTINCT): the bitmap path must
    * agree exactly or the hash fails. */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_bm")
    spark.sql(
      """SELECT o_orderpriority,
        |       CAST(sum(bitmap_count(b)) AS BIGINT) AS n_distinct_cust
        |FROM (
        |  SELECT o_orderpriority,
        |         bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS b
        |  FROM orders_bm
        |  GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey))
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val bitmapDistinctSql: String =
    """SELECT o_orderpriority,
      |       count(DISTINCT o_custkey) AS n_distinct_cust
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-sample KOLMOGOROV–SMIRNOV test — the CONTINUOUS-distribution
    * drift check beside [[chiSquare]]'s categorical one: do click and
    * purchase order values follow the same distribution? KS = max
    * ECDF gap, and the whole computation stays in exact integers: per
    * distinct cents value the two cumulative counts c₁, c₂ are window
    * sums, the scaled gap |c₁·n₂ − c₂·n₁| is an exact BIGINT (cross-
    * multiplying clears both denominators), and only the final
    * max-gap → ppm conversion divides. A float-ECDF formulation would
    * make the argmax tie-unstable; the integer form cannot. One
    * compact-key (cents) aggregation + one ordered window over the
    * distinct-value table (the weighted-median histogram shape). */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").as("is1"))
    val perVal = ev.groupBy(col("cents"))
      .agg(count_if(col("is1")).as("d1"), count_if(!col("is1")).as("d2"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perVal
      .withColumn("c1", sum(col("d1")).over(cum))
      .withColumn("c2", sum(col("d2")).over(cum))
      .withColumn("n1", sum(col("d1")).over(Window.partitionBy()))
      .withColumn("n2", sum(col("d2")).over(Window.partitionBy()))
      // the cross-multiplied gap c₁·n₂ − c₂·n₁ is ~n² — BIGINT wraps
      // once the filtered stream passes ~3×10⁹ events, so the products
      // ride DECIMAL(38,0) / HUGEINT (the corrMatrix discipline)
      .withColumn("gap", abs(col("c1").cast("decimal(38,0)") * col("n2") -
        col("c2").cast("decimal(38,0)") * col("n1")))
      .agg(max(col("n1")).as("n_click"), max(col("n2")).as("n_purchase"),
        round(lit(1e6) * max(col("gap")).cast("double") /
          (max(col("n1")).cast("decimal(38,0)") * max(col("n2"))).cast("double"))
          .cast("long").as("ks_ppm"))
  }

  val ksTestSql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |         event_type = 'click' AS is1
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |perval AS (
      |  SELECT cents,
      |         CAST(count(*) FILTER (WHERE is1) AS BIGINT) AS d1,
      |         CAST(count(*) FILTER (WHERE NOT is1) AS BIGINT) AS d2
      |  FROM v GROUP BY 1),
      |cum AS (
      |  SELECT sum(d1) OVER w AS c1, sum(d2) OVER w AS c2,
      |         sum(d1) OVER () AS n1, sum(d2) OVER () AS n2
      |  FROM perval
      |  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING))
      |SELECT CAST(max(n1) AS BIGINT) AS n_click,
      |       CAST(max(n2) AS BIGINT) AS n_purchase,
      |       CAST(round(1e6 * max(abs(c1 * n2 - c2 * n1)) / (max(n1) * max(n2)))
      |            AS BIGINT) AS ks_ppm
      |FROM cum""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_ks_test" -> (ksTest _),
    "agg_bitmap_distinct" -> (bitmapDistinct _),
    "agg_weighted_median" -> (weightedMedian _),
    "agg_corr_matrix" -> (corrMatrix _),
    "agg_chi2" -> (chiSquare _),
    "agg_entropy" -> (entropyPerGroup _),
    "agg_ab_test" -> (abTest _),
    "agg_histogram_eqdepth" -> (histogramEqDepth _),
    "agg_skew_diag" -> (skewDiag _),
    "agg_linreg" -> (linReg _),
    "agg_mode" -> (modePerGroup _),
    "agg_hll_merge" -> (hllMerge _),
    "agg_heavy_hitters" -> (heavyHitters _),
    "agg_winsorize" -> (winsorize _),
    "agg_histogram" -> (histogram _),
    "agg_pricing_summary" -> (pricingSummary _),
    "agg_rollup" -> (rollupFlagStatus _),
    "agg_cube" -> (cubeOrders _),
    "agg_distinct_counts" -> (distinctCounts _),
    "agg_filtered" -> (filteredAgg _),
    "agg_collect_set" -> (collectNations _),
    "agg_approx_distinct" -> (approxDistinct _),
    "agg_approx_quantiles" -> (approxQuantiles _),
    "agg_salted_skew" -> (saltedSkewAgg _)
  )

  def oracle: Map[String, String] = Map(
    "agg_ks_test" -> ksTestSql,
    "agg_bitmap_distinct" -> bitmapDistinctSql,
    "agg_weighted_median" -> weightedMedianSql,
    "agg_corr_matrix" -> corrMatrixSql,
    "agg_chi2" -> chiSquareSql,
    "agg_entropy" -> entropyPerGroupSql,
    "agg_ab_test" -> abTestSql,
    "agg_histogram_eqdepth" -> histogramEqDepthSql,
    "agg_skew_diag" -> skewDiagSql,
    "agg_linreg" -> linRegSql,
    "agg_mode" -> modePerGroupSql,
    "agg_hll_merge" -> hllMergeSql,
    "agg_heavy_hitters" -> heavyHittersSql,
    "agg_winsorize" -> winsorizeSql,
    "agg_histogram" -> histogramSql,
    "agg_pricing_summary" -> pricingSummarySql,
    "agg_rollup" -> rollupFlagStatusSql,
    "agg_cube" -> cubeOrdersSql,
    "agg_distinct_counts" -> distinctCountsSql,
    "agg_filtered" -> filteredAggSql,
    "agg_collect_set" -> collectNationsSql,
    "agg_salted_skew" -> saltedSkewAggSql,
    // sketch VALUES are engine-specific; the oracle checks the
    // error-bound verdict (exact stats + within-bound booleans)
    "agg_approx_distinct" -> approxDistinctSql,
    "agg_approx_quantiles" -> approxQuantilesSql
  )
}
