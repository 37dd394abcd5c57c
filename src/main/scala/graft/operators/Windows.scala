package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family (SURVEY.md §2.5 — all EXT).
  *
  * Every window is `partitionBy(key)` so the single shuffle is on the
  * partition key and each partition sorts locally — no global sort. All
  * orderings carry an explicit unique tie-break key so ranking is
  * deterministic (oracle parity, SURVEY.md §7.4).
  */
object Windows {

  /** Top-3 orders by price per priority class (ranking window + filter;
    * Spark plans this as a per-partition top-k, not a full sort). */
  def topkPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val topkPerPrioritySql: String =
    """SELECT o_orderpriority, rn, o_orderkey, round(o_totalprice, 2) AS price
      |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
      |             CAST(row_number() OVER (PARTITION BY o_orderpriority
      |                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |      FROM orders)
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  /** lag(): per-user event-to-event value delta. */
  def lagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("delta", round(col("value") - lag(col("value"), 1).over(w), 2))
      .select(col("user_id"), col("event_id"), col("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val lagDeltaSql: String =
    """SELECT user_id, event_id,
      |       round(value - lag(value, 1) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id), 2) AS delta
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Running total frame (ROWS UNBOUNDED PRECEDING → CURRENT ROW):
    * cumulative spend per customer in order-date order. The frame order
    * fixes the float summation order, so the oracle sums identically. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("run_total", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val runningTotalSql: String =
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** ntile quartiles over order value, summarized per bucket.
    * Executed on the [[HistQuantile]] value-histogram path: the naive
    * `ntile(4).over(Window.orderBy(price))` forces every row through
    * ONE task (`Exchange SinglePartition` — 4.9× at 10× data in
    * BENCH_r10_sf1); the per-bucket census (count/min/max) is a pure
    * function of the price histogram's cumulative counts, so only the
    * DISTINCT-PRICE table ever sorts. Byte-identical to the windowed
    * form (the census is invariant to intra-price tie order), and the
    * DuckDB oracle still runs the literal ntile window. */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame =
    HistQuantile.ntileBuckets(
        Tables.orders(spark, dir).select(col("o_totalprice")),
        col("o_totalprice"), 4)
      .select(col("bucket").as("quartile"), col("cnt"),
        round(col("lo"), 2).as("min_price"),
        round(col("hi"), 2).as("max_price"))
      .orderBy(col("quartile"))

  val ntileQuartilesSql: String =
    """SELECT quartile, count(*) AS cnt,
      |       round(min(o_totalprice), 2) AS min_price,
      |       round(max(o_totalprice), 2) AS max_price
      |FROM (SELECT CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
      |             o_totalprice
      |      FROM orders)
      |GROUP BY quartile ORDER BY quartile""".stripMargin

  /** first/last over a bounded frame: each nation's cheapest and
    * priciest supplier account balance context. */
  def firstLastBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.supplier(spark, dir)
      .select(
        col("s_nationkey").cast("long").as("nationkey"),
        col("s_suppkey"),
        round(first(col("s_acctbal")).over(w), 2).as("min_bal_in_nation"),
        round(last(col("s_acctbal")).over(w), 2).as("max_bal_in_nation"))
      .orderBy(col("nationkey"), col("s_suppkey"))
  }

  val firstLastBalanceSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey, s_suppkey,
      |       round(first_value(s_acctbal) OVER w, 2) AS min_bal_in_nation,
      |       round(last_value(s_acctbal) OVER w, 2) AS max_bal_in_nation
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY nationkey, s_suppkey""".stripMargin

  /** Distribution windows: percent_rank, cume_dist, nth_value — exact
    * integer-ratio results, so float parity with the oracle is free. */
  def distributionWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, dir)
      .select(
        col("c_mktsegment"), col("c_custkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        round(nth_value(col("c_acctbal"), 2).over(wFrame), 2).as("second_lowest_bal"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  val distributionWindowsSql: String =
    """SELECT c_mktsegment, c_custkey,
      |       round(percent_rank() OVER w, 6) AS pct_rank,
      |       round(cume_dist() OVER w, 6) AS cume,
      |       round(nth_value(c_acctbal, 2) OVER (PARTITION BY c_mktsegment
      |             ORDER BY c_acctbal, c_custkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_lowest_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** RANGE frame over event time: trailing one-hour window per user
    * (value-based frame bounds — peers with equal timestamps share the
    * frame, unlike ROWS). The trailing count and min/max are
    * order-free inside the frame; the sum rounds at the output edge.
    * Time is integer epoch seconds (`ts_ns DIV 1e9`) so the frame
    * algebra is exact in both engines. */
  def rangeFrameTrailing(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000000000").as("sec"), col("value"))
      .select(
        col("user_id"), col("event_id"), col("sec"),
        count(lit(1)).over(w).as("trail_cnt"),
        round(min(col("value")).over(w), 2).as("trail_min"),
        round(max(col("value")).over(w), 2).as("trail_max"),
        round(sum(col("value")).over(w), 2).as("trail_sum"))
      .orderBy(col("user_id"), col("sec"), col("event_id"))
  }

  val rangeFrameTrailingSql: String =
    """SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec,
      |       count(*) OVER w AS trail_cnt,
      |       round(min(value) OVER w, 2) AS trail_min,
      |       round(max(value) OVER w, 2) AS trail_max,
      |       round(sum(value) OVER w, 2) AS trail_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, sec, event_id""".stripMargin

  /** Gap-based sessionization — the batch twin of the streaming
    * session window: a new session starts when a user's inter-event
    * gap exceeds 30 minutes (lag + conditional flag + running sum —
    * the classic island-numbering plan). ONE shuffle on user_id; both
    * windows share the same partitioning and sort, so Catalyst plans
    * a single Window exchange. Session stats aggregate on the compact
    * (user, session) key. All gap math is exact integer nanos. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 1800L * 1000000000L
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .withColumn("new_sess",
        when(col("ts_ns") - lag(col("ts_ns"), 1).over(byUser) > gapNs, 1L)
          .otherwise(when(lag(col("ts_ns"), 1).over(byUser).isNull, 1L).otherwise(0L)))
      .withColumn("session_idx", sum(col("new_sess")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ns")).as("start_ns"),
        max(col("ts_ns")).as("end_ns"),
        // integer-cents sum: a raw double sum's accumulation order
        // differs between Spark partitions and DuckDB, and a last-ulp
        // difference can flip the rounding — cents are order-exact
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100d)
          .as("session_value"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        ((col("end_ns") - col("start_ns")) / lit(1000000000L)).cast("long").as("duration_sec"),
        col("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value,
      |         CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000 THEN 1
      |              WHEN lag(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |numbered AS (
      |  SELECT user_id, event_id, ts_ns, value,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |       CAST((max(ts_ns) - min(ts_ns)) // 1000000000 AS BIGINT) AS duration_sec,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS session_value
      |FROM numbered GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** LONGEST ACTIVITY STREAK — gaps-and-islands on DATES (the daily
    * sibling of [[sessionize]]'s timestamp islands): per user, the
    * longest run of consecutive active days. Distinct active dates →
    * day-number minus a per-user dense rank is CONSTANT within a
    * consecutive run (the classic island key — pure integer
    * arithmetic, tie-free since dates are distinct) → island sizes →
    * per-user max. One shuffle on user_id; every window shares it. */
  def longestStreak(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("ts_ns div 86400000000000").cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("run_len"), min(col("day")).as("run_start"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("run_len")).as("longest_streak"),
        max(struct(col("run_len"), col("run_start"))).getField("run_start")
          .as("best_start_day"))
      .orderBy(col("user_id"))
  }

  val longestStreakSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |         CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
      |  FROM events),
      |runs AS (
      |  SELECT user_id, day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island,
      |         day
      |  FROM days),
      |islands AS (
      |  SELECT user_id, island, count(*) AS run_len, min(day) AS run_start
      |  FROM runs GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_streaks,
      |       CAST(max(run_len) AS BIGINT) AS longest_streak,
      |       (max(struct_pack(a := run_len, b := run_start))).b AS best_start_day
      |FROM islands GROUP BY 1 ORDER BY 1""".stripMargin

  /** RUNNING DISTINCT COUNT over a window — an operator SQL window
    * functions famously lack (COUNT(DISTINCT) OVER is unsupported in
    * Spark AND DuckDB AND ANSI): per user, how many distinct event
    * types have been seen as of each event. The classic rewrite makes
    * it windowable: flag each row that is the FIRST occurrence of its
    * (user, type) — row_number() = 1 over (user, type) ordered by
    * (ts, event_id) — then the running distinct count is a plain
    * running SUM of flags. Output is the discovery CHANGE-LOG (only
    * flag rows — the running count equals the discovery ordinal
    * there), which also bounds output at |users|×|types| instead of
    * |events|. Scale: two windows on NESTED keys — the flag window
    * partitions by (user, type), the running sum by (user) — so the
    * plan carries two hash exchanges (verified by .explain; a shared
    * exchange is impossible here because the finer key cannot serve
    * the coarser window), both linear, both on the same row stream
    * with no join or re-scan. */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"), col("ts"))
      .withColumn("first_flag",
        (row_number().over(byUserType) === 1).cast("long"))
      .withColumn("distinct_so_far", sum(col("first_flag")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("first_flag") === 1)
      .select(col("user_id"), col("distinct_so_far"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("first_seen"))
      .orderBy(col("user_id"), col("distinct_so_far"))
  }

  val runningDistinctSql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                                      ORDER BY epoch_ns(ts), event_id) = 1
      |              THEN 1 ELSE 0 END AS first_flag
      |  FROM events),
      |running AS (
      |  SELECT user_id, event_type, ts, first_flag,
      |         sum(first_flag) OVER (PARTITION BY user_id
      |                               ORDER BY epoch_ns(ts), event_id
      |                               ROWS UNBOUNDED PRECEDING) AS distinct_so_far
      |  FROM flagged)
      |SELECT user_id, CAST(distinct_so_far AS BIGINT) AS distinct_so_far, event_type,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_seen
      |FROM running WHERE first_flag = 1
      |ORDER BY user_id, distinct_so_far""".stripMargin

  /** EXACT MOVING MEDIAN — the window op folklore says needs an
    * approx sketch: for a BOUNDED row frame it doesn't. The trailing
    * 24-bin frame materializes in-row (collect over the frame — 24
    * longs, constant per-row state), sorts in-row, and the median is
    * the sum of the two CENTRAL ORDER STATISTICS — kept as their
    * integer SUM (`med2x`) so the output is exact, with the halved
    * double alongside (n.5 halves are exactly representable — no
    * rounding step exists anywhere). Full frames only. Scale: per-row
    * cost is fixed at frame-size log frame-size; the series is
    * calendar-bounded; for frames too wide to materialize per row the
    * approx rewrite is `percentile_approx` — this op is the exact
    * tool for the bounded-frame regime a monitoring window lives in. */
  private val medianFrame = 24

  def movingMedian(spark: SparkSession, dir: String): DataFrame = {
    val binned = graft.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bin"))
      .agg(count(lit(1)).as("n"))
    val f = Window.orderBy(col("bin")).rowsBetween(-(medianFrame - 1), 0)
    binned
      .withColumn("arr", sort_array(collect_list(col("n")).over(f)))
      .filter(size(col("arr")) === medianFrame)
      .select(date_format(col("bin"), "yyyy-MM-dd HH:mm:ss").as("bin_ts"),
        col("n"),
        (element_at(col("arr"), medianFrame / 2) +
          element_at(col("arr"), medianFrame / 2 + 1)).as("med2x"),
        ((element_at(col("arr"), medianFrame / 2) +
          element_at(col("arr"), medianFrame / 2 + 1)).cast("double") / 2)
          .as("moving_median"))
      .orderBy(col("bin_ts"))
  }

  val movingMedianSql: String =
    s"""WITH binned AS (
       |  SELECT date_trunc('hour', ts) AS bin, count(*) AS n
       |  FROM events GROUP BY 1),
       |framed AS (
       |  SELECT bin, n,
       |         list_sort(list(n) OVER (ORDER BY bin
       |           ROWS BETWEEN ${medianFrame - 1} PRECEDING AND CURRENT ROW)) AS arr
       |  FROM binned)
       |SELECT strftime(bin, '%Y-%m-%d %H:%M:%S') AS bin_ts, n,
       |       CAST(arr[${medianFrame / 2}] + arr[${medianFrame / 2 + 1}] AS BIGINT) AS med2x,
       |       CAST(arr[${medianFrame / 2}] + arr[${medianFrame / 2 + 1}] AS DOUBLE) / 2
       |         AS moving_median
       |FROM framed WHERE len(arr) = $medianFrame
       |ORDER BY 1""".stripMargin

  /** RATIO-TO-REPORT — each nation's share of its region's revenue in
    * ppm, the canonical "percent of parent" report (Oracle's
    * RATIO_TO_REPORT, Snowflake's RATIO_TO_REPORT OVER). Revenue
    * stays integer cents through the per-nation aggregation
    * (broadcast dim joins: customer→nation→region are classic
    * broadcast-hash joins, no fact shuffle beyond the one compact-key
    * agg); the share is ONE double division per output row over the
    * |nations|-row table. The region window runs over that bounded
    * table, never over facts. */
  def ratioToReport(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    rev
      .withColumn("total", sum(col("cents")).over(Window.partitionBy(col("r_name"))))
      .select(col("r_name"), col("n_name"), col("cents"),
        round(lit(1e6) * col("cents").cast("double") / col("total").cast("double"))
          .cast("long").as("share_ppm"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val ratioToReportSql: String =
    """WITH rev AS (
      |  SELECT r_name, n_name,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT r_name, n_name, cents,
      |         CAST(sum(cents) OVER (PARTITION BY r_name) AS BIGINT) AS total
      |  FROM rev)
      |SELECT r_name, n_name, cents,
      |       CAST(round(1e6 * CAST(cents AS DOUBLE) / CAST(total AS DOUBLE)) AS BIGINT)
      |         AS share_ppm
      |FROM w ORDER BY 1, 2""".stripMargin

  /** PARETO FRONTIER (2-D skyline) per brand — the parts not
    * dominated on (price ↓, size ↑) by any brand-mate: the cheapest
    * part at every size level you can't beat. The quadratic
    * NOT-EXISTS formulation collapses to ONE window pass: order by
    * (price asc, size desc, key) and a row is on the frontier iff its
    * size strictly exceeds the running max over all PRIOR rows —
    * every prior row has price ≤ mine (and at equal price, size ≥
    * mine by the sort), so "prior with size ≥ mine" IS domination;
    * duplicates of an exact (price, size) point keep only the
    * first-keyed row, the stated contract. All integer (cents, size),
    * per-brand parallel, zero joins. */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("p_retailprice") * 100).cast("long")
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("cents"), col("p_size").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.part(spark, dir)
      .select(col("p_brand"), col("p_partkey"), cents.as("cents"),
        col("p_size").cast("long").as("p_size"))
      .withColumn("prev_max", max(col("p_size")).over(w))
      .filter(col("prev_max").isNull || col("p_size") > col("prev_max"))
      .select(col("p_brand"), col("p_partkey"), col("cents"), col("p_size"))
      .orderBy(col("p_brand"), col("cents"), col("p_partkey"))
  }

  val paretoFrontierSql: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey,
      |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
      |         CAST(p_size AS BIGINT) AS p_size
      |  FROM part),
      |w AS (
      |  SELECT p_brand, p_partkey, cents, p_size,
      |         max(p_size) OVER (PARTITION BY p_brand
      |                           ORDER BY cents, p_size DESC, p_partkey
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS prev_max
      |  FROM p)
      |SELECT p_brand, p_partkey, cents, p_size
      |FROM w WHERE prev_max IS NULL OR p_size > prev_max
      |ORDER BY p_brand, cents, p_partkey""".stripMargin

  /** LEAVE-ONE-OUT PEER Z-SCORE — each line item's quantity against
    * the mean/stddev of the OTHER rows in its (returnflag, status)
    * peer group, the outlier test that doesn't let the candidate
    * contaminate its own baseline (at n→∞ plain z converges to it;
    * in small groups the difference is the audit). No self-join AND
    * no group-keyed window: the peer key has ~6 distinct values, so a
    * `partitionBy` window would funnel the whole fact table through 6
    * reducers (the weighted-median parallelism collapse — a first-cut
    * window formulation measured 4.6× time at 10× rows; this
    * broadcast rewrite re-measured ~1×). Instead the group's n, Σx,
    * Σx² reduce map-side into a 6-row moment table that BROADCASTS
    * back onto the scan — the leave-one-out moments are algebra on
    * (n−1) — and the square sums ride DECIMAL(38,0)/HUGEINT per the
    * overflow discipline. Output: top-20 by |z| via
    * TakeOrderedAndProject (identical doubles both engines →
    * identical order), keys as tiebreak. */
  def peerZscore(spark: SparkSession, dir: String): DataFrame = {
    val x = col("x").cast("double")
    val looMean = (col("s") - col("x")).cast("double") / (col("n") - lit(1))
    val looVar = (col("ss") - col("x") * col("x")).cast("double") / (col("n") - lit(1)) -
      looMean * looMean
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("x"))
    val stats = rows.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("ss"))
    rows.join(broadcast(stats), Seq("l_returnflag", "l_linestatus"))
      .withColumn("z", (x - looMean) / sqrt(looVar))
      .orderBy(abs(col("z")).desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("x").as("quantity"),
        round(col("z"), 6).as("peer_z"))
  }

  val peerZscoreSql: String =
    """WITH m AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
      |         CAST(l_quantity AS BIGINT) AS x,
      |         CAST(count(*) OVER w AS BIGINT) AS n,
      |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS s,
      |         sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS BIGINT)) OVER w AS ss
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_returnflag, l_linestatus)),
      |z AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, x,
      |         (CAST(x AS DOUBLE) - CAST(s - x AS DOUBLE) / (n - 1))
      |           / sqrt(CAST(ss - x * x AS DOUBLE) / (n - 1)
      |                  - (CAST(s - x AS DOUBLE) / (n - 1)) * (CAST(s - x AS DOUBLE) / (n - 1)))
      |           AS z
      |  FROM m)
      |SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
      |       x AS quantity, round(z, 6) AS peer_z
      |FROM z
      |ORDER BY abs(z) DESC, l_orderkey, l_linenumber
      |LIMIT 20""".stripMargin

  /** INTERVAL UNION LENGTH per supplier — merge the overlapping
    * 7-day shipping windows [shipdate, shipdate+7) of a supplier's
    * line items and report how many distinct calendar days the
    * supplier was actively shipping (the coverage/utilization shape:
    * SLA uptime from maintenance windows, speaker time from call
    * segments, covered-by-any-interval time generally). Classic
    * gaps-and-islands over intervals: a new island starts where the
    * interval's start clears the running max of all previous ends;
    * island coverage is max(end)−min(start); per-key coverage is the
    * island sum. All epoch-day integers — no float anywhere. The
    * ordering carries (start, orderkey, linenumber) so ties are
    * deterministic; equal-start rows can never open an island (their
    * end ≥ any tied start), so island ids are tie-order invariant.
    * Scale shape: ONE hash shuffle on the supplier key, then two
    * partition-local window passes (running max, running flag-sum)
    * and two map-side-combinable groupBys — the canonical
    * per-entity merge; no joins, no global sort. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("start_d"), col("l_orderkey"), col("l_linenumber"))
    val prev = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("start_d"))
      .withColumn("end_d", col("start_d") + 7L)
      .withColumn("prev_max_end", max(col("end_d")).over(prev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start_d") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("l_suppkey"), col("island"))
      .agg(count(lit(1)).as("n_iv"), min(col("start_d")).as("lo"),
        max(col("end_d")).as("hi"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("n_iv")).as("n_intervals"), count(lit(1)).as("n_islands"),
        sum(col("hi") - col("lo")).as("covered_days"))
      .orderBy(col("l_suppkey"))
  }

  val intervalUnionSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |         CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS start_d,
      |         CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) + 7 AS end_d
      |  FROM lineitem),
      |flagged AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, start_d, end_d,
      |         CASE WHEN max(end_d) OVER w IS NULL
      |                OR start_d > max(end_d) OVER w THEN 1 ELSE 0 END AS new_island
      |  FROM iv
      |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY start_d, l_orderkey, l_linenumber
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |islands AS (
      |  SELECT l_suppkey, start_d, end_d,
      |         sum(new_island) OVER (PARTITION BY l_suppkey
      |           ORDER BY start_d, l_orderkey, l_linenumber
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged),
      |per_island AS (
      |  SELECT l_suppkey, island, count(*) AS n_iv,
      |         min(start_d) AS lo, max(end_d) AS hi
      |  FROM islands GROUP BY 1, 2)
      |SELECT l_suppkey, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |       CAST(count(*) AS BIGINT) AS n_islands,
      |       CAST(sum(hi - lo) AS BIGINT) AS covered_days
      |FROM per_island GROUP BY 1 ORDER BY 1""".stripMargin

  /** ROLLING REGRESSION (24-bin OLS slope of hourly volume vs time)
    * per event type — the trend detector a capacity/alerting pipeline
    * runs continuously: each frame of 24 consecutive NON-EMPTY hourly
    * bins (a 24-ROW frame over the per-type (event_type, hour) table,
    * not a densified wall-clock day — a type with empty hours spans
    * more than 24 h and the regressor x is the bin index) gets the
    * exact least-squares slope of value-vs-bin-index; the output is each
    * type's steepest ramp-up and ramp-down (peak/trough slope with
    * its timestamp, ties broken by time). Cross-engine exact: frame
    * sums (Σx, Σy, Σxy, Σx²) are BIGINTs of cents × small indices,
    * the slope quantizes once to milli-cents/hour, and the
    * peak/trough argmax is a rank over integers.
    *
    * Scale shape: one compact (type, hour) agg; the rolling frame and
    * ranks run per type over the calendar-bounded bin table. */
  def rollingRegression(spark: SparkSession, dir: String): DataFrame = {
    val frame = 24
    val byType = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    val f = byType.rowsBetween(-(frame - 1), 0)
    val d = (c: Column) => c.cast("double")
    val binned = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bin"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("i", row_number().over(byType).cast("long"))
    val slopes = binned
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("sx", sum(col("i")).over(f))
      .withColumn("sy", sum(col("cents")).over(f))
      .withColumn("sxy", sum(col("i") * col("cents")).over(f))
      .withColumn("sxx", sum(col("i") * col("i")).over(f))
      .filter(col("n") === frame)
      .withColumn("slope_milli",
        round(lit(1e3) * d(col("n") * col("sxy") - col("sx") * col("sy")) /
          d(col("n") * col("sxx") - col("sx") * col("sx"))).cast("long"))
    val up = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_milli").desc, col("bin"))
    val dn = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_milli").asc, col("bin"))
    slopes
      .withColumn("ru", row_number().over(up))
      .withColumn("rd", row_number().over(dn))
      .filter(col("ru") === 1 || col("rd") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("_n"),
        max(when(col("ru") === 1,
          date_format(col("bin"), "yyyy-MM-dd HH:mm"))).as("peak_bin"),
        max(when(col("ru") === 1, col("slope_milli"))).as("peak_slope_milli"),
        max(when(col("rd") === 1,
          date_format(col("bin"), "yyyy-MM-dd HH:mm"))).as("trough_bin"),
        max(when(col("rd") === 1, col("slope_milli"))).as("trough_slope_milli"))
      .drop("_n")
      .orderBy(col("event_type"))
  }

  val rollingRegressionSql: String =
    """WITH binned AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bin,
      |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT event_type, bin, cents,
      |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY bin)
      |           AS BIGINT) AS i
      |  FROM binned),
      |framed AS (
      |  SELECT event_type, bin,
      |         count(*) OVER f AS n,
      |         sum(i) OVER f AS sx, sum(cents) OVER f AS sy,
      |         sum(i * cents) OVER f AS sxy, sum(i * i) OVER f AS sxx
      |  FROM idx
      |  WINDOW f AS (PARTITION BY event_type ORDER BY bin
      |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
      |slopes AS (
      |  SELECT event_type, bin,
      |         CAST(round(1e3 * CAST(n * sxy - sx * sy AS DOUBLE)
      |               / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
      |           AS slope_milli
      |  FROM framed WHERE n = 24),
      |ranked AS (
      |  SELECT event_type, bin, slope_milli,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY slope_milli DESC, bin) AS ru,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY slope_milli ASC, bin) AS rd
      |  FROM slopes)
      |SELECT event_type,
      |       max(CASE WHEN ru = 1 THEN strftime(bin, '%Y-%m-%d %H:%M') END)
      |         AS peak_bin,
      |       max(CASE WHEN ru = 1 THEN slope_milli END) AS peak_slope_milli,
      |       max(CASE WHEN rd = 1 THEN strftime(bin, '%Y-%m-%d %H:%M') END)
      |         AS trough_bin,
      |       max(CASE WHEN rd = 1 THEN slope_milli END) AS trough_slope_milli
      |FROM ranked WHERE ru = 1 OR rd = 1
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** MAXIMUM DRAWDOWN per event type — the peak-relative risk metric
    * on the CENTERED cumulative path (raw revenue only climbs; the
    * centered path P_t = Σ_{s≤t}(n·c_s − S) is the random-walk view
    * where a drawdown = a sustained below-trend stretch): running
    * peak via a struct-max window (carries the peak's bin for the
    * duration readout), drawdown D_t = peak − P_t, and the report is
    * each type's worst drawdown with its peak/trough bins and the
    * wall-clock hours between them (how long the type stayed under
    * water on the way down).
    *
    * Exactness: hourly cents are exact integers; centering
    * cross-multiplies the mean away (n·c − S — the runs-test
    * discipline), so P, peak and D are exact BIGINTs end to end;
    * ties in the final argmax break by earliest trough bin via the
    * same struct-max. Scale: one compact (type, hour) agg; both
    * windows run per type over the calendar-bounded bin table. */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    val run = byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bin"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val centered = binned
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("s", sum(col("cents")).over(Window.partitionBy(col("event_type"))))
      // decimal-FIRST: n·cents is a product of two data-sized
      // quantities (wraps a BIGINT once an hourly bucket passes ~1e15
      // cents); the oracle multiplies in HUGEINT
      .withColumn("p", sum(col("n").cast("decimal(38,0)") * col("cents") -
        col("s")).over(run))
    val pathed = centered
      // nts orders ties toward the EARLIEST bin; pkbin rides along for
      // the readout (no epoch->timestamp roundtrip — tz-sensitive)
      .withColumn("pk", max(struct(col("p"), (-unix_timestamp(col("bin"))).as("nts"),
        col("bin").as("pkbin"))).over(run))
      .withColumn("dd", col("pk.p") - col("p"))
    pathed
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_bins"),
        max(struct(col("dd"), (-unix_timestamp(col("bin"))).as("nts"),
          col("bin"), col("pk.pkbin").as("pkbin"))).as("worst"))
      .select(col("event_type"), col("n_bins"),
        col("worst.dd").cast("long").as("max_drawdown"),
        date_format(col("worst.pkbin"), "yyyy-MM-dd HH:mm").as("peak_bin"),
        date_format(col("worst.bin"), "yyyy-MM-dd HH:mm").as("trough_bin"),
        ((unix_timestamp(col("worst.bin")) -
          unix_timestamp(col("worst.pkbin"))) / lit(3600L)).cast("long")
          .as("underwater_hours"))
      .orderBy(col("event_type"))
  }

  val drawdownSql: String =
    """WITH binned AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bin,
      |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |marked AS (
      |  SELECT event_type, bin, cents,
      |         count(*) OVER (PARTITION BY event_type) AS n,
      |         sum(cents) OVER (PARTITION BY event_type) AS s
      |  FROM binned),
      |centered AS (
      |  SELECT event_type, bin, n,
      |         sum(CAST(n AS HUGEINT) * cents - s)
      |           OVER (PARTITION BY event_type ORDER BY bin
      |                 ROWS UNBOUNDED PRECEDING) AS p
      |  FROM marked),
      |pathed AS (
      |  SELECT event_type, bin, n, p,
      |         max(struct_pack(p := p, nts := -epoch(bin), pkbin := bin))
      |           OVER (PARTITION BY event_type ORDER BY bin
      |                 ROWS UNBOUNDED PRECEDING) AS pk
      |  FROM centered),
      |worst AS (
      |  SELECT event_type, max(n) AS n_bins,
      |         max(struct_pack(dd := pk.p - p, nts := -epoch(bin),
      |                         bin := bin, pkbin := pk.pkbin)) AS w
      |  FROM pathed GROUP BY 1)
      |SELECT event_type, CAST(n_bins AS BIGINT) AS n_bins,
      |       CAST(w.dd AS BIGINT) AS max_drawdown,
      |       strftime(w.pkbin, '%Y-%m-%d %H:%M') AS peak_bin,
      |       strftime(w.bin, '%Y-%m-%d %H:%M') AS trough_bin,
      |       CAST((epoch(w.bin) - epoch(w.pkbin)) // 3600 AS BIGINT)
      |         AS underwater_hours
      |FROM worst ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_drawdown" -> (drawdown _),
    "win_rolling_regression" -> (rollingRegression _),
    "win_interval_union" -> (intervalUnion _),
    "win_ratio_to_report" -> (ratioToReport _),
    "win_pareto_frontier" -> (paretoFrontier _),
    "win_peer_zscore" -> (peerZscore _),
    "win_moving_median" -> (movingMedian _),
    "win_distinct_count" -> (runningDistinct _),
    "win_streak" -> (longestStreak _),
    "win_sessionize" -> (sessionize _),
    "win_range_frame" -> (rangeFrameTrailing _),
    "win_distribution" -> (distributionWindows _),
    "win_topk_per_group" -> (topkPerPriority _),
    "win_lag_delta" -> (lagDelta _),
    "win_running_total" -> (runningTotal _),
    "win_ntile" -> (ntileQuartiles _),
    "win_first_last" -> (firstLastBalance _)
  )

  def oracle: Map[String, String] = Map(
    "win_drawdown" -> drawdownSql,
    "win_rolling_regression" -> rollingRegressionSql,
    "win_interval_union" -> intervalUnionSql,
    "win_ratio_to_report" -> ratioToReportSql,
    "win_pareto_frontier" -> paretoFrontierSql,
    "win_peer_zscore" -> peerZscoreSql,
    "win_moving_median" -> movingMedianSql,
    "win_distinct_count" -> runningDistinctSql,
    "win_streak" -> longestStreakSql,
    "win_sessionize" -> sessionizeSql,
    "win_range_frame" -> rangeFrameTrailingSql,
    "win_distribution" -> distributionWindowsSql,
    "win_topk_per_group" -> topkPerPrioritySql,
    "win_lag_delta" -> lagDeltaSql,
    "win_running_total" -> runningTotalSql,
    "win_ntile" -> ntileQuartilesSql,
    "win_first_last" -> firstLastBalanceSql
  )
}
