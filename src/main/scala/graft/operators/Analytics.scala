package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical TPC-H-flavored analytics adapted to the driver's star
  * schema — the classic shapes an analytics engine must plan well:
  * selective filter→agg (Q6), EXISTS-driven counts (Q4),
  * conditional-ratio joins (Q14), grouped having (Q18 flavor).
  */
object Analytics {

  /** Q6 flavor: forecast revenue from a tight range predicate — the
    * pushdown showcase (all three predicates reach the parquet scan;
    * no shuffle at all, a single partial+final agg). */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  val forecastRevenueSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q4 flavor: priority counts for 1996 orders with at least one line
    * shipped more than 60 days after the order date (EXISTS →
    * decorrelated semi join). */
  def latePriorityCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val latePriorityCountSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q14 flavor: share of revenue contributed by large parts — a
    * broadcast join feeding a conditional ratio. */
  def largePartShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_size") > 25, col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("large_share_pct"))
  }

  val largePartShareSql: String =
    """SELECT round(100.0 *
      |         sum(CASE WHEN p_size > 25
      |                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
      |         sum(l_extendedprice * (1 - l_discount)), 4) AS large_share_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** Q18 flavor: large-volume orders — grouped HAVING over a fact-fact
    * join (the agg-then-filter pattern; Catalyst keeps HAVING above
    * the partial agg, so the shuffle carries only group rows). */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    l.groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 150)
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"), col("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  val bigOrdersSql: String =
    """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price, total_qty
      |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |      FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 150) lq
      |JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Q19 flavor: disjunctive multi-attribute predicates over a
    * broadcast join. The interesting planning property: the shared
    * conjunct (`l_partkey = p_partkey`) drives the join while the OR
    * branches evaluate as a residual — and Catalyst extracts the
    * per-side common filters (quantity/size bounds) below the join. */
  def discountedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
          col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
          col("p_size").between(1, 15)))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val discountedRevenueSql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin

  /** Strict ordered funnel over the event stream: users who viewed,
    * then clicked AFTER their first view, then purchased AFTER that
    * click. Two compact aggregations and one equi join on user_id —
    * no sequence-scan blowup: stage times are per-user minima
    * computed conditionally, so each stage is a filtered min over
    * events already grouped once. Times are integer epoch-ns. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts_ns"))
    val firstView = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_ns"))).as("t_view"))
    val staged = ev.join(firstView, "user_id")
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(when(col("event_type") === "click" && col("ts_ns") > col("t_view"),
        col("ts_ns"))).as("t_click"))
    val staged2 = ev.join(staged, "user_id")
      .groupBy(col("user_id"), col("t_view"), col("t_click"))
      .agg(min(when(col("event_type") === "purchase" && col("ts_ns") > col("t_click"),
        col("ts_ns"))).as("t_buy"))
    staged2.agg(
      count(when(col("t_view").isNotNull, 1)).as("viewed"),
      count(when(col("t_click").isNotNull, 1)).as("then_clicked"),
      count(when(col("t_buy").isNotNull, 1)).as("then_purchased"))
  }

  val funnelStagesSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns FROM events),
      |fv AS (SELECT user_id,
      |              min(CASE WHEN event_type = 'view' THEN ts_ns END) AS t_view
      |       FROM ev GROUP BY 1),
      |fc AS (SELECT ev.user_id, fv.t_view,
      |              min(CASE WHEN event_type = 'click' AND ts_ns > t_view THEN ts_ns END) AS t_click
      |       FROM ev JOIN fv ON ev.user_id = fv.user_id GROUP BY 1, 2),
      |fp AS (SELECT ev.user_id, fc.t_view, fc.t_click,
      |              min(CASE WHEN event_type = 'purchase' AND ts_ns > t_click THEN ts_ns END) AS t_buy
      |       FROM ev JOIN fc ON ev.user_id = fc.user_id GROUP BY 1, 2, 3)
      |SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
      |       count(*) FILTER (WHERE t_click IS NOT NULL) AS then_clicked,
      |       count(*) FILTER (WHERE t_buy IS NOT NULL) AS then_purchased
      |FROM fp""".stripMargin

  /** Cohort retention: users bucketed by the week of their first
    * signup; for each cohort, distinct active users at each week
    * offset. Week indices are integer epoch-day/7 arithmetic (no
    * calendar week-start semantics to disagree on across engines).
    * One filtered agg for cohorts, an equi join back, a distinct on
    * compact keys, and the final count — all linear shuffles. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"),
      expr("ts_ns DIV 1000000000 DIV 86400 DIV 7").as("wk"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(cohort, "user_id")
      .filter(col("wk") >= col("cohort_wk"))
      .select(col("user_id"), col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .distinct()
      .groupBy(col("cohort_wk"), col("offset_wk"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_wk"), col("offset_wk"))
  }

  val cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |         epoch_ns(ts) // 1000000000 // 86400 // 7 AS wk
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, min(wk) AS cohort_wk
      |  FROM ev WHERE event_type = 'signup' GROUP BY 1)
      |SELECT cohort_wk, offset_wk, count(*) AS n_users
      |FROM (
      |  SELECT DISTINCT ev.user_id, cohort_wk, wk - cohort_wk AS offset_wk
      |  FROM ev JOIN cohort ON ev.user_id = cohort.user_id
      |  WHERE wk >= cohort_wk)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q3 flavor (shipping priority): segment-filtered customers ×
    * not-yet-shipped orders × late line items, top 10 orders by
    * revenue. The three filters all push to their scans BEFORE the
    * joins; the order key is the natural partitioning for both the
    * o–l join and the final aggregate, so at 100 TB one exchange on
    * orderkey serves both; the top-10 is a TakeOrderedAndProject
    * (per-partition heaps, no global sort). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q5 flavor (local supplier volume): the 6-table join — revenue by
    * nation where supplier and customer share the nation. Region and
    * nation are true broadcast dims; the equality `s_nationkey =
    * c_nationkey` rides the join output as a post-join filter. The
    * big l ⋈ o ⋈ c chain shuffles on orderkey then custkey — the
    * minimum possible for this shape. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val y0 = lit("1996-01-01").cast("timestamp")
    val y1 = lit("1998-01-01").cast("timestamp")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Q10 flavor (returned-item reporting): revenue lost to returns
    * per customer, top 20. The returnflag predicate pushes to the
    * lineitem scan; customer and nation join AFTER the aggregate has
    * collapsed lineitems to one row per customer — joining dims onto
    * the post-agg side moves customer-count rows, not lineitem-count
    * rows (at 100 TB that ordering is the query). */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val y0 = lit("1997-01-01").cast("timestamp")
    val y1 = lit("1998-01-01").cast("timestamp")
    val lost = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    lost
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedRevenueSql: String =
    """SELECT c_custkey, c_name, n_name, revenue
      |FROM (
      |  SELECT o_custkey,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY o_custkey) lost
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Market-basket association rules (a-priori first pass): part
    * pairs co-purchased in one order, with support, confidence and
    * lift. The pair join is ORDER-bounded (a basket of b items yields
    * b(b-1)/2 pairs — baskets are small by nature, the reason this
    * plan scales), the min-support prune (≥ 5 baskets) cuts the rule
    * table before the stats join, and every ratio divides exact
    * BIGINT counts — no float aggregation anywhere. Top 20 rules by
    * lift. */
  def marketBasket(spark: SparkSession, dir: String): DataFrame = {
    val nOrders = Tables.orders(spark, dir)
      .select(countDistinct(col("o_orderkey")).as("n_orders"))
    // ONE basket aggregation replaces the distinct + orderkey self-join
    // (r15, guide §2.4 "remove shuffles outright"): collect_set dedups
    // per order exactly as the old `items.distinct()` did, and the
    // b(b−1)/2 within-basket pairs are generated MAP-SIDE from the
    // sorted basket array — baskets are small by nature, which is the
    // same bound the old plan's join relied on. Old plan: distinct
    // exchange + 2 join exchanges + pair-agg exchange; new plan: one
    // basket exchange + pair-agg exchange, and lineitem is scanned
    // once (freq re-reads the basket aggregate via ReuseExchange).
    // checkpointed once (r16): the freq branch and the pair-explode
    // branch share only the orderkey EXCHANGE (ReuseExchange), so the
    // collect_set aggregate above it ran twice per call — and
    // materialized WIDE (checkpointWide): AQE coalesces the compact
    // basket rows to ~4 partitions, capping the b^2/2 pair explode's
    // parallelism at 4 tasks
    val baskets = graft.api.Graft.checkpointWide(
      Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))
    val freq = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), greatest(size(col("ps")) - i - 1, lit(0))),
          y => struct(x.as("pa"), y.as("pb")))))).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 5)
    pairs
      .join(freq.select(col("l_partkey").as("pa"), col("cnt").as("ca")), "pa")
      .join(freq.select(col("l_partkey").as("pb"), col("cnt").as("cb")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_both"),
        round(col("n_both").cast("double") / col("ca"), 4).as("confidence"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("ca").cast("double") * col("cb")), 4).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(20)
  }

  val marketBasketSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT o_orderkey) AS n_orders FROM orders),
      |freq AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_both
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT pa, pb, n_both,
      |       round(CAST(n_both AS DOUBLE) / fa.cnt, 4) AS confidence,
      |       round(CAST(n_both AS DOUBLE) * n.n_orders / (CAST(fa.cnt AS DOUBLE) * fb.cnt), 4) AS lift
      |FROM pairs
      |JOIN freq fa ON pairs.pa = fa.l_partkey
      |JOIN freq fb ON pairs.pb = fb.l_partkey
      |CROSS JOIN n
      |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin

  /** Item-item COLLABORATIVE FILTERING — the "users who bought X also
    * bought Y" recommender table: cosine similarity on the basket
    * co-occurrence matrix, cos(i,j) = n_both / √(f_i·f_j). Same
    * basket-bounded pair join as [[marketBasket]] (b(b−1)/2 per
    * order), with the min-co-occurrence prune (≥ 2) applied BEFORE
    * the frequency join so the stats join only carries surviving
    * pairs. Cosine divides exact BIGINT counts through one sqrt —
    * identical doubles in both engines. Top-3 neighbors per item via
    * the WindowGroupLimit rank (partial per-partition pruning). */
  def itemCf(spark: SparkSession, dir: String): DataFrame = {
    // same map-side basket-pair generation as [[marketBasket]] (r15):
    // one basket exchange + one pair-agg exchange replace the distinct
    // + self-join chain, and the symmetrize is an explode (map-side)
    // instead of a union that would re-run the pair aggregate twice
    // checkpointed once (r16): the freq branch and the pair-explode
    // branch share only the orderkey EXCHANGE (ReuseExchange), so the
    // collect_set aggregate above it ran twice per call — and
    // materialized WIDE (checkpointWide): AQE coalesces the compact
    // basket rows to ~4 partitions, capping the b^2/2 pair explode's
    // parallelism at 4 tasks
    val baskets = graft.api.Graft.checkpointWide(
      Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))
    val freq = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), greatest(size(col("ps")) - i - 1, lit(0))),
          y => struct(x.as("pa"), y.as("pb")))))).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 2)
    val sym = pairs
      .select(explode(array(
        struct(col("pa"), col("pb"), col("n_both")),
        struct(col("pb").as("pa"), col("pa").as("pb"), col("n_both")))).as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"), col("pr.n_both").as("n_both"))
    val w = Window.partitionBy(col("item")).orderBy(col("cos_raw").desc, col("neighbor"))
    sym
      .join(freq.select(col("l_partkey").as("pa"), col("cnt").as("fa")), "pa")
      .join(freq.select(col("l_partkey").as("pb"), col("cnt").as("fb")), "pb")
      .select(col("pa").as("item"), col("pb").as("neighbor"), col("n_both"),
        (col("n_both").cast("double") /
          sqrt(col("fa").cast("double") * col("fb"))).as("cos_raw"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("item"), col("rank"), col("neighbor"), col("n_both"),
        round(col("cos_raw"), 6).as("cosine"))
      .orderBy(col("item"), col("rank"))
  }

  val itemCfSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |freq AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_both
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (
      |  SELECT pa, pb, n_both FROM pairs
      |  UNION ALL
      |  SELECT pb, pa, n_both FROM pairs),
      |scored AS (
      |  SELECT s.pa AS item, s.pb AS neighbor, s.n_both,
      |         CAST(s.n_both AS DOUBLE) /
      |           sqrt(CAST(fa.cnt AS DOUBLE) * fb.cnt) AS cos_raw
      |  FROM sym s
      |  JOIN freq fa ON s.pa = fa.l_partkey
      |  JOIN freq fb ON s.pb = fb.l_partkey)
      |SELECT item, rank, neighbor, n_both, round(cos_raw, 6) AS cosine
      |FROM (SELECT item, neighbor, n_both, cos_raw,
      |             CAST(row_number() OVER (PARTITION BY item
      |               ORDER BY cos_raw DESC, neighbor) AS BIGINT) AS rank
      |      FROM scored)
      |WHERE rank <= 3 ORDER BY item, rank""".stripMargin

  /** Marketing ATTRIBUTION (first-touch / last-touch) — for every
    * purchase, which event type opened the user's journey and which
    * immediately preceded the conversion, with the purchase value
    * credited to each. The classic funnel-analytics report, and a
    * window-function composition: two per-user windows sharing ONE
    * (user_id / ts, event_id) exchange — first_value over the
    * unbounded-preceding frame for first-touch, lag for last-touch.
    * Credit sums in exact integer cents. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val touched = Tables.events(spark, dir)
      .withColumn("first_touch", first(col("event_type")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_touch", lag(col("event_type"), 1).over(order))
      .filter(col("event_type") === "purchase")
      .select(col("first_touch"),
        coalesce(col("prev_touch"), lit("(none)")).as("last_touch"),
        round(col("value") * 100).cast("long").as("cents"))
    touched.groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(col("cents")).cast("double") / 100d).as("revenue"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  val attributionSql: String =
    """WITH t AS (
      |  SELECT event_type,
      |         first_value(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_ns(ts), event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_ns(ts), event_id) AS prev_touch,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT first_touch, coalesce(prev_touch, '(none)') AS last_touch,
      |       count(*) AS n_purchases,
      |       CAST(sum(cents) AS DOUBLE) / 100 AS revenue
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** FUNNEL LATENCY — time-to-convert percentiles: per daily signup
    * cohort, how long from a user's FIRST signup to their FIRST
    * subsequent purchase (the product metric behind "activation
    * time"). Two per-user min aggregates (compact user key), then
    * exact p50/p90 over integer-second latencies per cohort day —
    * `percentile` (type-7) is engine-exact on integers, the same
    * parity contract `agg_winsorize` pins; unconverted users are
    * censused, never silently dropped. At 100 TB: one user-keyed
    * shuffle + one compact cohort agg (swap percentile for
    * percentile_approx at extreme group sizes — `agg_approx_quantiles`
    * is that shape). */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("s_ns"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"))
    val lat = signup
      .join(firstBuy, Seq("user_id"), "left")
      .withColumn("ok", col("ts_ns").isNotNull && col("ts_ns") >= col("s_ns"))
      .groupBy(col("user_id"), col("s_ns"))
      .agg(min(when(col("ok"), col("ts_ns"))).as("p_ns"))
      .select(col("user_id"),
        date_format(expr("s_ns div 1000000000").cast("timestamp"), "yyyy-MM-dd")
          .as("cohort_day"),
        when(col("p_ns").isNotNull,
          expr("(p_ns - s_ns) div 1000000000")).as("lat_sec"))
    lat.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        count(col("lat_sec")).as("n_converted"),
        round(expr("percentile(lat_sec, 0.5)"), 2).as("p50_sec"),
        round(expr("percentile(lat_sec, 0.9)"), 2).as("p90_sec"))
      .orderBy(col("cohort_day"))
  }

  val funnelLatencySql: String =
    """WITH s AS (
      |  SELECT user_id, min(epoch_ns(ts)) AS s_ns
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |lat AS (
      |  SELECT s.user_id,
      |         strftime(to_timestamp(s.s_ns // 1000000000), '%Y-%m-%d') AS cohort_day,
      |         (min(CASE WHEN p.ts IS NOT NULL AND epoch_ns(p.ts) >= s.s_ns
      |                   THEN epoch_ns(p.ts) END) - s.s_ns) // 1000000000 AS lat_sec
      |  FROM s LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |    ON s.user_id = p.user_id
      |  GROUP BY s.user_id, s.s_ns)
      |SELECT cohort_day, count(*) AS n_users,
      |       count(lat_sec) AS n_converted,
      |       round(quantile_cont(lat_sec, 0.5), 2) AS p50_sec,
      |       round(quantile_cont(lat_sec, 0.9), 2) AS p90_sec
      |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin

  /** RFM segmentation — the first customer-value cut any CRM/marketing
    * warehouse ships: per customer Recency (days since last order vs
    * the corpus high-water mark — NOT wall clock, so the op is
    * replayable), Frequency (order count), Monetary (lifetime cents),
    * each scored into quintiles, reported as the segment matrix.
    * Quintiles via ntile(5) over a TOTAL order (metric, custkey) —
    * ntile on a partial order is placement-nondeterministic for tied
    * customers, which would break both the oracle and any two runs of
    * the engine. Monetary stays integer cents end to end; the only
    * double is the exact /100 at the boundary. Scale: one orders-table
    * aggregation (map-side combinable on o_custkey), three
    * histogram-path quintile assignments over the CUSTOMER table, a
    * compact 125-cell output — see the r11 note on [[rfm]] itself;
    * no unpartitioned window survives in this family (the
    * percentile_approx threshold rewrite this doc once recommended is
    * no longer needed: [[HistQuantile]] keeps exact quintile balance
    * AND the fully parallel plan). */
  /** SEGMENT MIGRATION matrix — the retention slide after [[rfm]]'s
    * snapshot: split the order history at its midpoint instant
    * (integer epoch-second arithmetic — exact, replayable, no
    * wall-clock), quintile each customer's spend WITHIN each half
    * (ntile over spenders in that half, keys as tie-break), and
    * census the 5×5 transition matrix plus the two boundary columns —
    * NEW (absent → segment) and CHURNED (segment → absent) — as
    * segment 0. The decision-grade artifact is the flow, not either
    * snapshot. Scale: two compact per-customer aggs off one scan; the
    * per-customer quintiles run on the [[HistQuantile.withNtile]]
    * histogram path (the r10 advisory: the first cut's two
    * unpartitioned ntile windows funneled the whole spend table
    * through one task twice) — cum-before from the compact spend-cents
    * histogram plus a per-value partitioned row_number, byte-identical
    * to the oracle's literal ntile; the join is customer-keyed, full
    * outer so neither boundary column is silently dropped — the
    * audit discipline. */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.orders(spark, dir)
      .agg(expr("(min(unix_timestamp(o_orderdate)) + max(unix_timestamp(o_orderdate))) div 2")
        .as("mid"))
    val spend = Tables.orders(spark, dir).crossJoin(broadcast(bounds))
      .withColumn("half",
        when(expr("unix_timestamp(o_orderdate)") < col("mid"), 1).otherwise(2))
      .groupBy(col("o_custkey"), col("half"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    def seg(h: Int, name: String) = HistQuantile.withNtile(
        spend.filter(col("half") === h), col("cents"), col("o_custkey"),
        5, descValue = true, out = name)
      .select(col("o_custkey"), col(name))
    seg(1, "seg_from").join(seg(2, "seg_to"), Seq("o_custkey"), "full_outer")
      .select(coalesce(col("seg_from"), lit(0L)).as("seg_from"),
        coalesce(col("seg_to"), lit(0L)).as("seg_to"))
      .groupBy(col("seg_from"), col("seg_to"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("seg_from"), col("seg_to"))
  }

  val segmentMigrationSql: String =
    """WITH bounds AS (
      |  SELECT (min(epoch_ns(o_orderdate) // 1000000000)
      |          + max(epoch_ns(o_orderdate) // 1000000000)) // 2 AS mid
      |  FROM orders),
      |spend AS (
      |  SELECT o_custkey,
      |         CASE WHEN epoch_ns(o_orderdate) // 1000000000 < mid THEN 1 ELSE 2 END AS half,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders, bounds GROUP BY 1, 2),
      |s1 AS (
      |  SELECT o_custkey, CAST(ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
      |           AS seg_from
      |  FROM spend WHERE half = 1),
      |s2 AS (
      |  SELECT o_custkey, CAST(ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
      |           AS seg_to
      |  FROM spend WHERE half = 2)
      |SELECT coalesce(seg_from, 0) AS seg_from, coalesce(seg_to, 0) AS seg_to,
      |       count(*) AS n_customers
      |FROM s1 FULL OUTER JOIN s2 USING (o_custkey)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** RFM quintile census. An r11 probe moved all three quintile
    * assignments onto [[HistQuantile.withNtile]] and MEASURED IT
    * SLOWER (0.5 → 2.0 s at sf0.1, reverted — the measured-revert
    * discipline): monetary_cents is near-UNIQUE per customer, so its
    * "histogram" is customer-sized and the cumulative window saves
    * nothing while the extra join/window stages cost 3× the plan. The
    * windowed form stays: three ntile windows over the
    * already-aggregated customer table (1000× smaller than orders).
    * Past ~10⁸ customers, recency/frequency (compact domains) go
    * through [[HistQuantile]] and monetary through range-partitioned
    * rank-offsets — the documented rewrite. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
    val hwm = Tables.orders(spark, dir).agg(max(col("o_orderdate")).as("hwm"))
    per.crossJoin(broadcast(hwm))
      .withColumn("recency_days", datediff(col("hwm"), col("last_order")))
      .withColumn("r_q", ntile(5).over(Window.orderBy(col("recency_days"), col("o_custkey"))))
      .withColumn("f_q", ntile(5).over(Window.orderBy(col("frequency").desc, col("o_custkey"))))
      .withColumn("m_q", ntile(5).over(Window.orderBy(col("monetary_cents").desc, col("o_custkey"))))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("monetary_cents")).cast("double") / 100).as("total_monetary"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val rfmSql: String =
    """WITH per AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS frequency,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY 1),
      |hwm AS (SELECT max(o_orderdate) AS hwm FROM orders),
      |scored AS (
      |  SELECT ntile(5) OVER (ORDER BY datediff('day', last_order, hwm), o_custkey) AS r_q,
      |         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
      |         ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_q,
      |         monetary_cents
      |  FROM per, hwm)
      |SELECT r_q, f_q, m_q, count(*) AS n_customers,
      |       CAST(sum(monetary_cents) AS DOUBLE) / 100 AS total_monetary
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** PARETO / revenue-concentration report — "which decile of
    * customers carries the revenue" plus the Gini coefficient, the
    * one-number inequality summary. Customers rank by lifetime cents
    * (desc, custkey tie-break — a total order, same discipline as
    * [[rfm]]); deciles via ntile(10); shares in ppm from exact
    * integer cents. Gini uses the rank formula G = 2·Σ(i·xᵢ)/(n·Σx)
    * − (n+1)/n over the ASCENDING sort — Σ(i·xᵢ) is a BIGINT (rank ≤
    * |customers|, cents ≤ 2⁴⁰: no overflow until ~10⁹ customers ×
    * $10⁷ lifetime; past that the decile-grouped approximation is the
    * standard rewrite), so both engines feed identical integers into
    * the one double expression.
    *
    * Executed entirely on the [[HistQuantile]] cents-histogram path
    * (r11 — the first cut ranked every customer through TWO
    * unpartitioned windows): a cents value-group holding descending
    * ranks [cum−c+1, cum] spans a contiguous decile range (integer
    * ntile arithmetic), contributes overlap·cents to each decile's
    * total, and its ASCENDING ranks are the run [n−cum+1, n−cum+c]
    * whose sum is c·(2n−2·cum+c+1)/2 — so Σ(i·xᵢ) folds over the
    * histogram without materializing a single per-row rank. Only the
    * distinct-cents table ever sorts. */
  def pareto(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy(col("cents").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val gini = hist.agg(
      max(col("n")).as("nc"), sum(col("cents") * col("c")).as("total"),
      sum(col("cents") * expr("c * (2*n - 2*cum + c + 1) div 2")).as("six"))
      .select(round(lit(1e6) * (lit(2).cast("double") * col("six") /
          (col("nc") * col("total")) - (col("nc") + lit(1)).cast("double") / col("nc")))
        .cast("long").as("gini_ppm"), col("total"))
    hist
      .withColumn("d1", expr(HistQuantile.ntileSqlExpr("cum - c + 1", "n", 10)))
      .withColumn("d2", expr(HistQuantile.ntileSqlExpr("cum", "n", 10)))
      .select(col("cents"), col("c"), col("cum"), col("n"),
        explode(sequence(col("d1"), col("d2"))).as("decile"))
      // ntile(10) bucket d covers ranks [(d−1)q + min(d−1,m) + 1, dq + min(d,m)]
      .withColumn("s_d",
        expr("(decile - 1) * (n div 10) + least(decile - 1, n % 10) + 1"))
      .withColumn("e_d", expr("decile * (n div 10) + least(decile, n % 10)"))
      .withColumn("k", least(col("cum"), col("e_d")) -
        greatest(col("cum") - col("c") + 1L, col("s_d")) + 1L)
      .groupBy(col("decile"))
      .agg(sum(col("k")).as("n_customers"), sum(col("k") * col("cents")).as("dc"))
      .crossJoin(broadcast(gini))
      .select(col("decile"), col("n_customers"),
        round(lit(1e6) * col("dc") / col("total")).cast("long").as("share_ppm"),
        round(lit(1e6) * sum(col("dc")).over(
          Window.orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, 0)) /
          col("total")).cast("long").as("cum_share_ppm"),
        col("gini_ppm"))
      .orderBy(col("decile"))
  }

  val paretoSql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |ranked AS (
      |  SELECT cents,
      |         ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile,
      |         row_number() OVER (ORDER BY cents, o_custkey DESC) AS i_asc
      |  FROM per),
      |g AS (
      |  SELECT count(*) AS nc, sum(cents) AS total, sum(i_asc * cents) AS six
      |  FROM ranked),
      |gini AS (
      |  SELECT CAST(round(1e6 * (2.0 * six / (nc * total) - CAST(nc + 1 AS DOUBLE) / nc))
      |              AS BIGINT) AS gini_ppm, total
      |  FROM g),
      |dec AS (
      |  SELECT decile, count(*) AS n_customers, sum(cents) AS dc
      |  FROM ranked GROUP BY 1)
      |SELECT decile, n_customers,
      |       CAST(round(1e6 * dc / total) AS BIGINT) AS share_ppm,
      |       CAST(round(1e6 * sum(dc) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) / total)
      |            AS BIGINT) AS cum_share_ppm,
      |       gini_ppm
      |FROM dec, gini ORDER BY decile""".stripMargin

  /** KAPLAN–MEIER survival curve over SESSION durations — the
    * engagement analysis that handles CENSORING correctly (sessions
    * still open near the corpus edge haven't ended; treating them as
    * completed biases every naive duration number down). Sessions are
    * the 30-minute-gap islands (the [[Windows]] sessionize contract);
    * a session's lifetime is whole 10-minute periods first→last
    * event, and sessions whose last event falls within the 30-minute
    * gap of the corpus high-water mark are censored (they may still
    * be open). Per period: at-risk count (total minus prior exits — a
    * window cumsum of exact integers), deaths, censored, and Ŝ(t) =
    * Π(1 − dₛ/nₛ) for s ≤ t. The prefix product is the one genuinely
    * sequential piece: the PERIOD table is duration-bounded (tens of
    * rows, not sessions), so the engine folds an ordered prefix list
    * (collect_list over the cumulative window frame — deterministic
    * frame order) while the oracle uses a windowed product; both
    * multiply the same exact factors (dₛ/nₛ: integer÷integer — bit-
    * identical IEEE division both sides) and the result rounds at 6
    * dp. Scale: one per-user lag window + one session aggregation
    * (both data-sized, key-partitioned); everything after is on the
    * periods spine. */
  def survival(spark: SparkSession, dir: String): DataFrame = {
    val gapNs = 30L * 60 * 1000000000L
    val periodNs = 10L * 60 * 1000000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"))
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_s",
        (col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs).cast("long"))
      .withColumn("sess", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts_ns")).as("first_ns"), max(col("ts_ns")).as("last_ns"))
    val hwm = Tables.events(spark, dir).agg(max(col("ts_ns")).as("hwm_ns"))
    val lives = sessions.crossJoin(broadcast(hwm))
      // `div`, not `/`: Spark's / on longs is DOUBLE division and the
      // truncating cast could land one period off near an exact
      // boundary; div is the exact integer floor DuckDB's // computes
      .select(expr(s"(last_ns - first_ns) div $periodNs").as("w"),
        (col("last_ns") < col("hwm_ns") - gapNs).cast("long").as("death"))
    val perPeriod = lives.groupBy(col("w").as("period"))
      .agg(sum(col("death")).as("d"), sum(lit(1L) - col("death")).as("c"))
    val total = lives.agg(count(lit(1)).as("n_users"))
    val cum = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perPeriod.crossJoin(broadcast(total))
      .withColumn("exits_thru",
        sum(col("d") + col("c")).over(cum))
      .withColumn("n_risk",
        col("n_users") - col("exits_thru") + col("d") + col("c"))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      .withColumn("survival", round(aggregate(
        collect_list(col("factor")).over(cum), lit(1.0), (acc, x) => acc * x), 6))
      .select(col("period"), col("n_risk"), col("d").as("n_deaths"),
        col("c").as("n_censored"), col("survival"))
      .orderBy(col("period"))
  }

  val survivalSql: String =
    """WITH marked AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
      |         CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
      |                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      |sess AS (
      |  SELECT user_id, ts_ns,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM marked),
      |sessions AS (
      |  SELECT user_id, sess, min(ts_ns) AS first_ns, max(ts_ns) AS last_ns
      |  FROM sess GROUP BY 1, 2),
      |hwm AS (SELECT max(epoch_ns(ts)) AS hwm_ns FROM events),
      |lives AS (
      |  SELECT (last_ns - first_ns) // 600000000000 AS w,
      |         CAST(last_ns < hwm_ns - 1800000000000 AS BIGINT) AS death
      |  FROM sessions, hwm),
      |per AS (
      |  SELECT w AS period, sum(death) AS d, sum(1 - death) AS c
      |  FROM lives GROUP BY 1),
      |tot AS (SELECT count(*) AS n_users FROM lives),
      |risk AS (
      |  SELECT period, d, c,
      |         n_users - sum(d + c) OVER (ORDER BY period ROWS UNBOUNDED PRECEDING)
      |           + d + c AS n_risk
      |  FROM per, tot)
      |SELECT period, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_deaths,
      |       CAST(c AS BIGINT) AS n_censored,
      |       round(product(1.0 - CAST(d AS DOUBLE) / n_risk)
      |             OVER (ORDER BY period ROWS UNBOUNDED PRECEDING), 6) AS survival
      |FROM risk ORDER BY period""".stripMargin

  /** NEW vs RETURNING daily actives — the growth dashboard's first
    * split: per day, how many active users are seeing the product for
    * the first time. Distinct (user, day) pairs first (bounds
    * everything downstream at users×days), each user's first day via
    * a window MIN over that compact set, then one day-keyed census.
    * All integer day arithmetic; the share is one ppm-rounded
    * division. The min window and nothing else touches per-user
    * grouping, so the plan is: one distinct (user,day) exchange → min
    * window on user → day-keyed agg. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val activeDays = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
      .distinct()
    val withFirst = activeDays.withColumn("first_day",
      min(col("day")).over(Window.partitionBy(col("user_id"))))
    withFirst.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        count_if(col("day") === col("first_day")).as("n_new"),
        count_if(col("day") =!= col("first_day")).as("n_returning"))
      .withColumn("new_share_ppm",
        round(lit(1e6) * col("n_new") / col("dau")).cast("long"))
      .select(date_format((col("day") * 86400L).cast("timestamp"), "yyyy-MM-dd").as("date"),
        col("dau"), col("n_new"), col("n_returning"), col("new_share_ppm"))
      .orderBy(col("date"))
  }

  val newVsReturningSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
      |firsts AS (
      |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS first_day
      |  FROM active)
      |SELECT strftime(to_timestamp(day * 86400), '%Y-%m-%d') AS date,
      |       count(*) AS dau,
      |       CAST(count(*) FILTER (WHERE day = first_day) AS BIGINT) AS n_new,
      |       CAST(count(*) FILTER (WHERE day <> first_day) AS BIGINT) AS n_returning,
      |       CAST(round(1e6 * count(*) FILTER (WHERE day = first_day) / count(*)) AS BIGINT)
      |         AS new_share_ppm
      |FROM firsts GROUP BY day ORDER BY 1""".stripMargin

  /** TOP EVENT PATHS — 3-step sequence mining over the clickstream
    * ("what do users actually do?"): every consecutive
    * (e₁ → e₂ → e₃) window per user (ordered by ts, event_id — the
    * warehouse ordering contract), counted corpus-wide, top-10 with
    * deterministic tie-break. A lag-chain window (no self-join: the
    * 3-gram is two lags), then one compact-key count — at 100 TB the
    * path-string key space is |types|³ ≈ bounded, so the agg is
    * map-side combinable into a tiny table; the window rides the
    * same user-key exchange every per-user op shares. */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("e2", lag(col("event_type"), 1).over(byUser))
      .withColumn("e1", lag(col("event_type"), 2).over(byUser))
      .filter(col("e1").isNotNull)
      .groupBy(concat_ws(" > ", col("e1"), col("e2"), col("event_type")).as("path"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  val topPathsSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_type,
      |         lag(event_type, 1) OVER w AS e2,
      |         lag(event_type, 2) OVER w AS e1
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id))
      |SELECT e1 || ' > ' || e2 || ' > ' || event_type AS path,
      |       count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM lagged WHERE e1 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** MARKOV TRANSITION MATRIX over per-user event sequences — the
    * behavioral model behind next-event prediction and funnel-leak
    * hunting: P(next event type | current), estimated from every
    * consecutive pair in each user's timeline. One per-user lag
    * window (key-partitioned — scales with users, the same shape as
    * sessionize), one ≤|types|²-cell census; row-normalized
    * probabilities in exact ppm from integer counts, the row totals a
    * window over the compact cell table. Ties in ts break by
    * event_id, identically in the oracle, so the pair stream is a
    * deterministic function of the data. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("event_type"), col("n"),
        round(lit(1e6) * col("n").cast("double") / col("row_total").cast("double"))
          .cast("long").as("p_ppm"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  val eventTransitionsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |cells AS (
      |  SELECT prev_type, event_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, event_type, n,
      |       CAST(round(1e6 * CAST(n AS DOUBLE)
      |            / sum(n) OVER (PARTITION BY prev_type)) AS BIGINT) AS p_ppm
      |FROM cells ORDER BY prev_type, event_type""".stripMargin

  /** Q13 flavor: customer order-count DISTRIBUTION — the classic
    * outer-join histogram: every customer must appear (zero-order
    * customers included, hence LEFT join, the shape q13 exists to
    * test), orders filtered by a join-condition predicate (NOT a
    * WHERE — a WHERE would turn the outer join inner), then a
    * second aggregation over the first's counts. Both aggs are
    * exact integers. Scale: join + two compact-key aggs, all
    * shuffle-partitioned on their keys; the second agg's domain is
    * the count histogram (tiny). */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey") &&
        o("o_orderpriority") =!= "1-URGENT", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val customerDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) cc
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 flavor: top supplier(s) by quarter revenue — the
    * view-then-max-tie shape: a per-supplier revenue aggregate is
    * consumed twice (once to find the max, once to select the
    * achievers), with TIES kept. Revenue rides integer CENTS
    * (round(price·(1−disc)·100) per line, exact BIGINT sum) so the
    * max-equality selection is deterministic across engines — a
    * double-sum formulation would leave tie membership to
    * summation order. Scale: one fact scan → compact supplier agg
    * (map-side combinable); the max is a 1-row broadcast back onto
    * the agg, never a second fact scan. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val rev = l
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("rev_cents"))
    val top = rev.agg(max(col("rev_cents")).as("max_cents"))
    rev.join(broadcast(top), col("rev_cents") === col("max_cents"))
      .join(broadcast(s), col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("rev_cents") / 100.0, 2).as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-07-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q17 flavor: small-quantity revenue for a brand — the
    * correlated per-group-average threshold: lines of one brand's
    * parts qualify only when their quantity is below 20% of that
    * PART's average quantity over the whole fact table. Quantities
    * are whole-valued doubles, so Σ is exact and the avg (one
    * division of exact numbers) is bit-identical across engines —
    * the threshold compare cannot flip; revenue rides integer
    * cents. Scale: the correlated subquery decorrelates to a
    * per-part aggregate joined back (Catalyst rewrites it so; the
    * brand filter prunes the probe side through the broadcast part
    * dim before the threshold join). */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    spark.sql(
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 2)
        |         AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  val smallQtyRevenueSql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 2)
      |         AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** Q22 flavor: rich-but-idle customers — the anti-join + scalar-
    * subquery cohort: customers whose balance beats the positive-
    * balance average AND who have placed no order since 2000
    * (every synthetic customer has SOME order, so the faithful
    * never-ordered cut is vacuous — the recent-idle cut keeps the
    * anti-join shape with a real cohort), censused by segment. The threshold is computed in integer cents (exact
    * BIGINT sum / exact count → one double division) so the
    * above-average cut is bit-deterministic; the NOT EXISTS plans
    * as a left-anti join on the orders key. Scale: anti join
    * shuffles on custkey; the threshold is a 1-row broadcast. */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS numcust,
        |       round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
        |         AS totacctbal
        |FROM customer
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
        |      (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
        |       FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val idleCustomersSql: String =
    """SELECT c_mktsegment, count(*) AS numcust,
      |       round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2)
      |         AS totacctbal
      |FROM customer
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
      |      (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
      |       FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_transitions" -> (eventTransitions _),
    "q_top_paths" -> (topPaths _),
    "q_new_vs_returning" -> (newVsReturning _),
    "q_segment_migration" -> (segmentMigration _),
    "q_rfm" -> (rfm _),
    "q_pareto" -> (pareto _),
    "q_survival" -> (survival _),
    "q_market_basket" -> (marketBasket _),
    "q_item_cf" -> (itemCf _),
    "q_attribution" -> (attribution _),
    "q_funnel_latency" -> (funnelLatency _),
    "q10_returned_customers" -> (returnedRevenue _),
    "q3_shipping_priority" -> (shippingPriority _),
    "q5_local_supplier_volume" -> (localSupplierVolume _),
    "q_cohort_retention" -> (cohortRetention _),
    "q_funnel_stages" -> (funnelStages _),
    "q19_discounted_revenue" -> (discountedRevenue _),
    "q6_forecast_revenue" -> (forecastRevenue _),
    "q4_late_priority" -> (latePriorityCount _),
    "q13_customer_distribution" -> (customerDistribution _),
    "q14_large_part_share" -> (largePartShare _),
    "q15_top_supplier" -> (topSupplier _),
    "q17_small_qty_revenue" -> (smallQtyRevenue _),
    "q18_big_orders" -> (bigOrders _),
    "q22_idle_customers" -> (idleCustomers _)
  )

  def oracle: Map[String, String] = Map(
    "q_event_transitions" -> eventTransitionsSql,
    "q_top_paths" -> topPathsSql,
    "q_new_vs_returning" -> newVsReturningSql,
    "q_segment_migration" -> segmentMigrationSql,
    "q_rfm" -> rfmSql,
    "q_pareto" -> paretoSql,
    "q_survival" -> survivalSql,
    "q_market_basket" -> marketBasketSql,
    "q_item_cf" -> itemCfSql,
    "q_attribution" -> attributionSql,
    "q_funnel_latency" -> funnelLatencySql,
    "q10_returned_customers" -> returnedRevenueSql,
    "q3_shipping_priority" -> shippingPrioritySql,
    "q5_local_supplier_volume" -> localSupplierVolumeSql,
    "q_cohort_retention" -> cohortRetentionSql,
    "q_funnel_stages" -> funnelStagesSql,
    "q19_discounted_revenue" -> discountedRevenueSql,
    "q6_forecast_revenue" -> forecastRevenueSql,
    "q4_late_priority" -> latePriorityCountSql,
    "q13_customer_distribution" -> customerDistributionSql,
    "q14_large_part_share" -> largePartShareSql,
    "q15_top_supplier" -> topSupplierSql,
    "q17_small_qty_revenue" -> smallQtyRevenueSql,
    "q18_big_orders" -> bigOrdersSql,
    "q22_idle_customers" -> idleCustomersSql
  )
}
