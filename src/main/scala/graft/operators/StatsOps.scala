package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical screens (SURVEY.md §2.10 EXT — the reference's event
  * path, /root/reference/main.py:5–17, carries no statistics at all;
  * these are the corpus-health and experiment-analysis tests a
  * training-data pipeline runs beside the chi²/KS/A-B family already
  * in [[Aggregations]]).
  *
  * Exactness discipline (the established two-layer contract): every
  * sufficient statistic is an exact integer — histogram counts,
  * integer cents, 2×-scaled ranks — accumulated in DECIMAL(38,0)
  * (DuckDB: HUGEINT) wherever a product of two data-sized quantities
  * appears, so no accumulator can wrap at any corpus size; the final
  * statistic is then ONE double expression over identical inputs in
  * both engines, quantized to micro/ppm units.
  *
  * Scale shape: everything reduces through a compact-key aggregation
  * first (distinct cents values, lang×source cells, part keys), so the
  * data-sized stage is always one map-side-combinable shuffle; the
  * ordered windows run over histogram/dictionary tables, never over
  * the raw stream (the weighted-median discipline).
  */
object StatsOps {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  // ---------------------------------------------------------------
  // GINI coefficient
  // ---------------------------------------------------------------

  /** GINI concentration of customer revenue — the inequality audit
    * ("what share of revenue do the top customers carry?") in its
    * exact rank form G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over
    * ascending-sorted values. The sort is NOT over customers: revenue
    * quantizes to integer cents, so the rank sum collapses onto the
    * VALUE HISTOGRAM — a run of c equal values v starting after rank
    * r contributes v·(2·c·r + c·(c+1)) in doubled units (Σ of the
    * arithmetic progression; doubled so c(c+1)/2 never divides), and
    * G_num = Σ2x − (n+1)·Σx with Σ2x = Σ i·x₍ᵢ₎ doubled. All products
    * ride DECIMAL(38,0)/HUGEINT; the one division is the final ppm.
    * Scale: one compact-key agg per customer, one per distinct cents
    * value, one ordered window over the DISTINCT-VALUE table only. */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
    val hist = perCust.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = hist
      .withColumn("r", sum(col("c")).over(cum) - col("c"))
      .agg(sum(col("c")).as("n_customers"),
        sum(dec(col("v")) * col("c")).as("sx"),
        sum(dec(col("v")) * (lit(2) * dec(col("c")) * col("r") +
          dec(col("c")) * (col("c") + lit(1)))).as("s2x"))
    m.select(col("n_customers"),
      col("sx").cast("long").as("total_cents"),
      round(lit(1e6) * (col("s2x") - (col("n_customers") + lit(1)) * col("sx")).cast("double") /
        (dec(col("n_customers")) * col("sx")).cast("double")).cast("long").as("gini_ppm"))
  }

  val giniSql: String =
    """WITH perc AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM orders GROUP BY 1),
      |hist AS (SELECT v, count(*) AS c FROM perc GROUP BY 1),
      |runs AS (
      |  SELECT v, c, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS r
      |  FROM hist),
      |m AS (
      |  SELECT sum(c) AS n_customers,
      |         sum(CAST(v AS HUGEINT) * c) AS sx,
      |         sum(CAST(v AS HUGEINT) * (2 * CAST(c AS HUGEINT) * r
      |             + CAST(c AS HUGEINT) * (c + 1))) AS s2x
      |  FROM runs)
      |SELECT CAST(n_customers AS BIGINT) AS n_customers,
      |       CAST(sx AS BIGINT) AS total_cents,
      |       CAST(round(1e6 * CAST(s2x - (n_customers + 1) * sx AS DOUBLE)
      |                  / CAST(CAST(n_customers AS HUGEINT) * sx AS DOUBLE)) AS BIGINT) AS gini_ppm
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // Mutual information lang × source
  // ---------------------------------------------------------------

  /** MUTUAL INFORMATION between language and source over the document
    * corpus — the redundancy screen behind a mixing decision ("does
    * source already determine language?"). MI = Σ p(l,s)·ln(N·n_ls /
    * (n_l·n_s)) in micro-nats, each cell term quantized ONCE (the
    * entropy/logprob ln contract: identical doubles into ln on both
    * engines), marginals as window sums over the |langs|×|sources|
    * CELL table. Normalized MI divides the quantized MI by the
    * smaller quantized marginal entropy — an integer-input division,
    * so the ppm cannot wobble. The a·N and n_l·n_s products ride
    * DECIMAL(38,0)/HUGEINT before their one double cast. */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("a"))
      .withColumn("nl", sum(col("a")).over(Window.partitionBy(col("lang"))))
      .withColumn("ns", sum(col("a")).over(Window.partitionBy(col("source"))))
      .withColumn("nn", sum(col("a")).over(Window.partitionBy()))
    val mi = cells
      .withColumn("term_micro", round(lit(1e6) *
        (col("a").cast("double") / col("nn")) *
        log((dec(col("a")) * col("nn")).cast("double") /
          (dec(col("nl")) * col("ns")).cast("double"))).cast("long"))
      .agg(max(col("nn")).as("n_docs"), count(lit(1)).as("n_cells"),
        sum(col("term_micro")).as("mi_micro_nats"))
    def marginalH(key: String): DataFrame =
      Tables.documents(spark, dir)
        .groupBy(col(key)).agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy()))
        .withColumn("p", col("c").cast("double") / col("n"))
        .agg(sum(round(lit(-1e6) * col("p") * log(col("p"))).cast("long"))
          .as(s"h_$key"))
    mi.crossJoin(broadcast(marginalH("lang")))
      .crossJoin(broadcast(marginalH("source")))
      .select(col("n_docs"), col("n_cells"), col("mi_micro_nats"),
        when(least(col("h_lang"), col("h_source")) > 0,
          round(lit(1e6) * col("mi_micro_nats").cast("double") /
            least(col("h_lang"), col("h_source"))).cast("long")).as("nmi_ppm"))
  }

  val mutualInfoSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS a FROM documents GROUP BY 1, 2),
      |m AS (
      |  SELECT lang, source, a,
      |         CAST(sum(a) OVER (PARTITION BY lang) AS BIGINT) AS nl,
      |         CAST(sum(a) OVER (PARTITION BY source) AS BIGINT) AS ns,
      |         CAST(sum(a) OVER () AS BIGINT) AS nn
      |  FROM cells),
      |mi AS (
      |  SELECT CAST(max(nn) AS BIGINT) AS n_docs, count(*) AS n_cells,
      |         CAST(sum(CAST(round(1e6 * (CAST(a AS DOUBLE) / nn)
      |               * ln(CAST(CAST(a AS HUGEINT) * nn AS DOUBLE)
      |                    / CAST(CAST(nl AS HUGEINT) * ns AS DOUBLE))) AS BIGINT))
      |              AS BIGINT) AS mi_micro_nats
      |  FROM m),
      |hl AS (
      |  SELECT CAST(sum(CAST(round(-1e6 * (CAST(c AS DOUBLE) / n)
      |               * ln(CAST(c AS DOUBLE) / n)) AS BIGINT)) AS BIGINT) AS h_lang
      |  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS n
      |        FROM (SELECT count(*) AS c FROM documents GROUP BY lang))),
      |hs AS (
      |  SELECT CAST(sum(CAST(round(-1e6 * (CAST(c AS DOUBLE) / n)
      |               * ln(CAST(c AS DOUBLE) / n)) AS BIGINT)) AS BIGINT) AS h_source
      |  FROM (SELECT c, CAST(sum(c) OVER () AS BIGINT) AS n
      |        FROM (SELECT count(*) AS c FROM documents GROUP BY source)))
      |SELECT n_docs, n_cells, mi_micro_nats,
      |       CASE WHEN least(h_lang, h_source) > 0
      |            THEN CAST(round(1e6 * CAST(mi_micro_nats AS DOUBLE)
      |                            / least(h_lang, h_source)) AS BIGINT) END AS nmi_ppm
      |FROM mi, hl, hs""".stripMargin

  // ---------------------------------------------------------------
  // Mann–Whitney U (rank-sum) test
  // ---------------------------------------------------------------

  /** Two-sample MANN–WHITNEY U — the nonparametric sibling of the
    * Welch test in [[Aggregations.abTest]]: do click and purchase
    * order values come from the same distribution, judged on RANKS
    * (robust to the heavy tail that breaks the t-test's normality
    * assumption)? Tie handling is exact: ranks live in DOUBLED units
    * so the midrank of a tie run starting after position r with c
    * members is the integer 2r+c+1 — no .5 ever exists — and the
    * doubled rank sum R₁, the doubled U₁ = R₁ − n₁(n₁+1), and the
    * tie-correction Σ(c³−c) are DECIMAL(38,0)/HUGEINT exact. The
    * normal-approximation z then evaluates as one double expression
    * (same text both engines) in micro units. Scale: the
    * weighted-median histogram shape — one compact-key (cents) agg,
    * one window over distinct values. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").as("is1"))
      .groupBy(col("cents"))
      .agg(count_if(col("is1")).as("d1"), count_if(!col("is1")).as("d2"))
      .withColumn("c", col("d1") + col("d2"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = perVal
      .withColumn("r0", sum(col("c")).over(cum) - col("c"))
      .agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"),
        sum(dec(col("d1")) * (lit(2) * col("r0") + col("c") + lit(1))).as("r1x"),
        sum(dec(col("c")) * col("c") * col("c") - col("c")).as("t3"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = (col("n1") + col("n2")).cast("double")
    val u1 = (col("r1x") - dec(col("n1")) * (col("n1") + lit(1))).cast("double") / 2
    val sigma2 = n1d * n2d / 12 *
      ((nd + 1) - col("t3").cast("double") / (nd * (nd - 1)))
    m.select(col("n1").as("n_click"), col("n2").as("n_purchase"),
      u1.as("u_stat"),
      round(lit(1e6) * (u1 - n1d * n2d / 2) / sqrt(sigma2)).cast("long").as("z_micro"))
  }

  val mannWhitneySql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type = 'click' AS is1
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |perval AS (
      |  SELECT cents, CAST(count(*) FILTER (WHERE is1) AS BIGINT) AS d1,
      |         CAST(count(*) FILTER (WHERE NOT is1) AS BIGINT) AS d2,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM v GROUP BY 1),
      |runs AS (
      |  SELECT d1, d2, c,
      |         sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c AS r0
      |  FROM perval),
      |m AS (
      |  SELECT sum(d1) AS n1, sum(d2) AS n2,
      |         sum(CAST(d1 AS HUGEINT) * (2 * r0 + c + 1)) AS r1x,
      |         sum(CAST(c AS HUGEINT) * c * c - c) AS t3
      |  FROM runs)
      |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
      |       CAST(r1x - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2 AS u_stat,
      |       CAST(round(1e6 * (CAST(r1x - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2
      |                         - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
      |             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
      |                    * ((CAST(n1 + n2 AS DOUBLE) + 1)
      |                       - CAST(t3 AS DOUBLE)
      |                         / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1)))))
      |            AS BIGINT) AS z_micro
      |FROM m""".stripMargin

  /** MOOD'S MEDIAN TEST — the third member of the two-sample family
    * and the most robust: [[Aggregations.ksTest]] judges the whole
    * distribution, [[mannWhitney]] judges rank location, Mood judges
    * ONLY the median (each sample reduced to "how many sit above the
    * POOLED median" — a 2×2 contingency χ², immune to any amount of
    * tail weirdness). Same ingestion as Mann–Whitney (click vs
    * purchase order values in integer cents, compact-key value
    * histogram + one cumulative window over distinct values): the
    * pooled median is the smallest cents with 2·cum ≥ N (no .5
    * arithmetic), ties AT the median count below (the > convention,
    * stated), the four cells are exact integers, and the χ²
    * cross-product determinant rides DECIMAL(38,0)/HUGEINT (det ~
    * n₁·n₂ squares past a long). df = 1 is STRUCTURAL — the two
    * groups are literals in the filter, not data-derived — so the
    * 3.841459 critical value cannot silently mismatch a drifting
    * cardinality (the bartlett/dunn ADVICE lesson does not apply).
    * Scale: histogram agg is map-side combinable on the bounded
    * cents domain; the median pick and the 1-row broadcast are
    * compact. */
  def moodMedian(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").as("is1"))
      .groupBy(col("cents"))
      .agg(count_if(col("is1")).as("d1"), count_if(!col("is1")).as("d2"))
      .withColumn("c", col("d1") + col("d2"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = perVal
      .withColumn("cumc", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(all))
      .filter(col("cumc") * 2 >= col("n"))
      .agg(min(col("cents")).as("med_cents"))
    val m = perVal.crossJoin(broadcast(med))
      .agg(max(col("med_cents")).as("med_cents"),
        sum(col("d1")).as("n1"), sum(col("d2")).as("n2"),
        sum(when(col("cents") > col("med_cents"), col("d1")).otherwise(lit(0L)))
          .as("a1"),
        sum(when(col("cents") > col("med_cents"), col("d2")).otherwise(lit(0L)))
          .as("a2"))
    val det = dec(col("a1")) * (col("n2") - col("a2")) -
      dec(col("a2")) * (col("n1") - col("a1"))
    val nTot = (col("n1") + col("n2")).cast("double")
    val denom = col("n1").cast("double") * col("n2").cast("double") *
      (col("a1") + col("a2")).cast("double") *
      (col("n1") + col("n2") - col("a1") - col("a2")).cast("double")
    val chi2Micro = round(lit(1e6) * nTot * (det * det).cast("double") / denom)
      .cast("long")
    m.select(col("med_cents"), col("n1").as("n_click"), col("n2").as("n_purchase"),
        col("a1").as("above_click"), col("a2").as("above_purchase"),
        chi2Micro.as("chi2_micro"),
        (chi2Micro > 3841459L).as("significant"))
  }

  val moodMedianSql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type = 'click' AS is1
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |perval AS (
      |  SELECT cents, CAST(count(*) FILTER (WHERE is1) AS BIGINT) AS d1,
      |         CAST(count(*) FILTER (WHERE NOT is1) AS BIGINT) AS d2,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM v GROUP BY 1),
      |runs AS (
      |  SELECT cents, d1, d2, c,
      |         sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumc,
      |         sum(c) OVER () AS n
      |  FROM perval),
      |med AS (SELECT min(cents) AS med_cents FROM runs WHERE cumc * 2 >= n),
      |m AS (
      |  SELECT max(med_cents) AS med_cents, sum(d1) AS n1, sum(d2) AS n2,
      |         sum(CASE WHEN cents > med_cents THEN d1 ELSE 0 END) AS a1,
      |         sum(CASE WHEN cents > med_cents THEN d2 ELSE 0 END) AS a2
      |  FROM perval CROSS JOIN med),
      |s AS (
      |  SELECT med_cents, n1, n2, a1, a2,
      |         CAST(round(1e6 * CAST(n1 + n2 AS DOUBLE)
      |               * CAST((CAST(a1 AS HUGEINT) * (n2 - a2)
      |                       - CAST(a2 AS HUGEINT) * (n1 - a1))
      |                      * (CAST(a1 AS HUGEINT) * (n2 - a2)
      |                         - CAST(a2 AS HUGEINT) * (n1 - a1)) AS DOUBLE)
      |               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |                  * CAST(a1 + a2 AS DOUBLE)
      |                  * CAST(n1 + n2 - a1 - a2 AS DOUBLE))) AS BIGINT) AS chi2_micro
      |  FROM m)
      |SELECT CAST(med_cents AS BIGINT) AS med_cents,
      |       CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
      |       CAST(a1 AS BIGINT) AS above_click, CAST(a2 AS BIGINT) AS above_purchase,
      |       chi2_micro, chi2_micro > 3841459 AS significant
      |FROM s""".stripMargin

  // ---------------------------------------------------------------
  // Cramér's V
  // ---------------------------------------------------------------

  /** CRAMÉR'S V — the effect size the chi² screen
    * ([[Aggregations.chiSquare]]) is missing: a significant χ² on a
    * 100-TB corpus is nearly guaranteed (n is astronomical), so the
    * decision-relevant number is V = √(χ²/(N·(min(r,c)−1))) ∈ [0,1].
    * Computed over the orders priority × status contingency: cell
    * counts and both margins exact, χ² quantized per cell to micro
    * units (sum order-independent), V one double expression in ppm.
    * Bounded output: r·c cells. */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("o"))
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("o_orderpriority"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("o_orderstatus"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = col("rt").cast("double") * col("ct") / col("n")
    cells
      .withColumn("cont_micro",
        round(lit(1e6) * (col("o") - e) * (col("o") - e) / e).cast("long"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_cells"),
        least(countDistinct(col("o_orderpriority")),
          countDistinct(col("o_orderstatus"))).as("k"),
        sum(col("cont_micro")).as("chi2_micro"))
      .select(col("n"), col("n_cells"), col("chi2_micro"),
        round(lit(1e6) * sqrt(col("chi2_micro").cast("double") / 1e6 /
          (col("n").cast("double") * (col("k") - lit(1)).cast("double"))))
          .cast("long").as("cramers_v_ppm"))
  }

  val cramersVSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority, o_orderstatus, count(*) AS o
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT o_orderpriority, o_orderstatus, o,
      |         CAST(sum(o) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS rt,
      |         CAST(sum(o) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS ct,
      |         CAST(sum(o) OVER () AS BIGINT) AS n
      |  FROM cells),
      |c AS (
      |  SELECT o_orderpriority, o_orderstatus, o, n,
      |         CAST(round(1e6 * (o - CAST(rt AS DOUBLE) * ct / n)
      |                        * (o - CAST(rt AS DOUBLE) * ct / n)
      |                        / (CAST(rt AS DOUBLE) * ct / n)) AS BIGINT) AS cont_micro
      |  FROM m)
      |SELECT max(n) AS n, count(*) AS n_cells,
      |       CAST(sum(cont_micro) AS BIGINT) AS chi2_micro,
      |       CAST(round(1e6 * sqrt(CAST(sum(cont_micro) AS DOUBLE) / 1e6
      |                  / (CAST(max(n) AS DOUBLE)
      |                     * CAST(least(count(DISTINCT o_orderpriority),
      |                                  count(DISTINCT o_orderstatus)) - 1 AS DOUBLE))))
      |            AS BIGINT) AS cramers_v_ppm
      |FROM c""".stripMargin

  // ---------------------------------------------------------------
  // Count–Min sketch
  // ---------------------------------------------------------------

  private val cmsDepth = 4
  private val cmsWidth = 256

  /** COUNT–MIN SKETCH build + probe — the streaming-scale frequency
    * sketch beside the HLL distinct sketch ([[Aggregations]]): a d×w
    * grid of counters (d=4 md5-derived hash rows, w=256 buckets),
    * point estimate = min over rows, always ≥ truth. The sketch is
    * ADDITIVE, so it builds from the compact (key, count) table, not
    * the raw stream — one map-side-combinable agg into d·w = 1024
    * cells regardless of corpus size; mergeability across partitions/
    * days is the whole point of the structure. The probe reports the
    * true top-10 keys with their estimates and the overcount, making
    * the collision error measurable (the audited-drops discipline).
    * Hashes are the established md5-prefix longs — bit-identical in
    * both engines. */
  def cmsTopK(spark: SparkSession, dir: String): DataFrame = {
    val keyCounts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val rows = explode(sequence(lit(0), lit(cmsDepth - 1))).as("i")
    def bucket(i: Column, key: Column): Column =
      conv(substring(md5(concat(i.cast("string"), lit(":"),
        key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long") % cmsWidth
    val cms = keyCounts.select(col("l_partkey"), col("cnt"), rows)
      .withColumn("bucket", bucket(col("i"), col("l_partkey")))
      .groupBy(col("i"), col("bucket")).agg(sum(col("cnt")).as("s"))
    val top = keyCounts
      .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
      .select(col("l_partkey"), col("cnt").as("true_cnt"), rows)
      .withColumn("bucket", bucket(col("i"), col("l_partkey")))
    top.join(cms, Seq("i", "bucket"))
      .groupBy(col("l_partkey"), col("true_cnt"))
      .agg(min(col("s")).as("cms_est"))
      .select(col("l_partkey"), col("true_cnt"), col("cms_est"),
        (col("cms_est") - col("true_cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("l_partkey"))
  }

  val cmsTopKSql: String =
    s"""WITH kc AS (
       |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
       |rows_ AS (SELECT unnest(range($cmsDepth)) AS i),
       |hashed AS (
       |  SELECT k.l_partkey, k.cnt, r.i,
       |         ('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' ||
       |                               CAST(k.l_partkey AS VARCHAR)), 1, 8))::BIGINT
       |           % $cmsWidth AS bucket
       |  FROM kc k, rows_ r),
       |cms AS (
       |  SELECT i, bucket, CAST(sum(cnt) AS BIGINT) AS s
       |  FROM hashed GROUP BY 1, 2),
       |top AS (
       |  SELECT l_partkey, cnt AS true_cnt
       |  FROM kc ORDER BY cnt DESC, l_partkey LIMIT 10),
       |probe AS (
       |  SELECT t.l_partkey, t.true_cnt, r.i,
       |         ('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' ||
       |                               CAST(t.l_partkey AS VARCHAR)), 1, 8))::BIGINT
       |           % $cmsWidth AS bucket
       |  FROM top t, rows_ r)
       |SELECT p.l_partkey, p.true_cnt, CAST(min(c.s) AS BIGINT) AS cms_est,
       |       CAST(min(c.s) - p.true_cnt AS BIGINT) AS overcount
       |FROM probe p JOIN cms c ON p.i = c.i AND p.bucket = c.bucket
       |GROUP BY 1, 2
       |ORDER BY p.true_cnt DESC, p.l_partkey""".stripMargin

  // ---------------------------------------------------------------
  // HDR-histogram percentiles
  // ---------------------------------------------------------------

  /** HDR-HISTOGRAM percentiles with an error audit — the MERGEABLE
    * percentile sketch (HdrHistogram's public bucketing: a power-of-2
    * exponent × 16 linear sub-buckets, relative error ≤ 1/16 by
    * construction) beside the exact path: p50/p95/p99 of order value
    * cents estimated from the bounded bucket table AND computed
    * exactly from the value histogram, with the relative error in ppm
    * — approximation audited against truth, the recall@k discipline
    * applied to percentiles. The exponent comes from the BINARY
    * STRING length (never floor(log2) — the power-of-2 boundary
    * trap), so bucketing is pure integer arithmetic; the sketch is
    * one compact-key agg (≤ ~26·16 cells however big the corpus) and
    * merges by addition across partitions/days. */
  def hdrPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val vals = Tables.orders(spark, dir).filter(cents > 0)
      .select(cents.as("v"))
    // sketch side: (e, sb) bucket census with exact lower bounds
    val bucketed = vals
      .withColumn("e", (length(bin(col("v"))) - 1).cast("long"))
      .withColumn("sb",
        expr("(v * 16) div shiftleft(cast(1 as bigint), cast(e as int)) - 16"))
      .groupBy(col("e"), col("sb")).agg(count(lit(1)).as("c"))
      .withColumn("lo",
        expr("shiftleft(cast(1 as bigint), cast(e as int)) * (16 + sb) div 16"))
    val cumB = Window.orderBy(col("e"), col("sb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sketched = bucketed
      .withColumn("cum", sum(col("c")).over(cumB))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    // exact side: the distinct-value histogram (weighted-median shape)
    val exact = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
    val ps = Seq(50L, 95L, 99L)
    val rows = ps.map { p =>
      // rank = ceil(p/100 * n) in exact integers: (p*n + 99) div 100
      val est = sketched.filter(col("cum") >= expr(s"($p * n + 99) div 100"))
        .orderBy(col("e"), col("sb")).limit(1)
        .select(lit(p).as("pct"), col("lo").as("est_cents"))
      val tru = exact.filter(col("cum") >= expr(s"($p * n + 99) div 100"))
        .orderBy(col("v")).limit(1)
        .select(lit(p).as("pct"), col("v").as("exact_cents"))
      est.join(tru, "pct")
    }
    rows.reduce(_ union _)
      .select(col("pct"), col("est_cents"), col("exact_cents"),
        round(lit(1e6) * (col("est_cents") - col("exact_cents")).cast("double") /
          col("exact_cents").cast("double")).cast("long").as("rel_err_ppm"))
      .orderBy(col("pct"))
  }

  val hdrPercentilesSql: String = {
    val one = (p: Long) =>
      s"""SELECT $p AS pct,
         |  (SELECT lo FROM sk WHERE cum >= ($p * n + 99) // 100
         |   ORDER BY e, sb LIMIT 1) AS est_cents,
         |  (SELECT v FROM ex WHERE cum >= ($p * n + 99) // 100
         |   ORDER BY v LIMIT 1) AS exact_cents""".stripMargin
    s"""WITH vals AS (
       |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
       |b AS (
       |  SELECT e, (v * 16) // (1 << e) - 16 AS sb, count(*) AS c
       |  FROM (SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS e FROM vals)
       |  GROUP BY 1, 2),
       |sk AS (
       |  SELECT e, sb, (1 << e) * (16 + sb) // 16 AS lo,
       |         sum(c) OVER (ORDER BY e, sb ROWS UNBOUNDED PRECEDING) AS cum,
       |         CAST(sum(c) OVER () AS BIGINT) AS n
       |  FROM b),
       |ex AS (
       |  SELECT v,
       |         sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
       |         CAST(sum(c) OVER () AS BIGINT) AS n
       |  FROM (SELECT v, count(*) AS c FROM vals GROUP BY 1))
       |SELECT pct, CAST(est_cents AS BIGINT) AS est_cents,
       |       CAST(exact_cents AS BIGINT) AS exact_cents,
       |       CAST(round(1e6 * CAST(est_cents - exact_cents AS DOUBLE)
       |                  / CAST(exact_cents AS DOUBLE)) AS BIGINT) AS rel_err_ppm
       |FROM (${Seq(50L, 95L, 99L).map(one).mkString("\nUNION ALL\n")})
       |ORDER BY pct""".stripMargin
  }

  // ---------------------------------------------------------------
  // Benford first-digit audit
  // ---------------------------------------------------------------

  /** BENFORD'S-LAW first-digit audit — the fraud/synthetic-data
    * screen a data-quality pass runs over money columns: naturally
    * occurring amounts put digit d first with probability
    * log₁₀(1+1/d); fabricated or truncated feeds don't. The digit is
    * taken from the DECIMAL STRING of integer cents (never from
    * floor(log10) — log10(1000) can evaluate 2.999…→ floor 2, the
    * classic exactness trap), so the census is pure integers; the
    * expected ppm per digit is log₁₀ of a 9-value constant table
    * (identical doubles both engines), and the deviation is one
    * quantized expression per digit row. One compact-key (digit)
    * map-side-combinable agg. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val digits = Tables.orders(spark, dir)
      .filter(cents > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
    digits
      .select(col("digit"), col("n"),
        round(lit(1e6) * col("n").cast("double") / col("total")).cast("long")
          .as("obs_ppm"),
        round(lit(1e6) * log(10.0, lit(1.0) + lit(1.0) / col("digit")))
          .cast("long").as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy(col("digit"))
  }

  val benfordSql: String =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
      |                        1, 1) AS BIGINT) AS digit
      |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
      |c AS (
      |  SELECT digit, count(*) AS n, CAST(sum(count(*)) OVER () AS BIGINT) AS total
      |  FROM d GROUP BY 1)
      |SELECT digit, n,
      |       CAST(round(1e6 * CAST(n AS DOUBLE) / total) AS BIGINT) AS obs_ppm,
      |       CAST(round(1e6 * log10(1.0 + 1.0 / digit)) AS BIGINT) AS exp_ppm,
      |       CAST(round(1e6 * CAST(n AS DOUBLE) / total) AS BIGINT)
      |         - CAST(round(1e6 * log10(1.0 + 1.0 / digit)) AS BIGINT) AS dev_ppm
      |FROM c ORDER BY digit""".stripMargin

  // ---------------------------------------------------------------
  // Theil–Sen robust slope
  // ---------------------------------------------------------------

  private val senBins = 336 // 14 days of hourly bins

  /** THEIL–SEN estimator — the robust trend slope of the hourly event
    * rate over its first 14 days: the LOWER MEDIAN of all pairwise
    * slopes (nⱼ−nᵢ)/(j−i), immune to the outlier hours that pull an
    * OLS line ([[Aggregations.linreg]] is the fragile sibling). The
    * pair set is CALENDAR-BOUNDED (≤336 bins → ≤56 280 pairs however
    * big the corpus — the hourly-family argument), so the quadratic
    * blowup every Theil–Sen implementation fears is capped by the
    * window, not the data; the data-sized stage remains the hourly
    * count agg. Each slope is one IEEE division of exact integers
    * (identical both engines); the lower median is an ORDER STATISTIC
    * (row (m+1) div 2 by slope value), not an interpolated midpoint,
    * so no float averaging exists anywhere. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val series = TimeSeries.hourlyCounts(spark, dir)
    val lo = series.agg(min(col("bin")).as("lo"))
    val idxed = series.crossJoin(broadcast(lo))
      .select(expr("(unix_micros(bin) - unix_micros(lo)) div 3600000000").as("idx"),
        col("n"))
      .filter(col("idx") < senBins)
    val a = idxed.select(col("idx").as("i"), col("n").as("ni"))
    val b = idxed.select(col("idx").as("j"), col("n").as("nj"))
    val slopes = a.join(broadcast(b), col("i") < col("j"))
      .select(((col("nj") - col("ni")).cast("double") /
        (col("j") - col("i")).cast("double")).as("slope"))
    val w = Window.orderBy(col("slope"))
    slopes
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .filter(col("rn") === expr("(m + 1) div 2"))
      .select(col("m").as("n_pairs"), round(col("slope"), 6).as("sen_slope"))
  }

  val theilSenSql: String =
    s"""WITH ${TimeSeries.hourlyCountsSql},
       |lo AS (SELECT min(bin) AS lo FROM series),
       |idxed AS (
       |  SELECT (epoch_ns(bin) - epoch_ns(lo)) // 3600000000000 AS idx, n
       |  FROM series, lo
       |  WHERE (epoch_ns(bin) - epoch_ns(lo)) // 3600000000000 < $senBins),
       |slopes AS (
       |  SELECT CAST(b.n - a.n AS DOUBLE) / CAST(b.idx - a.idx AS DOUBLE) AS slope
       |  FROM idxed a JOIN idxed b ON a.idx < b.idx),
       |ranked AS (
       |  SELECT slope, CAST(row_number() OVER (ORDER BY slope) AS BIGINT) AS rn,
       |         CAST(count(*) OVER () AS BIGINT) AS m
       |  FROM slopes)
       |SELECT m AS n_pairs, round(slope, 6) AS sen_slope
       |FROM ranked WHERE rn = (m + 1) // 2""".stripMargin

  // ---------------------------------------------------------------
  // One-way ANOVA
  // ---------------------------------------------------------------

  /** ONE-WAY ANOVA F test — "do the k market segments differ in mean
    * account balance?", the multi-group extension of the A/B test in
    * [[Aggregations]]. Per-group sufficient statistics are exact
    * integers (n_g, Σcents, Σcents² on DECIMAL(38,0)); the between /
    * within sums of squares decompose as SSB = Σ s_g²/n_g − s²/n and
    * SSW = Σ q_g − Σ s_g²/n_g. Cross-group float summation order
    * would be nondeterministic, so each GROUP's double term is
    * quantized to integer milli-cents² first and the ≤k integer terms
    * sum exactly (the per-term-quantization contract); F and η² are
    * then ONE double expression over the two integer sums. Scale:
    * one map-side-combinable groupBy(segment) — k rows — then a 1-row
    * reduce; nothing downstream of the first agg is data-sized. */
  def anova(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100.0d).cast("long").as("cents"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("ng"), sum(col("cents")).as("sg"),
        sum(dec(col("cents")) * col("cents")).as("qg"))
    val tot = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("s"))
    def d(c: Column) = c.cast("double")
    val terms = g.crossJoin(broadcast(tot))
      .select(col("k"), col("n"), col("s"),
        round(lit(1e3) * (d(col("sg")) * d(col("sg")) / d(col("ng")) -
          lit(2.0d) * d(col("sg")) * d(col("s")) / d(col("n")) +
          d(col("ng")) * d(col("s")) * d(col("s")) / (d(col("n")) * d(col("n")))))
          .cast("long").as("ssb_g"),
        round(lit(1e3) * (d(col("qg")) - d(col("sg")) * d(col("sg")) / d(col("ng"))))
          .cast("long").as("ssw_g"))
      .groupBy(col("k"), col("n"))
      .agg(sum(col("ssb_g")).as("ssb_milli"), sum(col("ssw_g")).as("ssw_milli"))
    terms.select(col("k"), col("n"), col("ssb_milli"), col("ssw_milli"),
      round(lit(1e3) * (d(col("ssb_milli")) / d(col("k") - 1)) /
        (d(col("ssw_milli")) / d(col("n") - col("k")))).cast("long").as("f_milli"),
      round(lit(1e6) * d(col("ssb_milli")) /
        (d(col("ssb_milli")) + d(col("ssw_milli")))).cast("long").as("eta2_ppm"))
  }

  val anovaSql: String =
    """WITH g AS (
      |  SELECT c_mktsegment AS seg, count(*) AS ng,
      |         sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS sg,
      |         sum(CAST(CAST(round(c_acctbal * 100.0) AS BIGINT) AS HUGEINT) *
      |             CAST(round(c_acctbal * 100.0) AS BIGINT)) AS qg
      |  FROM customer GROUP BY 1),
      |tot AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s FROM g),
      |terms AS (
      |  SELECT t.k, t.n,
      |         sum(CAST(round(1e3 * (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng
      |           - 2.0 * CAST(sg AS DOUBLE) * CAST(s AS DOUBLE) / n
      |           + ng * CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT)) AS ssb_milli,
      |         sum(CAST(round(1e3 * (CAST(qg AS DOUBLE)
      |           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)) AS BIGINT)) AS ssw_milli
      |  FROM g, tot t GROUP BY 1, 2)
      |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |       CAST(ssb_milli AS BIGINT) AS ssb_milli,
      |       CAST(ssw_milli AS BIGINT) AS ssw_milli,
      |       CAST(round(1e3 * (CAST(ssb_milli AS DOUBLE) / (k - 1)) /
      |            (CAST(ssw_milli AS DOUBLE) / (n - k))) AS BIGINT) AS f_milli,
      |       CAST(round(1e6 * CAST(ssb_milli AS DOUBLE) /
      |            (CAST(ssb_milli AS DOUBLE) + CAST(ssw_milli AS DOUBLE))) AS BIGINT) AS eta2_ppm
      |FROM terms""".stripMargin

  // ---------------------------------------------------------------
  // Poisson bootstrap confidence interval
  // ---------------------------------------------------------------

  /** POISSON BOOTSTRAP 95% CI for the mean order value — the
    * streaming-friendly bootstrap (Chamandy et al.'s "Estimating
    * Uncertainty for Massive Data Streams" recipe): instead of
    * resampling n rows WITH replacement (impossible distributed —
    * it needs global coordination), each row enters replicate b with
    * an independent Poisson(1) weight, here drawn DETERMINISTICALLY
    * by inverse-CDF lookup on the portable md5 id-hash of
    * (o_orderkey : b) against 2³²-scaled literal thresholds — both
    * engines share the exact constants, so the "randomness" is
    * reproducible bit-for-bit. B = 64 replicates fan out map-side
    * (one row-count×64 flatMap into a 64-key map-side-combinable
    * agg — the bootstrap's honest cost); the CI is the rank-2 /
    * rank-63 order statistic of the 64 replicate means (the
    * ⌈(B+1)·α/2⌉ percentile convention) and the bootstrap SE comes
    * from exact integer moments of the milli-quantized means. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    // floor(CDF_Poisson(1)(k) * 2^32), k = 0..7; >= t7 -> weight 8
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val u = graft.api.Graft.idHash(
      concat(col("o_orderkey").cast("string"), lit(":"), col("b").cast("string")))
    val w = ts.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), rest) => when(col("u") < t, lit(k.toLong)).otherwise(rest)
    }
    val reps = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100.0d).cast("long").as("cents"))
      .withColumn("b", explode(sequence(lit(0L), lit(63L))))
      .withColumn("u", u).withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nb"),
        sum(dec(col("w")) * col("cents")).as("sb"))
      .select(col("b"),
        round(lit(10.0d) * col("sb").cast("double") / col("nb").cast("double"))
          .cast("long").as("m_milli"))
    val rn = Window.orderBy(col("m_milli"), col("b"))
    val ranked = reps.withColumn("rn", row_number().over(rn))
    val stats = ranked.agg(
      count(lit(1)).as("b_reps"),
      max(when(col("rn") === 2, col("m_milli"))).as("lo_milli"),
      max(when(col("rn") === 63, col("m_milli"))).as("hi_milli"),
      sum(col("m_milli")).as("sm"),
      sum(dec(col("m_milli")) * col("m_milli")).as("smm"))
    val point = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100.0d).cast("long")).as("s"))
    def d(c: Column) = c.cast("double")
    point.crossJoin(broadcast(stats))
      .select(col("n"), col("b_reps"),
        round(lit(10.0d) * d(col("s")) / d(col("n"))).cast("long").as("mean_milli"),
        col("lo_milli"), col("hi_milli"),
        round(sqrt((d(col("smm")) - d(col("sm")) * d(col("sm")) / d(col("b_reps"))) /
          (d(col("b_reps")) - 1.0d))).cast("long").as("se_milli"))
  }

  val bootstrapCiSql: String =
    """WITH reps AS (
      |  SELECT b,
      |         CAST(round(10.0 * CAST(sum(CAST(w AS HUGEINT) * cents) AS DOUBLE)
      |           / sum(w)) AS BIGINT) AS m_milli
      |  FROM (
      |    SELECT cents, b,
      |           CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
      |                WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
      |                WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
      |                WHEN u < 4294609777 THEN 6 WHEN u < 4294923276 THEN 7
      |                ELSE 8 END AS w
      |    FROM (
      |      SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents, b,
      |             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':'
      |               || CAST(b AS VARCHAR)), 1, 8))::BIGINT AS u
      |      FROM orders, (SELECT unnest(range(64)) AS b)))
      |  GROUP BY b),
      |ranked AS (
      |  SELECT m_milli, row_number() OVER (ORDER BY m_milli, b) AS rn FROM reps),
      |stats AS (
      |  SELECT count(*) AS b_reps,
      |         max(CASE WHEN rn = 2 THEN m_milli END) AS lo_milli,
      |         max(CASE WHEN rn = 63 THEN m_milli END) AS hi_milli,
      |         sum(m_milli) AS sm,
      |         sum(CAST(m_milli AS HUGEINT) * m_milli) AS smm
      |  FROM ranked),
      |pt AS (
      |  SELECT count(*) AS n,
      |         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS s
      |  FROM orders)
      |SELECT CAST(n AS BIGINT) AS n, CAST(b_reps AS BIGINT) AS b_reps,
      |       CAST(round(10.0 * CAST(s AS DOUBLE) / n) AS BIGINT) AS mean_milli,
      |       CAST(lo_milli AS BIGINT) AS lo_milli,
      |       CAST(hi_milli AS BIGINT) AS hi_milli,
      |       CAST(round(sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / b_reps)
      |         / (b_reps - 1.0))) AS BIGINT) AS se_milli
      |FROM pt, stats""".stripMargin

  // ---------------------------------------------------------------
  // Permutation test (hash-relabeled)
  // ---------------------------------------------------------------

  /** PERMUTATION TEST for the click-vs-purchase mean difference —
    * the nonparametric significance check: under H₀ the labels are
    * exchangeable, so B = 64 relabelings rebuild the null
    * distribution of |mean₁ − mean₂|. Distributed twist (the
    * bootstrap's sibling): an exact permutation needs a global
    * shuffle, so each replicate reassigns labels INDEPENDENTLY with
    * P(group1) = n₁/n via the portable md5 hash against the
    * n₁·2³²/n threshold — the binomial approximation to the
    * permutation null, standard at scale, and bit-reproducible with
    * no RNG state. Per-replicate means are exact integer ratios; the
    * p-value is the (1 + #{|d_b| ≥ |d_obs|})/(B+1) add-one form.
    * Scale shape: one observed-stat scan + one ×64 map-side fan-out
    * into a 64-key combinable agg. */
  def permutationTest(spark: SparkSession, dir: String): DataFrame = {
    // spread the pool BEFORE the ×64 replicate fan-out (r15, guide
    // §2.5): the filtered events scan is ONE file split, so the 64×
    // explode + per-(row, b) md5 draw — the op's entire compute — ran
    // in a single task while 31 cores idled. The partition count is
    // EXPLICIT (spark.sql.shuffle.partitions — cluster-configured,
    // not a local constant) because AQE's byte-based coalescing folds
    // a small-byte exchange back to one partition, blind to the 64×
    // compute fan-out above it; an explicit-N repartition is exempt
    // from AQE coalescing by design. Stage-measured 2.3 s single-task
    // → parallel.
    // GATED on measured scan parallelism (r16, VERDICT item 6): the
    // downstream is a global 64-key aggregate that never reuses
    // event_id, so when the scan is already wide this exchange is a
    // pure extra shuffle — skipped.
    val pool = graft.api.Graft.spreadIfNarrow(
      Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), (col("event_type") === "click").as("g1"),
          round(col("value") * 100.0d).cast("long").as("cents")),
      col("event_id"))
    val obs = pool.agg(
      sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("g1"), col("cents")).otherwise(0L)).as("s1"),
      sum(when(!col("g1"), 1L).otherwise(0L)).as("n2"),
      sum(when(!col("g1"), col("cents")).otherwise(0L)).as("s2"))
    def d(c: Column) = c.cast("double")
    // threshold u < n1 * 2^32 / n. r14 shape compared per ROW on
    // DECIMAL (dec(u)·n < dec(n1)·2³² — overflow-safe but ~2 decimal
    // multiplies per (row, b), stage-measured as the op's dominant
    // cost). r15: fold the whole right side into ONE long threshold in
    // the broadcast obs row — for positive integers, u·n < N ⟺
    // u ≤ (N−1) div n, and the integral divide runs on DECIMAL once
    // per invocation (its quotient ≤ 2³² always fits the long). The
    // per-row test is then a single long compare; every u decides
    // identically to the decimal form.
    val thrObs = obs.select(col("n1"),
      when(col("n1") === 0L, lit(0L)).otherwise(
        expr("CAST((CAST(n1 AS DECIMAL(38,0)) * 4294967296 - 1) div (n1 + n2) AS BIGINT)")
          + lit(1L)).as("u_thr"))
    val reps = pool.crossJoin(broadcast(thrObs))
      .withColumn("b", explode(sequence(lit(0L), lit(63L))))
      .withColumn("u", graft.api.Graft.idHash(
        concat(col("event_id").cast("string"), lit(":"), col("b").cast("string"))))
      .withColumn("r1", col("u") < col("u_thr"))
      .groupBy(col("b"))
      .agg(sum(when(col("r1"), 1L).otherwise(0L)).as("m1"),
        sum(when(col("r1"), col("cents")).otherwise(0L)).as("t1"),
        sum(when(!col("r1"), 1L).otherwise(0L)).as("m2"),
        sum(when(!col("r1"), col("cents")).otherwise(0L)).as("t2"))
      .filter(col("m1") > 0L && col("m2") > 0L)
      .select(col("b"),
        abs(d(col("t1")) / d(col("m1")) - d(col("t2")) / d(col("m2"))).as("dabs"))
    val dObs = abs(d(col("s1")) / d(col("n1")) - d(col("s2")) / d(col("n2")))
    reps.crossJoin(broadcast(obs))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        count(lit(1)).as("b_reps"),
        max(round(lit(10.0d) * dObs).cast("long")).as("d_obs_milli"),
        sum(when(col("dabs") >= dObs, 1L).otherwise(0L)).as("n_ge"))
      .select(col("n1"), col("n2"), col("b_reps"), col("d_obs_milli"), col("n_ge"),
        round(lit(1e6) * (d(col("n_ge")) + 1.0d) / (d(col("b_reps")) + 1.0d))
          .cast("long").as("p_ppm"))
  }

  val permutationTestSql: String =
    """WITH pool AS (
      |  SELECT event_id, event_type = 'click' AS g1,
      |         CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |obs AS (
      |  SELECT count(*) FILTER (WHERE g1) AS n1,
      |         coalesce(sum(cents) FILTER (WHERE g1), 0) AS s1,
      |         count(*) FILTER (WHERE NOT g1) AS n2,
      |         coalesce(sum(cents) FILTER (WHERE NOT g1), 0) AS s2
      |  FROM pool),
      |reps AS (
      |  SELECT b,
      |         abs(CAST(sum(cents) FILTER (WHERE r1) AS DOUBLE)
      |               / count(*) FILTER (WHERE r1)
      |           - CAST(sum(cents) FILTER (WHERE NOT r1) AS DOUBLE)
      |               / count(*) FILTER (WHERE NOT r1)) AS dabs,
      |         count(*) FILTER (WHERE r1) AS m1,
      |         count(*) FILTER (WHERE NOT r1) AS m2
      |  FROM (
      |    SELECT p.cents, v.b,
      |           CAST(('0x' || substring(md5(CAST(p.event_id AS VARCHAR) || ':'
      |             || CAST(v.b AS VARCHAR)), 1, 8))::BIGINT AS HUGEINT) * (o.n1 + o.n2)
      |             < CAST(o.n1 AS HUGEINT) * 4294967296 AS r1
      |    FROM pool p, (SELECT unnest(range(64)) AS b) v, obs o)
      |  GROUP BY b),
      |d AS (
      |  SELECT abs(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) AS d_obs,
      |         n1, n2
      |  FROM obs)
      |SELECT CAST(d.n1 AS BIGINT) AS n1, CAST(d.n2 AS BIGINT) AS n2,
      |       CAST(count(*) AS BIGINT) AS b_reps,
      |       CAST(round(10.0 * max(d.d_obs)) AS BIGINT) AS d_obs_milli,
      |       CAST(sum(CASE WHEN r.dabs >= d.d_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
      |       CAST(round(1e6 * (sum(CASE WHEN r.dabs >= d.d_obs THEN 1 ELSE 0 END) + 1.0)
      |            / (count(*) + 1.0)) AS BIGINT) AS p_ppm
      |FROM (SELECT * FROM reps WHERE m1 > 0 AND m2 > 0) r, d
      |GROUP BY d.n1, d.n2""".stripMargin

  // ---------------------------------------------------------------
  // Herfindahl–Hirschman concentration index
  // ---------------------------------------------------------------

  /** HHI MARKET CONCENTRATION per region — the antitrust-standard
    * concentration screen beside [[gini]]'s inequality curve:
    * HHI = Σᵢ sᵢ² over each region's nations' revenue shares
    * (0 = atomized, 1e6 ppm-scale = monopoly; >0.25 is the classic
    * "highly concentrated" line). Each nation's share-squared term is
    * ONE double expression over exact integer cents quantized to ppm
    * BEFORE the ≤|nations|-term sum (the per-term-quantization
    * contract — cross-term float order never matters). The data-sized
    * stage is one map-side-combinable (nation) aggregation of the
    * supplier-side revenue; everything after runs on ≤25 rows. */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * 100.0d)
          .cast("long").as("cents"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey")).agg(sum(col("cents")).as("rev"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
    def d(c: Column) = c.cast("double")
    val regional = revenue.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), sum(col("rev")).as("tot"))
    revenue.join(broadcast(regional), Seq("n_regionkey"))
      .select(col("n_regionkey"), col("n_nations"), col("tot"),
        round(lit(1e6) * (d(col("rev")) / d(col("tot"))) *
          (d(col("rev")) / d(col("tot")))).cast("long").as("term_ppm"),
        round(lit(1e6) * d(col("rev")) / d(col("tot"))).cast("long").as("share_ppm"))
      .groupBy(col("n_regionkey"), col("n_nations"))
      .agg(sum(col("term_ppm")).as("hhi_ppm"), max(col("share_ppm")).as("top_share_ppm"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_nations"),
        col("hhi_ppm"), col("top_share_ppm"),
        (col("hhi_ppm") > 250000L).as("highly_concentrated"))
      .orderBy(col("region"))
  }

  val hhiSql: String =
    """WITH rev AS (
      |  SELECT s.s_nationkey,
      |         sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
      |             AS BIGINT)) AS rev
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1),
      |nat AS (
      |  SELECT n.n_regionkey, r.rev
      |  FROM rev r JOIN nation n ON r.s_nationkey = n.n_nationkey),
      |reg AS (
      |  SELECT n_regionkey, count(*) AS n_nations, sum(rev) AS tot
      |  FROM nat GROUP BY 1),
      |terms AS (
      |  SELECT nat.n_regionkey, reg.n_nations,
      |         CAST(round(1e6 * (CAST(nat.rev AS DOUBLE) / reg.tot)
      |              * (CAST(nat.rev AS DOUBLE) / reg.tot)) AS BIGINT) AS term_ppm,
      |         CAST(round(1e6 * CAST(nat.rev AS DOUBLE) / reg.tot) AS BIGINT) AS share_ppm
      |  FROM nat JOIN reg ON nat.n_regionkey = reg.n_regionkey)
      |SELECT r.r_name AS region, CAST(t.n_nations AS BIGINT) AS n_nations,
      |       CAST(sum(t.term_ppm) AS BIGINT) AS hhi_ppm,
      |       CAST(max(t.share_ppm) AS BIGINT) AS top_share_ppm,
      |       sum(t.term_ppm) > 250000 AS highly_concentrated
      |FROM terms t JOIN region r ON t.n_regionkey = r.r_regionkey
      |GROUP BY 1, 2 ORDER BY region""".stripMargin

  // ---------------------------------------------------------------
  // Distribution-free median confidence interval
  // ---------------------------------------------------------------

  /** ORDER-STATISTIC MEDIAN CI — the distribution-free 95% interval
    * for the median (the bootstrap's exact classical sibling): by the
    * binomial argument, (x₍ₗ₎, x₍ᵤ₎) with l = ⌈n/2 − 0.98√n⌉ and
    * u = ⌈n/2 + 0.98√n⌉ covers the median with ≥95% probability for
    * ANY distribution. All three order statistics (l, lower median,
    * u) resolve through the VALUE HISTOGRAM's cumulative counts — one
    * compact-key agg + one bounded ordered scan, never a data-sized
    * sort (the weighted-median discipline). The rank bounds are one
    * double expression on the exact integer n, identical in both
    * engines. */
  def medianCi(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100.0d).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    val tot = hist.agg(sum(col("c")).as("n"))
    val ranked = hist.crossJoin(broadcast(tot))
      .withColumn("cc", sum(col("c")).over(cum))
      .withColumn("l_rank", ceil(d(col("n")) / 2.0d - lit(0.98d) * sqrt(d(col("n")))).cast("long"))
      .withColumn("m_rank", expr("(n + 1) div 2"))
      .withColumn("u_rank", ceil(d(col("n")) / 2.0d + lit(0.98d) * sqrt(d(col("n")))).cast("long"))
    ranked.agg(
      max(col("n")).as("n"),
      max(col("l_rank")).as("l_rank"), max(col("u_rank")).as("u_rank"),
      min(when(col("cc") >= col("l_rank"), col("v"))).as("lo_cents"),
      min(when(col("cc") >= col("m_rank"), col("v"))).as("median_cents"),
      min(when(col("cc") >= col("u_rank"), col("v"))).as("hi_cents"))
  }

  val medianCiSql: String =
    """WITH hist AS (
      |  SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS v, count(*) AS c
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT sum(c) AS n FROM hist),
      |ranked AS (
      |  SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc,
      |         t.n,
      |         CAST(ceil(CAST(t.n AS DOUBLE) / 2.0 - 0.98 * sqrt(CAST(t.n AS DOUBLE))) AS BIGINT) AS l_rank,
      |         (t.n + 1) // 2 AS m_rank,
      |         CAST(ceil(CAST(t.n AS DOUBLE) / 2.0 + 0.98 * sqrt(CAST(t.n AS DOUBLE))) AS BIGINT) AS u_rank
      |  FROM hist, tot t)
      |SELECT CAST(max(n) AS BIGINT) AS n,
      |       CAST(max(l_rank) AS BIGINT) AS l_rank,
      |       CAST(max(u_rank) AS BIGINT) AS u_rank,
      |       CAST(min(CASE WHEN cc >= l_rank THEN v END) AS BIGINT) AS lo_cents,
      |       CAST(min(CASE WHEN cc >= m_rank THEN v END) AS BIGINT) AS median_cents,
      |       CAST(min(CASE WHEN cc >= u_rank THEN v END) AS BIGINT) AS hi_cents
      |FROM ranked""".stripMargin

  // ---------------------------------------------------------------
  // Spearman rank correlation (midranks from value histograms)
  // ---------------------------------------------------------------

  /** SPEARMAN rank correlation between quantity and discount — the
    * monotone-association screen that survives outliers and
    * nonlinearity (does bigger volume actually buy a deeper
    * discount?). ρ = Pearson over MIDRANKS (the tie-correct form),
    * and the r11 point is HOW the ranks are computed: never by a
    * global sort. A value's midrank is a pure function of its
    * histogram position — 2·midrank = 2·cum_before + count + 1, an
    * exact integer — so both variables rank through their compact
    * value histograms (quantity: ≤50 keys; discount pct: ≤11), the
    * doubled ranks broadcast-join back, and the five moment sums ride
    * DECIMAL(38,0)/HUGEINT (the 2× scale cancels in ρ). One double
    * expression at the end; overflow horizon n ≈ 10¹² rows (n·Σxy <
    * 10³⁸), same class as [[gini]]'s documented bound. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(spark, dir)
      .select(round(col("l_quantity")).cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("y"))
    def midranks(v: String, out: String): DataFrame = {
      val cum = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rows.groupBy(col(v)).agg(count(lit(1)).as("c"))
        .withColumn("cumc", sum(col("c")).over(cum))
        .select(col(v), (lit(2) * (col("cumc") - col("c")) + col("c") + lit(1)).as(out))
    }
    val m = rows
      .join(broadcast(midranks("x", "rx2")), "x")
      .join(broadcast(midranks("y", "ry2")), "y")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("rx2"))).as("sx"), sum(dec(col("ry2"))).as("sy"),
        sum(dec(col("rx2")) * col("ry2")).as("sxy"),
        sum(dec(col("rx2")) * col("rx2")).as("sxx"),
        sum(dec(col("ry2")) * col("ry2")).as("syy"))
    m.select(col("n"),
      round(lit(1e6) *
        (dec(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
        sqrt((dec(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double") *
          (dec(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")))
        .cast("long").as("rho_ppm"))
  }

  val spearmanSql: String =
    """WITH rows_ AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
      |         CAST(round(l_discount * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |mrx AS (
      |  SELECT x, 2 * (sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS rx2
      |  FROM (SELECT x, count(*) AS c FROM rows_ GROUP BY 1)),
      |mry AS (
      |  SELECT y, 2 * (sum(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS ry2
      |  FROM (SELECT y, count(*) AS c FROM rows_ GROUP BY 1)),
      |m AS (
      |  SELECT count(*) AS n,
      |         sum(CAST(rx2 AS HUGEINT)) AS sx, sum(CAST(ry2 AS HUGEINT)) AS sy,
      |         sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy,
      |         sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
      |         sum(CAST(ry2 AS HUGEINT) * ry2) AS syy
      |  FROM rows_ JOIN mrx USING (x) JOIN mry USING (y))
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(round(1e6 * CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
      |         / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
      |              * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))) AS BIGINT) AS rho_ppm
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // Kendall tau-b (concordance from the 2-D cell table)
  // ---------------------------------------------------------------

  /** KENDALL τ-b over the same (quantity, discount) pair — the
    * concordance-based sibling of [[spearman]] (τ weighs pair
    * ORDERINGS, not rank magnitudes; the two disagreeing flags
    * heteroskedastic association). Naively O(n²) pairs; here the
    * whole statistic folds over the 2-D CELL TABLE: concordant mass
    * C = Σ c_a·c_b over cell pairs with both coordinates increasing,
    * discordant D with coordinates opposed, tie masses from the
    * marginal totals — the cell self-join is |cells|² ≤ (51·11)²
    * comparisons, a broadcast nested-loop over a domain-BOUNDED
    * aggregate (never row-sized). τ_b = (C−D)/√((n₀−n₁)(n₀−n₂)),
    * every term an exact DECIMAL(38,0)/HUGEINT. Output bound: the
    * headline tau_b_ppm is computed FROM the decimal columns and is
    * exact at any n; the diagnostic concordant/discordant columns are
    * cast to LONG for the oracle's dtype contract (DuckDB's pandas
    * bridge floats HUGEINT/DECIMAL), which saturates at C≈9.2e18
    * pairs ⇒ n≈6e9 rows — past that, drop the two diagnostic columns
    * (or emit them pre-divided) rather than widening the type. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .select(round(col("l_quantity")).cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val cd = cells.join(broadcast(b), col("xb") > col("x"))
      .agg(
        sum(when(col("yb") > col("y"), dec(col("c")) * col("cb")).otherwise(lit(0)))
          .as("concordant"),
        sum(when(col("yb") < col("y"), dec(col("c")) * col("cb")).otherwise(lit(0)))
          .as("discordant"))
    val margins = cells.agg(
      sum(col("c")).as("n"),
      sum(dec(col("c")) * (col("c") - lit(1))).as("txy2"))
    val tx = cells.groupBy(col("x")).agg(sum(col("c")).as("t"))
      .agg(sum(dec(col("t")) * (col("t") - lit(1))).as("tx2"))
    val ty = cells.groupBy(col("y")).agg(sum(col("c")).as("t"))
      .agg(sum(dec(col("t")) * (col("t") - lit(1))).as("ty2"))
    // doubled pair masses keep everything integral: n0_2 = n(n−1),
    // n1_2 = Σ tx(tx−1), n2_2 = Σ ty(ty−1); the 2s cancel in τ
    cd.crossJoin(broadcast(margins)).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"),
        col("concordant").cast("long").as("concordant"),
        col("discordant").cast("long").as("discordant"),
        round(lit(1e6) *
          (col("concordant") - col("discordant")).cast("double") * 2d /
          sqrt((dec(col("n")) * (col("n") - lit(1)) - col("tx2")).cast("double") *
            (dec(col("n")) * (col("n") - lit(1)) - col("ty2")).cast("double")))
          .cast("long").as("tau_b_ppm"))
  }

  val kendallTauSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
      |         CAST(round(l_discount * 100) AS BIGINT) AS y, count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cd AS (
      |  SELECT coalesce(sum(CASE WHEN b.y > a.y THEN CAST(a.c AS HUGEINT) * b.c END), 0)
      |           AS concordant,
      |         coalesce(sum(CASE WHEN b.y < a.y THEN CAST(a.c AS HUGEINT) * b.c END), 0)
      |           AS discordant
      |  FROM cells a JOIN cells b ON b.x > a.x),
      |m AS (SELECT sum(c) AS n FROM cells),
      |tx AS (SELECT sum(CAST(t AS HUGEINT) * (t - 1)) AS tx2
      |       FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
      |ty AS (SELECT sum(CAST(t AS HUGEINT) * (t - 1)) AS ty2
      |       FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(concordant AS BIGINT) AS concordant,
      |       CAST(discordant AS BIGINT) AS discordant,
      |       CAST(round(1e6 * CAST(concordant - discordant AS DOUBLE) * 2
      |         / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - tx2 AS DOUBLE)
      |              * CAST(CAST(n AS HUGEINT) * (n - 1) - ty2 AS DOUBLE))) AS BIGINT)
      |         AS tau_b_ppm
      |FROM cd, m, tx, ty""".stripMargin

  // ---------------------------------------------------------------
  // Cochran–Armitage trend test
  // ---------------------------------------------------------------

  /** COCHRAN–ARMITAGE trend test — "does purchase propensity rise
    * monotonically across the day?": ordered dose levels (the six
    * 4-hour day buckets, weights 0..5) against a binary outcome
    * (event is a purchase). The χ²-style statistic
    * z² = N·(N·Σwᵢrᵢ − R·Σwᵢnᵢ)² / (R·(N−R)·(N·Σwᵢ²nᵢ − (Σwᵢnᵢ)²))
    * detects a LINEAR-in-dose trend that the omnibus chi² dilutes
    * across levels. One compact 6-cell aggregation; every sum is an
    * exact integer, products in DECIMAL(38,0)/HUGEINT, one double
    * division quantized to micro. */
  def trendTest(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(expr("CAST(hour(ts) AS BIGINT) div 4").as("w"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("r"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_i"), sum(col("r")).as("r_i"))
    val m = cells.agg(
      sum(col("n_i")).as("n"), sum(col("r_i")).as("r"),
      sum(dec(col("w")) * col("r_i")).as("swr"),
      sum(dec(col("w")) * col("n_i")).as("swn"),
      sum(dec(col("w")) * col("w") * col("n_i")).as("swwn"))
    m.select(col("n"), col("r"),
      round(lit(1e6) *
        dec(col("n")).cast("double") *
        (dec(col("n")) * col("swr") - dec(col("r")) * col("swn")).cast("double") *
        (dec(col("n")) * col("swr") - dec(col("r")) * col("swn")).cast("double") /
        ((dec(col("r")) * (col("n") - col("r"))).cast("double") *
          (dec(col("n")) * col("swwn") - col("swn") * col("swn")).cast("double")))
        .cast("long").as("z2_micro"))
  }

  val trendTestSql: String =
    """WITH cells AS (
      |  SELECT CAST(hour(ts) AS BIGINT) // 4 AS w, count(*) AS n_i,
      |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r_i
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT sum(n_i) AS n, sum(r_i) AS r,
      |         sum(CAST(w AS HUGEINT) * r_i) AS swr,
      |         sum(CAST(w AS HUGEINT) * n_i) AS swn,
      |         sum(CAST(w AS HUGEINT) * w * n_i) AS swwn
      |  FROM cells)
      |SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
      |       CAST(round(1e6 * CAST(n AS DOUBLE)
      |         * CAST(CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn AS DOUBLE)
      |         * CAST(CAST(n AS HUGEINT) * swr - CAST(r AS HUGEINT) * swn AS DOUBLE)
      |         / (CAST(CAST(r AS HUGEINT) * (n - r) AS DOUBLE)
      |            * CAST(CAST(n AS HUGEINT) * swwn - swn * swn AS DOUBLE))) AS BIGINT)
      |         AS z2_micro
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // Benjamini–Hochberg FDR screen over per-type permutation tests
  // ---------------------------------------------------------------

  /** BENJAMINI–HOCHBERG FDR screen — the multiple-testing correction
    * every per-segment metric sweep needs (test 5 event types at
    * α = 0.1 each and the family-wise false-positive rate is ~40%):
    * which event types' mean values deviate from the pool, with the
    * false-discovery rate controlled at α = 0.1?
    *
    * p-values are PERMUTATION p-values, so the whole procedure stays
    * exact-rational with no normal-CDF transcendental to cross
    * engines: B = 64 replicates each re-deal every event a
    * pseudo-type by inverse-CDF over the observed type frequencies
    * (the portable md5 hash u against cumulative thresholds — the
    * [[permutationTest]] contract generalized from binary to
    * multinomial), one ×64 map-side fan-out into a (B × types)-key
    * combinable agg rebuilds the null of every type's
    * |mean_t − mean_rest| SIMULTANEOUSLY (total N and total cents are
    * label-invariant, so mean_rest needs no second pass). Then
    * p_t = (1 + #{b : d_b,t ≥ d_obs,t})/(B_t+1) — B_t counted PER
    * TYPE, because the degenerate-replicate filter (m_t ∈ (0, n)) can
    * drop replicates for a type — and the BH step-up p_(k) ≤ k·α/m
    * ranks and thresholds on the NORMALIZED p-value, clearing
    * denominators by cross-multiplication into pure integers:
    * 10·m·(n_ge+1) ≤ k·(B_t+1) at α = 0.1. Rejected = rank ≤ max
    * passing k — the step-up, not step-down, rule. Everything after
    * the fan-out runs on ≤ B·m rows. */
  def bhFdr(spark: SparkSession, dir: String): DataFrame = {
    val pool = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100.0d).cast("long").as("cents"))
    val perType = pool.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"), sum(col("cents")).as("s_t"))
    val cumW = Window.orderBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = perType
      .withColumn("hi", sum(col("n_t")).over(cumW))
      .withColumn("lo", col("hi") - col("n_t"))
      .withColumn("n", sum(col("n_t")).over(Window.partitionBy()))
      .withColumn("s", sum(col("s_t")).over(Window.partitionBy()))
      .select(col("event_type").as("ptype"), col("lo"), col("hi"),
        col("n"), col("s"))
    def dStat(mt: Column, st: Column, n: Column, s: Column): Column =
      abs(st.cast("double") / mt.cast("double") -
        (s - st).cast("double") / (n - mt).cast("double"))
    // one fan-out, every type's null at once: pseudo-type of (row, b)
    // is the threshold interval holding u·N. The interval test
    // u·N ∈ [lo·2³², hi·2³²) is equivalent to u < ⌈hi·2³²/N⌉ on
    // integers, so the ≤|types| cut points collapse to exact LONG
    // literals computed once on the driver (a bounded model artifact,
    // like every broadcast centroid table in the engine) and the
    // assignment is a pure codegen CASE chain — the first cut's
    // broadcast range-join planned a BroadcastNestedLoopJoin with
    // DECIMAL arithmetic per (row, type) and measured 16.6 s at
    // sf0.1 for what is a map-side expression.
    val cuts: Seq[(String, Long)] = thr
      .select(col("ptype"), col("hi"), col("n")).orderBy(col("ptype"))
      .collect().map { r =>
        val hi = BigInt(r.getAs[Long]("hi")); val n = BigInt(r.getAs[Long]("n"))
        (r.getAs[String]("ptype"), ((hi * BigInt(4294967296L) + n - 1) / n).toLong)
      }.toSeq
    val assign = cuts.init.foldRight(lit(cuts.last._1)) {
      case ((t, cutHi), rest) => when(col("u") < cutHi, t).otherwise(rest)
    }
    val nTot = pool.groupBy().agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    // double hashing (the Kirsch–Mitzenmacher Bloom-filter trick):
    // TWO md5s per row, the 64 replicate draws derived as
    // u_b = (h1 + b·h2) mod 2³² — portable integer arithmetic both
    // engines, and 64× fewer md5 evaluations than hashing
    // (event_id : b) per replicate (measured 6.4 s → the md5 was the
    // whole cost once the BNLJ was gone)
    val reps = pool
      .withColumn("h1", graft.api.Graft.idHash(
        concat(col("event_id").cast("string"), lit(":a"))))
      .withColumn("h2", graft.api.Graft.idHash(
        concat(col("event_id").cast("string"), lit(":b"))))
      .withColumn("b", explode(sequence(lit(0L), lit(63L))))
      .withColumn("u", pmod(col("h1") + col("b") * col("h2"), lit(4294967296L)))
      .withColumn("ptype", assign)
      .groupBy(col("b"), col("ptype"))
      .agg(count(lit(1)).as("m_t"), sum(col("cents")).as("st_b"))
      .crossJoin(broadcast(nTot))
      .filter(col("m_t") > 0L && col("m_t") < col("n"))
      .select(col("b"), col("ptype"),
        dStat(col("m_t"), col("st_b"), col("n"), col("s")).as("d_b"))
    val obs = perType.crossJoin(broadcast(thr.agg(
        max(col("n")).as("n"), max(col("s")).as("s"))))
      .select(col("event_type"), col("n_t"),
        dStat(col("n_t"), col("s_t"), col("n"), col("s")).as("d_obs"))
    val pvals = obs.join(reps, col("ptype") === col("event_type"), "left")
      .groupBy(col("event_type"))
      .agg(max(col("n_t")).as("n_t"),
        max(round(lit(10.0d) * col("d_obs")).cast("long")).as("d_obs_milli"),
        count(col("b")).as("b_reps"),
        sum(when(col("d_b") >= col("d_obs"), 1L).otherwise(0L)).as("n_ge"))
    // rank by the NORMALIZED p-value (n_ge+1)/(b_reps+1): b_reps can
    // differ per type when the degenerate-replicate filter drops some,
    // so raw n_ge order would disagree with the reported p_ppm. Both
    // engines compute the same IEEE-754 quotient from the same small
    // integers, so the order is portable; event_type breaks ties.
    val pNorm = (col("n_ge").cast("double") + 1d) /
      (col("b_reps").cast("double") + 1d)
    val wRank = Window.orderBy(pNorm, col("event_type"))
    pvals
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("p_rank", row_number().over(wRank).cast("long"))
      // BH step-up at α = 0.1: p_(k) ≤ k·α/m ⇔ 10m(n_ge+1) ≤ k(b_reps+1)
      .withColumn("pass",
        lit(10L) * col("m") * (col("n_ge") + 1L) <=
          col("p_rank") * (col("b_reps") + 1L))
      .withColumn("k_star",
        max(when(col("pass"), col("p_rank")).otherwise(lit(0L)))
          .over(Window.partitionBy()))
      .select(col("event_type"), col("n_t"), col("d_obs_milli"),
        col("b_reps"), col("n_ge"),
        round(lit(1e6) * (col("n_ge").cast("double") + 1d) /
          (col("b_reps").cast("double") + 1d)).cast("long").as("p_ppm"),
        col("p_rank"), (col("p_rank") <= col("k_star")).as("rejected"))
      .orderBy(col("p_rank"))
  }

  val bhFdrSql: String =
    """WITH pool AS (
      |  SELECT event_id, event_type, CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events),
      |pt AS (
      |  SELECT event_type, count(*) AS n_t, sum(cents) AS s_t
      |  FROM pool GROUP BY 1),
      |thr AS (
      |  SELECT event_type AS ptype, n_t, s_t,
      |         sum(n_t) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING) - n_t AS lo,
      |         sum(n_t) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING) AS hi,
      |         sum(n_t) OVER () AS n, sum(s_t) OVER () AS s
      |  FROM pt),
      |reps AS (
      |  SELECT b, ptype,
      |         abs(CAST(sum(cents) AS DOUBLE) / count(*)
      |           - CAST(max(s) - sum(cents) AS DOUBLE) / (max(n) - count(*))) AS d_b,
      |         count(*) AS m_t, max(n) AS n
      |  FROM (
      |    SELECT h.cents, h.b, t.ptype, t.n, t.s
      |    FROM (
      |      SELECT p.cents, v.b,
      |             (('0x' || substring(md5(CAST(p.event_id AS VARCHAR) || ':a'), 1, 8))::BIGINT
      |              + v.b * ('0x' || substring(md5(CAST(p.event_id AS VARCHAR) || ':b'), 1, 8))::BIGINT)
      |              % 4294967296 AS u
      |      FROM pool p, (SELECT unnest(range(64)) AS b) v) h, thr t
      |    WHERE CAST(h.u AS HUGEINT) * t.n >= CAST(t.lo AS HUGEINT) * 4294967296
      |      AND CAST(h.u AS HUGEINT) * t.n < CAST(t.hi AS HUGEINT) * 4294967296)
      |  GROUP BY 1, 2
      |  HAVING count(*) > 0 AND count(*) < max(n)),
      |obs AS (
      |  SELECT t.ptype AS event_type, t.n_t,
      |         abs(CAST(t.s_t AS DOUBLE) / t.n_t
      |           - CAST(t.s - t.s_t AS DOUBLE) / (t.n - t.n_t)) AS d_obs
      |  FROM thr t),
      |pv AS (
      |  SELECT o.event_type, max(o.n_t) AS n_t,
      |         CAST(round(10.0 * max(o.d_obs)) AS BIGINT) AS d_obs_milli,
      |         count(r.b) AS b_reps,
      |         sum(CASE WHEN r.d_b >= o.d_obs THEN 1 ELSE 0 END) AS n_ge
      |  FROM obs o LEFT JOIN reps r ON r.ptype = o.event_type
      |  GROUP BY 1),
      |ranked AS (
      |  SELECT *, count(*) OVER () AS m,
      |         CAST(row_number() OVER (
      |           ORDER BY (n_ge + 1.0) / (b_reps + 1.0), event_type) AS BIGINT) AS p_rank
      |  FROM pv),
      |flagged AS (
      |  SELECT *, 10 * m * (n_ge + 1) <= p_rank * (b_reps + 1) AS pass FROM ranked),
      |k AS (SELECT coalesce(max(CASE WHEN pass THEN p_rank END), 0) AS k_star FROM flagged)
      |SELECT event_type, CAST(n_t AS BIGINT) AS n_t, d_obs_milli,
      |       CAST(b_reps AS BIGINT) AS b_reps, CAST(n_ge AS BIGINT) AS n_ge,
      |       CAST(round(1e6 * (n_ge + 1.0) / (b_reps + 1.0)) AS BIGINT) AS p_ppm,
      |       p_rank, p_rank <= k_star AS rejected
      |FROM flagged, k ORDER BY p_rank""".stripMargin

  // ---------------------------------------------------------------
  // A/B power analysis (required sample size)
  // ---------------------------------------------------------------

  /** POWER ANALYSIS — "how many orders per arm must the experiment
    * collect?": the two-sample sample-size formula
    * n = ⌈(z_{α/2}+z_β)²·2σ²/δ²⌉ at α = 0.05, power 80%
    * (z = 1.96, 0.8416 — fixed literals, identical on both engines),
    * for a minimum detectable effect of 2% of the mean order value
    * (δ quantized to exact integer cents). σ² comes from the exact
    * integer moment sums (Σcents, Σcents² on DECIMAL(38,0)/HUGEINT);
    * the one ceil runs on the same double both sides. The planning
    * companion to [[permutationTest]]'s post-hoc answer. */
  def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n"),
      sum(round(col("o_totalprice") * 100).cast("long")).as("s"),
      sum(dec(round(col("o_totalprice") * 100).cast("long")) *
        round(col("o_totalprice") * 100).cast("long")).as("ss"))
    def d(c: Column) = c.cast("double")
    val variance = (d(col("ss")) - d(col("s")) * d(col("s")) / d(col("n"))) /
      (d(col("n")) - 1d)
    val deltaCents = round(lit(0.02d) * d(col("s")) / d(col("n"))).cast("long")
    m.select(col("n"),
        round(d(col("s")) / d(col("n"))).cast("long").as("mean_cents"),
        round(lit(1000d) * sqrt(variance)).cast("long").as("sd_milli"),
        deltaCents.as("delta_cents"),
        ceil(lit((1.96d + 0.8416d) * (1.96d + 0.8416d)) * lit(2d) * variance /
          (d(deltaCents) * d(deltaCents))).cast("long").as("n_per_arm"))
  }

  val powerAnalysisSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s,
      |         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
      |             * CAST(round(o_totalprice * 100) AS BIGINT)) AS ss
      |  FROM orders),
      |v AS (
      |  SELECT n, s,
      |         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_,
      |         CAST(round(0.02 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
      |           AS delta_cents
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS mean_cents,
      |       CAST(round(1000.0 * sqrt(var_)) AS BIGINT) AS sd_milli,
      |       delta_cents,
      |       CAST(ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2.0 * var_
      |            / (CAST(delta_cents AS DOUBLE) * CAST(delta_cents AS DOUBLE)))
      |            AS BIGINT) AS n_per_arm
      |FROM v""".stripMargin

  // ---------------------------------------------------------------
  // Jarque–Bera normality test
  // ---------------------------------------------------------------

  /** JARQUE–BERA normality test per market segment — "is this
    * segment's balance distribution Gaussian enough for the z-based
    * screens upstream?" JB = n/6·(S² + (K−3)²/4) from sample skewness
    * S and kurtosis K. The 4th-power moment is the overflow trap the
    * DECIMAL(38,0) discipline alone cannot fix: raw cents⁴ ≈ 1e28 per
    * row wraps a 38-digit accumulator past ~1e10 rows. So moments are
    * PIVOT-CENTERED in a two-pass plan: pass 1 takes each group's
    * exact integer mean floor (clamped at 0 so trunc-vs-floor division
    * on a negative sum can never split the engines), pass 2 sums
    * integer deviations d, d², d³, d⁴ — |d| is bounded by the VALUE
    * RANGE (~1e6 cents), so d⁴·rows ≈ 1e24·1e12 = 1e36 < 1e38 at any
    * corpus size. Central moments then shift from pivot to mean with
    * the standard δ-expansion in ONE double expression, identical
    * text in both engines; S uses m₂·√m₂ (sqrt is IEEE-exact), never
    * pow(). Scale: two map-side-combinable segment aggs + a broadcast
    * pivot join — no window, no sort. */
  def jarqueBera(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100.0d).cast("long").as("cents"))
    val piv = base.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .select(col("seg"), col("n"), greatest(lit(0L), expr("s div n")).as("pivot"))
    def d(c: Column) = c.cast("double")
    base.join(broadcast(piv), Seq("seg"))
      .withColumn("dv", col("cents") - col("pivot"))
      .withColumn("d2", col("dv") * col("dv"))
      .groupBy(col("seg"))
      .agg(first(col("n")).as("n"), first(col("pivot")).as("pivot"),
        sum(col("dv")).as("s1"),
        sum(dec(col("d2"))).as("s2"),
        sum(dec(col("d2")) * col("dv")).as("s3"),
        sum(dec(col("d2")) * col("d2")).as("s4"))
      .select(col("seg"), col("n"),
        (lit(1.0d) * d(col("s1")) / d(col("n"))).as("delta"),
        col("s2"), col("s3"), col("s4"))
      .select(col("seg"), col("n"),
        (d(col("s2")) / d(col("n")) - col("delta") * col("delta")).as("m2"),
        (d(col("s3")) / d(col("n")) -
          lit(3.0d) * col("delta") * d(col("s2")) / d(col("n")) +
          lit(2.0d) * col("delta") * col("delta") * col("delta")).as("m3"),
        (d(col("s4")) / d(col("n")) -
          lit(4.0d) * col("delta") * d(col("s3")) / d(col("n")) +
          lit(6.0d) * col("delta") * col("delta") * d(col("s2")) / d(col("n")) -
          lit(3.0d) * col("delta") * col("delta") * col("delta") * col("delta"))
          .as("m4"))
      .select(col("seg"), col("n"),
        round(lit(1e6) * col("m3") / (col("m2") * sqrt(col("m2"))))
          .cast("long").as("skew_micro"),
        round(lit(1e6) * col("m4") / (col("m2") * col("m2")))
          .cast("long").as("kurt_micro"),
        round(lit(1e3) * d(col("n")) / lit(6.0d) *
          (col("m3") / (col("m2") * sqrt(col("m2"))) *
            (col("m3") / (col("m2") * sqrt(col("m2")))) +
            (col("m4") / (col("m2") * col("m2")) - lit(3.0d)) *
            (col("m4") / (col("m2") * col("m2")) - lit(3.0d)) / lit(4.0d)))
          .cast("long").as("jb_milli"))
      .orderBy(col("seg"))
  }

  val jarqueBeraSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
      |  FROM customer),
      |piv AS (
      |  SELECT seg, count(*) AS n,
      |         greatest(0, sum(cents) // count(*)) AS pivot
      |  FROM base GROUP BY 1),
      |mom AS (
      |  SELECT b.seg, max(p.n) AS n,
      |         sum(b.cents - p.pivot) AS s1,
      |         sum(CAST((b.cents - p.pivot) * (b.cents - p.pivot) AS HUGEINT)) AS s2,
      |         sum(CAST((b.cents - p.pivot) * (b.cents - p.pivot) AS HUGEINT)
      |             * (b.cents - p.pivot)) AS s3,
      |         sum(CAST((b.cents - p.pivot) * (b.cents - p.pivot) AS HUGEINT)
      |             * ((b.cents - p.pivot) * (b.cents - p.pivot))) AS s4
      |  FROM base b JOIN piv p USING (seg) GROUP BY 1),
      |ctr AS (
      |  SELECT seg, n, 1.0 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS delta,
      |         s2, s3, s4
      |  FROM mom),
      |cm AS (
      |  SELECT seg, n,
      |         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - delta * delta AS m2,
      |         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
      |           - 3.0 * delta * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |           + 2.0 * delta * delta * delta AS m3,
      |         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
      |           - 4.0 * delta * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
      |           + 6.0 * delta * delta * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |           - 3.0 * delta * delta * delta * delta AS m4
      |  FROM ctr)
      |SELECT seg, CAST(n AS BIGINT) AS n,
      |       CAST(round(1e6 * m3 / (m2 * sqrt(m2))) AS BIGINT) AS skew_micro,
      |       CAST(round(1e6 * m4 / (m2 * m2)) AS BIGINT) AS kurt_micro,
      |       CAST(round(1e3 * CAST(n AS DOUBLE) / 6.0
      |            * (m3 / (m2 * sqrt(m2)) * (m3 / (m2 * sqrt(m2)))
      |               + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0))
      |         AS BIGINT) AS jb_milli
      |FROM cm ORDER BY seg""".stripMargin

  // ---------------------------------------------------------------
  // Brown–Forsythe (median-based Levene) variance-homogeneity test
  // ---------------------------------------------------------------

  /** BROWN–FORSYTHE test — "do the segments have equal SPREAD?" — the
    * precondition [[anova]] itself assumes (classic ANOVA is valid
    * under homoscedasticity; this is the screen that earns that
    * assumption, in its median-based robust form). W is the one-way
    * F statistic on z_ij = |x_ij − med_g|. The per-group median runs
    * on the value-HISTOGRAM path (the weighted-median discipline):
    * cumulative counts over the per-segment distinct-cents table give
    * the two middle order statistics, and everything stays integer by
    * working in DOUBLED units — z2 = |2·cents − med2| where med2 =
    * x₍r₁₎ + x₍r₂₎ is an exact BIGINT for odd AND even group sizes
    * (the oracle's interpolated median, doubled, is the same
    * integer). Scale: one compact-key histogram agg, a per-segment
    * window over distinct values only, a broadcast medians join, one
    * moment agg — no data-sized sort anywhere. */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100.0d).cast("long").as("cents"))
    val hist = base.groupBy(col("seg"), col("cents")).agg(count(lit(1)).as("c"))
    val wseg = Window.partitionBy(col("seg")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val meds = hist
      .withColumn("hi", sum(col("c")).over(wseg))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("seg"))))
      .withColumn("r1", expr("(ng + 1) div 2"))
      .withColumn("r2", expr("(ng + 2) div 2"))
      .groupBy(col("seg"))
      .agg(sum(
        when(col("r1") > col("lo") && col("r1") <= col("hi"), col("cents"))
          .otherwise(0L) +
        when(col("r2") > col("lo") && col("r2") <= col("hi"), col("cents"))
          .otherwise(0L)).as("med2"))
    def d(c: Column) = c.cast("double")
    val g = base.join(broadcast(meds), Seq("seg"))
      .withColumn("z2", abs(lit(2L) * col("cents") - col("med2")))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("ng"), sum(col("z2")).as("sg"),
        sum(dec(col("z2")) * col("z2")).as("qg"))
    val tot = g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("s"))
    g.crossJoin(broadcast(tot))
      .select(col("k"), col("n"), col("s"),
        round(lit(1e3) * (d(col("sg")) * d(col("sg")) / d(col("ng")) -
          lit(2.0d) * d(col("sg")) * d(col("s")) / d(col("n")) +
          d(col("ng")) * d(col("s")) * d(col("s")) / (d(col("n")) * d(col("n")))))
          .cast("long").as("ssb_g"),
        round(lit(1e3) * (d(col("qg")) - d(col("sg")) * d(col("sg")) / d(col("ng"))))
          .cast("long").as("ssw_g"))
      .groupBy(col("k"), col("n"))
      .agg(sum(col("ssb_g")).as("ssb_milli"), sum(col("ssw_g")).as("ssw_milli"))
      .select(col("k"), col("n"), col("ssb_milli"), col("ssw_milli"),
        round(lit(1e3) * (d(col("ssb_milli")) / d(col("k") - 1)) /
          (d(col("ssw_milli")) / d(col("n") - col("k")))).cast("long")
          .as("w_milli"))
  }

  val leveneSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS cents
      |  FROM customer),
      |med AS (
      |  SELECT seg, CAST(round(2 * median(cents)) AS BIGINT) AS med2
      |  FROM base GROUP BY 1),
      |g AS (
      |  SELECT b.seg, count(*) AS ng,
      |         sum(abs(2 * b.cents - m.med2)) AS sg,
      |         sum(CAST(abs(2 * b.cents - m.med2) AS HUGEINT)
      |             * abs(2 * b.cents - m.med2)) AS qg
      |  FROM base b JOIN med m USING (seg) GROUP BY 1),
      |tot AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s FROM g),
      |terms AS (
      |  SELECT t.k, t.n,
      |         sum(CAST(round(1e3 * (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng
      |           - 2.0 * CAST(sg AS DOUBLE) * CAST(s AS DOUBLE) / n
      |           + ng * CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS BIGINT)) AS ssb_milli,
      |         sum(CAST(round(1e3 * (CAST(qg AS DOUBLE)
      |           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)) AS BIGINT)) AS ssw_milli
      |  FROM g, tot t GROUP BY 1, 2)
      |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |       CAST(ssb_milli AS BIGINT) AS ssb_milli,
      |       CAST(ssw_milli AS BIGINT) AS ssw_milli,
      |       CAST(round(1e3 * (CAST(ssb_milli AS DOUBLE) / (k - 1)) /
      |            (CAST(ssw_milli AS DOUBLE) / (n - k))) AS BIGINT) AS w_milli
      |FROM terms""".stripMargin

  // ---------------------------------------------------------------
  // Fisher's exact test (2×2)
  // ---------------------------------------------------------------

  /** Exact factorials 0!..20! — the range where Stirling isn't yet
    * at double precision; both engines index the same literal table. */
  private val factTable: Seq[Long] = Seq(1L, 1L, 2L, 6L, 24L, 120L, 720L,
    5040L, 40320L, 362880L, 3628800L, 39916800L, 479001600L, 6227020800L,
    87178291200L, 1307674368000L, 20922789888000L, 355687428096000L,
    6402373705728000L, 121645100408832000L, 2432902008176640000L)

  /** ln(m!) with NO lgamma dependency (Spark has none): exact-table
    * lookup for m ≤ 20, else the 3-term Stirling series for lnΓ(m+1)
    * — relative error < 1e-12 at m ≥ 21, far under the pico
    * quantization. The SAME formula text runs in DuckDB
    * ([[lnFactSql]]); a native lgamma would differ in last ulps. */
  private def lnFact(m: Column): Column = {
    val z = m.cast("double") + lit(1.0d)
    when(m <= 20L,
      log(element_at(typedLit(factTable), (m + lit(1L)).cast("int")).cast("double")))
      .otherwise((z - lit(0.5d)) * log(z) - z + lit(0.9189385332046727d) +
        lit(1.0d) / (lit(12.0d) * z) -
        lit(1.0d) / (lit(360.0d) * z * z * z) +
        lit(1.0d) / (lit(1260.0d) * z * z * z * z * z))
  }

  private def lnFactSql(m: String): String = {
    val z = s"(CAST(($m) AS DOUBLE) + 1.0)"
    s"(CASE WHEN ($m) <= 20 THEN ln(CAST(${factTable.mkString("[", ",", "]")}" +
      s"[CAST(($m) AS BIGINT) + 1] AS DOUBLE)) " +
      s"ELSE ($z - 0.5) * ln($z) - $z + 0.9189385332046727 " +
      s"+ 1.0/(12.0*$z) - 1.0/(360.0*$z*$z*$z) " +
      s"+ 1.0/(1260.0*$z*$z*$z*$z*$z) END)"
  }

  /** FISHER'S EXACT TEST on the 2×2 (lang = en) × (long doc) table —
    * the small-cell-safe sibling of [[Aggregations]]' chi²: when any
    * expected cell is < 5 the χ² approximation lies, and a curation
    * pipeline slicing a rare language hits that constantly. The
    * hypergeometric tail sums run over a spine of candidate tables
    * k — but NOT the full support: the support prunes to μ ± 40σ
    * (everything outside underflows double to exactly 0 in both
    * engines anyway), so the spine is O(σ) = O(√n) rows at ANY
    * corpus size (at 1e12 rows that's ~4e7 — distribute the spine
    * with a ranged source if one explode-task ever matters; here it
    * is a one-row explode). Each table's probability quantizes to
    * pico ONCE (per-term contract) and the two-sided rule
    * p(k) ≤ p(obs) is then an INTEGER compare — no epsilon. ln m!
    * has no lgamma in Spark, so both engines run the identical
    * exact-table + Stirling formula ([[lnFact]]). */
  def fisherExact(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val en = col("lang") === "en"
    val long_ = col("n_chars") >= 500
    val cnt = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(en && long_, 1L).otherwise(0L)).as("a"),
        sum(when(en && !long_, 1L).otherwise(0L)).as("b"),
        sum(when(!en && long_, 1L).otherwise(0L)).as("c"),
        sum(when(!en && !long_, 1L).otherwise(0L)).as("dd"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("r2", col("c") + col("dd"))
      .withColumn("c1", col("a") + col("c"))
      .withColumn("c2", col("b") + col("dd"))
      .withColumn("mu", d(col("r1")) * d(col("c1")) / d(col("n")))
      .withColumn("sigma",
        sqrt(d(col("r1")) * d(col("r2")) * d(col("c1")) * d(col("c2")) /
          (d(col("n")) * d(col("n")) * (d(col("n")) - lit(1.0d)))))
      .withColumn("wlo", greatest(greatest(lit(0L), col("c1") - col("r2")),
        floor(col("mu") - lit(40.0d) * col("sigma") - lit(1.0d)).cast("long")))
      .withColumn("whi", least(least(col("r1"), col("c1")),
        ceil(col("mu") + lit(40.0d) * col("sigma") + lit(1.0d)).cast("long")))
      .withColumn("ln_denom",
        lnFact(col("n")) - lnFact(col("c1")) - lnFact(col("n") - col("c1")))
    def lnP(k: Column): Column =
      lnFact(col("r1")) - lnFact(k) - lnFact(col("r1") - k) +
        lnFact(col("r2")) - lnFact(col("c1") - k) -
        lnFact(col("r2") - col("c1") + k) - col("ln_denom")
    val withObs = cnt.withColumn("p_obs_pico",
      round(lit(1e12) * exp(lnP(col("a")))).cast("long"))
    withObs
      .select(col("*"), explode(sequence(col("wlo"), col("whi"))).as("k"))
      .withColumn("pk_pico", round(lit(1e12) * exp(lnP(col("k")))).cast("long"))
      .groupBy(col("n"), col("a"), col("b"), col("c"), col("dd"),
        col("p_obs_pico"))
      .agg(
        sum(when(col("pk_pico") <= col("p_obs_pico"), col("pk_pico"))
          .otherwise(0L)).as("p_two_pico"),
        sum(when(col("k") <= col("a"), col("pk_pico")).otherwise(0L))
          .as("p_left_pico"),
        sum(when(col("k") >= col("a"), col("pk_pico")).otherwise(0L))
          .as("p_right_pico"))
      .select(col("n"), col("a"), col("b"), col("c"), col("dd"),
        col("p_obs_pico"), col("p_two_pico"), col("p_left_pico"),
        col("p_right_pico"),
        when(col("b") * col("c") > 0L,
          round(lit(1e3) * d(col("a")) * d(col("dd")) /
            (d(col("b")) * d(col("c")))).cast("long")).as("odds_ratio_milli"))
  }

  val fisherExactSql: String = {
    def lnP(k: String): String =
      s"${lnFactSql("r1")} - ${lnFactSql(k)} - ${lnFactSql(s"r1 - ($k)")} " +
        s"+ ${lnFactSql("r2")} - ${lnFactSql(s"c1 - ($k)")} " +
        s"- ${lnFactSql(s"r2 - c1 + ($k)")} - ln_denom"
    s"""WITH cnt AS (
       |  SELECT count(*) AS n,
       |         sum(CASE WHEN lang = 'en' AND n_chars >= 500 THEN 1 ELSE 0 END) AS a,
       |         sum(CASE WHEN lang = 'en' AND n_chars < 500 THEN 1 ELSE 0 END) AS b,
       |         sum(CASE WHEN lang <> 'en' AND n_chars >= 500 THEN 1 ELSE 0 END) AS c,
       |         sum(CASE WHEN lang <> 'en' AND n_chars < 500 THEN 1 ELSE 0 END) AS dd
       |  FROM documents),
       |par AS (
       |  SELECT *, a + b AS r1, c + dd AS r2, a + c AS c1, b + dd AS c2,
       |         CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
       |         sqrt(CAST(a + b AS DOUBLE) * CAST(c + dd AS DOUBLE)
       |              * CAST(a + c AS DOUBLE) * CAST(b + dd AS DOUBLE)
       |              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |                 * (CAST(n AS DOUBLE) - 1.0))) AS sigma
       |  FROM cnt),
       |par2 AS (
       |  SELECT *,
       |         greatest(greatest(0, c1 - r2),
       |                  CAST(floor(mu - 40.0 * sigma - 1.0) AS BIGINT)) AS wlo,
       |         least(least(r1, c1),
       |               CAST(ceil(mu + 40.0 * sigma + 1.0) AS BIGINT)) AS whi,
       |         ${lnFactSql("n")} - ${lnFactSql("c1")} - ${lnFactSql("n - c1")}
       |           AS ln_denom
       |  FROM par),
       |par3 AS (
       |  SELECT *, CAST(round(1e12 * exp(${lnP("a")})) AS BIGINT) AS p_obs_pico
       |  FROM par2),
       |spine AS (
       |  SELECT p.*, unnest(generate_series(CAST(p.wlo AS BIGINT),
       |                                     CAST(p.whi AS BIGINT))) AS k
       |  FROM par3 p),
       |terms AS (
       |  SELECT *, CAST(round(1e12 * exp(${lnP("k")})) AS BIGINT) AS pk_pico
       |  FROM spine)
       |SELECT CAST(n AS BIGINT) AS n, CAST(a AS BIGINT) AS a,
       |       CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
       |       CAST(dd AS BIGINT) AS dd,
       |       CAST(p_obs_pico AS BIGINT) AS p_obs_pico,
       |       CAST(sum(CASE WHEN pk_pico <= p_obs_pico THEN pk_pico ELSE 0 END)
       |         AS BIGINT) AS p_two_pico,
       |       CAST(sum(CASE WHEN k <= a THEN pk_pico ELSE 0 END) AS BIGINT)
       |         AS p_left_pico,
       |       CAST(sum(CASE WHEN k >= a THEN pk_pico ELSE 0 END) AS BIGINT)
       |         AS p_right_pico,
       |       CASE WHEN b * c > 0
       |            THEN CAST(round(1e3 * CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
       |                 / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) AS BIGINT)
       |       END AS odds_ratio_milli
       |FROM terms
       |GROUP BY n, a, b, c, dd, p_obs_pico""".stripMargin
  }

  // ---------------------------------------------------------------
  // Kruskal–Wallis H (k-group rank ANOVA from midrank histograms)
  // ---------------------------------------------------------------

  /** KRUSKAL–WALLIS H — "do the k event types' value distributions
    * differ anywhere?", the k-group generalization of
    * [[mannWhitney]] and the rank-based (outlier-immune) sibling of
    * [[anova]]. Same engine discipline as the whole rank family:
    * ranks are NEVER computed by a global sort — a value's doubled
    * midrank 2r̄ = 2·cum_before + c + 1 is a pure function of its
    * position in the compact cents histogram, so the doubled
    * per-group rank sums R2_g fold map-side over one (cents ×
    * event_type) agg. With doubled ranks,
    * H = 3/(N(N+1)) · Σ_g (R2_g − n_g(N+1))²/n_g, tie-corrected by
    * 1 − Σ(t³−t)/(N³−N). Every mass is DECIMAL(38,0)/HUGEINT exact;
    * each group's H term quantizes to micro ONCE (per-term
    * quantization — no cross-term float order) and the headline is
    * their integer sum. Scale: one compact-key agg + one window over
    * distinct cents + a k-row census. */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("cents"), col("event_type")).agg(count(lit(1)).as("d"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = perVal.groupBy(col("cents")).agg(sum(col("d")).as("c"))
      .withColumn("r0", sum(col("c")).over(cum) - col("c"))
    val groups = perVal.join(runs, "cents")
      .groupBy(col("event_type"))
      .agg(sum(col("d")).as("n_g"),
        sum(dec(col("d")) * (lit(2) * col("r0") + col("c") + lit(1))).as("r2"))
    val tot = runs.agg(sum(col("c")).as("n"),
      sum(dec(col("c")) * col("c") * col("c") - col("c")).as("t3"))
    val dev = col("r2") - dec(col("n_g")) * (col("n") + lit(1))
    groups.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_g"), col("n"), col("t3"),
        round(lit(3e6) * (dev * dev).cast("double") /
          (col("n_g").cast("double") * col("n").cast("double") *
            (col("n").cast("double") + 1d))).cast("long").as("term_micro"))
      .groupBy()
      .agg(count(lit(1)).as("k"), max(col("n")).as("n"),
        sum(col("term_micro")).as("h_micro_raw"), max(col("t3")).as("t3"))
      .select(col("k"), col("n"), (col("k") - 1L).as("df"),
        col("h_micro_raw"),
        // degenerate-slice guard (r12 advice): all values in ONE cents
        // bucket makes T = N³−N (and N=1 makes N³−N = 0) — the tie
        // correction's denominator hits 0 and H is undefined; the
        // documented contract is 0 (no rank variance ⇒ no evidence)
        when(dec(col("n")) * col("n") * col("n") - col("n") > col("t3"),
          round(col("h_micro_raw").cast("double") / lit(1e3) /
            (lit(1d) - col("t3").cast("double") /
              (dec(col("n")) * col("n") * col("n") - col("n")).cast("double")))
            .cast("long")).otherwise(lit(0L)).as("h_tie_corrected_milli"))
  }

  val kruskalWallisSql: String =
    """WITH perval AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |         count(*) AS d
      |  FROM events GROUP BY 1, 2),
      |runs AS (
      |  SELECT cents, c, sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c AS r0
      |  FROM (SELECT cents, sum(d) AS c FROM perval GROUP BY 1)),
      |tot AS (
      |  SELECT sum(c) AS n, sum(CAST(c AS HUGEINT) * c * c - c) AS t3 FROM runs),
      |groups_ AS (
      |  SELECT event_type, sum(d) AS n_g,
      |         sum(CAST(d AS HUGEINT) * (2 * r0 + c + 1)) AS r2
      |  FROM perval JOIN runs USING (cents) GROUP BY 1),
      |terms AS (
      |  SELECT CAST(round(3e6 * CAST((r2 - CAST(n_g AS HUGEINT) * (n + 1))
      |                               * (r2 - CAST(n_g AS HUGEINT) * (n + 1)) AS DOUBLE)
      |           / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)))
      |         AS BIGINT) AS term_micro, n, t3
      |  FROM groups_, tot)
      |SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(n) AS BIGINT) AS n,
      |       CAST(count(*) - 1 AS BIGINT) AS df,
      |       CAST(sum(term_micro) AS BIGINT) AS h_micro_raw,
      |       CASE WHEN CAST(max(n) AS HUGEINT) * max(n) * max(n) - max(n) > max(t3)
      |            THEN CAST(round(CAST(sum(term_micro) AS DOUBLE) / 1e3
      |              / (1 - CAST(max(t3) AS DOUBLE)
      |                   / CAST(CAST(max(n) AS HUGEINT) * max(n) * max(n) - max(n) AS DOUBLE)))
      |              AS BIGINT) ELSE 0 END AS h_tie_corrected_milli
      |FROM terms""".stripMargin

  // ---------------------------------------------------------------
  // Effect sizes: Cliff's delta + Cohen's d
  // ---------------------------------------------------------------

  /** EFFECT SIZES for the click-vs-purchase value gap — the "is the
    * difference big enough to CARE about?" companion to
    * [[mannWhitney]]'s "is it real?": Cliff's δ = (#(x>y) − #(x<y))
    * / (n₁n₂), the distribution-free ordinal effect size, and
    * Cohen's d = (m₁−m₂)/s_pooled, the parametric one — reporting
    * both is standard practice because they disagree exactly when the
    * tails are heavy. δ's pair masses fold WITHOUT a pair join: with
    * both groups' counts on one cents histogram, #(x>y) =
    * Σ_v d₁(v)·cum₂_before(v) — one window pass, exact
    * DECIMAL(38,0)/HUGEINT (the same trick that keeps [[kendallTau]]
    * off the all-pairs path). Cohen's d rides the exact integer
    * moment sums. Scale: one compact-key agg + one window. */
  def effectSizes(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").as("is1"))
      .groupBy(col("cents"))
      .agg(count_if(col("is1")).as("d1"), count_if(!col("is1")).as("d2"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = perVal
      .withColumn("cum2", sum(col("d2")).over(cum))
      .agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"),
        sum(dec(col("d1")) * (col("cum2") - col("d2"))).as("gt"),
        sum(dec(col("d1")) * col("cents")).as("s1"),
        sum(dec(col("d2")) * col("cents")).as("s2"),
        sum(dec(col("d1")) * col("cents") * col("cents")).as("q1"),
        sum(dec(col("d2")) * col("cents") * col("cents")).as("q2"),
        sum(dec(col("d1")) * col("d2")).as("ties_x"))
    // lt = n1·n2 − gt − tied-pairs; tied pairs per value = d1·d2
    def d(c: Column) = c.cast("double")
    val n1n2 = dec(col("n1")) * col("n2")
    val lt = n1n2 - col("gt") - col("ties_x")
    val m1 = d(col("s1")) / d(col("n1"))
    val m2 = d(col("s2")) / d(col("n2"))
    val ss1 = d(col("q1")) - d(col("s1")) * d(col("s1")) / d(col("n1"))
    val ss2 = d(col("q2")) - d(col("s2")) * d(col("s2")) / d(col("n2"))
    val sPool = sqrt((ss1 + ss2) / (d(col("n1")) + d(col("n2")) - 2d))
    m.select(col("n1").as("n_click"), col("n2").as("n_purchase"),
      round(lit(1e6) * (col("gt") - lt).cast("double") / n1n2.cast("double"))
        .cast("long").as("cliffs_delta_ppm"),
      round(lit(1e3) * (m1 - m2) / sPool).cast("long").as("cohens_d_milli"))
  }

  val effectSizesSql: String =
    """WITH v AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type = 'click' AS is1
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |perval AS (
      |  SELECT cents, CAST(count(*) FILTER (WHERE is1) AS BIGINT) AS d1,
      |         CAST(count(*) FILTER (WHERE NOT is1) AS BIGINT) AS d2
      |  FROM v GROUP BY 1),
      |runs AS (
      |  SELECT *, sum(d2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum2
      |  FROM perval),
      |m AS (
      |  SELECT sum(d1) AS n1, sum(d2) AS n2,
      |         sum(CAST(d1 AS HUGEINT) * (cum2 - d2)) AS gt,
      |         sum(CAST(d1 AS HUGEINT) * cents) AS s1,
      |         sum(CAST(d2 AS HUGEINT) * cents) AS s2,
      |         sum(CAST(d1 AS HUGEINT) * cents * cents) AS q1,
      |         sum(CAST(d2 AS HUGEINT) * cents * cents) AS q2,
      |         sum(CAST(d1 AS HUGEINT) * d2) AS ties_x
      |  FROM runs)
      |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
      |       CAST(round(1e6 * CAST(gt - (CAST(n1 AS HUGEINT) * n2 - gt - ties_x)
      |                             AS DOUBLE)
      |             / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE)) AS BIGINT)
      |         AS cliffs_delta_ppm,
      |       CAST(round(1e3 * (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
      |             / sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
      |                     + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2))
      |                    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2)))
      |            AS BIGINT) AS cohens_d_milli
      |FROM m""".stripMargin

  /** ANDERSON–DARLING uniformity test of the id-hash split key — the
    * distribution-level audit of the [[graft.api.Graft.idHash]]
    * contract every hash split/sample in the engine rides on
    * (`corpus_split_hash`, sampling, sharding): A² weights CDF
    * deviations by 1/(F(1−F)), so it catches TAIL clumping that a KS
    * or chi-square census misses. u_i = (idHash(doc_id) mod 2¹⁶ +
    * 0.5)/2¹⁶ tested against U(0,1): A² = −n − S/n with
    * S = Σᵢ (2i−1)·ln uᵢ + (2n−2i+1)·ln(1−uᵢ) over the ASCENDING
    * order statistics.
    *
    * Scale shape: NO global row sort — the order statistics fold into
    * the 2¹⁶-bounded value histogram (the [[HistQuantile]] discipline):
    * a tie run of k rows starting after cumulative count c contributes
    * Σ(2i−1) = 2kc+k² to the ln(u) weight and 2kn−(2kc+k²) to the
    * ln(1−u) weight — closed forms, so one compact-key agg + one
    * bounded-table cumulative window replace the sort. Engine parity:
    * each distinct value's ln(u)/ln(1−u) is quantized ONCE to
    * nano-units, weights are exact integers, the sum is exact decimal
    * — summation order cannot move the statistic. */
  def andersonDarling(spark: SparkSession, dir: String): DataFrame = {
    val m = 65536L
    val hist = Tables.documents(spark, dir)
      .select(pmod(graft.api.Graft.idHash(col("doc_id")), lit(m)).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("k"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = (col("v").cast("double") + lit(0.5d)) / lit(m.toDouble)
    val ranked = hist
      .withColumn("cum", sum(col("k")).over(wCum))
      .withColumn("n", sum(col("k")).over(Window.partitionBy()))
      .withColumn("c", col("cum") - col("k"))
      .withColumn("lnu_nano", round(lit(1e9) * log(u)).cast("long"))
      .withColumn("ln1mu_nano", round(lit(1e9) * log(lit(1.0d) - u)).cast("long"))
      .withColumn("w_lo", lit(2L) * col("k") * col("c") + col("k") * col("k"))
      .withColumn("w_hi", lit(2L) * col("k") * col("n") - col("w_lo"))
    ranked
      .agg(max(col("n")).as("n"),
        sum(dec(col("w_lo")) * col("lnu_nano") +
          dec(col("w_hi")) * col("ln1mu_nano")).as("s_nano"))
      .select(col("n"),
        round(lit(1e3) * (-col("n").cast("double") -
          col("s_nano").cast("double") / (col("n").cast("double") * lit(1e9))))
          .cast("long").as("a2_milli"))
      // 2.492 is the 5% critical value of A² for a FULLY SPECIFIED
      // null (uniform, no fitted parameters) — the split-audit verdict
      .withColumn("uniform_ok_5pct", col("a2_milli") <= lit(2492L))
  }

  val andersonDarlingSql: String =
    """WITH hist AS (
      |  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      |           % 65536 AS v,
      |         count(*) AS k
      |  FROM documents GROUP BY 1),
      |ranked AS (
      |  SELECT v, k,
      |         sum(k) OVER (ORDER BY v
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - k AS c,
      |         sum(k) OVER () AS n,
      |         CAST(round(1e9 * ln((CAST(v AS DOUBLE) + 0.5) / 65536.0))
      |           AS BIGINT) AS lnu_nano,
      |         CAST(round(1e9 * ln(1.0 - (CAST(v AS DOUBLE) + 0.5) / 65536.0))
      |           AS BIGINT) AS ln1mu_nano
      |  FROM hist),
      |s AS (
      |  SELECT max(n) AS n,
      |         sum(CAST(2 * k * c + k * k AS HUGEINT) * lnu_nano
      |             + CAST(2 * k * n - 2 * k * c - k * k AS HUGEINT) * ln1mu_nano)
      |           AS s_nano
      |  FROM ranked)
      |SELECT CAST(n AS BIGINT) AS n,
      |       CAST(round(1e3 * (-CAST(n AS DOUBLE)
      |                         - CAST(s_nano AS DOUBLE)
      |                           / (CAST(n AS DOUBLE) * 1e9))) AS BIGINT)
      |         AS a2_milli,
      |       CAST(round(1e3 * (-CAST(n AS DOUBLE)
      |                         - CAST(s_nano AS DOUBLE)
      |                           / (CAST(n AS DOUBLE) * 1e9))) AS BIGINT) <= 2492
      |         AS uniform_ok_5pct
      |FROM s""".stripMargin

  /** WALD–WOLFOWITZ RUNS TEST on the daily revenue series — is the
    * above/below-mean sign sequence RANDOM in time, or does it carry
    * momentum (long runs ⇒ trend/regime, z ≪ 0) or oscillation
    * (alternating signs ⇒ overdifferencing/seasonality, z ≫ 0)? The
    * randomness check a forecaster runs on residuals before trusting
    * a model. Signs come from the EXACT cross-multiplied comparison
    * day_cents·n_days vs total_cents (no double mean, no tie
    * ambiguity beyond exact equality, which drops the day); runs
    * count = 1 + sign changes via lag over the day-keyed series;
    * z = (R − μ)/σ with the standard two-sample moments.
    *
    * Scale shape: the data-sized stage is one compact-key day agg
    * (calendar-bounded table); the lag window and moments run over
    * that bounded series — the hourly-series discipline. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(round(col("o_totalprice") * 100.0d).cast("long")).as("cents"))
    val tot = daily.agg(sum(col("cents")).as("total"),
      count(lit(1)).as("nd"))
    val signed = daily.crossJoin(broadcast(tot))
      .withColumn("sign",
        when(col("cents") * col("nd") > col("total"), lit(1))
          .when(col("cents") * col("nd") < col("total"), lit(-1))
          .otherwise(lit(0)))
      .filter(col("sign") =!= 0)
      .withColumn("chg",
        when(lag(col("sign"), 1).over(Window.orderBy(col("day"))).isNull, 0)
          .when(lag(col("sign"), 1).over(Window.orderBy(col("day"))) =!=
            col("sign"), 1)
          .otherwise(0))
    def d(c: Column) = c.cast("double")
    signed
      .agg(count(lit(1)).as("n"),
        sum(when(col("sign") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("sign") === -1, 1L).otherwise(0L)).as("n_below"),
        (sum(col("chg")) + 1L).as("n_runs"))
      .withColumn("mu", lit(1.0d) +
        lit(2.0d) * d(col("n_above")) * d(col("n_below")) / d(col("n")))
      .withColumn("sigma2",
        (col("mu") - lit(1.0d)) * (col("mu") - lit(2.0d)) / (d(col("n")) - lit(1.0d)))
      .select(col("n").as("n_days"), col("n_above"), col("n_below"),
        col("n_runs"),
        // degenerate one-sided series (n_above or n_below = 0) has
        // mu = 1, sigma2 = 0: guard the division so both engines emit
        // NULL instead of Spark-Infinity vs DuckDB cast error
        when(col("sigma2") > 0d,
          round(lit(1e3) * (d(col("n_runs")) - col("mu")) / sqrt(col("sigma2")))
            .cast("long")).as("z_milli"))
      .withColumn("random_ok_5pct", abs(col("z_milli")) <= lit(1960L))
  }

  val runsTestSql: String =
    """WITH daily AS (
      |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
      |         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT sum(cents) AS total, count(*) AS nd FROM daily),
      |signed AS (
      |  SELECT day,
      |         CASE WHEN cents * nd > total THEN 1
      |              WHEN cents * nd < total THEN -1 ELSE 0 END AS sign
      |  FROM daily CROSS JOIN tot),
      |seq AS (
      |  SELECT sign,
      |         CASE WHEN lag(sign) OVER (ORDER BY day) IS NULL THEN 0
      |              WHEN lag(sign) OVER (ORDER BY day) <> sign THEN 1
      |              ELSE 0 END AS chg
      |  FROM signed WHERE sign <> 0),
      |m AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS n_above,
      |         sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS n_below,
      |         sum(chg) + 1 AS n_runs
      |  FROM seq),
      |z AS (
      |  SELECT n, n_above, n_below, n_runs,
      |         1.0 + 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
      |               / CAST(n AS DOUBLE) AS mu
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |       CAST(n_above AS BIGINT) AS n_above,
      |       CAST(n_below AS BIGINT) AS n_below,
      |       CAST(n_runs AS BIGINT) AS n_runs,
      |       CASE WHEN (mu - 1.0) * (mu - 2.0) > 0
      |         THEN CAST(round(1e3 * (CAST(n_runs AS DOUBLE) - mu)
      |             / sqrt((mu - 1.0) * (mu - 2.0) / (CAST(n AS DOUBLE) - 1.0)))
      |           AS BIGINT) END AS z_milli,
      |       CASE WHEN (mu - 1.0) * (mu - 2.0) > 0
      |         THEN abs(CAST(round(1e3 * (CAST(n_runs AS DOUBLE) - mu)
      |             / sqrt((mu - 1.0) * (mu - 2.0) / (CAST(n AS DOUBLE) - 1.0)))
      |           AS BIGINT)) <= 1960 END AS random_ok_5pct
      |FROM z""".stripMargin

  /** THEIL INDEX + ATKINSON(ε=1) of per-customer spend — the
    * DECOMPOSABLE inequality measures beside [[gini]]: Theil
    * T = (1/n)·Σ (x/μ)·ln(x/μ) (0 = perfect equality, ln n = one
    * customer owns everything; additively decomposable across
    * subgroups, which Gini is not — the property a mix-rebalance
    * pipeline needs to attribute inequality to domains), and
    * Atkinson A₁ = 1 − geomean/μ (the welfare share society would
    * give up for equality). Both reduce over the distinct-value spend
    * HISTOGRAM: each distinct cents value quantizes its ln term ONCE
    * to nano-units, weighted by the exact count, summed exactly — the
    * [[gini]]/entropy-rate discipline, so both engines fold identical
    * integers and pay one exp/division at the end.
    *
    * Scale shape: one map-side-combinable per-customer agg, one
    * compact-key histogram agg; no sort, no window. */
  def theilIndex(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .filter(col("v") > 0L)
    val hist = perCust.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val m = hist.agg(sum(col("c")).as("n"), sum(dec(col("v")) * col("c")).as("sx"),
      sum(dec(col("c")) * round(lit(1e9) * log(col("v").cast("double"))).cast("long"))
        .as("slnx_nano"))
    val nd = col("n").cast("double")
    val mu = col("sx").cast("double") / nd
    // second pass re-quantizes per distinct value AGAINST μ (one-row
    // broadcast) — (x/μ)ln(x/μ) needs μ, so it cannot fold in pass 1
    val t = hist.crossJoin(broadcast(m.select(col("sx"), col("n"))))
      .select(col("c"),
        round(lit(1e9) * (col("v").cast("double") * col("n").cast("double") /
          col("sx").cast("double")) *
          log(col("v").cast("double") * col("n").cast("double") /
            col("sx").cast("double"))).cast("long").as("t_nano"))
      .agg(sum(dec(col("c")) * col("t_nano")).as("st_nano"))
    m.crossJoin(t).select(
      col("n").as("n_customers"),
      round(mu).cast("long").as("mean_cents"),
      round(lit(1e6) * col("st_nano").cast("double") / (nd * lit(1e9)))
        .cast("long").as("theil_micro"),
      round(lit(1e6) * (lit(1.0) -
        exp(col("slnx_nano").cast("double") / (nd * lit(1e9))) / mu))
        .cast("long").as("atkinson_micro"))
  }

  val theilIndexSql: String =
    """WITH perc AS (
      |  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
      |  FROM orders GROUP BY 1),
      |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM perc WHERE v > 0 GROUP BY 1),
      |m AS (
      |  SELECT sum(c) AS n, sum(CAST(v AS HUGEINT) * c) AS sx,
      |         sum(CAST(c AS HUGEINT)
      |             * CAST(round(1e9 * ln(CAST(v AS DOUBLE))) AS BIGINT)) AS slnx_nano
      |  FROM hist),
      |t AS (
      |  SELECT sum(CAST(c AS HUGEINT) *
      |           CAST(round(1e9 * (CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
      |                             / CAST(sx AS DOUBLE))
      |                * ln(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
      |                     / CAST(sx AS DOUBLE))) AS BIGINT)) AS st_nano
      |  FROM hist CROSS JOIN m)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |       CAST(round(CAST(sx AS DOUBLE) / n) AS BIGINT) AS mean_cents,
      |       CAST(round(1e6 * CAST(st_nano AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9))
      |         AS BIGINT) AS theil_micro,
      |       CAST(round(1e6 * (1.0 - exp(CAST(slnx_nano AS DOUBLE)
      |                                   / (CAST(n AS DOUBLE) * 1e9))
      |                         / (CAST(sx AS DOUBLE) / n))) AS BIGINT)
      |         AS atkinson_micro
      |FROM m CROSS JOIN t""".stripMargin

  /** FRIEDMAN TEST — the REPEATED-MEASURES rank test completing the
    * nonparametric family ([[mannWhitney]] two independent samples,
    * [[wilcoxonSigned]] two paired, [[kruskalWallis]] k independent —
    * this is k TREATMENTS × n BLOCKS): does order priority (k=5
    * treatments) shift monthly revenue when each MONTH is its own block
    * (removing the day-to-day level the independent-sample tests
    * drown in)? Ranks are within-block over the 5 per-priority monthly cents
    * sums (deterministic total order: cents, then priority key — exact
    * integer sums make real ties vanishingly rare and the tie-break
    * identical cross-engine); χ²_F = 12/(n·k·(k+1))·ΣR_j² − 3n(k+1),
    * df = k−1.
    *
    * Scale shape: one map-side-combinable (day, prio) agg; the rank
    * window runs per block over exactly k rows; the fold is a k-key
    * agg. Blocks missing any treatment drop (complete-block design). */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val cells = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("day"),
        substring(col("o_orderpriority"), 1, 1).as("prio"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val complete = cells.groupBy(col("day")).agg(count(lit(1)).as("nk"))
      .filter(col("nk") === k).select(col("day"))
    val ranked = cells.join(complete, "day")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("cents"), col("prio"))))
    val rj = ranked.groupBy(col("prio"))
      .agg(sum(col("r").cast("long")).as("rj"), count(lit(1)).as("n"))
    val m = rj.agg(max(col("n")).as("n"),
      sum(dec(col("rj")) * col("rj")).as("srj2"))
    val nd = col("n").cast("double")
    val chi2 = lit(12.0) / (nd * k * (k + 1)) *
      col("srj2").cast("double") - lit(3.0) * nd * (k + 1)
    m.select(col("n").as("n_blocks"), lit(k.toLong).as("k_treatments"),
      round(lit(1e3) * chi2).cast("long").as("chi2_milli"))
      // chi2(df=4) 5% critical value 9.488
      .withColumn("shifted_5pct", col("chi2_milli") > lit(9488L))
  }

  val friedmanSql: String =
    """WITH cells AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS day,
      |         substring(o_orderpriority, 1, 1) AS prio,
      |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1, 2),
      |complete AS (SELECT day FROM cells GROUP BY 1 HAVING count(*) = 5),
      |ranked AS (
      |  SELECT c.prio,
      |         row_number() OVER (PARTITION BY c.day ORDER BY c.cents, c.prio) AS r
      |  FROM cells c JOIN complete USING (day)),
      |rj AS (SELECT prio, sum(r) AS rj, count(*) AS n FROM ranked GROUP BY 1),
      |m AS (SELECT max(n) AS n, sum(CAST(rj AS HUGEINT) * rj) AS srj2 FROM rj)
      |SELECT CAST(n AS BIGINT) AS n_blocks, CAST(5 AS BIGINT) AS k_treatments,
      |       CAST(round(1e3 * (12.0 / (CAST(n AS DOUBLE) * 5 * 6)
      |              * CAST(srj2 AS DOUBLE) - 3.0 * CAST(n AS DOUBLE) * 6))
      |         AS BIGINT) AS chi2_milli,
      |       CAST(round(1e3 * (12.0 / (CAST(n AS DOUBLE) * 5 * 6)
      |              * CAST(srj2 AS DOUBLE) - 3.0 * CAST(n AS DOUBLE) * 6))
      |         AS BIGINT) > 9488 AS shifted_5pct
      |FROM m""".stripMargin

  /** WILCOXON SIGNED-RANK test on PAIRED per-user spend (first half
    * of the month vs second half, day-of-month ≤ 15 the split) — the
    * paired companion to [[mannWhitney]]'s independent-samples rank
    * sum: did the user population's spend SHIFT within the month,
    * judged on signed rank magnitudes rather than means (robust to
    * the heavy tail a mean test drowns in)? Zero differences drop
    * (the standard treatment); ties get midranks with the Σ(t³−t)/48
    * variance correction.
    *
    * Scale shape: the data-sized stage is ONE map-side-combinable
    * per-user conditional agg; ranks come from the distinct-|diff|
    * HISTOGRAM (the [[mannWhitney]]/gini discipline — the ordered
    * window sees only distinct cents values, never rows). Parity:
    * 2·W⁺ and the tie term are exact integers (decimal-summed), one
    * sqrt at the end. */
  def wilcoxonSigned(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(dayofmonth(col("ts")) <= 15,
          round(col("value") * 100).cast("long")).otherwise(0L)).as("h1"),
        sum(when(dayofmonth(col("ts")) > 15,
          round(col("value") * 100).cast("long")).otherwise(0L)).as("h2"))
      .select((col("h2") - col("h1")).as("d"))
      .filter(col("d") =!= 0L)
    val hist = perUser
      .groupBy(abs(col("d")).as("ad"))
      .agg(count(lit(1)).as("c"), count_if(col("d") > 0L).as("p"))
    val cum = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = hist
      .withColumn("r0", sum(col("c")).over(cum) - col("c"))
      .agg(sum(col("c")).as("n"),
        sum(dec(col("p")) * (lit(2) * col("r0") + col("c") + lit(1))).as("w2"),
        sum(dec(col("c")) * col("c") * col("c") - col("c")).as("t3"))
    val nd = col("n").cast("double")
    val wp = col("w2").cast("double") / 2
    val mu = nd * (nd + 1) / 4
    val sigma2 = nd * (nd + 1) * (nd * 2 + 1) / 24 -
      col("t3").cast("double") / 48
    m.select(col("n").as("n_pairs"), wp.as("w_plus"),
      when(col("n") > 1L && sigma2 > 0d,
        round(lit(1e3) * (wp - mu) / sqrt(sigma2)).cast("long")).as("z_milli"))
      .withColumn("shifted_5pct", abs(col("z_milli")) > lit(1960L))
  }

  val wilcoxonSignedSql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |         sum(CASE WHEN date_part('day', ts) <= 15
      |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS h1,
      |         sum(CASE WHEN date_part('day', ts) > 15
      |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS h2
      |  FROM events GROUP BY 1),
      |d AS (SELECT h2 - h1 AS d FROM pu WHERE h2 <> h1),
      |hist AS (
      |  SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS c,
      |         CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS p
      |  FROM d GROUP BY 1),
      |runs AS (
      |  SELECT c, p,
      |         sum(c) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) - c AS r0
      |  FROM hist),
      |m AS (
      |  SELECT sum(c) AS n,
      |         sum(CAST(p AS HUGEINT) * (2 * r0 + c + 1)) AS w2,
      |         sum(CAST(c AS HUGEINT) * c * c - c) AS t3
      |  FROM runs)
      |SELECT CAST(n AS BIGINT) AS n_pairs,
      |       CAST(w2 AS DOUBLE) / 2 AS w_plus,
      |       CASE WHEN n > 1 AND
      |              CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
      |                - CAST(t3 AS DOUBLE) / 48 > 0
      |         THEN CAST(round(1e3 * (CAST(w2 AS DOUBLE) / 2
      |                    - CAST(n AS DOUBLE) * (n + 1) / 4)
      |               / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
      |                      - CAST(t3 AS DOUBLE) / 48)) AS BIGINT) END AS z_milli,
      |       CASE WHEN n > 1 AND
      |              CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
      |                - CAST(t3 AS DOUBLE) / 48 > 0
      |         THEN abs(CAST(round(1e3 * (CAST(w2 AS DOUBLE) / 2
      |                    - CAST(n AS DOUBLE) * (n + 1) / 4)
      |               / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
      |                      - CAST(t3 AS DOUBLE) / 48)) AS BIGINT)) > 1960
      |         END AS shifted_5pct
      |FROM m""".stripMargin

  /** DUNN'S POST-HOC TEST — the pairwise follow-up [[kruskalWallis]]
    * demands: KW says "SOME event type differs in value distribution";
    * Dunn says WHICH pairs, on the same tie-corrected midranks, with
    * the Bonferroni family-wise correction (m = k(k−1)/2 pairs;
    * α = 0.05 two-sided ⇒ |z| > z_{1−0.05/2m} = 2.807 for k = 5).
    *
    * Exactness: doubled rank sums r2 = Σd·(2r0+c+1) are exact
    * DECIMAL(38,0) folds over the VALUE HISTOGRAM (the KW discipline —
    * the rank window never touches the raw stream); the pooled
    * variance σ² = (N(N+1) − T/(N−1))/12 with T = Σ(t³−t) and each
    * pair's z is ONE double expression over those integers, milli-
    * quantized. Scale: the pairwise stage is a self-join of the
    * k-row group table — k is the type-dictionary size, never data. */
  def dunnTest(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("cents"), col("event_type")).agg(count(lit(1)).as("d"))
    val cum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = perVal.groupBy(col("cents")).agg(sum(col("d")).as("c"))
      .withColumn("r0", sum(col("c")).over(cum) - col("c"))
    val groups = perVal.join(runs, "cents")
      .groupBy(col("event_type"))
      .agg(sum(col("d")).as("n_g"),
        sum(dec(col("d")) * (lit(2) * col("r0") + col("c") + lit(1))).as("r2"))
    val tot = runs.agg(sum(col("c")).as("n"),
      sum(dec(col("c")) * col("c") * col("c") - col("c")).as("t3"))
    def d(c: Column) = c.cast("double")
    val a = groups.select(col("event_type").as("type_a"), col("n_g").as("na"),
      col("r2").as("r2a"))
    val b = groups.select(col("event_type").as("type_b"), col("n_g").as("nb"),
      col("r2").as("r2b"))
    // r14 ADVICE: the Bonferroni cut depends on the PAIR COUNT m =
    // k(k−1)/2, so it is looked up from the computed group count k
    // (k=2..6 → z_{1−0.05/2m} milli-quantized: 1.960/2.394/2.638/
    // 2.807/2.935), NULL beyond — a dictionary-cardinality shift moves
    // the cut or fails loudly instead of silently mis-flagging. The
    // oracle SQL carries the identical CASE table.
    val kk = groups.agg(count(lit(1)).as("kg"))
    a.join(b, col("type_a") < col("type_b"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(kk))
      // doubled mean ranks: r2/n_g = 2·R̄_g; the /2 folds into the final z
      .withColumn("sigma2",
        (d(col("n")) * (d(col("n")) + 1d) -
          d(col("t3")) / (d(col("n")) - 1d)) / 12d)
      .withColumn("z_crit_milli",
        Seq(2L -> 1960L, 3L -> 2394L, 4L -> 2638L, 5L -> 2807L, 6L -> 2935L)
          .foldLeft(lit(null).cast("long")) { case (acc, (k0, v)) =>
            when(col("kg") === k0, lit(v)).otherwise(acc)
          })
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        when(col("sigma2") > 0d,
          round(lit(1e3) *
            (d(col("r2a")) / d(col("na")) - d(col("r2b")) / d(col("nb"))) / 2d /
            sqrt(col("sigma2") * (lit(1d) / d(col("na")) + lit(1d) / d(col("nb")))))
            .cast("long")).as("z_milli"),
        col("z_crit_milli"))
      .withColumn("differs_bonferroni_5pct",
        abs(col("z_milli")) > col("z_crit_milli"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val dunnTestSql: String =
    """WITH perval AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |         count(*) AS d
      |  FROM events GROUP BY 1, 2),
      |runs AS (
      |  SELECT cents, c, sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) - c AS r0
      |  FROM (SELECT cents, sum(d) AS c FROM perval GROUP BY 1)),
      |tot AS (
      |  SELECT sum(c) AS n, sum(CAST(c AS HUGEINT) * c * c - c) AS t3 FROM runs),
      |groups_ AS (
      |  SELECT event_type, sum(d) AS n_g,
      |         sum(CAST(d AS HUGEINT) * (2 * r0 + c + 1)) AS r2
      |  FROM perval JOIN runs USING (cents) GROUP BY 1),
      |kk AS (SELECT count(*) AS kg FROM groups_),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         a.n_g AS na, b.n_g AS nb, a.r2 AS r2a, b.r2 AS r2b,
      |         (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
      |          - CAST(t3 AS DOUBLE) / (CAST(n AS DOUBLE) - 1)) / 12 AS sigma2,
      |         CAST(CASE kg WHEN 2 THEN 1960 WHEN 3 THEN 2394 WHEN 4 THEN 2638
      |                      WHEN 5 THEN 2807 WHEN 6 THEN 2935 END AS BIGINT)
      |           AS z_crit_milli
      |  FROM groups_ a JOIN groups_ b ON a.event_type < b.event_type
      |  CROSS JOIN tot CROSS JOIN kk)
      |SELECT type_a, type_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |       CASE WHEN sigma2 > 0 THEN
      |         CAST(round(1e3 * (CAST(r2a AS DOUBLE) / na - CAST(r2b AS DOUBLE) / nb) / 2
      |              / sqrt(sigma2 * (1.0 / na + 1.0 / nb))) AS BIGINT) END AS z_milli,
      |       z_crit_milli,
      |       CASE WHEN sigma2 > 0 THEN
      |         abs(CAST(round(1e3 * (CAST(r2a AS DOUBLE) / na - CAST(r2b AS DOUBLE) / nb) / 2
      |              / sqrt(sigma2 * (1.0 / na + 1.0 / nb))) AS BIGINT)) > z_crit_milli
      |         END AS differs_bonferroni_5pct
      |FROM pairs ORDER BY type_a, type_b""".stripMargin

  /** COCHRAN'S Q — the k-correlated-BINARY-treatments test the rank
    * family lacks ([[friedman]] handles ordinal repeated measures;
    * this is its 0/1 special case, the "did the three flags fire on
    * the same customers or independently?" dependence screen): blocks
    * are customers, treatments are three deterministic order-history
    * predicates (has-urgent, has-large-ticket, has-recent). Q =
    * (k−1)(k·ΣC_j² − N²) / (kN − ΣR_i²) ~ χ²_{k−1}; blocks with
    * all-equal responses cancel from both numerator and denominator —
    * including them is harmless and keeps the scan one pass.
    *
    * Exactness: every C_j, R_i, N is an exact integer from one
    * customer-keyed agg; squares ride DECIMAL(38,0)/HUGEINT; Q is one
    * double division, milli-quantized. Scale: one map-side-combinable
    * per-customer agg, then a scalar fold — no joins. */
  def cochranQ(spark: SparkSession, dir: String): DataFrame = {
    val flags = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)).as("x1"),
        max(when(col("o_totalprice") > 150000d, 1L).otherwise(0L)).as("x2"),
        max(when(year(col("o_orderdate")) >= 1997, 1L).otherwise(0L)).as("x3"))
    def d(c: Column) = c.cast("double")
    flags
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("x1")).as("c1"), sum(col("x2")).as("c2"), sum(col("x3")).as("c3"),
        sum(dec(col("x1") + col("x2") + col("x3")) *
          (col("x1") + col("x2") + col("x3"))).as("sr2"))
      .select(col("n_blocks"), col("c1"), col("c2"), col("c3"),
        (col("c1") + col("c2") + col("c3")).as("n_success"), col("sr2"))
      .select(col("n_blocks"), col("c1"), col("c2"), col("c3"),
        when(lit(3L) * col("n_success") - col("sr2") > 0,
          round(lit(1e3) * lit(2d) *
            (lit(3d) * (d(col("c1")) * d(col("c1")) + d(col("c2")) * d(col("c2")) +
              d(col("c3")) * d(col("c3"))) -
              d(col("n_success")) * d(col("n_success"))) /
            (lit(3d) * d(col("n_success")) - d(col("sr2"))))
            .cast("long")).as("q_milli"))
      // chi2(2) 95th percentile = 5.991
      .withColumn("differs_5pct", col("q_milli") > lit(5991L))
  }

  val cochranQSql: String =
    """WITH flags AS (
      |  SELECT o_custkey,
      |         max(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS x1,
      |         max(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS x2,
      |         max(CASE WHEN year(o_orderdate) >= 1997 THEN 1 ELSE 0 END) AS x3
      |  FROM orders GROUP BY 1),
      |m AS (
      |  SELECT count(*) AS n_blocks, sum(x1) AS c1, sum(x2) AS c2, sum(x3) AS c3,
      |         sum(x1 + x2 + x3) AS n_success,
      |         sum(CAST(x1 + x2 + x3 AS HUGEINT) * (x1 + x2 + x3)) AS sr2
      |  FROM flags)
      |SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
      |       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
      |       CAST(c3 AS BIGINT) AS c3,
      |       CASE WHEN 3 * n_success - sr2 > 0 THEN
      |         CAST(round(1e3 * 2
      |              * (3 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
      |                      + CAST(c3 AS DOUBLE) * c3)
      |                 - CAST(n_success AS DOUBLE) * n_success)
      |              / (3 * CAST(n_success AS DOUBLE) - CAST(sr2 AS DOUBLE)))
      |           AS BIGINT) END AS q_milli,
      |       CASE WHEN 3 * n_success - sr2 > 0 THEN
      |         CAST(round(1e3 * 2
      |              * (3 * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
      |                      + CAST(c3 AS DOUBLE) * c3)
      |                 - CAST(n_success AS DOUBLE) * n_success)
      |              / (3 * CAST(n_success AS DOUBLE) - CAST(sr2 AS DOUBLE)))
      |           AS BIGINT) > 5991 END AS differs_5pct
      |FROM m""".stripMargin

  /** PAGE'S TREND TEST — the ORDERED-alternatives member completing
    * the block-rank family ([[friedman]] asks "do the k treatments
    * differ AT ALL?"; Page asks "do they trend MONOTONICALLY in the
    * hypothesized order?" — here: does monthly revenue fall as order
    * priority drops from 1-URGENT to 5-LOW?): within each complete
    * month block the k=5 priorities rank by revenue (deterministic
    * (cents, priority) total order — the [[friedman]] discipline),
    * L = Σ_j j·R_j with j the hypothesized position, and
    * z = (L − b·k(k+1)²/4) / √(b·k²(k+1)(k²−1)/144).
    *
    * Exactness: ranks, L, and both moments are exact integers;
    * z is ONE double expression, milli-quantized. Scale: one
    * compact (month, priority) agg; ranks run over k-row blocks of
    * the calendar-bounded cell table. */
  def pageTrend(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderpriority").as("prio"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    // complete blocks only (Page requires every treatment per block)
    val complete = cells
      .withColumn("kb", count(lit(1)).over(Window.partitionBy(col("month"))))
      .filter(col("kb") === 5)
    val ranked = complete
      .withColumn("r", row_number().over(Window.partitionBy(col("month"))
        .orderBy(col("cents"), col("prio"))).cast("long"))
      .withColumn("j", substring(col("prio"), 1, 1).cast("long"))
    def d(c: Column) = c.cast("double")
    ranked
      .agg((count(lit(1)) / lit(5L)).cast("long").as("n_blocks"),
        sum(col("j") * col("r")).as("l_stat"))
      .select(col("n_blocks"), lit(5L).as("k"), col("l_stat"),
        // E = b·k(k+1)²/4 = 45b, Var = b·k²(k+1)(k²−1)/144 = 25b
        round(lit(1e3) * (d(col("l_stat")) - lit(45d) * d(col("n_blocks"))) /
          sqrt(lit(25d) * d(col("n_blocks")))).cast("long").as("z_milli"))
      .withColumn("monotone_5pct", abs(col("z_milli")) > lit(1960L))
  }

  val pageTrendSql: String =
    """WITH cells AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority AS prio,
      |         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1, 2),
      |complete AS (
      |  SELECT * FROM (
      |    SELECT month, prio, cents,
      |           count(*) OVER (PARTITION BY month) AS kb
      |    FROM cells) WHERE kb = 5),
      |ranked AS (
      |  SELECT CAST(substr(prio, 1, 1) AS BIGINT) AS j,
      |         CAST(row_number() OVER (PARTITION BY month
      |                                 ORDER BY cents, prio) AS BIGINT) AS r
      |  FROM complete),
      |m AS (
      |  SELECT count(*) // 5 AS n_blocks, sum(j * r) AS l_stat FROM ranked)
      |SELECT CAST(n_blocks AS BIGINT) AS n_blocks, CAST(5 AS BIGINT) AS k,
      |       CAST(l_stat AS BIGINT) AS l_stat,
      |       CAST(round(1e3 * (CAST(l_stat AS DOUBLE) - 45 * CAST(n_blocks AS DOUBLE))
      |              / sqrt(25 * CAST(n_blocks AS DOUBLE))) AS BIGINT) AS z_milli,
      |       abs(CAST(round(1e3 * (CAST(l_stat AS DOUBLE) - 45 * CAST(n_blocks AS DOUBLE))
      |              / sqrt(25 * CAST(n_blocks AS DOUBLE))) AS BIGINT)) > 1960
      |         AS monotone_5pct
      |FROM m""".stripMargin

  /** BARTLETT'S TEST — the parametric variance-homogeneity sibling of
    * [[levene]]/Brown–Forsythe (Bartlett is MORE powerful under
    * normality and the classic pre-check before pooling variances in
    * ANOVA; Levene is the robust fallback — shipping both lets the
    * pipeline report when they disagree, which is itself a
    * non-normality signal): χ² = [(N−k)·ln S²_p − Σ(n_i−1)·ln S²_i]/C
    * with C = 1 + (Σ1/(n_i−1) − 1/(N−k))/(3(k−1)).
    *
    * Exactness: per-group (n, Σx, Σx²) are exact DECIMAL/HUGEINT
    * folds of integer cents; each group's (n_i−1)·ln S²_i and
    * 1/(n_i−1) quantize ONCE to nano before their exact k-term sums;
    * the final assembly is one double expression over those longs.
    * Scale: one map-side-combinable per-type agg (k rows), then a
    * scalar fold — no ordered anything. */
  def bartlett(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val g = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ni"), sum(dec(col("cents"))).as("sx"),
        sum(dec(col("cents")) * col("cents")).as("sxx"))
      .filter(col("ni") > 1)
      .withColumn("m2", dec(col("ni")) * col("sxx") - col("sx") * col("sx"))
      .filter(col("m2") > 0)
      // per-group quantize-then-sum (the entropy-rate discipline):
      // (n_i−1)·S²_i = m2/n_i in milli-cents² rides DECIMAL (it is
      // n·variance — wraps a long at trillion-row groups), the ln and
      // reciprocal terms in nano
      .select(col("ni"),
        round(lit(1e3) * d(col("m2")) / d(col("ni"))).cast("decimal(38,0)")
          .as("wss_milli"),
        (dec(col("ni") - 1L) * round(lit(1e9) *
          log(d(col("m2")) / (d(col("ni")) * (d(col("ni")) - 1d))))
          .cast("long")).cast("decimal(38,0)").as("t_nano"),
        round(lit(1e9) / (d(col("ni")) - 1d)).cast("long").as("inv_nano"))
    g.agg(count(lit(1)).as("k"), sum(col("ni")).as("n"),
        sum(col("t_nano")).as("st"), sum(col("inv_nano")).as("sinv"),
        sum(col("wss_milli")).as("ssw"))
      .select(col("k"), col("n"),
        round(lit(1e3) *
          ((d(col("n")) - d(col("k"))) *
            log(d(col("ssw")) / lit(1e3) / (d(col("n")) - d(col("k")))) -
            d(col("st")) / lit(1e9)) /
          (lit(1d) + (d(col("sinv")) / lit(1e9) -
            lit(1d) / (d(col("n")) - d(col("k")))) /
            (lit(3d) * (d(col("k")) - lit(1d)))))
          .cast("long").as("chi2_milli"))
      .withColumn("df", col("k") - 1L)
      // r14 ADVICE: the critical value is DERIVED from the computed df
      // via a milli-quantized chi2(df) 95th-percentile lookup (df
      // 1..10), mirrored verbatim in the oracle SQL — a cardinality
      // shift in the event-type dictionary moves the cut with it, and
      // an out-of-table df yields NULL (loud) instead of a wrong flag
      .withColumn("chi2_crit_milli", chi2Crit95Milli(col("df")))
      .withColumn("heteroscedastic_5pct",
        col("chi2_milli") > col("chi2_crit_milli"))
  }

  /** chi-square 95th-percentile critical values, milli-quantized, for
    * df 1..10; NULL outside the table so a surprise group cardinality
    * fails loudly (NULL flag) rather than silently mis-flagging. The
    * oracle SQL carries the identical CASE table. */
  private def chi2Crit95Milli(df: Column): Column = {
    val t = Seq(1L -> 3841L, 2L -> 5991L, 3L -> 7815L, 4L -> 9488L,
      5L -> 11070L, 6L -> 12592L, 7L -> 14067L, 8L -> 15507L,
      9L -> 16919L, 10L -> 18307L)
    t.foldLeft(lit(null).cast("long")) { case (acc, (d0, v)) =>
      when(df === d0, lit(v)).otherwise(acc)
    }
  }

  val bartlettSql: String =
    """WITH g AS (
      |  SELECT event_type, count(*) AS ni,
      |         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS sx,
      |         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
      |             * CAST(round(value * 100) AS BIGINT)) AS sxx
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT ni, CAST(ni AS HUGEINT) * sxx - sx * sx AS m2
      |  FROM g WHERE ni > 1),
      |terms AS (
      |  SELECT ni,
      |         CAST(round(1e3 * CAST(m2 AS DOUBLE) / ni) AS HUGEINT) AS wss_milli,
      |         CAST(ni - 1 AS HUGEINT)
      |           * CAST(round(1e9 * ln(CAST(m2 AS DOUBLE)
      |                 / (CAST(ni AS DOUBLE) * (CAST(ni AS DOUBLE) - 1)))) AS BIGINT)
      |           AS t_nano,
      |         CAST(round(1e9 / (CAST(ni AS DOUBLE) - 1)) AS BIGINT) AS inv_nano
      |  FROM m WHERE m2 > 0),
      |agg_ AS (
      |  SELECT count(*) AS k, sum(ni) AS n, sum(t_nano) AS st,
      |         sum(inv_nano) AS sinv, sum(wss_milli) AS ssw
      |  FROM terms),
      |chi AS (
      |  SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
      |         CAST(round(1e3 *
      |             ((CAST(n AS DOUBLE) - k) *
      |                ln(CAST(ssw AS DOUBLE) / 1e3 / (CAST(n AS DOUBLE) - k))
      |              - CAST(st AS DOUBLE) / 1e9)
      |             / (1.0 + (CAST(sinv AS DOUBLE) / 1e9
      |                       - 1.0 / (CAST(n AS DOUBLE) - k))
      |                      / (3.0 * (CAST(k AS DOUBLE) - 1)))) AS BIGINT)
      |           AS chi2_milli,
      |         CAST(k - 1 AS BIGINT) AS df
      |  FROM agg_)
      |SELECT k, n, chi2_milli, df,
      |       CAST(CASE df WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
      |                    WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
      |                    WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919
      |                    WHEN 10 THEN 18307 END AS BIGINT) AS chi2_crit_milli,
      |       chi2_milli >
      |         CASE df WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815
      |                 WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592
      |                 WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919
      |                 WHEN 10 THEN 18307 END AS heteroscedastic_5pct
      |FROM chi""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_bartlett" -> (bartlett _),
    "stats_page_trend" -> (pageTrend _),
    "stats_dunn" -> (dunnTest _),
    "stats_cochran_q" -> (cochranQ _),
    "agg_theil_index" -> (theilIndex _),
    "stats_friedman" -> (friedman _),
    "stats_wilcoxon_signed" -> (wilcoxonSigned _),
    "stats_anderson_darling" -> (andersonDarling _),
    "stats_runs_test" -> (runsTest _),
    "stats_kruskal_wallis" -> (kruskalWallis _),
    "stats_effect_sizes" -> (effectSizes _),
    "stats_fisher_exact" -> (fisherExact _),
    "stats_levene" -> (levene _),
    "stats_jarque_bera" -> (jarqueBera _),
    "stats_power_analysis" -> (powerAnalysis _),
    "stats_bh_fdr" -> (bhFdr _),
    "agg_spearman" -> (spearman _),
    "agg_kendall_tau" -> (kendallTau _),
    "stats_trend_test" -> (trendTest _),
    "agg_anova" -> (anova _),
    "agg_bootstrap_ci" -> (bootstrapCi _),
    "agg_hhi" -> (hhi _),
    "agg_median_ci" -> (medianCi _),
    "agg_permutation_test" -> (permutationTest _),
    "agg_gini" -> (gini _),
    "agg_mutual_info" -> (mutualInfo _),
    "agg_mann_whitney" -> (mannWhitney _),
    "stats_mood_median" -> (moodMedian _),
    "agg_cramers_v" -> (cramersV _),
    "agg_cms_topk" -> (cmsTopK _),
    "agg_benford" -> (benford _),
    "agg_hdr_percentiles" -> (hdrPercentiles _),
    "ts_theil_sen" -> (theilSen _)
  )

  def oracle: Map[String, String] = Map(
    "stats_bartlett" -> bartlettSql,
    "stats_page_trend" -> pageTrendSql,
    "stats_dunn" -> dunnTestSql,
    "stats_cochran_q" -> cochranQSql,
    "agg_theil_index" -> theilIndexSql,
    "stats_friedman" -> friedmanSql,
    "stats_wilcoxon_signed" -> wilcoxonSignedSql,
    "stats_anderson_darling" -> andersonDarlingSql,
    "stats_runs_test" -> runsTestSql,
    "stats_fisher_exact" -> fisherExactSql,
    "stats_levene" -> leveneSql,
    "stats_jarque_bera" -> jarqueBeraSql,
    "stats_power_analysis" -> powerAnalysisSql,
    "stats_bh_fdr" -> bhFdrSql,
    "agg_spearman" -> spearmanSql,
    "agg_kendall_tau" -> kendallTauSql,
    "stats_trend_test" -> trendTestSql,
    "agg_anova" -> anovaSql,
    "agg_bootstrap_ci" -> bootstrapCiSql,
    "agg_hhi" -> hhiSql,
    "agg_median_ci" -> medianCiSql,
    "agg_permutation_test" -> permutationTestSql,
    "agg_gini" -> giniSql,
    "agg_mutual_info" -> mutualInfoSql,
    "agg_mann_whitney" -> mannWhitneySql,
    "stats_mood_median" -> moodMedianSql,
    "stats_kruskal_wallis" -> kruskalWallisSql,
    "stats_effect_sizes" -> effectSizesSql,
    "agg_cramers_v" -> cramersVSql,
    "agg_cms_topk" -> cmsTopKSql,
    "agg_benford" -> benfordSql,
    "agg_hdr_percentiles" -> hdrPercentilesSql,
    "ts_theil_sen" -> theilSenSql
  )
}
