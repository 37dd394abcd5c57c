package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline model-evaluation suite (SURVEY.md §2.10 EXT — the
  * reference's pipeline, /root/reference/main.py:5–17, moves files and
  * never scores a model; these are the classifier-quality screens a
  * training-data pipeline runs when a learned filter — a quality
  * classifier, a toxicity gate, a language scorer — decides what data
  * survives, the FineWeb-Edu / DCLM curation pattern).
  *
  * The model under evaluation is deterministic and data-derived: the
  * score is a fixed logistic over the first 8 embedding coordinates
  * (quantized to exact micro-units BEFORE the sum, the established
  * integer contract), the label is the parity of the stored class
  * label. Every metric then reduces over the (y, p_u) pair where
  * p_u = round(1e6·σ(6·logit)) is an exact integer in both engines —
  * the ONE transcendental (exp/ln) is evaluated on identical doubles
  * built from integers, per the ln contract used by the entropy/MI
  * family.
  *
  * Scale shape: every metric — the gain chart included, since r11 —
  * reduces through the SCORE HISTOGRAM — a compact-key (p_u, counts)
  * aggregation with at most 1e6+1 keys regardless of corpus size — so
  * the data-sized stage is always one map-side-combinable shuffle and
  * the ordered windows (AUC's midrank scan, the threshold sweep, the
  * gain chart's cumulative cut) run over the bounded histogram only.
  */
object MlEval {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** (vec_id, y ∈ {0,1}, p_u ∈ [1, 999999]) — the shared scored pool.
    * logit_u is the exact integer micro-sum of the first 8 coords;
    * p_u quantizes σ(6·logit) once. Clamp keeps ln() finite for the
    * log-loss op and is applied identically in the oracle. */
  private def scored(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .filter(col("pos0") < 8)
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(round(col("v").cast("double") * 1000000d).cast("long")).as("logit_u"))
      .select(col("vec_id"), (col("label") % 2).as("y"),
        least(greatest(
          round(lit(1e6) / (lit(1d) +
            exp(lit(-6.0d) * col("logit_u").cast("double") / lit(1000000.0d))))
            .cast("long"),
          lit(1L)), lit(999999L)).as("p_u"))

  private val scoredSql: String =
    """scored AS (
      |  SELECT vec_id, CAST(label % 2 AS BIGINT) AS y,
      |         least(greatest(CAST(round(1e6 / (1.0 +
      |           exp(-6.0 * CAST(logit_u AS DOUBLE) / 1000000.0))) AS BIGINT),
      |           1), 999999) AS p_u
      |  FROM (
      |    SELECT vec_id, CAST(label AS BIGINT) AS label, sum(vq) AS logit_u
      |    FROM (SELECT vec_id, label,
      |                 CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS vq,
      |                 generate_subscripts(embedding, 1) AS pos
      |          FROM embeddings)
      |    WHERE pos <= 8 GROUP BY 1, 2))""".stripMargin

  /** Histogram of the scored pool: one compact-key shuffle; ≤ 1e6+1
    * rows no matter the corpus size. */
  private def hist(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir).groupBy(col("p_u"))
      .agg(sum(col("y")).as("pc"), count(lit(1)).as("c"))

  private val histSql: String =
    """hist AS (SELECT p_u, sum(y) AS pc, count(*) AS c FROM scored GROUP BY 1)"""

  // ---------------------------------------------------------------
  // Confusion matrix at the p ≥ 0.5 operating point
  // ---------------------------------------------------------------

  /** CONFUSION MATRIX + precision/recall/F1 at the standard 0.5
    * threshold. One full-scan aggregation; every cell is an exact
    * BIGINT, each ratio ONE integer division quantized to ppm
    * (F1 = 2tp/(2tp+fp+fn) evaluated on integers directly). */
  def confusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = col("p_u") >= 500000L
    scored(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(pred && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && col("y") === 0L, 1L).otherwise(0L)).as("tn"),
        sum(when(!pred && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        round(lit(1e6) * col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .cast("long").as("precision_ppm"),
        round(lit(1e6) * col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .cast("long").as("recall_ppm"),
        round(lit(2e6) * col("tp").cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .cast("long").as("f1_ppm"))
  }

  val confusionSql: String =
    s"""WITH $scoredSql,
       |m AS (
       |  SELECT count(*) AS n,
       |         sum(CASE WHEN p_u >= 500000 AND y = 1 THEN 1 ELSE 0 END) AS tp,
       |         sum(CASE WHEN p_u >= 500000 AND y = 0 THEN 1 ELSE 0 END) AS fp,
       |         sum(CASE WHEN p_u < 500000 AND y = 0 THEN 1 ELSE 0 END) AS tn,
       |         sum(CASE WHEN p_u < 500000 AND y = 1 THEN 1 ELSE 0 END) AS fn
       |  FROM scored)
       |SELECT CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp,
       |       CAST(fp AS BIGINT) AS fp, CAST(tn AS BIGINT) AS tn,
       |       CAST(fn AS BIGINT) AS fn,
       |       CAST(round(1e6 * CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) AS BIGINT) AS precision_ppm,
       |       CAST(round(1e6 * CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)) AS BIGINT) AS recall_ppm,
       |       CAST(round(2e6 * CAST(tp AS DOUBLE) /
       |            CAST(2 * tp + fp + fn AS DOUBLE)) AS BIGINT) AS f1_ppm
       |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // ROC AUC — exact midrank (Mann-Whitney) form over the histogram
  // ---------------------------------------------------------------

  /** EXACT ROC AUC via the rank statistic: AUC = U/(n⁺·n⁻) with
    * U = Σ_scores pc·(nb + nc/2) — positives beat the negatives below
    * them, ties count half. Doubled units (U2 = Σ pc·(2·nb + nc))
    * keep every accumulator an integer; the product rides
    * DECIMAL(38,0)/HUGEINT (pc·nb is data²-sized — the corrMatrix
    * overflow discipline). The ordered scan runs over the ≤1e6-row
    * histogram, never the corpus. */
  def auc(spark: SparkSession, dir: String): DataFrame = {
    val below = Window.orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist(spark, dir)
      .withColumn("nb", coalesce(sum(col("c") - col("pc")).over(below), lit(0L)))
      .agg(sum(col("pc")).as("n_pos"), sum(col("c") - col("pc")).as("n_neg"),
        sum(dec(col("pc")) * (lit(2) * dec(col("nb")) + (col("c") - col("pc")))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        round(lit(1e6) * col("u2").cast("double") /
          (lit(2.0d) * (dec(col("n_pos")) * col("n_neg")).cast("double")))
          .cast("long").as("auc_ppm"))
  }

  val aucSql: String =
    s"""WITH $scoredSql, $histSql,
       |scan AS (
       |  SELECT pc, c - pc AS nc,
       |         coalesce(sum(c - pc) OVER (ORDER BY p_u
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
       |  FROM hist),
       |m AS (
       |  SELECT sum(pc) AS n_pos, sum(nc) AS n_neg,
       |         sum(CAST(pc AS HUGEINT) * (2 * CAST(nb AS HUGEINT) + nc)) AS u2
       |  FROM scan)
       |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       |       CAST(round(1e6 * CAST(u2 AS DOUBLE) /
       |            (2.0 * CAST(CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE))) AS BIGINT) AS auc_ppm
       |FROM m""".stripMargin

  /** BOOTSTRAP CI FOR AUC — the error bar the point estimate lacks
    * ([[auc]] says 0.74; is the eval pool big enough to distinguish
    * that from 0.72? — the question every model-comparison gate must
    * answer before declaring a winner). 64 deterministic Poisson(1)
    * replicates (the [[graft.operators.StatsOps.bootstrapCi]]
    * hash-weight recipe — portable md5 CDF inversion, no RNG state):
    * each example's weight in replicate b reweights the SCORE
    * HISTOGRAM, so every replicate's AUC reduces through the same
    * bounded midrank scan as the point estimate — the example-level
    * pass is one ×64 map-side fan-out into a (b, p_u) combinable agg,
    * never 64 scans. CI = the 2nd/63rd order statistics (~95%).
    *
    * Scale shape: one ×64 fan-out agg (compact keys: 64 × distinct
    * scores) + 64 bounded window scans + a 64-row rank. */
  def bootstrapAuc(spark: SparkSession, dir: String): DataFrame = {
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    val u = graft.api.Graft.idHash(
      concat(col("vec_id").cast("string"), lit(":"), col("b").cast("string")))
    val w = ts.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), rest) => when(col("u") < t, lit(k.toLong)).otherwise(rest)
    }
    val reps = scored(spark, dir)
      .withColumn("b", explode(sequence(lit(0L), lit(63L))))
      .withColumn("u", u).withColumn("w", w)
      .groupBy(col("b"), col("p_u"))
      .agg(sum(when(col("y") === 1L, col("w")).otherwise(0L)).as("pc"),
        sum(col("w")).as("c"))
    val below = Window.partitionBy(col("b")).orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aucs = reps
      .withColumn("nb", coalesce(sum(col("c") - col("pc")).over(below), lit(0L)))
      .groupBy(col("b"))
      .agg(sum(col("pc")).as("np"), sum(col("c") - col("pc")).as("nn"),
        sum(dec(col("pc")) * (lit(2) * dec(col("nb")) + (col("c") - col("pc"))))
          .as("u2"))
      .select(col("b"),
        round(lit(1e6) * col("u2").cast("double") /
          (lit(2.0d) * (dec(col("np")) * col("nn")).cast("double")))
          .cast("long").as("rep_ppm"))
    val rn = Window.orderBy(col("rep_ppm"), col("b"))
    val ci = aucs.withColumn("rn", row_number().over(rn))
      .agg(count(lit(1)).as("b_reps"),
        max(when(col("rn") === 2, col("rep_ppm"))).as("lo_ppm"),
        max(when(col("rn") === 63, col("rep_ppm"))).as("hi_ppm"))
    auc(spark, dir).select(col("auc_ppm")).crossJoin(ci)
      .select(col("auc_ppm"), col("lo_ppm"), col("hi_ppm"), col("b_reps"))
  }

  val bootstrapAucSql: String =
    s"""WITH $scoredSql, $histSql,
       |scan AS (
       |  SELECT pc, c - pc AS nc,
       |         coalesce(sum(c - pc) OVER (ORDER BY p_u
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
       |  FROM hist),
       |pointm AS (
       |  SELECT sum(pc) AS n_pos, sum(nc) AS n_neg,
       |         sum(CAST(pc AS HUGEINT) * (2 * CAST(nb AS HUGEINT) + nc)) AS u2
       |  FROM scan),
       |point AS (
       |  SELECT CAST(round(1e6 * CAST(u2 AS DOUBLE) /
       |           (2.0 * CAST(CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE))) AS BIGINT)
       |    AS auc_ppm FROM pointm),
       |wts AS (
       |  SELECT p_u, y, b,
       |         CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
       |              WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
       |              WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
       |              WHEN u < 4294609777 THEN 6 WHEN u < 4294923276 THEN 7
       |              ELSE 8 END AS w
       |  FROM (
       |    SELECT s.p_u, s.y, r.b,
       |           ('0x' || substring(md5(CAST(s.vec_id AS VARCHAR) || ':'
       |             || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT AS u
       |    FROM scored s, (SELECT unnest(range(64)) AS b) r)),
       |rhist AS (
       |  SELECT b, p_u, sum(CASE WHEN y = 1 THEN w ELSE 0 END) AS pc, sum(w) AS c
       |  FROM wts GROUP BY 1, 2),
       |rscan AS (
       |  SELECT b, pc, c - pc AS nc,
       |         coalesce(sum(c - pc) OVER (PARTITION BY b ORDER BY p_u
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
       |  FROM rhist),
       |raucs AS (
       |  SELECT b,
       |         CAST(round(1e6 * CAST(sum(CAST(pc AS HUGEINT)
       |                * (2 * CAST(nb AS HUGEINT) + nc)) AS DOUBLE)
       |           / (2.0 * CAST(CAST(sum(pc) AS HUGEINT) * sum(nc) AS DOUBLE)))
       |           AS BIGINT) AS rep_ppm
       |  FROM rscan GROUP BY 1),
       |ranked AS (
       |  SELECT rep_ppm, row_number() OVER (ORDER BY rep_ppm, b) AS rn FROM raucs),
       |ci AS (
       |  SELECT count(*) AS b_reps,
       |         max(CASE WHEN rn = 2 THEN rep_ppm END) AS lo_ppm,
       |         max(CASE WHEN rn = 63 THEN rep_ppm END) AS hi_ppm
       |  FROM ranked)
       |SELECT p.auc_ppm, ci.lo_ppm, ci.hi_ppm, CAST(ci.b_reps AS BIGINT) AS b_reps
       |FROM point p CROSS JOIN ci""".stripMargin

  // ---------------------------------------------------------------
  // Precision/recall sweep over fixed thresholds
  // ---------------------------------------------------------------

  /** PRECISION–RECALL SWEEP at the nine fixed operating points
    * p ≥ 0.1 … 0.9. The sweep joins the 9-row threshold table against
    * the score HISTOGRAM (broadcast inequality join over ≤9·1e6
    * bounded pairs — never the corpus), so adding rows to the corpus
    * changes only the histogram build. A left join keeps operating
    * points that select nothing (precision NULL→0 rows distinguish
    * via pred_pos=0). */
  def prThresholds(spark: SparkSession, dir: String): DataFrame = {
    val h = hist(spark, dir)
    val tot = h.agg(sum(col("pc")).as("pos_total"), sum(col("c")).as("n_total"))
    val thr = spark.range(1, 10)
      .select((col("id") * 100000L).as("thr_ppm"))
    broadcast(thr)
      .join(h, col("p_u") >= col("thr_ppm"), "left")
      .groupBy(col("thr_ppm"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("pred_pos"),
        coalesce(sum(col("pc")), lit(0L)).as("tp"))
      .crossJoin(broadcast(tot))
      .select(col("thr_ppm"), col("pred_pos"), col("tp"),
        when(col("pred_pos") > 0L,
          round(lit(1e6) * col("tp").cast("double") / col("pred_pos").cast("double"))
            .cast("long")).as("precision_ppm"),
        round(lit(1e6) * col("tp").cast("double") / col("pos_total").cast("double"))
          .cast("long").as("recall_ppm"),
        round(lit(2e6) * col("tp").cast("double") /
          (col("pred_pos") + col("pos_total")).cast("double"))
          .cast("long").as("f1_ppm"))
      .orderBy(col("thr_ppm"))
  }

  val prThresholdsSql: String =
    s"""WITH $scoredSql, $histSql,
       |thr AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) * 100000 AS thr_ppm),
       |tot AS (SELECT sum(pc) AS pos_total, sum(c) AS n_total FROM hist),
       |sweep AS (
       |  SELECT t.thr_ppm,
       |         coalesce(sum(h.c), 0) AS pred_pos,
       |         coalesce(sum(h.pc), 0) AS tp
       |  FROM thr t LEFT JOIN hist h ON h.p_u >= t.thr_ppm
       |  GROUP BY 1)
       |SELECT s.thr_ppm, CAST(s.pred_pos AS BIGINT) AS pred_pos,
       |       CAST(s.tp AS BIGINT) AS tp,
       |       CASE WHEN s.pred_pos > 0 THEN
       |         CAST(round(1e6 * CAST(s.tp AS DOUBLE) / CAST(s.pred_pos AS DOUBLE)) AS BIGINT)
       |       END AS precision_ppm,
       |       CAST(round(1e6 * CAST(s.tp AS DOUBLE) / CAST(t.pos_total AS DOUBLE)) AS BIGINT) AS recall_ppm,
       |       CAST(round(2e6 * CAST(s.tp AS DOUBLE) /
       |            CAST(s.pred_pos + t.pos_total AS DOUBLE)) AS BIGINT) AS f1_ppm
       |FROM sweep s, tot t ORDER BY s.thr_ppm""".stripMargin

  // ---------------------------------------------------------------
  // Calibration (reliability diagram)
  // ---------------------------------------------------------------

  /** RELIABILITY DIAGRAM over ten equal-width probability bins:
    * per bin the mean predicted probability vs the observed positive
    * rate, both in exact ppm (Σp_u is an exact integer sum; each mean
    * is ONE rounded division), and the signed calibration gap. The
    * expected-calibration-error aggregation is left to the caller —
    * the bins are the sufficient statistic. One compact-key shuffle
    * (≤10 cells). */
  def calibration(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .withColumn("bin", least(col("p_u") / lit(100000L), lit(9L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("p_u")).as("sp"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("sp").cast("double") / col("n").cast("double"))
          .cast("long").as("mean_pred_ppm"),
        round(lit(1e6) * col("pos").cast("double") / col("n").cast("double"))
          .cast("long").as("frac_pos_ppm"))
      .withColumn("gap_ppm", col("mean_pred_ppm") - col("frac_pos_ppm"))
      .orderBy(col("bin"))

  val calibrationSql: String =
    s"""WITH $scoredSql,
       |b AS (
       |  SELECT least(p_u // 100000, 9) AS bin, count(*) AS n,
       |         sum(y) AS pos, sum(p_u) AS sp
       |  FROM scored GROUP BY 1)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
       |       CAST(pos AS BIGINT) AS pos,
       |       CAST(round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS mean_pred_ppm,
       |       CAST(round(1e6 * CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS frac_pos_ppm,
       |       CAST(round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
       |         - CAST(round(1e6 * CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS gap_ppm
       |FROM b ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------
  // Proper scoring rules: Brier + log loss
  // ---------------------------------------------------------------

  /** BRIER SCORE and LOG LOSS, the two proper scoring rules. Each
    * per-row term quantizes ONCE to micro-units (the ln contract:
    * both engines feed the identical double p_u/1e6 into ln/(·)²),
    * the sums are exact integers, and each mean is one final rounded
    * division — so Spark's parallel partial sums and DuckDB's serial
    * sum agree bit-for-bit. The clamp in [[scored]] keeps ln finite. */
  def brierLogloss(spark: SparkSession, dir: String): DataFrame = {
    val e = col("p_u").cast("double") / lit(1000000.0d)
    val diff = e - col("y").cast("double")
    scored(spark, dir)
      .select(col("y"),
        round(lit(1e6) * diff * diff).cast("long").as("b_u"),
        round(lit(-1e6) * when(col("y") === 1L, log(e))
          .otherwise(log(lit(1.0d) - e))).cast("long").as("ll_u"))
      .agg(count(lit(1)).as("n"), sum(col("b_u")).as("sb"), sum(col("ll_u")).as("sl"))
      .select(col("n"),
        round(col("sb").cast("double") / col("n").cast("double"))
          .cast("long").as("brier_micro"),
        round(col("sl").cast("double") / col("n").cast("double"))
          .cast("long").as("logloss_micro"))
  }

  val brierLoglossSql: String =
    s"""WITH $scoredSql,
       |t AS (
       |  SELECT y,
       |         CAST(round(1e6 * (CAST(p_u AS DOUBLE) / 1000000.0 - CAST(y AS DOUBLE))
       |                        * (CAST(p_u AS DOUBLE) / 1000000.0 - CAST(y AS DOUBLE))) AS BIGINT) AS b_u,
       |         CAST(round(-1e6 * (CASE WHEN y = 1
       |           THEN ln(CAST(p_u AS DOUBLE) / 1000000.0)
       |           ELSE ln(1.0 - CAST(p_u AS DOUBLE) / 1000000.0) END)) AS BIGINT) AS ll_u
       |  FROM scored),
       |m AS (SELECT count(*) AS n, sum(b_u) AS sb, sum(ll_u) AS sl FROM t)
       |SELECT CAST(n AS BIGINT) AS n,
       |       CAST(round(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS brier_micro,
       |       CAST(round(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS logloss_micro
       |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // Gain chart (cumulative capture by score decile)
  // ---------------------------------------------------------------

  /** GAIN CHART: rank the pool by score (ties broken by label then
    * vec_id — a total order, so both engines bin identically), cut
    * into ten equal-rank deciles (floor-div binning:
    * decile = (rank−1)·10 div n + 1), report per-decile positives,
    * cumulative capture rate, and lift vs the base rate.
    *
    * Executed on the score-HISTOGRAM path (the r10 verdict's task #1:
    * the first cut ranked every scored row through one
    * `Exchange SinglePartition` window). With the tie-break refined
    * to (p_u DESC, y, vec_id) — applied identically in the oracle —
    * rows inside one (p_u, y) cell are interchangeable, so each
    * cell's contribution to each decile is a pure integer overlap of
    * its global rank interval [cum−c+1, cum] with the decile's rank
    * range [⌈(d−1)n/10⌉+1, ⌈dn/10⌉]. Only the ≤2·(1e6+1)-key
    * (p_u, y) histogram ever sorts; every division is exact integer
    * `div` (the r10 advisory: long `/` is IEEE double division and
    * can disagree with the integer floor past n ≈ 2⁴⁹). */
  def gainDeciles(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy(col("p_u").desc, col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored(spark, dir)
      .groupBy(col("p_u"), col("y")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_total", sum(col("c")).over(Window.partitionBy()))
      // deciles this (p_u, y) cell touches: decile(firstRank)..decile(lastRank)
      .withColumn("d_lo", expr("((cum - c) * 10) div n_total + 1"))
      .withColumn("d_hi", expr("((cum - 1) * 10) div n_total + 1"))
      .select(col("y"), col("c"), col("cum"), col("n_total"),
        explode(sequence(col("d_lo"), col("d_hi"))).as("decile"))
      // decile d covers global ranks [⌈(d−1)n/10⌉+1, ⌈dn/10⌉]
      .withColumn("lo_d", expr("((decile - 1) * n_total + 9) div 10 + 1"))
      .withColumn("hi_d", expr("(decile * n_total + 9) div 10"))
      .withColumn("contrib",
        least(col("cum"), col("hi_d")) -
          greatest(col("cum") - col("c") + 1L, col("lo_d")) + 1L)
      .groupBy(col("decile"))
      .agg(sum(col("contrib")).as("n"),
        sum(when(col("y") === 1L, col("contrib")).otherwise(0L)).as("pos"),
        max(col("n_total")).as("nt"))
      .withColumn("cum_pos", sum(col("pos")).over(cum))
      .withColumn("pos_total", sum(col("pos")).over(Window.partitionBy()))
      .select(col("decile"), col("n"), col("pos"),
        round(lit(1e6) * col("cum_pos").cast("double") / col("pos_total").cast("double"))
          .cast("long").as("capture_ppm"),
        round(lit(1e6) * (col("pos").cast("double") / col("n").cast("double")) /
          (col("pos_total").cast("double") / col("nt").cast("double")))
          .cast("long").as("lift_ppm"))
      .orderBy(col("decile"))
  }

  val gainDecilesSql: String =
    s"""WITH $scoredSql,
       |ranked AS (
       |  SELECT y,
       |         CAST(row_number() OVER (ORDER BY p_u DESC, y, vec_id) AS BIGINT) AS rn,
       |         CAST(count(*) OVER () AS BIGINT) AS n_total
       |  FROM scored),
       |d AS (
       |  SELECT ((rn - 1) * 10) // n_total + 1 AS decile, count(*) AS n,
       |         sum(y) AS pos, max(n_total) AS nt
       |  FROM ranked GROUP BY 1),
       |c AS (
       |  SELECT decile, n, pos, nt,
       |         sum(pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cum_pos,
       |         sum(pos) OVER () AS pos_total
       |  FROM d)
       |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
       |       CAST(pos AS BIGINT) AS pos,
       |       CAST(round(1e6 * CAST(cum_pos AS DOUBLE) / CAST(pos_total AS DOUBLE)) AS BIGINT) AS capture_ppm,
       |       CAST(round(1e6 * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) /
       |            (CAST(pos_total AS DOUBLE) / CAST(nt AS DOUBLE))) AS BIGINT) AS lift_ppm
       |FROM c ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------
  // Fairness audit: per-group rates + parity gaps
  // ---------------------------------------------------------------

  /** GROUP-FAIRNESS AUDIT of the curation filter: per document
    * language (the natural protected attribute in a multilingual
    * corpus — a quality classifier that silently under-selects one
    * language skews the training mix), the predicted-positive rate,
    * TPR and FPR at the 0.5 operating point, plus the two standard
    * parity gaps repeated on every row: demographic-parity gap
    * (max−min selection rate) and equalized-odds gap (max−min TPR).
    * Every rate is ONE ppm-rounded integer division; groups with no
    * positives/negatives yield NULL rates, which the max/min gap
    * windows skip (SQL NULL-ignoring semantics, both engines).
    * Scale shape: one vec_id↔doc_id equi join (co-partitioned ids —
    * AQE picks the join side), then a compact-key groupBy(lang);
    * the gap windows run over the ≤|languages| aggregate only. */
  def fairnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val pred = col("p_u") >= 500000L
    val all = Window.partitionBy()
    val rate = (num: Column, den: Column) =>
      when(den > 0L, round(lit(1e6) * num.cast("double") / den.cast("double"))
        .cast("long"))
    scored(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        col("vec_id") === col("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(pred, 1L).otherwise(0L)).as("sel"),
        sum(col("y")).as("pos"),
        sum(when(pred && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && col("y") === 0L, 1L).otherwise(0L)).as("fp"))
      .select(col("lang"), col("n"),
        rate(col("sel"), col("n")).as("sel_rate_ppm"),
        rate(col("tp"), col("pos")).as("tpr_ppm"),
        rate(col("fp"), col("n") - col("pos")).as("fpr_ppm"))
      .withColumn("dp_gap_ppm",
        max(col("sel_rate_ppm")).over(all) - min(col("sel_rate_ppm")).over(all))
      .withColumn("eo_gap_ppm",
        max(col("tpr_ppm")).over(all) - min(col("tpr_ppm")).over(all))
      .orderBy(col("lang"))
  }

  val fairnessAuditSql: String =
    s"""WITH $scoredSql,
       |g AS (
       |  SELECT d.lang, count(*) AS n,
       |         sum(CASE WHEN s.p_u >= 500000 THEN 1 ELSE 0 END) AS sel,
       |         sum(s.y) AS pos,
       |         sum(CASE WHEN s.p_u >= 500000 AND s.y = 1 THEN 1 ELSE 0 END) AS tp,
       |         sum(CASE WHEN s.p_u >= 500000 AND s.y = 0 THEN 1 ELSE 0 END) AS fp
       |  FROM scored s JOIN documents d ON s.vec_id = d.doc_id
       |  GROUP BY 1),
       |r AS (
       |  SELECT lang, CAST(n AS BIGINT) AS n,
       |         CASE WHEN n > 0 THEN CAST(round(1e6 * CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) END AS sel_rate_ppm,
       |         CASE WHEN pos > 0 THEN CAST(round(1e6 * CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)) AS BIGINT) END AS tpr_ppm,
       |         CASE WHEN n - pos > 0 THEN CAST(round(1e6 * CAST(fp AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS BIGINT) END AS fpr_ppm
       |  FROM g)
       |SELECT lang, n, sel_rate_ppm, tpr_ppm, fpr_ppm,
       |       max(sel_rate_ppm) OVER () - min(sel_rate_ppm) OVER () AS dp_gap_ppm,
       |       max(tpr_ppm) OVER () - min(tpr_ppm) OVER () AS eo_gap_ppm
       |FROM r ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------
  // PSI score drift between two deterministic cohorts
  // ---------------------------------------------------------------

  /** POPULATION STABILITY INDEX between a reference and a live cohort
    * of the score distribution — the standard production monitor for
    * "has the input population shifted under my model". The two
    * cohorts are deterministic halves (vec_id parity — standing in
    * for the training-time batch vs the serving window). Scores are
    * cut into the ten equal-width bins; Laplace +1 smoothing on every
    * (bin, cohort) cell keeps ln finite on empty bins and is part of
    * the published contract. Per-bin contribution (p−q)·ln(p/q) is
    * quantized ONCE to ppm — the ln argument is evaluated as the
    * integer-rational ((cr+1)·tl)/((cl+1)·tr) so both engines feed ln
    * identical doubles — and the headline PSI is the exact integer
    * sum of the rounded contributions (window over the 10-row bin
    * table). Scale shape: one compact-key (bin,cohort) aggregation is
    * the only data-sized stage; the bin spine join and gap windows
    * touch ≤10 rows. */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    val bins = spark.range(0, 10).select(col("id").cast("long").as("bin"))
    val counts = scored(spark, dir)
      .withColumn("bin", least(col("p_u") / lit(100000L), lit(9L)).cast("long"))
      .groupBy(col("bin"))
      .agg(sum(when(col("vec_id") % 2 === 0L, 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("vec_id") % 2 =!= 0L, 1L).otherwise(0L)).as("live_n"))
    broadcast(bins).join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("live_n"), lit(0L)).as("live_n"))
      .withColumn("tr", sum(col("ref_n")).over(all) + lit(10L))
      .withColumn("tl", sum(col("live_n")).over(all) + lit(10L))
      .withColumn("psi_contrib_ppm",
        round(lit(1e6) *
          ((col("ref_n") + 1L).cast("double") / col("tr").cast("double") -
           (col("live_n") + 1L).cast("double") / col("tl").cast("double")) *
          log((dec(col("ref_n") + 1L) * col("tl")).cast("double") /
              (dec(col("live_n") + 1L) * col("tr")).cast("double")))
          .cast("long"))
      .withColumn("psi_ppm", sum(col("psi_contrib_ppm")).over(all))
      .select(col("bin"), col("ref_n"), col("live_n"),
        col("psi_contrib_ppm"), col("psi_ppm"))
      .orderBy(col("bin"))
  }

  val psiDriftSql: String =
    s"""WITH $scoredSql,
       |counts AS (
       |  SELECT least(p_u // 100000, 9) AS bin,
       |         sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS ref_n,
       |         sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS live_n
       |  FROM scored GROUP BY 1),
       |spine AS (
       |  SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bin),
       |filled AS (
       |  SELECT s.bin, coalesce(c.ref_n, 0) AS ref_n, coalesce(c.live_n, 0) AS live_n
       |  FROM spine s LEFT JOIN counts c ON s.bin = c.bin),
       |t AS (
       |  SELECT bin, ref_n, live_n,
       |         sum(ref_n) OVER () + 10 AS tr, sum(live_n) OVER () + 10 AS tl
       |  FROM filled),
       |c2 AS (
       |  SELECT bin, ref_n, live_n,
       |         CAST(round(1e6 *
       |           (CAST(ref_n + 1 AS DOUBLE) / CAST(tr AS DOUBLE) -
       |            CAST(live_n + 1 AS DOUBLE) / CAST(tl AS DOUBLE)) *
       |           ln(CAST(CAST(ref_n + 1 AS HUGEINT) * tl AS DOUBLE) /
       |              CAST(CAST(live_n + 1 AS HUGEINT) * tr AS DOUBLE))) AS BIGINT)
       |           AS psi_contrib_ppm
       |  FROM t)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(ref_n AS BIGINT) AS ref_n,
       |       CAST(live_n AS BIGINT) AS live_n, psi_contrib_ppm,
       |       CAST(sum(psi_contrib_ppm) OVER () AS BIGINT) AS psi_ppm
       |FROM c2 ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------
  // Leave-one-out target encoding
  // ---------------------------------------------------------------

  /** LEAVE-ONE-OUT TARGET ENCODING of a categorical feature — the
    * standard high-cardinality encoder for tree/linear models, with
    * the self-exclusion that prevents target leakage: a customer's
    * market segment encodes as the mean account balance of the
    * OTHER members of the segment, (Σ_grp − y_i)/(n_grp − 1), plus
    * the additively-smoothed variant (m = 10 pseudo-observations of
    * the global prior) that tames singleton groups. Targets ride as
    * exact integer cents; each encoding is ONE double division over
    * exact integers, rounded to cents (the smoothed form adds the
    * identical prior double m·S/N on both engines before its one
    * division). Singleton groups fall back to the global LOO prior
    * (S − y)/(N − 1). Scale shape: group statistics come from a
    * map-side-combinable groupBy (compact keys), broadcast-joined
    * back to the data — NO per-row window over skewed segment
    * partitions; the output edge is embarrassingly parallel. */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100.0d).cast("long").as("y_cents"))
    val grp = base.groupBy(col("seg"))
      .agg(sum(col("y_cents")).as("sg"), count(lit(1)).as("grp_n"))
    val glob = base.agg(sum(col("y_cents")).as("s_all"),
      count(lit(1)).as("n_all"))
    val prior = col("s_all").cast("double") / col("n_all").cast("double")
    base.join(broadcast(grp), Seq("seg"))
      .crossJoin(broadcast(glob))
      .select(col("c_custkey"), col("seg"), col("grp_n"),
        when(col("grp_n") > 1L,
          round((col("sg") - col("y_cents")).cast("double") /
            (col("grp_n") - 1L).cast("double")))
          .otherwise(
            round((col("s_all") - col("y_cents")).cast("double") /
              (col("n_all") - 1L).cast("double")))
          .cast("long").as("loo_cents"),
        round(((col("sg") - col("y_cents")).cast("double") + lit(10.0d) * prior) /
          (col("grp_n") - 1L + 10L).cast("double"))
          .cast("long").as("smooth_cents"))
      .orderBy(col("c_custkey"))
  }

  val targetEncodeSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_mktsegment AS seg,
      |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS y_cents
      |  FROM customer),
      |grp AS (SELECT seg, sum(y_cents) AS sg, count(*) AS grp_n FROM base GROUP BY 1),
      |gstats AS (SELECT sum(y_cents) AS s_all, count(*) AS n_all FROM base)
      |SELECT b.c_custkey, b.seg, CAST(g.grp_n AS BIGINT) AS grp_n,
      |       CAST(CASE WHEN g.grp_n > 1
      |         THEN round(CAST(g.sg - b.y_cents AS DOUBLE) / CAST(g.grp_n - 1 AS DOUBLE))
      |         ELSE round(CAST(a.s_all - b.y_cents AS DOUBLE) / CAST(a.n_all - 1 AS DOUBLE))
      |       END AS BIGINT) AS loo_cents,
      |       CAST(round((CAST(g.sg - b.y_cents AS DOUBLE) +
      |                   10.0 * CAST(a.s_all AS DOUBLE) / CAST(a.n_all AS DOUBLE)) /
      |                  CAST(g.grp_n - 1 + 10 AS DOUBLE)) AS BIGINT) AS smooth_cents
      |FROM base b JOIN grp g USING (seg), gstats a
      |ORDER BY b.c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // CUPED variance reduction
  // ---------------------------------------------------------------

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    * standard experimentation variance-reduction: adjust each user's
    * experiment metric Y by their pre-period covariate X,
    * Yᵃᵈʲ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled across
    * variants. The calendar midpoint splits pre/post; per-user X and
    * Y are exact conditional integer-cent sums from ONE
    * groupBy(user); θ's moments (ΣX, ΣY, ΣXY, ΣX²) ride
    * DECIMAL(38,0)/HUGEINT (the corrMatrix overflow discipline), so
    * the adjusted means need NO second data pass — they are closed
    * forms over per-variant sums and the pooled θ. Reported:
    * per-variant raw and adjusted means (milli-units), θ (milli),
    * and the theoretical variance reduction ρ² (ppm). Scale shape:
    * one user-keyed shuffle, then a 1-row reduce. */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = ev.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / lit(2L))
        .cast("long").as("mid_us"))
    val users = ev.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (unix_micros(col("ts")) < col("mid_us")).as("pre"),
        round(col("value") * 100.0d).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("a", pmod(col("user_id"), lit(2L)) === 0L)
    val m = users.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec(col("x")) * col("y")).as("sxy"),
      sum(dec(col("x")) * col("x")).as("sxx"),
      sum(dec(col("y")) * col("y")).as("syy"),
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("a"), col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("a"), col("y")).otherwise(0L)).as("sya"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      sum(when(!col("a"), col("x")).otherwise(0L)).as("sxb"),
      sum(when(!col("a"), col("y")).otherwise(0L)).as("syb"))
    def d(c: String) = col(c).cast("double")
    val covXY = d("sxy") - d("sx") * d("sy") / d("n")
    val varX = d("sxx") - d("sx") * d("sx") / d("n")
    val varY = d("syy") - d("sy") * d("sy") / d("n")
    val theta = when(varX > 0d, covXY / varX).otherwise(lit(0.0d))
    val xbar = d("sx") / d("n")
    def adj(sy: String, sx: String, n: String) =
      d(sy) / d(n) - theta * (d(sx) / d(n) - xbar)
    m.select(col("na"), col("nb"),
      round(lit(10.0d) * d("sya") / d("na")).cast("long").as("mean_a_milli"),
      round(lit(10.0d) * d("syb") / d("nb")).cast("long").as("mean_b_milli"),
      round(lit(10.0d) * adj("sya", "sxa", "na")).cast("long").as("adj_a_milli"),
      round(lit(10.0d) * adj("syb", "sxb", "nb")).cast("long").as("adj_b_milli"),
      round(lit(1e3) * theta).cast("long").as("theta_milli"),
      when(varX > 0d && varY > 0d,
        round(lit(1e6) * covXY * covXY / (varX * varY)).cast("long"))
        .otherwise(lit(0L)).as("var_reduction_ppm"))
  }

  val cupedSql: String =
    """WITH bounds AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT) AS mid_us
      |  FROM events),
      |users AS (
      |  SELECT user_id,
      |         sum(CASE WHEN epoch_us(ts) < b.mid_us
      |                  THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS x,
      |         sum(CASE WHEN epoch_us(ts) >= b.mid_us
      |                  THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END) AS y,
      |         user_id % 2 = 0 AS a
      |  FROM events, bounds b GROUP BY user_id),
      |m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |         sum(CAST(x AS HUGEINT) * y) AS sxy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(y AS HUGEINT) * y) AS syy,
      |         count(*) FILTER (WHERE a) AS na,
      |         coalesce(sum(x) FILTER (WHERE a), 0) AS sxa,
      |         coalesce(sum(y) FILTER (WHERE a), 0) AS sya,
      |         count(*) FILTER (WHERE NOT a) AS nb,
      |         coalesce(sum(x) FILTER (WHERE NOT a), 0) AS sxb,
      |         coalesce(sum(y) FILTER (WHERE NOT a), 0) AS syb
      |  FROM users),
      |t AS (
      |  SELECT *,
      |         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cxy,
      |         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS vx,
      |         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS vy
      |  FROM m),
      |t2 AS (
      |  SELECT *, CASE WHEN vx > 0 THEN cxy / vx ELSE 0.0 END AS theta,
      |         CAST(sx AS DOUBLE) / n AS xbar
      |  FROM t)
      |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |       CAST(round(10.0 * CAST(sya AS DOUBLE) / na) AS BIGINT) AS mean_a_milli,
      |       CAST(round(10.0 * CAST(syb AS DOUBLE) / nb) AS BIGINT) AS mean_b_milli,
      |       CAST(round(10.0 * (CAST(sya AS DOUBLE) / na
      |         - theta * (CAST(sxa AS DOUBLE) / na - xbar))) AS BIGINT) AS adj_a_milli,
      |       CAST(round(10.0 * (CAST(syb AS DOUBLE) / nb
      |         - theta * (CAST(sxb AS DOUBLE) / nb - xbar))) AS BIGINT) AS adj_b_milli,
      |       CAST(round(1e3 * theta) AS BIGINT) AS theta_milli,
      |       CASE WHEN vx > 0 AND vy > 0
      |            THEN CAST(round(1e6 * cxy * cxy / (vx * vy)) AS BIGINT)
      |            ELSE 0 END AS var_reduction_ppm
      |FROM t2""".stripMargin

  // ---------------------------------------------------------------
  // Difference-in-differences
  // ---------------------------------------------------------------

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental workhorse:
    * with treatment = odd user ids and the calendar midpoint as the
    * intervention, DiD = (ȲT,post − ȲT,pre) − (ȲC,post − ȲC,pre)
    * cancels both the group baseline and the common time trend. The
    * 2×2 cell means come from ONE full-scan aggregation of exact
    * integer cents; the z statistic uses per-cell variances (squares
    * on DECIMAL(38,0)). Everything downstream of the single agg is
    * a 1-row expression. */
  def did(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = ev.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / lit(2L))
        .cast("long").as("mid_us"))
    val cells = ev.crossJoin(broadcast(bounds))
      .select((pmod(col("user_id"), lit(2L)) === 1L).as("treated"),
        (unix_micros(col("ts")) >= col("mid_us")).as("post"),
        round(col("value") * 100.0d).cast("long").as("cents"))
    def cell(t: Boolean, p: Boolean, e: Column) =
      sum(when(col("treated") === t && col("post") === p, e).otherwise(lit(0L)))
    val m = cells.agg(
      cell(true, false, lit(1L)).as("n_tp"), cell(true, false, col("cents")).as("s_tp"),
      cell(true, false, dec(col("cents")) * col("cents")).as("q_tp"),
      cell(true, true, lit(1L)).as("n_ta"), cell(true, true, col("cents")).as("s_ta"),
      cell(true, true, dec(col("cents")) * col("cents")).as("q_ta"),
      cell(false, false, lit(1L)).as("n_cp"), cell(false, false, col("cents")).as("s_cp"),
      cell(false, false, dec(col("cents")) * col("cents")).as("q_cp"),
      cell(false, true, lit(1L)).as("n_ca"), cell(false, true, col("cents")).as("s_ca"),
      cell(false, true, dec(col("cents")) * col("cents")).as("q_ca"))
    def d(c: String) = col(c).cast("double")
    def mean(s: String, n: String) = d(s) / d(n)
    def varTerm(q: String, s: String, n: String) =
      (d(q) / d(n) - mean(s, n) * mean(s, n)) / d(n)
    val didC = (mean("s_ta", "n_ta") - mean("s_tp", "n_tp")) -
      (mean("s_ca", "n_ca") - mean("s_cp", "n_cp"))
    val se = sqrt(varTerm("q_ta", "s_ta", "n_ta") + varTerm("q_tp", "s_tp", "n_tp") +
      varTerm("q_ca", "s_ca", "n_ca") + varTerm("q_cp", "s_cp", "n_cp"))
    m.select(
      col("n_tp"), col("n_ta"), col("n_cp"), col("n_ca"),
      round(lit(10.0d) * mean("s_tp", "n_tp")).cast("long").as("t_pre_milli"),
      round(lit(10.0d) * mean("s_ta", "n_ta")).cast("long").as("t_post_milli"),
      round(lit(10.0d) * mean("s_cp", "n_cp")).cast("long").as("c_pre_milli"),
      round(lit(10.0d) * mean("s_ca", "n_ca")).cast("long").as("c_post_milli"),
      round(lit(10.0d) * didC).cast("long").as("did_milli"),
      round(didC / se, 4).as("z"))
  }

  val didSql: String =
    """WITH bounds AS (
      |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT) AS mid_us
      |  FROM events),
      |ev AS (
      |  SELECT user_id % 2 = 1 AS treated, epoch_us(ts) >= b.mid_us AS post,
      |         CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events, bounds b),
      |m AS (
      |  SELECT
      |    count(*) FILTER (WHERE treated AND NOT post) AS n_tp,
      |    coalesce(sum(cents) FILTER (WHERE treated AND NOT post), 0) AS s_tp,
      |    coalesce(sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE treated AND NOT post), 0) AS q_tp,
      |    count(*) FILTER (WHERE treated AND post) AS n_ta,
      |    coalesce(sum(cents) FILTER (WHERE treated AND post), 0) AS s_ta,
      |    coalesce(sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE treated AND post), 0) AS q_ta,
      |    count(*) FILTER (WHERE NOT treated AND NOT post) AS n_cp,
      |    coalesce(sum(cents) FILTER (WHERE NOT treated AND NOT post), 0) AS s_cp,
      |    coalesce(sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE NOT treated AND NOT post), 0) AS q_cp,
      |    count(*) FILTER (WHERE NOT treated AND post) AS n_ca,
      |    coalesce(sum(cents) FILTER (WHERE NOT treated AND post), 0) AS s_ca,
      |    coalesce(sum(CAST(cents AS HUGEINT) * cents) FILTER (WHERE NOT treated AND post), 0) AS q_ca
      |  FROM ev),
      |e AS (
      |  SELECT *,
      |    (CAST(s_ta AS DOUBLE)/n_ta - CAST(s_tp AS DOUBLE)/n_tp)
      |      - (CAST(s_ca AS DOUBLE)/n_ca - CAST(s_cp AS DOUBLE)/n_cp) AS did_c,
      |    sqrt((CAST(q_ta AS DOUBLE)/n_ta - (CAST(s_ta AS DOUBLE)/n_ta)*(CAST(s_ta AS DOUBLE)/n_ta))/n_ta
      |       + (CAST(q_tp AS DOUBLE)/n_tp - (CAST(s_tp AS DOUBLE)/n_tp)*(CAST(s_tp AS DOUBLE)/n_tp))/n_tp
      |       + (CAST(q_ca AS DOUBLE)/n_ca - (CAST(s_ca AS DOUBLE)/n_ca)*(CAST(s_ca AS DOUBLE)/n_ca))/n_ca
      |       + (CAST(q_cp AS DOUBLE)/n_cp - (CAST(s_cp AS DOUBLE)/n_cp)*(CAST(s_cp AS DOUBLE)/n_cp))/n_cp) AS se
      |  FROM m)
      |SELECT CAST(n_tp AS BIGINT) AS n_tp, CAST(n_ta AS BIGINT) AS n_ta,
      |       CAST(n_cp AS BIGINT) AS n_cp, CAST(n_ca AS BIGINT) AS n_ca,
      |       CAST(round(10.0 * CAST(s_tp AS DOUBLE) / n_tp) AS BIGINT) AS t_pre_milli,
      |       CAST(round(10.0 * CAST(s_ta AS DOUBLE) / n_ta) AS BIGINT) AS t_post_milli,
      |       CAST(round(10.0 * CAST(s_cp AS DOUBLE) / n_cp) AS BIGINT) AS c_pre_milli,
      |       CAST(round(10.0 * CAST(s_ca AS DOUBLE) / n_ca) AS BIGINT) AS c_post_milli,
      |       CAST(round(10.0 * did_c) AS BIGINT) AS did_milli,
      |       round(did_c / se, 4) AS z
      |FROM e""".stripMargin

  // ---------------------------------------------------------------
  // Split-conformal calibration
  // ---------------------------------------------------------------

  /** SPLIT-CONFORMAL CALIBRATION at α = 0.1 — the
    * distribution-free prediction-set recipe: on a calibration half
    * (vec_id mod 4 < 2) take the ⌈(n+1)(1−α)⌉-th smallest
    * nonconformity score s = |10⁶·y − p_u| (an exact integer order
    * statistic — ceil division on integers, no float quantile), then
    * audit empirical coverage s ≤ q̂ on the held-out half, which the
    * conformal guarantee lower-bounds by 1−α in expectation. The
    * order statistic is found through the SCORE HISTOGRAM (≤1e6+1
    * keys): cumulative counts over the compact histogram, never a
    * data-sized sort. Scale shape: two compact-key aggs + a 1-row
    * broadcast join. */
  def conformal(spark: SparkSession, dir: String): DataFrame = {
    val pool = scored(spark, dir)
      .withColumn("s", abs(lit(1000000L) * col("y") - col("p_u")))
      .withColumn("cal", pmod(col("vec_id"), lit(4L)) < 2L)
    val calHist = pool.filter(col("cal"))
      .groupBy(col("s")).agg(count(lit(1)).as("c"))
    val cum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nCal = calHist.agg(sum(col("c")).as("n_cal"))
    val q = calHist.crossJoin(broadcast(nCal))
      .withColumn("cc", sum(col("c")).over(cum))
      .withColumn("k", expr("((n_cal + 1) * 9 + 9) div 10"))
      .filter(col("cc") >= col("k"))
      .agg(min(col("s")).as("q_hat"), max(col("k")).as("k"),
        max(col("n_cal")).as("n_cal"))
    pool.filter(!col("cal"))
      .crossJoin(broadcast(q))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        max(col("k")).as("k_rank"), max(col("q_hat")).as("q_hat"),
        sum(when(col("s") <= col("q_hat"), 1L).otherwise(0L)).as("covered"))
      .select(col("n_cal"), col("n_test"), col("k_rank"), col("q_hat"),
        col("covered"),
        round(lit(1e6) * col("covered").cast("double") /
          col("n_test").cast("double")).cast("long").as("coverage_ppm"))
  }

  val conformalSql: String =
    s"""WITH $scoredSql,
       |pool AS (
       |  SELECT vec_id, y, p_u, abs(1000000 * y - p_u) AS s,
       |         vec_id % 4 < 2 AS cal
       |  FROM scored),
       |calhist AS (
       |  SELECT s, count(*) AS c FROM pool WHERE cal GROUP BY 1),
       |ncal AS (SELECT sum(c) AS n_cal FROM calhist),
       |cumh AS (
       |  SELECT s, sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cc,
       |         ((n.n_cal + 1) * 9 + 9) // 10 AS k, n.n_cal
       |  FROM calhist, ncal n),
       |q AS (
       |  SELECT min(s) AS q_hat, max(k) AS k, max(n_cal) AS n_cal
       |  FROM cumh WHERE cc >= k),
       |t AS (
       |  SELECT max(q.n_cal) AS n_cal, count(*) AS n_test, max(q.k) AS k_rank,
       |         max(q.q_hat) AS q_hat,
       |         sum(CASE WHEN p.s <= q.q_hat THEN 1 ELSE 0 END) AS covered
       |  FROM pool p, q WHERE NOT p.cal)
       |SELECT CAST(n_cal AS BIGINT) AS n_cal, CAST(n_test AS BIGINT) AS n_test,
       |       CAST(k_rank AS BIGINT) AS k_rank, CAST(q_hat AS BIGINT) AS q_hat,
       |       CAST(covered AS BIGINT) AS covered,
       |       CAST(round(1e6 * CAST(covered AS DOUBLE) / CAST(n_test AS DOUBLE)) AS BIGINT) AS coverage_ppm
       |FROM t""".stripMargin

  // ---------------------------------------------------------------
  // Propensity-score matching with balance diagnostics
  // ---------------------------------------------------------------

  /** PROPENSITY-SCORE MATCHING (nearest neighbor, with replacement)
    * + the balance diagnostic that justifies it: treated units
    * (odd vec_id) match to the nearest control score; covariate
    * balance is reported as the standardized mean difference of the
    * first embedding coordinate before vs after matching. The match
    * runs entirely in SCORE space: control units collapse to
    * per-score stats (≤1e6 keys — count, Σx, with x the micro-int
    * covariate and the per-score control mean re-quantized to an
    * integer so post-match sums stay exact), the nearest control
    * score per distinct treated score comes from ONE ordered scan of
    * the merged score spine (running max for the backward candidate,
    * reverse running min for the forward; closer wins, ties
    * backward), and treated rows then join their match on the
    * compact score key. No data-sized sort, no O(n²) pairing —
    * the classic sorted-merge as-of shape on bounded keys. */
  def propensityMatch(spark: SparkSession, dir: String): DataFrame = {
    val pool = scored(spark, dir)
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("eid"),
          round(element_at(col("embedding"), 1).cast("double") * 1000000d)
            .cast("long").as("x")),
        col("vec_id") === col("eid"))
      .select(col("vec_id"), col("p_u"), col("x"),
        (pmod(col("vec_id"), lit(2L)) === 1L).as("treated"))
    // ONE data-sized pass: every downstream quantity is a function of
    // per-score conditional sufficient statistics, so the corpus is
    // scanned exactly once and everything after this agg runs on the
    // ≤1e6-key score table (the r10 scale-probe fix: the row-level
    // formulation recomputed the scored pool 4x and went 13x at 10x)
    val perScore = pool.groupBy(col("p_u")).agg(
      sum(when(!col("treated"), 1L).otherwise(0L)).as("cc"),
      sum(when(!col("treated"), col("x")).otherwise(0L)).as("csx"),
      sum(when(!col("treated"), dec(col("x")) * col("x")).otherwise(lit(0L))).as("csxx"),
      sum(when(col("treated"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("treated"), col("x")).otherwise(0L)).as("tsx"),
      sum(when(col("treated"), dec(col("x")) * col("x")).otherwise(lit(0L))).as("tsxx"))
    // per-score control mean, re-quantized to exact micro ints
    val ctrl = perScore.filter(col("cc") > 0L)
      .select(col("p_u").as("m"),
        round(col("csx").cast("double") / col("cc").cast("double"))
          .cast("long").as("xbar_c"))
    val bwd = Window.orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.orderBy(col("p_u"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = perScore
      .withColumn("b", max(when(col("cc") > 0L, col("p_u"))).over(bwd))
      .withColumn("f", min(when(col("cc") > 0L, col("p_u"))).over(fwd))
      .withColumn("m",
        when(col("f").isNull, col("b"))
          .when(col("b").isNull, col("f"))
          .when(col("p_u") - col("b") <= col("f") - col("p_u"), col("b"))
          .otherwise(col("f")))
      .join(ctrl, Seq("m"), "left")
    def d(c: Column) = c.cast("double")
    val m = matched.agg(
      sum(col("tc")).as("n_t"),
      sum(col("tsx")).as("stx"), sum(col("tsxx")).as("stxx"),
      sum(dec(col("tc")) * col("xbar_c")).as("smx"),
      sum(dec(col("tc")) * col("xbar_c") * col("xbar_c")).as("smxx"),
      sum(dec(col("tc")) * abs(col("p_u") - col("m"))).as("gap"),
      sum(col("cc")).as("n_c"),
      sum(col("csx")).as("scx"), sum(col("csxx")).as("scxx"))
    def meanC(s: String, n: String) = d(col(s)) / d(col(n))
    def varC(q: String, s: String, n: String) =
      d(col(q)) / d(col(n)) - meanC(s, n) * meanC(s, n)
    val smdBefore = (meanC("stx", "n_t") - meanC("scx", "n_c")) /
      sqrt((varC("stxx", "stx", "n_t") + varC("scxx", "scx", "n_c")) / lit(2.0d))
    val smdAfter = (meanC("stx", "n_t") - meanC("smx", "n_t")) /
      sqrt((varC("stxx", "stx", "n_t") + varC("smxx", "smx", "n_t")) / lit(2.0d))
    m.select(col("n_t"), col("n_c"),
      round(d(col("gap")) / d(col("n_t"))).cast("long").as("mean_gap_ppm"),
      round(lit(1e3) * smdBefore).cast("long").as("smd_before_milli"),
      round(lit(1e3) * smdAfter).cast("long").as("smd_after_milli"))
  }

  val propensityMatchSql: String =
    s"""WITH $scoredSql,
       |pool AS (
       |  SELECT s.vec_id, s.p_u,
       |         CAST(round(CAST(e.embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x,
       |         s.vec_id % 2 = 1 AS treated
       |  FROM scored s JOIN embeddings e ON s.vec_id = e.vec_id),
       |ctrl AS (
       |  SELECT p_u,
       |         CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS xbar_c
       |  FROM pool WHERE NOT treated GROUP BY 1),
       |spine AS (
       |  SELECT p_u, bool_or(is_c) AS has_c FROM (
       |    SELECT p_u, TRUE AS is_c FROM ctrl
       |    UNION ALL
       |    SELECT DISTINCT p_u, FALSE AS is_c FROM pool WHERE treated)
       |  GROUP BY 1),
       |matched AS (
       |  SELECT p_u,
       |         CASE WHEN f IS NULL THEN b
       |              WHEN b IS NULL THEN f
       |              WHEN p_u - b <= f - p_u THEN b ELSE f END AS m
       |  FROM (
       |    SELECT p_u,
       |           max(CASE WHEN has_c THEN p_u END) OVER
       |             (ORDER BY p_u ROWS UNBOUNDED PRECEDING) AS b,
       |           min(CASE WHEN has_c THEN p_u END) OVER
       |             (ORDER BY p_u ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
       |    FROM spine)),
       |tr AS (
       |  SELECT p.x, c.xbar_c, abs(p.p_u - mt.m) AS gap
       |  FROM pool p JOIN matched mt ON p.p_u = mt.p_u
       |       JOIN ctrl c ON mt.m = c.p_u
       |  WHERE p.treated),
       |cstats AS (
       |  SELECT count(*) AS n_c, sum(x) AS scx,
       |         sum(CAST(x AS HUGEINT) * x) AS scxx
       |  FROM pool WHERE NOT treated),
       |tstats AS (
       |  SELECT count(*) AS n_t, sum(x) AS stx,
       |         sum(CAST(x AS HUGEINT) * x) AS stxx,
       |         sum(xbar_c) AS smx, sum(CAST(xbar_c AS HUGEINT) * xbar_c) AS smxx,
       |         sum(gap) AS gap
       |  FROM tr),
       |e AS (
       |  SELECT t.*, c.n_c, c.scx, c.scxx,
       |    (CAST(stx AS DOUBLE)/n_t - CAST(scx AS DOUBLE)/n_c) /
       |      sqrt(((CAST(stxx AS DOUBLE)/n_t - (CAST(stx AS DOUBLE)/n_t)*(CAST(stx AS DOUBLE)/n_t))
       |          + (CAST(scxx AS DOUBLE)/n_c - (CAST(scx AS DOUBLE)/n_c)*(CAST(scx AS DOUBLE)/n_c))) / 2.0)
       |      AS smd_before,
       |    (CAST(stx AS DOUBLE)/n_t - CAST(smx AS DOUBLE)/n_t) /
       |      sqrt(((CAST(stxx AS DOUBLE)/n_t - (CAST(stx AS DOUBLE)/n_t)*(CAST(stx AS DOUBLE)/n_t))
       |          + (CAST(smxx AS DOUBLE)/n_t - (CAST(smx AS DOUBLE)/n_t)*(CAST(smx AS DOUBLE)/n_t))) / 2.0)
       |      AS smd_after
       |  FROM tstats t, cstats c)
       |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |       CAST(round(CAST(gap AS DOUBLE) / n_t) AS BIGINT) AS mean_gap_ppm,
       |       CAST(round(1e3 * smd_before) AS BIGINT) AS smd_before_milli,
       |       CAST(round(1e3 * smd_after) AS BIGINT) AS smd_after_milli
       |FROM e""".stripMargin

  // ---------------------------------------------------------------
  // Decision stump (depth-1 tree training)
  // ---------------------------------------------------------------

  /** DECISION-STUMP TRAINING — the depth-1 CART split that anchors
    * boosting and the classic "can one feature separate the labels?"
    * curation screen. Feature = the first embedding coordinate
    * quantized to MILLI buckets (≤ ~2001 keys at any corpus size —
    * this bucketing IS the classic pre-sort-free histogram split
    * finder of distributed tree learners), label = the class parity.
    * Candidate split "x ≤ b" for every bucket b: cumulative (n, pos)
    * from one window over the bounded bucket table gives both sides'
    * class counts; the split score is the weighted Gini numerator
    * pL·negL/nL + pR·negR/nR (ONE double expression per candidate,
    * quantized to milli), argmin with ties to the smaller threshold.
    * Scale: one map-side-combinable bucket agg is the only data-sized
    * stage; the sweep orders ~2k rows. */
  def decisionStump(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.embeddings(spark, dir)
      .select((col("label").cast("long") % 2L).as("y"),
        round(element_at(col("embedding"), 1).cast("double") * 1000.0d)
          .cast("long").as("b"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("pb"))
    val cum = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = buckets.agg(sum(col("nb")).as("n"), sum(col("pb")).as("pos"))
    def d(c: Column) = c.cast("double")
    val swept = buckets.crossJoin(broadcast(tot))
      .withColumn("nl", sum(col("nb")).over(cum))
      .withColumn("pl", sum(col("pb")).over(cum))
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("pr", col("pos") - col("pl"))
      .filter(col("nr") > 0L)
      .withColumn("cost_milli",
        round(lit(1e3) * (d(col("pl")) * d(col("nl") - col("pl")) / d(col("nl")) +
          d(col("pr")) * d(col("nr") - col("pr")) / d(col("nr")))).cast("long"))
    swept.orderBy(col("cost_milli"), col("b")).limit(1)
      .select(col("b").as("threshold_milli"), col("cost_milli"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"),
        round(lit(1e6) * (greatest(d(col("pl")), d(col("nl") - col("pl"))) +
          greatest(d(col("pr")), d(col("nr") - col("pr")))) / d(col("n")))
          .cast("long").as("acc_ppm"))
  }

  val decisionStumpSql: String =
    """WITH buckets AS (
      |  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1000.0) AS BIGINT) AS b,
      |         count(*) AS nb, sum(CAST(label AS BIGINT) % 2) AS pb
      |  FROM embeddings GROUP BY 1),
      |tot AS (SELECT sum(nb) AS n, sum(pb) AS pos FROM buckets),
      |swept AS (
      |  SELECT b,
      |         sum(nb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS nl,
      |         sum(pb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS pl,
      |         t.n, t.pos
      |  FROM buckets, tot t),
      |scoredsplits AS (
      |  SELECT b, nl, pl, n - nl AS nr, pos - pl AS pr, n,
      |         CAST(round(1e3 * (
      |           CAST(pl AS DOUBLE) * (nl - pl) / nl +
      |           CAST(pos - pl AS DOUBLE) * ((n - nl) - (pos - pl)) / (n - nl)))
      |           AS BIGINT) AS cost_milli
      |  FROM swept WHERE n - nl > 0)
      |SELECT b AS threshold_milli, cost_milli,
      |       CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
      |       CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
      |       CAST(round(1e6 * (greatest(CAST(pl AS DOUBLE), CAST(nl - pl AS DOUBLE)) +
      |            greatest(CAST(pr AS DOUBLE), CAST(nr - pr AS DOUBLE))) / n) AS BIGINT) AS acc_ppm
      |FROM scoredsplits ORDER BY cost_milli, threshold_milli LIMIT 1""".stripMargin

  // ---------------------------------------------------------------
  // K-fold cross-validation
  // ---------------------------------------------------------------

  /** 5-FOLD CROSS-VALIDATION of the scorer — the variance-of-the-
    * metric audit behind every "is the model actually better?" call:
    * folds are the deterministic vec_id mod 5, and per fold both the
    * exact midrank AUC and the mean log-loss reduce through the
    * (fold, p_u) HISTOGRAM (≤ 5e6 keys at any corpus size). AUC rides
    * doubled integer units with DECIMAL(38,0) products (the
    * corrMatrix discipline); log-loss quantizes −ln p per HISTOGRAM
    * KEY to integer micro-nats and sums those exactly, so the
    * cross-row float-summation-order hazard never exists. One row per
    * fold — the judge of fold-to-fold metric spread. */
  def kfoldCv(spark: SparkSession, dir: String): DataFrame = {
    val h = scored(spark, dir)
      .withColumn("fold", pmod(col("vec_id"), lit(5L)))
      .groupBy(col("fold"), col("p_u"))
      .agg(sum(col("y")).as("pc"), count(lit(1)).as("c"))
    val below = Window.partitionBy(col("fold")).orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def d(c: Column) = c.cast("double")
    val p = col("p_u").cast("double") / lit(1e6)
    h.withColumn("nb", coalesce(sum(col("c") - col("pc")).over(below), lit(0L)))
      .withColumn("u2", dec(col("pc")) * (lit(2L) * col("nb") + (col("c") - col("pc"))))
      .withColumn("ll_u", dec(col("pc")) * round(lit(-1e6) * log(p)).cast("long") +
        dec(col("c") - col("pc")) * round(lit(-1e6) * log(lit(1.0d) - p)).cast("long"))
      .groupBy(col("fold"))
      .agg(sum(col("c")).as("n"), sum(col("pc")).as("pos"),
        sum(col("u2")).as("u2"), sum(col("ll_u")).as("ll"))
      .select(col("fold"), col("n"), col("pos"),
        round(lit(1e6) * d(col("u2")) /
          (lit(2.0d) * d(col("pos")) * d(col("n") - col("pos"))))
          .cast("long").as("auc_ppm"),
        round(d(col("ll")) / d(col("n"))).cast("long").as("logloss_micro"))
      .orderBy(col("fold"))
  }

  val kfoldCvSql: String =
    s"""WITH $scoredSql,
       |h AS (
       |  SELECT vec_id % 5 AS fold, p_u, sum(y) AS pc, count(*) AS c
       |  FROM scored GROUP BY 1, 2),
       |r AS (
       |  SELECT fold, p_u, pc, c,
       |         coalesce(sum(c - pc) OVER (PARTITION BY fold ORDER BY p_u
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
       |  FROM h),
       |m AS (
       |  SELECT fold, sum(c) AS n, sum(pc) AS pos,
       |         sum(CAST(pc AS HUGEINT) * (2 * nb + (c - pc))) AS u2,
       |         sum(CAST(pc AS HUGEINT) *
       |               CAST(round(-1e6 * ln(CAST(p_u AS DOUBLE) / 1e6)) AS BIGINT)
       |           + CAST(c - pc AS HUGEINT) *
       |               CAST(round(-1e6 * ln(1.0 - CAST(p_u AS DOUBLE) / 1e6)) AS BIGINT)) AS ll
       |  FROM r GROUP BY 1)
       |SELECT CAST(fold AS BIGINT) AS fold, CAST(n AS BIGINT) AS n,
       |       CAST(pos AS BIGINT) AS pos,
       |       CAST(round(1e6 * CAST(u2 AS DOUBLE) /
       |            (2.0 * pos * (n - pos))) AS BIGINT) AS auc_ppm,
       |       CAST(round(CAST(ll AS DOUBLE) / n) AS BIGINT) AS logloss_micro
       |FROM m ORDER BY fold""".stripMargin

  // ---------------------------------------------------------------
  // Logistic regression by full-batch gradient descent
  // ---------------------------------------------------------------

  /** LOGISTIC-REGRESSION TRAINING — 3 full-batch gradient-descent
    * steps on two embedding features, the canonical distributed
    * learner: each step is ONE map-side-combinable full scan that
    * reduces the gradient ∇ = Σ(σ(w·x) − y)·x against the current
    * 1-row broadcast weight state, then a 1-row update. Weights live
    * as integer MICRO-units between steps and each row's gradient
    * contribution is micro-quantized BEFORE the sum (fixed-point GD —
    * the same chained-iteration parity discipline as pagerank: both
    * engines execute identical double ops on identical integers, so
    * three chained steps stay bit-equal where free-floating sums
    * would drift and be summation-order-dependent). η = 1. Output:
    * trained weights, train accuracy and mean log-loss at the final
    * weights. At 100 TB: 4 scans, zero shuffles beyond the 3-key agg,
    * state is 3 integers. */
  def logregGd(spark: SparkSession, dir: String): DataFrame = {
    val pool = Tables.embeddings(spark, dir)
      .select((col("label").cast("long") % 2L).as("y"),
        round(element_at(col("embedding"), 1).cast("double") * 1000000d)
          .cast("long").as("x1u"),
        round(element_at(col("embedding"), 2).cast("double") * 1000000d)
          .cast("long").as("x2u"))
    def d(c: Column) = c.cast("double")
    def sigma(w0: Column, w1: Column, w2: Column) =
      lit(1.0d) / (lit(1.0d) + exp(-(d(w0) / 1e6 +
        d(w1) / 1e6 * (d(col("x1u")) / 1e6) +
        d(w2) / 1e6 * (d(col("x2u")) / 1e6))))
    def step(w: DataFrame): DataFrame =
      pool.crossJoin(broadcast(w))
        .withColumn("r", sigma(col("w0"), col("w1"), col("w2")) - d(col("y")))
        .agg(count(lit(1)).as("n"),
          max(col("w0")).as("pw0"), max(col("w1")).as("pw1"),
          max(col("w2")).as("pw2"),
          sum(round(lit(1e6) * col("r")).cast("long")).as("g0"),
          sum(round(lit(1e6) * col("r") * (d(col("x1u")) / 1e6)).cast("long")).as("g1"),
          sum(round(lit(1e6) * col("r") * (d(col("x2u")) / 1e6)).cast("long")).as("g2"))
        .select(
          (col("pw0") - round(d(col("g0")) / d(col("n"))).cast("long")).as("w0"),
          (col("pw1") - round(d(col("g1")) / d(col("n"))).cast("long")).as("w1"),
          (col("pw2") - round(d(col("g2")) / d(col("n"))).cast("long")).as("w2"))
    val w0 = spark.range(1).select(lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"))
    val w3 = step(step(step(w0)))
    pool.crossJoin(broadcast(w3))
      .withColumn("p", sigma(col("w0"), col("w1"), col("w2")))
      .withColumn("pu", least(greatest(round(lit(1e6) * col("p")).cast("long"),
        lit(1L)), lit(999999L)))
      .agg(count(lit(1)).as("n"),
        max(col("w0")).as("w0_u"), max(col("w1")).as("w1_u"),
        max(col("w2")).as("w2_u"),
        sum(when((col("p") >= 0.5d) === (col("y") === 1L), 1L).otherwise(0L)).as("correct"),
        sum(when(col("y") === 1L,
          -round(lit(1e6) * log(d(col("pu")) / 1e6)).cast("long"))
          .otherwise(-round(lit(1e6) * log(lit(1.0d) - d(col("pu")) / 1e6)).cast("long")))
          .as("ll"))
      .select(col("n"), col("w0_u"), col("w1_u"), col("w2_u"),
        round(lit(1e6) * d(col("correct")) / d(col("n"))).cast("long").as("acc_ppm"),
        round(d(col("ll")) / d(col("n"))).cast("long").as("logloss_micro"))
  }

  private def logregStepSql(prev: String, out: String): String =
    s"""$out AS (
       |  SELECT pw0 - CAST(round(CAST(g0 AS DOUBLE) / n) AS BIGINT) AS w0,
       |         pw1 - CAST(round(CAST(g1 AS DOUBLE) / n) AS BIGINT) AS w1,
       |         pw2 - CAST(round(CAST(g2 AS DOUBLE) / n) AS BIGINT) AS w2
       |  FROM (
       |    SELECT count(*) AS n, max(w.w0) AS pw0, max(w.w1) AS pw1, max(w.w2) AS pw2,
       |           sum(CAST(round(1e6 * (1.0 / (1.0 + exp(-(CAST(w.w0 AS DOUBLE) / 1e6
       |             + CAST(w.w1 AS DOUBLE) / 1e6 * (CAST(p.x1u AS DOUBLE) / 1e6)
       |             + CAST(w.w2 AS DOUBLE) / 1e6 * (CAST(p.x2u AS DOUBLE) / 1e6)))) - p.y))
       |             AS BIGINT)) AS g0,
       |           sum(CAST(round(1e6 * (1.0 / (1.0 + exp(-(CAST(w.w0 AS DOUBLE) / 1e6
       |             + CAST(w.w1 AS DOUBLE) / 1e6 * (CAST(p.x1u AS DOUBLE) / 1e6)
       |             + CAST(w.w2 AS DOUBLE) / 1e6 * (CAST(p.x2u AS DOUBLE) / 1e6)))) - p.y)
       |             * (CAST(p.x1u AS DOUBLE) / 1e6)) AS BIGINT)) AS g1,
       |           sum(CAST(round(1e6 * (1.0 / (1.0 + exp(-(CAST(w.w0 AS DOUBLE) / 1e6
       |             + CAST(w.w1 AS DOUBLE) / 1e6 * (CAST(p.x1u AS DOUBLE) / 1e6)
       |             + CAST(w.w2 AS DOUBLE) / 1e6 * (CAST(p.x2u AS DOUBLE) / 1e6)))) - p.y)
       |             * (CAST(p.x2u AS DOUBLE) / 1e6)) AS BIGINT)) AS g2
       |    FROM pool p, $prev w))""".stripMargin

  val logregGdSql: String =
    s"""WITH pool AS (
       |  SELECT CAST(label AS BIGINT) % 2 AS y,
       |         CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS x1u,
       |         CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS x2u
       |  FROM embeddings),
       |wi AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
       |${logregStepSql("wi", "wa")},
       |${logregStepSql("wa", "wb")},
       |${logregStepSql("wb", "wc")},
       |m AS (
       |  SELECT count(*) AS n, max(w.w0) AS w0_u, max(w.w1) AS w1_u, max(w.w2) AS w2_u,
       |         sum(CASE WHEN (sig >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS correct,
       |         sum(CASE WHEN y = 1
       |                  THEN -CAST(round(1e6 * ln(CAST(pu AS DOUBLE) / 1e6)) AS BIGINT)
       |                  ELSE -CAST(round(1e6 * ln(1.0 - CAST(pu AS DOUBLE) / 1e6)) AS BIGINT)
       |             END) AS ll
       |  FROM (
       |    SELECT p.y, w.w0, w.w1, w.w2,
       |           1.0 / (1.0 + exp(-(CAST(w.w0 AS DOUBLE) / 1e6
       |             + CAST(w.w1 AS DOUBLE) / 1e6 * (CAST(p.x1u AS DOUBLE) / 1e6)
       |             + CAST(w.w2 AS DOUBLE) / 1e6 * (CAST(p.x2u AS DOUBLE) / 1e6)))) AS sig,
       |           least(greatest(CAST(round(1e6 * (1.0 / (1.0 + exp(-(CAST(w.w0 AS DOUBLE) / 1e6
       |             + CAST(w.w1 AS DOUBLE) / 1e6 * (CAST(p.x1u AS DOUBLE) / 1e6)
       |             + CAST(w.w2 AS DOUBLE) / 1e6 * (CAST(p.x2u AS DOUBLE) / 1e6)))))) AS BIGINT),
       |             1), 999999) AS pu
       |    FROM pool p, wc w) t, wc w)
       |SELECT CAST(n AS BIGINT) AS n, w0_u, w1_u, w2_u,
       |       CAST(round(1e6 * CAST(correct AS DOUBLE) / n) AS BIGINT) AS acc_ppm,
       |       CAST(round(CAST(ll AS DOUBLE) / n) AS BIGINT) AS logloss_micro
       |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // KS score separation
  // ---------------------------------------------------------------

  /** KS SCORE SEPARATION — the credit-scoring industry's standard
    * discrimination metric: max over thresholds of
    * |CDF⁺(t) − CDF⁻(t)|, i.e. the best single-threshold separation
    * the score achieves. Rides the same ≤1e6-key score histogram as
    * AUC: cumulative positive/negative counts from one bounded
    * ordered scan; each threshold's separation is milli-quantized
    * (identical integer inputs → identical double → identical
    * round), the max is then pure integer ordering, ties to the
    * smallest threshold. Also reports the threshold and both CDFs
    * there — the operating point a score cutoff would use. */
  def ksScore(spark: SparkSession, dir: String): DataFrame = {
    val cum = Window.orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    val h = hist(spark, dir)
      .withColumn("cpos", sum(col("pc")).over(cum))
      .withColumn("cneg", sum(col("c") - col("pc")).over(cum))
    val tot = hist(spark, dir)
      .agg(sum(col("pc")).as("npos"), sum(col("c") - col("pc")).as("nneg"))
    h.crossJoin(broadcast(tot))
      .withColumn("sep_milli",
        round(lit(1e3) * abs(d(col("cpos")) / d(col("npos")) -
          d(col("cneg")) / d(col("nneg")))).cast("long"))
      .orderBy(col("sep_milli").desc, col("p_u"))
      .limit(1)
      .select(col("npos"), col("nneg"),
        col("p_u").as("threshold_u"), col("sep_milli").as("ks_milli"),
        round(lit(1e6) * d(col("cpos")) / d(col("npos"))).cast("long").as("cdf_pos_ppm"),
        round(lit(1e6) * d(col("cneg")) / d(col("nneg"))).cast("long").as("cdf_neg_ppm"))
  }

  val ksScoreSql: String =
    s"""WITH $scoredSql,
       |$histSql,
       |cumh AS (
       |  SELECT p_u,
       |         sum(pc) OVER (ORDER BY p_u ROWS UNBOUNDED PRECEDING) AS cpos,
       |         sum(c - pc) OVER (ORDER BY p_u ROWS UNBOUNDED PRECEDING) AS cneg
       |  FROM hist),
       |tot AS (SELECT sum(pc) AS npos, sum(c - pc) AS nneg FROM hist)
       |SELECT CAST(npos AS BIGINT) AS npos, CAST(nneg AS BIGINT) AS nneg,
       |       p_u AS threshold_u,
       |       CAST(round(1e3 * abs(CAST(cpos AS DOUBLE) / npos
       |            - CAST(cneg AS DOUBLE) / nneg)) AS BIGINT) AS ks_milli,
       |       CAST(round(1e6 * CAST(cpos AS DOUBLE) / npos) AS BIGINT) AS cdf_pos_ppm,
       |       CAST(round(1e6 * CAST(cneg AS DOUBLE) / nneg) AS BIGINT) AS cdf_neg_ppm
       |FROM cumh, tot
       |ORDER BY ks_milli DESC, threshold_u LIMIT 1""".stripMargin

  /** OPTIMAL OPERATING POINT — the decision the nine-point
    * [[prThresholds]] sweep defers: pick the classification threshold
    * that MAXIMIZES F1, and the one maximizing Youden's J
    * (TPR − FPR, the ROC point farthest from chance). Every candidate
    * threshold is a distinct score value, so the full sweep is a
    * cumulative scan of the ≤1e6-key score histogram: tp/fp/fn at
    * threshold t are prefix sums, each candidate's F1 and J quantize
    * to ppm from exact integer ratios, and the argmax (ties → the
    * HIGHER threshold, i.e. the more conservative classifier) is an
    * integer comparison on both engines. */
  def bestThreshold(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy(col("p_u").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist(spark, dir)
      .withColumn("tp", sum(col("pc")).over(wCum))
      .withColumn("pp", sum(col("c")).over(wCum))
      .withColumn("pos", sum(col("pc")).over(Window.partitionBy()))
      .withColumn("nall", sum(col("c")).over(Window.partitionBy()))
      .select(col("p_u"), col("tp"), (col("pp") - col("tp")).as("fp"),
        (col("pos") - col("tp")).as("fn"),
        (col("nall") - col("pos")).as("neg"))
      .withColumn("f1_ppm", round(lit(1e6) * lit(2d) * col("tp").cast("double") /
        (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")).cast("long"))
      .withColumn("j_ppm", round(lit(1e6) *
        (col("tp").cast("double") / (col("tp") + col("fn")).cast("double") -
          col("fp").cast("double") / col("neg").cast("double"))).cast("long"))
    def pick(scoreCol: String, label: String) = h
      .orderBy(col(scoreCol).desc, col("p_u").desc).limit(1)
      .select(lit(label).as("criterion"), col("p_u").as("threshold_u"),
        col("tp"), col("fp"), col("fn"), col(scoreCol).as("score_ppm"))
    pick("f1_ppm", "best_f1").unionByName(pick("j_ppm", "best_youden_j"))
      .orderBy(col("criterion"))
  }

  val bestThresholdSql: String =
    s"""WITH $scoredSql, $histSql,
       |cum AS (
       |  SELECT p_u,
       |         sum(pc) OVER (ORDER BY p_u DESC ROWS UNBOUNDED PRECEDING) AS tp,
       |         sum(c) OVER (ORDER BY p_u DESC ROWS UNBOUNDED PRECEDING) AS pp,
       |         sum(pc) OVER () AS pos, sum(c) OVER () AS nall
       |  FROM hist),
       |sc AS (
       |  SELECT p_u, tp, pp - tp AS fp, pos - tp AS fn, nall - pos AS neg,
       |         CAST(round(1e6 * 2.0 * tp / (2 * tp + (pp - tp) + (pos - tp))) AS BIGINT)
       |           AS f1_ppm,
       |         CAST(round(1e6 * (CAST(tp AS DOUBLE) / pos
       |              - CAST(pp - tp AS DOUBLE) / (nall - pos))) AS BIGINT) AS j_ppm
       |  FROM cum)
       |SELECT * FROM (
       |  SELECT 'best_f1' AS criterion, p_u AS threshold_u,
       |         CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |         CAST(fn AS BIGINT) AS fn, f1_ppm AS score_ppm
       |  FROM sc ORDER BY f1_ppm DESC, p_u DESC LIMIT 1)
       |UNION ALL
       |SELECT * FROM (
       |  SELECT 'best_youden_j' AS criterion, p_u AS threshold_u,
       |         CAST(tp AS BIGINT), CAST(fp AS BIGINT), CAST(fn AS BIGINT),
       |         j_ppm AS score_ppm
       |  FROM sc ORDER BY j_ppm DESC, p_u DESC LIMIT 1)
       |ORDER BY criterion""".stripMargin

  /** PR-AUC / AVERAGE PRECISION — the class-imbalance-honest summary
    * beside [[auc]]'s ROC number (ROC AUC stays high under extreme
    * imbalance; AP collapses toward the prevalence, which is what a
    * curation gate hunting rare positives should see). Step-wise AP
    * over every distinct score threshold:
    * AP = Σ_t (tp_t − tp_{t−1})/P · tp_t/pp_t — all prefix sums over
    * the ≤1e6-key score histogram; each threshold's term quantizes to
    * micro ONCE and the headline is their exact integer sum (the
    * per-term-quantization contract — no cross-term float order).
    * Reports the prevalence floor a random ranker scores. */
  def prAuc(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy(col("p_u").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy(col("p_u").desc)
    hist(spark, dir)
      .withColumn("tp", sum(col("pc")).over(wCum))
      .withColumn("pp", sum(col("c")).over(wCum))
      .withColumn("tp_prev", coalesce(lag(col("tp"), 1).over(wLag), lit(0L)))
      .withColumn("pos", sum(col("pc")).over(Window.partitionBy()))
      .withColumn("nall", sum(col("c")).over(Window.partitionBy()))
      .withColumn("contrib_micro",
        round(lit(1e6) * (dec(col("tp") - col("tp_prev")) * col("tp")).cast("double") /
          (dec(col("pos")) * col("pp")).cast("double")).cast("long"))
      .groupBy()
      .agg(max(col("nall")).as("n"), max(col("pos")).as("pos"),
        sum(col("contrib_micro")).as("ap_micro"))
      .select(col("n"), col("pos"), col("ap_micro"),
        round(lit(1e6) * col("pos").cast("double") / col("n").cast("double"))
          .cast("long").as("prevalence_micro"))
  }

  val prAucSql: String =
    s"""WITH $scoredSql, $histSql,
       |cum AS (
       |  SELECT p_u,
       |         sum(pc) OVER (ORDER BY p_u DESC ROWS UNBOUNDED PRECEDING) AS tp,
       |         sum(c) OVER (ORDER BY p_u DESC ROWS UNBOUNDED PRECEDING) AS pp,
       |         sum(pc) OVER () AS pos, sum(c) OVER () AS nall
       |  FROM hist),
       |cum2 AS (
       |  SELECT *, coalesce(lag(tp) OVER (ORDER BY p_u DESC), 0) AS tp_prev FROM cum)
       |SELECT CAST(max(nall) AS BIGINT) AS n, CAST(max(pos) AS BIGINT) AS pos,
       |       CAST(sum(CAST(round(1e6 * CAST((tp - tp_prev) * tp AS DOUBLE)
       |            / CAST(pos * pp AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ap_micro,
       |       CAST(round(1e6 * CAST(max(pos) AS DOUBLE) / max(nall)) AS BIGINT)
       |         AS prevalence_micro
       |FROM cum2""".stripMargin

  /** McNEMAR'S TEST — "is classifier B actually better than A, or is
    * the accuracy delta noise?" — the PAIRED comparison the holdout
    * split can't answer with two independent accuracies, because both
    * classifiers score the SAME items. A is the standing gate (the
    * logistic over coords 0–7, [[scored]]); B is the challenger over
    * the NEXT 8 coords (8–15) — the real-world shape of "we retrained
    * the quality filter on new features; ship it?". Only the
    * discordant pairs carry information: b = A right ∧ B wrong,
    * c = A wrong ∧ B right; χ² = (|b−c|−1)²/(b+c) with continuity
    * correction. The σ(6·logit) ≥ ½ decision is equivalent to
    * logit_u ≥ 0, so the whole test is INTEGER end-to-end — no
    * transcendental at all, the one division is the final milli
    * quantization. Scale: ONE pass over the exploded coords into a
    * per-vector 2-sum agg (map-side combinable), then a 1-row census. */
  def mcnemar(spark: SparkSession, dir: String): DataFrame = {
    val perVec = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .filter(col("pos0") < 16)
      .groupBy(col("vec_id"), col("label"))
      .agg(
        sum(when(col("pos0") < 8,
          round(col("v").cast("double") * 1000000d).cast("long"))
          .otherwise(0L)).as("la_u"),
        sum(when(col("pos0") >= 8,
          round(col("v").cast("double") * 1000000d).cast("long"))
          .otherwise(0L)).as("lb_u"))
      .select((col("label") % 2).as("y"),
        (col("la_u") >= 0L).cast("long").as("pa"),
        (col("lb_u") >= 0L).cast("long").as("pb"))
    def d(c: Column) = c.cast("double")
    perVec
      .select(col("y"), (col("pa") === col("y")).cast("long").as("ca"),
        (col("pb") === col("y")).cast("long").as("cb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ca") === 1L && col("cb") === 0L, 1L).otherwise(0L)).as("b"),
        sum(when(col("ca") === 0L && col("cb") === 1L, 1L).otherwise(0L)).as("c"),
        sum(col("ca")).as("na_correct"), sum(col("cb")).as("nb_correct"))
      .select(col("n"), col("b"), col("c"),
        round(lit(1e6) * d(col("na_correct")) / d(col("n"))).cast("long")
          .as("acc_a_ppm"),
        round(lit(1e6) * d(col("nb_correct")) / d(col("n"))).cast("long")
          .as("acc_b_ppm"),
        round(lit(1e3) * (abs(col("b") - col("c")) - lit(1)).cast("double") *
          (abs(col("b") - col("c")) - lit(1)).cast("double") /
          d(col("b") + col("c"))).cast("long").as("chi2_milli"))
  }

  val mcnemarSql: String =
    """WITH pv AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         sum(CASE WHEN pos <= 8 THEN vq ELSE 0 END) AS la_u,
      |         sum(CASE WHEN pos > 8 THEN vq ELSE 0 END) AS lb_u
      |  FROM (SELECT vec_id, label,
      |               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
      |                 AS BIGINT) AS vq,
      |               generate_subscripts(embedding, 1) AS pos
      |        FROM embeddings)
      |  WHERE pos <= 16 GROUP BY 1, 2),
      |cls AS (
      |  SELECT label % 2 AS y,
      |         CASE WHEN la_u >= 0 THEN 1 ELSE 0 END AS pa,
      |         CASE WHEN lb_u >= 0 THEN 1 ELSE 0 END AS pb
      |  FROM pv),
      |cc AS (
      |  SELECT y, CASE WHEN pa = y THEN 1 ELSE 0 END AS ca,
      |         CASE WHEN pb = y THEN 1 ELSE 0 END AS cb
      |  FROM cls),
      |m AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN ca = 1 AND cb = 0 THEN 1 ELSE 0 END) AS b,
      |         sum(CASE WHEN ca = 0 AND cb = 1 THEN 1 ELSE 0 END) AS c,
      |         sum(ca) AS na_correct, sum(cb) AS nb_correct
      |  FROM cc)
      |SELECT CAST(n AS BIGINT) AS n, CAST(b AS BIGINT) AS b,
      |       CAST(c AS BIGINT) AS c,
      |       CAST(round(1e6 * CAST(na_correct AS DOUBLE) / CAST(n AS DOUBLE))
      |         AS BIGINT) AS acc_a_ppm,
      |       CAST(round(1e6 * CAST(nb_correct AS DOUBLE) / CAST(n AS DOUBLE))
      |         AS BIGINT) AS acc_b_ppm,
      |       CAST(round(1e3 * CAST(abs(b - c) - 1 AS DOUBLE)
      |            * CAST(abs(b - c) - 1 AS DOUBLE)
      |            / CAST(b + c AS DOUBLE)) AS BIGINT) AS chi2_milli
      |FROM m""".stripMargin

  /** EXPECTED CALIBRATION ERROR + Murphy decomposition — the SCALAR
    * verdict over [[calibration]]'s per-bin reliability table: ECE
    * (n-weighted mean |confidence − accuracy| over the 10 equal-width
    * bins), MCE (the worst bin), and the Brier decomposition
    * REL − RES + UNC that says WHERE the Brier score comes from.
    * The per-bin deviation is the EXACT integer |Σp_u − 1e6·Σy| (since
    * n_b·conf = Σp_u/1e6 and n_b·acc = Σy), so ECE needs only ONE
    * division; REL/RES quantize per bin to nano units and integer-sum
    * (the per-term-quantization contract — no cross-bin float order).
    * Scale: everything reduces through the ≤1e6-key score histogram,
    * then a 10-row bin table — map-side combinable throughout. */
  def ece(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val bins = hist(spark, dir)
      .withColumn("bin", least(col("p_u") / lit(100000L), lit(9L)).cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("nb"), sum(col("pc")).as("pos"),
        sum(dec(col("p_u")) * col("c")).as("sp"))
      .withColumn("n", sum(col("nb")).over(Window.partitionBy()))
      .withColumn("p", sum(col("pos")).over(Window.partitionBy()))
      .withColumn("dev_micro",
        abs(col("sp") - dec(col("pos")) * lit(1000000L)).cast("decimal(38,0)"))
    bins
      .withColumn("rel_nano",
        round(d(col("dev_micro")) * d(col("dev_micro")) /
          (lit(1e3) * d(col("nb")) * d(col("n")))).cast("long"))
      .withColumn("res_nano",
        round(lit(1e9) *
          (d(col("pos")) * d(col("n")) - d(col("nb")) * d(col("p"))) *
          (d(col("pos")) * d(col("n")) - d(col("nb")) * d(col("p"))) /
          (d(col("nb")) * d(col("n")) * d(col("n")) * d(col("n"))))
          .cast("long"))
      .withColumn("mce_ppm",
        round(d(col("dev_micro")) / d(col("nb"))).cast("long"))
      .groupBy(col("n"), col("p"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("dev_micro")).as("sdev"),
        max(col("mce_ppm")).as("mce_ppm"),
        sum(col("rel_nano")).as("rel_nano"),
        sum(col("res_nano")).as("res_nano"))
      .select(col("n"), col("p"), col("n_bins"),
        round(d(col("sdev")) / d(col("n"))).cast("long").as("ece_ppm"),
        col("mce_ppm"), col("rel_nano"), col("res_nano"),
        round(lit(1e9) * d(col("p")) * (d(col("n")) - d(col("p"))) /
          (d(col("n")) * d(col("n")))).cast("long").as("unc_nano"))
  }

  val eceSql: String =
    s"""WITH $scoredSql, $histSql,
       |b AS (
       |  SELECT least(p_u // 100000, 9) AS bin, sum(c) AS nb, sum(pc) AS pos,
       |         sum(CAST(p_u AS HUGEINT) * c) AS sp
       |  FROM hist GROUP BY 1),
       |t AS (
       |  SELECT *, sum(nb) OVER () AS n, sum(pos) OVER () AS p,
       |         abs(sp - CAST(pos AS HUGEINT) * 1000000) AS dev_micro
       |  FROM b),
       |terms AS (
       |  SELECT n, p, nb, dev_micro,
       |         CAST(round(CAST(dev_micro AS DOUBLE) * CAST(dev_micro AS DOUBLE)
       |           / (1e3 * CAST(nb AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)
       |           AS rel_nano,
       |         CAST(round(1e9
       |           * (CAST(pos AS DOUBLE) * CAST(n AS DOUBLE)
       |              - CAST(nb AS DOUBLE) * CAST(p AS DOUBLE))
       |           * (CAST(pos AS DOUBLE) * CAST(n AS DOUBLE)
       |              - CAST(nb AS DOUBLE) * CAST(p AS DOUBLE))
       |           / (CAST(nb AS DOUBLE) * CAST(n AS DOUBLE)
       |              * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)
       |           AS res_nano,
       |         CAST(round(CAST(dev_micro AS DOUBLE) / CAST(nb AS DOUBLE))
       |           AS BIGINT) AS mce_ppm
       |  FROM t)
       |SELECT CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS p,
       |       CAST(count(*) AS BIGINT) AS n_bins,
       |       CAST(round(CAST(sum(dev_micro) AS DOUBLE) / CAST(n AS DOUBLE))
       |         AS BIGINT) AS ece_ppm,
       |       CAST(max(mce_ppm) AS BIGINT) AS mce_ppm,
       |       CAST(sum(rel_nano) AS BIGINT) AS rel_nano,
       |       CAST(sum(res_nano) AS BIGINT) AS res_nano,
       |       CAST(round(1e9 * CAST(p AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(p AS DOUBLE))
       |            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS unc_nano
       |FROM terms GROUP BY n, p""".stripMargin

  /** PINBALL (quantile) LOSS — the eval metric for quantile
    * forecasters (demand planning, latency SLOs, conformal bands):
    * L_q(y, ŷ) = q·(y−ŷ) if y ≥ ŷ else (1−q)·(ŷ−y). Evaluates a
    * per-segment scale model (ŷ_q(seg) = segment mean × {0.1, 0.9,
    * 1.7}, i.e. factor = (2q−10)/100) on order totals at
    * q ∈ {10, 50, 90}% — under-forecasting
    * the P90 costs 9× more than over-forecasting it, which is the
    * property the asymmetric loss exists to price.
    *
    * Scale shape: one compact-key agg for the model (|segments| rows,
    * broadcast back), one map-side loss pass, one compact-key agg —
    * no sort, no quantile state. Parity: cents and pct-weights are
    * exact integers (loss unit = cent·pct), summed exactly; the two
    * engines round the same mean-cents double once into the
    * prediction. */
  def pinballLoss(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(substring(col("o_orderpriority"), 1, 1).as("seg"),
        round(col("o_totalprice") * 100.0d).cast("long").as("cents"))
    val model = base.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .select(col("seg"), col("n"),
        (col("s").cast("double") / col("n").cast("double")).as("mean_c"))
    val qs = Seq(10L, 50L, 90L).map(q =>
      struct(lit(q).as("q_pct"), lit(q * 2 - 10).as("f_pct")))
    base.join(broadcast(model), Seq("seg"))
      .select(col("seg"), col("cents"), col("n"), col("mean_c"),
        explode(array(qs: _*)).as("qf"))
      .select(col("seg"), col("cents"), col("n"),
        col("qf.q_pct").as("q_pct"),
        round(col("mean_c") * (col("qf.f_pct").cast("double") / lit(100.0d)))
          .cast("long").as("pred_c"))
      .withColumn("loss_cp",
        when(col("cents") >= col("pred_c"),
          col("q_pct") * (col("cents") - col("pred_c")))
          .otherwise((lit(100L) - col("q_pct")) * (col("pred_c") - col("cents"))))
      .groupBy(col("seg"), col("q_pct"))
      .agg(max(col("pred_c")).as("pred_cents"), count(lit(1)).as("n"),
        sum(col("loss_cp")).as("sl"))
      .select(col("seg"), col("q_pct"), col("pred_cents"), col("n"),
        // mean pinball loss in cents, milli precision (loss_cp is
        // cent·pct, so ÷100 de-scales the pct weight)
        round(lit(1e3) * col("sl").cast("double") /
          (lit(100.0d) * col("n").cast("double"))).cast("long")
          .as("pinball_milli"))
      .orderBy(col("seg"), col("q_pct"))
  }

  val pinballLossSql: String =
    """WITH base AS (
      |  SELECT substring(o_orderpriority, 1, 1) AS seg,
      |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      |  FROM orders),
      |model AS (
      |  SELECT seg, count(*) AS n,
      |         CAST(sum(cents) AS DOUBLE) / count(*) AS mean_c
      |  FROM base GROUP BY 1),
      |q AS (SELECT unnest([10, 50, 90]) AS q_pct),
      |loss AS (
      |  SELECT b.seg, q.q_pct,
      |         CAST(round(m.mean_c * (CAST(q.q_pct * 2 - 10 AS DOUBLE) / 100.0))
      |           AS BIGINT) AS pred_c,
      |         b.cents
      |  FROM base b JOIN model m USING (seg) CROSS JOIN q)
      |SELECT seg, CAST(q_pct AS BIGINT) AS q_pct,
      |       max(pred_c) AS pred_cents, count(*) AS n,
      |       CAST(round(1e3 * CAST(sum(CASE WHEN cents >= pred_c
      |                  THEN q_pct * (cents - pred_c)
      |                  ELSE (100 - q_pct) * (pred_c - cents) END) AS DOUBLE)
      |             / (100.0 * count(*))) AS BIGINT) AS pinball_milli
      |FROM loss GROUP BY 1, 2 ORDER BY seg, q_pct""".stripMargin

  /** MATTHEWS CORRELATION + the balanced-operating-point siblings —
    * the single-number verdicts [[confusion]]'s precision/recall/F1
    * miss on IMBALANCED pools (F1 ignores tn entirely; accuracy
    * saturates): MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    * is the φ coefficient of the 2×2 table (the chance-corrected
    * metric a class-skewed training-data gate should read first),
    * plus balanced accuracy (tpr+tnr)/2, Youden's J (= tpr+tnr−1,
    * the [[bestThreshold]] objective AT the fixed 0.5 point), and
    * markedness (ppv+npv−1, its dual). Any empty margin ⇒ NULL MCC
    * in both engines.
    *
    * Exactness: the four cells are exact BIGINTs from one scan; the
    * four marginal products ride DECIMAL(38,0)/HUGEINT (tp·tn alone
    * wraps a BIGINT at ~3e9 rows/cell — real at 100 TB); each metric
    * is ONE double expression, ppm-quantized. Scale: one full-scan
    * agg, no joins. */
  def mcc(spark: SparkSession, dir: String): DataFrame = {
    val pred = col("p_u") >= 500000L
    def d(c: Column) = c.cast("double")
    scored(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(pred && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && col("y") === 0L, 1L).otherwise(0L)).as("tn"),
        sum(when(!pred && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
      .withColumn("den",
        dec(col("tp") + col("fp")) * (col("tp") + col("fn")) *
          (col("tn") + col("fp")) * (col("tn") + col("fn")))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        when(col("den") > 0,
          round(lit(1e6) *
            (dec(col("tp")) * col("tn") - dec(col("fp")) * col("fn")).cast("double") /
            sqrt(col("den").cast("double"))).cast("long")).as("mcc_ppm"),
        when(col("tp") + col("fn") > 0 && col("tn") + col("fp") > 0,
          round(lit(5e5) * (d(col("tp")) / d(col("tp") + col("fn")) +
            d(col("tn")) / d(col("tn") + col("fp")))).cast("long"))
          .as("balanced_acc_ppm"),
        when(col("tp") + col("fn") > 0 && col("tn") + col("fp") > 0,
          round(lit(1e6) * (d(col("tp")) / d(col("tp") + col("fn")) +
            d(col("tn")) / d(col("tn") + col("fp")) - lit(1d))).cast("long"))
          .as("youden_j_ppm"),
        when(col("tp") + col("fp") > 0 && col("tn") + col("fn") > 0,
          round(lit(1e6) * (d(col("tp")) / d(col("tp") + col("fp")) +
            d(col("tn")) / d(col("tn") + col("fn")) - lit(1d))).cast("long"))
          .as("markedness_ppm"))
  }

  val mccSql: String =
    s"""WITH $scoredSql,
      |m AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN p_u >= 500000 AND y = 1 THEN 1 ELSE 0 END) AS tp,
      |         sum(CASE WHEN p_u >= 500000 AND y = 0 THEN 1 ELSE 0 END) AS fp,
      |         sum(CASE WHEN p_u < 500000 AND y = 0 THEN 1 ELSE 0 END) AS tn,
      |         sum(CASE WHEN p_u < 500000 AND y = 1 THEN 1 ELSE 0 END) AS fn
      |  FROM scored),
      |d AS (
      |  SELECT *, CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) AS den
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp,
      |       CAST(fp AS BIGINT) AS fp, CAST(tn AS BIGINT) AS tn,
      |       CAST(fn AS BIGINT) AS fn,
      |       CASE WHEN den > 0 THEN
      |         CAST(round(1e6 * CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
      |                AS DOUBLE) / sqrt(CAST(den AS DOUBLE))) AS BIGINT) END AS mcc_ppm,
      |       CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
      |         CAST(round(5e5 * (CAST(tp AS DOUBLE) / (tp + fn)
      |                + CAST(tn AS DOUBLE) / (tn + fp))) AS BIGINT) END
      |         AS balanced_acc_ppm,
      |       CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
      |         CAST(round(1e6 * (CAST(tp AS DOUBLE) / (tp + fn)
      |                + CAST(tn AS DOUBLE) / (tn + fp) - 1.0)) AS BIGINT) END
      |         AS youden_j_ppm,
      |       CASE WHEN tp + fp > 0 AND tn + fn > 0 THEN
      |         CAST(round(1e6 * (CAST(tp AS DOUBLE) / (tp + fp)
      |                + CAST(tn AS DOUBLE) / (tn + fn) - 1.0)) AS BIGINT) END
      |         AS markedness_ppm
      |FROM d""".stripMargin

  /** HOSMER–LEMESHOW goodness-of-fit — the χ² VERDICT on calibration
    * ([[ece]] reports the calibration ERROR in probability units; HL
    * answers "is the miscalibration statistically significant?"):
    * Ĉ = Σ_g (O_g − E_g)² / (E_g(1 − E_g/n_g)) over 10 equal-count
    * risk groups ~ χ²₈. Groups are BUCKET-ATOMIC deciles — each
    * distinct score bucket lands wholly in the decile of its first
    * rank (g = ⌊10·r₀/n⌋, identical arithmetic in both engines), the
    * same discipline as the equal-depth histogram ops, so no bucket
    * ever straddles a group boundary differently across engines.
    *
    * Exactness: O_g = Σy and the micro-sum E_gᵘ = Σ p_u·c are exact
    * integers over the ≤1e6-key score histogram (E ride DECIMAL/
    * HUGEINT); each group's term quantizes ONCE to nano before the
    * 10-term exact sum. Scale: everything reduces through the score
    * histogram; the decile window orders ≤1e6 rows, never data. */
  def hosmerLemeshow(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val cum = Window.orderBy(col("p_u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h = hist(spark, dir)
      .withColumn("r0", sum(col("c")).over(cum) - col("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      // integer division (matches the oracle's `//`): double division
      // + floor could land a boundary bucket one decile off
      .withColumn("g", least(expr("(10 * r0) div n"), lit(9L)).cast("long"))
    val grp = h.groupBy(col("g"))
      .agg(max(col("n")).as("n"), sum(col("c")).as("n_g"),
        sum(col("pc")).as("obs"), sum(dec(col("p_u")) * col("c")).as("e_u"))
      .withColumn("e", d(col("e_u")) / lit(1e6))
      .withColumn("t_nano",
        when(col("e") > 0d && col("e") < d(col("n_g")),
          round(lit(1e9) * (d(col("obs")) - col("e")) * (d(col("obs")) - col("e")) /
            (col("e") * (lit(1d) - col("e") / d(col("n_g"))))).cast("long"))
          .otherwise(0L))
    grp.groupBy(col("n"))
      .agg(count(lit(1)).as("n_groups"), sum(col("t_nano")).as("st"))
      .select(col("n"), col("n_groups"), (col("n_groups") - 2L).as("df"),
        round(d(col("st")) / lit(1e6)).cast("long").as("hl_milli"))
      // chi2(8) 95th percentile = 15.507
      .withColumn("miscalibrated_5pct", col("hl_milli") > lit(15507L))
  }

  val hosmerLemeshowSql: String =
    s"""WITH $scoredSql,
      |$histSql,
      |ranked AS (
      |  SELECT p_u, pc, c,
      |         sum(c) OVER (ORDER BY p_u ROWS UNBOUNDED PRECEDING) - c AS r0,
      |         sum(c) OVER () AS n
      |  FROM hist),
      |grp AS (
      |  SELECT least((10 * r0) // n, 9) AS g, max(n) AS n, sum(c) AS n_g,
      |         sum(pc) AS obs, sum(CAST(p_u AS HUGEINT) * c) AS e_u
      |  FROM ranked GROUP BY 1),
      |terms AS (
      |  SELECT n, n_g, obs, CAST(e_u AS DOUBLE) / 1e6 AS e FROM grp),
      |quant AS (
      |  SELECT n,
      |         CASE WHEN e > 0 AND e < CAST(n_g AS DOUBLE) THEN
      |           CAST(round(1e9 * (CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e)
      |                / (e * (1.0 - e / n_g))) AS BIGINT) ELSE 0 END AS t_nano
      |  FROM terms)
      |SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(count(*) - 2 AS BIGINT) AS df,
      |       CAST(round(CAST(sum(t_nano) AS DOUBLE) / 1e6) AS BIGINT) AS hl_milli,
      |       CAST(round(CAST(sum(t_nano) AS DOUBLE) / 1e6) AS BIGINT) > 15507
      |         AS miscalibrated_5pct
      |FROM quant""".stripMargin

  /** TRUNCATED SPRT — the SEQUENTIAL member of the experimentation
    * family ([[graft.operators.Aggregations.abTest]] is the
    * fixed-horizon z, `agg_permutation_test` the exact resampling
    * test, [[cuped]] the variance-reduced estimator; Wald's
    * sequential probability ratio test is the always-valid
    * early-stopping one — the modern "peek whenever you like"
    * experimentation discipline): observations arrive in TIME ORDER
    * and the cumulative log-likelihood ratio for H₁ (conversion
    * p₁=0.12) vs H₀ (p₀=0.10) walks until it crosses
    * ±ln((1−β)/α) (α=β=0.05), at which point the test STOPS — the
    * expected sample size is far below any fixed-horizon n. The
    * per-observation LLR increments ln(p₁/p₀) / ln((1−p₁)/(1−p₀))
    * and the boundary are micro-quantized ONCE in Scala and inlined
    * identically in both engines, so the walk is an exact integer
    * cumulative sum and the crossing index is deterministic.
    * Truncation at n_max=20 000 (the standard truncated-SPRT design
    * — a max sample size is a test parameter, not a shortcut) is
    * what makes the op scale-sound: the time-ordered cap plans as
    * TakeOrderedAndProject (distributed partial top-k, never a
    * global sort), and the ordered walk runs on the BOUNDED 20k-row
    * sample. Emits the decision, the stopping index, and the LLR at
    * stop and at truncation. */
  private val sprtMaxN = 20000
  private[graft] val sprtPos = math.round(1e6 * math.log(0.12 / 0.10))
  private[graft] val sprtNeg = math.round(1e6 * math.log(0.88 / 0.90))
  private[graft] val sprtBound = math.round(1e6 * math.log(0.95 / 0.05))

  def sprt(spark: SparkSession, dir: String): DataFrame = {
    val arm = Tables.events(spark, dir)
      .filter(pmod(col("user_id"), lit(2)) === 0)
      .select(col("ts"), col("event_id"),
        (col("event_type") === "purchase").cast("long").as("x"))
      .orderBy(col("ts"), col("event_id"))
      .limit(sprtMaxN)
    val w = Window.orderBy(col("ts"), col("event_id"))
    val walk = arm
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("llr", sum(
        when(col("x") === 1L, lit(sprtPos)).otherwise(lit(sprtNeg))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val crossed = walk
      .filter(col("llr") >= sprtBound || col("llr") <= -sprtBound)
      .agg(min(col("rn")).as("n_at_decision"))
    val first = walk.join(broadcast(crossed),
        col("rn") === col("n_at_decision"), "left_outer")
      .agg(count(lit(1)).as("n_scanned"), sum(col("x")).as("n_conversions"),
        max(when(col("rn") === col("n_at_decision"), col("llr")))
          .as("llr_at_decision_micro"),
        max(col("n_at_decision")).as("n_at_decision"),
        sum(when(col("x") === 1L, lit(sprtPos)).otherwise(lit(sprtNeg)))
          .as("llr_final_micro"))
    first.select(col("n_scanned"), col("n_conversions"),
      col("n_at_decision"), col("llr_at_decision_micro"),
      col("llr_final_micro"),
      when(col("llr_at_decision_micro") >= sprtBound, "accept_h1")
        .when(col("llr_at_decision_micro") <= -sprtBound, "accept_h0")
        .otherwise("continue").as("decision"))
  }

  val sprtSql: String =
    s"""WITH arm AS (
       |  SELECT ts, event_id,
       |         CAST(event_type = 'purchase' AS BIGINT) AS x
       |  FROM events WHERE user_id % 2 = 0
       |  ORDER BY ts, event_id LIMIT $sprtMaxN),
       |walk AS (
       |  SELECT x,
       |         CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn,
       |         sum(CASE WHEN x = 1 THEN $sprtPos ELSE $sprtNeg END)
       |           OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS llr
       |  FROM arm),
       |crossed AS (
       |  SELECT min(rn) AS n_at_decision FROM walk
       |  WHERE llr >= $sprtBound OR llr <= -$sprtBound),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_scanned,
       |         CAST(sum(x) AS BIGINT) AS n_conversions,
       |         CAST(max(CASE WHEN w.rn = c.n_at_decision THEN w.llr END) AS BIGINT)
       |           AS llr_at_decision_micro,
       |         CAST(max(CASE WHEN w.rn = c.n_at_decision THEN c.n_at_decision END) AS BIGINT)
       |           AS n_at_decision,
       |         CAST(sum(CASE WHEN x = 1 THEN $sprtPos ELSE $sprtNeg END) AS BIGINT)
       |           AS llr_final_micro
       |  FROM walk w CROSS JOIN crossed c)
       |SELECT n_scanned, n_conversions, n_at_decision, llr_at_decision_micro,
       |       llr_final_micro,
       |       CASE WHEN llr_at_decision_micro >= $sprtBound THEN 'accept_h1'
       |            WHEN llr_at_decision_micro <= -$sprtBound THEN 'accept_h0'
       |            ELSE 'continue' END AS decision
       |FROM m""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_sprt" -> (sprt _),
    "ml_mcc" -> (mcc _),
    "ml_hosmer_lemeshow" -> (hosmerLemeshow _),
    "ml_pinball_loss" -> (pinballLoss _),
    "ml_mcnemar" -> (mcnemar _),
    "ml_ece" -> (ece _),
    "ml_pr_auc" -> (prAuc _),
    "ml_best_threshold" -> (bestThreshold _),
    "ml_confusion" -> (confusion _),
    "ml_auc" -> (auc _),
    "ml_bootstrap_auc" -> (bootstrapAuc _),
    "ml_pr_thresholds" -> (prThresholds _),
    "ml_calibration" -> (calibration _),
    "ml_brier_logloss" -> (brierLogloss _),
    "ml_gain_deciles" -> (gainDeciles _),
    "ml_fairness_audit" -> (fairnessAudit _),
    "ml_psi_drift" -> (psiDrift _),
    "ml_target_encode" -> (targetEncode _),
    "ml_cuped" -> (cuped _),
    "ml_did" -> (did _),
    "ml_conformal" -> (conformal _),
    "ml_propensity_match" -> (propensityMatch _),
    "ml_decision_stump" -> (decisionStump _),
    "ml_kfold_cv" -> (kfoldCv _),
    "ml_logreg_gd" -> (logregGd _),
    "ml_ks_score" -> (ksScore _)
  )

  def oracle: Map[String, String] = Map(
    "ml_sprt" -> sprtSql,
    "ml_mcc" -> mccSql,
    "ml_hosmer_lemeshow" -> hosmerLemeshowSql,
    "ml_pinball_loss" -> pinballLossSql,
    "ml_mcnemar" -> mcnemarSql,
    "ml_ece" -> eceSql,
    "ml_pr_auc" -> prAucSql,
    "ml_best_threshold" -> bestThresholdSql,
    "ml_confusion" -> confusionSql,
    "ml_auc" -> aucSql,
    "ml_bootstrap_auc" -> bootstrapAucSql,
    "ml_pr_thresholds" -> prThresholdsSql,
    "ml_calibration" -> calibrationSql,
    "ml_brier_logloss" -> brierLoglossSql,
    "ml_gain_deciles" -> gainDecilesSql,
    "ml_fairness_audit" -> fairnessAuditSql,
    "ml_psi_drift" -> psiDriftSql,
    "ml_target_encode" -> targetEncodeSql,
    "ml_cuped" -> cupedSql,
    "ml_did" -> didSql,
    "ml_conformal" -> conformalSql,
    "ml_propensity_match" -> propensityMatchSql,
    "ml_decision_stump" -> decisionStumpSql,
    "ml_kfold_cv" -> kfoldCvSql,
    "ml_logreg_gd" -> logregGdSql,
    "ml_ks_score" -> ksScoreSql
  )
}
