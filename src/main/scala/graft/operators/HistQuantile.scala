package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ntile/quantile machinery WITHOUT a data-sized
  * single-partition sort — the compact VALUE-HISTOGRAM discipline
  * (the `agg_weighted_median` / `ml_conformal` shape, promoted to a
  * shared helper).
  *
  * The problem: `ntile(k).over(Window.orderBy(value))` forces
  * `Exchange SinglePartition` — every row of a data-sized table
  * through ONE task. Correct, and fine at sf0.01, but a straight
  * scale-killer at 100 TB (BENCH_r10_sf1.json measured 4.9× for 10×
  * data on exactly this shape).
  *
  * The cure: tile boundaries are a function of the VALUE HISTOGRAM
  * alone. Aggregate rows to (value → count) — map-side combinable,
  * one compact-key shuffle, cardinality bounded by the value domain
  * (cents, micro-units) not the row count — then compute each
  * value-group's global rank interval from the cumulative count, and
  * each ntile bucket membership by pure integer arithmetic on those
  * ranks. Only the DISTINCT-VALUE table ever sorts; the raw row
  * stream never reaches an unpartitioned window.
  *
  * Tie handling is exact, not approximate: per-bucket census
  * (count / min / max) is invariant to the order of equal values, and
  * the per-row variant recovers the exact global rank as
  * `cum_before(value) + row_number within the value group ordered by
  * the caller's tie-break key` — a WELL-PARTITIONED window (one
  * partition per distinct value). Skew note: a single hot value
  * concentrates its group in one task; that is inherent to exact
  * tie-break semantics (those rows must meet to be ordered), and the
  * group is |hottest value| rows, not |table| rows.
  */
object HistQuantile {

  /** SQL text computing the ntile(k) bucket of global rank `r` among
    * `n` rows — Spark/DuckDB ntile semantics: the first n mod k
    * buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋. Exact integer `div`
    * arithmetic (never IEEE division); `greatest(..,1)` guards the
    * divisor of the branch that is unreachable when n < k. */
  private[operators] def ntileSqlExpr(r: String, n: String, k: Int): String =
    s"""CASE WHEN ($r) <= ((($n) % $k) * ((($n) div $k) + 1))
       |  THEN (($r) - 1) div ((($n) div $k) + 1) + 1
       |  ELSE (($n) % $k)
       |       + (($r) - ((($n) % $k) * ((($n) div $k) + 1)) - 1)
       |         div greatest(($n) div $k, 1L) + 1
       |END""".stripMargin.replace('\n', ' ')

  /** Per-bucket census of an exact global ntile(k) over `value`
    * ascending: (bucket, cnt, lo, hi) where cnt is the bucket's row
    * count and lo/hi its exact min/max value. Byte-identical to
    * `ntile(k).over(Window.orderBy(value, anyTieBreak))` followed by
    * groupBy(bucket).agg(count, min(value), max(value)) — the census
    * is invariant to intra-value ordering, so no tie-break key is
    * needed. Plan shape: one compact-key aggregation (the histogram),
    * one bounded-table cumulative window, integer bucket-span
    * arithmetic, one ≤k-key aggregation. */
  def ntileBuckets(df: DataFrame, value: Column, k: Int): DataFrame = {
    val wCum = Window.orderBy(col("__hq_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = df.select(value.as("__hq_v"))
      .groupBy(col("__hq_v")).agg(count(lit(1)).as("__hq_c"))
      .withColumn("__hq_cum", sum(col("__hq_c")).over(wCum))
      .withColumn("__hq_n", sum(col("__hq_c")).over(Window.partitionBy()))
    // a value-group occupying global ranks [cum-c+1, cum] spans the
    // contiguous bucket range [bucket(firstRank), bucket(lastRank)]
    hist
      .withColumn("__hq_blo",
        expr(ntileSqlExpr("__hq_cum - __hq_c + 1", "__hq_n", k)))
      .withColumn("__hq_bhi", expr(ntileSqlExpr("__hq_cum", "__hq_n", k)))
      .select(col("__hq_v"), col("__hq_n"),
        explode(sequence(col("__hq_blo"), col("__hq_bhi"))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("__hq_v")).as("lo"), max(col("__hq_v")).as("hi"),
        max(col("__hq_n")).as("__hq_n"))
      // bucket size comes straight from the ntile remainder rule —
      // partially-covered value groups make it underivable from the
      // per-bucket value census
      .withColumn("cnt",
        expr(s"__hq_n div $k + (CASE WHEN bucket <= __hq_n % $k THEN 1L ELSE 0L END)"))
      .select(col("bucket"), col("cnt"), col("lo"), col("hi"))
  }

  /** Attach the exact global ntile(k) over (`value` ASC|DESC, `key`
    * ASC) to every row — byte-identical to
    * `ntile(k).over(Window.orderBy(value, key))` — without a
    * data-sized single-partition exchange. Global rank =
    * cum_before(value) [from the compact histogram, joined back on
    * value] + row_number within the value group ordered by `key`
    * [a well-partitioned window]. `df` must expose `value` and `key`
    * as stable columns. */
  def withNtile(df: DataFrame, value: Column, key: Column, k: Int,
                descValue: Boolean, out: String): DataFrame = {
    val keyed = df.withColumn("__hq_v", value)
    val ord = if (descValue) col("__hq_v").desc else col("__hq_v").asc
    val wCum = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = keyed.groupBy(col("__hq_v")).agg(count(lit(1)).as("__hq_c"))
      .withColumn("__hq_before", sum(col("__hq_c")).over(wCum) - col("__hq_c"))
      .withColumn("__hq_n", sum(col("__hq_c")).over(Window.partitionBy()))
      .select(col("__hq_v"), col("__hq_before"), col("__hq_n"))
    val wIn = Window.partitionBy(col("__hq_v")).orderBy(key.asc)
    keyed.join(cum, Seq("__hq_v"))
      .withColumn("__hq_r", col("__hq_before") + row_number().over(wIn))
      .withColumn(out, expr(ntileSqlExpr("__hq_r", "__hq_n", k)))
      .drop("__hq_v", "__hq_before", "__hq_n", "__hq_r")
  }
}
