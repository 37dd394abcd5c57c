package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators — resampling an irregular
  * event stream onto a fixed grid and filling the gaps. The
  * reference's event path (main.py:5–17) treats time only as a
  * pass-through attribute; a training-data pipeline over event logs
  * needs the regularized form (driver-mandated EXT alongside the
  * streaming batch twins in graft.streaming.Streams).
  *
  * Scale shape: binning is a compact-key (type, hour) shuffle with
  * map-side partial aggregation; the bin spine is |types| × |hours| —
  * bounded by the calendar, not by data volume; the forward fill is a
  * per-type window, parallel across types. Nothing here grows
  * super-linearly at 100 TB.
  */
object TimeSeries {

  /** Resample events onto a 1-hour grid per event_type: summed value
    * per occupied bin, a complete min..max bin spine per type
    * (`sequence` + explode — generated, not scanned), missing bins
    * flagged and forward-filled from the last observed bin
    * (`last(_, ignoreNulls)` over the per-type time window).
    * Timestamps leave formatted as strings (engine-portable; see
    * docs note on ns/µs parity). SUM, not AVG, for oracle parity:
    * the inputs are 2-decimal values, so the true sum is itself a
    * 2-decimal number and `round(_, 2)` sits far from any rounding
    * boundary regardless of summation order — an average lands on
    * arbitrary decimals where a half-boundary flips between engines
    * (observed: 10.675 → 10.67 vs 10.68). */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bin"))
      .agg(round(sum(col("value")), 2).as("sum_value"))
    val spine = binned.groupBy(col("event_type"))
      .agg(min("bin").as("lo"), max("bin").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("bin"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    spine.join(binned, Seq("event_type", "bin"), "left")
      .select(col("event_type"),
        date_format(col("bin"), "yyyy-MM-dd HH:mm").as("bin_ts"),
        col("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("sum_value").isNull.as("is_gap"))
      .orderBy(col("event_type"), col("bin_ts"))
  }

  val resampleFfillSql: String =
    """WITH binned AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bin, round(sum(value), 2) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, min(bin) AS lo, max(bin) AS hi FROM binned GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bin FROM bounds),
      |j AS (SELECT s.event_type, s.bin, b.sum_value
      |      FROM spine s LEFT JOIN binned b ON s.event_type = b.event_type AND s.bin = b.bin)
      |SELECT event_type, strftime(bin, '%Y-%m-%d %H:%M') AS bin_ts, sum_value,
      |       last_value(sum_value IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bin) AS filled_value,
      |       sum_value IS NULL AS is_gap
      |FROM j ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_resample_ffill" -> (resampleFfill _)
  )

  def oracle: Map[String, String] = Map(
    "ts_resample_ffill" -> resampleFfillSql
  )
}
