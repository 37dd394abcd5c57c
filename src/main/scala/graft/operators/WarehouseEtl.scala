package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance ETL operators — the load-side half of the
  * reference's declared XLSX→warehouse intent (main.py:16–17,
  * terraform.yml:26): once rows land, a warehouse needs CDC
  * compaction (latest record wins) and slowly-changing-dimension
  * history (SCD Type 2). The `events` table plays the change log:
  * each row is an upsert of a user's state keyed by `user_id`,
  * ordered by `ts` (ties broken by `event_id` — the log offset).
  *
  * Scale shape: both operators are ONE hash shuffle on the entity
  * key followed by per-key window work — the canonical distributed
  * compaction. No joins, no global sorts before the output edge.
  * At 100 TB the key shuffle is the floor for any per-entity
  * history operator; everything after it is partition-local.
  */
object WarehouseEtl {

  /** The change log: one row per state observation, deterministically
    * ordered within each entity by (ts, event_id). */
  private def changeLog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"), col("value"))

  /** CDC latest-record-wins compaction: collapse the change log to
    * one current row per entity. row_number over the per-key
    * (ts, event_id) DESC order, keep rank 1 — Spark plans the
    * rank-1 filter as WindowGroupLimit, so each task keeps a single
    * running max per key instead of materializing the full sorted
    * history (the same plan shape as top-k-per-group; see
    * docs/PLANS.md). This is the standard "upsert view of an
    * append-only log" — at 100 TB it is one shuffle on user_id. */
  def cdcLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    changeLog(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("user_id"),
        col("state").as("last_state"),
        round(col("value"), 2).as("last_value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy(col("user_id"))
  }

  val cdcLatestSql: String =
    """SELECT user_id, state AS last_state, round(value, 2) AS last_value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      |FROM (SELECT user_id, event_type AS state, value, ts,
      |             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** SCD Type 2 dimension build: turn each entity's state history
    * into validity intervals. Two per-key window passes over the SAME
    * (user_id / ts, event_id) ordering — so one shuffle, one sort,
    * both windows in one exchange-free stage:
    *   1. change detection: keep a row only where its state differs
    *      from the previous row's (lag) — consecutive duplicate
    *      states collapse into one interval, which is what makes
    *      this SCD2 and not just an interval-ized log;
    *   2. interval close: valid_to = the NEXT change's valid_from
    *      (lead), open (null) for the current row.
    * NULL valid_to doubles as the is_current flag; both are emitted
    * because downstream point-in-time joins want the closed interval
    * while dashboards want the flag. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    changeLog(spark, dir)
      .withColumn("__prev", lag(col("state"), 1).over(order))
      .where(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(order))
      .select(col("user_id"), col("state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("state"))
  }

  // NOTE the second window runs over the FILTERED rows (changes
  // only) — lead() must skip collapsed duplicates, so the oracle
  // nests the same two stages in the same order.
  val scd2BuildSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type AS state, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, state, ts, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> state)
      |SELECT user_id, state,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |                '%Y-%m-%d %H:%M:%S') AS valid_to,
      |       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) IS NULL AS is_current
      |FROM changes
      |ORDER BY user_id, valid_from, state""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_cdc_latest" -> (cdcLatest _),
    "etl_scd2" -> (scd2Build _)
  )

  def oracle: Map[String, String] = Map(
    "etl_cdc_latest" -> cdcLatestSql,
    "etl_scd2" -> scd2BuildSql
  )
}
