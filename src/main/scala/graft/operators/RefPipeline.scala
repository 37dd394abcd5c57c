package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's single dataflow, re-expressed as a declarative Spark
  * pipeline (SURVEY.md §2.1–2.2, §7.2).
  *
  * Reference semantics reproduced here (cited file:line into
  * /root/reference/):
  *  - `main.py:6`      payload coalesce (`event.data or {}`) → null-tolerant
  *    derivation of bucket/name/size below.
  *  - `main.py:7–9`    projection of bucket, name, size.
  *  - `main.py:12`     reject predicate: `not name or not
  *    name.endswith(".xlsx") or not name.startswith("minha-pasta/")` —
  *    case-sensitive suffix/prefix, null-falsy name.
  *  - `main.py:13–14`  side-output of rejected records, then drop.
  *  - `main.py:16`     accepted records formatted as
  *    `gs://{bucket}/{name} (size={size})`; we keep uri and size as
  *    separate typed columns (a sink-friendly shape) rather than one
  *    opaque log line.
  *
  * The events table stands in for the GCS notification stream: each row
  * is deterministically mapped to an object-finalize notification
  * (bucket, name, size). Purchases land as `.xlsx` under `minha-pasta/`,
  * clicks as `.csv`, views as `.xlsx` in the wrong folder, errors lose
  * their name (the `event.data or {}` missing-payload path), signups as
  * upper-case `.XLSX` (exercises case-sensitivity of `str.endswith`).
  *
  * At scale: the predicate is a cheap metadata filter that Catalyst
  * pushes below everything else — exactly the reference's
  * filter-before-work layout (`main.py:12` before the `main.py:17`
  * stub). No shuffle anywhere in this pipeline; it is embarrassingly
  * parallel per input split, matching the reference's shared-nothing
  * ≤3-instance scale-out (`main.tf:53`).
  */
object RefPipeline {

  /** Shared notification derivation, kept identical to the oracle SQL. */
  private def notifications(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      concat(lit("tma-"), (col("user_id") % 3).cast("string")).as("bucket"),
      expr(
        """CASE event_type
          |  WHEN 'purchase' THEN concat('minha-pasta/relatorio_', CAST(event_id AS STRING), '.xlsx')
          |  WHEN 'click'    THEN concat('minha-pasta/notas_',     CAST(event_id AS STRING), '.csv')
          |  WHEN 'view'     THEN concat('outra-pasta/relatorio_', CAST(event_id AS STRING), '.xlsx')
          |  WHEN 'signup'   THEN concat('minha-pasta/dados_',     CAST(event_id AS STRING), '.XLSX')
          |END""".stripMargin).as("name"),
      expr("CAST(FLOOR(value * 1000) AS BIGINT)").as("size_bytes")
    )

  /** SQL fragment of the same derivation, for the DuckDB oracle. */
  val notificationsSql: String =
    """SELECT event_id,
      |       'tma-' || CAST(user_id % 3 AS VARCHAR) AS bucket,
      |       CASE event_type
      |         WHEN 'purchase' THEN 'minha-pasta/relatorio_' || CAST(event_id AS VARCHAR) || '.xlsx'
      |         WHEN 'click'    THEN 'minha-pasta/notas_'     || CAST(event_id AS VARCHAR) || '.csv'
      |         WHEN 'view'     THEN 'outra-pasta/relatorio_' || CAST(event_id AS VARCHAR) || '.xlsx'
      |         WHEN 'signup'   THEN 'minha-pasta/dados_'     || CAST(event_id AS VARCHAR) || '.XLSX'
      |       END AS name,
      |       CAST(FLOOR(value * 1000) AS BIGINT) AS size_bytes
      |FROM events""".stripMargin

  /** Accept predicate ≡ keep iff name non-null ∧ prefix ∧ suffix
    * (De Morgan of main.py:12's reject disjunction). Single source of
    * truth: the public facade predicate. */
  private val accept =
    graft.api.Graft.objectNameAccept(col("name"), "minha-pasta/", ".xlsx")

  /** Accept filter + uri projection over any notifications-shaped
    * frame (event_id, bucket, name, size_bytes) — shared by the
    * bounded oracle query below and the streaming ingestion path
    * (streaming/Streams.scala), so batch and stream run the identical
    * predicate (Dataflow-model parity). */
  def filterAccepted(notifs: DataFrame): DataFrame =
    notifs
      .filter(accept)
      .select(
        col("event_id"),
        concat(lit("gs://"), col("bucket"), lit("/"), col("name")).as("uri"),
        col("size_bytes"))

  /** Accepted side: `gs://bucket/name` uri + size (main.py:16). */
  def ingestFilter(spark: SparkSession, dir: String): DataFrame =
    filterAccepted(notifications(spark, dir)).orderBy("event_id")

  val ingestFilterSql: String =
    s"""SELECT event_id, 'gs://' || bucket || '/' || name AS uri, size_bytes
       |FROM ($notificationsSql)
       |WHERE name IS NOT NULL AND name <> ''
       |  AND name LIKE 'minha-pasta/%' AND name LIKE '%.xlsx'
       |ORDER BY event_id""".stripMargin

  /** Rejected side-output (main.py:13), with the reject reason made
    * explicit — the split is two filters over one scan, which Catalyst
    * collapses into a single pass per side with the predicate pushed to
    * the parquet scan. */
  def rejectSplit(spark: SparkSession, dir: String): DataFrame =
    notifications(spark, dir)
      .filter(!coalesce(accept, lit(false)))
      .select(
        col("event_id"),
        col("bucket"),
        expr(
          """CASE
            |  WHEN name IS NULL OR name = '' THEN 'null-name'
            |  WHEN name NOT LIKE 'minha-pasta/%' THEN 'wrong-prefix'
            |  ELSE 'wrong-suffix'
            |END""".stripMargin).as("reason"))
      .orderBy("event_id")

  val rejectSplitSql: String =
    s"""SELECT event_id, bucket,
       |       CASE
       |         WHEN name IS NULL OR name = '' THEN 'null-name'
       |         WHEN name NOT LIKE 'minha-pasta/%' THEN 'wrong-prefix'
       |         ELSE 'wrong-suffix'
       |       END AS reason
       |FROM ($notificationsSql)
       |WHERE NOT COALESCE(name IS NOT NULL AND name <> ''
       |  AND name LIKE 'minha-pasta/%' AND name LIKE '%.xlsx', FALSE)
       |ORDER BY event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_ingest_filter" -> (ingestFilter _),
    "ref_reject_split" -> (rejectSplit _)
  )

  def oracle: Map[String, String] = Map(
    "ref_ingest_filter" -> ingestFilterSql,
    "ref_reject_split" -> rejectSplitSql
  )
}
