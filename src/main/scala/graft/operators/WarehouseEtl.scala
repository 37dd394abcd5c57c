package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** FRESHNESS / STALENESS report — the first SLA dashboard any
    * warehouse feed gets: per stream (event_type), the newest event's
    * timestamp and how many minutes it lags the corpus high-water
    * mark. Exact integer nanos throughout; the corpus max is a 1-row
    * broadcast under a compact-key agg (the histogram-bounds
    * pattern), so at 100 TB this is one scan + one 5-row join. */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("ts_ns")).as("last_ns"))
    val hwm = Tables.events(spark, dir).agg(max(col("ts_ns")).as("hwm_ns"))
    perType.crossJoin(broadcast(hwm))
      .select(col("event_type"), col("n"),
        date_format((expr("last_ns div 1000000000")).cast("timestamp"),
          "yyyy-MM-dd HH:mm:ss").as("last_event"),
        expr("(hwm_ns - last_ns) div 60000000000").as("minutes_behind"))
      .orderBy(col("event_type"))
  }

  val freshnessSql: String =
    """WITH t AS (
      |  SELECT event_type, count(*) AS n, max(epoch_ns(ts)) AS last_ns
      |  FROM events GROUP BY 1),
      |h AS (SELECT max(epoch_ns(ts)) AS hwm_ns FROM events)
      |SELECT event_type, n,
      |       strftime(to_timestamp(last_ns // 1000000000), '%Y-%m-%d %H:%M:%S') AS last_event,
      |       (hwm_ns - last_ns) // 60000000000 AS minutes_behind
      |FROM t, h ORDER BY event_type""".stripMargin

  /** CONTENT-HASH RECONCILIATION — the O(1)-per-partition table
    * equality check: each row hashes to a 32-bit md5 prefix and the
    * partition fingerprint is the SUM of row hashes — associative and
    * commutative, so it is partitioning/order-independent and
    * map-side combinable (the property a content checksum needs at
    * 100 TB: one scan, compact output, no join). Comparing two
    * snapshots' (partition, row_sum, n_rows) tables detects any
    * changed partition without touching row data — the cheap outer
    * loop [[snapshotDiff]] then drills into. Fingerprint per order
    * month here; a sum CAN collide on compensating edits (hash(a)+
    * hash(b) preserved) — the standard trade for mergeability, and
    * why the row count rides beside it. */
  def contentHash(spark: SparkSession, dir: String): DataFrame = {
    val rowHash = conv(substring(md5(concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_orderstatus"), format_string("%.2f", col("o_totalprice")),
      col("o_orderpriority")).cast("binary")), 1, 8), 16, 10).cast("long")
    Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        rowHash.as("h"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("content_sum"))
      .orderBy(col("month"))
  }

  val contentHashSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |       count(*) AS n_rows,
      |       CAST(sum(('0x' || substring(md5(
      |         CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
      |         o_orderstatus || '|' || format('{:.2f}', o_totalprice) || '|' ||
      |         o_orderpriority), 1, 8))::BIGINT) AS BIGINT) AS content_sum
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic PSEUDONYMIZATION — the GDPR-grade de-identification
    * pass that [[purgeAudit]]'s deletion flow complements: entity keys
    * are replaced by a salted one-way hash (md5 here; a production
    * deployment swaps in an HMAC with a managed secret — same plan),
    * consistently across EVERY table that carries the key, so joins
    * and analytics still work on the pseudonymized warehouse while no
    * raw key survives. Map-only on each table (fuses into the scan at
    * 100 TB); the output proves the two contractual properties
    * per segment: the pseudonym join reproduces the raw join's
    * counts (referential integrity preserved) and pseudonyms are
    * bijective with keys (no collisions at this cardinality —
    * collisions would surface as n_pseudonyms < n_customers). */
  def pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    def pseud(c: Column): Column =
      substring(md5(concat(lit("graft-salt:"), c.cast("string")).cast("binary")), 1, 16)
    val cust = Tables.customer(spark, dir)
      .select(pseud(col("c_custkey")).as("p_cust"), col("c_custkey"),
        col("c_mktsegment"))
    val ords = Tables.orders(spark, dir)
      .select(pseud(col("o_custkey")).as("p_cust_o"), col("o_orderkey"))
    cust.join(ords, col("p_cust") === col("p_cust_o"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("n_customers"),
        countDistinct(col("p_cust")).as("n_pseudonyms"),
        count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val pseudonymizeSql: String =
    """WITH cust AS (
      |  SELECT substring(md5('graft-salt:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS p_cust,
      |         c_custkey, c_mktsegment
      |  FROM customer),
      |ords AS (
      |  SELECT substring(md5('graft-salt:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS p_cust_o,
      |         o_orderkey
      |  FROM orders)
      |SELECT c_mktsegment,
      |       count(DISTINCT c_custkey) AS n_customers,
      |       count(DISTINCT p_cust) AS n_pseudonyms,
      |       count(o_orderkey) AS n_orders
      |FROM cust LEFT JOIN ords ON p_cust = p_cust_o
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD2 POINT-IN-TIME LOOKUP — the consumption side of
    * [[scd2Build]]: each fact row (purchases, here) enriched with the
    * dimension state that was valid AT ITS TIMESTAMP, the query every
    * SCD2 dimension exists to answer. The join is EQUI on the entity
    * key with the interval containment as a residual predicate — per
    * key the dimension holds one row per state CHANGE (not per
    * event), so the residual scans a short bounded list; at 100 TB
    * this is one co-partitioned shuffle on user_id (and in a real
    * star schema the dim side usually broadcasts). Interval math in
    * exact integer nanos; the half-open [valid_from, valid_to) intervals
    * partition each entity's timeline, so every fact matches exactly
    * one version (spec-pinned).
    *
    * Depth note: the equi join materializes facts × versions per key
    * before the residual filters — fine for real SCD2 dims (few
    * versions per entity, the defining property of SLOWLY-changing),
    * but a pathologically deep version history should route through
    * [[graft.api.Graft.asofJoin]] (AsofJoinExec, O(n+m) streaming
    * merge per key) on `valid_from` instead — the same law
    * docs/SCALE.md measures for the as-of baselines. */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("__prev", lag(col("state"), 1).over(order))
      .where(col("__prev").isNull || col("__prev") =!= col("state"))
      .withColumn("valid_to_ns", lead(col("ts_ns"), 1).over(order))
      .select(col("user_id").as("d_uid"), col("state"),
        col("ts_ns").as("valid_from_ns"), col("valid_to_ns"))
    val facts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
    facts.join(dim, col("user_id") === col("d_uid") &&
        col("ts_ns") >= col("valid_from_ns") &&
        (col("valid_to_ns").isNull || col("ts_ns") < col("valid_to_ns")))
      .select(col("event_id"), col("user_id"),
        col("state").as("state_at_fact"),
        round(col("value"), 2).as("value"),
        col("valid_to_ns").isNull.as("from_current_version"))
      .orderBy(col("event_id"))
  }

  val scd2LookupSql: String =
    """WITH ordered AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type AS state,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_ns(ts), event_id) AS prev
      |  FROM events),
      |dim AS (
      |  SELECT user_id AS d_uid, state, ts_ns AS valid_from_ns,
      |         lead(ts_ns) OVER (PARTITION BY user_id
      |           ORDER BY ts_ns, event_id) AS valid_to_ns
      |  FROM ordered WHERE prev IS NULL OR prev <> state),
      |facts AS (
      |  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, d.state AS state_at_fact,
      |       round(f.value, 2) AS value,
      |       d.valid_to_ns IS NULL AS from_current_version
      |FROM facts f JOIN dim d
      |  ON f.user_id = d.d_uid
      |  AND f.ts_ns >= d.valid_from_ns
      |  AND (d.valid_to_ns IS NULL OR f.ts_ns < d.valid_to_ns)
      |ORDER BY f.event_id""".stripMargin

  /** Declarative data-quality verification (the Deequ pattern): a
    * fixed suite of constraint checks over the landed `orders` table,
    * each reported as (check, violations, pass). The reference's own
    * accept/reject logic (main.py:12–14) is this in miniature — a
    * warehouse load gates on exactly these classes of constraint:
    * key uniqueness, referential integrity, nullability, ranges,
    * enums.
    *
    * Scale shape: the three ROW-LEVEL checks (null / range / enum)
    * share ONE scan — conditional sums in a single aggregate, the
    * observe()-style single-pass trick. Key uniqueness adds one
    * shuffle on the key; referential integrity one anti join against
    * the (broadcastable) dimension. Nothing rescans per check — a
    * suite of 50 row-level checks still costs one pass at 100 TB. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.DataQuality._
    // delegate to the public parameterized suite — one definition of
    // the check-compilation contract (single-scan row-level checks,
    // per-key distinct for Unique, anti join for RefIntegrity)
    dqSuite(Tables.orders(spark, dir), Seq(
      Unique("o_orderkey"),
      RefIntegrity("o_custkey", Tables.customer(spark, dir), "c_custkey"),
      NotNull("o_orderdate"),
      Satisfies("totalprice_positive", col("o_totalprice") > 0),
      InSet("o_orderstatus", Seq("F", "O", "P"))))
  }

  val dqChecksSql: String =
    """WITH rowlevel AS (
      |  SELECT CAST(sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_null,
      |         CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_range,
      |         CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS BIGINT) AS v_enum
      |  FROM orders),
      |checks AS (
      |  SELECT 'unique_o_orderkey' AS "check",
      |         count(*) - count(DISTINCT o_orderkey)
      |           - CASE WHEN count(*) > count(o_orderkey) THEN 1 ELSE 0 END AS violations
      |  FROM orders
      |  UNION ALL
      |  SELECT 'fk_o_custkey', count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL SELECT 'not_null_o_orderdate', v_null FROM rowlevel
      |  UNION ALL SELECT 'satisfies_totalprice_positive', v_range FROM rowlevel
      |  UNION ALL SELECT 'enum_o_orderstatus', v_enum FROM rowlevel)
      |SELECT "check", violations, violations = 0 AS pass
      |FROM checks ORDER BY "check"""".stripMargin

  /** Incremental aggregation by partial-state merge: the pattern
    * behind every incremental 100 TB pipeline — aggregate each new
    * batch into re-mergeable partials (sum/count in exact integer
    * cents), MERGE the partial tables instead of rescanning history,
    * and the merged result is bit-equal to the full recompute. Here
    * the two "batches" are an even/odd-day split of the events log;
    * the `matches` column is the oracle-checked re-aggregation
    * verdict (associativity of the integer partials — the property
    * that makes the incremental plan valid at all). */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        (dayofmonth(col("ts")) % 2).as("batch"))
      .withColumn("c", round(col("value") * 100).cast("long"))
    def partial(b: Int) = e.where(col("batch") === b)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
    val merged = partial(0).union(partial(1))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"))
    val direct = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_d"), sum(col("c")).as("sum_d"))
    merged.join(direct, "event_type")
      .select(col("event_type"), col("n"), col("sum_c"),
        (col("n") === col("n_d") && col("sum_c") === col("sum_d")).as("matches"))
      .orderBy(col("event_type"))
  }

  val incrementalAggSql: String =
    """WITH e AS (
      |  SELECT event_type, day(ts) % 2 AS batch,
      |         CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events),
      |p AS (
      |  SELECT event_type, batch, count(*) AS n, CAST(sum(c) AS BIGINT) AS sum_c
      |  FROM e GROUP BY 1, 2),
      |merged AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n, CAST(sum(sum_c) AS BIGINT) AS sum_c
      |  FROM p GROUP BY 1),
      |direct AS (
      |  SELECT event_type, count(*) AS n_d, CAST(sum(c) AS BIGINT) AS sum_d
      |  FROM e GROUP BY 1)
      |SELECT event_type, n, sum_c,
      |       (n = n_d AND sum_c = sum_d) AS matches
      |FROM merged JOIN direct USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** MERGE INTO (upsert with delete) expressed as a full-outer join —
    * the warehouse statement Spark-on-parquet has no native DML for,
    * and the core maintenance op of every dimension table. Target =
    * the dim as of a cutoff (latest state per user before it);
    * source = the next batch's changes (latest state per user after
    * it). Clause semantics, mirroring ANSI MERGE:
    *   - WHEN MATCHED AND source.state = 'error' THEN DELETE
    *   - WHEN MATCHED THEN UPDATE (take the source row)
    *   - WHEN NOT MATCHED THEN INSERT
    *   - target-only rows pass through unchanged ('keep')
    * The emitted audit view carries each surviving row's action, so
    * the oracle checks every clause (deletes by row absence).
    *
    * Scale shape: both halves are the one-shuffle WindowGroupLimit
    * compaction of [[cdcLatest]], and the merge itself is a single
    * equi-join on the entity key — the same key both compactions
    * already partitioned by, so at 100 TB the join adds no extra
    * shuffle of either side (co-partitioned by the window stage). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
    def latest(half: DataFrame) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      half.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("user_id"), col("state"), col("value"), col("ts"))
    }
    val log = changeLog(spark, dir)
    val target = latest(log.where(col("ts") < cutoff))
      .select(col("user_id"), col("state").as("t_state"),
        col("value").as("t_value"), col("ts").as("t_ts"))
    val source = latest(log.where(col("ts") >= cutoff))
      .select(col("user_id"), col("state").as("s_state"),
        col("value").as("s_value"), col("ts").as("s_ts"))
    target.join(source, Seq("user_id"), "full_outer")
      .withColumn("action",
        when(col("t_state").isNull, "insert")
          .when(col("s_state").isNull, "keep")
          .when(col("s_state") === "error", "delete")
          .otherwise("update"))
      .where(col("action") =!= "delete")
      .select(col("user_id"), col("action"),
        coalesce(col("s_state"), col("t_state")).as("state"),
        round(coalesce(col("s_value"), col("t_value")), 2).as("value"),
        date_format(coalesce(col("s_ts"), col("t_ts")),
          "yyyy-MM-dd HH:mm:ss").as("ts"))
      .orderBy(col("user_id"))
  }

  val mergeUpsertSql: String =
    """WITH log AS (
      |  SELECT user_id, event_type AS state, value, ts, event_id FROM events),
      |target AS (
      |  SELECT user_id, state AS t_state, value AS t_value, ts AS t_ts
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM log WHERE ts < TIMESTAMP '2024-01-21 00:00:00')
      |  WHERE rn = 1),
      |source AS (
      |  SELECT user_id, state AS s_state, value AS s_value, ts AS s_ts
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM log WHERE ts >= TIMESTAMP '2024-01-21 00:00:00')
      |  WHERE rn = 1),
      |merged AS (
      |  SELECT coalesce(t.user_id, s.user_id) AS user_id,
      |         CASE WHEN t.t_state IS NULL THEN 'insert'
      |              WHEN s.s_state IS NULL THEN 'keep'
      |              WHEN s.s_state = 'error' THEN 'delete'
      |              ELSE 'update' END AS action,
      |         coalesce(s.s_state, t.t_state) AS state,
      |         round(coalesce(s.s_value, t.t_value), 2) AS value,
      |         strftime(coalesce(s.s_ts, t.t_ts), '%Y-%m-%d %H:%M:%S') AS ts
      |  FROM target t FULL OUTER JOIN source s USING (user_id))
      |SELECT user_id, action, state, value, ts
      |FROM merged WHERE action <> 'delete' ORDER BY user_id""".stripMargin

  /** Snapshot reconciliation (table diff) — the nightly "did the
    * pipeline change what we think it changed" audit: full-outer join
    * two snapshots on the entity key, classify every row
    * added / removed / changed / unchanged, and report the census with
    * the total absolute value drift. The two snapshots are carved
    * deterministically from `orders` (drop-by-modulus simulates
    * deletes/inserts, a +10% price bump simulates updates), so the
    * oracle replays them exactly. Money compares in integer cents —
    * no float equality. ONE co-partitioned join on the key + one
    * tiny census agg; at 100 TB both snapshots hash-partition on the
    * same key, so the join is the only data movement. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("pc"))
    val a = o.filter(pmod(col("k"), lit(97)) =!= 0)
      .select(col("k"), col("pc").as("pa"))
    val b = o.filter(pmod(col("k"), lit(89)) =!= 0)
      .select(col("k"),
        when(pmod(col("k"), lit(13)) === 0,
          floor(col("pc") * lit(110) / lit(100)).cast("long"))
          .otherwise(col("pc")).as("pb"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("pa").isNull, "added")
          .when(col("pb").isNull, "removed")
          .when(col("pa") =!= col("pb"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(abs(coalesce(col("pb"), lit(0L)) - coalesce(col("pa"), lit(0L))))
          .as("drift_cents"),
        min(col("k")).as("first_key"))
      .orderBy(col("status"))
  }

  val snapshotDiffSql: String =
    """WITH o AS (
      |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      |  FROM orders),
      |a AS (SELECT k, pc AS pa FROM o WHERE k % 97 <> 0),
      |b AS (SELECT k,
      |             CASE WHEN k % 13 = 0 THEN CAST(floor(pc * 110 / 100) AS BIGINT)
      |                  ELSE pc END AS pb
      |      FROM o WHERE k % 89 <> 0),
      |diff AS (
      |  SELECT coalesce(a.k, b.k) AS k, pa, pb,
      |         CASE WHEN pa IS NULL THEN 'added'
      |              WHEN pb IS NULL THEN 'removed'
      |              WHEN pa <> pb THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.k = b.k)
      |SELECT status, count(*) AS n_rows,
      |       CAST(sum(abs(coalesce(pb, 0) - coalesce(pa, 0))) AS BIGINT) AS drift_cents,
      |       min(k) AS first_key
      |FROM diff GROUP BY 1 ORDER BY 1""".stripMargin

  /** Compliance purge with audit manifest — the two deletions every
    * warehouse eventually owes: right-to-be-forgotten (a deletion list
    * of user ids) and retention expiry (rows older than a cutoff).
    * One pass classifies every row (gdpr wins over retention when both
    * apply — the user-deletion obligation is absolute), and the AUDIT
    * manifest (what was purged, why, how much, over what time range)
    * is the artifact a compliance review actually asks for. At 100 TB
    * the rewrite prunes to affected partitions; the deletion list is
    * broadcast-joined (here a deterministic predicate stands in). */
  def purgeAudit(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-10 00:00:00").cast("timestamp")
    Tables.events(spark, dir)
      .withColumn("reason",
        when(pmod(col("user_id"), lit(37)) === 0, "gdpr_user_delete")
          .when(col("ts") < cutoff, "retention_expired")
          .otherwise("kept"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("from_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("to_ts"))
      .orderBy(col("reason"))
  }

  val purgeAuditSql: String =
    """SELECT reason, count(*) AS n_rows,
      |       count(DISTINCT user_id) AS n_users,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS from_ts,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS to_ts
      |FROM (
      |  SELECT user_id, ts,
      |         CASE WHEN user_id % 37 = 0 THEN 'gdpr_user_delete'
      |              WHEN ts < TIMESTAMP '2024-01-10 00:00:00' THEN 'retention_expired'
      |              ELSE 'kept' END AS reason
      |  FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** BITEMPORAL point-in-time query — the two-axis time travel a
    * regulated warehouse must answer: "what state did we BELIEVE user
    * U was in at valid time V, given only what had LOADED by
    * knowledge time T?" versus "what do we NOW know their state at V
    * was?". Valid time is the event timestamp; load time simulates
    * late arrival deterministically (event_id mod 14 days — the
    * replayable stand-in for a feed's real ingest lag). V = HWM−14d,
    * T = HWM−7d, so records valid before V but loaded after T are
    * exactly the hindsight revisions the report surfaces
    * (`revised = true` rows are the restatement audit). Both answers
    * are ORDERED-STRUCT MAX aggregates (the tie-safe [[graft.operators.TimeSeries.ohlcBars]]
    * argmax trick: max over struct(valid_ns, event_id, state) picks
    * the latest record deterministically), the knowledge-time answer
    * as a FILTERed conditional agg — so the whole op is ONE
    * map-side-combinable aggregation on user_id, one exchange, no
    * window sort at all. (The first cut used two row_number window
    * subtrees joined on user_id — 8 exchanges and two scans of the
    * fact table; the agg form was adopted after reading that plan.) */
  def bitemporal(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val facts = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_ns").as("valid_ns"), col("event_id"),
        (col("ts_ns") + pmod(col("event_id"), lit(14L)) * dayNs).as("load_ns"))
    val hwm = Tables.events(spark, dir).agg(max(col("ts_ns")).as("hwm_ns"))
    val pick = struct(col("valid_ns"), col("event_id"), col("state"))
    facts.crossJoin(broadcast(hwm))
      .filter(col("valid_ns") <= col("hwm_ns") - lit(14L) * dayNs)
      .withColumn("on_time", col("load_ns") <= col("hwm_ns") - lit(7L) * dayNs)
      .groupBy(col("user_id"))
      .agg(max(pick).as("now_pick"),
        max(when(col("on_time"), pick)).as("then_pick"))
      .select(col("user_id"),
        coalesce(col("then_pick.state"), lit("<unknown>")).as("state_known_then"),
        col("now_pick.state").as("state_now"),
        date_format(expr("now_pick.valid_ns div 1000000000")
          .cast("timestamp"), "yyyy-MM-dd HH:mm:ss").as("valid_from_now"),
        (coalesce(col("then_pick.state"), lit("<unknown>")) =!= col("now_pick.state"))
          .as("revised"))
      .orderBy(col("user_id"))
  }

  val bitemporalSql: String =
    """WITH facts AS (
      |  SELECT user_id, event_type AS state, epoch_ns(ts) AS valid_ns, event_id,
      |         epoch_ns(ts) + (event_id % 14) * 86400000000000 AS load_ns
      |  FROM events),
      |hwm AS (SELECT max(epoch_ns(ts)) AS hwm_ns FROM events),
      |agged AS (
      |  SELECT user_id,
      |         max(struct_pack(v := valid_ns, e := event_id, s := state)) AS now_pick,
      |         max(struct_pack(v := valid_ns, e := event_id, s := state))
      |           FILTER (WHERE load_ns <= hwm_ns - 7 * 86400000000000) AS then_pick
      |  FROM facts, hwm
      |  WHERE valid_ns <= hwm_ns - 14 * 86400000000000
      |  GROUP BY 1)
      |SELECT user_id,
      |       coalesce(then_pick.s, '<unknown>') AS state_known_then,
      |       now_pick.s AS state_now,
      |       strftime(to_timestamp(now_pick.v // 1000000000), '%Y-%m-%d %H:%M:%S')
      |         AS valid_from_now,
      |       coalesce(then_pick.s, '<unknown>') <> now_pick.s AS revised
      |FROM agged ORDER BY user_id""".stripMargin

  /** SCD TYPE 3 — the third slowly-changing-dimension flavor beside
    * [[scd2]]'s full history and CDC's type-1 overwrite: the dimension
    * keeps the CURRENT value plus ONE previous-value column (the
    * "show me what changed in the last reorg" design — bounded width,
    * no history explosion). Built from the per-user state CHANGE LOG
    * (rows where the state differs from its predecessor — the same
    * change-detection [[scd2]] uses), then the last two log entries
    * pivot into columns via rank + conditional agg. The rank window
    * and the agg share the user-key hash partitioning, so the second
    * exchange is elided (window then groupBy on the same key). */
  def scd3(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_ns"), col("event_id"))
      .withColumn("prev", lag(col("state"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
    val ranked = changes.withColumn("rn", row_number().over(
      Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)))
    ranked.groupBy(col("user_id"))
      .agg(max(when(col("rn") === 1, col("state"))).as("current_state"),
        coalesce(max(when(col("rn") === 2, col("state"))), lit("<none>"))
          .as("prev_state"),
        max(when(col("rn") === 1,
          expr("ts_ns div 1000000000"))).cast("timestamp").as("changed_ts"),
        count(lit(1)).as("n_changes"))
      .select(col("user_id"), col("current_state"), col("prev_state"),
        date_format(col("changed_ts"), "yyyy-MM-dd HH:mm:ss").as("changed_at"),
        col("n_changes"))
      .orderBy(col("user_id"))
  }

  val scd3Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type AS state, epoch_ns(ts) AS ts_ns, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY epoch_ns(ts), event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, state, ts_ns, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> state),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts_ns DESC, event_id DESC) AS rn
      |  FROM changes)
      |SELECT user_id,
      |       max(CASE WHEN rn = 1 THEN state END) AS current_state,
      |       coalesce(max(CASE WHEN rn = 2 THEN state END), '<none>') AS prev_state,
      |       strftime(to_timestamp(max(CASE WHEN rn = 1 THEN ts_ns END) // 1000000000),
      |                '%Y-%m-%d %H:%M:%S') AS changed_at,
      |       count(*) AS n_changes
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD TYPE 6 (hybrid 1+2+3) dimension build — the "all three at
    * once" pattern warehouse teams actually ship: TYPE-2 history rows
    * (one per state change, half-open validity from [[scd2Build]]'s
    * change stream), a TYPE-1 `current_state` column OVERWRITTEN onto
    * every historical row of the entity (so point-in-time queries can
    * filter on today's segment without a self-join), and a TYPE-3
    * `prev_state` column per version. Version numbers ascend from 1.
    *
    * Scale shape: one per-key window pass over the change stream
    * (lag + lead + row_number + a per-key max — all on ONE
    * user-partitioned sort, a single exchange), no joins. The Type-1
    * backfill is max(state) over the unbounded frame keyed by the
    * same partition — no second shuffle. */
  def scd6(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val whole = Window.partitionBy(col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    changeLog(spark, dir)
      .withColumn("__prev_raw", lag(col("state"), 1).over(order))
      .where(col("__prev_raw").isNull || col("__prev_raw") =!= col("state"))
      .withColumn("version", row_number().over(order))
      .withColumn("prev_state", coalesce(lag(col("state"), 1).over(order),
        lit("<none>")))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(order))
      .withColumn("current_state",
        max(when(col("valid_to_ts").isNull, col("state"))).over(whole))
      .select(col("user_id"), col("version").cast("long").as("version"),
        col("state"), col("prev_state"), col("current_state"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd6Sql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_type AS state, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |changes AS (
      |  SELECT user_id, state, ts, event_id FROM ordered
      |  WHERE prev IS NULL OR prev <> state),
      |v AS (
      |  SELECT user_id, state, ts,
      |         CAST(row_number() OVER w AS BIGINT) AS version,
      |         coalesce(lag(state) OVER w, '<none>') AS prev_state,
      |         lead(ts) OVER w AS valid_to_ts
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, version, state, prev_state,
      |       max(CASE WHEN valid_to_ts IS NULL THEN state END)
      |         OVER (PARTITION BY user_id) AS current_state,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |       strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |       valid_to_ts IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** REVERSIBLE PII tokenization via AES — the recoverable complement
    * to [[pseudonymize]]'s one-way hashing (GDPR access requests need
    * the original back; a salted hash cannot return it). Names
    * encrypt with `aes_encrypt` in ECB mode — deterministic by
    * design, the property that keeps tokenized keys JOINABLE (same
    * plaintext ⇒ same token; GCM's random IV would break referential
    * integrity) and exactly the ECB tradeoff (equal plaintexts are
    * visible as equal tokens) a tokenization vault accepts. The op
    * audits the contract per segment: every row decrypts back to its
    * original, and distinct tokens = distinct names (determinism +
    * injectivity). DuckDB has no AES, so the oracle checks the
    * DECRYPTED truth — the audit columns only hash-match if the
    * roundtrip held on every row. Map-only below the segment agg. */
  def cryptoRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // 16-byte demo key inline; production injects it from a KMS
    val token = expr("aes_encrypt(c_name, 'graftdemokey0016', 'ECB')")
    Tables.customer(spark, dir)
      .withColumn("token", token)
      .withColumn("back",
        expr("cast(aes_decrypt(token, 'graftdemokey0016', 'ECB') AS STRING)"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        count_if(col("back") === col("c_name")).as("n_roundtrip_ok"),
        countDistinct(col("token")).as("n_distinct_tokens"),
        countDistinct(col("c_name")).as("n_distinct_names"))
      .orderBy(col("c_mktsegment"))
  }

  val cryptoRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |       count(*) AS n_roundtrip_ok,
      |       count(DISTINCT c_name) AS n_distinct_tokens,
      |       count(DISTINCT c_name) AS n_distinct_names
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** LATE-ARRIVING DIMENSION handling — the Kimball unknown-member
    * pattern: facts land before their dimension row does, resolve to
    * the UNKNOWN member (key −1) on the first pass, and a later
    * backfill pass re-resolves them once the dim load completes. The
    * offline twin models the two loads deterministically: dim load 1
    * is every customer except the c_custkey % 97 == 0 stragglers,
    * load 2 completes the dimension. The fact pipeline is the real
    * plan shape: fact LEFT JOIN dim (broadcast at dim scale, shuffle
    * hash at 100 TB with the dim bloom-pruned), unknowns carried with
    * the −1 key — never dropped, the audit discipline — then the
    * second-pass join only over the UNKNOWN SLICE (the backfill scan
    * is proportional to the stragglers, not to the fact table).
    * Census per priority: matched, backfilled, still-unknown, and the
    * first-pass miss rate in ppm. */
  def lateDim(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val dim1 = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val dim2 = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val pass1 = facts.join(broadcast(dim1), facts("o_custkey") === dim1("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        coalesce(col("c_custkey"), lit(-1L)).as("dim_key"))
    val unknowns = pass1.filter(col("dim_key") === -1)
      .join(broadcast(dim2), pass1("o_custkey") === dim2("c_custkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("c_custkey"), lit(-1L)).as("backfilled_key"))
    pass1.join(unknowns, Seq("o_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_facts"),
        count_if(col("dim_key") =!= -1).as("matched_first"),
        count_if(col("dim_key") === -1 && col("backfilled_key") =!= -1).as("backfilled"),
        count_if(col("dim_key") === -1 &&
          (col("backfilled_key").isNull || col("backfilled_key") === -1)).as("still_unknown"))
      .withColumn("miss_ppm",
        round(lit(1e6) * (col("n_facts") - col("matched_first")).cast("double") /
          col("n_facts").cast("double")).cast("long"))
      .orderBy(col("o_orderpriority"))
  }

  val lateDimSql: String =
    """WITH dim1 AS (
      |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 97 <> 0),
      |pass1 AS (
      |  SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority,
      |         coalesce(d.c_custkey, -1) AS dim_key
      |  FROM orders o LEFT JOIN dim1 d ON o.o_custkey = d.c_custkey),
      |unk AS (
      |  SELECT p.o_orderkey, coalesce(d.c_custkey, -1) AS backfilled_key
      |  FROM pass1 p LEFT JOIN customer d ON p.o_custkey = d.c_custkey
      |  WHERE p.dim_key = -1)
      |SELECT p.o_orderpriority, count(*) AS n_facts,
      |       CAST(count(*) FILTER (WHERE p.dim_key <> -1) AS BIGINT) AS matched_first,
      |       CAST(count(*) FILTER (WHERE p.dim_key = -1 AND u.backfilled_key <> -1)
      |            AS BIGINT) AS backfilled,
      |       CAST(count(*) FILTER (WHERE p.dim_key = -1
      |                              AND (u.backfilled_key IS NULL OR u.backfilled_key = -1))
      |            AS BIGINT) AS still_unknown,
      |       CAST(round(1e6 * CAST(count(*) - count(*) FILTER (WHERE p.dim_key <> -1) AS DOUBLE)
      |                  / CAST(count(*) AS DOUBLE)) AS BIGINT) AS miss_ppm
      |FROM pass1 p LEFT JOIN unk u ON p.o_orderkey = u.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** K-ANONYMITY / L-DIVERSITY AUDIT — the privacy screen run before
    * a table leaves the warehouse (the release-gate sibling of
    * [[pseudonymize]]'s transform): group customers by the
    * quasi-identifier tuple (nation, market segment, balance rounded
    * to the thousand — the classic "coarse enough to publish" QI
    * set) and report the re-identification surface: k (the smallest
    * equivalence class), how many rows sit in classes below the k=5
    * release threshold (count + ppm), how many rows are singletons
    * (unique — directly re-identifiable), and l-diversity (the
    * smallest per-class count of distinct exact balances — the
    * sensitive attribute a homogeneity attack would read off).
    * Everything is exact integer counting; the one ratio is a ppm
    * division. Scale shape: one map-side-combinable groupBy on the
    * QI tuple (the class table is ≤ |nations|·|segments|·|buckets|,
    * far smaller than the data), then a 1-row reduce over classes;
    * the distinct-balance count rides the same shuffle as a
    * two-level groupBy. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_k"),
        round(col("c_acctbal") * 100.0d).cast("long").as("bal_cents"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_k"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("bal_cents")).as("l"))
      .agg(sum(col("sz")).as("n_rows"), count(lit(1)).as("n_classes"),
        min(col("sz")).as("k_min"),
        sum(when(col("sz") < 5L, col("sz")).otherwise(0L)).as("rows_below_k5"),
        sum(when(col("sz") === 1L, 1L).otherwise(0L)).as("singleton_classes"),
        min(col("l")).as("l_div_min"))
      .select(col("n_rows"), col("n_classes"), col("k_min"),
        col("rows_below_k5"),
        round(lit(1e6) * col("rows_below_k5").cast("double") /
          col("n_rows").cast("double")).cast("long").as("risk_ppm"),
        col("singleton_classes"), col("l_div_min"))

  val kAnonymitySql: String =
    """WITH q AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
      |         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
      |  FROM customer),
      |cls AS (
      |  SELECT c_nationkey, c_mktsegment, bal_k, count(*) AS sz,
      |         count(DISTINCT bal_cents) AS l
      |  FROM q GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT sum(sz) AS n_rows, count(*) AS n_classes, min(sz) AS k_min,
      |         sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS rows_below_k5,
      |         sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS singleton_classes,
      |         min(l) AS l_div_min
      |  FROM cls)
      |SELECT CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(n_classes AS BIGINT) AS n_classes,
      |       CAST(k_min AS BIGINT) AS k_min,
      |       CAST(rows_below_k5 AS BIGINT) AS rows_below_k5,
      |       CAST(round(1e6 * CAST(rows_below_k5 AS DOUBLE) /
      |            CAST(n_rows AS DOUBLE)) AS BIGINT) AS risk_ppm,
      |       CAST(singleton_classes AS BIGINT) AS singleton_classes,
      |       CAST(l_div_min AS BIGINT) AS l_div_min
      |FROM m""".stripMargin

  /** FUNCTIONAL-DEPENDENCY SCREEN — the schema-profiling pass that
    * discovers which column determines which (the metadata a
    * normalizer, a join-key recommender, or a data-contract checker
    * needs): for each candidate lhs→rhs, the FD holds iff the number
    * of distinct lhs values equals the number of distinct (lhs, rhs)
    * pairs; the violation surface is reported as the ppm excess of
    * pair-groups over lhs-groups. Six candidates spanning three
    * tables — two true dependencies (customer→nation via the FK,
    * nation→region via the hierarchy), one key-like (name→custkey),
    * and three expected failures. Exact distinct counts, exact
    * verdicts — the judge-grade version of profiling; the scale
    * escape hatch for 100 TB is the HLL variant the engine already
    * ships (`agg_approx_distinct`), trading exactness for one pass.
    * Scale shape: each candidate is one two-column distinct
    * aggregation (map-side partial dedup); candidates are
    * independent and union at the driver edge — the plan is six
    * parallel compact aggs, no joins. */
  def fdScreen(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def cand(tbl: String, df: DataFrame, lhs: String, rhs: String): DataFrame =
      df.agg(countDistinct(col(lhs)).as("n_lhs"),
          countDistinct(col(lhs), col(rhs)).as("n_pairs"))
        .select(lit(tbl).as("tbl"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_pairs"),
          (col("n_pairs") === col("n_lhs")).as("holds"),
          round(lit(1e6) * (col("n_pairs") - col("n_lhs")).cast("double") /
            col("n_lhs").cast("double")).cast("long").as("violation_ppm"))
    cand("customer", cust, "c_custkey", "c_nationkey")
      .unionAll(cand("customer", cust, "c_name", "c_custkey"))
      .unionAll(cand("customer", cust, "c_nationkey", "c_mktsegment"))
      .unionAll(cand("nation", nat, "n_nationkey", "n_regionkey"))
      .unionAll(cand("lineitem", li, "l_orderkey", "l_suppkey"))
      .unionAll(cand("lineitem", li, "l_partkey", "l_suppkey"))
      .orderBy(col("tbl"), col("lhs"), col("rhs"))
  }

  val fdScreenSql: String = {
    def cand(tbl: String, lhs: String, rhs: String): String =
      s"""SELECT '$tbl' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs,
         |       CAST(n_lhs AS BIGINT) AS n_lhs, CAST(n_pairs AS BIGINT) AS n_pairs,
         |       n_pairs = n_lhs AS holds,
         |       CAST(round(1e6 * CAST(n_pairs - n_lhs AS DOUBLE) /
         |            CAST(n_lhs AS DOUBLE)) AS BIGINT) AS violation_ppm
         |FROM (SELECT count(DISTINCT $lhs) AS n_lhs,
         |             (SELECT count(*) FROM (SELECT DISTINCT $lhs, $rhs FROM $tbl)) AS n_pairs
         |      FROM $tbl)""".stripMargin
    Seq(
      cand("customer", "c_custkey", "c_nationkey"),
      cand("customer", "c_name", "c_custkey"),
      cand("customer", "c_nationkey", "c_mktsegment"),
      cand("nation", "n_nationkey", "n_regionkey"),
      cand("lineitem", "l_orderkey", "l_suppkey"),
      cand("lineitem", "l_partkey", "l_suppkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY tbl, lhs, rhs")
  }

  // ---------------------------------------------------------------
  // Data Vault raw-vault build
  // ---------------------------------------------------------------

  /** DATA VAULT raw-vault build — the hub/link/satellite hash-key
    * modeling pattern (Linstedt): business keys become deterministic
    * md5 HUB keys, the order→customer relationship becomes a LINK key
    * over the pipe-joined key pair, and the customer's descriptive
    * attributes collapse to a SATELLITE HASHDIFF (doubles enter the
    * hashdiff as exact integer cents — double→string formatting is
    * never hashed, the cross-engine determinism rule). The audit
    * row per vault entity: row count, distinct hash keys (hub/link
    * uniqueness proof; sat distinct = change cardinality), and an
    * order-free bit_xor checksum of the 32-bit key prefixes — the
    * cheap cross-system reconciliation handle. Scale: four
    * map-side-combinable full scans, no joins, no windows; every
    * output is a 4-row reduce. */
  def dataVault(spark: SparkSession, dir: String): DataFrame = {
    def audit(name: String, df: DataFrame): DataFrame =
      df.select(conv(substring(col("hk"), 1, 8), 16, 10).cast("long").as("hkp"),
          col("hk"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("hk")).as("distinct_hk"),
          expr("bit_xor(hkp)").as("checksum"))
        .select(lit(name).as("entity"), col("n_rows"), col("distinct_hk"),
          col("checksum"))
    val hubCustomer = Tables.customer(spark, dir)
      .select(md5(col("c_custkey").cast("string").cast("binary")).as("hk"))
    val hubOrder = Tables.orders(spark, dir)
      .select(md5(col("o_orderkey").cast("string").cast("binary")).as("hk"))
    val link = Tables.orders(spark, dir)
      .select(md5(concat_ws("|", col("o_custkey"), col("o_orderkey"))
        .cast("binary")).as("hk"))
    val satCustomer = Tables.customer(spark, dir)
      .select(md5(concat_ws("|", col("c_name"), col("c_mktsegment"),
        round(col("c_acctbal") * 100.0d).cast("long")).cast("binary")).as("hk"))
    audit("hub_customer", hubCustomer)
      .unionByName(audit("hub_order", hubOrder))
      .unionByName(audit("link_order_customer", link))
      .unionByName(audit("sat_customer", satCustomer))
      .orderBy(col("entity"))
  }

  val dataVaultSql: String =
    """WITH hc AS (SELECT md5(CAST(c_custkey AS VARCHAR)) AS hk FROM customer),
      |ho AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS hk FROM orders),
      |lk AS (SELECT md5(CAST(o_custkey AS VARCHAR) || '|'
      |              || CAST(o_orderkey AS VARCHAR)) AS hk FROM orders),
      |sc AS (SELECT md5(c_name || '|' || c_mktsegment || '|'
      |              || CAST(CAST(round(c_acctbal * 100.0) AS BIGINT) AS VARCHAR)) AS hk
      |       FROM customer),
      |a AS (
      |  SELECT 'hub_customer' AS entity, count(*) AS n_rows,
      |         count(DISTINCT hk) AS distinct_hk,
      |         bit_xor(('0x' || substring(hk, 1, 8))::BIGINT) AS checksum
      |  FROM hc
      |  UNION ALL
      |  SELECT 'hub_order', count(*), count(DISTINCT hk),
      |         bit_xor(('0x' || substring(hk, 1, 8))::BIGINT) FROM ho
      |  UNION ALL
      |  SELECT 'link_order_customer', count(*), count(DISTINCT hk),
      |         bit_xor(('0x' || substring(hk, 1, 8))::BIGINT) FROM lk
      |  UNION ALL
      |  SELECT 'sat_customer', count(*), count(DISTINCT hk),
      |         bit_xor(('0x' || substring(hk, 1, 8))::BIGINT) FROM sc)
      |SELECT entity, CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(distinct_hk AS BIGINT) AS distinct_hk,
      |       CAST(checksum AS BIGINT) AS checksum
      |FROM a ORDER BY entity""".stripMargin

  // ---------------------------------------------------------------
  // Referential-integrity audit
  // ---------------------------------------------------------------

  /** REFERENTIAL-INTEGRITY audit across the warehouse's five FK edges
    * — the load-gate check a star schema runs after every batch:
    * orphan children (fact rows whose key hits no dimension row, the
    * join-loss hazard every inner join silently amplifies) and
    * unreferenced parents (dimension rows no fact ever touches — the
    * purge-candidate census). Per edge: child rows/keys, orphan
    * rows/keys, parent keys, unreferenced parents — one row each, a
    * 5-row artifact. Scale: each edge is ONE map-side-combinable
    * distinct-key aggregation on the child (the fact table never
    * crosses the wire row-wise — only its key census does) plus one
    * key-partitioned full-outer join against the parent's key set;
    * no windows, no sorts. The orders→lineitem edge dominates and is
    * exactly the shuffle any FK validator must pay. */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame = {
      val ckeys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("nr"))
      val pkeys = parent.select(col(pk).as("k")).distinct()
        .withColumn("hit", lit(1L))
      ckeys.join(pkeys, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(col("nr")), lit(0L)).as("n_child_rows"),
          sum(when(col("nr").isNotNull, 1L).otherwise(0L)).as("n_child_keys"),
          coalesce(sum(when(col("hit").isNull, col("nr"))), lit(0L))
            .as("n_orphan_rows"),
          sum(when(col("hit").isNull && col("nr").isNotNull, 1L).otherwise(0L))
            .as("n_orphan_keys"),
          coalesce(sum(col("hit")), lit(0L)).as("n_parent_keys"),
          sum(when(col("nr").isNull && col("hit").isNotNull, 1L).otherwise(0L))
            .as("n_unref_parents"))
        .select(lit(name).as("edge"), col("n_child_rows"), col("n_child_keys"),
          col("n_orphan_rows"), col("n_orphan_keys"), col("n_parent_keys"),
          col("n_unref_parents"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    edge("lineitem_orders", li, "l_orderkey", o, "o_orderkey")
      .unionAll(edge("lineitem_part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionAll(edge("lineitem_supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionAll(edge("orders_customer", o, "o_custkey", c, "c_custkey"))
      .unionAll(edge("customer_nation", c, "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy(col("edge"))
  }

  val referentialIntegritySql: String = {
    def edge(name: String, child: String, ck: String,
             parent: String, pk: String): String =
      s"""SELECT '$name' AS edge,
         |       coalesce(sum(nr), 0) AS n_child_rows,
         |       sum(CASE WHEN nr IS NOT NULL THEN 1 ELSE 0 END) AS n_child_keys,
         |       coalesce(sum(CASE WHEN hit IS NULL THEN nr END), 0) AS n_orphan_rows,
         |       sum(CASE WHEN hit IS NULL AND nr IS NOT NULL THEN 1 ELSE 0 END)
         |         AS n_orphan_keys,
         |       coalesce(sum(hit), 0) AS n_parent_keys,
         |       sum(CASE WHEN nr IS NULL AND hit IS NOT NULL THEN 1 ELSE 0 END)
         |         AS n_unref_parents
         |FROM (SELECT $ck AS k, count(*) AS nr FROM $child GROUP BY 1) ck
         |FULL OUTER JOIN
         |     (SELECT DISTINCT $pk AS k, 1 AS hit FROM $parent) pk
         |USING (k)""".stripMargin
    Seq(
      edge("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      edge("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      edge("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      edge("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      edge("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"))
      .map(e => s"SELECT CAST(n_child_rows AS BIGINT) AS n_child_rows," +
        " CAST(n_child_keys AS BIGINT) AS n_child_keys," +
        " CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows," +
        " CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys," +
        " CAST(n_parent_keys AS BIGINT) AS n_parent_keys," +
        " CAST(n_unref_parents AS BIGINT) AS n_unref_parents," +
        s" edge FROM ($e)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
  }

  /** HASH SURROGATE KEYS + collision/uniformity audit — the
    * warehouse's scale-safe alternative to sequence-assigned ids: a
    * dense global sequence needs either a single-partition sort or
    * cross-partition coordination (both banned shapes), while a hash
    * of the typed natural key is map-only at ANY corpus size and
    * stable across reloads (the Data Vault hub-key argument,
    * [[dataVault]]). The price is collision risk — so the audit ships
    * WITH the operator: per entity, rows vs distinct surrogates
    * (collisions = join corruption, must be 0 before the key goes
    * live) and a 16-bucket uniformity census (hot buckets = skewed
    * shuffles downstream). Keys ride the portable md5 idHash with an
    * entity prefix so cross-entity keys can never collide by
    * construction. One distinct-key agg + one compact bucket census
    * per entity. */
  def surrogateKeys(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    def audit(name: String, df: DataFrame, natural: Column): DataFrame = {
      val b = df.select(graft.api.Graft.idHash(natural).as("sk"))
        .withColumn("bucket", pmod(col("sk"), lit(16L)))
      val bc = b.groupBy(col("bucket")).agg(count(lit(1)).as("nb"))
        .agg(min(col("nb")).as("bucket_min"), max(col("nb")).as("bucket_max"))
      b.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("sk")).as("n_distinct_sk"))
        .crossJoin(broadcast(bc))
        .select(lit(name).as("entity"), col("n_rows"), col("n_distinct_sk"),
          (col("n_rows") - col("n_distinct_sk")).as("n_collisions"),
          col("bucket_min"), col("bucket_max"),
          round(lit(1e6) * lit(16.0d) *
            d(col("bucket_max") - col("bucket_min")) / d(col("n_rows")))
            .cast("long").as("skew_ppm"))
    }
    audit("customer", Tables.customer(spark, dir),
      concat(lit("customer|"), col("c_custkey").cast("string")))
      .unionAll(audit("part", Tables.part(spark, dir),
        concat(lit("part|"), col("p_partkey").cast("string"))))
      .unionAll(audit("supplier", Tables.supplier(spark, dir),
        concat(lit("supplier|"), col("s_suppkey").cast("string"))))
      .orderBy(col("entity"))
  }

  val surrogateKeysSql: String = {
    def ent(name: String, table: String, key: String): String =
      s"""SELECT '$name' AS entity, n_rows, n_distinct_sk,
         |       n_rows - n_distinct_sk AS n_collisions, bucket_min, bucket_max,
         |       CAST(round(1e6 * 16.0 * CAST(bucket_max - bucket_min AS DOUBLE)
         |            / CAST(n_rows AS DOUBLE)) AS BIGINT) AS skew_ppm
         |FROM (SELECT count(*) AS n_rows, count(DISTINCT sk) AS n_distinct_sk
         |      FROM (SELECT ('0x' || substring(md5('$name|' || CAST($key AS VARCHAR)), 1, 8))::BIGINT AS sk
         |            FROM $table)),
         |     (SELECT min(nb) AS bucket_min, max(nb) AS bucket_max
         |      FROM (SELECT sk % 16 AS bucket, count(*) AS nb
         |            FROM (SELECT ('0x' || substring(md5('$name|' || CAST($key AS VARCHAR)), 1, 8))::BIGINT AS sk
         |                  FROM $table)
         |            GROUP BY 1))""".stripMargin
    Seq(ent("customer", "customer", "c_custkey"),
      ent("part", "part", "p_partkey"),
      ent("supplier", "supplier", "s_suppkey"))
      .map(e => s"SELECT CAST(n_rows AS BIGINT) AS n_rows," +
        " CAST(n_distinct_sk AS BIGINT) AS n_distinct_sk," +
        " CAST(n_collisions AS BIGINT) AS n_collisions," +
        " CAST(bucket_min AS BIGINT) AS bucket_min," +
        " CAST(bucket_max AS BIGINT) AS bucket_max," +
        s" skew_ppm, entity FROM ($e)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY entity")
  }

  // ---------------------------------------------------------------
  // Accumulating-snapshot fact (Kimball milestone pipeline)
  // ---------------------------------------------------------------

  /** ACCUMULATING-SNAPSHOT fact build + milestone-lag report — the
    * third Kimball fact-table pattern beside the transaction grain
    * (lineitem itself) and the periodic snapshot ([[incrementalAgg]]):
    * ONE row per pipeline entity (order) whose milestone columns fill
    * in as the process advances — placed → first shipment → last
    * shipment — and whose value is the LAG arithmetic between
    * milestones (where does fulfillment time go, by status?). The
    * build is one fact-side agg (min/max shipdate per order, never a
    * window) joined to the order dim; day lags are exact integers
    * (timestamp div 86400), averages quantize to milli once. Orders
    * with no shipped line yet keep NULL milestones and are counted —
    * the in-flight cohort every accumulating snapshot must carry.
    * Scale: fact agg on the join key + broadcast-ineligible dim join
    * on o_orderkey; output is status-bounded. */
  def accumulatingSnapshot(spark: SparkSession, dir: String): DataFrame = {
    def day(c: Column): Column = (unix_timestamp(c) / lit(86400L)).cast("long")
    val ship = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(min(day(col("l_shipdate"))).as("first_ship_d"),
        max(day(col("l_shipdate"))).as("last_ship_d"),
        count(lit(1)).as("n_lines"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        day(col("o_orderdate")).as("order_d"))
      .join(ship, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count_if(col("first_ship_d").isNull).as("n_in_flight"),
        sum(col("n_lines")).as("n_lines"),
        round(lit(1e3) * avg(col("first_ship_d") - col("order_d")))
          .cast("long").as("avg_days_to_first_ship_milli"),
        round(lit(1e3) * avg(col("last_ship_d") - col("first_ship_d")))
          .cast("long").as("avg_ship_window_days_milli"))
      .orderBy(col("o_orderstatus"))
  }

  val accumulatingSnapshotSql: String =
    """WITH ship AS (
      |  SELECT l_orderkey,
      |         min(CAST(epoch(l_shipdate) AS BIGINT) // 86400) AS first_ship_d,
      |         max(CAST(epoch(l_shipdate) AS BIGINT) // 86400) AS last_ship_d,
      |         count(*) AS n_lines
      |  FROM lineitem GROUP BY 1)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |       CAST(count(*) FILTER (WHERE first_ship_d IS NULL) AS BIGINT)
      |         AS n_in_flight,
      |       CAST(sum(n_lines) AS BIGINT) AS n_lines,
      |       CAST(round(1e3 * avg(first_ship_d
      |              - CAST(epoch(o_orderdate) AS BIGINT) // 86400)) AS BIGINT)
      |         AS avg_days_to_first_ship_milli,
      |       CAST(round(1e3 * avg(last_ship_d - first_ship_d)) AS BIGINT)
      |         AS avg_ship_window_days_milli
      |FROM orders LEFT JOIN ship ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** SCD TYPE 4 — the MINI-DIMENSION (completing the slowly-changing
    * family beside [[scd2]]/[[scd3]]/[[scd6]]): rapidly-changing
    * attributes (monthly spend band × dominant order priority) split
    * OUT of the customer dimension into their own tiny dimension of
    * distinct combos with a surrogate key; each (customer, month)
    * fact row then points at (customer_key, minidim_key) instead of
    * versioning the whole customer row per change — the Kimball
    * answer to dimensions that would otherwise explode under SCD2.
    * Output is the mini-dimension WITH its usage census: ≤ 5×5 rows
    * no matter the corpus, and Σ n_fact_rows = the fact row count
    * (losslessness — pinned by the spec).
    *
    * Exactness: bands are integer division on cents; the dominant
    * priority breaks count ties toward the smallest priority string
    * via ONE struct-min ((−cnt, prio)); the surrogate key is a
    * dense_rank over the ≤25-row mini-dim only. Scale: two compact-key
    * aggs; the unpartitioned rank orders 25 rows, never data. */
  def scd4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val cells = o.groupBy(col("cust"), col("month"), col("prio"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sc"))
    val fact = cells.groupBy(col("cust"), col("month"))
      .agg(sum(col("sc")).as("spend"),
        min(struct((-col("cnt")).as("nc"), col("prio").as("prio"))).as("m"))
      .select(col("cust"), col("month"),
        least(expr("spend div 5000000"), lit(4L)).as("spend_band"),
        col("m.prio").as("prio_mode"))
    val mini = fact.groupBy(col("spend_band"), col("prio_mode"))
      .agg(count(lit(1)).as("n_fact_rows"),
        countDistinct(col("cust")).as("n_customers"))
    mini
      .withColumn("md_key", dense_rank().over(
        Window.orderBy(col("spend_band"), col("prio_mode"))).cast("long"))
      .select(col("md_key"), col("spend_band"), col("prio_mode"),
        col("n_fact_rows"), col("n_customers"))
      .orderBy(col("md_key"))
  }

  val scd4Sql: String =
    """WITH o AS (
      |  SELECT o_custkey AS cust, strftime(o_orderdate, '%Y-%m') AS month,
      |         o_orderpriority AS prio,
      |         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      |  FROM orders),
      |cells AS (
      |  SELECT cust, month, prio, count(*) AS cnt, sum(cents) AS sc
      |  FROM o GROUP BY 1, 2, 3),
      |fact AS (
      |  SELECT cust, month,
      |         least(sum(sc) // 5000000, 4) AS spend_band,
      |         (min(struct_pack(nc := -cnt, prio := prio))).prio AS prio_mode
      |  FROM cells GROUP BY 1, 2),
      |mini AS (
      |  SELECT spend_band, prio_mode, count(*) AS n_fact_rows,
      |         count(DISTINCT cust) AS n_customers
      |  FROM fact GROUP BY 1, 2)
      |SELECT CAST(dense_rank() OVER (ORDER BY spend_band, prio_mode) AS BIGINT)
      |         AS md_key,
      |       CAST(spend_band AS BIGINT) AS spend_band, prio_mode,
      |       CAST(n_fact_rows AS BIGINT) AS n_fact_rows,
      |       CAST(n_customers AS BIGINT) AS n_customers
      |FROM mini ORDER BY md_key""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_scd4" -> (scd4 _),
    "etl_accumulating_snapshot" -> (accumulatingSnapshot _),
    "etl_surrogate_keys" -> (surrogateKeys _),
    "etl_referential_integrity" -> (referentialIntegrity _),
    "etl_data_vault" -> (dataVault _),
    "etl_k_anonymity" -> (kAnonymity _),
    "etl_fd_screen" -> (fdScreen _),
    "etl_late_dim" -> (lateDim _),
    "etl_crypto_roundtrip" -> (cryptoRoundtrip _),
    "etl_scd3" -> (scd3 _),
    "etl_scd6" -> (scd6 _),
    "etl_bitemporal" -> (bitemporal _),
    "etl_purge_audit" -> (purgeAudit _),
    "etl_snapshot_diff" -> (snapshotDiff _),
    "etl_cdc_latest" -> (cdcLatest _),
    "etl_scd2" -> (scd2Build _),
    "etl_scd2_lookup" -> (scd2Lookup _),
    "etl_pseudonymize" -> (pseudonymize _),
    "etl_content_hash" -> (contentHash _),
    "etl_freshness" -> (freshness _),
    "etl_dq_checks" -> (dqChecks _),
    "etl_incremental_agg" -> (incrementalAgg _),
    "etl_merge_upsert" -> (mergeUpsert _)
  )

  def oracle: Map[String, String] = Map(
    "etl_scd4" -> scd4Sql,
    "etl_accumulating_snapshot" -> accumulatingSnapshotSql,
    "etl_surrogate_keys" -> surrogateKeysSql,
    "etl_referential_integrity" -> referentialIntegritySql,
    "etl_data_vault" -> dataVaultSql,
    "etl_k_anonymity" -> kAnonymitySql,
    "etl_fd_screen" -> fdScreenSql,
    "etl_late_dim" -> lateDimSql,
    "etl_crypto_roundtrip" -> cryptoRoundtripSql,
    "etl_scd3" -> scd3Sql,
    "etl_scd6" -> scd6Sql,
    "etl_bitemporal" -> bitemporalSql,
    "etl_purge_audit" -> purgeAuditSql,
    "etl_snapshot_diff" -> snapshotDiffSql,
    "etl_cdc_latest" -> cdcLatestSql,
    "etl_scd2" -> scd2BuildSql,
    "etl_scd2_lookup" -> scd2LookupSql,
    "etl_pseudonymize" -> pseudonymizeSql,
    "etl_content_hash" -> contentHashSql,
    "etl_freshness" -> freshnessSql,
    "etl_dq_checks" -> dqChecksSql,
    "etl_incremental_agg" -> incrementalAggSql,
    "etl_merge_upsert" -> mergeUpsertSql
  )
}
