package graft.streaming

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference IS a (stateless) streaming system — one CloudEvent per
  * GCS object-finalize, /root/reference/main.py:1–5 — so the engine
  * models ingestion as Structured Streaming over a file source, with
  * EXT stateful operators (watermarked windows, streaming dedup,
  * sessionization) on top.
  *
  * Oracle strategy (SURVEY.md §2.9): streaming results can't be
  * hash-checked by the DuckDB harness, so every streaming op here has a
  * bounded **batch twin** registered in SparkEntry — identical
  * transformation over the bounded events table (the Dataflow-model
  * batch/stream unification). The streaming paths themselves are
  * exercised by ScalaTest with MemoryStream + Trigger.AvailableNow.
  */
object Streams {

  // ---------- streaming builders (used by tests / production) ----------

  /** The reference function's operational envelope (main.tf:51–53:
    * `max_instance_count = 3`, `timeout_seconds = 540`,
    * `available_memory = "256M"`) mapped onto Structured Streaming's
    * rate controls:
    *
    *  - `maxFilesPerTrigger` bounds how many arrived objects one
    *    micro-batch ingests — the concurrency cap that
    *    `max_instance_count ≤ 3` imposes on the event-driven function
    *    (at most 3 objects in flight). Default 3, matching main.tf:53.
    *  - `processingInterval` is the redelivery/pacing analog of the
    *    540 s function timeout: a function that must finish one object
    *    inside 540 s becomes a micro-batch cadence no slower than that
    *    bound (e.g. `Some("540 seconds")` = one drain attempt per
    *    envelope window). `None` keeps Trigger.AvailableNow — drain
    *    the backlog now, in rate-capped batches, then stop — which is
    *    both the test mode and the batch-catchup mode.
    *
    * Memory is deliberately NOT mirrored: Spark's executor sizing is a
    * cluster-submit concern, not a per-operator knob. */
  final case class TriggerEnvelope(
      maxFilesPerTrigger: Int = 3,
      processingInterval: Option[String] = None) {
    require(maxFilesPerTrigger > 0,
      s"maxFilesPerTrigger must be positive, got $maxFilesPerTrigger")

    def trigger: org.apache.spark.sql.streaming.Trigger =
      processingInterval match {
        case Some(iv) => org.apache.spark.sql.streaming.Trigger.ProcessingTime(iv)
        case None     => org.apache.spark.sql.streaming.Trigger.AvailableNow()
      }
  }

  /** File-arrival ingestion stream: the Spark analog of the reference's
    * GCS→Eventarc notification flow. Parquet files landing in `dir` are
    * discovered incrementally; `maxFilesPerTrigger` is the rate-limit
    * analog of the reference's max_instance_count (main.tf:53). */
  def fileArrivals(spark: SparkSession, dir: String,
                   schema: org.apache.spark.sql.types.StructType,
                   maxFilesPerTrigger: Int = 3): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Notification record shape for [[xlsxEtl]] — the Spark analog of
    * the reference's CloudEvent payload (bucket, name, size;
    * /root/reference/main.py:7–9). */
  val notificationSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("size_bytes", org.apache.spark.sql.types.LongType)))

  /** The reference's END-TO-END pipeline as ONE continuous streaming
    * job (main.py:1–17 as a single dataflow): object-arrival
    * notifications stream in from `notifDir` → the accept predicate
    * (prefix/suffix, main.py:12) filters them → each accepted object
    * is read from `landingRoot` through the typed XLSX DSv2
    * (`inferSchema=true` — the schema-at-read model of main.py:17's
    * implied load) → `transform` → checkpointed warehouse write.
    *
    * Exactly-once story (two independent mechanisms, both required):
    *  1. the checkpoint makes each notification batch process at
    *     most once across restarts (source offsets committed after
    *     the batch function returns), and
    *  2. the PER-OBJECT overwrite makes reprocessing idempotent —
    *     a replayed notification (at-least-once delivery, a crash
    *     between batch completion and offset commit, or a lost
    *     checkpoint) overwrites the same `object=` subdir instead of
    *     appending duplicates. This is the same idempotent-load
    *     contract a production warehouse loader (e.g. a BigQuery load
    *     job keyed by object) provides.
    *
    * Scale shape: the per-batch collect is of object NAMES only —
    * bounded by `maxFilesPerTrigger` × notifications-per-file (the
    * reference's one-invocation-per-event model, main.tf's
    * max_instance_count); the workbook reads and warehouse writes are
    * distributed jobs. */
  def xlsxEtl(spark: SparkSession, notifDir: String, landingRoot: String,
              warehouseDir: String, checkpoint: String,
              prefix: String = "minha-pasta/", suffix: String = ".xlsx",
              transform: DataFrame => DataFrame = identity,
              envelope: TriggerEnvelope = TriggerEnvelope())
             : org.apache.spark.sql.streaming.StreamingQuery = {
    val accepted = fileArrivals(spark, notifDir, notificationSchema,
        envelope.maxFilesPerTrigger)
      .filter(graft.api.Graft.objectNameAccept(col("name"), prefix, suffix))
    accepted.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val names = batch.select("name").distinct().collect().map(_.getString(0)).sorted
        // a notification name is UNTRUSTED input joined onto a local
        // path: reject anything that could escape landingRoot (an
        // object store's flat namespace has no "..", so a traversal
        // segment is malformed by definition, not a valid object)
        val (bad, ok) = names.partition(n =>
          n.startsWith("/") || n.split('/').contains("..") || n.split('/').contains(""))
        if (bad.nonEmpty)
          org.slf4j.LoggerFactory.getLogger("graft.streaming.Streams")
            .warn(s"xlsxEtl: skipping ${bad.length} malformed object name(s): ${bad.mkString(", ")}")
        ok.foreach { n =>
          val workbook = spark.read.format("xlsx")
            .option("inferSchema", true).load(s"$landingRoot/$n")
          // dir name = readable sanitized prefix + md5 of the RAW name:
          // sanitization alone can collide ("a/b" vs "a__b"), and a
          // collision would let one object's overwrite destroy another's
          // rows under the exactly-once contract
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
          graft.api.Graft.writeWarehouse(
            transform(workbook).withColumn("_source_object", lit(n)),
            "parquet",
            s"$warehouseDir/object=${n.replaceAll("[^A-Za-z0-9._-]", "__")}-$digest")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(envelope.trigger)
      .start()
  }

  /** Streaming corpus ingestion — the §2.10 corpus-prep operators
    * composed onto an unbounded document stream. Every per-document
    * stage (content digest, quality verdict, BPE token count) is a
    * map-only expression, so it runs on a stream UNCHANGED — the
    * Dataflow-model unification the engine is built around; the only
    * stateful stage is the within-watermark dedup on the digest
    * (bounded state: digests evict as the watermark passes). This is
    * the streaming twin of the corpus_e2e_prep front half. */
  def corpusIngest(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("digest", graft.api.Graft.contentDigest(col("text")))
      .dropDuplicatesWithinWatermark("digest")
      .withColumn("verdict", graft.api.Graft.qualityVerdict(col("text"),
        minTokens = 2, maxTokens = 5000, maxDupRatio = 0.9, maxMeanWordLen = 20.0))
      .filter(col("verdict") === "ok")
      .withColumn("n_tokens", graft.api.Graft.bpeTokenCount(col("text")))

  /** Streaming ANN index build — the IVF-PQ ingest stages running
    * UNCHANGED on a stream: cell assignment, residual, and PQ encode
    * are pure projections over bounded model artifacts (the centroid
    * table and codebook travel as literals, the same way the batch
    * path inlines them), so new embeddings acquire their (cell,
    * codes) index entries incrementally with ZERO streaming state.
    * Retraining the quantizer is a batch concern (a new literal =
    * a new query incarnation); the stream only ever encodes. The
    * sink keeps the library's exactly-once contract (checkpoint +
    * idempotent overwrite, as [[xlsxEtl]]). */
  def embeddingIngest(vectors: DataFrame, cents: org.apache.spark.sql.Column, cb: org.apache.spark.sql.Column): DataFrame = {
    graft.functions.VectorFunctions.register(vectors.sparkSession)
    vectors
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("vn", call_function("graft_l2norm", col("v")))
      .withColumn("cell", call_function("graft_argmax_cell", col("v"), col("vn"), cents))
      .withColumn("rv", call_function("graft_cell_residual", col("v"), col("cell"), cents))
      .withColumn("codes", call_function("graft_pq_encode", col("rv"), cb))
      .select(col("vec_id"), col("cell"), col("codes"))
  }

  /** Watermarked tumbling-window counts per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding-window (2h window, 1h slide) activity. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))

  /** Streaming exact-once dedup by event_id within the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")

  /** Bounded-state streaming dedup on the id ALONE: duplicates whose
    * event-times differ (retries, at-least-once replays) still
    * collapse, and state for an id is evicted once the watermark
    * passes its first sighting + delay — the shape plain
    * [[dedupStream]] can't bound (its state key includes ts, and
    * id-only dropDuplicates would keep state forever). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup dedup: minhash band signature per document,
    * first arrival per signature within the watermark wins — the
    * streaming twin of [[graft.operators.Dedup.incrementalDedup]]'s
    * in-batch stage (same signature function, same first-wins rule).
    * State is one compact ~36-byte signature per surviving doc and is
    * evicted as the watermark passes — bounded, unlike an id-only
    * dropDuplicates whose state grows with the stream. The signature
    * is a map-only native expression, so the only stateful stage is
    * the dedup itself. */
  def nearDupIngest(docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs
      .withColumn("sig", graft.api.Graft.minhashSignature(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("sig")
  }

  /** Session windows per user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("user_id"), col("n_events"))

  /** Custom state machine via mapGroupsWithState: running per-user
    * event count + last-seen type (the KeyValueGroupedDataset state
    * path for shapes windows can't express). */
  def runningUserState(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("event_id")).as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[(Long, String)]) =>
          val prev = state.getOption.getOrElse((0L, ""))
          // the group iterator arrives in shuffle order, not event
          // order — sort by event_id so "last" is deterministic
          val buf = rows.toSeq.sortBy(_._3)
          val next = (prev._1 + buf.size, buf.lastOption.map(_._2).getOrElse(prev._2))
          state.update(next)
          (user, next._1, next._2)
      }
      .toDF("user_id", "n_events", "last_type")
  }

  /** flatMapGroupsWithState: per-user anomaly emitter — emits one
    * record per processed batch chunk only when the user's running
    * error count crosses a threshold (a shape windows can't express:
    * conditional multi-row output + persistent cross-batch state). */
  def errorBursts(spark: SparkSession, events: DataFrame, threshold: Int = 2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.select(col("user_id"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val errs = rows.count(_._2 == "error")
          val total = prev + errs
          state.update(total)
          if (prev < threshold && total >= threshold) Iterator((user, total))
          else Iterator.empty
      }
      .toDF("user_id", "error_count")
  }

  /** FIRST-SEEN detector via flatMapGroupsWithState: emits one
    * (user, day, is_new) record the first time a user is active on a
    * day — `is_new` marks the user's first day EVER (the growth
    * dashboard's new/returning split, emitted incrementally instead
    * of recomputed). State per user is (first day, set of seen days)
    * — the day set is CALENDAR-BOUNDED (one Long per active day; a
    * production deployment ages it out with a watermark timeout once
    * days stop arriving late). A shape windows can't express:
    * conditional emission + cross-batch persistent state, the same
    * family as [[errorBursts]]. Downstream, a per-day count of the
    * emitted records IS the new/returning census
    * (`Analytics.newVsReturning` is the batch recompute of that
    * aggregate). */
  def firstSeen(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val dayNs = 86400L * 1000000000L
    events.select(col("user_id"),
        (unix_micros(col("ts").cast("timestamp")) * 1000).as("ts_ns"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Set[Long]), (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Set[Long])]) =>
          val (firstDay, seen) = state.getOption.getOrElse((Long.MaxValue, Set.empty[Long]))
          // deterministic within-batch order: process days ascending
          val days = rows.map(_._2 / dayNs).toSeq.distinct.sorted
          val fresh = days.filterNot(seen)
          val newFirst = math.min(firstDay, days.headOption.getOrElse(Long.MaxValue))
          state.update((newFirst, seen ++ fresh))
          // is_new marks the first day of a never-before-seen user.
          // Append mode cannot retract: if a LATER batch delivers an
          // EARLIER day (out-of-order beyond the within-batch sort),
          // the original emission stands — the standard event-time
          // caveat; the batch twin over the full log is the truth the
          // oracle checks.
          fresh.iterator.map(d =>
            (user, d, firstDay == Long.MaxValue && d == days.head))
      }
      .toDF("user_id", "day", "is_new")
  }

  /** Batch twin of [[firstSeen]]: consuming the whole stream, the
    * emitted set is exactly the distinct (user, day) pairs, with
    * `is_new` true on each user's first day. */
  def firstSeenBatch(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
      .distinct()
      .withColumn("is_new", col("day") === min(col("day")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .select(col("user_id"),
        date_format((col("day") * 86400L).cast("timestamp"), "yyyy-MM-dd").as("date"),
        col("is_new"))
      .orderBy(col("user_id"), col("date"))

  val firstSeenBatchSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events)
      |SELECT user_id,
      |       strftime(to_timestamp(day * 86400), '%Y-%m-%d') AS date,
      |       day = min(day) OVER (PARTITION BY user_id) AS is_new
      |FROM active ORDER BY user_id, date""".stripMargin

  /** Stream-static enrichment join: the unbounded stream joined to a
    * bounded dimension (broadcast — the dim never shuffles, each
    * micro-batch joins map-side). The production shape for decorating
    * events with slowly-changing reference data. Staleness caveat:
    * for FILE-based dims the file listing is resolved when the dim
    * DataFrame is created, so part files written later are NOT picked
    * up — to refresh between batches, rebuild the dim DataFrame
    * inside `foreachBatch` instead. Keys are resolved through their
    * parent frames, so stream and dim may share the column name. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, streamKey: String,
                    dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), "left")

  /** Stream-stream interval join: each error joined to the same user's
    * purchases in the following hour. Watermarks on BOTH sides bound
    * the join state (rows older than watermark+interval are evicted) —
    * the condition Spark requires for an unbounded-stream join to hold
    * finite state. The batch twin is rangeJoinEvents' shape. */
  def errorThenPurchase(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"), col("ts").as("err_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    e.join(p,
      col("err_user") === col("p_user") &&
        col("p_ts") > col("err_ts") &&
        col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"))
  }

  // ---------- bounded batch twins (oracle-checked) ----------

  /** Batch twin of tumblingCounts: window(ts, 1h) ≡ date_trunc hour. */
  def tumblingBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  val tumblingBatchSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
      |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TOP-K PER TUMBLING WINDOW — the "trending now" query: per 6-hour
    * window, the top-3 event types by count. Streaming mapping: the
    * windowed count is a standard watermarked tumbling aggregation
    * (append mode emits each window once it closes); the RANK is not
    * expressible inside a streaming agg, so it runs on the emitted
    * closed windows — a per-window-sized post-pass, the documented
    * two-stage shape of every streaming top-k. The batch twin runs
    * both stages in one plan; the rank filter compiles to the
    * one-exchange WindowGroupLimit plan (no full sort of the agg
    * table, the same physical shape as win_topk_per_group). */
  def topkWindowBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("window"))
      .orderBy(col("cnt").desc, col("event_type"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("rank"), col("event_type"), col("cnt"))
      .orderBy(col("win_start"), col("rank"))
  }

  val topkWindowBatchSql: String =
    """WITH counts AS (
      |  SELECT to_timestamp(epoch_ns(ts) // 21600000000000 * 21600) AS win, event_type,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT win, event_type, cnt,
      |         CAST(row_number() OVER (PARTITION BY win
      |                                 ORDER BY cnt DESC, event_type) AS BIGINT) AS rank
      |  FROM counts)
      |SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, rank, event_type, cnt
      |FROM ranked WHERE rank <= 3
      |ORDER BY 1, 2""".stripMargin

  /** Batch twin of slidingCounts: each event belongs to the windows
    * starting at trunc(ts) and trunc(ts)−1h. */
  def slidingBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(array(
        date_trunc("hour", col("ts")),
        date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"))).as("win_start_ts"))
      .groupBy(col("win_start_ts"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("win_start_ts"), "yyyy-MM-dd HH:mm:ss").as("win_start"), col("cnt"))
      .orderBy(col("win_start"))

  val slidingBatchSql: String =
    """SELECT strftime(win_start_ts, '%Y-%m-%d %H:%M:%S') AS win_start, count(*) AS cnt
      |FROM (
      |  SELECT date_trunc('hour', ts) AS win_start_ts FROM events
      |  UNION ALL
      |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch twin of dedupStream: one row per event_id (events are
    * already unique by id, so this degenerates to a count check plus
    * per-type distinct ids — still a real dedup plan). */
  def dedupBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
      .orderBy(col("event_type"))

  val dedupBatchSql: String =
    """SELECT event_type, count(*) AS n_unique
      |FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events ORDER BY event_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch twin of sessionCounts: classic gaps-and-islands — a session
    * starts where the gap from the previous event exceeds 30 min. */
  def sessionBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_ns") - col("prev_ts") > gapNs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("sess_start"))
      .select(col("user_id"), col("sess_id"), col("n_events"), col("sess_start"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  val sessionBatchSql: String =
    """SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
      |       strftime(date_trunc('second', min(ts)), '%Y-%m-%d %H:%M:%S') AS sess_start
      |FROM (
      |  SELECT user_id, ts, event_id,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |           CASE WHEN lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                  OR epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                     > 1800000000000
      |                THEN 1 ELSE 0 END AS new_sess
      |    FROM events))
      |GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin

  /** Batch twin of runningUserState: the mapGroupsWithState fixpoint
    * after the whole stream is consumed is exactly the per-user
    * (count, event_id-latest type) aggregate — max_by is the
    * one-shuffle batch form of "last write wins by event_id". */
  def userStateBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("event_type"), col("event_id")).as("last_type"))
      .orderBy(col("user_id"))

  val userStateBatchSql: String =
    """SELECT user_id, count(*) AS n_events,
      |       max_by(event_type, event_id) AS last_type
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Batch twin of errorBursts: consuming the whole stream, a user
    * emitted a burst record iff their total error count reached the
    * threshold; the final running count is the plain filtered
    * aggregate. (The mid-stream emission VALUE depends on micro-batch
    * boundaries — only the end-of-stream state is batch-deterministic,
    * which is what the oracle can hash.) */
  def errorBurstsBatch(spark: SparkSession, dir: String, threshold: Int = 2): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("error_count"))
      .filter(col("error_count") >= threshold)
      .orderBy(col("user_id"))

  val errorBurstsBatchSql: String =
    """SELECT user_id, count(*) AS error_count
      |FROM events WHERE event_type = 'error'
      |GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin

  /** Batch twin of [[errorThenPurchase]]: the stream-stream interval
    * join run over the bounded log — same keys, same interval
    * predicate, so the oracle pins the exact pair semantics the
    * watermarked streaming join must reproduce (each error × that
    * user's purchases in the following hour). At scale this is the
    * equi-join on user_id with the time predicate evaluated inside
    * the joined partition — the range condition never becomes a
    * cross-join because the user_id equi-key drives the shuffle. */
  def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val e = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    e.join(p, Seq("user_id"))
      .where(col("p_ts") > col("err_ts") &&
        col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("err_id"), col("p_id"),
        round(col("p_value"), 2).as("p_value"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss").as("err_ts"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts"))
      .orderBy(col("err_id"), col("p_id"))
  }

  val intervalJoinBatchSql: String =
    """SELECT e.user_id, e.event_id AS err_id, p.event_id AS p_id,
      |       round(p.value, 2) AS p_value,
      |       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
      |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts
      |FROM events e JOIN events p
      |  ON e.user_id = p.user_id
      | AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
      |WHERE e.event_type = 'error' AND p.event_type = 'purchase'
      |ORDER BY err_id, p_id""".stripMargin

  /** LEFT-OUTER twin of [[intervalJoinBatch]] — the semantics a
    * watermarked stream-stream OUTER join provides: errors with NO
    * purchase in the following hour still emit, with null payload.
    * In the streaming form this row can only emit once the watermark
    * passes the interval's end (the state store proves no match can
    * still arrive); the bounded twin pins exactly which rows that is.
    * Same single user_id equi shuffle; the unmatched side is the
    * incident-response query ("errors that did NOT convert"). */
  def intervalJoinLeftBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val e = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_uid"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    e.join(p, col("user_id") === col("p_uid") &&
        col("p_ts") > col("err_ts") &&
        col("p_ts") <= col("err_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("err_id"))
      .agg(count(col("p_id")).as("n_purchases"),
        coalesce(sum(round(col("p_value") * 100).cast("long")), lit(0L)).as("cents"))
      .select(col("err_id"), col("n_purchases"),
        (col("cents").cast("double") / 100d).as("converted_value"),
        (col("n_purchases") === 0L).as("unconverted"))
      .orderBy(col("err_id"))
  }

  val intervalJoinLeftBatchSql: String =
    """SELECT e.event_id AS err_id,
      |       count(p.event_id) AS n_purchases,
      |       CAST(coalesce(sum(CAST(round(p.value * 100) AS BIGINT)), 0) AS DOUBLE) / 100
      |         AS converted_value,
      |       count(p.event_id) = 0 AS unconverted
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id
      | AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Streaming CDC upsert — foreachBatch MERGE into a versioned snapshot
  // --------------------------------------------------------------------

  /** Latest state snapshot written by [[cdcUpsertStream]]: resolves the
    * `_LATEST` pointer and reads that version; no pointer → empty. */
  def currentState(spark: SparkSession, stateDir: String): DataFrame = {
    val marker = new java.io.File(s"$stateDir/_LATEST")
    if (marker.exists()) {
      val v = new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      spark.read.parquet(s"$stateDir/v=$v")
    } else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("user_id", LongType), StructField("state", StringType),
          StructField("value", DoubleType), StructField("ts", TimestampType),
          StructField("event_id", LongType))))
    }
  }

  /** The read VIEW over the state: tombstones filtered out. */
  def currentView(spark: SparkSession, stateDir: String): DataFrame =
    currentState(spark, stateDir).where(col("state") =!= "error")

  /** TIME TRAVEL over the CDC sink: every committed batch left an
    * immutable `v=<batchId>` snapshot, so history is a directory
    * listing and "the state as of batch N" is one read — the audit
    * and backfill affordance a table format sells, here for free
    * because the sink never mutates in place. */
  def stateVersions(stateDir: String): Seq[Long] =
    Option(new java.io.File(stateDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).sorted.toSeq

  /** The state snapshot as of `version` (a batchId from
    * [[stateVersions]]), tombstones filtered like [[currentView]]. */
  def stateAt(spark: SparkSession, stateDir: String, version: Long): DataFrame =
    spark.read.parquet(s"$stateDir/v=$version").where(col("state") =!= "error")

  /** Streaming CDC UPSERT — the warehouse-maintenance loop as a
    * stream: change rows (events schema) land as files, every
    * micro-batch MERGES latest-per-key into a parquet state snapshot.
    *
    * Design for exactly-once on a plain object store (no table
    * format):
    *  - each batch writes a NEW immutable version dir `v=<batchId>`,
    *    then atomically swings the `_LATEST` pointer (temp + rename).
    *    A replayed batch (failure between write and pointer swing)
    *    rewrites the SAME content to the SAME dir — idempotent. A
    *    replay AFTER the swing (failure before the checkpoint commit)
    *    finds `_LATEST` == batchId and short-circuits: the snapshot is
    *    already committed, and re-running would read v=<batchId> while
    *    overwriting it.
    *  - `error` states persist as TOMBSTONES in the state (the read
    *    path [[currentView]] filters them). Tombstones make the merge
    *    pure latest-wins on (ts, event_id), which is ASSOCIATIVE —
    *    any batching of the change log converges to the same state,
    *    so the bounded twin ([[cdcUpsertBatch]]) can oracle-check the
    *    stream's fixpoint exactly, and out-of-order arrivals across
    *    batches cannot resurrect a deleted key with older data.
    * At 100 TB the same shape runs per-partition (state bucketed by
    * key; a real deployment swaps the pointer for a table format's
    * commit protocol — same merge plan). */
  def cdcUpsertStream(spark: SparkSession, changeDir: String, stateDir: String,
                      checkpoint: String,
                      envelope: TriggerEnvelope = TriggerEnvelope())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    fileArrivals(spark, changeDir, schema, envelope.maxFilesPerTrigger)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cdcCommitBatch(spark, batch, batchId, stateDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(envelope.trigger)
      .start()
  }

  /** One [[cdcUpsertStream]] micro-batch commit: latest-per-key within
    * the batch, full-outer MERGE with the current snapshot, write the
    * immutable `v=<batchId>` dir, swing `_LATEST`. Package-visible so
    * the replay contract is spec-testable without a running stream.
    *
    * Replay short-circuit: if `_LATEST` already names this batchId,
    * the snapshot AND pointer committed before the crash (failure
    * landed between pointer swing and checkpoint commit). Without
    * this, the replay would read currentState from v=<batchId> and
    * then overwrite the very path it is reading — Spark aborts
    * ("Cannot overwrite a path that is also being read from") and the
    * stream crash-loops unrecoverably. Skipping is safe because the
    * content under v=<batchId> is exactly what this replay would
    * recompute (same input files per the checkpoint's source
    * offsets). */
  private[graft] def cdcCommitBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, stateDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val marker = new java.io.File(s"$stateDir/_LATEST")
    val alreadyCommitted = marker.exists() && {
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        .trim == batchId.toString
    }
    if (!alreadyCommitted) {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val src = batch
        .select(col("user_id"), col("event_type").as("state"), col("value"),
          col("ts"), col("event_id"))
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .drop("__rn")
        .select(col("user_id").as("s_uid"), col("state").as("s_state"),
          col("value").as("s_value"), col("ts").as("s_ts"), col("event_id").as("s_eid"))
      val cur = currentState(spark, stateDir)
      val newer = col("s_ts") > col("ts") ||
        (col("s_ts") === col("ts") && col("s_eid") > col("event_id"))
      val merged = cur.join(src, col("user_id") === col("s_uid"), "full_outer")
        .select(
          coalesce(col("user_id"), col("s_uid")).as("user_id"),
          when(col("user_id").isNull || (col("s_uid").isNotNull && newer),
            col("s_state")).otherwise(col("state")).as("state"),
          when(col("user_id").isNull || (col("s_uid").isNotNull && newer),
            col("s_value")).otherwise(col("value")).as("value"),
          when(col("user_id").isNull || (col("s_uid").isNotNull && newer),
            col("s_ts")).otherwise(col("ts")).as("ts"),
          when(col("user_id").isNull || (col("s_uid").isNotNull && newer),
            col("s_eid")).otherwise(col("event_id")).as("event_id"))
      merged.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
      val tmp = java.nio.file.Paths.get(s"$stateDir/_LATEST.tmp")
      java.nio.file.Files.writeString(tmp, batchId.toString)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$stateDir/_LATEST"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Bounded twin of [[cdcUpsertStream]]'s fixpoint: the whole change
    * log merged in one pass — latest row per key, tombstones dropped
    * at the read view. Associativity of latest-wins (see
    * [[cdcUpsertStream]]) is exactly why this equals ANY micro-batch
    * partitioning of the same log; StreamsSpec pins that equality. */
  def cdcUpsertBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    graft.Tables.events(spark, dir)
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .where(col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("state"),
        round(col("value"), 2).as("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .orderBy(col("user_id"))
  }

  val cdcUpsertBatchSql: String =
    """SELECT user_id, event_type AS state, round(value, 2) AS value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** TIME TRAVEL, oracle-checked end-to-end: split the change log into
    * 4 deterministic batches (event_id mod 4 — valid because
    * latest-wins with the (ts, event_id) tiebreak is a JOIN-SEMILATTICE:
    * the merged state depends only on the SET of change rows seen, not
    * their batching or order), drive the REAL [[cdcCommitBatch]] commit
    * path — versioned `v=<b>` snapshots, `_LATEST` pointer swings — and
    * then read [[stateAt]](v=2), the state BEFORE the final batch
    * landed. The DuckDB oracle replays the same semantics declaratively
    * (latest-wins compaction over rows with batch ≤ 2), so the
    * time-travel READ path — snapshot content, tombstone filtering,
    * version resolution — is differentially checked, not just
    * spec-pinned. The state dir is PER-INVOCATION unique (UUID suffix,
    * r12 advice): a fixed dir keyed on dir.hashCode raced when two
    * processes (parallel bench/oracle runs) rebuilt the same state —
    * one rm'ing snapshots while the other commits or reads. The dirs
    * are tmp-resident and deleteOnExit-registered; the result is
    * identical whatever the dir name, so determinism is unaffected.
    * Scale: the 4 commits are each one key-partitioned merge (the
    * production MERGE plan); nothing here is driver-sized. */
  def timeTravelBatch(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_time_travel_" + java.util.UUID.randomUUID().toString)
    stateDir.deleteOnExit()
    val log = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    (0L to 3L).foreach { b =>
      cdcCommitBatch(spark, log.where(pmod(col("event_id"), lit(4L)) === b),
        b, stateDir.getPath)
    }
    stateAt(spark, stateDir.getPath, 2L)
      .select(col("user_id"), col("state"),
        round(col("value"), 2).as("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .orderBy(col("user_id"))
  }

  val timeTravelBatchSql: String =
    """SELECT user_id, event_type AS state, round(value, 2) AS value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events WHERE event_id % 4 <= 2)
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** LATE-DATA CENSUS — the watermark-tuning report: how out-of-order
    * is this stream actually, and what would a given watermark DROP?
    * Arrival order is the log offset (event_id); each event's lateness
    * is the gap to the high-water mark of everything that arrived
    * before it within its key's stream (per-key watermarks are the
    * production shape — Kafka tracks them per partition). Exact
    * integer nanos; one running-max window per key (one shuffle), then
    * a census on the compact event_type key. The 10-minute column is
    * the what-if for the engine's own documented watermark default
    * (SURVEY §2.9): events it would have dropped as too-late. */
  def lateCensusBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("late_ns", max(col("ts_ns")).over(w) - col("ts_ns"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_if(col("late_ns") > 0L).as("n_out_of_order"),
        count_if(col("late_ns") > 600L * 1000 * 1000 * 1000).as("n_dropped_10m"),
        (max(col("late_ns")).cast("double") / 1e9).as("max_late_sec"))
      .orderBy(col("event_type"))
  }

  val lateCensusBatchSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(count(*) FILTER (WHERE late_ns > 0) AS BIGINT) AS n_out_of_order,
      |       CAST(count(*) FILTER (WHERE late_ns > 600000000000) AS BIGINT) AS n_dropped_10m,
      |       CAST(max(late_ns) AS DOUBLE) / 1e9 AS max_late_sec
      |FROM (
      |  SELECT event_type,
      |         max(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           - epoch_ns(ts) AS late_ns
      |  FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------
  // Streaming drift gate — observe() metrics vs a reference profile
  // --------------------------------------------------------------------

  /** One dimension's reference distribution — the bounded model
    * artifact the streaming drift gate compares each micro-batch
    * against (trained once from a reference window via
    * [[dimProfiles]], shipped like a broadcast). */
  final case class DimProfile(pos: Int, mean: Double, variance: Double, n: Long)

  /** Train reference [[DimProfile]]s from the bounded embeddings table
    * — exact integer micro-unit moments (the [[graft.operators.Similarity.driftMonitor]]
    * arithmetic), one conditional agg, dim-bounded output. */
  def dimProfiles(spark: SparkSession, dir: String, dims: Seq[Int]): Seq[DimProfile] = {
    val q = Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos0", "x")))
      .select((col("pos0") + 1).as("pos"), round(col("x") * 1000000d).cast("long").as("xq"))
      .where(col("pos").isin(dims.map(Integer.valueOf): _*))
      .groupBy(col("pos"))
      .agg(sum(col("xq")).as("s"), sum(col("xq") * col("xq")).as("q"),
        count(lit(1)).as("n"))
      .collect()
    q.map { r =>
      val (s, qq, n) = (r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3))
      DimProfile(r.getInt(0), s / n / 1e6, (qq / n - (s / n) * (s / n)) / 1e12, n)
    }.sortBy(_.pos)
  }

  /** Per-micro-batch DRIFT metrics for `observe()` — the streaming
    * twin of the batch [[graft.operators.Similarity.driftMonitor]]:
    * each monitored dimension's Welch z between THIS batch and the
    * reference profile, plus the row count, all computed inside the
    * batch's own aggregation (zero extra passes — the DQ-gate
    * pattern [[graft.api.DataQuality.rowCheckAggs]] proved). Alerting
    * on z > 3 is the caller's policy decision on the reported
    * numbers, exactly like the DQ gate's violation counts.
    *
    * Scale: the observe row is |dims|+1 doubles per micro-batch
    * regardless of batch size; the moment sums ride the batch's
    * existing scan as integer micro-units (order-exact). */
  def driftAggs(ref: Seq[DimProfile], embCol: String = "embedding"): Seq[Column] = {
    require(ref.nonEmpty, "driftAggs: no reference dimensions")
    val zs = ref.map { p =>
      val xq = round(element_at(col(embCol).cast("array<double>"), p.pos) * 1000000d)
        .cast("long")
      val s = sum(xq).cast("double")
      val q = sum(xq * xq).cast("double")
      val n = count(lit(1)).cast("double")
      val mb = s / n / 1e6
      val vb = (q / n - (s / n) * (s / n)) / 1e12
      val z = abs(mb - lit(p.mean)) / sqrt(vb / n + lit(p.variance / p.n))
      round(z, 4).as(s"z_dim_${p.pos}")
    }
    count(lit(1)).as("n_rows") +: zs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_late_census_batch" -> (lateCensusBatch _),
    "stream_interval_join_left_batch" -> (intervalJoinLeftBatch _),
    "stream_cdc_upsert_batch" -> (cdcUpsertBatch _),
    "etl_time_travel" -> (timeTravelBatch _),
    "stream_interval_join_batch" -> (intervalJoinBatch _),
    "stream_tumbling_batch" -> (tumblingBatch _),
    "stream_topk_window_batch" -> (topkWindowBatch _),
    "stream_sliding_batch" -> (slidingBatch _),
    "stream_dedup_batch" -> (dedupBatch _),
    "stream_session_batch" -> (sessionBatch _),
    "stream_user_state_batch" -> (userStateBatch _),
    "stream_first_seen_batch" -> (firstSeenBatch _),
    "stream_error_bursts_batch" -> ((s, d) => errorBurstsBatch(s, d))
  )

  def oracle: Map[String, String] = Map(
    "stream_late_census_batch" -> lateCensusBatchSql,
    "stream_interval_join_left_batch" -> intervalJoinLeftBatchSql,
    "stream_cdc_upsert_batch" -> cdcUpsertBatchSql,
    "etl_time_travel" -> timeTravelBatchSql,
    "stream_interval_join_batch" -> intervalJoinBatchSql,
    "stream_tumbling_batch" -> tumblingBatchSql,
    "stream_topk_window_batch" -> topkWindowBatchSql,
    "stream_sliding_batch" -> slidingBatchSql,
    "stream_dedup_batch" -> dedupBatchSql,
    "stream_session_batch" -> sessionBatchSql,
    "stream_user_state_batch" -> userStateBatchSql,
    "stream_first_seen_batch" -> firstSeenBatchSql,
    "stream_error_bursts_batch" -> errorBurstsBatchSql
  )
}
