package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.8). The reference's own
  * scalar surface is three string ops — endswith / startswith
  * (/root/reference/main.py:12) and f-string concat (main.py:13,16) —
  * exercised in RefPipeline; everything here is the EXT surface needed
  * for general queries. All are built-in `functions._` (codegen'd, no
  * UDFs — SURVEY.md §4.2).
  */
object Scalars {

  /** String family over part names/brands. */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      lower(col("p_type")).as("type_lower"),
      substring(col("p_name"), 1, 8).as("name8"),
      length(col("p_name")).cast("long").as("name_len"),
      trim(col("p_name")).as("name_trim"),
      regexp_replace(col("p_type"), " ", "_").as("type_snake"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
      instr(col("p_name"), "a").cast("long").as("a_pos"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      col("p_name").like("%gold%").as("has_gold"),
      format_string("part-%05d", col("p_partkey")).as("part_tag"))
      .orderBy(col("p_partkey"))

  val stringFnsSql: String =
    """SELECT p_partkey,
      |       upper(p_brand) AS brand_upper,
      |       lower(p_type) AS type_lower,
      |       substring(p_name, 1, 8) AS name8,
      |       CAST(length(p_name) AS BIGINT) AS name_len,
      |       trim(p_name) AS name_trim,
      |       regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
      |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |       CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
      |       p_brand || '#' || p_type AS brand_type,
      |       p_name LIKE '%gold%' AS has_gold,
      |       printf('part-%05d', p_partkey) AS part_tag
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time family over orders; date outputs are formatted strings
    * so oracle comparison is precision- and timezone-proof. */
  def dateFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      date_format(date_add(col("o_orderdate"), 90), "yyyy-MM-dd").as("due_date"),
      datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("days_to_98"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  val dateFnsSql: String =
    """SELECT o_orderkey,
      |       CAST(year(o_orderdate) AS BIGINT) AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mo,
      |       CAST(day(o_orderdate) AS BIGINT) AS dom,
      |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
      |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math family over lineitem. */
  def mathFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
      round(col("l_extendedprice"), 1).as("price_r1"),
      floor(col("l_extendedprice")).cast("long").as("price_floor"),
      ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
      round(abs(col("l_discount") - 0.05), 6).as("disc_dev"),
      round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
      round(log(col("l_extendedprice") + 1), 6).as("price_ln"),
      round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
      (col("l_orderkey") % 7).as("key_mod7"))
      .orderBy(col("l_orderkey"), col("linenumber"))

  val mathFnsSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
      |       round(l_extendedprice, 1) AS price_r1,
      |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |       round(abs(l_discount - 0.05), 6) AS disc_dev,
      |       round(sqrt(l_extendedprice), 6) AS price_sqrt,
      |       round(ln(l_extendedprice + 1), 6) AS price_ln,
      |       round(pow(l_quantity, 2), 2) AS qty_sq,
      |       l_orderkey % 7 AS key_mod7
      |FROM lineitem ORDER BY l_orderkey, linenumber""".stripMargin

  /** Conditional family: CASE/when, coalesce, nullif, nvl. */
  def conditionalFns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000, "high")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("low").as("price_band"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
      when(col("o_orderpriority").startsWith("1"), lit(1L)).otherwise(lit(0L)).as("is_urgent"))
      .orderBy(col("o_orderkey"))

  val conditionalFnsSql: String =
    """SELECT o_orderkey,
      |       CASE WHEN o_totalprice > 200000 THEN 'high'
      |            WHEN o_totalprice > 100000 THEN 'mid'
      |            ELSE 'low' END AS price_band,
      |       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
      |       CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the events.props JSON string column. */
  def jsonFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
        .getField("k").as("k_typed"))
      .orderBy(col("event_id"))

  val jsonFnsSql: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed
      |FROM events ORDER BY event_id""".stripMargin

  /** Hash family — md5/sha2 hex agree across engines byte-for-byte.
    * (xxhash64/murmur are engine-specific, so they stay out of the
    * oracle surface.) */
  def hashFns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("text_md5"),
      sha2(col("text").cast("binary"), 256).as("text_sha256"),
      length(col("text")).cast("long").as("text_len"))
      .orderBy(col("doc_id"))

  val hashFnsSql: String =
    """SELECT doc_id,
      |       md5(text) AS text_md5,
      |       sha256(text) AS text_sha256,
      |       CAST(length(text) AS BIGINT) AS text_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Array / higher-order family over the embeddings vectors — all in
    * double so arithmetic matches the oracle bit-for-bit. */
  def arrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(
        col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        round(element_at(col("v"), 1), 6).as("first_elem"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x), 6).as("sum_elems"),
        round(sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)), 6).as("l2_norm"),
        round(array_max(col("v")), 6).as("max_elem"),
        size(filter(col("v"), x => x > 0)).cast("long").as("n_positive"))
      .orderBy(col("vec_id"))

  val arrayFnsSql: String =
    """SELECT vec_id,
      |       CAST(len(v) AS BIGINT) AS dim,
      |       round(v[1], 6) AS first_elem,
      |       round(list_sum(v), 6) AS sum_elems,
      |       round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
      |       round(list_max(v), 6) AS max_elem,
      |       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |ORDER BY vec_id""".stripMargin

  /** Regex family over document text: extract with a capture group,
    * match-count, boolean match, and a global replace (hashed — the
    * devoweled text itself would bloat the output). Patterns stay in
    * the character-class + alternation subset where Java regex and
    * DuckDB's RE2 agree; DuckDB's regexp_replace needs the explicit
    * 'g' flag to match Spark's replace-all default. */
  def regexFns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        expr("CAST(regexp_count(text, 'table') AS BIGINT)").as("n_table"),
        col("text").rlike("spark[a-z ]*table").as("has_span"),
        md5(regexp_replace(col("text"), "[aeiou]", "").cast("binary")).as("devoweled_md5"))
      .orderBy(col("doc_id"))

  val regexFnsSql: String =
    """SELECT doc_id,
      |       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
      |       CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
      |       regexp_matches(text, 'spark[a-z ]*table') AS has_span,
      |       md5(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_regex" -> (regexFns _),
    "fn_string" -> (stringFns _),
    "fn_date" -> (dateFns _),
    "fn_math" -> (mathFns _),
    "fn_conditional" -> (conditionalFns _),
    "fn_json" -> (jsonFns _),
    "fn_hash" -> (hashFns _),
    "fn_array" -> (arrayFns _)
  )

  def oracle: Map[String, String] = Map(
    "fn_regex" -> regexFnsSql,
    "fn_string" -> stringFnsSql,
    "fn_date" -> dateFnsSql,
    "fn_math" -> mathFnsSql,
    "fn_conditional" -> conditionalFnsSql,
    "fn_json" -> jsonFnsSql,
    "fn_hash" -> hashFnsSql,
    "fn_array" -> arrayFnsSql
  )
}
