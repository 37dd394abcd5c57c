package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second wave of scalar/aggregate surface: statistical aggregates,
  * extended string/date families, nested-struct JSON round-trip. All
  * built-ins (SURVEY.md §2.8), DuckDB-parity-checked (initcap and
  * months_between are absent in DuckDB 1.0 and intentionally omitted
  * from the oracle surface; Spark weekday ≡ DuckDB isodow-1).
  */
object Extras {

  /** Moment-based statistics + correlation per order status.
    * Spark's skewness/kurtosis are population moments (g1, excess g2);
    * DuckDB reports bias-corrected sample statistics — the standard
    * corrections are applied here so both sides speak "sample":
    * G1 = g1·√(n(n−1))/(n−2); G2 = (n−1)/((n−2)(n−3))·((n+1)g2+6). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(stddev_samp(col("o_totalprice")), 4).as("price_stddev"),
        round(var_samp(col("o_totalprice")), 4).as("price_var"),
        skewness(col("o_totalprice")).as("g1"),
        kurtosis(col("o_totalprice")).as("g2"),
        count(lit(1)).cast("double").as("n"),
        round(corr(col("o_totalprice"), col("o_custkey")), 4).as("price_cust_corr"),
        round(covar_samp(col("o_totalprice"), col("o_custkey")), 4).as("price_cust_covar"),
        round(expr("median(o_totalprice)"), 4).as("price_median"))
      .select(
        col("o_orderstatus"), col("price_stddev"), col("price_var"),
        round(col("g1") * sqrt(col("n") * (col("n") - 1)) / (col("n") - 2), 4).as("price_skew"),
        round((col("n") - 1) / ((col("n") - 2) * (col("n") - 3)) *
          ((col("n") + 1) * col("g2") + 6), 4).as("price_kurt"),
        col("price_cust_corr"), col("price_cust_covar"), col("price_median"))
      .orderBy(col("o_orderstatus"))

  val statsAggSql: String =
    """SELECT o_orderstatus,
      |       round(stddev_samp(o_totalprice), 4) AS price_stddev,
      |       round(var_samp(o_totalprice), 4) AS price_var,
      |       round(skewness(o_totalprice), 4) AS price_skew,
      |       round(kurtosis(o_totalprice), 4) AS price_kurt,
      |       round(corr(o_totalprice, o_custkey), 4) AS price_cust_corr,
      |       round(covar_samp(o_totalprice, o_custkey), 4) AS price_cust_covar,
      |       round(median(o_totalprice), 4) AS price_median
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Extended string family: padding, translate, reverse, repeat,
    * edit distance. */
  def stringFns2(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).select(
      col("r_regionkey").cast("long").as("regionkey"),
      lpad(col("r_name"), 12, "*").as("name_lpad"),
      rpad(col("r_name"), 12, "-").as("name_rpad"),
      translate(col("r_name"), "AEIOU", "aeiou").as("name_trans"),
      reverse(col("r_name")).as("name_rev"),
      expr("repeat(r_name, 2)").as("name_twice"),
      levenshtein(col("r_name"), lit("EUROPE")).cast("long").as("dist_europe"))
      .orderBy(col("regionkey"))

  val stringFns2Sql: String =
    """SELECT CAST(r_regionkey AS BIGINT) AS regionkey,
      |       lpad(r_name, 12, '*') AS name_lpad,
      |       rpad(r_name, 12, '-') AS name_rpad,
      |       translate(r_name, 'AEIOU', 'aeiou') AS name_trans,
      |       reverse(r_name) AS name_rev,
      |       repeat(r_name, 2) AS name_twice,
      |       CAST(levenshtein(r_name, 'EUROPE') AS BIGINT) AS dist_europe
      |FROM region ORDER BY regionkey""".stripMargin

  /** Extended date family: ISO week, weekday, last day of month. */
  def dateFns2(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
      weekday(col("o_orderdate")).cast("long").as("weekday_mon0"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy(col("o_orderkey"))

  val dateFns2Sql: String =
    """SELECT o_orderkey,
      |       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
      |       CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday_mon0,
      |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Nested struct → JSON round-trip (multimodal metadata pattern:
    * typed struct serialized to a JSON sidecar and back). */
  def structJson(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    Tables.documents(spark, dir)
      .withColumn("meta_json", to_json(struct(col("lang").as("lang"), col("n_chars").as("n"))))
      .withColumn("meta_back", from_json(col("meta_json"), schema))
      .select(
        col("doc_id"),
        col("meta_json"),
        col("meta_back.lang").as("lang_rt"),
        col("meta_back.n").as("n_rt"))
      .orderBy(col("doc_id"))
  }

  val structJsonSql: String =
    """SELECT doc_id,
      |       to_json(struct_pack(lang := lang, n := n_chars)) AS meta_json,
      |       lang AS lang_rt,
      |       n_chars AS n_rt
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Array-construction family: sequence, repeat, flatten, zip. */
  def arrayFns2(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).select(
      col("r_regionkey").cast("long").as("regionkey"),
      concat_ws(",", sequence(lit(1), col("r_regionkey") + 1)).as("seq_str"),
      concat_ws("|", array_repeat(col("r_name"), 2)).as("repeated"),
      concat_ws(",", flatten(array(array(col("r_regionkey")), array(col("r_regionkey") * 10)))
        .cast("array<string>")).as("flat_str"))
      .orderBy(col("regionkey"))

  val arrayFns2Sql: String =
    """SELECT CAST(r_regionkey AS BIGINT) AS regionkey,
      |       array_to_string(range(1, r_regionkey + 2), ',') AS seq_str,
      |       r_name || '|' || r_name AS repeated,
      |       CAST(r_regionkey AS VARCHAR) || ',' || CAST(r_regionkey * 10 AS VARCHAR) AS flat_str
      |FROM region ORDER BY regionkey""".stripMargin

  /** Bitwise family over integer keys. */
  def bitwiseFns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
      expr("l_orderkey & 255").as("low_byte"),
      expr("l_orderkey | 4096").as("with_flag"),
      expr("shiftleft(l_linenumber, 4)").cast("long").as("shl4"),
      expr("shiftright(l_orderkey, 2)").as("shr2"),
      expr("l_orderkey ^ 21845").as("xored"))
      .orderBy(col("l_orderkey"), col("linenumber"))

  val bitwiseFnsSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
      |       l_orderkey & 255 AS low_byte,
      |       l_orderkey | 4096 AS with_flag,
      |       CAST(l_linenumber << 4 AS BIGINT) AS shl4,
      |       l_orderkey >> 2 AS shr2,
      |       xor(l_orderkey, 21845) AS xored
      |FROM lineitem ORDER BY l_orderkey, linenumber""".stripMargin

  /** Misc scalar family: greatest/least, sign, trig-adjacent constants. */
  def miscFns(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir).select(
      col("s_suppkey"),
      round(greatest(col("s_acctbal"), lit(0.0)), 2).as("bal_pos"),
      round(least(col("s_acctbal"), lit(1000.0)), 2).as("bal_capped"),
      signum(col("s_acctbal")).cast("long").as("bal_sign"),
      round(degrees(lit(1.0)), 6).as("one_rad_deg"),
      round(radians(lit(180.0)), 6).as("pi_ish"))
      .orderBy(col("s_suppkey"))

  val miscFnsSql: String =
    """SELECT s_suppkey,
      |       round(greatest(s_acctbal, 0.0), 2) AS bal_pos,
      |       round(least(s_acctbal, 1000.0), 2) AS bal_capped,
      |       CAST(sign(s_acctbal) AS BIGINT) AS bal_sign,
      |       round(degrees(1.0), 6) AS one_rad_deg,
      |       round(radians(180.0), 6) AS pi_ish
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** stack() generator: unpivot wide columns into rows. */
  def stackUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        expr("stack(2, 'brand', p_brand, 'type', p_type) AS (attr, val)"))
      .select(col("p_partkey"), col("attr"), col("val"))
      .orderBy(col("p_partkey"), col("attr"))

  val stackUnpivotSql: String =
    """SELECT p_partkey, attr, val FROM (
      |  SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'type', p_type FROM part)
      |ORDER BY p_partkey, attr""".stripMargin

  /** Error-TOLERANT casts and arithmetic — the ANSI-mode ETL seam:
    * malformed input yields NULL, never a task failure (a 100 TB load
    * must not die on row 3 trillion). The messy strings are
    * manufactured deterministically per event (numeric / prefixed /
    * empty / overflow), so the oracle replays the same parse failures.
    * try_divide ≡ x / nullif(y, 0) — the oracle states it that way. */
  def tryCasts(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .withColumn("messy",
        when(col("event_type") === "purchase", format_string("%.2f", col("value")))
          .when(col("event_type") === "click", concat(lit("x"), col("value").cast("string")))
          .when(col("event_type") === "view", lit(""))
          .when(col("event_type") === "signup", lit("99999999999999999999"))
          .otherwise(col("value").cast("string")))
      // int parsing gets its own INTEGRAL-or-bad strings: engines
      // disagree on '12.34'→INT (ANSI NULL vs truncate), so that
      // shape is deliberately excluded from the contract
      .withColumn("messy_i",
        when(col("event_type") === "click", concat(lit("x"), col("value").cast("string")))
          .when(col("event_type") === "view", lit(""))
          .when(col("event_type") === "signup", lit("99999999999999999999"))
          .otherwise(round(col("value")).cast("long").cast("string")))
      .select(col("event_type"),
        expr("try_cast(messy AS DOUBLE)").as("parsed"),
        expr("try_cast(messy_i AS INT)").as("parsed_int"),
        expr("value / nullif(value - value, 0)").as("div0"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("parsed")).as("n_double"),
        count(col("parsed_int")).as("n_int"),
        count(col("div0")).as("n_div0"))
      .orderBy(col("event_type"))

  val tryCastsSql: String =
    """SELECT event_type, count(*) AS n,
      |       count(TRY_CAST(messy AS DOUBLE)) AS n_double,
      |       count(TRY_CAST(messy_i AS INTEGER)) AS n_int,
      |       count(value / nullif(value - value, 0)) AS n_div0
      |FROM (
      |  SELECT event_type, value,
      |         CASE event_type
      |           WHEN 'purchase' THEN format('{:.2f}', value)
      |           WHEN 'click' THEN 'x' || CAST(value AS VARCHAR)
      |           WHEN 'view' THEN ''
      |           WHEN 'signup' THEN '99999999999999999999'
      |           ELSE CAST(value AS VARCHAR) END AS messy,
      |         CASE event_type
      |           WHEN 'click' THEN 'x' || CAST(value AS VARCHAR)
      |           WHEN 'view' THEN ''
      |           WHEN 'signup' THEN '99999999999999999999'
      |           ELSE CAST(CAST(round(value) AS BIGINT) AS VARCHAR) END AS messy_i
      |  FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `inline` — the struct-array table generator (posexplode's typed
    * sibling): a per-region array of (nation, key) structs fans out
    * into columns directly, no manual field projection. Generators
    * complete the UDTF row three ways: posexplode (positional),
    * stack (constant reshape), inline (struct fan-out). */
  def inlineStructs(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sort_array(collect_list(struct(col("n_name"), col("n_nationkey")))).as("ns"))
      .select(col("r_name"), inline(col("ns")))
      .select(col("r_name"), col("n_name"), col("n_nationkey"))
      .orderBy(col("r_name"), col("n_name"))

  val inlineStructsSql: String =
    """SELECT r_name, n_name, n_nationkey
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY r_name, n_name""".stripMargin

  /** Boolean/conditional aggregate family: count_if, every (bool_and),
    * some (bool_or) — the verdict-rollup primitives a DQ pass leans
    * on. Deterministic by construction (no ordering dependence). */
  def boolAggs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_if(col("value") > 50).as("n_big"),
        every(col("value") > 0).as("all_positive"),
        some(col("value") > 99).as("any_near_max"))
      .orderBy(col("event_type"))

  val boolAggsSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_big,
      |       bool_and(value > 0) AS all_positive,
      |       bool_or(value > 99) AS any_near_max
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Ordered string aggregation (the LISTAGG / string_agg family) —
    * report-building's workhorse. Determinism rule: the engine sorts
    * the collected array BEFORE joining (collect_list order is
    * partition-arrival nondeterministic), mirrored by the oracle's
    * WITHIN-GROUP ORDER BY — an unordered listagg can never be
    * oracle-checked. */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.nation(spark, dir)
      .join(graft.Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(", ", sort_array(collect_list(col("n_name")))).as("nations"))
      .orderBy(col("r_name"))

  val stringAggSql: String =
    """SELECT r_name, count(*) AS n_nations,
      |       string_agg(n_name, ', ' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ANSI DecimalType arithmetic — the NUMERIC surface a warehouse ETL
    * hits immediately (BigQuery NUMERIC ↔ Spark DecimalType): fixed
    * point cast, exact add/multiply with scale growth (2 → 4 → 6),
    * fixed-precision SUM/MIN/MAX, HALF_UP rounding back to money
    * scale, and decimal predicates. Everything stays in decimals end
    * to end — no float summation anywhere, so engine and oracle agree
    * digit-for-digit at any partitioning (the property DOUBLE money
    * can only approximate).
    *
    * Parity notes (the reason for each shape):
    *  - the DOUBLE money columns are 2-decimal at the repr level, so
    *    CAST(x AS DECIMAL(12,2)) is exact in BOTH engines (Spark casts
    *    via the shortest repr, DuckDB via the binary expansion — they
    *    diverge only on >2-decimal doubles near a tie, excluded here);
    *  - avg() and decimal division are deliberately absent: DuckDB 1.0
    *    degrades both to DOUBLE, which would reintroduce the float
    *    hazard this family exists to rule out;
    *  - both engines round decimals half-AWAY-FROM-ZERO, so the
    *    round-to-cents column is tie-safe;
    *  - the FINAL projection casts every money column to DOUBLE on
    *    both sides: the differential harness hashes results through
    *    pandas, where DuckDB DECIMALs arrive as float64 but Spark
    *    parquet decimals arrive as Python Decimal objects — a
    *    top-level DecimalType can therefore never hash-match
    *    (round-8 verdict). The cast is exact here: the largest value
    *    is sum_charge ≤ ~1.05e9 at scale 6 = 1.05e15 quanta < 2^53,
    *    so every decimal in this family is representable in a 53-bit
    *    mantissa. All arithmetic and aggregation stays DECIMAL end to
    *    end; only the serialization boundary is DOUBLE. */
  def decimalFamily(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(3,2)")
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      col("l_extendedprice").cast("decimal(12,2)").as("price"),
      col("l_discount").cast("decimal(12,2)").as("disc"),
      col("l_tax").cast("decimal(12,2)").as("tax"))
    li.select(col("l_returnflag"), col("price"),
        (col("price") * (one - col("disc"))).as("disc_price"),
        (col("price") * (one - col("disc")) * (one + col("tax"))).as("charge"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("decimal(38,2)").cast("double").as("sum_price"),
        min(col("price")).cast("decimal(38,2)").cast("double").as("min_price"),
        max(col("price")).cast("decimal(38,2)").cast("double").as("max_price"),
        sum(col("disc_price")).cast("decimal(38,4)").cast("double").as("sum_disc_price"),
        sum(col("charge")).cast("decimal(38,6)").cast("double").as("sum_charge"),
        round(sum(col("charge")), 2).cast("decimal(38,2)").cast("double").as("sum_charge_r2"),
        count_if(col("price") > lit(50000).cast("decimal(12,2)")).as("n_big"))
      .orderBy(col("l_returnflag"))
  }

  val decimalFamilySql: String =
    """WITH li AS (
      |  SELECT l_returnflag,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |         CAST(l_discount AS DECIMAL(12,2)) AS disc,
      |         CAST(l_tax AS DECIMAL(12,2)) AS tax
      |  FROM lineitem),
      |x AS (
      |  SELECT l_returnflag, price,
      |         price * (CAST(1 AS DECIMAL(3,2)) - disc) AS disc_price,
      |         price * (CAST(1 AS DECIMAL(3,2)) - disc)
      |               * (CAST(1 AS DECIMAL(3,2)) + tax) AS charge
      |  FROM li)
      |SELECT l_returnflag, count(*) AS n,
      |       CAST(CAST(sum(price) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
      |       CAST(CAST(min(price) AS DECIMAL(38,2)) AS DOUBLE) AS min_price,
      |       CAST(CAST(max(price) AS DECIMAL(38,2)) AS DOUBLE) AS max_price,
      |       CAST(CAST(sum(disc_price) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |       CAST(CAST(sum(charge) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
      |       CAST(CAST(round(sum(charge), 2) AS DECIMAL(38,2)) AS DOUBLE) AS sum_charge_r2,
      |       CAST(count(*) FILTER (WHERE price > CAST(50000 AS DECIMAL(12,2))) AS BIGINT) AS n_big
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** XPath extraction — Spark's `xpath_*` function family (the XML
    * sibling of `fn_json`'s get_json_object surface): per-row XML
    * payloads are SYNTHESIZED from the documents table (the codec-
    * family contract: the generator is the spec), then
    * xpath_string/xpath_long/xpath extract scalar fields and a
    * repeated-node list whose COUNT rides the output. DuckDB has no
    * XPath, so the oracle replays the generating law directly — the
    * extraction must exactly invert the generation (a wrong axis,
    * a dropped node, or 1-vs-0-based indexing cannot hash-match).
    * Aggregated per lang so the output is compact at any scale;
    * map-only below the agg. */
  def xpathFns(spark: SparkSession, dir: String): DataFrame = {
    val tags = concat(lit("<t>k"), pmod(col("doc_id"), lit(3)).cast("string"),
      lit("</t>"), when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("<t>k"), pmod(col("doc_id"), lit(5)).cast("string"), lit("</t>")))
        .otherwise(lit("")))
    val xml = concat(lit("<doc><id>"), col("doc_id").cast("string"),
      lit("</id><lang>"), col("lang"), lit("</lang><n>"),
      col("n_chars").cast("string"), lit("</n><tags>"), tags, lit("</tags></doc>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), xml.as("x"))
      .select(
        expr("xpath_string(x, '/doc/lang')").as("lang"),
        expr("xpath_long(x, '/doc/id')").as("id"),
        expr("xpath_long(x, '/doc/n')").as("n"),
        size(expr("xpath(x, '/doc/tags/t/text()')")).cast("long").as("n_tags"),
        expr("xpath_string(x, '/doc/tags/t[1]')").as("first_tag"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_chars"),
        sum(col("n_tags")).as("n_tags"),
        countDistinct(col("first_tag")).as("n_first_tags"),
        min(col("id")).as("min_id"))
      .orderBy(col("lang"))
  }

  val xpathFnsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tags,
      |       count(DISTINCT 'k' || CAST(doc_id % 3 AS VARCHAR)) AS n_first_tags,
      |       min(doc_id) AS min_id
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** VARIANT semi-structured extraction — Spark 4's open VariantType
    * (`parse_json` → `variant_get`), the binary-encoded JSON path
    * that replaces string re-parsing per access: the events table's
    * `props` JSON parses ONCE per row into a Variant, and typed
    * `variant_get` paths read fields without re-tokenizing (the
    * schema-on-read shape warehouse semi-structured columns are
    * converging on — BigQuery JSON, Snowflake VARIANT, Iceberg v3
    * variant). The Variant itself never reaches the output (binary —
    * the harness contract); typed extractions aggregate per
    * event_type. Oracle: DuckDB's native JSON extraction over the
    * same strings — the two engines' independent JSON parsers must
    * agree on every value. */
  def variantFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", expr("parse_json(props)"))
      .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_if(col("k").isNull).as("n_null"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy(col("event_type"))

  val variantFnsSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(count(*) FILTER (WHERE json_extract(props, '$.k') IS NULL) AS BIGINT)
      |         AS n_null,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |       count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS n_distinct_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_variant" -> (variantFns _),
    "fn_xpath" -> (xpathFns _),
    "fn_decimal" -> (decimalFamily _),
    "agg_string_agg" -> (stringAgg _),
    "fn_bool_aggs" -> (boolAggs _),
    "gen_inline" -> (inlineStructs _),
    "fn_try_cast" -> (tryCasts _),
    "fn_bitwise" -> (bitwiseFns _),
    "fn_misc" -> (miscFns _),
    "gen_stack" -> (stackUnpivot _),
    "agg_stats" -> (statsAgg _),
    "fn_string2" -> (stringFns2 _),
    "fn_date2" -> (dateFns2 _),
    "fn_struct_json" -> (structJson _),
    "fn_array2" -> (arrayFns2 _)
  )

  def oracle: Map[String, String] = Map(
    "fn_variant" -> variantFnsSql,
    "fn_xpath" -> xpathFnsSql,
    "fn_decimal" -> decimalFamilySql,
    "agg_string_agg" -> stringAggSql,
    "fn_bool_aggs" -> boolAggsSql,
    "gen_inline" -> inlineStructsSql,
    "fn_try_cast" -> tryCastsSql,
    "fn_bitwise" -> bitwiseFnsSql,
    "fn_misc" -> miscFnsSql,
    "gen_stack" -> stackUnpivotSql,
    "agg_stats" -> statsAggSql,
    "fn_string2" -> stringFns2Sql,
    "fn_date2" -> dateFns2Sql,
    "fn_struct_json" -> structJsonSql,
    "fn_array2" -> arrayFns2Sql
  )
}
