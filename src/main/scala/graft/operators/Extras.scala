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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_stats" -> (statsAgg _),
    "fn_string2" -> (stringFns2 _),
    "fn_date2" -> (dateFns2 _),
    "fn_struct_json" -> (structJson _),
    "fn_array2" -> (arrayFns2 _)
  )

  def oracle: Map[String, String] = Map(
    "agg_stats" -> statsAggSql,
    "fn_string2" -> stringFns2Sql,
    "fn_date2" -> dateFns2Sql,
    "fn_struct_json" -> structJsonSql,
    "fn_array2" -> arrayFns2Sql
  )
}
