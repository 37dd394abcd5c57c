package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface operators that exercise Catalyst's analyzer/optimizer
  * beyond the fluent API: GROUPING SETS, pivot, subqueries (scalar,
  * correlated EXISTS, IN), and exact percentiles. Subquery queries run
  * through `spark.sql` over temp views — the decorrelation rules
  * (SURVEY.md §4.2) turn the correlated forms into joins, which is
  * what keeps them scalable.
  */
object SqlSurface {

  private def withViews(spark: SparkSession, dir: String)(names: String*): Unit =
    names.foreach(n => Tables.table(spark, dir, n).createOrReplaceTempView(n))

  /** GROUPING SETS with grouping_id disambiguation. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("lineitem")
    spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |       COALESCE(l_linestatus, 'ALL') AS status,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS cnt,
        |       round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY flag, status""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      |       COALESCE(l_linestatus, 'ALL') AS status,
      |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS cnt,
      |       round(sum(l_extendedprice), 2) AS total
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY flag, status""".stripMargin

  /** Pivot: order counts per priority (rows) × status (columns). The
    * oracle expresses the same thing as conditional aggregation — which
    * is also exactly how Catalyst lowers pivot. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("f_cnt"),
        col("O").as("o_cnt"), col("P").as("p_cnt"))
      .orderBy(col("o_orderpriority"))

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
      |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
      |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Unpivot (melt): wide per-lineitem measures back to long
    * (measure, value) rows — the inverse of pivot, used to normalize
    * wide fact tables into EAV form for generic downstream pipelines.
    * Spark's native `unpivot` plans as a Generate (expand) — a
    * map-only fan-out, no shuffle below the final rollup. Values are
    * rounded to cents BEFORE the melt so both engines sum exact
    * integers per measure. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("extendedprice"),
        round(col("l_discount") * col("l_extendedprice") * 100).cast("long").as("discount_amt"),
        round(col("l_tax") * col("l_extendedprice") * 100).cast("long").as("tax_amt"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("extendedprice"), col("discount_amt"), col("tax_amt")),
        "measure", "value_c")
      .groupBy(col("measure"))
      // cents in, cents summed exactly, one divide at the edge
      .agg(count(lit(1)).as("n"), round(sum(col("value_c")) / 100.0, 2).as("total"))
      .orderBy(col("measure"))

  val unpivotMeasuresSql: String =
    """WITH wide AS (
      |  SELECT l_orderkey,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS extendedprice,
      |         CAST(round(l_discount * l_extendedprice * 100) AS BIGINT) AS discount_amt,
      |         CAST(round(l_tax * l_extendedprice * 100) AS BIGINT) AS tax_amt
      |  FROM lineitem),
      |long AS (
      |  SELECT 'extendedprice' AS measure, extendedprice AS value_c FROM wide
      |  UNION ALL SELECT 'discount_amt', discount_amt FROM wide
      |  UNION ALL SELECT 'tax_amt', tax_amt FROM wide)
      |SELECT measure, count(*) AS n,
      |       round(CAST(sum(value_c) AS BIGINT) / 100.0, 2) AS total
      |FROM long GROUP BY 1 ORDER BY 1""".stripMargin

  /** Scalar subquery: orders above the global average price, counted
    * per status. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("orders")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n_above_avg
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT o_orderstatus, count(*) AS n_above_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Correlated EXISTS: customers having at least one urgent order —
    * decorrelated by Catalyst into a semi join. */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("customer", "orders")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val existsSubquerySql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): a key ladder walked
    * from nation 0 in steps of 5, joined back to the dimension. The
    * recursion is driver-bounded iteration over tiny frontiers — the
    * standard shape for hierarchy/graph walks in SQL. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("nation")
    spark.sql(recursiveCteSql)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE chain(k, depth) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT k + 5, depth + 1 FROM chain WHERE k + 5 < 25
      |)
      |SELECT c.depth, n.n_name
      |FROM chain c JOIN nation n ON CAST(n.n_nationkey AS BIGINT) = c.k
      |ORDER BY c.depth""".stripMargin

  /** Correlated LATERAL subquery: per-region top-2 nations by name —
    * the SQL form of a per-group top-k where the inner query sees the
    * outer row. Catalyst decorrelates this into a join + per-key
    * limit, the same scalable shape as the window top-k. */
  def lateralTopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("region", "nation")
    spark.sql(lateralTopPerGroupSql)
  }

  val lateralTopPerGroupSql: String =
    """SELECT r.r_name, t.n_name
      |FROM region r, LATERAL (
      |  SELECT n_name FROM nation n
      |  WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY n_name LIMIT 2) t
      |ORDER BY r.r_name, t.n_name""".stripMargin

  /** Correlated scalar aggregate subquery in the projection. */
  def correlatedCount(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("nation", "supplier")
    spark.sql(
      """SELECT n_name,
        |       (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers
        |FROM nation n
        |ORDER BY n_name""".stripMargin)
  }

  val correlatedCountSql: String =
    """SELECT n_name,
      |       (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers
      |FROM nation n
      |ORDER BY n_name""".stripMargin

  /** Exact interpolated percentiles + median over order prices. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(min(col("o_totalprice")), 2).as("p0"),
        round(max(col("o_totalprice")), 2).as("p100"))
      .orderBy(col("o_orderstatus"))

  val percentilesSql: String =
    """SELECT o_orderstatus,
      |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |       round(min(o_totalprice), 2) AS p0,
      |       round(max(o_totalprice), 2) AS p100
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Map-typed column surface (SURVEY.md §1.2: the reference's
    * event.data payload is a string-keyed map, main.py:6–9): build a
    * map from the events row, then extract with null-tolerant
    * element_at — the engine analog of dict.get. */
  def mapFns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("payload", map(
        lit("type"), col("event_type"),
        lit("user"), col("user_id").cast("string")))
      .select(
        col("event_id"),
        element_at(col("payload"), "type").as("p_type"),
        element_at(col("payload"), "user").as("p_user"),
        element_at(col("payload"), "missing").as("p_missing"),
        size(map_keys(col("payload"))).cast("long").as("n_keys"))
      .orderBy(col("event_id"))

  val mapFnsSql: String =
    """SELECT event_id,
      |       event_type AS p_type,
      |       CAST(user_id AS VARCHAR) AS p_user,
      |       CAST(NULL AS VARCHAR) AS p_missing,
      |       CAST(2 AS BIGINT) AS n_keys
      |FROM events ORDER BY event_id""".stripMargin

  /** DISTINCT ON semantics — "one row per key, by this ordering":
    * the PostgreSQL/DuckDB idiom ANSI SQL lacks and Spark expresses
    * as a rank-1 window. The engine side is the [[graft.operators.WarehouseEtl]] as-of
    * pattern (row_number over (custkey ORDER BY date DESC, key DESC)
    * = 1), which Spark plans as WindowGroupLimit — partial top-1 per
    * key BEFORE the exchange, so the shuffle carries one row per key,
    * not the history (docs/PLANS.md `etl_cdc_latest`). The ORACLE
    * uses DuckDB's native `DISTINCT ON` with the same ORDER BY — two
    * different surface idioms, one semantics, hash-checked equal. */
  def distinctOn(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_orderdate"),
        col("o_orderstatus").as("latest_status"))
      .orderBy(col("o_custkey"))
  }

  val distinctOnSql: String =
    """SELECT DISTINCT ON (o_custkey)
      |       o_custkey, o_orderkey AS latest_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
      |       o_orderstatus AS latest_status
      |FROM orders
      |ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC""".stripMargin

  /** QUALIFY-style window filter — "top-2 orders per customer" said
    * the way analysts write it in engines with the QUALIFY clause
    * (DuckDB, Snowflake, BigQuery): filter ON a window function
    * without a subquery. Spark 4 has no QUALIFY keyword, so the
    * engine-side formulation is the desugared form (rank column +
    * WHERE + drop) — which is exactly what QUALIFY compiles to — and
    * the plan gets WindowGroupLimit'd like every top-k-per-group in
    * the registry; the DuckDB oracle uses the literal QUALIFY clause,
    * pinning the desugar equivalence. */
  def qualifyTopk(spark: SparkSession, dir: String): DataFrame = {
    withViews(spark, dir)("orders")
    spark.sql(
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        |  FROM orders)
        |WHERE rk <= 2
        |ORDER BY o_custkey, rk""".stripMargin)
  }

  val qualifyTopkSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
      |       CAST(row_number() OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |FROM orders
      |QUALIFY rk <= 2
      |ORDER BY o_custkey, rk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_qualify_topk" -> (qualifyTopk _),
    "sql_distinct_on" -> (distinctOn _),
    "sql_grouping_sets" -> (groupingSets _),
    "sql_pivot" -> (pivotStatus _),
    "sql_unpivot" -> (unpivotMeasures _),
    "sql_scalar_subquery" -> (scalarSubquery _),
    "sql_exists_subquery" -> (existsSubquery _),
    "sql_correlated_count" -> (correlatedCount _),
    "sql_recursive_cte" -> (recursiveCte _),
    "sql_lateral_topk" -> (lateralTopPerGroup _),
    "sql_percentiles" -> (percentiles _),
    "fn_map" -> (mapFns _)
  )

  def oracle: Map[String, String] = Map(
    "sql_qualify_topk" -> qualifyTopkSql,
    "sql_distinct_on" -> distinctOnSql,
    "sql_grouping_sets" -> groupingSetsSql,
    "sql_pivot" -> pivotStatusSql,
    "sql_unpivot" -> unpivotMeasuresSql,
    "sql_scalar_subquery" -> scalarSubquerySql,
    "sql_exists_subquery" -> existsSubquerySql,
    "sql_correlated_count" -> correlatedCountSql,
    "sql_recursive_cte" -> recursiveCteSql,
    "sql_lateral_topk" -> lateralTopPerGroupSql,
    "sql_percentiles" -> percentilesSql,
    "fn_map" -> mapFnsSql
  )
}
