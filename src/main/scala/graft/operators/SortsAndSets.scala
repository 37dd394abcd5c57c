package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k (SURVEY.md §2.6) and set operations (§2.7).
  *
  * `orderBy(...).limit(k)` is rewritten by Catalyst into
  * TakeOrderedAndProject — per-partition top-k then a driver merge of k
  * rows per partition, never a full global sort. That is the shape that
  * survives 100 TB.
  */
object SortsAndSets {

  /** Global top-25 line items by price, fully tie-broken. */
  def topkLineitems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("linenumber"),
        round(col("l_extendedprice"), 2).as("price"))

  val topkLineitemsSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
      |       round(l_extendedprice, 2) AS price
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  /** Multi-key total sort with explicit null handling (ASC NULLS FIRST
    * to match both engines' defaults explicitly). */
  def multiKeySort(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .orderBy(col("p_brand").asc_nulls_first, col("p_size").desc, col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("size"))
      .limit(50)

  val multiKeySortSql: String =
    """SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS size
      |FROM part
      |ORDER BY p_brand ASC NULLS FIRST, p_size DESC, p_partkey
      |LIMIT 50""".stripMargin

  /** UNION / INTERSECT / EXCEPT (set semantics) plus bag variants,
    * summarized as one deterministic counts row per operation.
    * Computed distributively (agg per branch, then union) — no
    * driver-side collect. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").cast("long").as("k"))
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").cast("long").as("k"))
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt")).select(lit(name).as("op"), col("cnt"))
    counted("union_distinct", c.union(s).distinct())
      .union(counted("union_all", c.union(s)))
      .union(counted("intersect", c.intersect(s)))
      .union(counted("intersect_all", c.intersectAll(s)))
      .union(counted("except", c.except(s)))
      .union(counted("except_all", c.exceptAll(s)))
      .orderBy(col("op"))
  }

  val setOpsSql: String =
    """SELECT 'union_distinct' AS op, count(*) AS cnt FROM (
      |  SELECT DISTINCT k FROM (SELECT c_nationkey AS k FROM customer
      |                          UNION ALL SELECT s_nationkey FROM supplier))
      |UNION ALL SELECT 'union_all', count(*) FROM (
      |  SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)
      |UNION ALL SELECT 'intersect', count(*) FROM (
      |  SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL SELECT 'intersect_all', count(*) FROM (
      |  SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
      |UNION ALL SELECT 'except', count(*) FROM (
      |  SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |UNION ALL SELECT 'except_all', count(*) FROM (
      |  SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
      |ORDER BY op""".stripMargin

  /** unionByName across differently-ordered projections — schema
    * alignment by name, the safe way to append heterogeneous extracts. */
  def unionByNameParties(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_name").as("party_name"), lit("customer").as("kind"),
      round(col("c_acctbal"), 2).as("acctbal"))
    val s = Tables.supplier(spark, dir).select(
      lit("supplier").as("kind"), round(col("s_acctbal"), 2).as("acctbal"),
      col("s_name").as("party_name"))
    c.unionByName(s)
      .filter(col("acctbal") > 5000)
      .orderBy(col("kind"), col("party_name"))
  }

  val unionByNamePartiesSql: String =
    """SELECT * FROM (
      |  SELECT c_name AS party_name, 'customer' AS kind, round(c_acctbal, 2) AS acctbal FROM customer
      |  UNION ALL
      |  SELECT s_name, 'supplier', round(s_acctbal, 2) FROM supplier)
      |WHERE acctbal > 5000
      |ORDER BY kind, party_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_topk" -> (topkLineitems _),
    "sort_multikey" -> (multiKeySort _),
    "set_ops_counts" -> (setOps _),
    "set_union_by_name" -> (unionByNameParties _)
  )

  def oracle: Map[String, String] = Map(
    "sort_topk" -> topkLineitemsSql,
    "sort_multikey" -> multiKeySortSql,
    "set_ops_counts" -> setOpsSql,
    "set_union_by_name" -> unionByNamePartiesSql
  )
}
