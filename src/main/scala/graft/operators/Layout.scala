package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — Z-order clustering for multi-column
  * data skipping. The reference's warehouse intent (main.py:16–17)
  * implies repeated range queries over landed facts; at 100 TB the
  * layout, not the query, decides whether those scans read 100 TB or
  * 100 GB. Bucketing (`join_bucketed_colocated`) serves ONE join
  * key; Z-ORDER serves range predicates on several columns at once:
  * sort the table by the Morton interleave of the (quantized)
  * columns and every file's min/max footer stats become tight on
  * BOTH dimensions, so a predicate on either prunes files.
  *
  * Scale shape: the z-value is a map-only integer projection
  * ([[graft.api.Graft.mortonInterleave]]); the layout write is one
  * `repartitionByRange(zval)` — the same single range exchange any
  * sorted write pays. Nothing here grows super-linearly.
  */
object Layout {

  /** Orders with both z-dimensions quantized to 8 bits: customer-key
    * residue (a stand-in for any high-cardinality equality column)
    * and equi-width price bucket in exact cents (same edge arithmetic
    * as `agg_histogram` — engine-identical on boundary values). */
  private def dims(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(256)).cast("long").as("d1"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val bounds = o.agg(min("c").as("lo"), max("c").as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("d2", expr("((c - lo) * 256) DIV (hi - lo + 1)"))
  }

  private val dimsSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey % 256 AS d1,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |b AS (SELECT min(c) AS lo, max(c) AS hi FROM o),
      |d AS (SELECT o_orderkey, d1, ((c - lo) * 256) // (hi - lo + 1) AS d2
      |      FROM o CROSS JOIN b)""".stripMargin

  /** The z-curve locality profile: orders keyed by the 16-bit Morton
    * interleave of (d1, d2), summarized per 64-tile (zval ⌁ 10 bits).
    * The payoff is visible in the output itself: every tile's
    * min/max span in EACH dimension is a small fraction of the
    * 0..255 domain — exactly the per-file footer tightness that
    * makes min/max skipping fire for predicates on either column.
    * (A lexicographic sort by d1 would give this for d1 only; d2
    * spans would stay ≈256 — the comparison ZorderSpec asserts.) */
  def zorderProfile(spark: SparkSession, dir: String): DataFrame =
    dims(spark, dir)
      .withColumn("zval", graft.api.Graft.mortonInterleave(col("d1"), col("d2"), 8))
      .groupBy(shiftright(col("zval"), 10).as("ztile"))
      .agg(count(lit(1)).as("n_orders"),
        min("d1").as("d1_lo"), max("d1").as("d1_hi"),
        min("d2").as("d2_lo"), max("d2").as("d2_hi"))
      .orderBy(col("ztile"))

  // the interleave unrolled as plain integer arithmetic — the same
  // 8 (shift, mod, scale) terms the Spark expression folds
  private val mortonSqlTerms: String =
    (0 until 8).map { i =>
      s"((d1 // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + ((d2 // ${1L << i}) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  val zorderProfileSql: String =
    s"""$dimsSql,
       |z AS (SELECT d1, d2, ($mortonSqlTerms) AS zval FROM d)
       |SELECT zval // 1024 AS ztile, count(*) AS n_orders,
       |       min(d1) AS d1_lo, max(d1) AS d1_hi,
       |       min(d2) AS d2_lo, max(d2) AS d2_hi
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorderProfile _)
  )

  def oracle: Map[String, String] = Map(
    "layout_zorder" -> zorderProfileSql
  )
}
