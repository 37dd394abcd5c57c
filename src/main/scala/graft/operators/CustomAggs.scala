package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom function surface (SURVEY.md §2.10): typed Aggregator UDAF,
  * scalar UDF (demonstrated, though built-ins are preferred — a UDF is
  * an optimizer barrier), and generator (posexplode) coverage.
  */
object CustomAggs {

  /** Typed Aggregator: weighted average. Buffer is (weighted sum,
    * weight sum); partial buffers merge associatively, so Catalyst
    * plans partial aggregation map-side exactly like a built-in agg —
    * the property that matters at scale. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Quantity-weighted average price per return flag via the UDAF. */
  def weightedAvgPrice(spark: SparkSession, dir: String): DataFrame = {
    val wavg = udaf(WeightedAvg)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  val weightedAvgPriceSql: String =
    """SELECT l_returnflag,
      |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
      |       count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Scalar UDF surface: slug normalization. Kept for API completeness;
    * the oracle shows the equivalent built-in (regexp_replace) — in
    * production the built-in wins because a UDF blocks pushdown and
    * codegen around it. */
  def udfSlug(spark: SparkSession, dir: String): DataFrame = {
    val slug = udf((s: String) =>
      if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), slug(col("p_name")).as("name_slug"))
      .orderBy(col("p_partkey"))
  }

  val udfSlugSql: String =
    """SELECT p_partkey,
      |       regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g') AS name_slug
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Generator surface: posexplode (position + value), 0-based. */
  def posexplodeTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"))
      .orderBy(col("doc_id"), col("pos"))

  val posexplodeTermsSql: String =
    """SELECT doc_id, CAST(pos AS BIGINT) AS pos, w[pos + 1] AS term
      |FROM (SELECT doc_id, w, unnest(range(len(w))) AS pos
      |      FROM (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents WHERE doc_id < 5))
      |ORDER BY doc_id, pos""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udaf_weighted_avg" -> (weightedAvgPrice _),
    "fn_udf_slug" -> (udfSlug _),
    "gen_posexplode" -> (posexplodeTerms _)
  )

  def oracle: Map[String, String] = Map(
    "udaf_weighted_avg" -> weightedAvgPriceSql,
    "fn_udf_slug" -> udfSlugSql,
    "gen_posexplode" -> posexplodeTermsSql
  )
}
