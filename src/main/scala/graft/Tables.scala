package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All engine operators read through here so that scale-sensitive read
  * settings live in one place. At 100 TB these readers would point at a
  * partitioned cloud-storage layout (the reference's GCS bucket model,
  * /root/reference/main.py:16 `gs://{bucket}/{name}`); locally they read
  * the driver's parquet files. Column pruning + predicate pushdown are
  * preserved because we hand back the raw scan and let Catalyst push
  * the caller's filters/projections into it.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` is written with TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). We read the
    * nanos as a plain long and rebuild a microsecond TimestampType column
    * `ts`, keeping `ts_ns` for exact arithmetic. Session TZ is UTC
    * everywhere so wall-clock values match the oracle's TIMESTAMP (ntz).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
  }
}
