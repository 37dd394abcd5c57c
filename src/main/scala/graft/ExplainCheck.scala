package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bad = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("q", ntile(4).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    println(bad.queryExecution.sparkPlan.toString)
    println("---nodes---")
    bad.queryExecution.sparkPlan.foreach(n => println(n.getClass.getName + " :: " + n.outputPartitioning))
    spark.stop()
  }
}
