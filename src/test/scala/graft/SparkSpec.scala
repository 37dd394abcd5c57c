package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM-wide session —
  * Spark session startup dominates test time otherwise). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Drop a saved table AND its on-disk warehouse directory. The
    * catalog is in-memory per JVM, so a previous run's table dirs
    * survive on disk without catalog entries; the path must match
    * build.sbt's -Dspark.sql.warehouse.dir. Shared by every spec
    * that saves bucketed tables. */
  def dropTableAndDir(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val d = new java.io.File(s"/tmp/graft-warehouse/$name")
    if (d.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }
  }
}
