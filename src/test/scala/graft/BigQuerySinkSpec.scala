package graft

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType

import graft.api.Graft

/** S5 closure (SURVEY.md §2.1): the BigQuery warehouse sink is option
  * plumbing over [[Graft.writeWarehouse]]. The connector jar can't run
  * offline (zero egress), so — same pattern as FsSchemeSpec's
  * MockGraftFs — a recording mock format stands in for
  * `format("bigquery")` and the spec asserts the full option map, the
  * table reference, and the SaveMode reach the DataFrameWriter
  * UNCHANGED. With the real jar on the classpath nothing else differs.
  */
class BigQuerySinkSpec extends SparkSpec {

  private def sinkOf(disposition: String = "WRITE_TRUNCATE") = Graft.BigQuerySink(
    project = "analytics-prod",
    dataset = "tma",
    table = "reports",
    temporaryGcsBucket = Some("tma-staging"),
    writeDisposition = disposition,
    partitionField = Some("ingest_date"),
    clusteredFields = Seq("file", "sheet"),
    extraOptions = Map("parentProject" -> "billing-proj"))

  private def df: DataFrame = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "grp")
  }

  test("writeBigQuery passes table ref, mode and every option through unchanged") {
    MockWarehouseSink.captured = None
    Graft.writeBigQuery(df, sinkOf(), format = classOf[MockWarehouseSink].getName)
    val (mode, params) = MockWarehouseSink.captured.getOrElse(
      fail("mock sink never received the write"))
    assert(mode === SaveMode.Overwrite) // WRITE_TRUNCATE
    // .save(path) surfaces the table reference as the `path` parameter
    assert(params.get("path").contains("analytics-prod.tma.reports"))
    assert(params.get("project").contains("analytics-prod"))
    assert(params.get("dataset").contains("tma"))
    assert(params.get("temporarygcsbucket").contains("tma-staging"))
    assert(params.get("writemethod").contains("indirect"))
    assert(params.get("createdisposition").contains("CREATE_IF_NEEDED"))
    assert(params.get("partitionfield").contains("ingest_date"))
    assert(params.get("clusteredfields").contains("file,sheet"))
    assert(params.get("parentproject").contains("billing-proj"))
  }

  test("write dispositions map to the connector's SaveMode contract") {
    MockWarehouseSink.captured = None
    Graft.writeBigQuery(df, sinkOf("WRITE_APPEND"),
      format = classOf[MockWarehouseSink].getName)
    assert(MockWarehouseSink.captured.map(_._1).contains(SaveMode.Append))
  }

  test("invalid configurations fail fast at construction, not at write time") {
    intercept[IllegalArgumentException](sinkOf("WRITE_WHENEVER"))
    intercept[IllegalArgumentException](
      Graft.BigQuerySink("p", "d", "t", temporaryGcsBucket = None)) // indirect needs a bucket
    // direct write method needs no staging bucket
    val direct = Graft.BigQuerySink("p", "d", "t", writeMethod = "direct")
    assert(!direct.options.contains("temporaryGcsBucket"))
    assert(direct.tableRef === "p.d.t")
  }
}

/** Recording stand-in for the BigQuery connector: a
  * CreatableRelationProvider captures exactly what the DataFrameWriter
  * resolved — mode plus the (case-insensitive) parameter map including
  * `path` — which is precisely the surface a real connector sees. */
class MockWarehouseSink extends CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "mockwh-bq"
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    MockWarehouseSink.captured = Some((mode, parameters.map { case (k, v) => k.toLowerCase -> v }))
    new BaseRelation {
      override def sqlContext: SQLContext = sqlContext
      override def schema: StructType = data.schema
    }
  }
}

object MockWarehouseSink {
  @volatile var captured: Option[(SaveMode, Map[String, String])] = None
}
