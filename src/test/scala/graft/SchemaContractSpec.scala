package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver-generated testdata.
  *
  * The testdata directory can be regenerated under the engine between
  * rounds (it happened in round 6: `events.ts` silently changed from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and 29 queries died at bench
  * time). This spec pins the column names and types every operator
  * family assumes, reading the RAW parquet footers — so a drift fails
  * here in seconds with the drifted table/column named, instead of as
  * dozens of opaque analysis errors downstream.
  *
  * Two layers:
  *  1. raw scans — what the files physically contain (with the known
  *     accepted variants, e.g. events.ts as long-nanos OR timestamp);
  *  2. the [[Tables]] loader contract — the normalized schema the rest
  *     of the engine programs against (e.g. events always exposes both
  *     `ts: timestamp` and `ts_ns: long`).
  */
class SchemaContractSpec extends SparkSpec {

  /** expected (name -> acceptable types) per table, in column order.
    * Integer widths are driver-version-dependent (pandas int32 vs
    * int64), and key columns only ever feed equality/grouping, so both
    * widths are accepted where the generator has shipped either. */
  private val intLike: Set[DataType] = Set(IntegerType, LongType)
  private def one(t: DataType): Set[DataType] = Set(t)

  private val rawContract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> intLike, "r_name" -> one(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> intLike,
      "n_name"      -> one(StringType),
      "n_regionkey" -> intLike),
    "customer" -> Seq(
      "c_custkey"    -> intLike,
      "c_name"       -> one(StringType),
      "c_nationkey"  -> intLike,
      "c_acctbal"    -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq(
      "s_suppkey"   -> intLike,
      "s_name"      -> one(StringType),
      "s_nationkey" -> intLike,
      "s_acctbal"   -> one(DoubleType)),
    "part" -> Seq(
      "p_partkey"     -> intLike,
      "p_name"        -> one(StringType),
      "p_brand"       -> one(StringType),
      "p_type"        -> one(StringType),
      "p_size"        -> intLike,
      "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq(
      "o_orderkey"      -> intLike,
      "o_custkey"       -> intLike,
      "o_orderstatus"   -> one(StringType),
      "o_totalprice"    -> one(DoubleType),
      "o_orderdate"     -> Set(TimestampType, TimestampNTZType, DateType),
      "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq(
      "l_orderkey"      -> intLike,
      "l_partkey"       -> intLike,
      "l_suppkey"       -> intLike,
      "l_linenumber"    -> intLike,
      "l_quantity"      -> one(DoubleType),
      "l_extendedprice" -> one(DoubleType),
      "l_discount"      -> one(DoubleType),
      "l_tax"           -> one(DoubleType),
      "l_returnflag"    -> one(StringType),
      "l_linestatus"    -> one(StringType),
      "l_shipdate"      -> Set(TimestampType, TimestampNTZType, DateType)),
    "events" -> Seq(
      "event_id"   -> intLike,
      // accepted variants: nanos-as-long (pre-Aug-2026 generator) or a
      // real timestamp column (current generator). Tables.events
      // normalizes both — see Tables.scala.
      "ts"         -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id"    -> intLike,
      "event_type" -> one(StringType),
      "value"      -> one(DoubleType),
      "props"      -> one(StringType)),
    "documents" -> Seq(
      "doc_id"  -> intLike,
      "text"    -> one(StringType),
      "lang"    -> one(StringType),
      "source"  -> one(StringType),
      "n_chars" -> intLike),
    "embeddings" -> Seq(
      "vec_id"    -> intLike,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false),
                         ArrayType(DoubleType), ArrayType(DoubleType, containsNull = false)),
      "label"     -> intLike)
  )

  private def describeDrift(table: String, actual: StructType,
                            expected: Seq[(String, Set[DataType])]): Seq[String] = {
    val actualByName = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.collect {
      case (name, _) if !actualByName.contains(name) =>
        s"$table.$name MISSING (testdata drifted — column dropped or renamed)"
    }
    val wrongType = expected.collect {
      case (name, ok) if actualByName.get(name).exists(t => !ok.contains(t)) =>
        s"$table.$name DRIFTED to ${actualByName(name).simpleString} " +
          s"(accepted: ${ok.map(_.simpleString).mkString(" | ")})"
    }
    val extra = actual.fields.collect {
      case f if !expected.exists(_._1 == f.name) =>
        s"$table.${f.name} NEW column ${f.dataType.simpleString} (informational)"
    }
    missing ++ wrongType ++ extra
  }

  for ((table, expected) <- rawContract.toSeq.sortBy(_._1)) {
    test(s"raw $table.parquet matches the testdata contract") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val actual = spark.read.parquet(s"$sf/$table.parquet").schema
      val drift = describeDrift(table, actual, expected)
      val fatal = drift.filterNot(_.contains("informational"))
      assert(fatal.isEmpty,
        s"\nTESTDATA SCHEMA DRIFT in $table.parquet:\n  " + drift.mkString("\n  ") +
          s"\n  actual schema: ${actual.simpleString}")
    }
  }

  test("Tables.events normalizes to the engine contract: ts timestamp + ts_ns long") {
    val ev = Tables.events(spark, sf)
    val types = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types.get("ts").contains(TimestampType),
      s"events.ts must normalize to TimestampType, got ${types.get("ts")}")
    assert(types.get("ts_ns").contains(LongType),
      s"events.ts_ns must normalize to LongType, got ${types.get("ts_ns")}")
    // ts and ts_ns must agree: ts_ns is exact epoch nanos of ts.
    val bad = ev.selectExpr("count(*) as n")
      .union(ev.filter("unix_micros(ts) * 1000 != ts_ns").selectExpr("-count(*) as n"))
      .collect().map(_.getLong(0))
    assert(bad(1) == 0L, s"ts/ts_ns disagree on ${-bad(1)} of ${bad(0)} rows")
  }

  test("Tables loaders expose every contract column (pruning-safe reads)") {
    val loaders: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "region"     -> Tables.region(spark, sf),
      "nation"     -> Tables.nation(spark, sf),
      "customer"   -> Tables.customer(spark, sf),
      "supplier"   -> Tables.supplier(spark, sf),
      "part"       -> Tables.part(spark, sf),
      "orders"     -> Tables.orders(spark, sf),
      "lineitem"   -> Tables.lineitem(spark, sf),
      "documents"  -> Tables.documents(spark, sf),
      "embeddings" -> Tables.embeddings(spark, sf)
    )
    for ((name, df) <- loaders; (col, _) <- rawContract(name)) {
      assert(df.columns.contains(col), s"Tables.$name lost contract column $col")
    }
  }
}
