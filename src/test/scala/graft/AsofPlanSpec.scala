package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.functions._

/** Specs for the custom as-of operator (LogicalPlan + Strategy +
  * AsofJoinExec). */
class AsofPlanSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    // (id, key, time)
    (1L, 10L, 100L),
    (2L, 10L, 200L),
    (3L, 10L, 50L),   // before any right row for key 10
    (4L, 20L, 500L),
    (5L, 30L, 500L)   // key 30 has no right rows at all
  ).toDF("id", "key", "t")

  private def rightDf = Seq(
    // (rkey, rtime, rid)
    (10L, 90L, 900L),
    (10L, 100L, 901L),  // same time as left id=1 → inclusive match
    (10L, 100L, 950L),  // tie on time → larger rid wins
    (10L, 150L, 902L),
    (20L, 400L, 903L)
  ).toDF("rkey", "rt", "rid")

  private def run() = AsofJoin.asofJoin(spark, leftDf, rightDf,
    "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"))
    .select("id", "rid", "rt").collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("asof semantics: latest right ≤ time, inclusive, tie-broken by payload id") {
    val out = run()
    assert(out === Map(
      1L -> ((950L, 100L)), // t=100: rows at 90,100,100 qualify; (100,950) is max
      2L -> ((902L, 150L)), // t=200: latest is 150
      4L -> ((903L, 400L))
      // id=3 (time before all) and id=5 (no key) are dropped
    ))
  }

  test("forward direction: earliest right ≥ time, smallest-tiebreak tie-break") {
    val out = AsofJoin.asofJoin(spark, leftDf, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"), direction = "forward")
      .select("id", "rid", "rt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((901L, 100L)), // t=100: rows at 100,100,150 qualify; (100,901) is min
      3L -> ((900L, 90L))   // t=50: earliest for key 10 is 90
      // id=2 (nothing ≥ 200 on key 10), id=4 (400 < 500 on key 20),
      // and id=5 (no key) are dropped
    ))
  }

  test("nearest direction: closer of past/future, exact tie prefers the past") {
    val lefts = Seq(
      (1L, 10L, 100L), // back d=0 (100,950) vs fwd d=50 → back
      (2L, 10L, 200L), // back d=50 only → (902,150)
      (3L, 10L, 50L),  // fwd d=40 only → (900,90)
      (6L, 10L, 125L), // EXACT tie: back (100,950) d=25, fwd (150,902) d=25 → back
      (7L, 10L, 126L), // fwd now closer: d=24 vs back d=26 → (902,150)
      (5L, 30L, 500L)  // no key → dropped
    ).toDF("id", "key", "t")
    val out = AsofJoin.asofJoin(spark, lefts, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"), direction = "nearest")
      .select("id", "rid", "rt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((950L, 100L)),
      2L -> ((902L, 150L)),
      3L -> ((900L, 90L)),
      6L -> ((950L, 100L)),
      7L -> ((902L, 150L))))
    // tolerance applies to the chosen (minimum) distance
    val tol = AsofJoin.asofJoin(spark, lefts, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid"), direction = "nearest",
      tolerance = Some(30L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tol === Set(1L, 6L, 7L)) // d=0, 25, 24 pass; 40/50 dropped
  }

  test("tolerance bounds both directions") {
    // backward: id=2 (t=200) matches rt=150, gap 50 — a tolerance of
    // 40 drops it while id=1 (gap 0) survives
    val back = AsofJoin.asofJoin(spark, leftDf, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid"), tolerance = Some(40L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!back.contains(2L) && back.contains(1L))
    // forward: id=3 (t=50) matches rt=90, gap 40 — tolerance 39 drops
    // it, tolerance 40 keeps it (inclusive bound)
    def fwd(tol: Long) = AsofJoin.asofJoin(spark, leftDf, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid"),
      direction = "forward", tolerance = Some(tol))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!fwd(39L).contains(3L))
    assert(fwd(40L).contains(3L))
  }

  test("left-outer as-of keeps unmatched lefts with null payload") {
    val out = AsofJoin.asofJoin(spark, leftDf, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"), joinType = "left")
      .select("id", "rid", "rt").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L)) // every left survives
    assert(out(1L) === ((Some(950L), Some(100L))))
    assert(out(3L) === ((None, None))) // before any right row
    assert(out(5L) === ((None, None))) // key absent from right
  }

  test("physical plan uses AsofJoinExec, not a window or pair-join") {
    val df = AsofJoin.asofJoin(spark, leftDf, rightDf,
      "key", "t", "rkey", "rt", "rid", Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan) // AsofJoinExec prints as "AsofJoin"
    assert(!plan.contains("Window"), plan)
  }

  test("agrees with the window formulation on real data (all 3 impls)") {
    val a = graft.operators.Joins.asofJoin(spark, sf).collect().map(_.toSeq).toSet
    val b = graft.operators.Joins.asofJoinMerge(spark, sf).collect().map(_.toSeq).toSet
    val c = graft.operators.Joins.asofJoinPlan(spark, sf).collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a === c)
  }

  test("deep-history skew: 100k-row key stays O(n+m) in the merge exec") {
    // the shape that kills the join+window formulation: one key whose
    // right-side history is deep. The pair-materializing baseline
    // would build |left_rows_at_key| x |history| rows before its
    // rank-1 filter; AsofJoinExec walks each side once per key.
    val left = Seq((1L, 1L, 1000000L), (2L, 1L, 5L), (3L, 2L, 100L)).toDF("id", "key", "t")
    val deep = spark.range(0, 100000)
      .select(lit(1L).as("rkey"), (col("id") * 10).as("rt"), col("id").as("rid"))
      .union(Seq((2L, 50L, 7L)).toDF("rkey", "rt", "rid"))
    val df = AsofJoin.asofJoin(spark, left, deep,
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"))
    val out = df.select("id", "rid", "rt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((99999L, 999990L)), // latest rt <= 1,000,000
      2L -> ((0L, 0L)),          // only rt=0 qualifies at t=5
      3L -> ((7L, 50L))))
    // and it really ran through the streaming-merge exec
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
  }

  test("bucketed inputs: the as-of join plans with NO shuffle exchange") {
    // the standing layout for repeated temporal joins at 100 TB: both
    // sides bucketed on the join key, so EnsureRequirements sees the
    // ClusteredDistribution already satisfied and elides the exchanges
    // (the declared requiredChildDistribution is what makes this work)
    Seq("b_asof_l", "b_asof_r").foreach(dropTableAndDir)
    leftDf.write.mode("overwrite").bucketBy(4, "key").sortBy("key", "t")
      .saveAsTable("b_asof_l")
    rightDf.write.mode("overwrite").bucketBy(4, "rkey").sortBy("rkey", "rt")
      .saveAsTable("b_asof_r")
    val df = AsofJoin.asofJoin(spark, spark.table("b_asof_l"), spark.table("b_asof_r"),
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"))
    val out = df.select("id", "rid", "rt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((950L, 100L)), 2L -> ((902L, 150L)), 4L -> ((903L, 400L))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of join must not shuffle:\n$plan")
  }

  test("TimestampType key/time columns resolve internally (no manual epoch math)") {
    // same scenario as the long-typed base case, but times are real
    // timestamps (left TimestampType, right TIMESTAMP_NTZ — the exact
    // mix of events.ts vs orders.o_orderdate) and keys are ints; the
    // operator normalizes both sides to epoch-micro longs internally
    val lts = leftDf.select(col("id"), col("key").cast("int").as("key"),
      timestamp_seconds(col("t")).as("t"))
    val rts = rightDf.select(col("rkey").cast("int").as("rkey"),
      timestamp_seconds(col("rt")).cast("timestamp_ntz").as("rt"), col("rid"))
    val df = AsofJoin.asofJoin(spark, lts, rts,
      "key", "t", "rkey", "rt", "rid", Seq("rid", "rt"))
    // shadow columns must not leak into the caller-visible schema
    assert(!df.columns.exists(_.startsWith("__graft_asof")), df.columns.mkString(","))
    val out = df.select(col("id"), col("rid"), unix_timestamp(col("rt")).as("rt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((950L, 100L)),
      2L -> ((902L, 150L)),
      4L -> ((903L, 400L))))
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"))
  }

  test("empty right side yields empty result, not an error") {
    val empty = rightDf.filter(col("rkey") < 0)
    val out = AsofJoin.asofJoin(spark, leftDf, empty,
      "key", "t", "rkey", "rt", "rid", Seq("rid")).count()
    assert(out === 0L)
  }
}
