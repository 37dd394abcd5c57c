package graft

import graft.plans.NativeVectorRewrite
import org.apache.spark.sql.functions._

/** The HOF→native optimizer rewrite must fire on the declarative
  * pattern, preserve results bit-for-bit against a Catalyst-free
  * ground truth, and preserve the fold's NULL semantics. The rule is
  * removed from the shared session in afterAll so other suites'
  * HOF-vs-native differential tests keep testing what they claim to.
  */
class RewriteRuleSpec extends SparkSpec {

  override def afterAll(): Unit = {
    NativeVectorRewrite.disable(spark)
    super.afterAll()
  }

  private def hofDot = {
    val df = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    df.select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
        .as("dot"))
  }

  private def hofNorm = {
    val df = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
    df.select(col("vec_id"),
      sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)).as("nrm"))
  }

  test("rule rewrites aggregate(zip_with(·,·,*)) to the native dot product") {
    NativeVectorRewrite.enable(spark)
    val plan = hofDot.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_dot"), plan)
    assert(!plan.contains("aggregate("), plan)
  }

  test("rule rewrites sqrt(aggregate(·, acc+x*x)) to the native l2 norm") {
    NativeVectorRewrite.enable(spark)
    val plan = hofNorm.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_l2norm"), plan)
  }

  test("rewritten results are bit-identical to a Catalyst-free ground truth") {
    // ground truth computed in plain Scala over the collected vectors
    // (same left-to-right fold) — independent of both the rule and the
    // native expressions, so divergence in EITHER fails here
    val truth = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        var s = 0.0
        v.foreach(x => s += x * x) // dot(v,v), left-to-right
        r.getLong(0) -> s
      }.toMap
    NativeVectorRewrite.enable(spark)
    hofDot.collect().foreach { r =>
      assert(r.getDouble(1) === truth(r.getLong(0)))
    }
  }

  test("rewrite preserves NULL semantics: length mismatch and null elements stay NULL") {
    NativeVectorRewrite.enable(spark)
    import spark.implicits._
    // round-trip through parquet: a literal LocalRelation would be
    // constant-folded before the plan shows the rewrite
    val dir = java.nio.file.Files.createTempDirectory("graft_rw").toString + "/data"
    Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),          // length mismatch
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)),    // null element
      (3L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))      // clean
    ).toDF("id", "a", "b").write.parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          .as("dot"))
    // confirm the rewrite actually fired on this plan
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    val rows = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === None)
    assert(rows(2L) === None)
    assert(rows(3L) === Some(11.0))
  }

  test("rule leaves non-matching folds alone (different merge function)") {
    NativeVectorRewrite.enable(spark)
    val df = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(aggregate(col("v"), lit(0.0), (acc, x) => acc + abs(x)).as("l1"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_"), plan)
    assert(df.head().getDouble(0) > 0)
  }
}
