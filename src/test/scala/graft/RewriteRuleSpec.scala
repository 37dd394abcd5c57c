package graft

import graft.plans.NativeVectorRewrite
import org.apache.spark.sql.functions._

/** The HOF→native optimizer rewrite must fire on the declarative
  * pattern and preserve results bit-for-bit. */
class RewriteRuleSpec extends SparkSpec {

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

  test("rewritten results are bit-identical to the un-rewritten fold") {
    // compute WITHOUT the rule via explicit native calls as reference
    graft.functions.VectorFunctions.register(spark)
    NativeVectorRewrite.enable(spark)
    val native = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), call_function("graft_dot", col("v"), col("v")).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hofDot.collect().foreach { r =>
      assert(r.getDouble(1) === native(r.getLong(0)))
    }
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
