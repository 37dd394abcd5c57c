package graft.plans

import graft.functions.{DotProduct, L2Norm}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognize the declarative higher-order-function
  * formulations of vector math and swap in the engine's native
  * codegen'd expressions.
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)
  *     → graft_dot(a, b)
  *   sqrt(aggregate(v, 0.0, (acc,x) -> acc + x*x))
  *     → graft_l2norm(v)
  *
  * The rewrite is semantics-preserving bit-for-bit: the native
  * expressions fold left-to-right exactly like ArrayAggregate (proven
  * differentially in LlmOpsSpec), so even float results are unchanged.
  * Users keep writing portable public-API code; the engine supplies
  * the fast path — the same contract Catalyst's own rewrites follow.
  *
  * Enabled via GraftExtensions (injectOptimizerRule) or at runtime
  * through `NativeVectorRewrite.enable(spark)`
  * (experimental.extraOptimizations).
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private object FoldSum {
    /** Matches (acc, v) -> acc + v over the given lambda. */
    def unapply(e: Expression): Option[Unit] = e match {
      case LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(a, b), _)
        if acc.exprId == a.asInstanceOf[NamedLambdaVariable].exprId &&
          v.exprId == b.asInstanceOf[NamedLambdaVariable].exprId => Some(())
      case _ => None
    }
  }

  private object FoldSumSquares {
    /** Matches (acc, x) -> acc + x*x. */
    def unapply(e: Expression): Option[Unit] = e match {
      case LambdaFunction(
          Add(acc: NamedLambdaVariable, Multiply(x1: NamedLambdaVariable, x2: NamedLambdaVariable, _), _),
          Seq(a, b), _)
        if acc.exprId == a.asInstanceOf[NamedLambdaVariable].exprId &&
          x1.exprId == x2.exprId &&
          x1.exprId == b.asInstanceOf[NamedLambdaVariable].exprId => Some(())
      case _ => None
    }
  }

  private object PairwiseProduct {
    /** Matches zip_with(a, b, (x,y) -> x*y), yielding (a, b). */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(l, r), _))
        if x.exprId == l.asInstanceOf[NamedLambdaVariable].exprId &&
          y.exprId == r.asInstanceOf[NamedLambdaVariable].exprId => Some((a, b))
      case _ => None
    }
  }

  private object IdentityFinish {
    def unapply(e: Expression): Option[Unit] = e match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(a), _)
        if v.exprId == a.asInstanceOf[NamedLambdaVariable].exprId => Some(())
      case _ => None
    }
  }

  private def zeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(PairwiseProduct(a, b), zero, FoldSum(_), IdentityFinish(_))
        if zeroD(zero) =>
      DotProduct(a, b)
    case Sqrt(ArrayAggregate(v, zero, FoldSumSquares(_), IdentityFinish(_)))
        if zeroD(zero) =>
      L2Norm(v)
  }

  /** Runtime enablement on an existing session (idempotent). */
  def enable(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.addOptimization(spark, this)

  /** Remove the runtime-added rule (restores HOF plans). */
  def disable(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.GraftShim.removeOptimization(spark, this)
}
