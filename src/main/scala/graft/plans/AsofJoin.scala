package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.GraftShim

/** AS-OF join as a first-class operator: custom LogicalPlan +
  * SparkStrategy + physical SparkPlan (SURVEY.md §2.3 route (c) /
  * §4.3's upgrade path).
  *
  * Semantics: for each left row, the single right row with the same
  * key and the greatest (time, tiebreak) such that right.time ≤
  * left.time; left rows with no match are dropped (inner as-of).
  *
  * Scale rationale: the join+window formulation materializes every
  * (left, earlier-right) pair before the rank filter — fan-out
  * proportional to per-key history depth. This operator hash-partitions
  * both sides once on the key, sorts within partitions (both
  * requirements expressed declaratively via requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements plans the exchanges and
  * can elide them when inputs are already partitioned), then runs an
  * O(n+m) streaming merge per partition holding ONE buffered right row
  * — no pair materialization, no per-key state beyond a single row.
  *
  * Key and time columns must be LongType; payload columns are carried
  * through by ordinal lookup against the right child's output.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    leftOuter: Boolean = false,
    nearest: Boolean = false) extends BinaryNode {

  // left-outer: unmatched lefts emit null payload, so the payload
  // attributes must surface as nullable regardless of source schema
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) payload.map(_.withNullability(true)) else payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt, tb, payload, fwd, tol, outer, near) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tb, payload,
        fwd, tol, outer, near) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute,
    payload: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    leftOuter: Boolean = false,
    nearest: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) payload.map(_.withNullability(true)) else payload)

  // One hash shuffle per side on the key; EnsureRequirements inserts
  // exchanges only when the child isn't already clustered on it.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // Per-partition sorts (spillable SortExec), expressed declaratively.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadOrds = payload.map(p => right.output.indexWhere(_.exprId == p.exprId))
    require((lKeyOrd :: lTimeOrd :: rKeyOrd :: rTimeOrd :: payloadOrds.toList).forall(_ >= 0),
      "asof join columns must resolve against child outputs")
    val leftOutput = left.output
    val rightOutput = right.output
    val outputAttrs = output

    val fwd = forward
    val tol = tolerance
    val outer = leftOuter
    val near = nearest
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      // outer mode: bind the right side nullable so the projection
      // null-checks payload reads (the child attrs may be non-null)
      val bindRight =
        if (outer) rightOutput.map(_.withNullability(true)) else rightOutput
      val proj = UnsafeProjection.create(outputAttrs, leftOutput ++ bindRight)
      val joined = new JoinedRow
      // left-outer no-match row: all-null right side (payload lookups
      // by ordinal read null; the projection handles the rest)
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightOutput.size)
      if (near) {
        // NEAREST: the closer of the backward and forward candidates;
        // an exact distance tie prefers the BACKWARD (past) row — at
        // ingestion time the past is known, the future is lookahead.
        // Stream position is shared with backward mode: rows with
        // rt ≤ lt are consumed into `held` (the best backward
        // candidate for this and every later left), the unconsumed
        // head is the forward candidate.
        var held: InternalRow = null
        var heldKey = 0L
        lIter.flatMap { l =>
          val lk = l.getLong(lKeyOrd)
          val lt = l.getLong(lTimeOrd)
          if (held != null && heldKey != lk) held = null
          var scan = true
          while (scan && rBuf.hasNext) {
            val h = rBuf.head
            val rk = h.getLong(rKeyOrd)
            if (rk < lk) {
              rBuf.next()
            } else if (rk == lk && h.getLong(rTimeOrd) <= lt) {
              held = rBuf.next().copy(); heldKey = rk
            } else {
              scan = false
            }
          }
          val backDist =
            if (held != null && heldKey == lk) Some(lt - held.getLong(rTimeOrd)) else None
          val fwdDist =
            if (rBuf.hasNext && rBuf.head.getLong(rKeyOrd) == lk)
              Some(rBuf.head.getLong(rTimeOrd) - lt)
            else None
          val pick = (backDist, fwdDist) match {
            case (Some(bd), Some(fd)) =>
              if (bd <= fd) Some((held, bd)) else Some((rBuf.head, fd))
            case (Some(bd), None) => Some((held, bd))
            case (None, Some(fd)) => Some((rBuf.head, fd))
            case _ => None
          }
          pick.filter { case (_, d) => tol.forall(d <= _) } match {
            case Some((r, _)) => Iterator.single(proj(joined(l, r)))
            case None =>
              if (outer) Iterator.single(proj(joined(l, nullRight))) else Iterator.empty
          }
        }
      } else if (!fwd) {
        // BACKWARD (default): greatest right.time ≤ left.time,
        // optionally within `tol` of it
        var held: InternalRow = null
        var heldKey = 0L
        lIter.flatMap { l =>
          val lk = l.getLong(lKeyOrd)
          val lt = l.getLong(lTimeOrd)
          if (held != null && heldKey != lk) held = null
          var scan = true
          while (scan && rBuf.hasNext) {
            val h = rBuf.head
            val rk = h.getLong(rKeyOrd)
            if (rk < lk) {
              rBuf.next() // keys are ascending on both sides: never matches again
            } else if (rk == lk && h.getLong(rTimeOrd) <= lt) {
              held = rBuf.next().copy() // latest-so-far for this key
              heldKey = rk
            } else {
              scan = false
            }
          }
          if (held != null && heldKey == lk &&
              tol.forall(t => lt - held.getLong(rTimeOrd) <= t)) {
            Iterator.single(proj(joined(l, held)))
          } else if (outer) {
            Iterator.single(proj(joined(l, nullRight)))
          } else Iterator.empty
        }
      } else {
        // FORWARD: smallest (right.time, tiebreak) ≥ left.time,
        // optionally within `tol`. Right rows strictly before the
        // current left time can never match a LATER left (left times
        // ascend), so they are consumed; the candidate head is NOT
        // consumed — the same right row may serve several lefts.
        lIter.flatMap { l =>
          val lk = l.getLong(lKeyOrd)
          val lt = l.getLong(lTimeOrd)
          var scan = true
          while (scan && rBuf.hasNext) {
            val h = rBuf.head
            val rk = h.getLong(rKeyOrd)
            if (rk < lk || (rk == lk && h.getLong(rTimeOrd) < lt)) rBuf.next()
            else scan = false
          }
          if (rBuf.hasNext && rBuf.head.getLong(rKeyOrd) == lk &&
              tol.forall(t => rBuf.head.getLong(rTimeOrd) - lt <= t)) {
            Iterator.single(proj(joined(l, rBuf.head)))
          } else if (outer) {
            Iterator.single(proj(joined(l, nullRight)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** Key/time column normalization: the exec reads key and time with
    * `getLong`, so LongType passes through, integral types widen, and
    * timestamp types resolve to epoch MICROSECONDS (TimestampNTZ is
    * interpreted in the session time zone, matching `unix_micros` on a
    * cast — the engine-wide convention). Mixing a raw-long side with a
    * timestamp side is the caller's responsibility: the long side must
    * already be epoch micros. The user-visible column is untouched — a
    * shadow column carries the normalized value and is dropped from the
    * output. Returns (augmented df, effective column name). */
  private def normalized(df: DataFrame, colName: String, shadow: String): (DataFrame, String) = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, unix_micros}
    df.schema(colName).dataType match {
      case LongType => (df, colName)
      case ByteType | ShortType | IntegerType =>
        (df.withColumn(shadow, col(colName).cast("long")), shadow)
      case TimestampType =>
        (df.withColumn(shadow, unix_micros(col(colName))), shadow)
      case _: TimestampNTZType =>
        (df.withColumn(shadow, unix_micros(col(colName).cast(TimestampType))), shadow)
      case t => throw new IllegalArgumentException(
        s"asof join column $colName: unsupported type $t (need integral or timestamp)")
    }
  }

  /** Public API: as-of join `left` with `right` on
    * left(keyCol)=right(keyCol'). Direction "backward" (default)
    * keeps the LATEST right.time ≤ left.time per left row (ties →
    * greatest `tiebreakCol`); "forward" keeps the EARLIEST
    * right.time ≥ left.time (ties → smallest tiebreak); "nearest"
    * keeps whichever of those two candidates is closer in absolute
    * distance, preferring backward on an exact tie — the three
    * pandas merge_asof directions. `tolerance` (in the normalized
    * time unit: epoch MICROS for timestamp columns, raw units for
    * integral ones) drops matches farther than that from the left
    * time. Key/time columns may be any integral or timestamp type
    * (timestamps resolve to epoch micros internally). `payloadCols`
    * from the right side are appended to the left columns. */
  def asofJoin(spark: SparkSession,
               leftDf: DataFrame, rightDf: DataFrame,
               leftKeyCol: String, leftTimeCol: String,
               rightKeyCol: String, rightTimeCol: String,
               tiebreakCol: String, payloadCols: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None,
               joinType: String = "inner"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asof direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "asof tolerance must be >= 0")
    require(joinType == "inner" || joinType == "left",
      s"asof joinType must be inner|left, got $joinType")
    GraftShim.addStrategy(spark, AsofJoinStrategy)
    val (l1, lk) = normalized(leftDf, leftKeyCol, "__graft_asof_lk")
    val (l2, lt) = normalized(l1, leftTimeCol, "__graft_asof_lt")
    val (r1, rk) = normalized(rightDf, rightKeyCol, "__graft_asof_rk")
    val (r2, rt) = normalized(r1, rightTimeCol, "__graft_asof_rt")
    val lPlan = l2.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val out = GraftShim.ofRows(spark, AsofJoinNode(
      lPlan, rPlan,
      attr(lPlan, lk), attr(lPlan, lt),
      attr(rPlan, rk), attr(rPlan, rt),
      attr(rPlan, tiebreakCol),
      payloadCols.map(attr(rPlan, _)),
      forward = direction == "forward",
      tolerance = tolerance,
      leftOuter = joinType == "left",
      nearest = direction == "nearest"))
    // left-side shadows ride along in the node output (output = left ++
    // payload); drop them so the caller sees the original schema
    out.drop(Seq("__graft_asof_lk", "__graft_asof_lt").filter(out.columns.contains): _*)
  }
}
