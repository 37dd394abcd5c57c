package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification over ANY DataFrame — the
  * parameterized form of the fixed suite behind `etl_dq_checks`
  * (reference intent: the accept/reject gate of main.py:12–14
  * generalized to warehouse loads).
  *
  * Design rule: every ROW-LEVEL check (not-null / range / set /
  * arbitrary predicate) compiles into ONE shared aggregate whose
  * single result row fans out via `stack` — a suite of 50 row-level
  * checks still costs one scan at 100 TB. Each `Unique` adds one
  * distinct-count over its key; each `RefIntegrity` one anti join
  * against its (usually broadcastable) dimension. The output is the
  * uniform (check, violations, pass) contract, so a load gate is
  * `result.filter(!col("pass")).isEmpty`.
  */
object DataQuality {

  sealed trait Check { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null_$col"
  }

  /** Column must fall in [lo, hi] (inclusive); nulls violate. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range_$col"
  }

  /** Column value must be one of the allowed set; nulls violate. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"enum_$col"
  }

  /** Arbitrary row-level predicate that every row must satisfy. */
  final case class Satisfies(label: String, predicate: Column) extends Check {
    def name = s"satisfies_$label"
  }

  /** Column must be unique across the table (primary-key check). */
  final case class Unique(col: String) extends Check {
    def name = s"unique_$col"
  }

  /** Every value of `col` must resolve in `dim.dimCol`
    * (foreign-key check). */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String) extends Check {
    def name = s"fk_$col"
  }

  private def rowPredicate(c: Check): Option[(String, Column)] = c match {
    case NotNull(cl) => Some(c.name -> col(cl).isNotNull)
    case InRange(cl, lo, hi) =>
      Some(c.name -> (col(cl).isNotNull && col(cl) >= lo && col(cl) <= hi))
    case InSet(cl, vs) => Some(c.name -> col(cl).isin(vs: _*))
    case Satisfies(_, p) => Some(c.name -> p)
    case _ => None
  }

  /** The ROW-LEVEL checks compiled to violation-count aggregate
    * columns (`sum(!predicate)` named per check) — the shared
    * currency between [[dqSuite]] (batch: one aggregate + stack
    * fan-out) and a STREAMING gate: pass them to
    * `df.observe("dq", ...)` and every micro-batch reports its
    * violation counts through `StreamingQueryProgress
    * .observedMetrics`, costing zero extra passes over the stream
    * (StreamsSpec "streaming DQ gate"). Unique/RefIntegrity have no
    * row-local form and stay batch-side. */
  def rowCheckAggs(checks: Seq[Check]): Seq[Column] = {
    val rows = checks.flatMap(rowPredicate)
    require(rows.nonEmpty, "rowCheckAggs: no row-level checks in the list")
    rows.map { case (n, p) => sum(violates(p)).as(n) }
  }

  /** 1 when the predicate is NOT satisfied — counting non-true rather
    * than negating, because `sum((!p).cast("long"))` silently skips
    * rows where p evaluates to NULL (a NULL enum value makes
    * `isin` NULL, `!NULL` is NULL, and the sum drops it), letting
    * null-bearing rows through the gate uncounted. `when(p, 0)
    * .otherwise(1)` maps true→0, false→1, NULL→1, which is the
    * documented contract (NULL violates). */
  private def violates(p: Column): Column = when(p, 0L).otherwise(1L)

  /** Run the suite; returns (check, violations, pass) sorted by check
    * name. See the object doc for the per-check-kind plan cost.
    * Null semantics: a NULL value VIOLATES InRange, InSet, Satisfies
    * (a NULL-evaluating predicate counts as a violation, not a skip)
    * and RefIntegrity (a null fk cannot resolve); Unique treats NULL
    * as one more value, so k NULL rows are k−1 violations. Pair with
    * NotNull when nullability itself is the condition under test. */
  def dqSuite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "dqSuite: empty check list")
    require(checks.map(_.name).distinct.size == checks.size,
      s"dqSuite: duplicate check names in ${checks.map(_.name)}")
    // check names are spliced into a generated stack() expression as
    // string literals — restrict them to identifier characters so a
    // hostile column/label can't break or inject the SQL
    checks.foreach(c => require(c.name.matches("[A-Za-z0-9_.]+"),
      s"dqSuite: check name '${c.name}' must be [A-Za-z0-9_.]+"))
    val rowLevel = checks.flatMap(rowPredicate)
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLevel.nonEmpty) {
      // one aggregate of violation counts, fanned out to one row per
      // check via stack — referencing the agg N times would plan the
      // scan N times (the trap etl_dq_checks documents)
      val agg = df.agg(
        sum(violates(rowLevel.head._2)).as("v0"),
        rowLevel.tail.zipWithIndex.map { case ((_, p), i) =>
          sum(violates(p)).as(s"v${i + 1}")
        }: _*)
      val stackArgs = rowLevel.zipWithIndex
        .map { case ((n, _), i) => s"'$n', v$i" }.mkString(", ")
      parts += agg.select(expr(
        s"stack(${rowLevel.size}, $stackArgs) AS (check, violations)"))
    }
    checks.foreach {
      case Unique(cl) =>
        // count(*) − distinct-with-NULL-as-a-value: countDistinct
        // skips NULLs, so k NULL rows would otherwise report zero
        // violations on a "primary key" column. Adding NULL back as
        // one distinct value (when present) makes k NULLs contribute
        // k−1 violations — the same rule every other value gets.
        parts += df.agg((count(lit(1)) - countDistinct(col(cl)) -
            when(sum(col(cl).isNull.cast("long")) > 0L, 1L).otherwise(0L))
            .as("violations"))
          .select(lit(s"unique_$cl").as("check"), col("violations"))
      case RefIntegrity(cl, dim, dimCl) =>
        parts += df.join(dim, df(cl) === dim(dimCl), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(s"fk_$cl").as("check"), col("violations"))
      case _ => ()
    }
    parts.reduce(_ union _)
      .select(col("check"), col("violations"), (col("violations") === 0L).as("pass"))
      .orderBy(col("check"))
  }
}
