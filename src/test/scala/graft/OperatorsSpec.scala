package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Invariant checks per operator family — the laws the DuckDB hash
  * compare can't express (bounds, algebra, internal consistency). */
class OperatorsSpec extends SparkSpec {

  // ---------- joins ----------

  test("semi + anti partition the customer table") {
    val c = Tables.customer(spark, sf).count()
    val semi = Joins.semiJoin(spark, sf).agg(sum("cust_with_orders")).head().getLong(0)
    // anti is filtered to orders-since-2000; recompute unfiltered here
    val o = Tables.orders(spark, sf)
    val cu = Tables.customer(spark, sf)
    val anti = cu.join(o, cu("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti === c)
  }

  test("full outer keeps every nation key from either side") {
    val keys = Joins.fullOuterNation(spark, sf)
      .select("nationkey").collect().map(_.getLong(0)).toSet
    val ckeys = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val skeys = Tables.supplier(spark, sf)
      .select(col("s_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(keys === (ckeys ++ skeys))
  }

  test("asof join emits at most one row per event and respects ts bound") {
    val asof = Joins.asofJoin(spark, sf)
    val perEvent = asof.groupBy("event_id").count().filter(col("count") > 1).count()
    assert(perEvent === 0)
  }

  // ---------- aggregations ----------

  test("rollup grand total equals ungrouped total") {
    val rolled = Aggregations.rollupFlagStatus(spark, sf)
      .filter(col("flag") === "ALL" && col("status") === "ALL")
      .select("cnt").head().getLong(0)
    assert(rolled === Tables.lineitem(spark, sf).count())
  }

  test("approx_count_distinct within 3x configured rsd of exact (sf0.01)") {
    // quantitative HLL bound on the raw sketch (the oracle-checked
    // query only exposes the within-bound verdict). rsd=0.01 is the
    // relative STANDARD DEVIATION of the sketch, so 3x is the sane
    // hard bound — tighter than the query's 5x verdict bound.
    val sf01 = "/root/testdata/sf0.01"
    val rows = Tables.events(spark, sf01)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users")
      val exact = r.getAs[Long]("exact_users")
      assert(math.abs(approx - exact).toDouble / exact <= 3 * 0.01,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
    // and the oracle-facing verdict must agree
    assert(Aggregations.approxDistinct(spark, sf01).collect()
      .forall(_.getAs[Boolean]("within_bound")))
  }

  test("percentile_approx rank error within sketch accuracy bound (sf0.01)") {
    // accuracy=1000 guarantees rank error <= n/1000; assert the raw
    // approx value's true rank sits within q +/- 0.01 per group
    val sf01 = "/root/testdata/sf0.01"
    val approx = Tables.orders(spark, sf01)
      .groupBy("o_orderstatus")
      .agg(expr("percentile_approx(o_totalprice, 0.5, 1000)").as("p50"),
        expr("percentile_approx(o_totalprice, 0.95, 1000)").as("p95"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    approx.foreach { case (status, (p50, p95)) =>
      val vals = Tables.orders(spark, sf01)
        .filter(col("o_orderstatus") === status)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.011, s"$status p50 rank ${rankOf(p50)}")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.011, s"$status p95 rank ${rankOf(p95)}")
    }
    // and the oracle-facing envelope verdicts must agree
    Aggregations.approxQuantiles(spark, sf01).collect().foreach { r =>
      assert(r.getAs[Boolean]("p50_in_envelope") && r.getAs[Boolean]("p95_in_envelope"),
        s"${r.getString(0)} envelope verdict false")
    }
  }

  test("funnel stages are monotone non-increasing") {
    val r = Analytics.funnelStages(spark, sf).head()
    val (viewed, clicked, bought) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(viewed >= clicked && clicked >= bought)
    assert(viewed > 0) // the fixture has view events
  }

  test("cohort retention at offset 0 equals the cohort size") {
    // a signup IS an event in the cohort week, so every cohort member
    // is active at offset 0 by construction
    val rows = Analytics.cohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .selectExpr("user_id", "ts_ns DIV 1000000000 DIV 86400 DIV 7 AS wk")
      .groupBy("user_id").agg(min("wk").as("cohort_wk"))
      .groupBy("cohort_wk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cohortSizes.foreach { case (wk, size) =>
      assert(rows((wk, 0L)) === size, s"cohort $wk offset 0")
    }
    // retention can only shrink or hold vs the cohort size
    rows.foreach { case ((wk, _), n) => assert(n <= cohortSizes(wk)) }
  }

  // ---------- windows ----------

  test("running total final row equals the customer's total spend") {
    val rt = Windows.runningTotal(spark, sf)
    val last = rt.groupBy("o_custkey").agg(max("run_total").as("final"))
    val direct = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("direct"))
    val joined = last.join(direct, "o_custkey")
      .filter(abs(col("final") - col("direct")) > 0.011)
    assert(joined.count() === 0)
  }

  test("top-k per group emits at most k rows per group, ranked") {
    val tk = Windows.topkPerPriority(spark, sf)
    val over = tk.groupBy("o_orderpriority").count().filter(col("count") > 3)
    assert(over.count() === 0)
    assert(tk.filter(col("rn") < 1 || col("rn") > 3).count() === 0)
  }

  // ---------- set ops ----------

  test("set algebra: |A∪B| = |A∩B| + |A\\B| + |B\\A| (distinct sets)") {
    val m = SortsAndSets.setOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = Tables.customer(spark, sf).select(col("c_nationkey").cast("long")).distinct().count()
    val b = Tables.supplier(spark, sf).select(col("s_nationkey").cast("long")).distinct().count()
    assert(m("union_distinct") === m("intersect") + m("except") + (b - m("intersect")))
    assert(m("except") === a - m("intersect"))
  }

  // ---------- sorts ----------

  test("sort_topk is ordered descending with unique keys") {
    val rows = SortsAndSets.topkLineitems(spark, sf).collect()
    assert(rows.length === 25)
    val prices = rows.map(_.getAs[Double]("price"))
    assert(prices.zip(prices.tail).forall { case (x, y) => x >= y })
  }

  // ---------- time series ----------

  test("resample: contiguous hourly spine per type; gaps flagged and forward-filled") {
    val rows = TimeSeries.resampleFfill(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
    byType.foreach { case (_, rs) =>
      // spine is contiguous: each bin is exactly 1h after the previous
      val bins = rs.map(r => java.time.LocalDateTime.parse(r.getString(1), fmt))
      bins.zip(bins.tail).foreach { case (a, b) => assert(b === a.plusHours(1)) }
      // is_gap <=> avg_value null; first bin is occupied (min over
      // occupied bins), so every filled_value is non-null
      rs.foreach { r =>
        assert(r.getBoolean(4) === r.isNullAt(2))
        assert(!r.isNullAt(3))
        // occupied bins fill with themselves
        if (!r.isNullAt(2)) assert(r.getDouble(2) === r.getDouble(3))
      }
      // forward fill carries the LAST observed value across a gap
      rs.sliding(2).foreach {
        case Array(prev, cur) if cur.isNullAt(2) =>
          assert(cur.getDouble(3) === prev.getDouble(3))
        case _ => ()
      }
    }
    assert(rows.exists(_.getBoolean(4)), "expected at least one gap at sf0.001")
  }

  test("interpolation matches a driver-side linear recomputation per type") {
    val rows = TimeSeries.resampleInterp(spark, sf).collect()
    var gaps = 0
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      val vals = sorted.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expected = vals(i) match {
          case Some(v) => v
          case None =>
            gaps += 1
            val prev = (i - 1 to 0 by -1).collectFirst { case j if vals(j).isDefined => (j, vals(j).get) }
            val next = (i + 1 until vals.length).collectFirst { case j if vals(j).isDefined => (j, vals(j).get) }
            (prev, next) match {
              case (Some((pj, pv)), Some((nj, nv))) =>
                // mirror the operator's integer-cents formulation exactly
                val pvC = math.round(pv * 100); val nvC = math.round(nv * 100)
                val den = (nj - pj).toLong
                val num = pvC * den + (nvC - pvC) * (i - pj)
                // HALF_UP away from zero, matching Spark/DuckDB round —
                // math.round is toward +inf and diverges on negative ties
                BigDecimal(num.toDouble * 100 / den)
                  .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 10000.0
              case (None, Some((_, nv))) => nv
              case (Some((_, pv)), None) => pv
              case _ => fail("spine row with no observed neighbor at all")
            }
        }
        assert(math.abs(r.getDouble(3) - expected) < 1e-9,
          s"${r.getString(0)} ${r.getString(1)}: ${r.getDouble(3)} vs $expected")
      }
    }
    assert(gaps > 0, "expected gaps at sf0.001")
  }

  test("label centroid matches a driver-side recomputation") {
    val got = Similarity.labelCentroid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val raw = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val want = raw.groupBy(_._1).flatMap { case (label, vs) =>
      (1 to 8).map { pos =>
        // mirror the operator's micro-unit quantization exactly
        val q = vs.map(v => math.round(v._2(pos - 1).toDouble * 1000000d))
        (label, pos.toLong) -> (math.round(q.sum.toDouble / q.size / 1000d) / 1000d + 0.0)
      }
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"$k: $v vs ${want(k)}") }
  }
}
