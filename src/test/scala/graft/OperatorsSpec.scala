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

  test("winsorize: tails hold ~5% each, mean sits inside the clip window") {
    val rows = Aggregations.winsorize(spark, sf).collect()
    val counts = Tables.orders(spark, sf).groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (status, n, nLo, nHi) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === counts(status))
      // each tail strictly below the quantile is at most 5% of rows
      // (interpolated threshold → can round down, never inflate)
      assert(nLo <= math.ceil(0.05 * n).toLong, s"$status n_lo $nLo of $n")
      assert(nHi <= math.ceil(0.05 * n).toLong, s"$status n_hi $nHi of $n")
      assert(nLo > 0 && nHi > 0, s"$status expected non-empty tails")
      val (p05, p95, mean) = (r.getLong(4) / 100.0, r.getLong(5) / 100.0, r.getDouble(6))
      assert(mean >= p05 && mean <= p95, s"$status mean $mean outside [$p05, $p95]")
    }
  }

  test("heavy-hitter sketch finds every exact >=30% item (superset guarantee)") {
    val rows = Aggregations.heavyHitters(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val exact = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter { case (_, c) => c * 10 >= total * 3 }.toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)))
      assert(r.getBoolean(2), s"${r.getString(0)} missed by the sketch")
    }
  }

  test("unpivot totals reconcile against the wide table") {
    val got = SqlSurface.unpivotMeasures(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    assert(got.keySet === Set("extendedprice", "discount_amt", "tax_amt"))
    got.values.foreach { case (cnt, _) => assert(cnt === n) }
    val directCents = li.agg(
      sum(round(col("l_extendedprice") * 100).cast("long"))).head().getLong(0)
    assert(got("extendedprice")._2 === directCents / 100.0)
  }

  test("freqItems PRUNES a genuinely skewed distribution (log-price buckets)") {
    // the oracle query's uniform returnflags make every item heavy —
    // this is the sketch earning its keep: 8 log-price buckets, two
    // above 20% (56% / 21%), most far below. With support 0.2 the
    // sketch holds ~5 counters, so it must surface the heavy pair
    // WITHOUT returning the whole distribution.
    val sf01 = "/root/testdata/sf0.01"
    val b = Tables.orders(spark, sf01)
      .select(floor(log(col("o_totalprice"))).cast("long").as("bucket"))
    val total = b.count()
    val exactHeavy = b.groupBy("bucket").count()
      .where(col("count") * 5 >= lit(total)).collect().map(_.getLong(0)).toSet
    assert(exactHeavy.size >= 2, s"fixture not skewed: $exactHeavy")
    val sketch = b.stat.freqItems(Seq("bucket"), 0.2)
      .head().getSeq[Long](0).toSet
    assert(exactHeavy.subsetOf(sketch), s"missed heavy: $exactHeavy vs $sketch")
    val distinct = b.distinct().count()
    assert(sketch.size < distinct,
      s"no pruning: sketch ${sketch.size} of $distinct distinct")
  }

  test("HLL sketch merge: union estimate within bound; naive per-batch sum overcounts") {
    val r = Aggregations.hllMerge(spark, sf).head()
    assert(r.getLong(0) === 4L) // four day-parity batches
    assert(r.getBoolean(2), "merged HLL estimate outside 5% of exact")
    assert(r.getBoolean(3), "expected batch-sum overcount (users span batches)")
    // independent accuracy check at sf0.01 (more users): merge error
    // well under the bound the verdict allows
    val sf01 = "/root/testdata/sf0.01"
    val est = Tables.events(spark, sf01)
      .select(col("user_id"), (dayofmonth(col("ts")) % 4).as("b"))
      .groupBy("b").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e")).head().getLong(0)
    val exact = Tables.events(spark, sf01).select(countDistinct(col("user_id")))
      .head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"est $est vs exact $exact")
  }

  test("PNG IHDR parser reads a real header (magic, big-endian dims, depth, type)") {
    import spark.implicits._
    // genuine header bytes of a 1x1 RGBA PNG (signature + IHDR):
    // width=1, height=1, bit depth 8, color type 6
    val real = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000001" + "00000001" + "08" + "06" + "000000"
    // and a corrupted magic — parser must flag, not mis-read
    val bad = "FF504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000280" + "000001E0" + "10" + "00" + "000000"
    val rows = Seq(("real", real), ("bad", bad)).toDF("tag", "hx")
      .select(col("tag"), Multimodal.parsePngHeader(unhex(col("hx"))).as("p"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    val p = rows("real")
    assert(p.getBoolean(0) && p.getLong(1) === 1L && p.getLong(2) === 1L)
    assert(p.getLong(3) === 8L && p.getLong(4) === 6L)
    val b = rows("bad")
    assert(!b.getBoolean(0)) // magic check catches the corruption
    assert(b.getLong(1) === 640L && b.getLong(2) === 480L && b.getLong(3) === 16L)
  }

  // ---------- warehouse ETL ----------

  test("CDC latest-wins picks each user's (ts, event_id)-max record") {
    val got = WarehouseEtl.cdcLatest(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")), col("event_id"),
        col("event_type"), col("value")).collect()
    val want = raw.groupBy(_.getLong(0)).map { case (u, rs) =>
      val top = rs.maxBy(r => (r.getLong(1), r.getLong(2)))
      u -> top.getString(3)
    }
    assert(got.length === want.size) // exactly one row per user
    got.foreach { r =>
      assert(r.getString(1) === want(r.getLong(0)), s"user ${r.getLong(0)}")
    }
  }

  test("SCD2 matches a driver-side change-detection + interval recomputation") {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val got = WarehouseEtl.scd2Build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4))).toSet
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")), col("event_id"), col("event_type"))
      .collect()
    val want = raw.groupBy(_.getLong(0)).flatMap { case (u, rs) =>
      // mirror the operator: order by (ts, event_id), keep state
      // changes, close each interval at the next change's open
      val ordered = rs.sortBy(r => (r.getLong(1), r.getLong(2)))
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) { (acc, r) =>
        val st = r.getString(3)
        if (acc.nonEmpty && acc.last._2 == st) acc else acc :+ (r.getLong(1) -> st)
      }
      changes.zipWithIndex.map { case ((tsSec, st), i) =>
        val to = if (i + 1 < changes.size) fmt.format(new java.util.Date(changes(i + 1)._1 * 1000)) else null
        (u, st, fmt.format(new java.util.Date(tsSec * 1000)), to, to == null)
      }
    }.toSet
    assert(got === want)
    // exactly one current interval per user
    got.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.count(_._5) === 1, s"user $u")
    }
  }

  test("DQ suite: all five checks pass on the clean corpus; row-level checks share one scan") {
    val df = WarehouseEtl.dqChecks(spark, sf)
    val rows = df.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getString(0)).toSet === Set(
      "unique_o_orderkey", "fk_o_custkey", "not_null_o_orderdate",
      "satisfies_totalprice_positive", "enum_o_orderstatus"))
    rows.foreach { r =>
      assert(r.getLong(1) === 0L, r.getString(0))
      assert(r.getBoolean(2), r.getString(0))
    }
    // single-pass claim: the three row-level checks fan out from ONE
    // aggregate — orders scans appear only for rowLevel + pk + fk
    // count scans in the FINAL plan only — the AQE string appends the
    // initial plan below it, which would double every FileScan line
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val ordersScans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("orders.parquet"))
    assert(ordersScans <= 3, s"$ordersScans orders scans:\n$plan")
  }

  test("incremental partial-merge equals the direct aggregate on every key") {
    val rows = WarehouseEtl.incrementalAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3), r.getString(0)))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
  }

  // ---------- profiling / anomaly ----------

  test("rolling z-score flags match a driver-side integer recomputation") {
    val rows = TimeSeries.anomalyZscore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_.getString(1))
      val cents = ordered.map(r => math.round(r.getDouble(2) * 100))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val hist = cents.slice(math.max(0, i - 24), i)
        assert(r.getLong(3) === hist.length, s"$tpe n_hist at $i")
        val expected = hist.length >= 8 && {
          val n = hist.length.toLong
          val s = hist.sum
          val q = hist.map(c => c * c).sum
          val d = cents(i) * n - s
          d * d > 9L * (n * q - s * s)
        }
        assert(r.getBoolean(4) === expected, s"$tpe row $i")
      }
    }
    assert(rows.exists(_.getBoolean(4)), "expected at least one anomaly at sf0.001")
  }

  test("histogram buckets partition all orders and respect edge arithmetic") {
    val rows = Aggregations.histogram(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    val buckets = rows.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 20))
    assert(buckets.toSeq === buckets.sorted.toSeq)
    // per-bucket observed range must sit inside the computed edges
    val cents = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long")).collect().map(_.getLong(0))
    val lo = cents.min; val span = cents.max - lo + 1
    rows.foreach { r =>
      val b = r.getLong(0)
      val loC = math.round(r.getDouble(2) * 100); val hiC = math.round(r.getDouble(3) * 100)
      assert((loC - lo) * 20 / span === b, s"bucket $b lo_price outside")
      assert((hiC - lo) * 20 / span === b, s"bucket $b hi_price outside")
      assert(loC <= hiC)
    }
  }

  test("weighted sample takes exactly the k smallest keys, rare-heavy by weight") {
    val got = CorpusOps.sampleWeighted(spark, sf).collect()
    assert(got.length === 100)
    // recompute ALL keys through the same expression, select driver-side
    val u = (graft.api.Graft.idHash(col("doc_id")).cast("double") + lit(0.5)) / lit(4294967296.0)
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), (-log(u) / col("n_chars").cast("double")).as("key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val want = all.sortBy { case (id, k) => (k, id) }.take(100).map(_._1).toSet
    assert(got.map(_.getLong(0)).toSet === want)
    // weighting pulls long docs in: sampled mean n_chars exceeds corpus mean
    val sampledMean = got.map(_.getLong(1)).sum.toDouble / got.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean should exceed corpus mean $corpusMean")
  }

  test("BM25: docs hit by the rare query term outrank all common-only docs") {
    val rows = TextAnalysis.bm25TopK(spark, sf).collect()
    assert(rows.length === 15)
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    // idf separation: the rare term's single-occurrence contribution
    // exceeds the common terms' saturation ceiling, so every top-15
    // doc must contain it (25 docs carry it; k=15)
    val dupDocs = Tables.documents(spark, sf)
      .where(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(dupDocs.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} in top-15 without the rare term")
    }
  }

  test("PageRank matches a driver-side integer-micro iteration; mass conserved") {
    val got = GraphOps.pagerankTypes(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rebuild the edge list driver-side with the same ordering contract
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")), col("event_id"), col("event_type"))
      .collect()
    val edges = raw.groupBy(_.getLong(0)).toSeq.flatMap { case (_, rs) =>
      val types = rs.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getString(3))
      types.zip(types.tail)
    }.groupBy(identity).map { case ((s, d), xs) => (s, d, xs.size.toLong) }.toSeq
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    var score = nodes.map(_ -> math.round(1e6 / n)).toMap
    (1 to 3).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => math.round(score(s) * w / outdeg(s).toDouble) }.sum
      }
      score = nodes.map(nd =>
        nd -> math.round(0.15 * 1e6 / n + 0.85 * in.getOrElse(nd, 0L))).toMap
    }
    assert(got === score)
    // no dangling nodes in this graph, so mass stays ~1e6 (rounding only)
    assert(math.abs(got.values.sum - 1000000L) <= n.toLong, got.toString)
  }

  test("generic pagerank: sink accumulates, dangling mass leaks, params respected") {
    import spark.implicits._
    // star into a sink: a,b,c -> d (d dangling). After enough rounds
    // d must outscore the sources; dangling mass leaves the system.
    val edges = Seq(("a", "d", 1L), ("b", "d", 1L), ("c", "d", 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.pagerank(edges, iterations = 5, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set("a", "b", "c", "d"))
    assert(got("d") > got("a") && got("a") === got("b") && got("b") === got("c"))
    // sources get only the teleport share (0.15/4)
    assert(got("a") === math.round(0.15 * 1e6 / 4))
    // dangling d leaks its mass: total < 1e6
    assert(got.values.sum < 1000000L)
    // driver-side mirror of the exact integer iteration
    var s = Map("a" -> 250000L, "b" -> 250000L, "c" -> 250000L, "d" -> 250000L)
    (1 to 5).foreach { _ =>
      val in = Map("d" -> (s("a") + s("b") + s("c"))) // w/outdeg = 1
      s = s.keys.map(k =>
        k -> math.round(0.15 * 1e6 / 4 + 0.85 * in.getOrElse(k, 0L))).toMap
    }
    assert(got === s)
    intercept[IllegalArgumentException] { GraphOps.pagerank(edges, iterations = 0) }
  }

  test("label propagation matches a driver-side synchronous recomputation") {
    val raw = Joins.fuzzyBlockedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), 4L - r.getLong(2)))
    val sym = raw ++ raw.map { case (a, b, w) => (b, a, w) }
    val nodes = sym.map(_._1).distinct.sorted
    var lbl = nodes.map(n => n -> n).toMap
    (1 to 2).foreach { _ =>
      val next = nodes.map { n =>
        val byLabel = sym.filter(_._1 == n)
          .groupBy(e => lbl(e._2)).map { case (l, es) => l -> es.map(_._3).sum }
        // greatest incident weight, smallest label on ties
        n -> byLabel.toSeq.minBy { case (l, w) => (-w, l) }._1
      }.toMap
      lbl = next
    }
    val want = lbl.groupBy(_._2).map { case (community, ms) =>
      community -> ((ms.size.toLong, ms.keys.min))
    }
    val got = GraphOps.labelPropCommunities(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got === want)
    // LPA separates weakly-bridged clusters CC merges: at least as
    // many communities as connected components
    val cc = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: String): String =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      raw.foreach { case (a, b, _) => parent(find(a)) = find(b) }
      nodes.map(find).distinct.size
    }
    assert(got.size >= cc, s"${got.size} communities vs $cc components")
  }

  test("SSSP matches a driver-side hop-bounded Bellman-Ford; multi-hop paths found") {
    val raw = Joins.fuzzyBlockedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val sym = raw ++ raw.map { case (a, b, w) => (b, a, w) }
    val source = raw.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(source -> 0L)
    (1 to 4).foreach { _ =>
      val relaxed = sym.flatMap { case (u, v, w) =>
        dist.get(u).map(d => v -> (d + w))
      }.groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).min }
      dist = (dist.toSeq ++ relaxed.toSeq).groupBy(_._1)
        .map { case (v, ds) => v -> ds.map(_._2).min }
    }
    val got = GraphOps.shortestPathsNames(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === dist)
    assert(got(source) === 0L)
    // the interesting case: some node is cheaper via 2+ hops than its
    // direct edge, or only reachable indirectly — dist > max edge w
    assert(got.values.max > 3L, s"no multi-hop path exercised: $got")
  }

  test("triangle count matches a brute-force enumeration of the name graph") {
    val r = GraphOps.triangles(spark, sf).head()
    val edges = Joins.fuzzyBlockedJoin(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    def linked(x: String, y: String) = edges.contains(if (x < y) (x, y) else (y, x))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = (for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      if linked(nodes(i), nodes(j)) && linked(nodes(j), nodes(k)) && linked(nodes(i), nodes(k))
    } yield 1).size
    assert(r.getLong(0) === tris.toLong)
    assert(r.getLong(1) === edges.size.toLong)
    val wedges = nodes.map(n => edges.count(e => e._1 == n || e._2 == n).toLong)
      .map(d => d * (d - 1) / 2).sum
    assert(r.getLong(2) === wedges)
    assert(r.getLong(3) === math.round(3.0 * 1e6 * tris / wedges))
  }

  test("fuzzy blocked join matches a driver-side levenshtein over the name dictionary") {
    val got = Joins.fuzzyBlockedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .collect().map(_.getString(0))
    val want = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 3
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // blocking really blocks: no cross-noun pair survives
    got.foreach { case (a, b, _) =>
      assert(a.split(" ").last === b.split(" ").last)
    }
  }
}
