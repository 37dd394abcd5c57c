package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-15 additions: k-truss decomposition (cohesion family
  * completion), Holt-Winters forecasting, and serving-surface
  * invariants for the matured beam search. */
class Round15OpsSpec extends SparkSpec {

  test("ktruss: every surviving edge keeps >= k-2 triangles; truss nodes ⊆ 2-core nodes") {
    val census = GraphOps.kTruss(spark, sf).collect()
    // the converged 4-truss admits no edge below support 2
    census.foreach { r =>
      assert(r.getAs[Long]("support") >= (GraphOps.trussK - 2).toLong)
      assert(r.getAs[Long]("n_edges") > 0L)
    }
    // containment: k-truss ⊆ (k-1)-core ⊆ 2-core — every truss node
    // must appear in the kCore output's node column
    val trussNodes = {
      val e = GraphOps.kTrussEdges(spark, sf)
      e.select(col("a").as("node")).union(e.select(col("b")))
        .distinct().collect().map(_.getString(0)).toSet
    }
    val coreNodes = GraphOps.kCore(spark, sf).collect()
      .map(_.getAs[String]("node")).toSet
    assert(trussNodes.subsetOf(coreNodes))
    // non-degenerate on this corpus: the planted name cliques survive
    assert(trussNodes.nonEmpty)
  }

  test("holt-winters: exact-sum kernel; smape bounded; flags consistent; eval sets shrink with horizon") {
    // the truncation-corrected kernel is EXACT for a constant series:
    // level weights sum to 1e6, trend weights to 0 (so l = c, b = 0)
    assert(TimeSeries.hwW.map(_._1).sum === 1000000L)
    assert(TimeSeries.hwW.map(_._2).sum === 0L)
    val rows = TimeSeries.holtWinters(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("horizon_h")).toSeq === Seq(1L, 24L, 168L))
    val evals = rows.map(_.getAs[Long]("n_eval"))
    assert(evals.forall(_ > 0L))
    // longer horizons lose origins off the head of the spine
    assert(evals.zip(evals.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // sMAPE with the |n|+|f| denominator is bounded by 2.0
      assert(r.getAs[Long]("smape_ppm") >= 0L &&
        r.getAs[Long]("smape_ppm") <= 2000000L)
      assert(r.getAs[Long]("persist_smape_ppm") >= 0L &&
        r.getAs[Long]("persist_smape_ppm") <= 2000000L)
      assert(r.getAs[Boolean]("beats_persistence") ===
        (r.getAs[Long]("smape_ppm") < r.getAs[Long]("persist_smape_ppm")))
      assert(r.getAs[Long]("mae_milli") >= 0L)
    }
  }

  test("holt damped: every horizon's combined kernel sums to exactly 1e6; long-horizon smape bounded by plain holt's") {
    // constant-series exactness holds PER HORIZON for the combined
    // (level + damped-ramp·trend) kernels
    Seq(1, 24, 168).foreach { h =>
      assert(TimeSeries.hdW(h).sum === 1000000L)
    }
    val damped = TimeSeries.holtDamped(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r).toMap
    val plain = TimeSeries.holtWinters(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r).toMap
    assert(damped.keySet === Set(1L, 24L, 168L))
    // identical eval protocol → same n_eval and persistence columns
    Seq(1L, 24L, 168L).foreach { h =>
      assert(damped(h).getAs[Long]("n_eval") === plain(h).getAs[Long]("n_eval"))
      assert(damped(h).getAs[Long]("persist_smape_ppm") ===
        plain(h).getAs[Long]("persist_smape_ppm"))
    }
    // the point of damping: at the weekly horizon the saturating ramp
    // must not do worse than the ×168 undamped extrapolation
    assert(damped(168L).getAs[Long]("smape_ppm") <=
      plain(168L).getAs[Long]("smape_ppm"))
  }

  test("hw seasonal: per-horizon kernels sum to exactly 1e6; seasonal member wins the seasonal horizons") {
    // constant-series exactness per horizon for the combined
    // (level + h·trend + seasonal-pick) kernels
    Seq(1, 24, 168).foreach { h =>
      assert(TimeSeries.hsW(h).sum === 1000000L)
    }
    val seas = TimeSeries.hwSeasonal(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r).toMap
    val plain = TimeSeries.holtWinters(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r).toMap
    assert(seas.keySet === Set(1L, 24L, 168L))
    // deeper kernel (168 vs 24 taps) → strictly fewer full-kernel
    // origins, never more
    Seq(1L, 24L, 168L).foreach { h =>
      assert(seas(h).getAs[Long]("n_eval") > 0L)
      assert(seas(h).getAs[Long]("n_eval") <= plain(h).getAs[Long]("n_eval"))
      assert(seas(h).getAs[Long]("smape_ppm") <= 2000000L)
      assert(seas(h).getAs[Boolean]("beats_persistence") ===
        (seas(h).getAs[Long]("smape_ppm") < seas(h).getAs[Long]("persist_smape_ppm")))
    }
    // the point of the seasonal state: at the seasonal horizons the
    // model must not lose to the trend-only member's long-horizon
    // extrapolation (which measured ~4x the persistence floor at 168)
    assert(seas(168L).getAs[Long]("smape_ppm") <=
      plain(168L).getAs[Long]("smape_ppm"))
    // and at h=24/168 the persistence column lag(n,h) IS
    // seasonal-naive — the damped-seasonal member beats it
    assert(seas(24L).getAs[Boolean]("beats_persistence"))
    assert(seas(168L).getAs[Boolean]("beats_persistence"))
  }

  test("forecast select: same-origins eval set equals seasonal's; champion is the argmin under the tie order") {
    val rows = TimeSeries.forecastSelect(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r).toMap
    assert(rows.keySet === Set(1L, 24L, 168L))
    // the selection table's guard is hwSeasonal's deepest-kernel
    // discipline — identical n_eval per horizon
    val seas = TimeSeries.hwSeasonal(spark, sf).collect()
      .map(r => r.getAs[Long]("horizon_h") -> r.getAs[Long]("n_eval")).toMap
    Seq(1L, 24L, 168L).foreach { h =>
      val r = rows(h)
      assert(r.getAs[Long]("n_eval") === seas(h))
      val byName = Map(
        "persistence" -> r.getAs[Long]("smape_persistence_ppm"),
        "holt" -> r.getAs[Long]("smape_holt_ppm"),
        "damped" -> r.getAs[Long]("smape_damped_ppm"),
        "seasonal" -> r.getAs[Long]("smape_seasonal_ppm"))
      val min = byName.values.min
      val expect = TimeSeries.fsOrder.find(m => byName(m) == min).get
      assert(r.getAs[String]("champion") === expect)
      // a real member must beat the floor on the shared origins
      assert(min < byName("persistence"))
    }
    // the long-horizon story: the undamped member must not be champion
    // at h=168 (its x168 ramp measured ~4x the floor)
    assert(rows(168L).getAs[String]("champion") !== "holt")
  }

  test("arch test: r2 bounded; lm = n*r2; flag matches the chi2(1) cut") {
    val r = TimeSeries.archTest(spark, sf).collect().head
    val n = r.getAs[Long]("n_pairs"); val r2 = r.getAs[Long]("r2_micro")
    assert(n > 0L)
    assert(r2 >= 0L && r2 <= 1000000L)
    // lm is exactly n*r2 in the same micro units (one shared double)
    assert(math.abs(r.getAs[Long]("lm_micro") - n * r2) <= n)
    assert(r.getAs[Boolean]("arch_present") ===
      (r.getAs[Long]("lm_micro") > 3841459L))
  }

  test("variance ratio: eval counts consistent; flag matches z; mean-reverting hourly counts read VR < 1") {
    val r = TimeSeries.varianceRatio(spark, sf).collect().head
    assert(r.getAs[Long]("q") === 24L)
    // the q-lag loses q-1 more origins than the 1-lag
    assert(r.getAs[Long]("n1") === r.getAs[Long]("nq") + 23L)
    assert(r.getAs[Long]("vr_ppm") > 0L)
    assert(r.getAs[Boolean]("random_walk_rejected") ===
      (math.abs(r.getAs[Long]("z_micro")) > 1959964L))
    // a stationary count series mean-reverts: q-period diffs carry
    // FAR less than q x the 1-period variance
    assert(r.getAs[Long]("vr_ppm") < 1000000L)
    assert(r.getAs[Long]("z_micro") < 0L)
  }

  test("sprt: decision consistent with the crossed boundary; stopping index precedes truncation; early stop is real") {
    val r = MlEval.sprt(spark, sf).collect().head
    val n = r.getAs[Long]("n_scanned")
    assert(n > 0L && n <= 20000L)
    assert(r.getAs[Long]("n_conversions") <= n)
    val decision = r.getAs[String]("decision")
    if (decision == "continue") {
      assert(r.isNullAt(r.fieldIndex("n_at_decision")))
      // un-crossed truncation: the final llr sits inside the bounds
      assert(math.abs(r.getAs[Long]("llr_final_micro")) < MlEval.sprtBound)
    } else {
      val nd = r.getAs[Long]("n_at_decision")
      val llr = r.getAs[Long]("llr_at_decision_micro")
      assert(nd >= 1L && nd <= n)
      // the decision names the boundary that was actually crossed
      if (decision == "accept_h1") assert(llr >= MlEval.sprtBound)
      else assert(llr <= -MlEval.sprtBound)
      // the sequential test's value proposition: it stopped well
      // before the truncation horizon on this corpus
      assert(nd < n)
    }
  }

  test("rbo: bounded by perfect score; identical rankings hit exactly 1e6 ppm; rank-aware where recall is not") {
    // weight sanity: the truncated-RBO weights decay and the perfect
    // score is their rank-weighted sum
    assert(Similarity.rboW.zip(Similarity.rboW.tail).forall { case (a, b) => a >= b })
    val rows = Similarity.rboAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rbo = r.getAs[Long]("rbo_micro")
      assert(rbo >= 0L && rbo <= Similarity.rboPerfect)
      assert(r.getAs[Long]("rbo_ppm") <= 1000000L)
      // identical prefix lists ⇔ the exact perfect integer
      if (r.getAs[Long]("rbo_ppm") == 1000000L) assert(rbo === Similarity.rboPerfect)
    }
    // the audit is rank-aware, not a set metric: somewhere the route
    // agrees as a set less than perfectly in ORDER (ppm < 1e6 while
    // n_approx is full) — on this corpus the IVF route scrambles at
    // least one query's prefix
    assert(rows.exists(r => r.getAs[Long]("rbo_ppm") < 1000000L))
  }

  test("hampel: every flag exceeds the local threshold; med/mad are true window medians; replacement is the median") {
    val rows = TimeSeries.hampel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val med = r.getAs[Long]("med")
      val mad = r.getAs[Long]("mad")
      // the exact integer flag condition, replayed
      assert(math.abs(n - med) * 10000L > mad * 44478L)
      assert(mad >= 0L)
      assert(r.getAs[Long]("replacement") === med)
    }
    // rolling robustness is real: the GLOBAL median of the series
    // differs from at least one flagged hour's LOCAL median (the
    // filter adapts where a global cut cannot)
    val meds = rows.map(_.getAs[Long]("med")).toSet
    assert(meds.size >= 2 || rows.length < 3)
  }

  test("mood median: contingency partitions both samples; chi2 consistent with the flag; median is the pooled median") {
    val r = StatsOps.moodMedian(spark, sf).collect().head
    val n1 = r.getAs[Long]("n_click"); val n2 = r.getAs[Long]("n_purchase")
    val a1 = r.getAs[Long]("above_click"); val a2 = r.getAs[Long]("above_purchase")
    assert(n1 > 0L && n2 > 0L)
    // above-counts are proper sub-counts
    assert(a1 >= 0L && a1 <= n1 && a2 >= 0L && a2 <= n2)
    // the pooled median splits the POOL roughly in half (exactly:
    // at most half sit strictly above, by the 2*cum >= N pick)
    assert((a1 + a2) * 2 <= n1 + n2)
    assert(r.getAs[Boolean]("significant") ===
      (r.getAs[Long]("chi2_micro") > 3841459L))
    // chi2 replayed from the four cells in exact arithmetic
    val det = BigInt(a1) * (n2 - a2) - BigInt(a2) * (n1 - a1)
    val expect = math.round(1e6 * (n1 + n2).toDouble * (det * det).toDouble /
      (n1.toDouble * n2.toDouble * (a1 + a2).toDouble * (n1 + n2 - a1 - a2).toDouble))
    assert(r.getAs[Long]("chi2_micro") === expect)
  }

  test("diversity sample: sqrt-cap quotas; deterministic selection; heavy cells downweighted") {
    val rows = Similarity.diversitySample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      val q = r.getAs[Long]("quota")
      assert(q === math.ceil(math.sqrt(n.toDouble)).toLong)
      // sqrt-cap fills exactly (quota <= n always for n >= 1)
      assert(r.getAs[Long]("n_taken") === q)
      assert(r.getAs[Long]("taken_id_sum") >= r.getAs[Long]("taken_min_id"))
    }
    // the point: the sample is a real downweighting, not a relabel
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    val taken = rows.map(_.getAs[Long]("n_taken")).sum
    assert(taken < total / 2)
    // md5-ranked selection is deterministic: re-running chooses the
    // SAME documents (checksums equal), not just the same counts
    val again = Similarity.diversitySample(spark, sf).collect()
    assert(rows.map(r => (r.getAs[Long]("cell"), r.getAs[Long]("taken_id_sum"))).toSeq ===
      again.map(r => (r.getAs[Long]("cell"), r.getAs[Long]("taken_id_sum"))).toSeq)
  }

  test("tpch flavors: q13 outer-join totals; q15 max ties; q17 decorrelates; q22 cohort real") {
    // q13: the distribution partitions the customer table exactly —
    // and the left join survives optimization (a WHERE-placed
    // predicate would have turned it inner and dropped 0-count rows)
    val q13 = Analytics.customerDistribution(spark, sf)
    assert(q13.queryExecution.optimizedPlan.toString.contains("LeftOuter"))
    val dist = q13.collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(dist.map(_.getAs[Long]("custdist")).sum === nCust)
    // q15: all returned suppliers share the exact max cents revenue
    val q15 = Analytics.topSupplier(spark, sf).collect()
    assert(q15.nonEmpty)
    assert(q15.map(_.getAs[Double]("total_rev")).toSet.size === 1)
    // q17: Catalyst decorrelates the per-part threshold into an
    // aggregate joined back — no per-row re-scan survives
    val q17 = Analytics.smallQtyRevenue(spark, sf)
    assert(!q17.queryExecution.optimizedPlan.toString.toLowerCase.contains("correlated"))
    assert(q17.collect().length === 1)
    // q22: the recent-idle anti join plans as LeftAnti and the
    // cohort is non-vacuous at every SF
    val q22 = Analytics.idleCustomers(spark, sf)
    assert(q22.queryExecution.optimizedPlan.toString.contains("LeftAnti"))
    val rows = q22.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("numcust") > 0L))
  }

  test("ppr: teleport mass concentrates at the seed; no background 1/N term; global ranking differs") {
    val ppr = GraphOps.pprTypes(spark, sf).collect()
    assert(ppr.length === 5) // the event-type dictionary
    val scores = ppr.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("score_micro")).toMap
    // the seed holds the restart mass: strictly above every other node
    assert(scores("purchase") === scores.values.max)
    scores.filterKeys(_ != "purchase").values.foreach(v => assert(v < scores("purchase")))
    assert(scores.values.forall(_ >= 0L))
    // mass is bounded by the teleport geometric series (1e6 at the
    // fixpoint) plus per-node rounding slack
    assert(scores.values.sum <= 1000000L + ppr.length)
    // the personalization is real: the GLOBAL variant does not rank
    // purchase first on this graph (uniform teleport dominates)
    val global = GraphOps.pagerankTypes(spark, sf).collect()
    assert(global.head.getAs[String]("event_type") !== "purchase")
  }

  test("ebml: width-from-leading-bit vint; id/size marker asymmetry; unknown-size sentinel; continuation folds differ") {
    val rows = Multimodal.ebmlHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      val id = r.getAs[Long]("doc_id")
      val dtlen = if (id % 5 < 3) 4L else 8L
      // the SAME hdr_size value decodes through BOTH vint widths —
      // the width rule is the first byte's leading bit, not the value
      assert(r.getAs[Long]("hdr_size") === dtlen + 7L)
      assert(r.getAs[Long]("hdr_vint_width") === (if (id % 2 == 0) 1L else 2L))
      assert(r.getAs[String]("doctype") === (if (id % 5 < 3) "webm" else "matroska"))
      // unknown-size sentinel: all value bits set, size column NULL
      if (id % 3 == 0) {
        assert(r.getAs[Boolean]("seg_unknown"))
        assert(r.isNullAt(r.fieldIndex("seg_size")))
      } else {
        assert(!r.getAs[Boolean]("seg_unknown"))
        assert(!r.isNullAt(r.fieldIndex("seg_size")))
      }
    }
    // both segment widths occur, so the leading-bit dispatch is proven
    assert(rows.map(_.getAs[Long]("seg_vint_width")).toSet === Set(1L, 3L))
    // a width-2 size (0x40, v): EBML strips the marker -> v; EITHER
    // continuation-bit scheme stops at 0x40 (high bit clear) -> 64
    rows.find(r => r.getAs[Long]("hdr_vint_width") == 2L).foreach { r =>
      val v = r.getAs[Long]("hdr_size")
      assert(v !== 64L) // hdr sizes are 11/15, so the folds truly differ
    }
  }

  test("midi: MSB-first vlq decodes the generating delta; smpte fps dispatch; widths exercised") {
    val rows = Multimodal.midiHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      val id = r.getAs[Long]("doc_id")
      // the parse must reproduce the generating law byte-exactly
      assert(r.getAs[Long]("delta_ticks") === (id * 37) % 2097152)
      assert(r.getAs[Long]("note") === id % 128)
      if (r.getAs[String]("division_mode") == "smpte") {
        assert(Set(24L, 25L, 29L, 30L).contains(r.getAs[Long]("smpte_fps")))
        assert(r.isNullAt(r.fieldIndex("ticks_per_quarter")))
      } else {
        assert(r.isNullAt(r.fieldIndex("smpte_fps")))
      }
    }
    // the MSB-first mechanism is only proven if multi-byte widths occur
    val widths = rows.map(_.getAs[Long]("vlq_width")).toSet
    assert(widths.contains(2L) || widths.contains(3L))
    // an LSB-first (LEB128) fold of the same bytes would decode multi-
    // byte deltas differently — check one 2-byte case explicitly
    rows.find(_.getAs[Long]("vlq_width") == 2L).foreach { r =>
      val d = r.getAs[Long]("delta_ticks")
      val bytes = ((d >> 7) | 0x80L, d & 0x7fL) // bytes as written (MSB-first)
      val lebDecode = (bytes._1 & 0x7fL) | (bytes._2 << 7) // the WRONG fold
      assert(lebDecode !== d)
    }
  }
}
