package graft

import graft.operators._
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Invariant specs for the round-10 additions. Each test pins a
  * property the DuckDB differential oracle cannot express — replays
  * against independent driver-side computations, defining inequalities
  * of the statistic (CMS never undercounts, a skyline row is
  * undominated), and conservation laws (counts partition, shares sum
  * to one). */
class Round10OpsSpec extends SparkSpec {

  test("gini: ppm matches a driver-side replay of the rank formula; bounds hold") {
    val r = StatsOps.gini(spark, sf).collect()(0)
    val (n, total, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val vals = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
      .collect().map(_.getLong(1)).sorted
    assert(n === vals.length && total === vals.sum)
    val s1 = vals.zipWithIndex.map { case (v, i) => BigInt(v) * (i + 1) }.sum
    val want = (BigDecimal(2 * s1 - BigInt(n + 1) * BigInt(total)) /
      (BigDecimal(n) * BigDecimal(total)) * 1e6).rounded.toLong
    // the engine divides as doubles; allow 1 ulp of ppm slack
    assert(math.abs(ppm - want) <= 1L)
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("mutual info: nonnegative, bounded by the smaller marginal entropy") {
    val r = StatsOps.mutualInfo(spark, sf).collect()(0)
    val (nDocs, nCells, mi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nDocs === Tables.documents(spark, sf).count())
    assert(nCells >= 1L)
    // quantization can push MI a hair below zero but no further
    assert(mi >= -nCells)
    if (!r.isNullAt(3)) {
      val nmi = r.getLong(3)
      assert(nmi >= -1L && nmi <= 1000001L) // NMI in [0,1] up to quantization
    }
  }

  test("mann-whitney: doubled U matches a driver-side midrank replay") {
    val r = StatsOps.mannWhitney(spark, sf).collect()(0)
    val (n1, n2, u) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long"), col("event_type") === "click")
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    assert(n1 === vals.count(_._2) && n2 === vals.count(!_._2))
    // midranks over the pooled sample (doubled units keep ties integer)
    val sorted = vals.sortBy(_._1)
    val byVal = sorted.map(_._1).zipWithIndex.groupBy(_._1)
    val rank2x = byVal.map { case (v, xs) =>
      val pos = xs.map(_._2)
      v -> (pos.min + pos.max + 2L) // 2*avg(1-based ranks) = min+max+2
    }
    val r1x = vals.filter(_._2).map(x => rank2x(x._1)).sum
    val wantU = (r1x - n1 * (n1 + 1)).toDouble / 2
    assert(u === wantU)
    assert(u >= 0 && u <= n1.toDouble * n2)
  }

  test("cramers v: ppm within [0, 1e6]; chi2 replays from the contingency table") {
    val r = StatsOps.cramersV(spark, sf).collect()(0)
    val (n, chi2Micro, vPpm) = (r.getLong(0), r.getLong(2), r.getLong(3))
    assert(n === Tables.orders(spark, sf).count())
    assert(vPpm >= 0L && vPpm <= 1000000L)
    val cells = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus")).count()
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val rt = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val want = cells.map { case ((p, s), o) =>
      val e = rt(p).toDouble * ct(s) / n
      math.round(1e6 * (o - e) * (o - e) / e)
    }.sum
    assert(chi2Micro === want)
  }

  test("cms: estimates never undercount and the probe list is the true top-10") {
    val rows = StatsOps.cmsTopK(spark, sf).collect()
    assert(rows.length === 10)
    for (r <- rows) {
      val (t, e, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e >= t)            // the defining CMS inequality
      assert(over === e - t)
    }
    val wantTop = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).count()
      .orderBy(col("count").desc, col("l_partkey")).limit(10)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === wantTop.toSeq)
  }

  test("theil-sen: slope equals the driver-side lower median of pairwise slopes") {
    val r = StatsOps.theilSen(spark, sf).collect()(0)
    val (m, slope) = (r.getLong(0), r.getDouble(1))
    val series = Round9Fixtures.hourlySeries(spark, sf).sortBy(_._1)
      .take(336).map(_._2)
    val slopes = (for {
      i <- series.indices; j <- (i + 1) until series.length
    } yield (series(j) - series(i)).toDouble / (j - i)).sorted
    assert(m === slopes.length)
    val want = slopes(((m + 1) / 2 - 1).toInt) // lower median, 1-based -> 0-based
    assert(math.abs(slope - want) <= 5e-7) // op rounds to 6 dp
  }

  test("ratio to report: shares within each region sum to one (ppm rounding slack)") {
    val rows = Windows.ratioToReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    for ((region, grp) <- rows.groupBy(_._1)) {
      val sumPpm = grp.map(_._3).sum
      assert(math.abs(sumPpm - 1000000L) <= grp.length,
        s"region $region shares sum to $sumPpm")
      assert(grp.forall(g => g._3 >= 0 && g._3 <= 1000000L))
    }
  }

  test("pareto frontier: rows are undominated and non-rows are dominated (per brand)") {
    val frontier = Windows.paretoFrontier(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val all = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long"), col("p_size").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def dominates(a: (String, Long, Long, Long), b: (String, Long, Long, Long)): Boolean =
      a._3 <= b._3 && a._4 >= b._4 && (a._3 < b._3 || a._4 > b._4)
    val fset = frontier.map(f => (f._1, f._2)).toSet
    for (f <- frontier; o <- all if o._1 == f._1 && o._2 != f._2)
      assert(!dominates(o, f) ||
        // exact-duplicate (price,size) points: first key wins by contract
        (o._3 == f._3 && o._4 == f._4 && o._2 > f._2),
        s"$o dominates frontier row $f")
    for (o <- all if !fset.contains((o._1, o._2)))
      assert(all.exists(a => a._1 == o._1 && a._2 != o._2 &&
        (dominates(a, o) || (a._3 == o._3 && a._4 == o._4 && a._2 < o._2))),
        s"non-frontier $o is undominated")
  }

  test("peer z-score: top row replays from its group's leave-one-out moments") {
    val top = Windows.peerZscore(spark, sf).collect()(0)
    val (rf, ls, x, z) =
      (top.getString(2), top.getString(3), top.getLong(4), top.getDouble(5))
    val grp = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === rf && col("l_linestatus") === ls)
      .select(col("l_quantity").cast("long")).collect().map(_.getLong(0))
    val n = grp.length
    val others = BigInt(grp.sum) - x
    val looMean = others.toDouble / (n - 1)
    val ss = grp.map(v => BigInt(v) * v).sum - BigInt(x) * x
    val looVar = ss.toDouble / (n - 1) - looMean * looMean
    val want = (x - looMean) / math.sqrt(looVar)
    assert(math.abs(z - want) <= 5e-7)
  }

  test("edit-distance join: exactly the brute-force distance<=1 pairs, first 20") {
    val got = Joins.editDistanceJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val names = Tables.customer(spark, sf).select(col("c_name")).collect()
      .map(_.getString(0)).sorted
    def dist1(a: String, b: String): Boolean =
      a.length == b.length && a.zip(b).count { case (x, y) => x != y } == 1
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if dist1(names(i), names(j))
    } yield (names(i), names(j), 1L)).sorted.take(20)
    assert(got.toSeq === want)
  }

  test("readability: formula replays from the reported integer sums") {
    val rows = TextAnalysis.readability(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    for (r <- rows) {
      val (w, s, y, milli) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(w > 0 && s > 0 && y > 0)
      val want = math.round(1000.0 *
        (206.835 - 1.015 * w.toDouble / s - 84.6 * y.toDouble / w))
      assert(milli === want)
    }
  }

  test("vector arith: sources excluded, ranks dense, top-1 replays in the driver") {
    val rows = Similarity.vectorArith(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === (1L to 5L))
    assert(rows.forall(r => !Set(0L, 1L, 2L).contains(r._2)))
    assert(rows.forall(r => r._3 >= -1.000001 && r._3 <= 1.000001))
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = emb(0L).indices.map(i => emb(0L)(i) - emb(1L)(i) + emb(2L)(i)).toArray
    def cos(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      s / math.sqrt(na * nb)
    }
    val want = emb.keys.filterNot(Set(0L, 1L, 2L)).toSeq
      .map(id => (cos(q, emb(id)), id)).sortBy { case (c, id) => (-c, id) }.head._2
    assert(rows(0)._2 === want)
  }

  test("bipartite projection: weights bounded by degrees, jaccard replays") {
    val rows = GraphOps.bipartiteProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    val deg = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((a, b, w, j) <- rows) {
      assert(a < b && w >= 1)
      assert(w <= math.min(deg(a), deg(b)))
      assert(j === math.round(1e6 * w.toDouble / (deg(a) + deg(b) - w)))
    }
    // descending weight with keyed tiebreak
    assert(rows.sortBy(r => (-r._3, r._1, r._2)).toSeq === rows.toSeq)
  }

  test("late dim: counts partition the facts; backfill completes the dimension") {
    val rows = WarehouseEtl.lateDim(spark, sf).collect()
    val facts = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === facts)
    for (r <- rows) {
      val (n, m, bf, unk) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m + bf + unk === n) // every fact lands in exactly one bucket
      assert(unk === 0L)         // load 2 completes the dimension
    }
    val lateFacts = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 97 === 0).count()
    assert(rows.map(_.getLong(3)).sum === lateFacts)
  }

  test("benford: digits partition the rows; expected ppm replays log10; dev is the gap") {
    val rows = StatsOps.benford(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    val total = Tables.orders(spark, sf)
      .filter(round(col("o_totalprice") * 100) > 0).count()
    assert(rows.map(_._2).sum === total)
    assert(math.abs(rows.map(_._3).sum - 1000000L) <= rows.length)
    for ((d, _, obs, exp, dev) <- rows) {
      assert(exp === math.round(1e6 * math.log10(1.0 + 1.0 / d)))
      assert(dev === obs - exp)
    }
  }

  test("periodogram: power replays from a driver-side DFT at each candidate period") {
    val rows = TimeSeries.periodogram(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(12L, 24L, 168L))
    val series = Round9Fixtures.hourlySeries(spark, sf).sortBy(_._1).map(_._2)
    val mean = series.sum.toDouble / series.length
    for (r <- rows) {
      val p = r.getLong(0)
      var a = 0L; var b = 0L; var s2 = 0L
      for ((n, t) <- series.zipWithIndex) {
        val xc = n - mean
        val th = 2.0 * math.Pi * t / p
        a += math.round(1e6 * xc * math.cos(th))
        b += math.round(1e6 * xc * math.sin(th))
        s2 += math.round(1e6 * xc * xc)
      }
      val want = math.round(1e6 *
        (a.toDouble * a + b.toDouble * b) / (series.length.toDouble * s2 * 1e6))
      assert(r.getLong(2) === want)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000001L)
    }
  }

  test("segment migration: flows partition the spender population; boundaries real") {
    val rows = Analytics.segmentMigration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!rows.exists(r => r._1 == 0 && r._2 == 0)) // (absent, absent) impossible
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 5 && r._2 >= 0 && r._2 <= 5))
    // flows partition the customers active in either half
    val activeEither = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._3).sum === activeEither)
  }

  test("hdr percentiles: estimate is the bucket floor of truth, within 1/16 relative") {
    val rows = StatsOps.hdrPercentiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(50L, 95L, 99L))
    for ((_, est, exact, err) <- rows) {
      assert(est <= exact)                      // lower bucket bound never overshoots
      assert((exact - est).toDouble / exact <= 1.0 / 16 + 1e-9) // HDR error contract
      assert(err === math.round(1e6 * (est - exact).toDouble / exact))
    }
  }

  test("cdc chunking: totals replay; boundary rate near the 1/64 design point") {
    val r = Dedup.cdcChunking(spark, sf).collect()(0)
    val (nDocs, nChunks, nSh, avgMilli, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nDocs === Tables.documents(spark, sf).count())
    assert(nChunks >= nDocs)                    // every doc has >= 1 chunk
    assert(avgMilli === 1000 * nSh / nChunks)
    assert(ppm === math.round(1e6 * (nChunks - nDocs).toDouble / nSh))
    // observed boundary rate should sit in a loose band around 1/64
    assert(ppm > 15625 / 4 && ppm < 15625 * 4, s"boundary ppm $ppm far from design")
  }

  test("stl decomposition: trend + seasonal + remainder reconstructs every bin exactly") {
    val rows = TimeSeries.stlDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, tr, se, rem) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tr + se + rem === 1000000L * n) // additive decomposition is exact
    }
    // seasonal is a pure hour-of-day profile: one value per hour
    val byHod = rows.groupBy(_.getString(0).substring(11, 13)).values
    for (grp <- byHod) assert(grp.map(_.getLong(3)).distinct.length === 1)
  }

  test("rake: phrases capped at 5 tokens, stopword-free, scores replay") {
    val rows = TextAnalysis.rakeKeywords(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10)
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val stop = words.distinct().groupBy(col("w")).count()
      .orderBy(col("count").desc, col("w")).limit(20)
      .collect().map(_.getString(0)).toSet
    for ((phrase, nWords, occ, score) <- rows) {
      val ws = phrase.split(" ")
      assert(nWords >= 1 && nWords <= 5 && ws.length === nWords.toInt)
      assert(ws.forall(w => !stop.contains(w)), s"stopword inside phrase '$phrase'")
      assert(occ >= 1 && score > 0)
    }
    // descending score with phrase tiebreak
    assert(rows.sortBy(r => (-r._4, r._1)).toSeq === rows.toSeq)
  }

  test("windowed top-k: ranks dense, counts non-increasing, bounded by window total") {
    val rows = Streams.topkWindowBatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val totals = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours"), col("event_type")).count()
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"), col("count"))
      .collect().groupBy(_.getString(0)).map { case (k, v) => k -> v.map(_.getLong(1)).sum }
    for ((win, grp0) <- rows.groupBy(_._1)) {
      val grp = grp0.sortBy(_._2)
      assert(grp.map(_._2).toSeq === (1L to grp.length))
      assert(grp.length <= 3)
      // counts non-increasing down the ranks
      assert(grp.map(_._4).toSeq === grp.map(_._4).sortBy(-_).toSeq)
      assert(grp.map(_._4).sum <= totals(win))
    }
  }

  // --- ML-eval suite: the metrics must agree with a driver-side
  // replay over the same scored pool, and obey their defining
  // inequalities. The pool replay recomputes (y, p_u) independently.
  private def scoredPool: Array[(Long, Long)] = {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
    rows.map { r =>
      val label = r.getInt(1).toLong
      val emb = r.getSeq[Float](2)
      val logitU = emb.take(8).map(v => math.round(v.toDouble * 1e6)).sum
      val p = 1e6 / (1d + math.exp(-6.0d * logitU.toDouble / 1000000.0d))
      val pU = math.max(1L, math.min(999999L, math.round(p)))
      (label % 2, pU)
    }
  }

  test("ml_confusion: cells partition the pool and match a driver replay") {
    val r = MlEval.confusion(spark, sf).collect()(0)
    val (n, tp, fp, tn, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val pool = scoredPool
    assert(n === pool.length && tp + fp + tn + fn === n)
    assert(tp === pool.count(x => x._2 >= 500000L && x._1 == 1L))
    assert(fp === pool.count(x => x._2 >= 500000L && x._1 == 0L))
    assert(r.getLong(5) === math.round(1e6 * tp.toDouble / (tp + fp)))
    assert(r.getLong(7) === math.round(2e6 * tp.toDouble / (2 * tp + fp + fn)))
  }

  test("ml_auc: histogram midrank AUC equals the O(n^2) pairwise definition") {
    val r = MlEval.auc(spark, sf).collect()(0)
    val pool = scoredPool
    val pos = pool.filter(_._1 == 1L).map(_._2)
    val neg = pool.filter(_._1 == 0L).map(_._2)
    assert(r.getLong(0) === pos.length.toLong && r.getLong(1) === neg.length.toLong)
    // exact pairwise: wins + half-ties over all pos x neg pairs
    val u2 = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val want = math.round(1e6 * u2.toDouble / (2.0d * pos.length * neg.length))
    assert(r.getLong(2) === want)
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
  }

  test("ml_pr_thresholds: 9 rows, monotone counts, capture bounded") {
    val rows = MlEval.prThresholds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (1 to 9).map(_ * 100000L))
    // predicted-positive and tp both shrink as the threshold rises
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(-_).toSeq)
    assert(rows.forall(x => x._3 <= x._2))
  }

  test("ml_calibration: bins partition the pool; means live inside their bin") {
    val rows = MlEval.calibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val pool = scoredPool
    assert(rows.map(_._2).sum === pool.length.toLong)
    assert(rows.map(_._3).sum === pool.count(_._1 == 1L).toLong)
    for ((bin, _, _, meanPred, fracPos) <- rows) {
      assert(meanPred >= bin * 100000L && meanPred <= (bin + 1) * 100000L)
      assert(fracPos >= 0L && fracPos <= 1000000L)
    }
  }

  test("ml_brier_logloss: matches a per-row driver replay; bounds hold") {
    val r = MlEval.brierLogloss(spark, sf).collect()(0)
    val pool = scoredPool
    val sb = pool.map { case (y, pU) =>
      val e = pU.toDouble / 1000000.0d
      math.round(1e6 * (e - y) * (e - y))
    }.sum
    val sl = pool.map { case (y, pU) =>
      val e = pU.toDouble / 1000000.0d
      math.round(-1e6 * (if (y == 1L) math.log(e) else math.log(1d - e)))
    }.sum
    assert(r.getLong(0) === pool.length.toLong)
    assert(r.getLong(1) === math.round(sb.toDouble / pool.length))
    assert(r.getLong(2) === math.round(sl.toDouble / pool.length))
    assert(r.getLong(1) >= 0L && r.getLong(1) <= 1000000L) // Brier in [0,1]
    assert(r.getLong(2) >= 0L)
  }

  test("ml_gain_deciles: counts partition, capture monotone to 1e6") {
    val rows = MlEval.gainDeciles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val pool = scoredPool
    assert(rows.map(_._1).toSeq === (1L to 10L))
    assert(rows.map(_._2).sum === pool.length.toLong)
    assert(rows.map(_._3).sum === pool.count(_._1 == 1L).toLong)
    // cumulative capture is non-decreasing and ends at exactly 100%
    assert(rows.map(_._4).toSeq === rows.map(_._4).sorted.toSeq)
    assert(rows.last._4 === 1000000L)
    // deciles are near-equal cuts (first 9 differ by at most 1 row)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1L)
  }

  test("ml_fairness_audit: groups partition the pool; gaps replay from the rows") {
    val rows = MlEval.fairnessAudit(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === scoredPool.length.toLong)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    val sel = rows.filterNot(_.isNullAt(2)).map(_.getLong(2))
    val tpr = rows.filterNot(_.isNullAt(3)).map(_.getLong(3))
    rows.foreach { r =>
      assert(r.getLong(5) === sel.max - sel.min) // dp gap replays
      assert(r.getLong(6) === tpr.max - tpr.min) // eo gap replays
    }
    (sel ++ tpr).foreach(v => assert(v >= 0L && v <= 1000000L))
  }

  test("ml_psi_drift: bins conserve the cohorts; PSI is the contrib sum, nonneg") {
    val rows = MlEval.psiDrift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0L to 9L))
    val pool = scoredPool
    assert(rows.map(_._2).sum + rows.map(_._3).sum === pool.length.toLong)
    // smoothed PSI terms (p-q)ln(p/q) are individually nonnegative
    rows.foreach(r => assert(r._4 >= 0L))
    rows.foreach(r => assert(r._5 === rows.map(_._4).sum))
  }

  test("ml_target_encode: every row replays the LOO and smoothed formulas") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100.0d).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val grp = base.groupBy(_._2).map { case (s, xs) =>
      s -> (xs.map(_._3).sum, xs.length.toLong)
    }
    val (sAll, nAll) = (base.map(_._3).sum, base.length.toLong)
    val want = base.map { case (k, s, y) =>
      val (sg, n) = grp(s)
      val loo = if (n > 1) math.round((sg - y).toDouble / (n - 1))
                else math.round((sAll - y).toDouble / (nAll - 1))
      val sm = math.round(((sg - y).toDouble + 10.0d * sAll.toDouble / nAll) /
        (n - 1 + 10).toDouble)
      (k, s, n, loo, sm)
    }.sortBy(_._1).toSeq
    val got = MlEval.targetEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === want)
  }

  test("ts_backtest_smape: MAE and sMAPE replay from the spine; n_eval = len - h") {
    val series = graft.operators.TimeSeries
      .hourlyCounts(spark, sf).orderBy(col("bin")).collect().map(_.getLong(1))
    val rows = TimeSeries.backtestSmape(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 24L, 168L))
    rows.foreach { case (h, nEval, mae, smape) =>
      val pairs = series.drop(h.toInt).zip(series.dropRight(h.toInt))
      assert(nEval === pairs.length.toLong)
      val sae = pairs.map { case (x, f) => math.abs(x - f) }.sum
      assert(mae === math.round(1e3 * sae.toDouble / pairs.length))
      val ssm = pairs.map { case (x, f) =>
        if (x + f > 0) math.round(2e6 * math.abs(x - f).toDouble / (x + f)) else 0L
      }.sum
      assert(smape === math.round(ssm.toDouble / pairs.length))
      assert(smape >= 0L && smape <= 2000000L)
    }
  }

  test("etl_k_anonymity: audit replays from a driver-side class census") {
    val cls = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0d).cast("long"),
        round(col("c_acctbal") * 100.0d).cast("long"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)), r.getLong(3)))
      .groupBy(_._1).toSeq.map { case (_, xs) =>
        (xs.length.toLong, xs.map(_._2).distinct.length.toLong)
      }
    val r = MlEvalKAnonReplay.check(WarehouseEtl.kAnonymity(spark, sf).collect()(0), cls)
    assert(r)
  }

  test("etl_fd_screen: FK and hierarchy dependencies hold; verdicts match ratios") {
    val rows = WarehouseEtl.fdScreen(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6))))
      .toMap
    assert(rows.size === 6)
    assert(rows(("customer", "c_custkey", "c_nationkey"))._3) // FK: key → attr
    assert(rows(("nation", "n_nationkey", "n_regionkey"))._3) // hierarchy
    rows.values.foreach { case (nLhs, nPairs, holds, vppm) =>
      assert(nPairs >= nLhs)
      assert(holds === (nPairs == nLhs))
      assert(holds === (vppm == 0L))
      assert(vppm >= 0L)
    }
  }

  test("ml_cuped: theta and adjusted means replay from per-user (x, y) pairs") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        round(col("value") * 100.0d).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val users = evs.groupBy(_._1).toSeq.map { case (u, xs) =>
      (u, xs.filter(_._2 < mid).map(_._3).sum, xs.filter(_._2 >= mid).map(_._3).sum)
    }
    val n = users.length.toDouble
    val (sx, sy) = (users.map(_._2).sum.toDouble, users.map(_._3).sum.toDouble)
    val sxy = users.map(t => BigInt(t._2) * BigInt(t._3)).sum.toDouble
    val sxx = users.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
    val covXY = sxy - sx * sy / n
    val varX = sxx - sx * sx / n
    val theta = if (varX > 0) covXY / varX else 0.0
    val a = users.filter(_._1 % 2 == 0)
    val adjA = a.map(_._3).sum.toDouble / a.length -
      theta * (a.map(_._2).sum.toDouble / a.length - sx / n)
    val r = MlEval.cuped(spark, sf).collect()(0)
    assert(r.getLong(0) === a.length.toLong)
    assert(r.getLong(4) === math.round(10.0 * adjA))
    assert(r.getLong(6) === math.round(1e3 * theta))
    assert(r.getLong(7) >= 0L && r.getLong(7) <= 1000000L) // rho^2 in [0,1]
  }

  test("ml_did: the 2x2 cells partition the events; DiD replays") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        round(col("value") * 100.0d).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    def cell(t: Boolean, p: Boolean) =
      evs.filter(e => (e._1 % 2 == 1) == t && (e._2 >= mid) == p)
    val r = MlEval.did(spark, sf).collect()(0)
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) === evs.length.toLong)
    def m(t: Boolean, p: Boolean) = {
      val c = cell(t, p); c.map(_._3).sum.toDouble / c.length
    }
    val didWant = (m(true, true) - m(true, false)) - (m(false, true) - m(false, false))
    assert(r.getLong(8) === math.round(10.0 * didWant))
  }

  test("ml_conformal: q_hat is the exact order statistic; coverage replays") {
    val pool = scoredPoolWithId
    val cal = pool.filter(_._1 % 4 < 2).map(t => math.abs(1000000L * t._2 - t._3)).sorted
    val test0 = pool.filter(_._1 % 4 >= 2).map(t => math.abs(1000000L * t._2 - t._3))
    val k = ((cal.length + 1) * 9 + 9) / 10
    val qHat = cal(math.min(k, cal.length) - 1)
    val r = MlEval.conformal(spark, sf).collect()(0)
    assert(r.getLong(0) === cal.length.toLong && r.getLong(1) === test0.length.toLong)
    assert(r.getLong(2) === k.toLong)
    assert(r.getLong(3) === qHat)
    assert(r.getLong(4) === test0.count(_ <= qHat).toLong)
    // conformal guarantee direction: empirical coverage near/above 1 - alpha
    assert(r.getLong(5) >= 800000L)
  }

  test("ml_propensity_match: nearest-score match and SMDs replay") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), element_at(col("embedding"), 1).cast("double"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toMap
    val pool = scoredPoolWithId.map(t => (t._1, t._3, emb(t._1)))
    val treated = pool.filter(_._1 % 2 == 1)
    val ctrl = pool.filter(_._1 % 2 == 0)
    val byScore = ctrl.groupBy(_._2).toSeq
      .map { case (p, xs) =>
        p -> math.round(xs.map(_._3).sum.toDouble / xs.length)
      }.toMap
    val cScores = byScore.keys.toArray.sorted
    def nearest(p: Long): Long = {
      val i = java.util.Arrays.binarySearch(cScores, p)
      if (i >= 0) p
      else {
        val ins = -i - 1
        val b = if (ins > 0) Some(cScores(ins - 1)) else None
        val f = if (ins < cScores.length) Some(cScores(ins)) else None
        (b, f) match {
          case (Some(bb), Some(ff)) => if (p - bb <= ff - p) bb else ff
          case (Some(bb), None) => bb
          case (None, Some(ff)) => ff
          case _ => fail("no controls")
        }
      }
    }
    val gaps = treated.map(t => math.abs(t._2 - nearest(t._2)))
    val r = MlEval.propensityMatch(spark, sf).collect()(0)
    assert(r.getLong(0) === treated.length.toLong && r.getLong(1) === ctrl.length.toLong)
    assert(r.getLong(2) === math.round(gaps.sum.toDouble / treated.length))
    def smd(xs: Array[Long], ys: Array[Long]): Double = {
      def mv(a: Array[Long]) = {
        val m = a.sum.toDouble / a.length
        (m, a.map(v => BigInt(v) * BigInt(v)).sum.toDouble / a.length - m * m)
      }
      val ((mx, vx), (my, vy)) = (mv(xs), mv(ys))
      (mx - my) / math.sqrt((vx + vy) / 2.0)
    }
    val before = smd(treated.map(_._3), ctrl.map(_._3))
    val after = smd(treated.map(_._3), treated.map(t => byScore(nearest(t._2))))
    assert(r.getLong(3) === math.round(1e3 * before))
    assert(r.getLong(4) === math.round(1e3 * after))
  }

  test("agg_anova: F replays from per-group exact moments; decomposition holds") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_mktsegment"), round(col("c_acctbal") * 100.0d).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups: Seq[Seq[(String, Long)]] = rows.groupBy(_._1).values.toSeq.map(_.toSeq)
    val (k, n) = (groups.length, rows.length)
    val s = rows.map(_._2).sum
    def ssbTerm(g: Seq[(String, Long)]): Long = {
      val (ng, sg) = (g.length.toDouble, g.map(_._2).sum.toDouble)
      math.round(1e3 * (sg * sg / ng - 2.0 * sg * s / n +
        ng * s.toDouble * s.toDouble / (n.toDouble * n.toDouble)))
    }
    def sswTerm(g: Seq[(String, Long)]): Long = {
      val (ng, sg) = (g.length.toDouble, g.map(_._2).sum.toDouble)
      val qg = g.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
      math.round(1e3 * (qg - sg * sg / ng))
    }
    val ssb: Long = groups.map(ssbTerm).sum
    val ssw: Long = groups.map(sswTerm).sum
    val r = StatsOps.anova(spark, sf).collect()(0)
    assert(r.getLong(0) === k.toLong && r.getLong(1) === n.toLong)
    assert(r.getLong(2) === ssb && r.getLong(3) === ssw)
    assert(r.getLong(4) === math.round(1e3 * (ssb.toDouble / (k - 1)) / (ssw.toDouble / (n - k))))
    // eta^2 in [0, 1e6]; SSB + SSW reassemble SST within quantization slack
    assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
  }

  test("ml_decision_stump: the reported split is the sweep's argmin and counts partition") {
    val pool = Tables.embeddings(spark, sf)
      .select(col("label"), element_at(col("embedding"), 1).cast("double"))
      .collect().map(r => (r.getInt(0).toLong % 2, math.round(r.getDouble(1) * 1e3)))
    val hist = pool.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.length.toLong, xs.map(_._1).sum) }
    val (n, pos) = (pool.length.toLong, pool.map(_._1).sum)
    var (nl, pl) = (0L, 0L)
    val sweep = hist.dropRight(1).map { case (b, nb, pb) =>
      nl += nb; pl += pb
      val (nr, pr) = (n - nl, pos - pl)
      val cost = math.round(1e3 * (pl.toDouble * (nl - pl) / nl +
        pr.toDouble * (nr - pr) / nr))
      (cost, b, nl, pl, nr, pr)
    }
    val best = sweep.minBy(t => (t._1, t._2))
    val r = MlEval.decisionStump(spark, sf).collect()(0)
    assert(r.getLong(0) === best._2 && r.getLong(1) === best._1)
    assert(r.getLong(2) === best._3 && r.getLong(3) === best._4)
    assert(r.getLong(4) === best._5 && r.getLong(5) === best._6)
    assert(r.getLong(2) + r.getLong(4) === n) // the split partitions the pool
    // majority-vote accuracy can never fall below the base rate
    val base = math.max(pos, n - pos).toDouble / n
    assert(r.getLong(6) >= math.round(1e6 * base) - 1L)
  }

  test("ml_kfold_cv: folds partition the pool; per-fold AUC equals the pairwise definition") {
    val pool = scoredPoolWithId
    val r = MlEval.kfoldCv(spark, sf).collect()
    assert(r.map(_.getLong(1)).sum === pool.length.toLong)
    r.foreach { row =>
      val fold = row.getLong(0)
      val fp = pool.filter(_._1 % 5 == fold)
      val posS = fp.filter(_._2 == 1L).map(_._3)
      val negS = fp.filter(_._2 == 0L).map(_._3)
      val wins = (for (p <- posS; q <- negS)
        yield if (p > q) 2L else if (p == q) 1L else 0L).sum
      val want = math.round(1e6 * wins.toDouble / (2.0 * posS.length * negS.length))
      assert(row.getLong(3) === want, s"fold $fold AUC")
      // mean log-loss of a clamped probability is positive and finite
      assert(row.getLong(4) > 0L && row.getLong(4) < 14000000L)
    }
  }

  test("agg_bootstrap_ci: replicate means replay from the portable hash; CI ordered") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100.0d).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    def weight(key: Long, b: Long): Long = {
      val u = Round10OpsHash.idHash(s"$key:$b")
      val k = ts.indexWhere(u < _)
      if (k < 0) 8L else k.toLong
    }
    val means = (0L until 64L).map { b =>
      var (nb, sb) = (0L, BigInt(0))
      orders.foreach { case (k, c) =>
        val w = weight(k, b); nb += w; sb += BigInt(w) * c
      }
      math.round(10.0 * sb.toDouble / nb)
    }.sorted
    val r = StatsOps.bootstrapCi(spark, sf).collect()(0)
    assert(r.getLong(0) === orders.length.toLong && r.getLong(1) === 64L)
    assert(r.getLong(2) === math.round(10.0 * orders.map(_._2).sum.toDouble / orders.length))
    assert(r.getLong(3) === means(1)) // rank 2 of 64
    assert(r.getLong(4) === means(62)) // rank 63 of 64
    assert(r.getLong(3) <= r.getLong(4))
    val sm = means.sum.toDouble
    val smm = means.map(m => BigInt(m) * BigInt(m)).sum.toDouble
    assert(r.getLong(5) === math.round(math.sqrt((smm - sm * sm / 64) / 63.0)))
  }

  test("ts_xcorr: 25 lags; r(0) replays Pearson on the shared spine; counts shrink by lag") {
    val rows = TimeSeries.xcorr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (0L to 24L))
    val len = rows.head._2
    rows.foreach { case (lag, np, rm) =>
      assert(np === len - lag)
      assert(rm >= -1000L && rm <= 1000L)
    }
    // independent replay of r(0) from the binned series
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(date_trunc("hour", col("ts")), col("event_type"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)))
    val byHour = ev.groupBy(_._1)
    val (lo, hi) = (ev.map(_._1).min, ev.map(_._1).max)
    val series = (lo to hi by 3600000L).map { h =>
      val xs = byHour.getOrElse(h, Array.empty[(Long, String)])
      (xs.count(_._2 == "click").toLong, xs.count(_._2 == "purchase").toLong)
    }
    assert(len === series.length.toLong)
    val n = series.length.toDouble
    val (sx, sy) = (series.map(_._1).sum.toDouble, series.map(_._2).sum.toDouble)
    val sxy = series.map(t => BigInt(t._1) * BigInt(t._2)).sum.toDouble
    val sxx = series.map(t => BigInt(t._1) * BigInt(t._1)).sum.toDouble
    val syy = series.map(t => BigInt(t._2) * BigInt(t._2)).sum.toDouble
    val want = math.round(1e3 * (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert(rows.head._3 === want)
  }

  test("graph_random_walk: every hop follows a real edge chosen by the hash rank") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sorted }
    val byOrder = li.groupBy(_._2).map { case (o, xs) => o -> xs.map(_._1).sorted }
    val rows = GraphOps.randomWalk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val starts = byPart.toSeq.map { case (p, os) => (p, os.length) }
      .sortBy { case (p, d) => (-d, p) }.take(20).map(_._1).toSet
    assert(rows.map(_._1).toSet === starts && rows.length === 160)
    rows.foreach { case (p, w, o, p2) =>
      val orders = byPart(p)
      val rn = (Round10OpsHash.idHash(s"$p:$w:h1") % orders.length).toInt
      assert(orders(rn) === o, s"hop1 of ($p, walk $w)")
      val parts = byOrder(o)
      val rn2 = (Round10OpsHash.idHash(s"$o:$w:h2") % parts.length).toInt
      assert(parts(rn2) === p2, s"hop2 of ($p, walk $w)")
    }
  }

  test("etl_data_vault: hub counts match the tables; hub keys are unique; checksum replays") {
    val rows = WarehouseEtl.dataVault(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf).count()
    val m = rows.map(t => t._1 -> t).toMap
    assert(m("hub_customer")._2 === nCust && m("hub_customer")._3 === nCust)
    assert(m("hub_order")._2 === nOrd && m("hub_order")._3 === nOrd)
    assert(m("link_order_customer")._2 === nOrd && m("link_order_customer")._3 === nOrd)
    assert(m("sat_customer")._2 === nCust)
    val want = Tables.customer(spark, sf).select(col("c_custkey")).collect()
      .map(r => Round10OpsHash.idHash(r.getLong(0).toString))
      .reduce(_ ^ _)
    assert(m("hub_customer")._4 === want)
  }

  test("text_naive_bayes: the confusion matrix replays a full driver-side NB") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .map { case (id, lang, text) =>
        (id, lang, text.split(" ").filter(_.nonEmpty),
          Round10OpsHash.idHash(id.toString) % 4 < 3)
      }
    val train = docs.filter(_._4)
    val vocab = train.flatMap(_._3).groupBy(identity).toSeq
      .map { case (t, xs) => (t, xs.length) }
      .sortBy { case (t, n) => (-n, t) }.take(128).map(_._1).toSet
    val classes = train.map(_._2).distinct.sorted
    val nC = train.groupBy(_._2).map { case (c, xs) => c -> xs.length }
    val cnt = train.flatMap(d => d._3.filter(vocab).map(t => (t, d._2)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val tokC = classes.map(c => c -> cnt.collect { case ((_, cc), n) if cc == c => n }.sum).toMap
    def lpU(t: String, c: String): Long =
      math.round(1e6 * math.log((cnt.getOrElse((t, c), 0L) + 1).toDouble / (tokC(c) + 128)))
    val prU = classes.map(c =>
      c -> math.round(1e6 * math.log(nC(c).toDouble / train.length))).toMap
    val cells = docs.filter(!_._4).map { d =>
      val scores = classes.map(c =>
        c -> (prU(c) + d._3.filter(vocab).map(lpU(_, c)).sum))
      val pred = scores.minBy { case (c, s) => (-s, c) }._1
      (d._2, pred)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = TextAnalysis.naiveBayes(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === cells)
  }

  test("ml_logreg_gd: three fixed-point GD steps replay exactly; training helps") {
    val pool = Tables.embeddings(spark, sf)
      .select(col("label"), element_at(col("embedding"), 1).cast("double"),
        element_at(col("embedding"), 2).cast("double"))
      .collect().map(r => (r.getInt(0).toLong % 2,
        math.round(r.getDouble(1) * 1e6), math.round(r.getDouble(2) * 1e6)))
    val n = pool.length
    def sigma(w: (Long, Long, Long), x1: Long, x2: Long): Double =
      1.0 / (1.0 + math.exp(-(w._1 / 1e6 + w._2 / 1e6 * (x1 / 1e6) +
        w._3 / 1e6 * (x2 / 1e6))))
    def step(w: (Long, Long, Long)): (Long, Long, Long) = {
      var (g0, g1, g2) = (0L, 0L, 0L)
      pool.foreach { case (y, x1, x2) =>
        val r = sigma(w, x1, x2) - y
        g0 += Round10OpsHash.rnd(1e6 * r)
        g1 += Round10OpsHash.rnd(1e6 * r * (x1 / 1e6))
        g2 += Round10OpsHash.rnd(1e6 * r * (x2 / 1e6))
      }
      (w._1 - Round10OpsHash.rnd(g0.toDouble / n), w._2 - Round10OpsHash.rnd(g1.toDouble / n),
        w._3 - Round10OpsHash.rnd(g2.toDouble / n))
    }
    val w = step(step(step((0L, 0L, 0L))))
    val correct = pool.count { case (y, x1, x2) => (sigma(w, x1, x2) >= 0.5) == (y == 1L) }
    val r = MlEval.logregGd(spark, sf).collect()(0)
    assert(r.getLong(0) === n.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === w)
    assert(r.getLong(4) === math.round(1e6 * correct.toDouble / n))
    // trained accuracy must beat the w=0 coin flip on this separable-ish pool
    assert(r.getLong(4) >= 500000L)
    assert(r.getLong(5) > 0L && r.getLong(5) < 693148L) // below the w=0 logloss ln2
  }

  test("agg_permutation_test: replicate diffs replay from the hash relabeling") {
    val pool = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("event_type") === "click",
        round(col("value") * 100.0d).cast("long"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val (n1, n2) = (pool.count(_._2).toLong, pool.count(!_._2).toLong)
    val s1 = pool.filter(_._2).map(_._3).sum
    val s2 = pool.filter(!_._2).map(_._3).sum
    val dObs = math.abs(s1.toDouble / n1 - s2.toDouble / n2)
    val diffs = (0L until 64L).flatMap { b =>
      var (m1, t1, m2, t2) = (0L, 0L, 0L, 0L)
      pool.foreach { case (id, _, c) =>
        val u = Round10OpsHash.idHash(s"$id:$b")
        if (BigInt(u) * (n1 + n2) < (BigInt(n1) << 32)) { m1 += 1; t1 += c }
        else { m2 += 1; t2 += c }
      }
      if (m1 > 0 && m2 > 0) Some(math.abs(t1.toDouble / m1 - t2.toDouble / m2))
      else None
    }
    val nGe = diffs.count(_ >= dObs).toLong
    val r = StatsOps.permutationTest(spark, sf).collect()(0)
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    assert(r.getLong(2) === diffs.length.toLong)
    assert(r.getLong(3) === math.round(10.0 * dObs))
    assert(r.getLong(4) === nGe)
    assert(r.getLong(5) === math.round(1e6 * (nGe + 1.0) / (diffs.length + 1.0)))
  }

  test("mm_jpeg_header: a real while-loop marker parser agrees on every document") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def synth(docId: Long, nChars: Long): Array[Byte] = {
      val bb = scala.collection.mutable.ArrayBuffer[Int]()
      def be16(v: Int): Unit = { bb += (v >> 8) & 0xff; bb += v & 0xff }
      bb ++= Seq(0xff, 0xd8)                      // SOI
      bb ++= Seq(0xff, 0xe0); be16(16)            // APP0
      bb ++= "JFIF".getBytes.map(_.toInt); bb += 0
      bb ++= Seq(0x01, 0x01, 0x00); be16(1); be16(1); bb ++= Seq(0, 0)
      val m = (1 + nChars % 13).toInt             // COM
      bb ++= Seq(0xff, 0xfe); be16(m + 2)
      (1 to m).foreach(_ => bb += (65 + docId % 26).toInt)
      bb ++= Seq(0xff, 0xc0); be16(17); bb += 8   // SOF0
      be16((1 + nChars % 997).toInt); be16((1 + docId % 1499).toInt)
      bb += 3; bb ++= Seq(0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
      bb ++= Seq(0xff, 0xd9)                      // EOI
      bb.map(_.toByte).toArray
    }
    // an INDEPENDENT unbounded while-loop marker walk (the parser the
    // unrolled codegen walk must agree with)
    def parse(b: Array[Byte]): (Long, Long, Long, Long, Long) = {
      def u8(i: Int) = b(i).toInt & 0xff
      def u16(i: Int) = u8(i) * 256 + u8(i + 1)
      var p = 2
      while (!(u8(p) == 0xff && Set(0xc0, 0xc1, 0xc2)(u8(p + 1))))
        p += 2 + u16(p + 2)
      (p + 1L, u8(p + 4).toLong, u16(p + 5).toLong, u16(p + 7).toLong, u8(p + 9).toLong)
    }
    val want = docs.map { case (id, nc) => id -> parse(synth(id, nc)) }.toMap
    val got = Multimodal.jpegHeader(spark, sf).collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      assert(r.getBoolean(1), s"doc ${r.getLong(0)} sof not found")
      val w = want(r.getLong(0))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) === w)
    }
  }

  test("sim_hybrid_rrf: fusion replays from independent dense and lexical rankings") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb) // algebraically equal; ranking robust to ulps here
    }
    val toks = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSet))
      .toMap
    val vecs = emb.toMap
    val queries = emb.map(_._1).filter(_ < 5).sorted
    val want = queries.flatMap { qid =>
      val dense = emb.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(vecs(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val qt = toks(qid)
      val lex = toks.toSeq.filter(_._1 != qid)
        .map { case (id, ts) =>
          val sh = (ts & qt).size
          (id, sh.toDouble / (ts.size + qt.size - sh))
        }
        .filter(_._2 > 0 || true)
        .sortBy { case (id, j) => (-j, id) }.take(10).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      def rr(r: Long) = math.round(1e6 / (60.0 + r))
      (dense.keySet ++ lex.keySet).toSeq
        .map { id =>
          (id, dense.getOrElse(id, 0L), lex.getOrElse(id, 0L),
            dense.get(id).map(rr).getOrElse(0L) + lex.get(id).map(rr).getOrElse(0L))
        }
        .sortBy { case (id, _, _, f) => (-f, id) }.take(5).zipWithIndex
        .map { case ((id, dr, lr, f), i) => (qid, i + 1L, id, f, dr, lr) }
    }
    val got = Similarity.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === want.toSeq)
  }

  test("ml_ks_score: the KS statistic replays as the max CDF separation") {
    val pool = scoredPoolWithId
    val npos = pool.count(_._2 == 1L).toLong
    val nneg = pool.length - npos
    val hist = pool.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (p, xs) => (p, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong) }
    var (cp, cn) = (0L, 0L)
    val seps = hist.map { case (p, pc, nc) =>
      cp += pc; cn += nc
      (p, math.round(1e3 * math.abs(cp.toDouble / npos - cn.toDouble / nneg)), cp, cn)
    }
    val best = seps.minBy { case (p, s, _, _) => (-s, p) }
    val r = MlEval.ksScore(spark, sf).collect()(0)
    assert(r.getLong(0) === npos && r.getLong(1) === nneg)
    assert(r.getLong(2) === best._1 && r.getLong(3) === best._2)
    assert(r.getLong(4) === math.round(1e6 * best._3.toDouble / npos))
    assert(r.getLong(5) === math.round(1e6 * best._4.toDouble / nneg))
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000L)
  }

  test("agg_hhi: shares replay per region; HHI bounded by [1/n, 1] up to quantization") {
    val rev = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * 100.0d)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val suppNation = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nationRegion = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    val regionName = Tables.region(spark, sf)
      .select(col("r_regionkey"), col("r_name")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val byNation = rev.groupBy(t => suppNation(t._1))
      .map { case (n, xs) => n -> xs.map(_._2).sum }
    val byRegion = byNation.groupBy { case (n, _) => nationRegion(n) }
    val want = byRegion.map { case (rk, ns) =>
      val tot = ns.values.sum.toDouble
      val terms = ns.values.map(v => math.round(1e6 * (v / tot) * (v / tot)))
      regionName(rk) -> (ns.size.toLong, terms.sum,
        ns.values.map(v => math.round(1e6 * v / tot)).max)
    }
    val got = StatsOps.hhi(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    got.values.foreach { case (n, h, top) =>
      assert(h >= (1000000L / n) - n && h <= 1000000L + n) // [1/n, 1] + quantization
      assert(top * top / 1000000L <= h + n) // top share alone can't beat the sum
    }
  }

  test("agg_median_ci: order statistics replay from a driver sort; interval brackets the median") {
    val vals = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100.0d).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length
    val l = math.ceil(n / 2.0 - 0.98 * math.sqrt(n)).toLong
    val u = math.ceil(n / 2.0 + 0.98 * math.sqrt(n)).toLong
    val r = StatsOps.medianCi(spark, sf).collect()(0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === l && r.getLong(2) === u)
    assert(r.getLong(3) === vals((l - 1).toInt))            // x_(l)
    assert(r.getLong(4) === vals(((n + 1) / 2 - 1).toInt))  // lower median
    assert(r.getLong(5) === vals((u - 1).toInt))            // x_(u)
    assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5))
  }

  // scoredPool with vec_id carried: (vec_id, y, p_u)
  private def scoredPoolWithId: Array[(Long, Long, Long)] = {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
    rows.map { r =>
      val label = r.getInt(1).toLong
      val emb = r.getSeq[Float](2)
      val logitU = emb.take(8).map(v => math.round(v.toDouble * 1e6)).sum
      val p = 1e6 / (1d + math.exp(-6.0d * logitU.toDouble / 1000000.0d))
      val pU = math.max(1L, math.min(999999L, math.round(p)))
      (r.getLong(0), label % 2, pU)
    }
  }

  test("win_interval_union: per-supplier coverage replays an interval-merge sweep") {
    val iv = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = iv.groupBy(_._1).map { case (k, xs) =>
      val starts = xs.map(_._2).sorted
      var (covered, islands, curLo, curHi) = (0L, 0L, Long.MinValue, Long.MinValue)
      starts.foreach { s =>
        if (s > curHi) {
          if (islands > 0) covered += curHi - curLo
          islands += 1; curLo = s; curHi = s + 7
        } else curHi = math.max(curHi, s + 7)
      }
      covered += curHi - curLo
      (k, (xs.length.toLong, islands, covered))
    }
    val got = Windows.intervalUnion(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === want.size)
    want.foreach { case (k, v) => assert(got(k) === v, s"supplier $k") }
  }
}

/** Driver-side replay of the k-anonymity audit row. */
private object MlEvalKAnonReplay {
  def check(r: org.apache.spark.sql.Row, cls: Seq[(Long, Long)]): Boolean = {
    val nRows = cls.map(_._1).sum
    val below = cls.filter(_._1 < 5L).map(_._1).sum
    r.getLong(0) == nRows &&
      r.getLong(1) == cls.length.toLong &&
      r.getLong(2) == cls.map(_._1).min &&
      r.getLong(3) == below &&
      r.getLong(4) == math.round(1e6 * below.toDouble / nRows) &&
      r.getLong(5) == cls.count(_._1 == 1L).toLong &&
      r.getLong(6) == cls.map(_._2).min
  }
}

/** Driver-side replica of the portable md5 id-hash (Graft.idHash):
  * first 8 hex chars of md5(utf8 string) as an unsigned 32-bit long. */
object Round10OpsHash {
  /** Spark/DuckDB round() semantics for doubles: HALF_UP away from
    * zero (math.round is floor(x+0.5), which differs on negative
    * exact-.5 ties — the ml_logreg_gd gradient replay hit one). */
  def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def idHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }
}
