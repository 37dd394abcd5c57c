package graft

import graft.operators._
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Invariant specs for the round-8 operator additions — each test
  * pins a property the DuckDB oracle cannot express (cross-query
  * consistency, algebraic laws), complementing the differential
  * gate. */
class Round8OpsSpec extends SparkSpec {

  test("decimal family: exact identities between the decimal aggregates") {
    // outputs are DOUBLE at the serialization boundary (harness
    // contract — see decimalFamily's docstring), but every value is
    // an exact decimal < 2^53 quanta, so the identities hold exactly
    val rows = Extras.decimalFamily(spark, sf).collect()
    assert(rows.length === 3) // l_returnflag in {A, N, R}
    for (r <- rows) {
      val sumPrice = r.getDouble(2)
      val minP = r.getDouble(3)
      val maxP = r.getDouble(4)
      val sumDisc = r.getDouble(5)
      val sumCharge = r.getDouble(6)
      val r2 = r.getDouble(7)
      assert(minP <= maxP)
      // discount in [0, 0.1], tax >= 0: disc_price <= price, charge >= disc_price
      assert(sumDisc <= sumPrice)
      assert(sumCharge >= sumDisc)
      // rounding to cents moves the sum by < half a cent
      assert(math.abs(sumCharge - r2) < 0.005)
      // the doubles are exact decimal quanta: scale-2 money and the
      // scale-6 charge sum are integral in cents / micro-units
      assert(sumPrice * 100d === math.rint(sumPrice * 100d))
      assert(BigDecimal(sumCharge).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).doubleValue === sumCharge)
    }
  }

  test("grid range join equals the direct range predicate (grid is invisible in results)") {
    val got = Joins.gridRangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
    // naive reference: same predicate, no grid
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts_ns"), col("value")).collect()
    val errs = ev.filter(_.getString(1) == "error")
    val purchases = ev.filter(_.getString(1) == "purchase")
    val cellNs = 1800L * 1000 * 1000 * 1000
    val want = errs.map { e =>
      val s = e.getLong(2)
      val inWin = purchases.filter(p => p.getLong(2) > s && p.getLong(2) <= s + cellNs)
      (e.getLong(0), inWin.length.toLong,
        inWin.map(p => Math.round(p.getDouble(3) * 100)).sum.toDouble / 100d)
    }.filter(_._2 > 0).toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("random projection: linear, deterministic, and sign-bounded") {
    val rp = Similarity.randomProjection(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rp.length === nVec * 8)
    // |y_j| <= sum_i |x_i| (signs are +-1) — projection can't exceed the L1 mass
    val l1 = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        aggregate(col("embedding").cast("array<double>"), lit(0.0),
          (a, x) => a + abs(x)).as("l1"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- rp)
      assert(math.abs(r.getDouble(2)) <= l1(r.getLong(0)) + 1e-3)
    // deterministic: a second run is identical
    val rp2 = Similarity.randomProjection(spark, sf).collect()
    assert(rp.map(_.toSeq).toSeq === rp2.map(_.toSeq).toSeq)
  }

  test("maxsim: the group max dominates every member cosine of that label") {
    val tk = Similarity.maxSimTopK(spark, sf).collect()
    assert(tk.nonEmpty)
    for (r <- tk) assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    // ranks are dense 1..3 per query
    val byQ = tk.groupBy(_.getLong(0))
    for ((_, rows) <- byQ) assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("retrieval metrics: mrr and ndcg bounded, consistent with first_rel_rank") {
    val m = Similarity.retrievalMetrics(spark, sf).collect()
    assert(m.length === 10) // nQueries
    for (r <- m) {
      val (nRel, first, mrr, ndcg) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nRel >= 0 && nRel <= 5)
      assert(mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      if (nRel == 0) assert(first === 0L && mrr === 0.0 && ndcg === 0.0)
      else {
        assert(first >= 1L && first <= 5L)
        assert(math.abs(mrr - BigDecimal(1.0 / first)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
        // a perfect prefix of relevant hits gives ndcg exactly 1
        if (first == 1L && nRel == 5L) assert(ndcg === 1.0)
      }
    }
  }

  test("scd2 lookup: every purchase matches exactly one version, the latest change at-or-before it") {
    val got = Round8Fixtures.scd2LookupRows(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("event_type")).collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
    assert(got.size === purchases.length) // exactly-one match per fact
    // reference: latest state-change at-or-before the fact ts — which,
    // on a per-event change log, is the fact's own event type
    for (p <- purchases) assert(got(p.getLong(0)) === "purchase")
  }

  test("ab test: counts partition the events; z stats finite and non-negative") {
    val r = Aggregations.abTest(spark, sf).collect().head
    val total = Tables.events(spark, sf).count()
    assert(r.getLong(0) + r.getLong(1) === total)
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
    assert(r.getDouble(6) >= 0.0 && !r.getDouble(6).isNaN) // z_conversion
    assert(r.getDouble(9) >= 0.0 && !r.getDouble(9).isNaN) // z_value
    assert(r.getBoolean(10) === (r.getDouble(6) > 1.96))
  }

  test("item CF: cosine bounded by confidence geometry, co-counts support-pruned") {
    val cf = Analytics.itemCf(spark, sf).collect()
    assert(cf.nonEmpty)
    for (r <- cf) {
      assert(r.getLong(3) >= 2) // min co-occurrence prune
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0 + 1e-9)
    }
    // ranks are a dense prefix per item
    for ((_, rows) <- cf.groupBy(_.getLong(0)))
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length))
  }

  test("k-core equals 4 synchronous peel rounds computed by brute force") {
    val got = GraphOps.kCore(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: collect the edge list, replay the same synchronous peel
    var edges = Joins.fuzzyBlockedJoin(spark, sf)
      .select(col("name_a"), col("name_b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    for (_ <- 1 to 4) {
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.length }
      val keep = deg.filter(_._2 >= 2).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val want = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    assert(got === want)
    // true 2-core members (fully converged peel) all survive a
    // bounded-round peel — rounds only remove non-core nodes
    var conv = edges
    var stable = false
    while (!stable) {
      val deg = (conv.map(_._1) ++ conv.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.length }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = conv.filter(e => keep(e._1) && keep(e._2))
      stable = next.length == conv.length
      conv = next
    }
    for (n <- (conv.map(_._1) ++ conv.map(_._2)).distinct) assert(got.contains(n))
  }

  test("negative sampling: one draw per slot, head terms dominate, deterministic") {
    val s = CorpusOps.negativeSamples(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(s.length === nDocs * 4) // exactly one term per (doc, slot)
    val draws = s.map(_.getString(2))
    // unigram^0.75 still concentrates on the head: the single most
    // drawn term must be drawn far more than a uniform share would
    val topShare = draws.groupBy(identity).values.map(_.length).max.toDouble / draws.length
    assert(topShare > 2.0 / 1024, s"top share $topShare looks uniform")
    val s2 = CorpusOps.negativeSamples(spark, sf).collect()
    assert(s.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
  }

  test("bloom decontamination: sketch prunes at the scan, answer identical to exact") {
    val bloomDf = CorpusOps.decontaminateBloom(spark, sf)
    val exact = CorpusOps.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = bloomDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === exact) // false positives die in the exact join
    // the sketch predicate must sit in the plan (map-side prune)
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("pseudonymize: bijective pseudonyms, referential integrity preserved") {
    val rows = WarehouseEtl.pseudonymize(spark, sf).collect()
    assert(rows.length === 5) // market segments
    val nOrders = Tables.orders(spark, sf).count()
    // every pseudonym maps one key (no collisions), every order joins back
    for (r <- rows) assert(r.getLong(1) === r.getLong(2))
    assert(rows.map(_.getLong(3)).sum === nOrders)
  }

  test("late census: every event counted once; dropped is a subset of out-of-order") {
    val c = Streams.lateCensusBatch(spark, sf).collect()
    assert(c.map(_.getLong(1)).sum === Tables.events(spark, sf).count())
    for (r <- c) {
      assert(r.getLong(3) <= r.getLong(2)) // dropped ⊆ out-of-order
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("ppjoin is LOSSLESS: equals brute-force all-pairs jaccard at threshold") {
    val got = Dedup.ppjoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // brute force: every pair, exact hashed-shingle-set jaccard (the
    // same universe the operator uses)
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(transform(graft.api.Graft.shingles(col("text"), 3),
          s => conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")))
          .as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val want = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (ida, sa) = if (sets(i)._1 < sets(j)._1) sets(i) else sets(j)
      (idb, sb) = if (sets(i)._1 < sets(j)._1) sets(j) else sets(i)
      o = (sa & sb).size
      jac = o.toDouble / (sa.size + sb.size - o)
      if jac >= 0.5
    } yield (ida, idb,
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.sorted
    assert(got === want) // the prefix filter dropped NOTHING above threshold
  }

  test("attribution: credited revenue reconciles with total purchase revenue") {
    val a = Analytics.attribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val wantN = purchases.count()
    val wantCents = purchases
      .agg(sum(round(col("value") * 100).cast("long"))).collect().head.getLong(0)
    assert(a.map(_.getLong(2)).sum === wantN)
    assert(a.map(r => Math.round(r.getDouble(3) * 100)).sum === wantCents)
  }

  test("curriculum: phases partition the corpus and quality is monotone") {
    val c = CorpusOps.curriculum(spark, sf).collect()
    assert(c.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(c.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    // phase 1 holds the cleanest docs: mean quality non-increasing
    val means = c.map(_.getDouble(3))
    assert(means(0) >= means(1) && means(1) >= means(2))
  }

  test("left interval join: unconverted errors are exactly those absent from the inner twin") {
    val left = Streams.intervalJoinLeftBatch(spark, sf).collect()
    val nErrors = Tables.events(spark, sf).filter(col("event_type") === "error").count()
    assert(left.length === nErrors) // every error emits exactly once
    val converted = Streams.intervalJoinBatch(spark, sf).collect()
      .map(_.getLong(1)).toSet // err_ids with >=1 purchase
    for (r <- left) {
      assert(r.getBoolean(3) === !converted(r.getLong(0)))
      assert(r.getBoolean(3) === (r.getLong(1) == 0L))
      if (r.getLong(1) == 0L) assert(r.getDouble(2) === 0.0)
    }
  }

  test("bmp header: parse inverts the synthesizer; rows are 4-byte aligned") {
    val rows = Multimodal.bmpHeader(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    for (r <- rows) {
      assert(r.getBoolean(1) && r.getBoolean(2)) // magic + BI_RGB
      val (w, h, rb, db) = (r.getLong(3), r.getLong(4), r.getLong(6), r.getLong(7))
      assert(rb % 4 === 0 && rb >= w * 3 && rb < w * 3 + 4) // stride law
      assert(db === rb * h)
      assert(r.getLong(5) === 24L)
    }
  }

  test("quality qnorm: deciles partition each source; global bounds are monotone") {
    val q = CorpusOps.qualityQnorm(spark, sf).collect()
    val bySource = q.groupBy(_.getString(0))
    val total = bySource.values.map(_.map(_.getLong(2)).sum).sum
    assert(total === Tables.documents(spark, sf).count())
    for ((_, rows) <- bySource) {
      val sorted = rows.sortBy(_.getLong(1))
      // raw bounds rise with the decile within each source
      for (Seq(a, b) <- sorted.toSeq.sliding(2))
        assert(a.getLong(4) <= b.getLong(3) || a.getLong(4) <= b.getLong(4))
    }
    // the global decile table is shared: same (min,max) per decile everywhere
    val glob = q.map(r => r.getLong(1) -> (r.getLong(5), r.getLong(6))).toMap
    assert(glob.size <= 10)
    for (Seq(d1, d2) <- (1L to 10L).filter(glob.contains).sliding(2).map(_.toSeq))
      assert(glob(d1)._2 <= glob(d2)._1 || glob(d1)._2 <= glob(d2)._2)
  }

  test("entity resolution: canonical is the lexicographic min of its sorted alias list") {
    val er = GraphOps.erResolve(spark, sf).collect()
    assert(er.nonEmpty)
    for (r <- er) {
      val canonical = r.getString(0)
      val aliases = r.getString(3).split('|')
      assert(r.getLong(1) === aliases.length && aliases.length >= 2)
      assert(aliases.min === canonical) // min-label CC + sorted agg agree
      assert(aliases.sorted.toSeq === aliases.toSeq) // ordered string agg
    }
    // alias sets are disjoint across clusters (a name resolves once)
    val all = er.flatMap(_.getString(3).split('|'))
    assert(all.distinct.length === all.length)
  }

  test("ohlc: low <= open,close <= high; volumes cover the stream") {
    val bars = TimeSeries.ohlcBars(spark, sf).collect()
    assert(bars.map(_.getLong(6)).sum === Tables.events(spark, sf).count())
    for (b <- bars) {
      val (o, h, l, c) = (b.getDouble(2), b.getDouble(3), b.getDouble(4), b.getDouble(5))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("funnel latency: converted <= users; percentiles ordered and non-negative") {
    val f = Analytics.funnelLatency(spark, sf).collect()
    assert(f.nonEmpty)
    for (r <- f) {
      assert(r.getLong(2) <= r.getLong(1))
      if (!r.isNullAt(3)) {
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= r.getDouble(4))
      }
    }
  }

  test("novelty: first doc scores 1.0; totals reconcile with distinct shingles") {
    val n = CorpusOps.novelty(spark, sf).collect()
    assert(n.length === Tables.documents(spark, sf).count())
    val first = n.minBy(_.getLong(0))
    assert(first.getDouble(3) === 1.0) // nothing precedes the first doc
    for (r <- n) {
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // every shingle's first occurrence is claimed exactly once: the
    // novel counts sum to the number of distinct shingles corpus-wide
    val distinctShingles = Tables.documents(spark, sf)
      .select(explode(array_distinct(transform(
        graft.api.Graft.shingles(col("text"), 3),
        s => conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")))).as("sh"))
      .select(countDistinct(col("sh"))).collect().head.getLong(0)
    assert(n.map(_.getLong(2)).sum === distinctShingles)
  }

  test("content hash: identical snapshots match; any single-row edit flips its partition") {
    val a = WarehouseEtl.contentHash(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = WarehouseEtl.contentHash(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq) // deterministic fingerprints
    assert(a.map(_._2).sum === Tables.orders(spark, sf).count())
    // partitioning independence: recompute under a different shuffle
    // width — the sums must not move (the associativity claim)
    val narrow = WarehouseEtl.contentHash(spark, sf).coalesce(1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(narrow.toSeq === a.toSeq)
  }

  test("streak: runs reconcile with distinct active days; longest bounded by span") {
    val s = Windows.longestStreak(spark, sf).collect()
    val activeDays = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("d"))
      .distinct().groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.length === activeDays.size)
    for (r <- s) {
      val (uid, nStreaks, longest) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(longest >= 1 && longest <= activeDays(uid))
      assert(nStreaks >= 1 && nStreaks <= activeDays(uid))
      // islands partition the active days: total run length = day count
      // (longest <= days - (nStreaks - 1) since each extra streak costs a day)
      assert(longest <= activeDays(uid) - (nStreaks - 1))
    }
  }

  test("equi-depth histogram: contiguous non-overlapping buckets, balanced populations") {
    val h = Aggregations.histogramEqDepth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(h.map(_._1).toSeq === (1L to 10L))
    val sizes = h.map(_._2)
    assert(sizes.max - sizes.min <= 1) // ntile balance guarantee
    for (Seq((_, _, _, hi1), (_, _, lo2, _)) <- h.toSeq.sliding(2))
      assert(hi1 <= lo2) // ordered, non-overlapping value ranges
  }
}

/** Helpers shared by Round8OpsSpec (kept out of the test class so the
  * closures Spark serializes don't capture the suite). */
object Round8Fixtures {
  def scd2LookupRows(spark: org.apache.spark.sql.SparkSession,
                     sf: String): Map[Long, String] =
    WarehouseEtl.scd2Lookup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
}
