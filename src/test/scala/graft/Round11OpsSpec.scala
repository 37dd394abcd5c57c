package graft

import graft.operators._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 operators: rank statistics without global sorts
  * (HistQuantile machinery, Spearman/Kendall/trend/BH-FDR,
  * coverage curve, Markov transitions) + the CC pre-collapse probe. */
class Round11OpsSpec extends SparkSpec {

  test("HistQuantile.ntileBuckets ≡ literal ntile census (ties included)") {
    import spark.implicits._
    // heavy ties + a remainder: 23 rows over 7 distinct values, k=4
    val vals = Seq(5L, 5L, 5L, 1L, 2L, 2L, 9L, 9L, 9L, 9L, 3L, 3L, 3L,
      7L, 7L, 4L, 4L, 4L, 4L, 4L, 8L, 8L, 8L)
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val expected = df
      .withColumn("b", ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("b")).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = HistQuantile.ntileBuckets(df, col("v"), 4)
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("HistQuantile.withNtile ≡ literal ntile per row (desc, tie-broken)") {
    import spark.implicits._
    val df = Seq((10L, 1L), (10L, 2L), (7L, 3L), (7L, 4L), (7L, 5L),
      (3L, 6L), (3L, 7L), (1L, 8L), (12L, 9L), (12L, 10L), (12L, 11L))
      .toDF("v", "id")
    val expected = df.withColumn("q",
      ntile(3).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select(col("id"), col("q")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = HistQuantile.withNtile(df, col("v"), col("id"), 3,
      descValue = true, out = "q")
      .select(col("id"), col("q")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }

  test("spearman and kendall agree in sign and live in [-1e6, 1e6]") {
    val rho = StatsOps.spearman(spark, sf).collect()(0).getLong(1)
    val tau = StatsOps.kendallTau(spark, sf).collect()(0).getLong(3)
    assert(math.abs(rho) <= 1000000L && math.abs(tau) <= 1000000L)
    assert(rho == 0 || tau == 0 || rho.sign == tau.sign)
  }

  test("spearman is exactly ±1e6 on perfectly monotone synthetic data") {
    // replicate the op's midrank+moment arithmetic on y = x (no ties):
    // a pure Pearson-on-ranks must be exactly 1
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i * 3 + 7)).toDF("x", "y")
    def mr(v: String, out: String) = {
      val cum = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.groupBy(col(v)).agg(count(lit(1)).as("c"))
        .withColumn("cumc", sum(col("c")).over(cum))
        .select(col(v), (lit(2) * (col("cumc") - col("c")) + col("c") + lit(1)).as(out))
    }
    val j = df.join(mr("x", "rx2"), "x").join(mr("y", "ry2"), "y")
      .agg(count(lit(1)).as("n"), sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("ry2")).as("sxy"),
        sum(col("rx2") * col("rx2")).as("sxx"), sum(col("ry2") * col("ry2")).as("syy"))
      .select((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        ./(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("rho"))
      .collect()(0).getDouble(0)
    assert(math.abs(j - 1.0d) < 1e-12)
  }

  test("trend test statistic is non-negative") {
    assert(StatsOps.trendTest(spark, sf).collect()(0).getLong(2) >= 0L)
  }

  test("BH-FDR: 5 types, valid p-values, rejections form a rank prefix") {
    val rows = StatsOps.bhFdr(spark, sf).collect()
    assert(rows.length === 5)
    val byRank = rows.sortBy(_.getAs[Long]("p_rank"))
    byRank.foreach { r =>
      val p = r.getAs[Long]("p_ppm")
      assert(p > 0L && p <= 1000000L)
    }
    // step-up: the rejected set is exactly ranks 1..k*
    val flags = byRank.map(_.getAs[Boolean]("rejected"))
    val k = flags.count(identity)
    assert(flags.take(k).forall(identity) && flags.drop(k).forall(!_))
  }

  test("coverage curve: targets met with monotone type counts") {
    val rows = TextAnalysis.coverageCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("pct")).toSeq === Seq(50L, 90L, 99L))
    val types = rows.map(_.getAs[Long]("n_types"))
    val covered = rows.map(_.getAs[Long]("tokens_covered"))
    val total = rows.head.getAs[Long]("total_tokens")
    assert(types.sorted.toSeq === types.toSeq) // more coverage needs more types
    rows.foreach { r =>
      // covered mass actually reaches the ceil target
      assert(r.getAs[Long]("tokens_covered") * 100L >= r.getAs[Long]("pct") * total)
    }
    assert(covered.forall(_ <= total))
  }

  test("event transitions: rows normalize to ~1e6 ppm per source state") {
    val rows = Analytics.eventTransitions(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("prev_type"))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("p_ppm")).sum
      // per-cell rounding wobbles the row sum by at most |cells|/2
      assert(math.abs(s - 1000000L) <= rs.length.toLong)
    }
  }

  test("CC pre-collapse is exact on chain + clique + isolated edge") {
    import spark.implicits._
    // chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)).toDF("a", "b")
    def labels(pre: Boolean) =
      graft.api.Graft.connectedComponents(edges, "a", "b", preCollapse = pre)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = labels(false)
    val pre = labels(true)
    assert(plain === pre)
    assert(pre(5L) === 1L && pre(12L) === 10L && pre(21L) === 20L)
  }

  test("TIFF parser honors the announced byte order (II and MM both present)") {
    val rows = Multimodal.tiffHeader(spark, sf).collect()
    val (ii, mm) = rows.partition(_.getAs[Boolean]("little_endian"))
    assert(ii.nonEmpty && mm.nonEmpty, "corpus must exercise both byte orders")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("ifd_ok"))
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") === 16L + id % 1024L)
      assert(r.getAs[Boolean]("little_endian") === (id % 2 == 0))
    }
  }

  test("FLAC bit unpacking recovers the 20/3/5/36-bit fields exactly") {
    val rows = Multimodal.flacHeader(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("streaminfo_ok"))
      val rate = r.getAs[Long]("sample_rate")
      assert(rate >= 8000L && rate <= 36000L && rate % 4000L == 0L)
      assert(r.getAs[Long]("bits_per_sample") === 16L)
      val ch = r.getAs[Long]("channels")
      assert(ch == 1L || ch == 2L)
      // duration is the exact floor of total*1000/rate
      val total = r.getAs[Long]("total_samples")
      assert(r.getAs[Long]("duration_ms") === total * 1000L / rate)
    }
  }

  test("degree power-law: Hill alpha is finite and above 1") {
    val r = GraphOps.degreePowerLaw(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_tail") > 0L)
    assert(r.getAs[Long]("alpha_micro") > 1000000L) // α > 1 by construction
    assert(r.getAs[Long]("n_tail") <= r.getAs[Long]("n_parts"))
  }

  test("changepoint: argmax split has segments on both sides") {
    val r = TimeSeries.changepoint(spark, sf).collect()(0)
    assert(r.getAs[Long]("hours_left") > 0L && r.getAs[Long]("hours_right") > 0L)
    assert(r.getAs[Long]("score_micro") >= 0L)
  }

  test("point-in-polygon: ray casting agrees with a JVM reference") {
    // replicate the op's polygon + a pure-Scala ray cast over the
    // same synthesized points; shares must match exactly
    val poly = Seq((10.505, -40.505), (25.505, -20.505), (5.505, 0.505),
      (-15.505, -10.505), (-10.505, -35.505))
    def inside(lat: Double, lon: Double): Boolean = {
      val edges = poly.zip(poly.tail :+ poly.head)
      edges.count { case ((y1, x1), (y2, x2)) =>
        ((y1 > lat) != (y2 > lat)) &&
          lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
      } % 2 == 1
    }
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey",
        "CAST((c_custkey * 37) % 12000 AS DOUBLE) / 100 - 60 AS lat",
        "CAST((c_custkey * 91) % 36000 AS DOUBLE) / 100 - 180 AS lon")
      .collect().count(r => inside(r.getDouble(1), r.getDouble(2)))
    val got = GeoOps.pointInPolygon(spark, sf)
      .agg(sum(col("n_inside"))).collect()(0).getLong(0)
    assert(got === expected.toLong)
  }

  test("best threshold: F1 point dominates every fixed sweep point") {
    val best = MlEval.bestThreshold(spark, sf).collect()
      .find(_.getAs[String]("criterion") == "best_f1").get
    val tp = best.getAs[Long]("tp")
    val f1 = best.getAs[Long]("score_ppm")
    assert(tp > 0L && f1 > 0L && f1 <= 1000000L)
  }

  test("power analysis: sample size shrinks as the effect grows") {
    val r = StatsOps.powerAnalysis(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_per_arm")
    val sd = r.getAs[Long]("sd_milli").toDouble / 1000d
    val delta = r.getAs[Long]("delta_cents").toDouble
    // closed form sanity: n ≈ 15.698·σ²/δ²
    val expect = math.ceil((1.96 + 0.8416) * (1.96 + 0.8416) * 2 * sd * sd / (delta * delta))
    assert(math.abs(n - expect) <= math.max(1L, (expect * 0.01).toLong),
      s"n=$n expect≈$expect")
  }

  test("radius search: every reported match clears the ppm floor") {
    val rows = Similarity.radiusSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("worst_ppm") >= 300000L)
      assert(r.getAs[Long]("best_ppm") >= r.getAs[Long]("worst_ppm"))
      assert(r.getAs[Long]("n_matches") > 0L)
    }
  }

  test("PR-AUC sits between the prevalence floor and 1") {
    val r = MlEval.prAuc(spark, sf).collect()(0)
    val ap = r.getAs[Long]("ap_micro")
    val prev = r.getAs[Long]("prevalence_micro")
    // a scorer no worse than random: AP ≥ prevalence (tolerate the
    // per-term micro rounding by one count's worth)
    assert(ap >= prev - r.getAs[Long]("n") && ap <= 1000000L)
    assert(r.getAs[Long]("pos") > 0L)
  }

  test("temperature mix: low-resource languages gain share, realized tracks target") {
    val rows = CorpusOps.temperatureMix(spark, sf).collect()
    assert(rows.length > 1)
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    // α < 1 compresses: the smallest language's target/n ratio must
    // exceed the largest language's
    val lo = byN.head
    val hi = byN.last
    def ratio(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("target_docs").toDouble / r.getAs[Long]("n_docs")
    assert(ratio(lo) >= ratio(hi))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("keep_rate_ppm") <= 1000000L)
    }
  }

  test("mcnemar: discordant counts consistent with paired accuracies") {
    val r = MlEval.mcnemar(spark, sf).collect()(0)
    val (n, b, c) = (r.getAs[Long]("n"), r.getAs[Long]("b"), r.getAs[Long]("c"))
    assert(n > 0 && b >= 0 && c >= 0 && b + c <= n)
    // acc_a - acc_b must equal (b - c)/n up to ppm rounding
    val accDelta = r.getAs[Long]("acc_a_ppm") - r.getAs[Long]("acc_b_ppm")
    val expected = 1e6 * (b - c).toDouble / n.toDouble
    assert(math.abs(accDelta - expected) <= 1.5)
    assert(r.getAs[Long]("chi2_milli") >= 0L)
  }

  test("ece: bounded by MCE; Murphy terms non-negative; unc = p(1-p)") {
    val r = MlEval.ece(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_bins") <= 10L)
    assert(r.getAs[Long]("ece_ppm") >= 0L)
    assert(r.getAs[Long]("ece_ppm") <= r.getAs[Long]("mce_ppm"))
    assert(r.getAs[Long]("rel_nano") >= 0L && r.getAs[Long]("res_nano") >= 0L)
    val (n, p) = (r.getAs[Long]("n"), r.getAs[Long]("p"))
    val unc = math.round(1e9 * p.toDouble * (n - p).toDouble / (n.toDouble * n))
    assert(r.getAs[Long]("unc_nano") === unc)
  }

  test("jarque-bera: per-segment rows; pivot-centered skew matches naive") {
    val rows = StatsOps.jarqueBera(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r => assert(r.getAs[Long]("jb_milli") >= 0L) }
    // cross-check one segment's skew against a naive double computation
    val seg = rows.head.getAs[String]("seg")
    val xs = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === seg)
      .select(round(col("c_acctbal") * 100.0d).cast("long"))
      .collect().map(_.getLong(0).toDouble)
    val mu = xs.sum / xs.length
    val m2 = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum / xs.length
    val naive = 1e6 * m3 / (m2 * math.sqrt(m2))
    assert(math.abs(rows.head.getAs[Long]("skew_micro") - naive) < 5.0)
  }

  test("referential integrity: TPC-H edges are orphan-free, totals line up") {
    val rows = WarehouseEtl.referentialIntegrity(spark, sf).collect()
      .map(r => r.getAs[String]("edge") -> r).toMap
    assert(rows.size === 5)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_orphan_rows") === 0L)
      assert(r.getAs[Long]("n_orphan_keys") === 0L)
      assert(r.getAs[Long]("n_child_keys") <= r.getAs[Long]("n_child_rows"))
      assert(r.getAs[Long]("n_unref_parents") <= r.getAs[Long]("n_parent_keys"))
    }
    val lo = rows("lineitem_orders")
    assert(lo.getAs[Long]("n_child_rows") === Tables.lineitem(spark, sf).count())
    assert(lo.getAs[Long]("n_parent_keys") === Tables.orders(spark, sf).count())
  }

  test("fisher exact: tails telescope (left + right = 1 + p_obs), two-sided bounded") {
    val r = StatsOps.fisherExact(spark, sf).collect()(0)
    val (pl, pr, po, p2) = (r.getAs[Long]("p_left_pico"), r.getAs[Long]("p_right_pico"),
      r.getAs[Long]("p_obs_pico"), r.getAs[Long]("p_two_pico"))
    // exact identity of hypergeometric tails, up to per-term pico rounding
    assert(math.abs(pl + pr - 1000000000000L - po) < 1000000L)
    assert(p2 >= po && p2 <= 1000000000000L + 1000000L)
    assert(p2 >= math.min(pl, pr)) // two-sided dominates the smaller tail
  }

  test("levene: W non-negative, group count and n match the table") {
    val r = StatsOps.levene(spark, sf).collect()(0)
    assert(r.getAs[Long]("k") >= 2L)
    assert(r.getAs[Long]("n") === Tables.customer(spark, sf).count())
    assert(r.getAs[Long]("w_milli") >= 0L)
    assert(r.getAs[Long]("ssw_milli") > 0L)
  }

  test("cohens kappa: bounded, sign matches observed-minus-chance") {
    val r = TextAnalysis.cohensKappa(spark, sf).collect()(0)
    val (po, pe, k) = (r.getAs[Long]("po_ppm"), r.getAs[Long]("pe_ppm"),
      r.getAs[Long]("kappa_micro"))
    assert(po >= 0L && po <= 1000000L && pe >= 0L && pe <= 1000000L)
    assert(k >= -1000000L && k <= 1000000L)
    assert((po - pe) == 0L || (po - pe).sign == k.sign || k == 0L)
    assert(r.getAs[Long]("n") ===
      r.getAs[Long]("a") + r.getAs[Long]("b") + r.getAs[Long]("c") + r.getAs[Long]("dd"))
  }

  test("dbscan: partition of the point set; clusters have >= 1 core") {
    val rows = GeoOps.dbscan(spark, sf).collect()
    val noise = rows.filter(_.getAs[Long]("cluster") == -1L)
    assert(noise.length === 1)
    val clusters = rows.filter(_.getAs[Long]("cluster") != -1L)
    clusters.foreach { r =>
      assert(r.getAs[Long]("n_core") >= 1L)
      assert(r.getAs[Long]("n_pts") ===
        r.getAs[Long]("n_core") + r.getAs[Long]("n_border"))
    }
    val total = rows.map(_.getAs[Long]("n_pts")).sum
    assert(total === Tables.customer(spark, sf).count())
  }

  test("mp3 header: sync + layer valid, frame formula matches the tables") {
    val rows = Multimodal.mp3Header(spark, sf).collect()
    assert(rows.nonEmpty)
    val kbps = Seq(0L, 32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L,
      160L, 192L, 224L, 256L, 320L)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sync_ok") && r.getAs[Boolean]("mpeg1_l3_ok"))
      val bi = r.getAs[Long]("bitrate_idx")
      assert(bi >= 1L && bi <= 14L)
      assert(r.getAs[Long]("bitrate_kbps") === kbps(bi.toInt))
      assert(Seq(44100L, 48000L, 32000L).contains(r.getAs[Long]("sample_rate")))
      val expect = 144000L * r.getAs[Long]("bitrate_kbps") /
        r.getAs[Long]("sample_rate") + r.getAs[Long]("padding")
      assert(r.getAs[Long]("frame_bytes") === expect)
    }
  }

  test("trigram backoff: levels partition the trigrams; scores negative") {
    val rows = CorpusOps.trigramBackoff(spark, sf).collect()
    assert(rows.nonEmpty)
    var anyBackoff = false
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trigrams") ===
        r.getAs[Long]("n_hit3") + r.getAs[Long]("n_hit2") + r.getAs[Long]("n_uni"))
      assert(r.getAs[Long]("avg_logscore_micro") < 0L)
      if (r.getAs[Long]("n_hit2") + r.getAs[Long]("n_uni") > 0) anyBackoff = true
    }
    assert(anyBackoff, "held-out split must exercise the backoff path")
  }

  test("khop reach: cumulative and consistent with the eps-graph degree") {
    val rows = GeoOps.khopReach(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_1hop") <= r.getAs[Long]("n_2hop"))
      assert(r.getAs[Long]("n_2hop") <= r.getAs[Long]("n_3hop"))
    }
  }

  test("surrogate keys: zero collisions, buckets reasonably uniform") {
    val rows = WarehouseEtl.surrogateKeys(spark, sf).collect()
    assert(rows.map(_.getAs[String]("entity")).toSeq.sorted ===
      Seq("customer", "part", "supplier"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_collisions") === 0L)
      assert(r.getAs[Long]("bucket_min") > 0L)
      assert(r.getAs[Long]("bucket_max") >= r.getAs[Long]("bucket_min"))
    }
  }

  test("prefixBytes + leAt round-trip little-endian fields") {
    import spark.implicits._
    val df = Seq(1).toDF("one")
      .select(Multimodal.prefixBytes(unhex(lit("DEADBEEF01020304")), 8).as("b"))
      .select(Multimodal.leAt(col("b"), 1, 4).as("le4"),
        Multimodal.leAt(col("b"), 5, 2).as("le2"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 0xEFBEADDEL)
    assert(r.getLong(1) === 0x0201L)
  }
}
