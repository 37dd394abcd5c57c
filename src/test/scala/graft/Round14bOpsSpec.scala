package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-14 second batch: randomness/portmanteau tests (Ljung-Box,
  * turning points), post-hoc and correlated-binary tests (Dunn,
  * Cochran Q), imbalanced-pool classifier verdicts (MCC family,
  * Hosmer-Lemeshow), drawdown, seeded harmonic closeness, geohash,
  * and three codecs with new parse modes (SQLite 1-means-65536
  * sentinel, PCAP endianness self-detection, WASM LEB128 varints). */
class Round14bOpsSpec extends SparkSpec {

  // ---- time series ---------------------------------------------------

  test("ljung-box: 10 lags over the hourly series; flag consistent with q") {
    val r = TimeSeries.ljungBox(spark, sf).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("m_lags") === 10L)
    val q = row.getAs[Long]("q_milli")
    assert(q >= 0L)
    assert(row.getAs[Boolean]("white_noise_rejected_5pct") === (q > 18307L))
    // the hourly-count spine length must match the op's n_bins
    val bins = Tables.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("b"))
      .agg(((unix_timestamp(max(col("b"))) - unix_timestamp(min(col("b")))) / 3600L
        + 1L).cast("long"))
      .head().getLong(0)
    assert(row.getAs[Long]("n_bins") === bins)
  }

  test("turning points: bounded by interior points; z sign matches 3T vs 2(n-2)") {
    val row = TimeSeries.turningPoints(spark, sf).head()
    val n = row.getAs[Long]("n_bins")
    val t = row.getAs[Long]("n_turning")
    val z = row.getAs[Long]("z_milli")
    assert(t >= 0L && t <= n - 2L)
    if (3 * t > 2 * (n - 2)) assert(z > 0L)
    if (3 * t < 2 * (n - 2)) assert(z < 0L)
  }

  // ---- stats ----------------------------------------------------------

  test("dunn: k(k-1)/2 pairs, each type once per side ordering; flag matches |z|") {
    val rows = StatsOps.dunnTest(spark, sf).collect()
    val k = Tables.events(spark, sf).select(col("event_type")).distinct().count()
    assert(rows.length === (k * (k - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val z = r.getAs[Long]("z_milli")
      // the cut is DERIVED from the group count (r14 advice): k=5 → 10
      // pairs → Bonferroni z = 2.807
      if (k == 5) assert(r.getAs[Long]("z_crit_milli") === 2807L)
      assert(r.getAs[Boolean]("differs_bonferroni_5pct") ===
        (math.abs(z) > r.getAs[Long]("z_crit_milli")))
    }
  }

  test("cochran q: non-negative; column totals bounded by blocks") {
    val row = StatsOps.cochranQ(spark, sf).head()
    val nb = row.getAs[Long]("n_blocks")
    Seq("c1", "c2", "c3").foreach { c =>
      val v = row.getAs[Long](c)
      assert(v >= 0L && v <= nb)
    }
    assert(row.getAs[Long]("q_milli") >= 0L)
  }

  // ---- ml eval --------------------------------------------------------

  test("mcc family: bounded; youden = 2*balanced_acc - 1 exactly up to rounding") {
    val row = MlEval.mcc(spark, sf).head()
    val mcc = row.getAs[Long]("mcc_ppm")
    val ba = row.getAs[Long]("balanced_acc_ppm")
    val j = row.getAs[Long]("youden_j_ppm")
    assert(math.abs(mcc) <= 1000000L)
    assert(ba >= 0L && ba <= 1000000L)
    assert(math.abs(j - (2 * ba - 1000000L)) <= 1L)
    assert(row.getAs[Long]("tp") + row.getAs[Long]("fp") +
      row.getAs[Long]("tn") + row.getAs[Long]("fn") === row.getAs[Long]("n"))
  }

  test("hosmer-lemeshow: 10 bucket-atomic deciles, df 8, non-negative chi2") {
    val row = MlEval.hosmerLemeshow(spark, sf).head()
    assert(row.getAs[Long]("n_groups") === 10L)
    assert(row.getAs[Long]("df") === 8L)
    val hl = row.getAs[Long]("hl_milli")
    assert(hl >= 0L)
    assert(row.getAs[Boolean]("miscalibrated_5pct") === (hl > 15507L))
  }

  // ---- windows --------------------------------------------------------

  test("drawdown: non-negative, peak precedes trough, hours match the bin gap") {
    val rows = Windows.drawdown(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dd = r.getAs[Long]("max_drawdown")
      assert(dd >= 0L)
      val peak = r.getAs[String]("peak_bin")
      val trough = r.getAs[String]("trough_bin")
      assert(peak <= trough) // yyyy-MM-dd HH:mm sorts chronologically
      assert(r.getAs[Long]("underwater_hours") >= 0L)
    }
  }

  // ---- graph / geo ----------------------------------------------------

  test("closeness: reach equals khop's 3-hop census; harmonic bounded per node") {
    val c = Similarity // force object init noise away
    val close = GeoOps.closeness(spark, sf).collect()
      .map(r => r.getAs[Long]("seed") ->
        (r.getAs[Long]("n_reach"), r.getAs[Long]("harmonic_milli"))).toMap
    val khop = GeoOps.khopReach(spark, sf).collect()
      .map(r => r.getAs[Long]("seed") -> r.getAs[Long]("n_3hop")).toMap
    assert(close.keySet === khop.keySet)
    close.foreach { case (seed, (reach, harm)) =>
      assert(reach === khop(seed))
      assert(harm <= 1000L * reach)
      assert(harm >= 333L * reach)
    }
  }

  test("geohash: 6-char base32 cells; center re-encodes into its own cell") {
    val rows = GeoOps.geohash(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val a = "0123456789bcdefghjkmnpqrstuvwxyz"
    rows.foreach { r =>
      val gh = r.getAs[String]("geohash")
      assert(gh.length === 6 && gh.forall(a.contains(_)))
      val lat = r.getAs[Long]("center_lat_milli")
      val lon = r.getAs[Long]("center_lon_milli")
      // re-encode the decoded center: must land back in the same cell
      val latb = (lat + 90000L) * 32768L / 180000L
      val lonb = (lon + 180000L) * 32768L / 360000L
      val v = (0 until 15).map(j =>
        (((lonb >> j) & 1L) << (2 * j + 1)) | (((latb >> j) & 1L) << (2 * j))).sum
      val enc = (0 until 6).map(k => a(((v >> (25 - 5 * k)) & 31L).toInt)).mkString
      assert(enc === gh)
    }
    val counts = rows.map(_.getAs[Long]("n_customers"))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("granger: both directions present; F non-negative up to rounding") {
    val rows = TimeSeries.granger(spark, sf).collect()
    assert(rows.map(_.getAs[String]("direction")).toSet ===
      Set("view->purchase", "purchase->view"))
    rows.foreach { r =>
      val f = r.getAs[Long]("f_milli")
      // RSS_restricted >= RSS_full mathematically; rounding can dip 1
      assert(f >= -1L)
      assert(r.getAs[Boolean]("leads_5pct") === (f > 3841L))
    }
  }

  test("page trend: L bounded by the per-block extremes 35b..55b") {
    val row = StatsOps.pageTrend(spark, sf).head()
    val b = row.getAs[Long]("n_blocks")
    val l = row.getAs[Long]("l_stat")
    assert(b > 0L)
    // k=5: per-block L ranges from sum j*(6-j)=35 to sum j*j=55
    assert(l >= 35 * b && l <= 55 * b)
  }

  test("eff diameter: hop-0 pairs = sampled sources, cumulative monotone, one flagged hop") {
    val rows = GeoOps.effDiameter(spark, sf).collect().sortBy(_.getAs[Long]("hop"))
    val sources = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 100 === 0).count()
    assert(rows.head.getAs[Long]("hop") === 0L)
    assert(rows.head.getAs[Long]("n_pairs") === sources)
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a <= b })
    assert(rows.last.getAs[Long]("share_ppm") === 1000000L)
    assert(rows.count(_.getAs[Boolean]("is_effective_diameter")) === 1)
  }

  test("ttr: census conserves docs; deciles within 0..9; guiraud positive") {
    val rows = TextAnalysis.ttr(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0L && d <= 9L)
      assert(r.getAs[Long]("sum_types") <= r.getAs[Long]("sum_tokens"))
      assert(r.getAs[Long]("mean_guiraud_milli") > 0L)
    }
  }

  test("beam search: routed cosine never beats the in-cell exact; hit implies match; touched audited") {
    val rows = Similarity.beamSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fc = r.getAs[Double]("routed_cosine")
      val ec = r.getAs[Double]("exact_cosine")
      assert(fc <= ec + 1e-9)
      if (r.getAs[Boolean]("routed_hit")) {
        assert(r.getAs[Long]("routed_top1") === r.getAs[Long]("exact_top1"))
        assert(math.abs(fc - ec) < 1e-9)
      }
      // touched is bounded by the walk's combinatorics: 3 steps,
      // each scoring ≤ beam(8) ∪ beam×edgeK(8) nodes
      val touched = r.getAs[Long]("candidates_touched")
      assert(touched >= 1L && touched <= 3L * (8L + 8L * 8L))
      val h = r.getAs[Long]("hits_at_k")
      val n = r.getAs[Long]("n_truth")
      assert(n >= 1L && n <= 5L)
      assert(h >= 0L && h <= n)
      assert(r.getAs[Long]("recall_k_milli") === math.round(1e3 * h / n))
      // a top-1 hit IS one of the k hits
      if (r.getAs[Boolean]("routed_hit")) assert(h >= 1L)
    }
  }

  test("bartlett: five groups; chi2 defined; agrees with levene within family") {
    val row = StatsOps.bartlett(spark, sf).head()
    assert(row.getAs[Long]("k") === 5L)
    assert(row.getAs[Long]("df") === 4L)
    val chi2 = row.getAs[Long]("chi2_milli")
    assert(chi2 >= 0L)
    // crit derived from df (r14 advice): df=4 → chi2 95th pct 9.488
    assert(row.getAs[Long]("chi2_crit_milli") === 9488L)
    assert(row.getAs[Boolean]("heteroscedastic_5pct") === (chi2 > 9488L))
  }

  test("filtered ann: recall in [0,1]; truth restricted to odd labels only") {
    val rows = Similarity.filteredAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") <= 5L)
    }
  }

  test("seasonal strength: both in [0, 1e6]; dominance flag consistent") {
    val row = TimeSeries.seasonalStrength(spark, sf).head()
    val s = row.getAs[Long]("seasonal_strength_ppm")
    val t = row.getAs[Long]("trend_strength_ppm")
    assert(s >= 0L && s <= 1000000L)
    assert(t >= 0L && t <= 1000000L)
    assert(row.getAs[Boolean]("seasonal_dominant") === (s > t))
  }

  test("scd4 mini-dimension: <=25 combos; fact rows conserved losslessly") {
    val rows = WarehouseEtl.scd4(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val factRows = Tables.orders(spark, sf)
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_fact_rows")).sum === factRows)
    val keys = rows.map(_.getAs[Long]("md_key"))
    assert(keys.toSeq === (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_fact_rows"))
    }
  }

  // ---- codecs ---------------------------------------------------------

  test("dns: compression pointer dereferences back into the QNAME") {
    val rows = Multimodal.dnsPacket(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_response"))
      assert(r.getAs[Boolean]("ptr_flag_ok"))
      assert(r.getAs[Long]("ptr_target") === 12L)
      assert(r.getAs[Boolean]("ptr_deref_ok"))
      val q = r.getAs[String]("qname")
      val n = (1 + r.getAs[Long]("doc_id") % 10).toInt
      assert(q === "a" * n + ".net")
      assert(r.getAs[String]("ip_prefix").endsWith(".10.0"))
      val t = r.getAs[Long]("ttl")
      assert(t >= 0L && t < 86400L)
    }
  }

  test("class file: tag-driven walk lands on entry 3; version mapping holds") {
    val rows = Multimodal.classHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      assert(r.getAs[Boolean]("tags_ok"))
      assert(r.getAs[Long]("java_version") ===
        r.getAs[Long]("major_version") - 44L)
      assert(r.getAs[Long]("class_name_index") === 2L)
      val ul = r.getAs[Long]("utf8_len")
      assert(ul >= 1L && ul <= 40L)
      assert(r.getAs[Long]("const_int_value") === r.getAs[Long]("doc_id") % 100000L)
    }
  }


  test("sqlite: page size is a power of two; 1-means-65536 sentinel decodes") {
    val rows = Multimodal.sqliteHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      val ps = r.getAs[Long]("page_size")
      assert(ps >= 512L && ps <= 65536L && (ps & (ps - 1)) === 0L)
      assert(r.getAs[Long]("db_bytes") === ps * r.getAs[Long]("page_count"))
      assert(Set("utf8", "utf16le", "utf16be").contains(
        r.getAs[String]("text_encoding")))
      if (r.getAs[Long]("doc_id") % 8 == 7) assert(ps === 65536L)
    }
  }

  test("pcap: byte order self-detected from the magic; both orders decode alike") {
    val rows = Multimodal.pcapHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = rows.map(_.getAs[String]("byte_order")).toSet
    assert(orders === Set("big", "little"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      assert(r.getAs[String]("byte_order") ===
        (if (r.getAs[Long]("doc_id") % 2 == 0) "big" else "little"))
      assert(r.getAs[Long]("version_major") === 2L)
      assert(r.getAs[Long]("version_minor") === 4L)
      val sl = r.getAs[Long]("snaplen")
      assert(sl >= 256L && sl < 65536L)
    }
  }

  test("wasm: LEB128 width follows the 128 boundary; dynamic walk finds section 2") {
    val rows = Multimodal.wasmHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    val widths = rows.map(_.getAs[Long]("leb_width")).toSet
    assert(widths === Set(1L, 2L)) // both encodings occur in the corpus
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      assert(r.getAs[Long]("wasm_version") === 1L)
      assert(r.getAs[Long]("sec1_id") === 1L)
      val sz = r.getAs[Long]("sec1_size")
      assert(r.getAs[Long]("leb_width") === (if (sz >= 128L) 2L else 1L))
      assert(r.getAs[Long]("sec2_id") === 2L)
      assert(r.getAs[Long]("sec2_size") === 0L)
    }
  }
}
