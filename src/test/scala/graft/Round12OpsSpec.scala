package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-12 operators: winnowing fingerprints, k-group rank stats,
  * corpus drift/truncation audits, keyness, the accumulating-snapshot
  * fact, and the three new codecs (NPY / gzip / WARC). */
class Round12OpsSpec extends SparkSpec {

  // ---- winnowing -------------------------------------------------

  test("winnowing LOCAL GUARANTEE: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    import spark.implicits._
    // shared run of 12 tokens (w=4, k=3 → guarantee needs ≥ 6), with
    // distinct prefixes/suffixes on each side
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, s"omega psi $shared chi phi xyz")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(docs, "text", "doc_id")
    val a = fps.filter(col("doc_id") === 1L).select("fp").collect().map(_.getLong(0)).toSet
    val b = fps.filter(col("doc_id") === 2L).select("fp").collect().map(_.getLong(0)).toSet
    assert((a intersect b).nonEmpty, s"no shared fingerprint: $a vs $b")
  }

  test("winnowing density: fingerprints ≈ 2/(w+1) of k-grams, never empty") {
    import spark.implicits._
    val text = (1 to 400).map(i => s"t${i % 97}x$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nFps = Dedup.winnowingFingerprints(docs, "text", "doc_id").count()
    val nGrams = 400 - 2
    // expected ~2/(w+1)=0.4 density on random-ish hashes; allow wide band
    assert(nFps > nGrams / 10 && nFps < nGrams,
      s"$nFps fingerprints for $nGrams grams")
  }

  test("winnowing census is non-empty on the near-dup corpus and buckets are positive") {
    val rows = Dedup.winnowing(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 2, "pairs must share >= 2 fingerprints")
      assert(r.getLong(1) > 0)
    }
  }

  // ---- stats -----------------------------------------------------

  test("kruskal-wallis: H >= 0, df = k-1, tie correction only inflates") {
    val r = StatsOps.kruskalWallis(spark, sf).collect()(0)
    val k = r.getAs[Long]("k"); val df = r.getAs[Long]("df")
    val hRaw = r.getAs[Long]("h_micro_raw")
    val hCorr = r.getAs[Long]("h_tie_corrected_milli")
    assert(k >= 2 && df === k - 1)
    assert(hRaw >= 0 && hCorr >= 0)
    // 1 - T/(N³-N) ∈ (0,1] so corrected H ≥ raw H (in matching units)
    assert(hCorr >= hRaw / 1000)
  }

  test("effect sizes: cliff's delta bounded by ±1, d and delta agree in sign here") {
    val r = StatsOps.effectSizes(spark, sf).collect()(0)
    val delta = r.getAs[Long]("cliffs_delta_ppm")
    val d = r.getAs[Long]("cohens_d_milli")
    assert(math.abs(delta) <= 1000000L)
    assert(delta == 0L || d == 0L || delta.sign == d.sign)
  }

  // ---- corpus / text ---------------------------------------------

  test("kl divergence: both directions non-negative, xent >= kl") {
    val r = CorpusOps.klDivergence(spark, sf).collect()(0)
    val ab = r.getAs[Long]("kl_ab_micro_nats")
    val ba = r.getAs[Long]("kl_ba_micro_nats")
    val xe = r.getAs[Long]("xent_ab_micro_nats")
    assert(ab >= 0 && ba >= 0, s"KL must be >= 0: $ab / $ba")
    // H(P,Q) = H(P) + KL(P||Q) >= KL(P||Q)
    assert(xe >= ab)
  }

  test("truncation loss: lost <= total, truncated <= docs, ppm consistent") {
    CorpusOps.truncationLoss(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("tokens_lost") <= r.getAs[Long]("tokens_total"))
      assert(r.getAs[Long]("n_truncated") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("loss_ppm") <= 1000000L)
    }
  }

  test("keyness: <=3 terms per lang, G2 descending, positive keyness only") {
    val rows = TextAnalysis.keynessG2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val g2s = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("g2_milli"))
      assert(g2s.zip(g2s.tail).forall { case (a, b) => a >= b })
      rs.foreach(r => assert(r.getAs[Long]("g2_milli") >= 0))
    }
  }

  // ---- warehouse -------------------------------------------------

  test("accumulating snapshot: lags non-negative, in-flight <= orders") {
    val rows = WarehouseEtl.accumulatingSnapshot(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in_flight") <= r.getAs[Long]("n_orders"))
      if (!r.isNullAt(r.fieldIndex("avg_ship_window_days_milli")))
        assert(r.getAs[Long]("avg_ship_window_days_milli") >= 0)
    }
  }

  // ---- codecs ----------------------------------------------------

  test("npy header: parse round-trips the synthesized layout") {
    val rows = Multimodal.npyHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("v1_ok") &&
        r.getAs[Boolean]("c_order_ok") && r.getAs[Boolean]("aligned_ok"))
      assert(r.getAs[String]("descr") === "<f4")
      val rows0 = r.getAs[Long]("rows"); val cols0 = r.getAs[Long]("cols")
      assert(rows0 >= 8 && rows0 < 40 && cols0 >= 16 && cols0 < 64)
      assert(r.getAs[Long]("data_bytes") === rows0 * cols0 * 4)
      assert((10 + r.getAs[Long]("header_len")) % 64 === 0)
    }
  }

  test("gzip header: NUL scan finds the fname, bit field decodes") {
    val rows = Multimodal.gzipHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("deflate_ok") &&
        r.getAs[Boolean]("has_fname") && r.getAs[Boolean]("os_unix"))
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("fname") === s"doc$id.txt")
      assert(r.getAs[Long]("header_size") === 11 + s"doc$id.txt".length)
      assert(r.getAs[Long]("mtime") === 1700000000L + id)
    }
  }

  test("contamination spans: positions ordered, share bounded, hits >= distinct grams") {
    val rows = CorpusOps.contaminationSpans(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("first_pos") <= r.getAs[Long]("last_pos"))
      assert(r.getAs[Long]("n_hit_positions") >= r.getAs[Long]("n_eval_ngrams"))
      assert(r.getAs[Long]("hit_share_ppm") <= 1000000L)
    }
  }

  test("sample audit: rates near design points, overlap <= both margins") {
    val r = CorpusOps.sampleAudit(spark, sf).collect()(0)
    val bern = r.getAs[Long]("bern_rate_ppm"); val sys = r.getAs[Long]("sys_rate_ppm")
    assert(bern > 30000 && bern < 250000, s"bernoulli rate $bern far from 10%")
    assert(sys > 30000 && sys < 250000, s"systematic rate $sys far from 10%")
    assert(r.getAs[Long]("n_both") <=
      math.min(r.getAs[Long]("n_bernoulli"), r.getAs[Long]("n_systematic")))
  }

  test("lang overlap: jaccard bounded, shared <= min vocab, pairs ordered") {
    val rows = TextAnalysis.langOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") < r.getAs[String]("lang_b"))
      assert(r.getAs[Long]("n_shared") <=
        math.min(r.getAs[Long]("vocab_a"), r.getAs[Long]("vocab_b")))
      assert(r.getAs[Long]("jaccard_ppm") <= 1000000L)
    }
  }

  test("qualify topk: <= 2 rows per customer, rank order by price desc") {
    val rows = SqlSurface.qualifyTopk(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      assert(rs.length <= 2)
      if (rs.length == 2) {
        val s = rs.sortBy(_.getAs[Long]("rk"))
        assert(s(0).getAs[Double]("price") >= s(1).getAs[Double]("price"))
      }
    }
  }

  test("parquet footer: end-anchored offsets round-trip the framing") {
    val rows = Multimodal.parquetFooter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("head_magic_ok") && r.getAs[Boolean]("tail_magic_ok"))
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("data_bytes") === 64 + (id * 7) % 192)
      assert(r.getAs[Long]("num_rows") === 100 + id % 900)
      val meta = s"rows=${r.getAs[Long]("num_rows")},cols=${r.getAs[Long]("num_cols")}"
      assert(r.getAs[Long]("footer_len") === meta.length)
    }
  }

  test("warc record: text-protocol parse + next-record offset arithmetic") {
    val rows = Multimodal.warcRecord(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("version_ok"))
      assert(r.getAs[String]("warc_type") === "response")
      assert(r.getAs[String]("host").endsWith(".example.org"))
      assert(r.getAs[Long]("next_record_offset") ===
        r.getAs[Long]("header_bytes") + r.getAs[Long]("content_length") + 4)
    }
  }
}
