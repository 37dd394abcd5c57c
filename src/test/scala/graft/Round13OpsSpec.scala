package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-13 operators: local clustering coefficient, edge
  * reciprocity, Anderson–Darling split audit, pinball loss, corpus
  * entropy rate, mojibake census, dedup threshold curve, and the
  * three new codecs (TAR / ZIP-EOCD / MP4). */
class Round13OpsSpec extends SparkSpec {

  // ---- graph ------------------------------------------------------

  test("clustering coeff: deciles bounded, corner credit = 3x triangle count") {
    val rows = GraphOps.clusteringCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    var sumTri = 0L
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0 && d <= 10, s"decile $d out of range")
      assert(r.getAs[Long]("n_nodes") > 0)
      sumTri += r.getAs[Long]("sum_triangles")
    }
    // every triangle is credited to exactly 3 corners
    val nTri = GraphOps.triangles(spark, sf).collect()(0).getAs[Long]("n_triangles")
    assert(sumTri === 3 * nTri, s"corner credit $sumTri != 3x$nTri")
  }

  test("reciprocity: bounded ratios, weighted <= unweighted pair mass identities") {
    val r = GraphOps.reciprocity(spark, sf).collect()(0)
    val nE = r.getAs[Long]("n_edges"); val nR = r.getAs[Long]("n_recip_edges")
    val wT = r.getAs[Long]("w_total"); val wR = r.getAs[Long]("w_recip")
    assert(nE > 0 && nR >= 0 && nR <= nE)
    assert(wR >= 0 && wR <= wT)
    assert(r.getAs[Long]("recip_micro") >= 0 && r.getAs[Long]("recip_micro") <= 1000000L)
    assert(r.getAs[Long]("w_recip_micro") >= 0 && r.getAs[Long]("w_recip_micro") <= 1000000L)
  }

  test("reciprocity on a hand graph: a<->b reciprocated, a->c not") {
    import spark.implicits._
    // u1 alternates a,b,a,b (3 transitions: a->b, b->a, a->b);
    // u2 goes a,c (1 transition a->c). min(w(ab), w(ba)) = 1 each way.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      (1L, "a", t(0), 1L), (1L, "b", t(1), 2L), (1L, "a", t(2), 3L),
      (1L, "b", t(3), 4L),
      (2L, "a", t(0), 5L), (2L, "c", t(1), 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = ev.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("event_type"))
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    val got = edges.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "b")) === 2L && got(("b", "a")) === 1L && got(("a", "c")) === 1L)
    // edges a->b, b->a, a->c: 2 of 3 reciprocated; w: min(2,1)+min(1,2)+0 = 2 of 4
  }

  // ---- stats ------------------------------------------------------

  test("anderson-darling: md5 split key passes uniformity, a clumped key fails") {
    val r = StatsOps.andersonDarling(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") > 0)
    // md5 is uniform: A2 should be well under the 5% critical value
    assert(r.getAs[Boolean]("uniform_ok_5pct"),
      s"md5 hash flagged non-uniform: a2_milli=${r.getAs[Long]("a2_milli")}")
    assert(r.getAs[Long]("a2_milli") > -1000L) // A2 is near 0+, never << 0
  }

  // ---- ml ---------------------------------------------------------

  test("pinball loss: q50 on the mean is symmetric-ish, q90 under-forecast costs more") {
    val rows = MlEval.pinballLoss(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySeg = rows.groupBy(_.getAs[String]("seg"))
    bySeg.foreach { case (_, rs) =>
      val byQ = rs.map(r => r.getAs[Long]("q_pct") -> r).toMap
      assert(byQ.keySet === Set(10L, 50L, 90L))
      // predictions ordered with the quantile (0.1x < 0.9x < 1.7x mean)
      assert(byQ(10L).getAs[Long]("pred_cents") < byQ(50L).getAs[Long]("pred_cents"))
      assert(byQ(50L).getAs[Long]("pred_cents") < byQ(90L).getAs[Long]("pred_cents"))
      rs.foreach(r => assert(r.getAs[Long]("pinball_milli") >= 0))
    }
  }

  // ---- corpus / text ---------------------------------------------

  test("entropy rate: 0 <= H(bigram|unigram), H(bigram) >= H(unigram) on real text") {
    val r = CorpusOps.entropyRate(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_tokens") > r.getAs[Long]("n_bigrams"))
    assert(r.getAs[Long]("h_unigram_micro") > 0)
    assert(r.getAs[Long]("h_bigram_micro") >= r.getAs[Long]("h_unigram_micro"))
    val rate = r.getAs[Long]("entropy_rate_micro")
    // conditional entropy is within [0, H(unigram)] up to micro rounding
    assert(rate >= -1 && rate <= r.getAs[Long]("h_unigram_micro") + 1)
  }

  test("mojibake: injected slices are detected, disjoint-remainder docs are clean") {
    val r = TextAnalysis.mojibake(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_docs")
    assert(r.getAs[Long]("docs_utf8_latin1") > 0)
    assert(r.getAs[Long]("docs_replacement") > 0)
    assert(r.getAs[Long]("docs_c1_control") > 0)
    // each injected doc carries >= 2 hits of its class by construction
    assert(r.getAs[Long]("hits_utf8_latin1") >= 2 * r.getAs[Long]("docs_utf8_latin1"))
    assert(r.getAs[Long]("hits_replacement") === 2 * r.getAs[Long]("docs_replacement"))
    assert(r.getAs[Long]("docs_clean") > 0 && r.getAs[Long]("docs_clean") < n)
  }

  // ---- dedup ------------------------------------------------------

  test("threshold curve: survivor counts are a non-increasing cumulative of bins") {
    val rows = Dedup.thresholdCurve(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    // cumulative-from-above: pairs_at_or_above non-increasing in bucket
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("pairs_at_or_above") >=
          hi.getAs[Long]("pairs_at_or_above"))
      case _ =>
    }
    // lowest bin's cumulative = total pairs
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(rows.head.getAs[Long]("pairs_at_or_above") === total)
    // jaccard >= 0.3 floor ⇒ bucket >= 6
    rows.foreach(r => assert(r.getAs[Long]("bucket") >= 6 &&
      r.getAs[Long]("bucket") <= 20))
  }

  test("edge support: histogram covers all edges, support-0 row present on a star graph") {
    val rows = GraphOps.edgeSupport(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_edges")).sum
    val nEdges = GraphOps.triangles(spark, sf).collect()(0).getAs[Long]("n_edges")
    assert(total === nEdges, s"support census covers $total of $nEdges edges")
    // support x n_edges summed over histogram = 3 x triangles
    val mass = rows.map(r => r.getAs[Long]("support") * r.getAs[Long]("n_edges")).sum
    val nTri = GraphOps.triangles(spark, sf).collect()(0).getAs[Long]("n_triangles")
    assert(mass === 3 * nTri, s"edge-support mass $mass != 3x$nTri")
  }

  test("scd6: type-2 rows carry type-1 current and type-3 prev consistently") {
    val rows = WarehouseEtl.scd6(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      assert(sorted.head.getAs[Long]("version") === 1L)
      assert(sorted.head.getAs[String]("prev_state") === "<none>")
      // exactly one current row; its state is the type-1 column on ALL rows
      val curr = sorted.filter(_.getAs[Boolean]("is_current"))
      assert(curr.length === 1)
      val c = curr.head.getAs[String]("state")
      sorted.foreach { r =>
        assert(r.getAs[String]("current_state") === c)
      }
      // type-3 prev = previous version's state
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getAs[String]("prev_state") === p.getAs[String]("state"))
          assert(n.getAs[String]("state") !== p.getAs[String]("state"))
        case _ =>
      }
    }
  }

  test("runs test: identities hold and the moments are the textbook ones") {
    val r = StatsOps.runsTest(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_days")
    val nA = r.getAs[Long]("n_above"); val nB = r.getAs[Long]("n_below")
    val runs = r.getAs[Long]("n_runs")
    assert(nA + nB === n)
    assert(runs >= 1 && runs <= n)
    // z recomputation matches the op's rounding
    val mu = 1.0 + 2.0 * nA * nB / n.toDouble
    val s2 = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    assert(r.getAs[Long]("z_milli") === math.round(1e3 * (runs - mu) / math.sqrt(s2)))
  }

  test("burstiness: Fano factor >= 0, df floor respected, ranked without gaps") {
    val rows = TextAnalysis.burstiness(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") === i + 1)
      assert(r.getAs[Long]("df") >= 20)
      assert(r.getAs[Long]("burstiness_milli") >= 0)
      assert(r.getAs[Long]("mean_milli") >= 1000L) // mean >= 1 by containment
    }
    // ranked descending
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("burstiness_milli") >=
        b.getAs[Long]("burstiness_milli"))
      case _ =>
    }
  }

  test("heaps law: beta in (0,1), monotone growth, full-corpus checkpoint sane") {
    val r = CorpusOps.heapsLaw(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_checkpoints") === 8L)
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0, s"beta $beta outside (0,1)")
    assert(r.getAs[Double]("fit_r") > 0.9,
      "log-log type growth should be near-linear")
    assert(r.getAs[Long]("v_terms_full") > 0 &&
      r.getAs[Long]("v_terms_full") < r.getAs[Long]("n_tokens_full"))
  }

  test("hurst: H in a sane band, all four sizes contribute full blocks") {
    val r = TimeSeries.hurst(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_sizes") === 4L)
    assert(r.getAs[Long]("n_blocks") > 4L)
    val h = r.getAs[Long]("hurst_milli")
    // R/S estimates live in (0, 1); allow the small-sample bias band
    assert(h > 0L && h < 1200L, s"hurst_milli $h implausible")
  }

  test("code detect: injected slice flagged, symbol density separates the classes") {
    val r = TextAnalysis.codeDetect(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_docs")
    val nCode = r.getAs[Long]("n_code")
    assert(nCode > 0 && nCode < n)
    assert(nCode + r.getAs[Long]("n_prose") === n)
    // every 9th doc gets the code tail; detection should match that slice
    assert(nCode === (0L until n).count(_ % 9 == 0))
    assert(r.getAs[Long]("code_symbol_permille") >
      r.getAs[Long]("prose_symbol_permille"))
    assert(r.getAs[Long]("snake_idents") > 0 && r.getAs[Long]("camel_idents") > 0)
  }

  test("elf header: fixed-offset LE fields round-trip, shstrndx identity holds") {
    val rows = Multimodal.elfHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("is_elf64") &&
        r.getAs[Boolean]("is_little_endian"))
      assert(r.getAs[String]("e_type") === (if (id % 2 == 0) "EXEC" else "DYN"))
      assert(r.getAs[Long]("entry") === 0x400000L + id * 16)
      assert(r.getAs[Boolean]("shstrndx_ok"))
    }
  }

  test("rolling regression: peak >= trough, bins are real timestamps") {
    val rows = Windows.rollingRegression(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_slope_milli") >= r.getAs[Long]("trough_slope_milli"))
      assert(r.getAs[String]("peak_bin").matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}"))
    }
  }

  // ---- codecs -----------------------------------------------------

  test("tar header: octal fields parse back and the recomputed checksum matches") {
    val rows = Multimodal.tarHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("name") === s"doc$id.txt")
      assert(r.getAs[Long]("mtime") === 1700000000L + id)
      assert(r.getAs[Boolean]("chksum_ok"), s"checksum mismatch doc $id")
      assert(r.getAs[Boolean]("magic_ok") && r.getAs[Boolean]("is_regular_file"))
    }
  }

  test("zip eocd: backward signature scan finds the EOCD behind a variable comment") {
    val rows = Multimodal.zipEocd(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_entries") === 1 + id % 16)
      assert(r.getAs[Long]("cd_size") === (1 + id % 16) * 55)
      assert(r.getAs[String]("comment") === s"graft-shard-${id % 50}")
      assert(r.getAs[Boolean]("structure_ok"), s"offset identity broken doc $id")
    }
  }

  test("mp4 boxes: chained box offsets, nested mvhd, exact duration arithmetic") {
    val rows = Multimodal.mp4Boxes(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ftyp_ok") && r.getAs[Boolean]("moov_ok"))
      assert(r.getAs[String]("brand") === "isom")
      assert(Set(600L, 1000L, 90000L).contains(r.getAs[Long]("timescale")))
      assert(r.getAs[Long]("duration_ms") * r.getAs[Long]("timescale") ===
        r.getAs[Long]("duration") * 1000L)
      assert(r.getAs[Boolean]("sizes_ok"))
    }
  }
}
