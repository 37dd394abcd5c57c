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
