package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization specs: the native encode against a plain-Scala
  * reference, reconstruction geometry, census totality, and recall of
  * the shortlist + exact-re-rank pipeline vs brute force. */
class PqSpec extends SparkSpec {

  private val dim = 64
  private val subDim = dim / Similarity.pqM

  private def vecs: Map[Long, Seq[Double]] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("native pq encode matches a plain-Scala argmin over the same codebook") {
    val cb = Similarity.pqCodebookRows(spark, sf)
    val byM = cb.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    def expected(v: Seq[Double]): Seq[Long] =
      (0 until Similarity.pqM).map { m =>
        val sv = v.slice(m * subDim, (m + 1) * subDim)
        byM(m).map { case (_, code, cv) =>
          val d = sv.zip(cv).foldLeft(0.0) { case (acc, (x, c)) => acc + (x - c) * (x - c) }
          (code, d)
        }.minBy { case (code, d) => (d, code) }._1 // strict-less, ties to smaller code
      }
    val got = Similarity.assignPqCodes(
        Tables.embeddings(spark, sf)
          .withColumn("v", col("embedding").cast("array<double>"))
          .withColumn("vn", lit(1.0)),
        Similarity.pqCbLiteral(cb))
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vs = vecs
    assert(got.keySet === vs.keySet)
    vs.foreach { case (id, v) =>
      assert(got(id) === expected(v), s"vec $id")
    }
  }

  test("pq decode reconstructs each subspace's codeword, full dim, in subspace order") {
    val cb = Similarity.pqCodebookRows(spark, sf)
    val cbMap = cb.map { case (m, code, cv) => (m, code) -> cv }.toMap
    val rows = Similarity.assignPqCodes(
        Tables.embeddings(spark, sf)
          .withColumn("v", col("embedding").cast("array<double>"))
          .withColumn("vn", lit(1.0)),
        Similarity.pqCbLiteral(cb))
      .withColumn("dec",
        call_function("graft_pq_decode", col("codes"), Similarity.pqCbLiteral(cb)))
      .select(col("vec_id"), col("codes"), col("dec"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Long](1)
      val dec = r.getSeq[Double](2)
      assert(dec.length === dim)
      codes.zipWithIndex.foreach { case (code, m) =>
        assert(dec.slice(m * subDim, (m + 1) * subDim) === cbMap((m, code)),
          s"vec ${r.getLong(0)} subspace $m")
      }
    }
  }

  test("pq census accounts for every (vector, subspace) exactly once") {
    val n = Tables.embeddings(spark, sf).count()
    val census = Similarity.pqCodeCensus(spark, sf).collect()
    assert(census.map(_.getAs[Long]("n_vectors")).sum === n * Similarity.pqM)
    // and every code in the census exists in the trained codebook
    val cb = Similarity.pqCodebookRows(spark, sf).map(t => (t._1, t._2)).toSet
    census.foreach { r =>
      assert(cb.contains((r.getAs[Int]("m"), r.getAs[Long]("code"))), r.toString)
    }
  }

  test("pq shortlist + exact re-rank recovers most of the exact top-k (recall)") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val pq = Similarity.pqTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(pq.keySet === exact.keySet)
    val hits = exact.keys.toSeq.map(q => (pq(q) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    val recall = hits.toDouble / total
    // near-uniform random vectors are the WORST case for quantization
    // (reconstruction error ~ the signal itself); the shortlist+re-rank
    // still has to beat random chance by a wide margin. Measured ~0.5+
    // at sf0.001; a real clustered embedding corpus sits far higher.
    assert(recall >= 0.3, s"recall@5 = $recall")
    info(f"pq recall@5 vs exact: $recall%.2f")
  }

  test("ivf-pq composition: results are a subset-quality view of pq (cells only restrict)") {
    // IVF probing can only REMOVE candidates relative to plain PQ
    // (cells partition the corpus; a query sees nprobe of them), so
    // every ivf-pq neighbor that plain PQ also surfaced must carry
    // the SAME exact cosine — the re-rank tail is shared.
    val pq = Similarity.pqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val ivfpq = Similarity.ivfPqTopK(spark, sf).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      pq.get(key).foreach { c =>
        assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9, key.toString)
      }
    }
    // and it still finds a reasonable share of the exact top-k
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val byQ = ivfpq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val hits = exact.keys.toSeq.map(q => (byQ.getOrElse(q, Set.empty) & exact(q)).size).sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(f"ivf-pq recall@5 vs exact: $recall%.2f")
    assert(recall >= 0.2, s"recall@5 = $recall")
  }

  test("residual codebooks reconstruct strictly better than flat PQ (the FAISS rationale)") {
    // flat reconstruction: decode(encode(v)); residual reconstruction:
    // centroid(cell) + decode(encode(v - centroid(cell))). Same code
    // budget (M × ksub); the residual's smaller magnitude must buy a
    // smaller corpus-mean squared reconstruction error.
    val emb = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("vn", lit(1.0))
    def mse(recon: org.apache.spark.sql.DataFrame): Double =
      recon.select(avg(aggregate(
        zip_with(col("v"), col("r"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (s, x) => s + x))).head().getDouble(0)
    val flatCb = Similarity.pqCbLiteral(Similarity.pqCodebookRows(spark, sf))
    val flat = Similarity.assignPqCodes(emb, flatCb)
      .withColumn("r", call_function("graft_pq_decode", col("codes"), flatCb))
    val (k, _) = Similarity.ivfParams(spark, sf)
    val cents = Similarity.ivfAssigned(spark, sf)
    val resCb = Similarity.pqCbLiteral(Similarity.ivfPqCodebookRows(spark, sf))
    val centsLit = Similarity.centsLiteral(Similarity.centroidRows(spark, sf, k))
    val residual = cents
      .withColumn("rv", call_function("graft_cell_residual", col("v"), col("cell"), centsLit))
      .withColumn("codes", call_function("graft_pq_encode", col("rv"), resCb))
      .withColumn("r", call_function("graft_cell_add",
        call_function("graft_pq_decode", col("codes"), resCb), col("cell"), centsLit))
    val (flatErr, resErr) = (mse(flat), mse(residual))
    info(f"reconstruction MSE — flat: $flatErr%.4f, residual: $resErr%.4f")
    assert(resErr < flatErr,
      s"residual encoding should reduce reconstruction error: flat=$flatErr residual=$resErr")
  }

  test("ivf-pq candidate join is an equi join on the cell (never all-pairs)") {
    val df = Similarity.ivfPqTopK(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("knn graph: <= k descending neighbors per source, cell-bounded plan") {
    val df = Similarity.knnGraph(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (src, rs) =>
      assert(rs.length <= 3, s"src $src has ${rs.length} neighbors")
      val cosines = rs.sortBy(_.getLong(1)).map(_.getAs[Double]("cosine"))
      assert(cosines === cosines.sortBy(-_), s"src $src not descending")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == src), s"src $src self-edge")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("semantic decontamination: per-label totality, eval label excluded") {
    val out = Similarity.semanticDecontaminate(spark, sf).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(0) == 0L), "eval label must not be reported")
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ===
        r.getAs[Long]("n_vectors"), r.toString)
    }
    // something must actually be dropped at the permissive test tau —
    // otherwise the query proves nothing
    assert(out.map(_.getAs[Long]("n_dropped")).sum > 0)
  }

  test("IMI: composite cells multiply the partition space beyond either half's k") {
    val cells = Similarity.imiCells(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_vectors")).sum === n) // total
    val d1 = cells.map(_.getAs[Long]("cell1")).distinct.length
    val d2 = cells.map(_.getAs[Long]("cell2")).distinct.length
    assert(d1 <= Similarity.imiKsub && d2 <= Similarity.imiKsub)
    // the product effect: realized composite cells exceed what either
    // half-space quantizer could partition alone — finer cells from
    // ADDITIVE training cost
    assert(cells.length > math.max(d1, d2),
      s"${cells.length} composite cells from $d1 x $d2 halves")
  }

  test("IMI serving: probed-cell equi join, exact descending ranks, no all-pairs") {
    val df = Similarity.imiTopK(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val vs = vecs
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cosines = rs.sortBy(_.getLong(1)).map(_.getAs[Double]("cosine"))
      assert(cosines === cosines.sortBy(-_), s"query $q not descending")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
    // recall visibility (np=4 per half on the worst-case uniform corpus)
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val by = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recall = exact.keys.toSeq.map(q => (by.getOrElse(q, Set.empty) & exact(q)).size).sum.toDouble /
      exact.values.map(_.size).sum
    info(f"imi recall@5 vs exact: $recall%.2f")
    assert(recall > 0.0)
  }

  test("generic ivfPqIndex facade: any DataFrame, any geometry, deterministic") {
    import spark.implicits._
    // a 12-dim corpus that is NOT the embeddings table: two tight
    // clusters around +1 and -1
    val rows = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0 else -1.0
      (i, Seq.tabulate(12)(d => base + (i % 5) * 0.01 + d * 0.001))
    }
    val df = rows.toDF("item_id", "vec")
    val idx = graft.api.Graft.ivfPqIndex(spark, df, "item_id", "vec",
      cellTarget = 10, nSub = 4, ksub = 4)
    val got = idx.collect()
    assert(got.length === 40)
    // each row carries nSub codes; cells within the derived k = ceil(40/10)
    got.foreach { r =>
      assert(r.getSeq[Long](2).length === 4, r.toString)
      assert(r.getAs[Long]("cell") >= 0 && r.getAs[Long]("cell") < 4, r.toString)
    }
    // deterministic: a rebuild yields the identical index
    val again = graft.api.Graft.ivfPqIndex(spark, df, "item_id", "vec",
      cellTarget = 10, nSub = 4, ksub = 4).collect()
    assert(got.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // the two sign-clusters must not share cells (they are antipodal)
    val cellsBySign = got.groupBy(_.getAs[Long]("item_id") % 2)
      .view.mapValues(_.map(_.getAs[Long]("cell")).toSet).toMap
    assert((cellsBySign(0L) & cellsBySign(1L)).isEmpty)
  }

  test("generic facade preserves non-numeric ids (no silent long cast)") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      (f"doc-$i%02d", Seq.tabulate(8)(d => (if (i % 2 == 0) 1.0 else -1.0) + d * 0.01))
    }
    val df = rows.toDF("doc_key", "vec")
    val idx = graft.api.Graft.ivfPqIndex(spark, df, "doc_key", "vec",
      cellTarget = 10, nSub = 2, ksub = 4).collect()
    assert(idx.map(_.getString(0)).sorted.toSeq === rows.map(_._1).sorted)
    val g = graft.api.Graft.knnGraph(spark, df, "doc_key", "vec", kNeighbors = 1,
      cellTarget = 10).collect()
    assert(g.nonEmpty)
    assert(g.forall(_.getString(0).startsWith("doc-")))
  }

  test("generic knnGraph facade: neighbors stay within their cluster") {
    import spark.implicits._
    val rows = (0L until 30L).map { i =>
      val base = if (i < 15) 1.0 else -1.0
      (i, Seq.tabulate(8)(d => base + (i % 3) * 0.02 + d * 0.001))
    }
    val df = rows.toDF("item_id", "vec")
    val g = graft.api.Graft.knnGraph(spark, df, "item_id", "vec",
      kNeighbors = 2, cellTarget = 15).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      val (src, nb) = (r.getAs[Long]("src"), r.getAs[Long]("neighbor_id"))
      assert((src < 15) === (nb < 15),
        s"neighbor $nb crossed the antipodal cluster of $src")
      assert(r.getAs[Double]("cosine") > 0.9, r.toString)
    }
  }

  test("pq ranks within shortlist are exact-cosine ranks (re-rank really happened)") {
    val pq = Similarity.pqTopK(spark, sf).collect()
    val vs = vecs
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
      dot / (na * nb)
    }
    pq.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // reported cosines are genuinely the exact ones, descending
      sorted.foreach { r =>
        val expected = cos(vs(q), vs(r.getAs[Long]("neighbor_id")))
        assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-5,
          s"query $q neighbor ${r.getAs[Long]("neighbor_id")}")
      }
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines === cosines.sortBy(-_), s"query $q not descending")
    }
  }
}
