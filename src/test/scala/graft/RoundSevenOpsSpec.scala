package graft

import graft.operators.{CorpusOps, Dedup, Multimodal, Similarity, TextAnalysis, TimeSeries, WarehouseEtl}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Laws for the round-7 additions: LM-score bucketing, DSIR weights,
  * MERGE upsert, WAV header decode, the stream interval-join twin,
  * hard-negative mining, and the epoch shard shuffle. */
class RoundSevenOpsSpec extends SparkSpec {

  test("ppl buckets: per-lang thirds cover every scored doc, head >= tail") {
    val b = CorpusOps.pplBuckets(spark, sf).collect()
    val langs = b.map(_.getString(0)).distinct
    assert(langs.length === 5)
    for (l <- langs) {
      val rows = b.filter(_.getString(0) == l).map(r =>
        r.getString(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(rows.keySet === Set("head", "middle", "tail"))
      // ntile thirds: sizes differ by at most 1
      val sizes = rows.values.map(_._1)
      assert(sizes.max - sizes.min <= 1)
      // ranking is descending: head's worst score >= tail's best
      assert(rows("head")._3 >= rows("tail")._2)
    }
  }

  test("dsir weights: every doc scored once; disjoint-vocab target separates") {
    // structural, on the real corpus: one weight per doc, all finite
    val w = CorpusOps.dsirWeights(spark, sf)
    assert(w.count() === Tables.documents(spark, sf).count())
    assert(w.where(isnan(col("dsir_weight")) || col("dsir_weight").isNull).count() === 0)
    // behavioral, on a corpus where the answer is provable: the en
    // (target) docs use a disjoint vocabulary, so the likelihood
    // ratio MUST rank them above the rest (the sf corpus's shared
    // synthetic vocabulary makes en-vs-rest there a coin flip)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsirspec").toString
    (1 to 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta", "en", "s", 22L)
      else (i.toLong, "uno dos tres cuatro", "es", "s", 19L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sep = CorpusOps.dsirWeights(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(avg(col("dsir_weight")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sep("en") > sep("es"),
      s"target-vocab docs must outscore: ${sep("en")} vs ${sep("es")}")
  }

  test("merge upsert: clause semantics hold row-by-row") {
    val m = WarehouseEtl.mergeUpsert(spark, sf)
    val actions = m.select("action").distinct().collect().map(_.getString(0)).toSet
    // the bounded sf corpus need not exercise every clause (tiny logs
    // have every user on both sides of the cutoff) — but nothing
    // outside the clause alphabet may ever appear, deletes included
    assert(actions.subsetOf(Set("insert", "update", "keep")))
    // no user appears twice post-merge (it is a dim table)
    assert(m.select("user_id").distinct().count() === m.count())
    // matched rows whose source state is 'error' were deleted: no
    // surviving 'update' row may carry state 'error'
    assert(m.where(col("action") === "update" && col("state") === "error").count() === 0)
  }

  test("merge upsert: every clause fires on a crafted change log") {
    import spark.implicits._
    val cutoff = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: target only (keep); u2: both, source lands on error (delete);
    // u3: both, normal (update); u4: source only (insert)
    val dir = java.nio.file.Files.createTempDirectory("mergespec").toString
    Seq(
      (1L, t("2024-01-10 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, t("2024-01-10 00:00:00"), 2L, "view", 2.0, "{}"),
      (3L, t("2024-01-22 00:00:00"), 2L, "error", 2.5, "{}"),
      (4L, t("2024-01-10 00:00:00"), 3L, "view", 3.0, "{}"),
      (5L, t("2024-01-23 00:00:00"), 3L, "purchase", 3.5, "{}"),
      (6L, t("2024-01-24 00:00:00"), 4L, "signup", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = WarehouseEtl.mergeUpsert(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(m === Map(
      1L -> ("keep", "view"),
      3L -> ("update", "purchase"),
      4L -> ("insert", "signup")))
    assert(!m.contains(2L), "matched-and-error row must be deleted")
  }

  test("wav header: parse is the exact inverse of the synthesizer") {
    val rows = Multimodal.wavHeader(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (docId, channels, rate) = (r.getLong(0), r.getLong(3), r.getLong(4))
      assert(r.getBoolean(1) && r.getBoolean(2)) // magic_ok, pcm_ok
      assert(channels === 1 + docId % 2)
      assert(Set(8000L, 12000L, 16000L, 20000L, 24000L, 28000L, 32000L, 36000L)(rate))
      // duration is consistent with the parsed fields themselves
      assert(r.getLong(7) === r.getLong(6) * 1000 / (rate * channels * 2))
    }
  }

  test("wav header: a flipped byte breaks the magic, not the parser") {
    import spark.implicits._
    // corrupt the RIFF tag's first byte: magic_ok must go false
    val wav = Seq(("53494646" + "00000000" + "57415645")).toDF("hexhead")
      .select(unhex(concat(col("hexhead"),
        lit("666D74201000000001000100401F0000807D0000020010006461746100000000"))).as("p"))
    val parsed = wav.select(Multimodal.parseWavHeader(col("p")).as("h"))
      .select(col("h.magic_ok"), col("h.sample_rate")).head()
    assert(parsed.getBoolean(0) === false)
    assert(parsed.getLong(1) === 8000L) // LE 401F0000 still parses
  }

  test("interval join: every pair is same-user and inside (0, 1h]") {
    val rows = Streams.intervalJoinBatch(spark, sf)
      .withColumn("gap_s",
        unix_timestamp(col("p_ts")) - unix_timestamp(col("err_ts")))
    assert(rows.where(col("gap_s") <= 0 || col("gap_s") > 3600).count() === 0)
    // twin discipline: the streaming query builds the same pair set
    // semantics (watermarked interval join) — pin the batch row count
    // as the oracle the stream must reproduce
    assert(rows.count() > 0)
  }

  test("hard negatives: margin equals pos minus neg; self never mined") {
    val h = Similarity.hardNegatives(spark, sf)
    assert(h.count() > 0)
    assert(h.where(col("pos_id") === col("anchor") ||
      col("neg_id") === col("anchor")).count() === 0)
    assert(h.where(col("label") === col("neg_label")).count() === 0)
    val bad = h.where(
      abs(col("margin") - round(col("pos_cosine") - col("neg_cosine"), 6)) > 1e-5)
    assert(bad.count() === 0)
  }

  test("epoch shuffle: censuses partition the corpus; epochs reshuffle") {
    val s = CorpusOps.shuffleBlocks(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    for (epoch <- Seq(1, 2)) {
      val rows = s.filter(_.getInt(0) == epoch)
      assert(rows.map(_.getLong(2)).sum === nDocs)
    }
    // a reshuffle: the two epochs' (shard -> first_doc) maps differ
    val firsts = s.map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(4)).toMap
    val sameEverywhere = firsts.collect {
      case ((1, shard), d) if firsts.contains((2, shard)) => firsts((2, shard)) == d
    }
    assert(sameEverywhere.exists(_ == false), "epoch 2 must permute differently")
  }

  test("standardize: every dimension re-centers to mean 0, std 1") {
    val z = Similarity.embedStandardize(spark, sf)
      .select(col("zval")).collect().map(_.getDouble(0))
    val n = z.length
    val mean = z.sum / n
    val sd = math.sqrt(z.map(x => (x - mean) * (x - mean)).sum / n)
    // pooled over all dims: each dim is exactly (0,1) up to output
    // rounding, so the pool must be too
    assert(math.abs(mean) < 1e-3, s"pooled mean $mean")
    assert(math.abs(sd - 1.0) < 1e-3, s"pooled sd $sd")
  }

  test("quantize: int8 range, scale-bounded reconstruction error") {
    val rows = Similarity.embedQuantize(spark, sf).collect()
    val byVec = rows.groupBy(_.getLong(0))
    for ((_, vrows) <- byVec) {
      val scale = vrows.head.getDouble(3)
      val q = vrows.map(_.getLong(2))
      assert(q.forall(v => v >= -127 && v <= 127))
      // symmetric quantization: the per-component error is at most
      // half a step, so the mean abs error is too
      assert(vrows.head.getDouble(4) <= scale / 2 + 1e-9)
      // the max-magnitude component must hit full scale
      assert(q.map(math.abs).max === 127L || scale == 0.0)
    }
  }

  test("knn classify: prediction is a neighbor label with a winning vote") {
    val p = Similarity.knnClassify(spark, sf).collect()
    assert(p.length > 0)
    for (r <- p) {
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 3) // knnK = 3
      assert(r.getBoolean(4) === (r.getLong(1) == r.getLong(2)))
    }
  }

  test("normalize: idempotent, lowercase, single-spaced, lengths consistent") {
    val n = CorpusOps.normalizeText(spark, sf).collect()
    assert(n.length === Tables.documents(spark, sf).count())
    for (r <- n) {
      val t = r.getString(1)
      assert(t == t.toLowerCase)
      assert(!t.contains("  ") && t == t.trim)
      assert(r.getLong(3) === t.length.toLong)
      // idempotence: a normalized string survives re-normalization
      assert(t.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim == t)
    }
  }

  test("containment: a short doc inside a long one is a_in_b at cont_a 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    // doc 2's tokens are a strict subset of doc 1's; identical prefix
    // keeps them in one minhash band bucket
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val short = "alpha beta gamma delta epsilon zeta"
    Seq((1L, long, "en", "s", long.length.toLong),
      (2L, short, "en", "s", short.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.containment(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // doc_b (the short one) is fully contained: cont_b = 1
    assert(r.getDouble(3) === 1.0)
    assert(r.getString(4) === "b_in_a")
  }

  test("containment bounds jaccard from above on the real corpus") {
    val jac = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cont = Dedup.containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        math.max(r.getDouble(2), r.getDouble(3))).toMap
    // every jaccard-verified pair must also clear the (lower)
    // containment bar, and with max-containment >= jaccard
    for ((pair, j) <- jac) {
      assert(cont.contains(pair), s"pair $pair jaccard $j missing")
      assert(cont(pair) >= j - 1e-9)
    }
  }

  test("sparse cosine: identical docs score exactly 1; pairs are ordered") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sparsecos").toString
    Seq((1L, "quark lepton boson hadron muon", "en", "s", 30L),
      (2L, "quark lepton boson hadron muon", "en", "s", 30L),
      (3L, "rose tulip daisy orchid fern", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.sparseCosine(spark, dir).collect()
    assert(rows.length === 1)
    assert((rows(0).getLong(0), rows(0).getLong(1)) === ((1L, 2L)))
    assert(rows(0).getDouble(2) === 1.0)
    val real = TextAnalysis.sparseCosine(spark, sf).collect()
    assert(real.forall(r => r.getLong(0) < r.getLong(1)))
    assert(real.forall(r => r.getDouble(2) >= 0.7 && r.getDouble(2) <= 1.0))
  }

  test("mad outliers: robust to the planted spike a mean would absorb") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("madspec").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 99).map(i =>
      (i.toLong, ts0, i.toLong % 7, "t", 10.0 + (i % 5), "{}")) :+
      (100L, ts0, 1L, "t", 100000.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = TimeSeries.outlierMad(spark, dir).collect()
    assert(out.length === 1)
    // the spike is the ONLY outlier: median/MAD ignore it, so the
    // gate sits near the bulk and only the planted value trips it
    assert(out(0).getLong(4) === 1L)
    assert(out(0).getDouble(1) === 12.0) // median of 10..14 bulk
  }

  test("sessionize: 30-minute gaps split sessions exactly") {
    import graft.operators.Windows
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // user 1: 0m, 10m (same session), 50m (40m gap -> new session)
    // user 2: one lone event
    Seq((1L, ts(0), 1L, "a", 1.0, "{}"), (2L, ts(10), 1L, "a", 2.0, "{}"),
      (3L, ts(50), 1L, "a", 3.0, "{}"), (4L, ts(0), 2L, "a", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val s = Windows.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(s === Map((1L, 1L) -> ((2L, 600L)), (1L, 2L) -> ((1L, 0L)),
      (2L, 1L) -> ((1L, 0L))))
  }

  test("mode: per-status winner carries the plurality; censuses add up") {
    import graft.operators.Aggregations
    val m = Aggregations.modePerGroup(spark, sf).collect()
    assert(m.nonEmpty)
    val total = m.map(_.getLong(3)).sum
    assert(total === Tables.orders(spark, sf).count())
    for (r <- m) {
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3))
      // plurality: the mode covers at least 1/5 of the group (5
      // priorities exist, the max count can't be below the mean)
      assert(r.getLong(2) * 5 >= r.getLong(3))
    }
  }

  test("snapshot diff: statuses partition the union; drift only on change") {
    import graft.operators.WarehouseEtl
    val d = WarehouseEtl.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d.keySet === Set("added", "removed", "changed", "unchanged"))
    assert(d("unchanged")._2 === 0L)
    assert(d("changed")._2 > 0L)
    val keys = Tables.orders(spark, sf).select(col("o_orderkey")).collect()
      .map(_.getLong(0))
    val inUnion = keys.count(k => k % 97 != 0 || k % 89 != 0)
    assert(d.values.map(_._1).sum === inUnion.toLong)
    assert(d("added")._1 === keys.count(k => k % 97 == 0 && k % 89 != 0).toLong)
    assert(d("removed")._1 === keys.count(k => k % 89 == 0 && k % 97 != 0).toLong)
  }

  test("drift monitor: identical cohorts show exactly zero drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("driftspec").toString
    // vec 2i and 2i+1 are identical -> even/odd cohorts have the SAME
    // integer moment sums -> Welch z is exactly 0 on every dimension
    val rows = (0 until 100).flatMap { i =>
      val v = Array.tabulate(64)(d => ((i * 13 + d * 7) % 11 - 5) * 0.1f).toSeq
      Seq((2L * i, v, 0), (2L * i + 1, v, 1))
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.driftMonitor(spark, dir).collect()
    assert(out.length === 64)
    for (r <- out) {
      assert(r.getDouble(3) === 0.0, s"dim ${r.getLong(0)} z=${r.getDouble(3)}")
      assert(!r.getBoolean(4))
    }
  }

  test("recall@k: per-query recall is n_hits/k and bounded") {
    val r = Similarity.recallAtK(spark, sf).collect()
    assert(r.length === 10) // one row per probe query
    for (row <- r) {
      val (hits, recall) = (row.getLong(1), row.getDouble(2))
      assert(hits >= 0 && hits <= 5)
      assert(recall === hits / 5.0)
    }
  }

  test("pca: a planted dominant axis is recovered with its variance share") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pcaspec").toString
    // dim 5 (0-based 4) carries ±10, every other dim a tiny
    // deterministic wiggle — PC1 must load dim 5 at |1.0| and claim
    // nearly all the variance
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(64)(d =>
        if (d == 4) (if (i % 2 == 0) 10.0f else -10.0f)
        else ((i * 7 + d * 3) % 5 - 2) * 0.01f)
      (i.toLong, v.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.pcaTopComponent(spark, dir).collect()
    assert(out.length === 64)
    val byPos = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(byPos(5L)) === 1.0, s"dim 5 loading ${byPos(5L)}")
    for ((p, l) <- byPos if p != 5L) assert(math.abs(l) < 0.01, s"dim $p loads $l")
    assert(out.head.getDouble(2) > 0.99, s"explained ${out.head.getDouble(2)}")
  }

  test("bpe train: provable merges on a constructed corpus; early stop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetrain").toString
    // one word "abab" x3: round 1 must merge (a,b) cnt 6, round 2
    // (ab,ab) cnt 3, then no pairs remain -> early exhaustion at 2 of
    // the 8 requested rounds
    Seq((1L, "abab abab abab", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = CorpusOps.bpeTrain(spark, dir).collect()
    assert(m.length === 2)
    assert((m(0).getInt(0), m(0).getString(1), m(0).getString(2),
      m(0).getString(3), m(0).getLong(4)) === ((1, "a", "b", "ab", 6L)))
    assert((m(1).getInt(0), m(1).getString(1), m(1).getString(2),
      m(1).getString(3), m(1).getLong(4)) === ((2, "ab", "ab", "abab", 3L)))
  }

  test("bpe e2e: learned vocab tokenizes its own training corpus losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpee2e").toString
    Seq((1L, "abab abab abab", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // merges learned: ab, abab -> greedy longest-match collapses each
    // word to ONE piece
    val r = CorpusOps.bpeE2e(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 3L) // ws tokens
    assert(r(0).getLong(3) === 3L) // one learned piece per word
    // roundtrip on the real corpus: every piece sequence rebuilds its
    // document exactly (spaces removed), and compression is real
    val e2e = CorpusOps.bpeE2e(spark, sf).collect()
    for (row <- e2e) {
      assert(row.getLong(3) >= row.getLong(2), "a word is >= 1 piece")
    }
    val merges = CorpusOps.bpeTrain(spark, sf).collect().map(_.getString(3))
      .filter(p => p.length >= 2 && p.length <= graft.functions.BpeVocab.maxPieceLen)
    val vocab = new graft.functions.BpeVocab(merges.distinct.toSeq)
    val bad = Tables.documents(spark, sf)
      .select(col("text"),
        concat_ws("", graft.api.Graft.bpeTokens(col("text"), vocab)).as("rebuilt"))
      .where(col("rebuilt") =!= regexp_replace(col("text"), " ", ""))
      .count()
    assert(bad === 0L, "piece concatenation must rebuild every doc")
  }

  test("span corrupt: sentinel counts reconcile corrupted + target with the doc") {
    val rows = CorpusOps.spanCorrupt(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (corrupted, target) = (r.getString(1), r.getString(2))
      val (nMasked, nSpans, nToks) = (r.getLong(3), r.getLong(4), r.getLong(5))
      def count(s: String) = if (s.isEmpty) 0L else s.split(" ").length.toLong
      // each span: input loses its tokens, gains one sentinel; target
      // holds sentinel + the original span tokens
      assert(count(corrupted) === nToks - nMasked + nSpans)
      assert(count(target) === nMasked + nSpans)
      assert(corrupted.split(" ").count(_ == "<mask>") === nSpans)
    }
  }

  test("compact: 64 micro-files become size-derived few, rows and content intact") {
    val dir = java.nio.file.Files.createTempDirectory("compactspec").toString + "/t"
    val src = Tables.orders(spark, sf)
    src.repartition(64).write.parquet(dir)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum(col("o_orderkey"))).head().getLong(0)
    val (before, after) = graft.api.Graft.compact(spark, dir)
    assert(before === 64)
    assert(after < 8, s"expected few large files, got $after")
    val d = spark.read.parquet(dir)
    assert(d.count() === src.count())
    assert(d.agg(sum(col("o_orderkey"))).head().getLong(0) === sumBefore)
    // the staging dirs are gone — a failure can't leave two copies
    assert(!new java.io.File(dir + "__compacting").exists())
    assert(!new java.io.File(dir + "__precompact").exists())
  }

  test("try casts: bad shapes null out, good shapes parse, nothing throws") {
    import graft.operators.Extras
    val t = Extras.tryCasts(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // purchase rows: decimal strings parse as double, integral as int
    assert(t("purchase")._2 === t("purchase")._1)
    assert(t("purchase")._3 === t("purchase")._1)
    // click rows are prefixed garbage; view rows empty; signup overflows int
    assert(t("click")._2 === 0L && t("click")._3 === 0L)
    assert(t("view")._2 === 0L && t("view")._3 === 0L)
    assert(t("signup")._3 === 0L)
    // divide-by-zero denominator nulls out for every row, never errors
    assert(t.values.forall(_._4 == 0L))
  }

  test("bpe train: real corpus runs 8 rounds with non-increasing merge freq") {
    val m = CorpusOps.bpeTrain(spark, sf).collect()
    assert(m.map(_.getInt(0)).toSeq === (1 to 8))
    for (r <- m) assert(r.getString(3) === r.getString(1) + r.getString(2))
    // each merge's pair count bounds every later merge's: new pairs
    // created by a merge occur at most as often as the merge itself
    val counts = m.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
