package graft

import graft.api.Graft
import org.apache.spark.sql.functions._

/** The public facade must work on arbitrary user DataFrames — not just
  * the driver's star schema. */
class GraftApiSpec extends SparkSpec {

  test("dedupExact keeps one row per distinct text, minimum id wins") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
      (4L, "alpha beta"), (5L, "delta")).toDF("id", "body")
    val out = Graft.dedupExact(df, "body", "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "alpha beta", 3L -> "gamma", 5L -> "delta"))
  }

  test("nearDupCandidates groups identical texts, row counts preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "completely different text about spark engines")).toDF("id", "body")
    val out = Graft.nearDupCandidates(df, "body", "id").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum === 3)
    val dupGroup = out.filter(_.getAs[Long]("n_rows") == 2)
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("keeper_id") === 1L)
  }

  test("cosineTopK ranks an identical vector first") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0)),   // identical to 1
      (3L, Array(0.0, 1.0, 0.0)),   // orthogonal
      (4L, Array(0.9, 0.1, 0.0))).toDF("id", "vec")
    val out = Graft.cosineTopK(spark, vecs.filter(col("id") === 1), vecs, "id", "vec", 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[Long]("neighbor_id") === 2L)
    assert(math.abs(out(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(out(1).getAs[Long]("neighbor_id") === 4L)
  }

  test("cosineTopKAnn agrees with exact top-k for same-bucket vectors") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val exact = Graft.cosineTopK(spark, q, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val ann = Graft.cosineTopKAnn(spark, q, emb, "vec_id", "embedding", 3).collect()
    ann.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      exact.get(key).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("objectNameAccept replays the reference predicate on raw strings") {
    import spark.implicits._
    val cases = Seq(
      ("minha-pasta/a.xlsx", true),
      ("minha-pasta/a.XLSX", false),  // python endswith is case-sensitive
      ("outra/a.xlsx", false),
      ("minha-pasta/a.csv", false),
      ("", false))
    val df = cases.map(_._1).toDF("name")
    val got = df.select(col("name"),
        Graft.objectNameAccept(col("name"), "minha-pasta/", ".xlsx").as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (n, expected) => assert(got(n) === expected, n) }
  }

  test("tokenJaccard: identical=1, disjoint=0") {
    import spark.implicits._
    val df = Seq(("a b c", "a b c", "x y z")).toDF("s1", "s2", "s3")
    val r = df.select(
      Graft.tokenJaccard(col("s1"), col("s2")).as("same"),
      Graft.tokenJaccard(col("s1"), col("s3")).as("disj")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("splitLabel covers every row with exactly the named labels") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
      .withColumn("split", Graft.splitLabel(col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700L && counts("train") < 900L)
    // rejects fractions that don't partition
    intercept[IllegalArgumentException] {
      Graft.splitLabel(col("id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("splitLabel totality holds for arbitrary fraction partitions (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    // random partitions of 100 into 2-5 named buckets
    val partsGen = for {
      n <- Gen.choose(2, 5)
      cuts <- Gen.listOfN(n - 1, Gen.choose(1, 99)).map(_.distinct.sorted)
        .suchThat(_.nonEmpty)
    } yield {
      val bounds = (0 +: cuts) :+ 100
      bounds.sliding(2).zipWithIndex
        .map { case (Seq(a, b), i) => s"s$i" -> (b - a) }.toSeq
    }
    val df = (0L until 500L).toDF("id").cache()
    Gen.listOfN(25, partsGen).sample.getOrElse(Seq.empty).foreach { parts =>
      val counts = df.withColumn("s", Graft.splitLabel(col("id"), parts))
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum === 500L, s"parts=$parts") // every row labeled exactly once
      assert(counts.keySet.subsetOf(parts.map(_._1).toSet), s"parts=$parts")
    }
    df.unpersist()
  }

  test("sampledBy is deterministic and consistent with splitLabel's hash") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val a = df.filter(Graft.sampledBy(col("id"), 25)).count()
    val b = df.filter(Graft.sampledBy(col("id"), 25)).count()
    assert(a === b)
    assert(a > 150L && a < 350L) // uniform-ish at n=1000
    // percent=100 keeps everything, 0 keeps nothing
    assert(df.filter(Graft.sampledBy(col("id"), 100)).count() === 1000L)
    assert(df.filter(Graft.sampledBy(col("id"), 0)).count() === 0L)
  }

  test("packBin assigns dense bins by running token count within a partition") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 300L),
      ("de", 1L, 600L), ("de", 2L, 100L)).toDF("lang", "ord", "n")
    val out = Graft.packBin(df, "lang", "ord", "n", 512).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // en: cum-starts 0,300,600 -> bins 0,0,1 ; de: 0,600 -> 0,1
    assert(out === Map(
      ("en", 1L) -> 0L, ("en", 2L) -> 0L, ("en", 3L) -> 1L,
      ("de", 1L) -> 0L, ("de", 2L) -> 1L))
  }

  test("nearDupPairs finds the near-identical pair, skips the unrelated doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about distributed spark engines")).toDF("id", "body")
    val pairs = Graft.nearDupPairs(df, "body", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) > 0.7) // 8 shared of 10 union tokens -> jaccard 0.8
  }

  test("facade asofJoin matches the plan-level operator") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("id", "key", "t")
    val r = Seq((10L, 90L, 900L), (10L, 150L, 902L)).toDF("rkey", "rt", "rid")
    val out = Graft.asofJoin(spark, l, r, "key", "t", "rkey", "rt", "rid", Seq("rid"))
      .select("id", "rid").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out === Map(1L -> 900L, 2L -> 902L))
  }

  test("dupTokenRatio: 0 for all-distinct, 0.5 for half-duplicated") {
    import spark.implicits._
    val r = Seq(("a b c d", "a a b b")).toDF("t1", "t2")
      .select(Graft.dupTokenRatio(col("t1")).as("d1"),
        Graft.dupTokenRatio(col("t2")).as("d2")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 0.5)
  }

  test("connectedComponents: transitive closure with min-id labels, multi-round chains") {
    import spark.implicits._
    val edges = Seq(
      (2L, 1L), (2L, 3L),              // triangle-ish cluster -> 1
      (10L, 11L),                      // pair -> 10
      // an 8-node path: min label 30 needs multiple propagation
      // rounds to reach the far end — exercises the fixpoint loop
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L),
      (34L, 35L), (35L, 36L), (36L, 37L)).toDF("a", "b")
    val out = Graft.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L,
      34L -> 30L, 35L -> 30L, 36L -> 30L, 37L -> 30L))
    // empty edge set -> empty result, no error
    assert(Graft.connectedComponents(edges.filter(col("a") < 0), "a", "b").count() === 0L)
  }

  test("connectedComponents: non-convergence at maxRounds throws, never returns truncated labels") {
    import spark.implicits._
    // a 16-node path cannot converge in one round even with pointer
    // jumping; preCollapse off keeps the contraction from solving it
    // before the capped fixpoint runs. The r11 ~sf1 DBSCAN census was
    // silently wrong because this case WARNED and returned — the
    // contract is now a hard failure.
    val edges = (1L to 15L).map(i => (i, i + 1L)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      Graft.connectedComponents(edges, "a", "b", maxRounds = 1,
        preCollapse = false).collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
    // the same graph converges fine under the default budget
    assert(Graft.connectedComponents(edges, "a", "b")
      .filter(col("component") === 1L).count() === 16L)
  }

  test("connectedComponents: string ids use the join-based convergence probe correctly") {
    import spark.implicits._
    // a 4-node path needs >1 round: the numeric sum probe would be
    // null for strings and falsely declare round-1 convergence
    val edges = Seq(("c", "i"), ("i", "b"), ("b", "a")).toDF("x", "y")
    val out = Graft.connectedComponents(edges, "x", "y").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "a", "b" -> "a", "c" -> "a", "i" -> "a"))
  }

  test("connectedComponents: fractional ids avoid the lossy scalar probe") {
    import spark.implicits._
    // an 8-node path of doubles that ALL round to 0 under a
    // decimal(38,0) cast — the scalar sum probe would read 0 every
    // round and declare convergence before the fixpoint; the
    // join-based probe must run the chain to completion
    val edges = (1 to 7).map(i => (i / 100.0, (i + 1) / 100.0)).toDF("a", "b")
    val out = Graft.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out.size === 8)
    assert(out.values.toSet === Set(0.01))
  }

  test("redactPii: emails, phones, IPv4 replaced with typed tags; clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call +1-555-0123 or visit 192.168.0.1",
      "nothing sensitive here").toDF("t")
      .select(Graft.redactPii(col("t")).as("r")).as[String].collect()
    assert(rows(0) === "mail <EMAIL> now")
    assert(rows(1) === "call <PHONE> or visit <IP>")
    assert(rows(2) === "nothing sensitive here")
  }

  test("decontaminate: only train rows sharing a k-gram with eval flagged, distinct-counted") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),     // shares 2 distinct 3-grams with eval
      (2L, "zeta eta theta iota kappa"),          // disjoint
      (3L, "alpha beta gamma delta epsilon")).toDF("id", "text") // same as 1
    val eval_ = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val out = Graft.decontaminate(train, eval_, "text", "id", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval 3-grams: {a b g, b g d}; train doc 1/3 share both, doc 2 none
    assert(out === Map(1L -> 2L, 3L -> 2L))
  }

  test("connectedComponents equals union-find on random graphs (30 cases)") {
    import org.scalacheck.Gen
    import spark.implicits._
    // driver-side union-find reference (path compression + min root)
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    }
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(2, 40)          // node universe
      m <- Gen.choose(1, 80)          // edges (self-loops allowed)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es
    val cases = Gen.listOfN(30, graphGen).sample.getOrElse(Seq.empty)
    assert(cases.nonEmpty)
    cases.zipWithIndex.foreach { case (es, i) =>
      val got = Graft.connectedComponents(es.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(es), s"case $i: $es")
    }
  }

  test("dedupCorpus: transitive near-dups collapse to canonical row, uniques kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),        // exact dup of 1
      (3L, "w1 w2 w3 w4 w5 w6 w7 w9"),        // near-dup of 1/2
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("id", "text")
    val kept = Graft.dedupCorpus(docs, "text", "id", threshold = 0.5, k = 3, bands = 4)
      .select("id").as[Long].collect().sorted
    assert(kept.contains(4L) && kept.contains(1L) && !kept.contains(2L))
    // doc 3 may or may not band with 1 depending on hash luck — but if
    // dropped it must be because it clustered with the kept canonical
    assert(kept.length === (if (kept.contains(3L)) 3 else 2))
  }

  test("chunkOverlap: stride windows cover every token, no subset tail chunk") {
    import spark.implicits._
    val out = Seq((1 to 7).map(i => s"t$i").mkString(" ")).toDF("text")
      .select(posexplode(Graft.chunkOverlap(col("text"), window = 3, stride = 2)))
      .as[(Int, String)].collect()
    // last chunk index = ceil((7-3)/2) = 2: token t7 is covered by
    // chunk 2; a chunk 3 = "t7" would be a pure subset of chunk 2
    assert(out === Array(0 -> "t1 t2 t3", 1 -> "t3 t4 t5", 2 -> "t5 t6 t7"))
    // a genuinely new tail token DOES get a (short) tail chunk
    val tail = Seq((1 to 8).map(i => s"t$i").mkString(" ")).toDF("text")
      .select(posexplode(Graft.chunkOverlap(col("text"), window = 3, stride = 2)))
      .as[(Int, String)].collect()
    assert(tail.last === (3 -> "t7 t8") && tail.length === 4)
    // window == stride degenerates to disjoint chunking
    val disjoint = Seq("a b c d").toDF("text")
      .select(posexplode(Graft.chunkOverlap(col("text"), window = 2, stride = 2)))
      .as[(Int, String)].collect()
    assert(disjoint === Array(0 -> "a b", 1 -> "c d"))
    // short doc -> exactly one whole-doc chunk
    val short = Seq("a b").toDF("text")
      .select(posexplode(Graft.chunkOverlap(col("text"), window = 5, stride = 3)))
      .as[(Int, String)].collect()
    assert(short === Array(0 -> "a b"))
  }

  test("keepByFraction: 0 keeps none, 1 keeps all, smaller fractions nest in larger") {
    import spark.implicits._
    val ids = spark.range(0, 500).toDF("id")
    assert(ids.filter(Graft.keepByFraction(col("id"), lit(0.0))).count() === 0L)
    assert(ids.filter(Graft.keepByFraction(col("id"), lit(1.0))).count() === 500L)
    val at30 = ids.filter(Graft.keepByFraction(col("id"), lit(0.3)))
      .collect().map(_.getLong(0)).toSet
    val at60 = ids.filter(Graft.keepByFraction(col("id"), lit(0.6)))
      .collect().map(_.getLong(0)).toSet
    assert(at30.subsetOf(at60))          // deterministic nesting
    assert(at30.nonEmpty && at60.size < 500)
    assert(math.abs(at30.size / 500.0 - 0.3) < 0.1)  // roughly calibrated
  }

  test("band-bucket cap bounds replica-corpus candidates and reports drops") {
    import spark.implicits._
    // 30 exact replicas (every band identical → one bucket of 30 per
    // band → 30*29/2 pairs per band uncapped) + distinct fillers
    val replicas = (0 until 30).map(i => (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8"))
    val fillers = (100 until 110).map(i => (i.toLong, s"f$i g$i h$i j$i k$i l$i m$i n$i"))
    val docs = (replicas ++ fillers).toDF("id", "text")
    val uncapped = Graft.bandCandidates(docs, "text", "id").count()
    assert(uncapped >= 30L * 29 / 2) // the replica block pairs fully
    // cap below the replica bucket size: its pair mass disappears...
    val capped = Graft.bandCandidates(docs, "text", "id", 3, 4, maxBucketSize = 10)
    assert(capped.count() < 30L * 29 / 2)
    assert(capped.filter(col("id_a") < 30 && col("id_b") < 30).count() === 0)
    // ...and is REPORTED, not silent: 4 bands × one oversized bucket
    val dropped = Graft.oversizedBandBuckets(docs, "text", "id", 3, 4, maxBucketSize = 10)
      .collect()
    assert(dropped.length === 4)
    assert(dropped.forall(_.getAs[Long]("n_docs") === 30L))
    // cap that doesn't bind changes nothing
    val loose = Graft.bandCandidates(docs, "text", "id", 3, 4, maxBucketSize = 1000).count()
    assert(loose === uncapped)
    assert(Graft.oversizedBandBuckets(docs, "text", "id", 3, 4, 1000).isEmpty)
  }

  test("dedupCorpusBy: keeper policy picks the longest cluster member, not the min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),   // longest in cluster {1,2}
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("id", "text")
      .withColumn("len", length(col("text")))
    val kept = Graft.dedupCorpusBy(docs, "text", "id",
      keepBy = Seq(col("len").desc, col("id").asc))
      .select("id").as[Long].collect().toSet
    // min-id policy would keep 1; longest-member policy keeps 2
    assert(kept.contains(4L))
    if (!kept.contains(1L) || !kept.contains(2L)) { // 1 and 2 clustered
      assert(kept === Set(2L, 4L))
    }
    // schema passes through unchanged (no helper columns leak)
    assert(Graft.dedupCorpusBy(docs, "text", "id", Seq(col("id"))).columns.toSeq
      === Seq("id", "text", "len"))
    // a caller column that happens to be named "component" survives —
    // the cluster labels live in __graft_-prefixed internals
    val withComponent = docs.withColumn("component", lit("mine"))
    val keptCols = Graft.dedupCorpusBy(withComponent, "text", "id", Seq(col("id")))
    assert(keptCols.columns.toSeq === Seq("id", "text", "len", "component"))
    assert(keptCols.select("component").distinct().collect().map(_.getString(0)).toSeq
      === Seq("mine"))
  }

  test("writeWarehouse: partitioned layout + overwrite replaces prior contents") {
    import spark.implicits._
    val out = "/tmp/graft_sources/warehouse_seam"
    val v1 = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    Graft.writeWarehouse(v1, "parquet", out, partitionBy = Seq("grp"))
    // partitioned layout on disk: one directory per grp value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("grp=a", "grp=b"))
    assert(spark.read.parquet(out).count() === 3)
    // overwrite semantics: a second write REPLACES, never appends —
    // the warehouse-load contract (WRITE_TRUNCATE in the reference's
    // warehouse terms)
    val v2 = Seq((9L, "c")).toDF("id", "grp")
    Graft.writeWarehouse(v2, "parquet", out, partitionBy = Seq("grp"))
    val re = spark.read.parquet(out)
    assert(re.count() === 1)
    assert(re.select("grp").head().getString(0) === "c")
    // explicit append mode composes
    Graft.writeWarehouse(v1, "parquet", out, partitionBy = Seq("grp"), mode = "append")
    assert(spark.read.parquet(out).count() === 4)
  }

  test("bm25Rank works on an arbitrary DataFrame; rarity outranks frequency") {
    import spark.implicits._
    val docs = Seq(
      (10L, "apple apple apple banana"),    // common-term heavy
      (20L, "apple zebra"),                 // rare term, short doc
      (30L, "apple banana apple banana"),   // common terms only
      (40L, "kiwi melon")).toDF("pk", "body") // no query terms at all
    val got = Graft.bm25Rank(docs, "body", "pk", Seq("apple", "zebra"), topK = 3)
      .collect()
    // doc 40 has no query term -> absent; 3 hits remain
    assert(got.map(_.getLong(0)).toSet === Set(10L, 20L, 30L))
    // zebra (df=1 of 4) dominates any apple tf: doc 20 ranks first
    assert(got.head.getLong(0) === 20L)
    assert(got.head.getLong(2) === 2L) // both query terms hit in doc 20
    intercept[IllegalArgumentException] {
      Graft.bm25Rank(docs, "body", "pk", Seq.empty)
    }
  }

  test("dqSuite counts every planted violation class on dirty data") {
    import spark.implicits._
    import graft.api.DataQuality._
    val dirty = Seq(
      (1L, Some("2024-01-01"), 10.0, "F", 100L),   // clean
      (1L, Some("2024-01-02"), 20.0, "O", 101L),   // dup id
      (2L, None, 30.0, "P", 102L),                 // null date
      (3L, Some("2024-01-03"), -5.0, "F", 103L),   // range
      (4L, Some("2024-01-04"), 40.0, "X", 104L),   // bad enum
      (5L, Some("2024-01-05"), 50.0, "F", 999L))   // dangling fk
      .toDF("id", "dt", "price", "status", "fk")
    val dim = Seq(100L, 101L, 102L, 103L, 104L).toDF("k")
    val got = dqSuite(dirty, Seq(
      Unique("id"),
      RefIntegrity("fk", dim, "k"),
      NotNull("dt"),
      InRange("price", 0.0, 1000.0),
      InSet("status", Seq("F", "O", "P")),
      Satisfies("id_positive", org.apache.spark.sql.functions.col("id") > 0)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("unique_id") === ((1L, false)))
    assert(got("fk_fk") === ((1L, false)))
    assert(got("not_null_dt") === ((1L, false)))
    assert(got("range_price") === ((1L, false)))
    assert(got("enum_status") === ((1L, false)))
    assert(got("satisfies_id_positive") === ((0L, true)))
    // a clean subset passes everything
    val clean = dirty.where($"id" === 5L || $"id" === 2L)
      .where($"dt".isNotNull)
    val allPass = dqSuite(clean, Seq(
      Unique("id"), NotNull("dt"), InRange("price", 0.0, 1000.0)))
      .collect().forall(_.getBoolean(2))
    assert(allPass)
    // misuse guards
    intercept[IllegalArgumentException] {
      dqSuite(dirty, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      dqSuite(dirty, Seq(NotNull("dt"), NotNull("dt")))
    }
    // label splices into a generated stack() literal — injection guard
    intercept[IllegalArgumentException] {
      dqSuite(dirty, Seq(Satisfies("x', id), ('pwned",
        org.apache.spark.sql.functions.col("id") > 0)))
    }
  }

  test("dqSuite counts NULL-evaluating predicates and duplicate NULL keys") {
    import spark.implicits._
    import graft.api.DataQuality._
    import org.apache.spark.sql.functions.col
    // status NULL makes isin() NULL; key NULL×3 makes a "unique" pk
    // with two hidden duplicates; qty NULL makes the Satisfies
    // predicate NULL. All three must count as violations, not skips.
    val d = Seq(
      (Some(1L), Some("F"), Some(10L)),
      (Some(2L), None, Some(20L)),      // NULL enum value
      (None, Some("O"), None),          // NULL key + NULL Satisfies operand
      (None, Some("F"), Some(30L)),     // duplicate NULL key
      (None, Some("P"), Some(40L)))     // triplicate NULL key
      .toDF("id", "status", "qty")
    val got = dqSuite(d, Seq(
      Unique("id"),
      InSet("status", Seq("F", "O", "P")),
      Satisfies("qty_positive", col("qty") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("enum_status") === 1L)          // the NULL status row
    assert(got("satisfies_qty_positive") === 1L) // the NULL qty row
    assert(got("unique_id") === 2L)            // 3 NULL keys = 2 dups
  }
}
