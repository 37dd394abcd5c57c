package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicates the sf0.1 tables 10× (~sf1: 6M lineitem,
  * 500k docs, 500k vectors) and times the flagship operators at both
  * scales. Linear (or better) scaling here is the evidence behind the
  * 100 TB design claims — a super-linear operator flags a
  * pair-explosion or skew problem before it costs a cluster run.
  *
  * Methodology notes (each guards a way the numbers could lie):
  *  - replicas are PERTURBED per copy (documents get a copy token,
  *    embeddings an additive shift) so signatures/buckets differ —
  *    pure duplication would collapse group keys and concentrate all
  *    mass in existing buckets, turning the pair probes into a skew
  *    test of artificial data;
  *  - every probe runs twice per scale and the SECOND run is reported,
  *    so first-run codegen/JIT/submission overhead doesn't inflate the
  *    small-scale denominator;
  *  - the probe set includes a PAIR-GENERATING operator (bucketed
  *    cosine near-dup join), not just groupBys — pair explosion is the
  *    failure mode the probe exists to catch.
  *
  * Writes docs/SCALE.md.
  */
object ScaleProbe {

  /** r12 verdict task #2 — the CONTROLLED pre-collapse measurement that
    * replaces three contradictory r11 artifacts: preCollapse on/off ×
    * {sf0.1, ~sf1} × interleaved min-of-3, on the EDGE LISTS of the
    * three CC consumers the driver bench flagged (dedup near-dup
    * pairs, er-resolve fuzzy name pairs, plus the pathological chain).
    * Edges are materialized (localCheckpoint) BEFORE timing so the
    * comparison isolates the CC stage — upstream pair-generation cost
    * is identical in both settings by construction (and since r12 the
    * engine itself checkpoints the symmetric edge list once, so the
    * end-to-end delta equals this CC-stage delta). */
  private def ccReconcile(spark: SparkSession, sf01: String, big: String): Unit = {
    def matEdges(df: DataFrame, a: String, b: String): DataFrame = {
      val m = df.select(col(a), col(b)).localCheckpoint()
      m.count(); m
    }
    def timeCc(edges: DataFrame, a: String, b: String, pre: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.api.Graft.connectedComponents(edges, a, b, preCollapse = pre).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cases: Seq[(String, DataFrame, String, String)] = Seq(
      ("dedup_pairs_sf0.1", matEdges(graft.api.Graft.nearDupPairs(
        Tables.documents(spark, sf01), "text", "doc_id"), "id_a", "id_b"),
        "id_a", "id_b"),
      ("dedup_pairs_sf1", matEdges(graft.api.Graft.nearDupPairs(
        Tables.documents(spark, big), "text", "doc_id"), "id_a", "id_b"),
        "id_a", "id_b"),
      ("er_name_pairs_sf0.1", matEdges(graft.operators.Joins
        .fuzzyBlockedJoin(spark, sf01)
        .select(col("name_a").as("a"), col("name_b").as("b")), "a", "b"), "a", "b"),
      ("er_name_pairs_sf1", matEdges(graft.operators.Joins
        .fuzzyBlockedJoin(spark, big)
        .select(col("name_a").as("a"), col("name_b").as("b")), "a", "b"), "a", "b"),
      ("chain_20k", matEdges(spark.range(0, 19999)
        .select(col("id").as("a"), (col("id") + 1L).as("b")), "a", "b"), "a", "b"))
    // warm both code paths untimed (codegen compilation per round)
    timeCc(cases.last._2, "a", "b", pre = false)
    timeCc(cases.last._2, "a", "b", pre = true)
    println("| edge list | edges | plain min-of-3 s | precollapse min-of-3 s |")
    println("|---|---|---|---|")
    cases.foreach { case (name, edges, a, b) =>
      val n = edges.count()
      // interleaved: plain/pre alternate so host noise hits both arms
      val (ps, qs) = (1 to 3).map { _ =>
        (timeCc(edges, a, b, pre = false), timeCc(edges, a, b, pre = true))
      }.unzip
      println(f"| $name | $n | ${ps.min}%.2f | ${qs.min}%.2f |")
    }
  }

  /** FIXPOINT-INVARIANT GATE (r12 verdict #1): the DuckDB oracle runs
    * at sf0.01/sf0.1 and can never see an unconverged fixpoint at ~sf1
    * — the r11 DBSCAN cluster census was silently wrong there for
    * exactly that reason. The gate: run the PRODUCTION edge pipeline,
    * take the labels [[graft.api.Graft.connectedComponents]] returns,
    * and run ONE more min-label propagate round over them — a true
    * fixpoint changes ZERO rows. This checks a property the engine's
    * own convergence probe cannot certify from inside (a probe bug
    * that declares convergence early would pass its own check but
    * fail this one). Returns (violations, labeled nodes) — violations
    * MUST be 0. */
  private def fixpointViolations(edges: DataFrame, a: String, b: String): (Long, Long) = {
    val e = edges.select(col(a).as("__s"), col(b).as("__d")).localCheckpoint()
    val labels = graft.api.Graft.connectedComponents(e, "__s", "__d").localCheckpoint()
    val sym = e.union(e.select(col("__d").as("__s"), col("__s").as("__d")))
    val prop = labels.join(sym, col("id") === col("__s"))
      .select(col("__d").as("id"), col("component"))
      .union(labels)
      .groupBy("id").agg(min("component").as("__p"))
    val viol = prop.join(labels.withColumnRenamed("component", "__cur"), "id")
      .filter(col("__p") =!= col("__cur")).count()
    (viol, labels.count())
  }

  /** The three CC-consuming endpoints' production edge pipelines at a
    * given data dir, for [[fixpointViolations]]. */
  private def ccInvariantRows(spark: SparkSession, dir: String): Seq[(String, Long, Long)] =
    Seq[(String, () => (Long, Long))](
      ("dedup_keep (nearDupPairs edges)", () => fixpointViolations(
        graft.api.Graft.nearDupPairs(
          Tables.documents(spark, dir), "text", "doc_id"), "id_a", "id_b")),
      ("geo_dbscan (core-core edges)", () => fixpointViolations(
        graft.operators.GeoOps.dbscanCoreEdges(spark, dir), "ida", "idb")),
      ("graph_er_resolve (fuzzy-name edges)", () => fixpointViolations(
        graft.operators.Joins.fuzzyBlockedJoin(spark, dir)
          .select(col("name_a").as("a"), col("name_b").as("b")), "a", "b"))
    ).map { case (name, f) => val (v, n) = f(); (name, v, n) }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val sf01 = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sf1_v2"

    val tables = Seq("lineitem", "documents", "embeddings", "events", "orders", "part",
      "customer", "nation", "region", "supplier")
    val complete = tables.forall(t => new java.io.File(s"$big/$t.parquet/_SUCCESS").exists())
    if (!complete) {
      def replicate(name: String, mutate: (DataFrame, Int) => DataFrame): Unit =
        (0 until 10).map(i => mutate(Tables.table(spark, sf01, name), i))
          .reduce(_ union _)
          .write.mode("overwrite").parquet(s"$big/$name.parquet")
      replicate("lineitem", (df, i) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      replicate("documents", (df, i) =>
        df.withColumn("doc_id", col("doc_id") + lit(i * 100000000L))
          .withColumn("text", concat(col("text"), lit(s" copytoken$i"))))
      replicate("embeddings", (df, i) =>
        df.withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
          .withColumn("embedding",
            transform(col("embedding"), x => x + lit(i * 0.003f))))
      // events keep their user ids (same user population, 10× deeper
      // per-user history — the hard direction for window operators)
      // but shift each copy by an hour so sessions/frames see real
      // time spread, and event ids stay unique
      replicate("events", (df, i) =>
        df.withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 7} MINUTES")))
      replicate("orders", (df, i) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L)))
      // part keeps its NAMES (the fuzzy/dictionary operators resolve
      // the distinct-name dictionary first — 10x rows, same
      // dictionary, is exactly the property their probes measure)
      replicate("part", (df, i) =>
        df.withColumn("p_partkey", col("p_partkey") + lit(i * 100000000L)))
      // customer copies rewrite name position 10 (always '0' in the
      // base data — ids < 1e8) to the copy digit, so cross-copy names
      // are TRUE distance-1 neighbors: the adversarial direction for
      // the deletion-neighborhood join (more real pairs, same
      // digit-domain bucket bound). Keys shift like every fact table;
      // orders keep referencing the i=0 copy, which is the base
      // customer set unchanged — dim joins stay correct.
      replicate("customer", (df, i) =>
        df.withColumn("c_custkey", col("c_custkey") + lit(i * 100000000L))
          .withColumn("c_name", concat(substring(col("c_name"), 1, 9),
            lit(i.toString), expr("substring(c_name, 11)"))))
      // bounded dims copy verbatim — they do not scale with the corpus
      for (t <- Seq("nation", "region", "supplier"))
        Tables.table(spark, sf01, t).write.mode("overwrite").parquet(s"$big/$t.parquet")
    }

    // focused modes (full SCALE.md regen is the no-arg default)
    if (args.contains("cc-reconcile")) {
      ccReconcile(spark, sf01, big); spark.stop(); return
    }
    if (args.contains("dbscan-probe")) {
      def t(dir: String): Double = {
        val t0 = System.nanoTime()
        graft.operators.GeoOps.dbscan(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      t(sf01) // warm: per-round codegen
      val s = (1 to 3).map(_ => t(sf01)).min
      val l = (1 to 3).map(_ => t(big)).min
      println(f"dbscan_end_to_end sf0.1 ${s}%.2f s, ~sf1 ${l}%.2f s, ratio ${l / s}%.1fx")
      spark.stop(); return
    }
    // time named registered queries: `q <name> [<name>…]`, min-of-3
    // warm at sf0.1 (and ~sf1 when the replica exists) — the local
    // stand-in for one driver-bench cell when iterating on one op
    // ---- banding parameter tuning (r13 verdict #5): make (bands,
    // rows) a MEASURED decision. For each (b, r) config the probe
    // builds a generic banded-minhash candidate stage (band j, row i
    // uses its own salted md5 slice; sig_j = the concatenation of its
    // r per-row minima — r=1 with 4 bands over one md5's four 8-hex
    // slices is exactly the production bandCandidates sketch), runs
    // the capped self-join at sf0.1 AND ~sf1, and grades each config
    // on: candidate mass (the cost driver), S-curve recall against
    // exact shingle-Jaccard ground truth on a bounded slice (doc_id <
    // 400 -> <=79,800 exact pairs at any corpus size), and verified-
    // pair yield at the tau=0.5 production threshold. Writes
    // docs/TUNING.md — the tuning evidence the 100 TB operator ships
    // with instead of defaults.
    if (args.contains("band-tuning")) {
      val capN = graft.api.Graft.defaultBandBucketCap
      val sliceN = 400
      def shingled(dir: String) = Tables.documents(spark, dir)
        .select(col("doc_id"), array_distinct(
          graft.api.Graft.shingles(col("text"), 3)).as("sh"))
      def bandCand(dir: String, b: Int, r: Int): DataFrame = {
        def sig(j: Int): org.apache.spark.sql.Column = concat((0 until r).map { i =>
          array_min(transform(col("sh"),
            s => substring(md5(concat(lit(s"$j:$i:"), s).cast("binary")), 1, 8)))
        }: _*)
        val rows = shingled(dir).select(col("doc_id"),
          explode(array((0 until b).map(j =>
            struct(lit(j).as("band"), sig(j).as("sig"))): _*)).as("bs"))
          .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("sig"))
        val sized = rows.withColumn("bn", count(lit(1)).over(w))
          .filter(col("bn") <= capN).drop("bn")
        sized.alias("x").join(sized.alias("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
          .distinct()
      }
      // exact shingle-Jaccard ground truth, bucketed by similarity.
      // The corpus's true near-dups are RANDOM id pairs (the planted
      // fixture pairs) plus, on the replica corpus, each doc's 9
      // cross-copy siblings — an id-prefix slice misses the former,
      // so truth is ALL-PAIRS at sf0.1 (5k docs — 12.5M intersections,
      // affordable once) and the per-copy slice doc_id % 1e8 < 40 at
      // ~sf1 (40 base docs × 10 copies → every cross-copy pair kept).
      def truth(dir: String, big: Boolean): DataFrame = {
        val d0 = shingled(dir)
        val d = if (big) d0.filter(col("doc_id") % 100000000L < sliceN) else d0
        val a = d.select(col("doc_id").as("id_a"), col("sh").as("sa"))
        val b = d.select(col("doc_id").as("id_b"), col("sh").as("sb"))
        a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
          .withColumn("jac", col("inter") /
            (size(col("sa")) + size(col("sb")) - col("inter")))
          .filter(col("jac") >= 0.5)
          .select(col("id_a"), col("id_b"), col("jac"))
          .localCheckpoint()
      }
      val buckets = Seq((0.5, 0.7), (0.7, 0.85), (0.85, 1.01))
      // the exact S-curve P(candidate | jaccard s) = 1-(1-s^r)^b — the
      // shoulder the natural data cannot sample (true pairs here are
      // bimodal: ~0 and >=0.7) is still a closed-form property of the
      // sketch, printed alongside the measured columns
      def scurve(b: Int, r: Int, s: Double): Double =
        1.0 - math.pow(1.0 - math.pow(s, r), b)
      val configs = Seq((2, 1), (4, 1), (8, 1), (2, 2), (4, 2), (2, 4))
      val sb = new StringBuilder
      sb.append("# TUNING — minhash banding parameters, measured\n\n")
      sb.append("Generated by `graft.ScaleProbe band-tuning`. Each (bands b, rows r)\n")
      sb.append("config hashes every shingle b*r times (band j's signature is the\n")
      sb.append("concatenation of its r salted-md5 minima — r=1/b=4 is the\n")
      sb.append("production `bandCandidates` sketch shape) and candidates are pairs\n")
      sb.append("sharing >=1 band signature, through the production cap64 bucket\n")
      sb.append("filter. The S-curve P(candidate | jaccard s) = 1-(1-s^r)^b says:\n")
      sb.append("more BANDS raise recall everywhere (and candidate mass with it);\n")
      sb.append("more ROWS sharpen the threshold (cheaper, but low-s recall dies).\n")
      sb.append("Measured recall is against exact shingle-jaccard truth (sf0.1:\n")
      sb.append("ALL 12.5M pairs of the 5k-doc corpus — the planted fixture dups\n")
      sb.append("are random id pairs, so no id slice samples them fairly; ~sf1:\n")
      sb.append("the per-copy slice doc_id % 1e8 < 40, which keeps every\n")
      sb.append("cross-copy sibling pair). This corpus's true pairs are BIMODAL\n")
      sb.append("(~0 and >=0.7 — planted dups and replica siblings), so the\n")
      sb.append("0.3/0.5 shoulder is reported from the closed-form S-curve\n")
      sb.append("columns; verified = candidates surviving the tau=0.5\n")
      sb.append("token-jaccard production threshold corpus-wide.\n\n")
      sb.append("| b | r | scale | candidates | verified@0.5 | recall j0.5-0.7 | recall j0.7-0.85 | recall j0.85+ | P(s=0.3) | P(s=0.5) | P(s=0.7) | cand s |\n")
      sb.append("|---|---|---|---|---|---|---|---|---|---|---|---|\n")
      Seq(("sf0.1", sf01, false), ("~sf1", big, true)).foreach { case (label, dir, isBig) =>
        val tr = truth(dir, isBig)
        val trCounts = buckets.map { case (lo, hi) =>
          tr.filter(col("jac") >= lo && col("jac") < hi).count() }
        configs.foreach { case (b, r) =>
          val t0 = System.nanoTime()
          val cand = bandCand(dir, b, r).localCheckpoint()
          val nCand = cand.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val hits = tr.join(cand, Seq("id_a", "id_b"), "left_semi")
          val hitCounts = buckets.map { case (lo, hi) =>
            hits.filter(col("jac") >= lo && col("jac") < hi).count() }
          val recalls = hitCounts.zip(trCounts).map { case (h, t) =>
            if (t == 0) "-" else f"${h.toDouble / t}%.2f ($h/$t)" }
          val theory = Seq(0.3, 0.5, 0.7).map(s => f"${scurve(b, r, s)}%.2f")
          // verified yield at the production threshold over the
          // hashed token sets (the nearDupPairs verify stage)
          val docs = Tables.documents(spark, dir).select(col("doc_id"),
            sort_array(array_distinct(transform(graft.api.Graft.tokens(col("text")),
              wd => conv(substring(md5(wd.cast("binary")), 1, 15), 16, 10).cast("long"))))
              .as("toks"))
          val av = docs.select(col("doc_id").as("id_a"), col("toks").as("ta"))
          val bv = docs.select(col("doc_id").as("id_b"), col("toks").as("tb"))
          val nVer = cand.join(av, "id_a").join(bv, "id_b")
            .withColumn("inter", call_function("graft_sorted_inter_count",
              col("ta"), col("tb")).cast("double"))
            .filter(col("inter") /
              (size(col("ta")) + size(col("tb")) - col("inter")) >= 0.5)
            .count()
          sb.append(f"| $b | $r | $label | $nCand | $nVer | ${recalls(0)} | ${recalls(1)} | ${recalls(2)} | ${theory(0)} | ${theory(1)} | ${theory(2)} | $secs%.1f |\n")
          println(f"[band-tuning] b=$b r=$r $label cand=$nCand ver=$nVer ${secs}%.1f s")
        }
      }
      sb.append("\nReading: the candidate column is what a 100 TB run SHUFFLES; the\n")
      sb.append("recall columns are what a wrong (b, r) silently loses. The choice\n")
      sb.append("is a RECALL-FLOOR decision: b=4/r=1 is the cheapest config whose\n")
      sb.append("S-curve keeps P(cand) >= ~0.76 all the way down to s=0.3 — the\n")
      sb.append("engine's verification thresholds (0.3-0.6 across the near-dup\n")
      sb.append("endpoints) sit in exactly that band, and a candidate stage must\n")
      sb.append("out-recall the strictest verifier it feeds or the miss is silent\n")
      sb.append("and unauditable (the cap's drops are censused; a too-sharp sketch\n")
      sb.append("has no census). r>=2 configs cut candidate mass ~5-60x but their\n")
      sb.append("P(s=0.3) collapses (<=0.17) — the right trade only for a corpus\n")
      sb.append("whose near-dups all sit above ~0.7 AND whose verifier threshold\n")
      sb.append("is >= 0.7; b=8/r=1 doubles candidate mass over b=4/r=1 for a few\n")
      sb.append("recall points — the S-curve's diminishing-returns region. If a\n")
      sb.append("production corpus pairs a higher verify threshold with replica-\n")
      sb.append("class dups only, rerun this mode and read the r=2 rows' measured\n")
      sb.append("j>=0.85 recall against their candidate column — that is the\n")
      sb.append("fraction-of-the-shuffle trade this table exists to price.\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get("docs/TUNING.md"), sb.toString)
      println(sb.toString)
      spark.stop(); return
    }
    if (args.headOption.contains("friedman-stages")) {
      def t(label: String, f: () => Long): Unit = {
        f()
        val s = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label: ${s.map(_._1).min}%.2f s (${s.head._2} rows)")
      }
      val o = Tables.orders(spark, big)
      t("scan_count", () => o.count())
      t("agg_custkey", () => o.groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))).count())
      t("agg_month_str", () => o.groupBy(
        date_format(col("o_orderdate"), "yyyy-MM"),
        substring(col("o_orderpriority"), 1, 1))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))).count())
      t("agg_month_trunc", () => o.groupBy(
        date_trunc("month", col("o_orderdate")),
        substring(col("o_orderpriority"), 1, 1))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))).count())
      t("friedman_full", () =>
        graft.operators.StatsOps.friedman(spark, big).count())
      spark.stop(); return
    }
    if (args.headOption.contains("rangecell-stages")) {
      import graft.operators.Joins
      def t(label: String, f: () => Long): Unit = {
        f() // warm
        val s = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label: ${s.map(_._1).min}%.2f s (${s.head._2} rows)")
      }
      val winNs = 3600L * 1000L * 1000L * 1000L
      val ev = Tables.events(spark, sf01)
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          col("ts_ns").as("err_ts"))
      val errx = err.withColumn("err_cell", explode(sequence(
        expr(s"err_ts div ${winNs}L"), expr(s"(err_ts + ${winNs}L) div ${winNs}L"))))
      val fol = ev.select(col("event_id"), col("user_id"), col("ts_ns"), col("value"),
        expr(s"ts_ns div ${winNs}L").as("cell"))
      t("err_explode", () => errx.count())
      t("fol_cells", () => fol.count())
      val joined = errx.join(fol,
        col("err_user") === col("user_id") && col("err_cell") === col("cell") &&
          col("ts_ns") > col("err_ts") && col("ts_ns") <= col("err_ts") + lit(winNs))
      t("join_only", () => joined.count())
      t("full_cell", () => Joins.rangeJoinEventsCell(spark, sf01).count())
      t("full_naive", () => Joins.rangeJoinEvents(spark, sf01).count())
      spark.stop(); return
    }
    // print a registered query's formatted physical plan at sf0.1 —
    // the local .explain("formatted") loop the build guide asks for
    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { name =>
        println(s"==== $name ====")
        SparkEntry.queries(name)(spark, sf01).explain("formatted")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("stream-state")) {
      graft.streaming.StreamStateProbe.run(spark)
        .foreach(l => println(s"[stream-state] $l"))
      spark.stop(); return
    }
    if (args.headOption.contains("ann-headtohead")) {
      Seq(sf01, big).foreach { dir =>
        graft.operators.Similarity.annServingHeadToHead(spark, dir)
          .foreach(l => println(s"[$dir] $l"))
      }
      spark.stop(); return
    }
    if (args.headOption.contains("q")) {
      args.drop(1).foreach { name =>
        val fn = SparkEntry.queries(name)
        def t(dir: String): Double = {
          val t0 = System.nanoTime(); fn(spark, dir).collect()
          (System.nanoTime() - t0) / 1e9
        }
        t(sf01)
        val s = (1 to 3).map(_ => t(sf01)).min
        val l = (1 to 3).map(_ => t(big)).min
        println(f"[q] $name sf0.1 $s%.2f s, ~sf1 $l%.2f s, ratio ${l / s}%.1fx")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("ppjoin-vs-band")) {
      Seq(sf01, big).foreach { dir =>
        graft.operators.Dedup.ppjoinVsBandProbe(spark, dir)
          .foreach(l => println(s"[$dir] $l"))
      }
      spark.stop(); return
    }
    if (args.contains("ppjoin-stages")) {
      Seq(sf01, big).foreach { dir =>
        graft.operators.Dedup.ppjoinStageProbe(spark, dir).foreach {
          case (st, secs, n) => println(f"[$dir] $st: $secs%.2f s ($n rows)")
        }
      }
      spark.stop(); return
    }
    if (args.contains("cc-invariant")) {
      Seq(sf01, big).foreach { dir =>
        ccInvariantRows(spark, dir).foreach { case (name, v, n) =>
          val verdict = if (v == 0L) "PASS" else "FAIL"
          println(s"[$dir] $name: $v violations over $n labels -> $verdict")
        }
      }
      spark.stop(); return
    }
    if (args.contains("dbscan-stages")) {
      Seq(sf01, big).foreach { dir =>
        graft.operators.GeoOps.dbscanStageProbe(spark, dir).foreach {
          case (st, secs, n) => println(f"[$dir] $st: $secs%.2f s ($n rows)")
        }
      }
      spark.stop(); return
    }

    def timeSecond(f: () => Long): (Double, Long) = {
      f() // warm: codegen, JIT, file listing, page cache
      // best-of-5 warm runs: this host shows intermittent multi-second
      // stalls, and min is the standard noise-robust statistic
      var best = Double.MaxValue
      var n = 0L
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        n = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }

    def pairProbe(dir: String): Long = {
      val emb = Tables.embeddings(spark, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("b", graft.api.Graft.lshBucket(col("v")))
        .withColumn("n", call_function("graft_l2norm", col("v")))
      val a = emb.select(col("vec_id").as("ia"), col("v").as("va"), col("b"), col("n").as("na"))
      val c = emb.select(col("vec_id").as("ib"), col("v").as("vb"), col("b").as("bb"), col("n").as("nb"))
      a.join(c, col("b") === col("bb") && col("ia") < col("ib"))
        .filter(call_function("graft_dot", col("va"), col("vb")) / (col("na") * col("nb")) >= 0.3)
        .count()
    }

    def probes(dir: String): Seq[(String, Double, Long)] = Seq[(String, () => Long)](
      ("pricing_summary_agg", () => Tables.lineitem(spark, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1))).count()),
      ("minhash_lsh_group", () => Tables.documents(spark, dir)
        .withColumn("sig", graft.api.Graft.minhashSignature(col("text")))
        .groupBy("sig").count().count()),
      ("simhash_group", () => Tables.documents(spark, dir)
        .withColumn("sh", graft.api.Graft.simhash16(col("text")))
        .groupBy("sh").count().count()),
      ("lsh_bucket_census", () => Tables.embeddings(spark, dir)
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("b", graft.api.Graft.lshBucket(col("v")))
        .groupBy("b").count().count()),
      ("exact_dedup", () => Tables.documents(spark, dir)
        .groupBy(md5(col("text").cast("binary"))).agg(min("doc_id")).count()),
      ("bucketed_cosine_pairs", () => pairProbe(dir)),
      // candidate generation for ngram-Jaccard: pairs sharing >=1
      // minhash band, measured through the PRODUCTION stage
      // (Dedup.bandCandidates — not a probe-local copy, so tuning the
      // band count can't silently desynchronize this evidence).
      // Sub-quadratic evidence: result rows must stay orders of
      // magnitude below N^2/2 all-pairs (the perturbed replicas ARE
      // near-dups of each other, so pair mass growing faster than
      // rows is real recall, not plan blow-up)
      ("ngram_band_candidates", () =>
        graft.operators.Dedup.bandCandidates(spark, dir).count()),
      // same stage with the per-band bucket cap (64): the replica
      // corpus's superlinear candidate mass must flatten to bounded
      // growth, and the drops are counted, not silent — the census
      // rides the same sized band rows the cap filters
      ("ngram_band_candidates_cap64", () =>
        graft.api.Graft.bandCandidates(
          graft.Tables.documents(spark, dir), "text", "doc_id", 3, 4, 64).count()),
      ("ngram_dropped_buckets_cap64", () =>
        graft.api.Graft.oversizedBandBuckets(
          graft.Tables.documents(spark, dir), "text", "doc_id", 3, 4, 64).count()),
      // incremental batch-vs-index dedup: index build is one groupBy
      // over the 80% corpus slice, the probe is an equi join driven by
      // the 20% batch slice — both sides scale linearly with the
      // corpus here, so the time ratio must stay ~linear; in
      // production the index is PRE-BUILT and only the batch term
      // remains (Dedup.incrementalDedup)
      ("incremental_dedup", () =>
        graft.operators.Dedup.incrementalDedup(spark, dir).count()),
      // IVF nearest-centroid assignment at the CORPUS-DERIVED k
      // (k = ceil(N/64), the SemDeDup fixed-cell-size policy): the
      // map-only native-codegen argmax over literal centroids does
      // O(N*k) compute with ZERO shuffle — per-row work grows with
      // k, the deliberate price for keeping the pair stage linear in
      // the corpus (at extreme scale the quantizer goes hierarchical;
      // see Similarity.ivfKFor). The filter forces `cell` to actually
      // evaluate — a bare count() lets Catalyst prune the argmax
      // projection away and times an empty scan. Production stage:
      // Similarity.ivfAssigned
      ("ivf_assign_scaled_k", () =>
        graft.operators.Similarity.ivfAssigned(spark, dir)
          .filter(col("cell") >= 0L).count()),
      // semantic-dedup candidate MASS: Σ n(n-1)/2 over the realized
      // k-means cells — the quantizer-bounded pairwise work the cell
      // join performs BEFORE any similarity threshold. With k ∝ N
      // (fixed target cell size 64) this must grow ~LINEARLY with
      // rows — the r4 verdict's one scale flaw was fixed k making it
      // ~N²/k (165x for 10x rows then). Computed from the cell
      // census (one groupBy), so the row is pure plan-shape evidence
      ("semantic_candidate_mass", () =>
        graft.operators.Similarity.ivfAssigned(spark, dir)
          .groupBy("cell").agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")).head().getLong(0)),
      // ... and the PRODUCTION pair stage end-to-end
      // (Similarity.semanticPairs: cell equi join + cosine >= tau).
      // Its RESULT rows are post-threshold near-duplicates — the
      // perturbed replicas are genuine near-dups of each other, so
      // that number grows ~100x by construction (like the
      // neardup_verified_pairs row below); the plan-shape metric is
      // the candidate-mass row above, and the TIME must track it
      ("semantic_cell_pairs", () =>
        graft.operators.Similarity.semanticPairs(spark, dir).count()),
      // PQ encoding — the ANN compression pass: one native map-only
      // scan (graft_pq_encode over the literal codebook), O(N·M·ksub)
      // compute with ZERO shuffle; the codebook does NOT grow with
      // the corpus (it is compression, not partitioning), so per-row
      // cost is CONSTANT and the row must scale ~linearly. The warmup
      // call absorbs the one-time Lloyd training (memoized per
      // corpus). The size() filter forces `codes` to evaluate.
      ("pq_encode", () =>
        graft.operators.Similarity.assignPqCodes(
            Tables.embeddings(spark, dir)
              .withColumn("v", col("embedding").cast("array<double>"))
              .withColumn("vn", call_function("graft_l2norm", col("v"))),
            graft.operators.Similarity.pqCbLiteral(
              graft.operators.Similarity.pqCodebookRows(spark, dir)))
          .filter(size(col("codes")) > 0).count()),
      // corpus-global span dedup (corpus_line_dedup): explode to
      // ~tokens/W span rows, ONE shuffle on the span key, reassemble.
      // Replicated docs carry a distinguishing copytoken, so only
      // in-document and cross-copy coincidental spans collide —
      // result rows = doc count by construction; the TIME row is the
      // linearity evidence (span shuffle volume ∝ corpus tokens)
      ("line_dedup_spans", () =>
        graft.operators.CorpusOps.lineDedup(spark, dir).count()),
      // A-ES weighted sampling: result is k rows at ANY corpus size —
      // the probe times the map-only key pass + per-partition top-k
      // (TakeOrderedAndProject; no global sort to grow super-linearly)
      ("weighted_sample_topk", () =>
        graft.operators.CorpusOps.sampleWeighted(spark, dir).count()),
      // BM25 lexical ranking: the query-term IN filter runs under the
      // tf aggregate, so the shuffle carries only matching (doc, term)
      // rows — time must track the SCAN, not the corpus×vocab explode
      ("bm25_query_scan", () =>
        graft.operators.TextAnalysis.bm25TopK(spark, dir).count()),
      // PageRank over the kNN graph — the iteration loop at a
      // DATA-SIZED edge list (the types-graph query proves parity;
      // this row proves the loop's two-shuffles-per-round cost
      // tracks |edges|). Edge build rides the probed knn machinery;
      // 3 rounds, micro-integer scores, lineage truncated per round
      ("pagerank_knn_graph", () =>
        graft.operators.GraphOps.pagerank(
          graft.api.Graft.knnGraph(spark,
              Tables.embeddings(spark, dir), "vec_id", "embedding", 5)
            .select(col("src"), col("neighbor_id").as("dst"), lit(1L).as("w")),
          iterations = 3).count()),
      // DSIR importance weights: two linear corpus scans (one
      // conditional agg training both fixed-k models, one probe pass
      // over the broadcast model) — nothing here may grow faster than
      // the token count, so the time ratio must stay ~linear
      ("dsir_weights", () =>
        graft.operators.CorpusOps.dsirWeights(spark, dir).count()),
      // hard-negative mining: the kNN-graph cell join re-used with two
      // anchor-keyed windows; with k ∝ N the in-cell pair mass is
      // linear (semantic_candidate_mass above is the shared shape
      // evidence), so mining time must track it, never all-pairs
      ("hard_negative_triplets", () =>
        graft.operators.Similarity.hardNegatives(spark, dir).count()),
      // sparse TF-IDF cosine: the inverted-index join whose hazard is
      // posting-list length L (pairs = L² per term). The per-term
      // posting cap (256, weight-ranked, oracle-replicated) bounds
      // pair work at cap²·|vocab| REGARDLESS of corpus size — the 10×
      // corpus must NOT cost ~100× (what uncapped L² would do on this
      // small-vocab worst-case corpus); result rows stay cap-bounded
      ("sparse_cosine_capped", () =>
        graft.operators.TextAnalysis.sparseCosine(spark, dir).count()),
      // BPE merge-rule training: ONE corpus scan builds the
      // Zipf-bounded word-frequency table (checkpointed), then every
      // round iterates on that compact table — 10× corpus pays the
      // scan once and the rounds stay vocabulary-priced, so the time
      // ratio must sit far below the data ratio
      ("bpe_train_8rounds", () =>
        graft.operators.CorpusOps.bpeTrain(spark, dir).count()),
      // sessionization at 10× PER-USER history depth (user population
      // fixed — the adversarial direction for user-keyed windows): the
      // island-numbering windows sort each user's events once, so cost
      // must track rows (n log n in partition depth), never pairs
      ("sessionize_deep_users", () =>
        graft.operators.Windows.sessionize(spark, dir).count()),
      // OLS moment sums: algebraic partials → map-side combine does
      // the work; 10× rows must cost ~scan time
      ("linreg_moments", () =>
        graft.operators.Aggregations.linReg(spark, dir).count()),
      // market basket: pairs are basket-bounded (b(b-1)/2 per order) —
      // 10× MORE baskets of the SAME size must scale ~linearly, the
      // claim that separates this from an all-pairs co-occurrence
      ("basket_pairs", () =>
        graft.operators.Analytics.marketBasket(spark, dir).count()),
      // PCA sufficient statistics + bounded driver iteration: the
      // corpus pays ONE moment pass (d²/2 integer accumulators,
      // map-side combined); the matvec rounds touch a 64×64 matrix —
      // 10× rows must cost ~the scan, never more
      ("pca_power_iteration", () =>
        graft.operators.Similarity.pcaTopComponent(spark, dir).count()),
      // grid-bucketed interval join: BOTH event sides grow 10x inside
      // the SAME one-month window, so true match pairs grow ~100x BY
      // CONSTRUCTION (denser time axis) — result rows carry that;
      // the plan-shape claim is that TIME tracks the matched-pair
      // mass through one equi shuffle, never the N*M nested loop
      ("grid_range_join", () =>
        graft.operators.Joins.gridRangeJoin(spark, dir).count()),
      // item-item CF: 10x more baskets of the SAME size — the
      // basket-bounded pair stage must scale ~linearly (the same
      // claim as basket_pairs, here through the min-co-occurrence
      // prune + rank window end-to-end)
      ("item_cf_topk", () =>
        graft.operators.Analytics.itemCf(spark, dir).count()),
      // PPJoin prefix-filter set-similarity join: replicas are
      // near-dups of each other, so true pairs grow ~45x per
      // copy-cluster by construction; the evidence is that time
      // tracks CANDIDATES (rare-prefix-token fan-out), not all-pairs
      ("ppjoin_pairs", () =>
        graft.operators.Dedup.ppjoin(spark, dir).count()),
      // k-core over the fuzzy-name graph: the peel sees the
      // DISTINCT-NAME dictionary, not the row stream — 10x part rows
      // with the same names must cost ~flat (the dictionary-first
      // design claim measured)
      ("kcore_fuzzy_dict", () =>
        graft.operators.GraphOps.kCore(spark, dir).count()),
      // negative sampling: draws grow with docs (4/doc), the CDF is
      // vocab-capped (1024) — both the model build and the grid
      // lookup must scale ~linearly in the corpus
      ("negative_samples", () =>
        graft.operators.CorpusOps.negativeSamples(spark, dir).count()),
      // hashing-trick featurizer: two compact-key aggs — pure scan
      ("hash_embed", () =>
        graft.operators.TextAnalysis.hashEmbed(spark, dir).count()),
      // ---- round-9 additions ----
      // RFM: the data-sized stage is the orders agg (map-side
      // combinable on o_custkey); the three ntile windows run on the
      // 1000x-smaller customer table — 10x orders must cost ~scan
      ("rfm_segments", () =>
        graft.operators.Analytics.rfm(spark, dir).count()),
      // Kaplan-Meier: the sessionize lag window over 10x deeper
      // per-user history is the hard direction (same axis as
      // sessionize_deep_users); the KM fold itself is on the
      // duration-bounded period spine — cost must track the window
      // scan, result rows the (bounded) period count
      ("survival_km", () =>
        graft.operators.Analytics.survival(spark, dir).count()),
      // running distinct count: two windows sharing one user-keyed
      // exchange over 10x deeper history; output is the discovery
      // change-log, bounded by users x types, NOT by events
      ("running_distinct", () =>
        graft.operators.Windows.runningDistinct(spark, dir).count()),
      // bitemporal as-of: two row_number windows on the same
      // user-keyed exchange; 10x deeper history, same user population
      // -> ~scan cost, constant result rows (one per user)
      ("bitemporal_asof", () =>
        graft.operators.WarehouseEtl.bitemporal(spark, dir).count()),
      // MMR re-rank: candidate generation is the |Q|-bounded
      // broadcast scan (rel top-10 per query); the greedy stage is
      // O(k*c^2) per query INDEPENDENT of corpus size — 10x corpus
      // must cost ~the candidate scan, result rows constant (3|Q|)
      ("mmr_rerank", () =>
        graft.operators.Similarity.mmrRerank(spark, dir).count()),
      // hourly-rate series family (ACF/EWMA/level-shift share the
      // spine): the data-sized stage is ONE compact-key hourly count
      // (calendar-bounded output) — 10x events must cost ~scan and
      // the series length must stay flat
      ("hourly_series_acf", () =>
        graft.operators.TimeSeries.acf(spark, dir).count()),
      // skip-gram co-occurrence: x2 offset fan-out then equi join on
      // (doc, position) — pair rows are 2x token count BY
      // CONSTRUCTION (never per-doc quadratic), so 10x docs must cost
      // ~linearly and the realized-pair agg must stay Zipf-compact
      ("cooccurrence_pairs", () =>
        graft.operators.CorpusOps.cooccurrence(spark, dir).count()),
      // binary-sketch Hamming scan: |Q| broadcast x N packed-long
      // rows, popcount(xor) per comparison — pure integer ALU, must
      // track the scan (the 16x-compression serving filter)
      ("hamming_scan", () =>
        graft.operators.Similarity.hammingTopK(spark, dir).count()),
      // weighted median: one group-key exchange + in-group sort
      // window — n log n in group depth, the winsorize cost model
      ("weighted_median", () =>
        graft.operators.Aggregations.weightedMedian(spark, dir).count()),
      // bitmap-index distinct: two compact-key aggs (bucketed bitmaps
      // then popcount merge) — the mergeable exact distinct path must
      // cost ~scan at any corpus size
      ("bitmap_distinct", () =>
        graft.operators.Aggregations.bitmapDistinct(spark, dir).count()),
      // ---- round-10 additions ----
      // Gini on the value histogram: the data-sized stage is the
      // per-customer orders agg; the ordered window sees only
      // DISTINCT cents values — 10x orders must cost ~scan
      ("gini_histogram", () =>
        graft.operators.StatsOps.gini(spark, dir).count()),
      // Mann-Whitney midranks ride the same distinct-cents histogram
      ("mann_whitney_hist", () =>
        graft.operators.StatsOps.mannWhitney(spark, dir).count()),
      // CMS build is one map-side-combinable agg into d*w=1024 cells;
      // 10x rows must cost ~scan, sketch size constant by definition
      ("cms_sketch_build", () =>
        graft.operators.StatsOps.cmsTopK(spark, dir).count()),
      // Theil-Sen pairs are capped by the 336-bin calendar slice: the
      // replica spans the SAME weeks, so pair count must stay FLAT
      // and time ~the hourly-count scan
      ("theil_sen_bounded", () =>
        graft.operators.StatsOps.theilSen(spark, dir).count()),
      // deletion-neighborhood edit join: replica names are true
      // cross-copy distance-1 neighbors (pairs GROW by construction);
      // the claim is time tracks the masked equi join's candidate
      // mass (digit-domain-capped buckets), never |names|^2
      ("edit_distance_blocked", () =>
        graft.operators.Joins.editDistanceJoin(spark, dir).count()),
      // bipartite projection: 10x baskets of the SAME size -> pair
      // mass and time ~linear (the basket_pairs claim end-to-end
      // through the degree joins)
      ("bipartite_projection", () =>
        graft.operators.GraphOps.bipartiteProject(spark, dir).count()),
      // ratio-to-report: broadcast dim chain + compact nation agg —
      // 10x facts must cost ~scan, window table constant
      ("ratio_to_report", () =>
        graft.operators.Windows.ratioToReport(spark, dir).count()),
      // skyline: one per-brand window over 10x part rows (n log n in
      // partition depth); duplicate (price,size) points collapse to
      // the first key, so result rows stay ~flat
      ("pareto_skyline", () =>
        graft.operators.Windows.paretoFrontier(spark, dir).count()),
      // leave-one-out z: three unordered window sums sharing one
      // group exchange — ~scan cost, top-20 output constant
      ("peer_zscore_loo", () =>
        graft.operators.Windows.peerZscore(spark, dir).count()),
      // two-pass late-dim resolve: pass 1 is the broadcast left join;
      // pass 2 rescans only the unknown slice (~1% of facts) — total
      // must track facts, result rows constant (priorities)
      ("late_dim_backfill", () =>
        graft.operators.WarehouseEtl.lateDim(spark, dir).count()),
      // windowed top-k: compact (window,type) agg + WindowGroupLimit
      // over the bounded agg table — ~scan cost
      ("windowed_topk", () =>
        graft.streaming.Streams.topkWindowBatch(spark, dir).count()),
      // vector-arith retrieval: 1-row broadcast compose + the
      // brute-force cosine scan — time must track the embedding scan
      ("vector_arith_scan", () =>
        graft.operators.Similarity.vectorArith(spark, dir).count()),
      // Benford census: one compact digit agg — pure scan cost
      ("benford_digits", () =>
        graft.operators.StatsOps.benford(spark, dir).count()),
      // periodogram: three window-free aggs over the calendar-bounded
      // hourly series — 10x events must cost ~the hourly-count scan
      ("periodogram_dft", () =>
        graft.operators.TimeSeries.periodogram(spark, dir).count()),
      // segment migration: two per-customer aggs + customer-sized
      // ntile windows (the rfm trade) — 10x orders must cost ~scan
      ("segment_migration", () =>
        graft.operators.Analytics.segmentMigration(spark, dir).count()),
      // HDR sketch: compact (e,sb) census (<= ~26*16 cells) + the
      // exact distinct-cents twin — both histogram-priced, ~scan
      ("hdr_percentiles", () =>
        graft.operators.StatsOps.hdrPercentiles(spark, dir).count()),
      // CDC chunking: one shingle-hash scan + doc-keyed flag window —
      // 10x docs must cost ~linearly (the sessionize shape)
      ("cdc_chunking", () =>
        graft.operators.Dedup.cdcChunking(spark, dir).count()),
      // STL: two calendar-bounded windows + a 24-row profile join —
      // cost must track the hourly-count scan
      ("stl_decompose", () =>
        graft.operators.TimeSeries.stlDecompose(spark, dir).count()),
      // RAKE: stoplist is a capped top-20 agg, islands a doc-keyed
      // window, scores two compact-key aggs — ~token-linear
      ("rake_keywords", () =>
        graft.operators.TextAnalysis.rakeKeywords(spark, dir).count()),
      // ML eval: AUC reduces through the bounded score histogram
      // (≤1e6 keys however large the pool) — cost must track the one
      // map-side-combinable scan, not the ordered midrank window
      ("ml_auc_histogram", () =>
        graft.operators.MlEval.auc(spark, dir).count()),
      // gain chart is the family's one data-sized sort (range
      // partitioned); ~n log n is the acceptable envelope here
      ("ml_gain_sort", () =>
        graft.operators.MlEval.gainDeciles(spark, dir).count()),
      // propensity matching runs entirely in score space after ONE
      // per-score conditional agg — the r10 probe caught the original
      // row-level formulation recomputing the scored pool 4x (13x
      // time at 10x rows); this row pins the single-pass rewrite flat
      ("propensity_score_space", () =>
        graft.operators.MlEval.propensityMatch(spark, dir).count()),
      // naive Bayes: one token explode into a compact (token) agg +
      // a |C|-bounded (doc, class) agg — 10x docs must cost ~scan,
      // the vocab cap (128) keeps the model broadcast-sized
      ("naive_bayes_e2e", () =>
        graft.operators.TextAnalysis.naiveBayes(spark, dir).count()),
      // random walks: hops are equi joins on RANK-INDEXED edge
      // tables (never a neighbor-list fan-out); r14 — the bounded
      // frontier (20 starts x 8 walks) is collected and pushed down
      // as IN filters, so the only data-sized stages left are ONE
      // distinct shuffle and one combinable degree agg (was: two full
      // rank windows + two degree aggs, 3.1x at 10x)
      ("random_walk_rank_hops", () =>
        graft.operators.GraphOps.randomWalk(spark, dir).count()),
      // Poisson bootstrap: the x64 map-side fan-out into a 64-key
      // combinable agg — the honest bootstrap cost, must stay ~64x
      // scan-linear with NO shuffle growth (output is 64 keys)
      ("bootstrap_64x_fanout", () =>
        graft.operators.StatsOps.bootstrapCi(spark, dir).count()),
      // JPEG marker walk: prefix decoded to an int array once, then
      // one COLUMN per walk step (the construction-time expression-
      // duplication lesson: a single folded Column cost ~28 s of
      // data-size-independent Catalyst analysis) — must be ~scan
      ("jpeg_marker_walk", () =>
        graft.operators.Multimodal.jpegHeader(spark, dir).count()),
      // r11: the histogram-ntile family — formerly data-sized
      // single-partition sorts (win_ntile measured 4.9x at 10x in
      // BENCH_r10_sf1); on the HistQuantile path only the
      // distinct-value table sorts, so the ratio must track the
      // VALUE-DOMAIN growth, not the row growth
      ("hist_ntile_quartiles", () =>
        graft.operators.Windows.ntileQuartiles(spark, dir).count()),
      ("hist_eqdepth_buckets", () =>
        graft.operators.Aggregations.histogramEqDepth(spark, dir).count()),
      ("hist_gain_deciles", () =>
        graft.operators.MlEval.gainDeciles(spark, dir).count()),
      ("hist_pareto_gini", () =>
        graft.operators.Analytics.pareto(spark, dir).count()),
      // r11: codec prefix decode — flat per-row cost must stay ~scan
      // after the hex-once/split fix (the lambda re-evaluation bug
      // cost ~1 ms/row before)
      ("codec_prefix_bmp", () =>
        graft.operators.Multimodal.bmpHeader(spark, dir).count()),
      // r11: rank statistics without global sorts — midrank
      // histograms (spearman) and the x64 multinomial relabel (BH)
      ("spearman_midranks", () =>
        graft.operators.StatsOps.spearman(spark, dir).count()),
      ("bh_fdr_64x_fanout", () =>
        graft.operators.StatsOps.bhFdr(spark, dir).count()),
      ("coverage_curve_fof", () =>
        graft.operators.TextAnalysis.coverageCurve(spark, dir).count()),
      ("event_transitions", () =>
        graft.operators.Analytics.eventTransitions(spark, dir).count()),
      // r11 batch 2: DBSCAN end-to-end — the √n-scaled domain keeps
      // eps-degree subcritical, so pair mass AND the CC fixpoint's
      // component sizes must grow ~linearly with rows, never
      // quadratically (the percolation argument in GeoOps.dbscan's
      // scaladoc, measured here)
      ("dbscan_end_to_end", () =>
        graft.operators.GeoOps.dbscan(spark, dir).count()),
      // r11 batch 2: min-hop BFS over the same eps-graph — frontier
      // expansion is 3 key-partitioned joins; cost tracks the pair
      // list, seeds stay a bounded id slice
      ("khop_reach_bfs", () =>
        graft.operators.GeoOps.khopReach(spark, dir).count()),
      // r11 batch 2: LM scoring joins — model tables are Zipf-bounded
      // (distinct n-grams grow sublinearly in the replica corpus), so
      // the scoring cost must track the held-out trigram row count
      ("trigram_backoff_scoring", () =>
        graft.operators.CorpusOps.trigramBackoff(spark, dir).count()),
      // r11 batch 2: the FK audit — five distinct-key censuses + key
      // joins; the lineitem edges dominate and must scale with the
      // fact table's DISTINCT KEYS, not its rows
      ("referential_integrity_5edges", () =>
        graft.operators.WarehouseEtl.referentialIntegrity(spark, dir).count())
    ).map { case (name, f) =>
      val (secs, n) = timeSecond(f)
      (name, secs, n)
    }

    // ---- as-of deep-history probe (VERDICT r2 #9): one hot key whose
    // history is deep — the shape where the join+window baseline
    // materializes |events|×|history| pairs before its rank-1 filter
    // (quadratic in the per-key depth) while AsofJoinExec's per-key
    // streaming merge walks each side once (O(n+m)). Both routes over
    // identical synthetic data: n events and n orders, ALL on one key.
    def asofDeep(n: Int, route: String): () => Long = () => {
      val left = spark.range(0, n).select(col("id").as("event_id"),
        lit(1L).as("key"), (col("id") * 7L % (10L * n)).as("t"))
      val right = spark.range(0, n).select(lit(1L).as("rkey"),
        (col("id") * 3L % (10L * n)).as("rt"), col("id").as("rid"))
      route match {
        case "window" =>
          import org.apache.spark.sql.expressions.Window
          val w = Window.partitionBy(col("event_id"))
            .orderBy(col("rt").desc, col("rid").desc)
          left.join(right, col("key") === col("rkey") && col("rt") <= col("t"))
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .count()
        case _ =>
          graft.plans.AsofJoin.asofJoin(spark, left, right,
            "key", "t", "rkey", "rt", "rid", Seq("rid")).count()
      }
    }
    val asofRows = Seq("window" -> "asof_window_deep (pair-materializing baseline)",
      "exec" -> "asof_exec_deep (AsofJoinExec streaming merge)").map {
      case (route, label) =>
        val (s1, _) = timeSecond(asofDeep(1000, route))
        val (s2, _) = timeSecond(asofDeep(10000, route))
        (label, s1, s2)
    }

    // ---- interval-join deep-history probe (r13 verdict #4): ONE hot
    // user with n errors + n events over a span that GROWS with n
    // (constant per-hour rate — "deep history", not "denser hour", so
    // true band pairs grow ~linearly). The user-keyed baseline
    // evaluates |errors_u|×|events_u| candidates on the hot key
    // (quadratic in depth) before its band filter; the (user, cell)
    // composite key bounds candidates by per-hour density, so its
    // cost must track the ~linear true pair mass. Result rows (the
    // surviving band pairs) are IDENTICAL between routes by
    // construction — only the candidate work differs.
    def rangeDeep(n: Int, route: String): () => Long = () => {
      val hourNs = 3600L * 1000L * 1000L * 1000L
      // constant rate 10 rows/side/hour at ANY n: row i owns slot
      // i·(hour/10) with a deterministic in-slot jitter (a plain
      // `i·K % span` spread fails silently — K·n ≪ span leaves every
      // row in the first cells and degenerates both routes, measured)
      val slot = hourNs / 10L
      val err = spark.range(0, n).select(col("id").as("err_id"),
        lit(1L).as("err_user"),
        (col("id") * slot + col("id") * 7919L % slot).as("err_ts"))
      val fol = spark.range(0, n).select(lit(1L).as("user_id"),
        (col("id") * slot + col("id") * 104729L % slot).as("ts_ns"))
      route match {
        case "user-key" =>
          err.join(fol, col("err_user") === col("user_id") &&
            col("ts_ns") > col("err_ts") &&
            col("ts_ns") <= col("err_ts") + hourNs).count()
        case _ =>
          val e2 = err.withColumn("err_cell", explode(sequence(
            expr(s"err_ts div ${hourNs}L"),
            expr(s"(err_ts + ${hourNs}L) div ${hourNs}L"))))
          val f2 = fol.withColumn("cell", expr(s"ts_ns div ${hourNs}L"))
          e2.join(f2, col("err_user") === col("user_id") &&
            col("err_cell") === col("cell") &&
            col("ts_ns") > col("err_ts") &&
            col("ts_ns") <= col("err_ts") + hourNs).count()
      }
    }
    // sized so the quadratic term is visible over codegen's raw
    // compare speed: at 10^4/side the baseline's 10^8 candidate evals
    // hide under ~0.2 s of vectorized compares; at 10^5 they are 10^10
    // and the law shows (the cell route's candidates stay ~linear)
    val rangeDeepRows = Seq(
      "user-key" -> "range_userkey_deep (user-keyed baseline: candidates = |err|x|hist| on the hot key)",
      "cell" -> "range_cell_deep ((user, cell) composite key: candidates bounded by per-hour density)").map {
      case (route, label) =>
        val (s1, _) = timeSecond(rangeDeep(10000, route))
        val (s2, _) = timeSecond(rangeDeep(100000, route))
        (label, s1, s2)
    }

    // ---- hot-bucket skew probe (VERDICT r4 #5): real corpora carry
    // replica clusters — ONE band bucket holding every copy, whose
    // n(n-1)/2 pairs dominate the candidate join however well the
    // average bucket behaves. Build it deliberately: sf0.1's docs
    // plus 2000 ids sharing one text (identical text ⇒ identical
    // minhash signature ⇒ one hot bucket per band). The cap is the
    // damage bound — candidates return to the base corpus's mass —
    // and the census counts what it cost, so the drop is audited,
    // never silent.
    val skewRows = {
      val hot = spark.range(0, 2000)
        .select((col("id") + 1000000000L).as("doc_id"),
          lit("the quick brown fox jumps over the lazy dog").as("text"))
      val docs = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
        .unionByName(hot).localCheckpoint() // freeze: one corpus, three probes
      Seq[(String, () => Long)](
        ("skew_uncapped_candidates (hot bucket of 2000 ⇒ ~2M pairs from ONE text)", () =>
          graft.api.Graft.bandCandidates(docs, "text", "doc_id", 3, 4, Int.MaxValue).count()),
        ("skew_cap64_candidates (hot bucket excluded; base corpus mass remains)", () =>
          graft.api.Graft.bandCandidates(docs, "text", "doc_id", 3, 4, 64).count()),
        ("skew_cap64_dropped_buckets (the audited census of what the cap cost)", () =>
          graft.api.Graft.oversizedBandBuckets(docs, "text", "doc_id", 3, 4, 64).count())
      ).map { case (name, f) => val (s, n) = timeSecond(f); (name, s, n) }
    }

    // ---- connected-components probe: the fixpoint's two cost axes,
    // measured separately. Under pointer jumping, rounds scale with
    // log(diameter): a 10x LONGER chain (pathological worst case)
    // must cost log-more rounds, not 10x; the 10x BIGGER near-dup
    // corpus (constant cluster diameter) must cost ~flat rounds with
    // per-round volume scaling linearly. One timed run per row: the
    // fixpoint is itself a multi-round job sequence, so submission
    // noise amortizes within a single run.
    def ccChain(n: Int): () => Long = () => {
      val edges = spark.range(0, n - 1)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      graft.api.Graft.connectedComponents(edges, "a", "b").count()
    }
    def ccKeep(dir: String): () => Long = () =>
      graft.api.Graft.dedupCorpus(
        Tables.documents(spark, dir), "text", "doc_id").count()
    def once(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val ccRows = {
      // warm untimed: per-round plans are fresh after each
      // localCheckpoint, so the FIRST fixpoint run pays codegen
      // compilation on every round — charging that to the small cell
      // inverted the chain ratio in an earlier probe run
      once(ccChain(200))
      val (c1s, c1n) = once(ccChain(2000))
      val (c2s, c2n) = once(ccChain(20000))
      def pairCount(dir: String): () => Long = () =>
        graft.api.Graft.nearDupPairs(
          Tables.documents(spark, dir), "text", "doc_id").count()
      val (p1s, p1n) = once(pairCount(sf01))
      val (p2s, p2n) = once(pairCount(big))
      val (k1s, k1n) = once(ccKeep(sf01))
      val (k2s, k2n) = once(ccKeep(big))
      // r11 task #4, reconciled r12 (shared edge checkpoint +
      // adaptive hooking): the star pre-collapse variant measured
      // against the plain fixpoint on the SAME verified-pair edge
      // lists at both scales; the focused interleaved min-of-3
      // version of this comparison is `ScaleProbe cc-reconcile`
      def ccOnPairs(dir: String, pre: Boolean): () => Long = () => {
        val pairs = graft.api.Graft.nearDupPairs(
          Tables.documents(spark, dir), "text", "doc_id")
        graft.api.Graft.connectedComponents(pairs, "id_a", "id_b",
          preCollapse = pre).count()
      }
      val (f1s, f1n) = once(ccOnPairs(sf01, false))
      val (f2s, f2n) = once(ccOnPairs(big, false))
      val (g1s, g1n) = once(ccOnPairs(sf01, true))
      val (g2s, g2n) = once(ccOnPairs(big, true))
      Seq(
        ("cc_chain 2k -> 20k nodes (diameter 10x: rounds grow ~log)", c1s, c2s, c1n, c2n),
        ("neardup_verified_pairs (the graph's EDGES — replicas are near-dups of each other, so edge mass grows superlinearly by construction; the default cap64 bounds what was ~100x uncapped)", p1s, p2s, p1n, p2n),
        ("dedup_keep end-to-end (cost tracks the EDGE row above, not doc count)", k1s, k2s, k1n, k2n),
        ("cc_fixpoint_plain (pairs -> CC, no pre-collapse)", f1s, f2s, f1n, f2n),
        ("cc_fixpoint_precollapse (star contraction first — default; r12 adds S-V hooking)", g1s, g2s, g1n, g2n))
    }

    // ---- band-verify cost law with the PAIR-MASS DENOMINATOR (r13
    // verdict #3): the family's super-linear TIME ratios are the
    // output's — verified pairs grow ~34x per 10x docs on the replica
    // corpus BY CONSTRUCTION — so the honest unit is pairs/second,
    // printed here at both scales instead of argued in prose.
    val bandVerifyRows = Seq[(String, String => Long)](
      ("dedup_ngram_jaccard (verified pairs @ tau)",
        dir => graft.operators.Dedup.ngramJaccard(spark, dir).count()),
      ("dedup_containment (verified pairs @ 0.6)",
        dir => graft.operators.Dedup.containment(spark, dir).count()))
      .map { case (label, f) =>
        val (s1, n1) = timeSecond(() => f(sf01))
        val (s2, n2) = timeSecond(() => f(big))
        (label, s1, n1, s2, n2)
      }

    val small = probes(sf01)
    val large = probes(big)
    val sb = new StringBuilder
    sb.append(s"# SCALE — 10x scaling probe (sf0.1 -> ~sf1, local[$cpus])\n\n")
    sb.append("Generated by `graft.ScaleProbe` (see its scaladoc for methodology:\n")
    sb.append("perturbed replicas, best-of-5 warm timings, pair-generating probe\n")
    sb.append("included). 10x rows should cost <= ~10x time for the row-linear\n")
    sb.append("operators; `bucketed_cosine_pairs` is pair-quadratic WITHIN buckets,\n")
    sb.append("so its budget is bounded by bucket balance — watch its group count.\n\n")
    sb.append("Reading the ratios: sub-second rows are dominated by fixed\n")
    sb.append("job-submission overhead at BOTH scales on local[32] (sf0.1 does not\n")
    sb.append("saturate 32 cores), so a ratio at or below ~1x means the operator's\n")
    sb.append("compute is beneath the noise floor — the asymptotic evidence is the\n")
    sb.append("result-rows growth (e.g. candidate pairs vs the all-pairs bound),\n")
    sb.append("plus any row whose ratio approaches the data ratio.\n\n")
    sb.append("| operator | sf0.1 s | ~sf1 s | time ratio | sf0.1 result rows | ~sf1 result rows |\n|---|---|---|---|---|---|\n")
    small.zip(large).foreach { case ((n, s1, c1), (_, s2, c2)) =>
      sb.append(f"| $n | $s1%.2f | $s2%.2f | ${s2 / s1}%.1fx | $c1 | $c2 |\n")
    }
    sb.append("\n## As-of deep-history probe (one hot key, 10^3 -> 10^4 rows/side)\n\n")
    sb.append("The per-key-depth scaling law, measured: the join+window baseline\n")
    sb.append("materializes |events|x|history| pairs on the hot key before its\n")
    sb.append("rank-1 filter — candidate pairs grow 100x for a 10x depth increase\n")
    sb.append("(0.5M -> 50M here) — while AsofJoinExec's per-partition streaming\n")
    sb.append("merge holds one buffered row and walks each side once, so its cost\n")
    sb.append("tracks the 10x row growth. This is why `join_asof` is a\n")
    sb.append("correctness-only formulation (excluded from the bench headline set)\n")
    sb.append("and `join_asof_plan` is the production route.\n\n")
    sb.append("| route | 10^3 s | 10^4 s | time ratio (10x rows) |\n|---|---|---|---|\n")
    asofRows.foreach { case (label, s1, s2) =>
      sb.append(f"| $label | $s1%.2f | $s2%.2f | ${s2 / s1}%.1fx |\n")
    }
    sb.append("\n## Interval-join deep-history probe (one hot user, 10^4 -> 10^5 rows/side, constant rate)\n\n")
    sb.append("The per-key-depth law for BANDED interval joins (r13 verdict #4):\n")
    sb.append("`join_range_events` hash-joins on user_id alone, so a hot user's\n")
    sb.append("candidate pairs are |errors_u| x |events_u| — quadratic in history\n")
    sb.append("depth even when the 1-hour band keeps TRUE pairs linear.\n")
    sb.append("`join_range_events_cell` adds the interval-width time cell to the\n")
    sb.append("shuffle key ((user, cell) — each window explodes to <=2 cells, each\n")
    sb.append("event maps to exactly one, so no dedup pass), bounding candidates\n")
    sb.append("by per-hour density. Both routes return identical rows; the\n")
    sb.append("baseline stays registered as the documented correctness twin.\n\n")
    sb.append("| route | 10^4 s | 10^5 s | time ratio (10x depth) |\n|---|---|---|---|\n")
    rangeDeepRows.foreach { case (label, s1, s2) =>
      sb.append(f"| $label | $s1%.2f | $s2%.2f | ${s2 / s1}%.1fx |\n")
    }
    sb.append("\n## Band-verify cost law — the pair-mass denominator (r13 verdict #3)\n\n")
    sb.append("Verified-pair OUTPUT grows ~34x per 10x docs on the replica corpus\n")
    sb.append("by construction (every doc gains 9 true near-dups; intra-cluster\n")
    sb.append("pairs are quadratic in cluster size), so doc count is the wrong\n")
    sb.append("denominator for this family. The honest unit — pairs verified per\n")
    sb.append("second — must be FLAT or rising at 10x; a real 10x corpus grows\n")
    sb.append("true pairs ~linearly and pays ~linear cost through the same plan.\n\n")
    sb.append("| endpoint | sf0.1 s | pairs | pairs/s | ~sf1 s | pairs | pairs/s | pair ratio | time ratio |\n|---|---|---|---|---|---|---|---|---|\n")
    bandVerifyRows.foreach { case (label, s1, n1, s2, n2) =>
      sb.append(f"| $label | $s1%.2f | $n1 | ${n1 / s1}%.0f | $s2%.2f | $n2 | ${n2 / s2}%.0f | ${n2.toDouble / n1}%.1fx | ${s2 / s1}%.1fx |\n")
    }
    sb.append("\n## Hot-bucket skew probe (one replica cluster of 2000 docs, sf0.1 base)\n\n")
    sb.append("Replica clusters put every copy in ONE band bucket; its n(n-1)/2\n")
    sb.append("pairs dominate the join regardless of average bucket balance. The\n")
    sb.append("default endpoint cap (64) excludes the hot bucket — candidate mass\n")
    sb.append("returns to the base corpus's — and the census row audits exactly\n")
    sb.append("which buckets were dropped and how big they were. (Exact dedup\n")
    sb.append("upstream removes identical-text clusters; the cap covers the\n")
    sb.append("near-identical ones that survive it.)\n\n")
    sb.append("| probe | s | result rows |\n|---|---|---|\n")
    skewRows.foreach { case (label, s, n) =>
      sb.append(f"| $label | $s%.2f | $n |\n")
    }
    sb.append("\n## Connected-components probe (pointer-jumped min-label propagation)\n\n")
    sb.append("Two axes measured separately: a 10x LONGER chain is the diameter\n")
    sb.append("worst case — pointer jumping must hold the round count to ~log\n")
    sb.append("growth (without it, rounds = diameter and the chain row would go\n")
    sb.append("10x) — while the BIGGER corpus keeps cluster diameters constant,\n")
    sb.append("so rounds stay flat and cost follows per-round shuffle volume =\n")
    sb.append("the verified-pair EDGE count. The replica corpus grows that edge\n")
    sb.append("count superlinearly BY CONSTRUCTION (every doc gains 9\n")
    sb.append("near-identical siblings, and intra-cluster pairs are quadratic in\n")
    sb.append("cluster size — ~100x uncapped; the now-default band-bucket cap64\n")
    sb.append("bounds the hottest buckets, which is visible as sub-100x edge\n")
    sb.append("growth here), so dedup_keep's honest denominator is the edge row,\n")
    sb.append("not the doc count — a real 10x corpus grows edges ~linearly and\n")
    sb.append("pays ~linear cost. Single timed run per cell (the fixpoint's own\n")
    sb.append("rounds amortize submission noise).\n\n")
    sb.append("| probe | small s | 10x s | time ratio | small result rows | 10x result rows |\n|---|---|---|---|---|---|\n")
    ccRows.foreach { case (label, s1, s2, n1, n2) =>
      sb.append(f"| $label | $s1%.2f | $s2%.2f | ${s2 / s1}%.1fx | $n1 | $n2 |\n")
    }
    sb.append("\n## Fixpoint-invariant gate (~sf1 — the scale the oracle never reaches)\n\n")
    sb.append("One extra min-label propagate round over the labels the engine\n")
    sb.append("RETURNS must change zero rows — the from-outside certificate that\n")
    sb.append("the fixpoint actually converged (r12 verdict #1: the r11 ~sf1\n")
    sb.append("DBSCAN census was silently wrong because the fixpoint hit\n")
    sb.append("maxRounds unconverged; non-convergence now THROWS in the engine,\n")
    sb.append("and this gate additionally certifies the returned labels on the\n")
    sb.append("three production CC consumers at the 10x scale).\n\n")
    sb.append("| endpoint (production edge pipeline) | violations | labeled nodes | verdict |\n|---|---|---|---|\n")
    var invariantFailed = false
    ccInvariantRows(spark, big).foreach { case (name, v, n) =>
      if (v != 0L) invariantFailed = true
      sb.append(s"| $name | $v | $n | ${if (v == 0L) "PASS" else "FAIL"} |\n")
    }
    sb.append("\nr13 band-verify cost law (r12 verdict #2): dedup_ngram_jaccard and\n")
    sb.append("dedup_containment now verify on 60-bit HASHED token sets (long\n")
    sb.append("arrays shuffle ~2.5x smaller, intersect on primitives — jaccard/\n")
    sb.append("containment values unchanged under the injective relabeling), and\n")
    sb.append("containment uses the CAPPED production candidate stage it had\n")
    sb.append("shipped without. Measured (q-mode interleaved A/B): ngram ~sf1\n")
    sb.append("8.24 -> 5.40 s (ratio 4.4x -> 2.9x), containment 6.73 -> 4.43 s\n")
    sb.append("(4.4x -> 3.9x). The REMAINING super-linearity is the output's:\n")
    sb.append("verified pairs grow ~34x per 10x docs on this corpus BY\n")
    sb.append("CONSTRUCTION (every doc gains 9 true near-dups; see the\n")
    sb.append("neardup_verified_pairs row), so a ~3x time ratio is strongly\n")
    sb.append("SUBLINEAR in output — the honest denominator is pair mass, not\n")
    sb.append("doc count, exactly like dedup_keep. A real 10x corpus grows true\n")
    sb.append("pairs ~linearly and pays ~linear cost through the same plan.\n")
    sb.append("\ncorpus_cooccurrence root cause (r12 verdict #3, closed r13): the\n")
    sb.append("4.3x ratio was the positional equi join — ~3x tokens of exploded\n")
    sb.append("(doc_id, position) rows shuffled to look up values the token\n")
    sb.append("array already holds. Rewritten MAP-ONLY (zip the array with its\n")
    sb.append("own offset-slices); the one remaining shuffle is the map-side-\n")
    sb.append("combined pair agg on Zipf-compact keys. Measured: sf0.1\n")
    sb.append("0.90 -> 0.73 s, ~sf1 2.85 -> 0.88 s, ratio 1.2x.\n")
    sb.append("\ngraph_triangles root cause (r12 verdict watch item, closed r13):\n")
    sb.append("the 0.44 (r10) -> 0.71 s (r12) drift at sf0.1 is the shared\n")
    sb.append("upstream fuzzy dictionary join, not the triangle plan —\n")
    sb.append("join_fuzzy_blocked alone measures ~0.6 s on the regenerated\n")
    sb.append("(Aug-2026) corpus, and the triangle stage adds ~0.1 s on top.\n")
    sb.append("Additionally the edge list is now localCheckpoint'd once (five\n")
    sb.append("consumers with differing join keys defeat ReusedExchange), which\n")
    sb.append("measured 0.82 -> 0.70 s sf0.1 and 0.85 -> 0.73 s ~sf1 (q-mode\n")
    sb.append("min-of-3, interleaved A/B).\n")
    sb.append("\nr12 reconciliation (replaces the contradictory r11 numbers —\n")
    sb.append("`ScaleProbe cc-reconcile` is the controlled interleaved min-of-3\n")
    sb.append("on pre-materialized edge lists): the r11 disagreement traced to\n")
    sb.append("the pre-collapse branch re-evaluating the upstream pair pipeline\n")
    sb.append("twice (fixed: the symmetric edge list is checkpointed once, before\n")
    sb.append("any branch). With the fix, pre-collapse wins at both scales on the\n")
    sb.append("dedup pair graphs (sf0.1 1.64 -> 1.34 s; ~sf1 4.69 -> 2.12 s),\n")
    sb.append("ties on tiny graphs (the 1024-edge floor skips it), and only the\n")
    sb.append("pure chain pays (~1.3x; paths don't star-contract) -- default\n")
    sb.append("stays ON. The fixpoint additionally gained adaptive\n")
    sb.append("Shiloach-Vishkin hooking (arms at round 6): the ~sf1 dbscan\n")
    sb.append("lattice interleaves ids with position, every other node is a\n")
    sb.append("local minimum absorbing the pointer jump, and the r11 fixpoint\n")
    sb.append("hit maxRounds=50 UNCONVERGED there (silently wrong clusters);\n")
    sb.append("hooked it converges in ~10 rounds and the dbscan ~sf1 census is\n")
    sb.append("now correct (70 clusters, not 76). dedup_keep at sf0.1 lands at\n")
    sb.append("~3.2 s, not the <=2.7 s the r11 review hoped: the residual cost\n")
    sb.append("is the PAIR-GENERATION stage (~2.5 s of it -- see\n")
    sb.append("neardup_verified_pairs above), not the CC stage the pre-collapse\n")
    sb.append("question was about; shrinking it further is LSH-parameter work,\n")
    sb.append("not fixpoint work.\n")
    sb.append("\nr14 iterative-graph tail close (r13 verdict #1/#2 — all three\n")
    sb.append("weak-set members rewritten, measured q-mode interleaved min-of-3):\n")
    sb.append("graph_random_walk 7.12 -> 2.88 s ~sf1 (ratio 3.1x -> 2.0x) — the\n")
    sb.append("cost was two DATA-SIZED rank windows + two degree aggs feeding a\n")
    sb.append("<=160-row frontier; the frontier ids are now collected (bounded by\n")
    sb.append("construction) and pushed down as IN filters so the windows see only\n")
    sb.append("frontier edges. graph_khop_reach 1.35/2.61 s (ratio 3.0x -> 1.9x) —\n")
    sb.append("the per-round loop re-grouped the WHOLE cumulative reach set and\n")
    sb.append("checkpointed it every hop (~7 jobs of fixed latency); the 3 hops\n")
    sb.append("are now unrolled into ONE declarative plan (per-hop frontier\n")
    sb.append("distinct only, min-hop fold once at the end). sim_hard_negatives\n")
    sb.append("0.90/1.52 s (ratio 3.5x -> 1.7x) — the pair join was evaluated\n")
    sb.append("TWICE (un-cached, once per rank branch) plus two window exchanges\n")
    sb.append("plus a rejoin; top-1-per-side needs no windows at all — one\n")
    sb.append("conditional struct-max groupBy reduces the pair stream map-side.\n")
    sb.append("join_range_events' depth hazard (r13 #4) is closed by the\n")
    sb.append("join_range_events_cell twin ((user, cell) composite key, measured\n")
    sb.append("1.4x at 10x depth vs 4.5x baseline; one-hot-user probe above).\n")
    sb.append("\ngraph_eff_diameter measured negative (r14): the op was built\n")
    sb.append("all-sources first (exact ANF) and probed 32x per 10x nodes (2.1 ->\n")
    sb.append("67.9 s warm q-mode; 197 s cold) — root cause is PAIR MASS, not the\n")
    sb.append("plan: reach pairs grew 60x (61k -> 3.7M at h=1) because replica\n")
    sb.append("copies of a customer land at FIXED coordinate offsets of the\n")
    sb.append("original, inflating mean eps-degree 4.1 -> 24.7 (a replica-\n")
    sb.append("construction artifact of the same family as the dedup pair laws).\n")
    sb.append("Shipped form samples sources uniformly (id % 100 = 0 — the khop/\n")
    sb.append("closeness seed slice): the share curve the diameter reads is\n")
    sb.append("preserved to 3 decimals (h1/h4 = 0.336 sampled vs 0.335 exact at\n")
    sb.append("~sf1) at ~30x less cost — the HyperANF trade, made explicit and\n")
    sb.append("measured rather than assumed.\n")
    sb.append("\ngeo_dbscan cost close (r12 verdict #7, closed r13 with two\n")
    sb.append("MEASURED NEGATIVE results — dbscan-probe/dbscan-stages, min-of-3):\n")
    sb.append("the stage probe pins the cost to the CC fixpoint on the core-edge\n")
    sb.append("graph (sf0.1: eps_pairs 2.4 s, core_edges 0.2 s, cc 6.4 s cold),\n")
    sb.append("which is JOB-LATENCY-bound, not volume-bound (27 k edges). (a)\n")
    sb.append("Arming the S-V hook at round 0 for contraction levels >=1 did not\n")
    sb.append("cut rounds (8/10 either way — the plain propagate+jump count is\n")
    sb.append("already ~log(diameter)-optimal on the lattice residue) and its 2\n")
    sb.append("extra shuffles/round regressed 5.9 -> 6.3 s sf0.1, 17.1 -> 22.4 s\n")
    sb.append("~sf1. (b) Batching 2 unmaterialized rounds/job to amortize fixed\n")
    sb.append("latency regressed 5.9 -> 8.9 s / 17.1 -> 36.0 s: the pointer jump\n")
    sb.append("is a SELF-JOIN on the fresh labels, so unmaterialized rounds\n")
    sb.append("re-evaluate their predecessor twice (geometric). Cell-local\n")
    sb.append("pre-union (the r11 task-#3 idea) is subsumed by the level-0 star\n")
    sb.append("contraction, which already contracts over ALL neighbors, not just\n")
    sb.append("cell-mates. The shipped shape — contraction + jumped fixpoint +\n")
    sb.append("round-6 hook insurance — is the measured optimum of the family;\n")
    sb.append("residual cost is convergence insurance, priced at ~8 fixpoint\n")
    sb.append("jobs.\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("docs/SCALE.md"), sb.toString)
    println(sb.toString)
    spark.stop()
    // the gate is a GATE: a violated invariant must fail the probe run
    // loudly, not just annotate the report
    if (invariantFailed)
      throw new IllegalStateException(
        "fixpoint-invariant gate FAILED - see docs/SCALE.md")
  }
}
