package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale check for the LSH pipelines: replicate the sf0.1
  * corpus N× (distinct ids, same content → every clone group is a real
  * near-dup cluster, the WORST case for candidate generation) and time
  * the inventory builders at 1× and N×. A banded equi-join pipeline
  * should scale ~linearly in input plus output pairs; a hidden
  * quadratic would blow past that. Prints one JSON line per operator.
  *
  * Each (op, scale) is timed `SPARK_GRAFT_RUNS` times (default 2,
  * best-of) with the 1×/N× pair interleaved per sample: single-run
  * ratios on a shared box wobbled 1.5× run-to-run on identical code
  * (r7: dd03 1.8↔2.6, cdc05 1.9↔2.9 — commit 9ac4bdc), and a
  * machine-load window that hits only one side of the pair fabricates
  * (or hides) exactly the super-linearity the gate exists to catch.
  *
  * Usage: `runMain graft.ScaleProbe [factor]` (default 10).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val base = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory(s"scale${factor}x").toString
    def replicate(table: String, idCols: Seq[String]): Unit = {
      // RAW read, not Tables.load: events.ts is parquet TIMESTAMP(NANOS)
      // and must replicate as its nano-long so the copy round-trips
      // Tables.load's div-1000 conversion exactly like the original
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val t = spark.read.parquet(s"$base/$table.parquet")
      val copies = (0 until factor).map { i =>
        idCols.foldLeft(t)((d, c) => d.withColumn(c, col(c) + lit(i.toLong * 10_000_000L)))
      }
      copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    // cdc04/cdc05 synthesize Debezium envelopes from events and run the
    // REAL parser over them — the probe confirms the parse path (one
    // json_tuple + two subtree parses per envelope, map-side) is linear
    replicate("events", Seq("event_id"))
    // graph probes (r12): the trade graph's FACT side replicates with
    // every join key shifted CONSISTENTLY per copy (orderkey on both
    // lineitem and orders, custkey on both orders and customer, suppkey
    // on both lineitem and supplier) so each copy joins within itself —
    // nation keys stay fixed, so the 25-vertex graph keeps its shape
    // with ~Nx the support weight. That is exactly the regime the probe
    // must confirm for the shuffled loops: the edge-BUILD scan grows
    // Nx, while the per-round label/keep-set shuffles are vertex-scale
    // and must stay FLAT (a round whose cost tracked fact volume would
    // be a broken plan). |V| growth itself is out of this fixture's
    // reach — the loops' |V| story is the PlanAuditSpec zero-broadcast
    // pins; this probe prices the constants.
    replicate("lineitem", Seq("l_orderkey", "l_suppkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    spark.read.parquet(s"$base/nation.parquet")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      def hygiene(): Unit = {
        // clearCache alone leaves localCheckpoint pins behind; released
        // deterministically so the 1x timing never pays residue from the
        // previous operator's Nx run (which would inflate time_ratio's
        // denominator — or the Nx numerator — arbitrarily)
        spark.catalog.clearCache()
        graft.operators.Materialize.releasePinned(spark)
        // squash this run's garbage (incl. dropped broadcast refs, which
        // the async ContextCleaner only reclaims after a GC) OUTSIDE the
        // next timing — dc01's 10x broadcast otherwise taxes whatever
        // op is measured after it (cdc04 read 4.9 s vs 1.3 s isolated)
        System.gc()
      }
      // MATERIALIZE the output (noop write — Bench's own contract),
      // never count(): Spark 4's distinct-keys propagation lets a
      // count() ELIMINATE aggregate-keyed left joins above the probed
      // work (measured r17: ss18's count 0.65 s vs 100 s materialized
      // at 10x — the probe was timing a joinless plan for the whole
      // batched-serving family, and only ss23, whose inner decision
      // join is not elidable, showed its true cost)
      def once(d: String): Double = {
        val sec = time {
          fn(spark, d).write.format("noop").mode("overwrite").save()
        }
        hygiene()
        sec
      }
      def rowsOf(d: String): Long = {
        val r = fn(spark, d).count(); hygiene(); r
      }
      // warm BOTH scales (also captures row counts): a first run at a
      // given scale pays JIT, codegen-compile and heap-growth costs
      // 2-3x the steady state (measured: cdc04 10x first run 17.6 s vs
      // 5.3 s warmed) — a cold 10x against a warmed 1x reads as a fake
      // super-linearity
      val r1 = rowsOf(base); val rN = rowsOf(dir)
      once(base); once(dir)
      // best-of-R per scale, pairs interleaved: a slow machine window
      // spanning one sample inflates at most one (1x, Nx) pair, and the
      // min over R decorrelated samples discards it on both sides
      val samples = (1 to runs).map(_ => (once(base), once(dir)))
      val s1 = samples.map(_._1).min
      val sN = samples.map(_._2).min
      // Locale.ROOT: the f-interpolator formats with the DEFAULT locale
      // and a comma-decimal JVM would emit invalid JSON here (the
      // ADVICE r11 class of bug, fixed in Bench.jnum — same rule for
      // every machine-parsed line)
      println(String.format(java.util.Locale.ROOT,
        """{"op":"%s","sec_1x":%.2f,"rows_1x":%d,"sec_%dx":%.2f,"rows_%dx":%d,"time_ratio":%.1f,"runs":%d}""",
        name, Double.box(s1), Long.box(r1), Integer.valueOf(factor), Double.box(sN),
        Integer.valueOf(factor), Long.box(rN), Double.box(sN / s1), Integer.valueOf(runs)))
      sN / s1
    }
    val ratios = Seq("dd03_minhash_lsh_pairs", "dd04_simhash_pairs",
      "dd05_ngram_jaccard_pairs", "dd06_embedding_neardup_lsh",
      "dd07_dedup_clusters", "dd09_semantic_clusters",
      "ss05_knn_join", "ss10_kmeans_train",
      "cdc04_envelope_parse", "cdc05_drop_taxonomy",
      "dc01_benchmark_overlap", "dd12_incremental_dedup",
      "dd13_duplicate_spans", "dd14_clusters_ptrjump",
      "gr09_cc_shuffled", "gr10_kcore_shuffled", "gr11_sssp",
      "gr12_pagerank_shuffled", "gr13_lpa_shuffled",
      "gr17_scc_seed_shuffled", "gr18_scc_decomposition",
      "dd15_bloom_incremental", "q62_forecast_salted_join",
      "dd17_multikey_linkage", "tx20_bpe_merges",
      "gr21_betweenness_sampled", "dd18_span_removal",
      // r15: the pipeline compositions — each stage core is probed
      // above, but the chaining joins and the manifest assembly are
      // new plan surface (VERDICT r14 #5); pk03's two-phase 256-bucket
      // prefix sum and tx22's per-epoch 1-row reduce should both be
      // scale-flat in everything but the featurize/ingest scan
      "pl01_corpus_build_manifest", "pl02_incremental_manifest",
      "pl03_rewrite_manifest", "pk03_packed_sequences",
      "tx22_perceptron_train",
      // r15: gr22 shares gr21's loop machinery (forward half only);
      // sp12's token->bucket frame is the one corpus-scale object —
      // both should track the scan, never the pair count
      "gr22_harmonic_closeness", "sp12_dsir_importance",
      // dd19's clone-replicated worst case: every copy repeats itself
      // identically, so laters/cut-set grow linearly with docs — the
      // (doc,gram) window must track that, never pair across docs
      "dd19_intradoc_repeat_scrub",
      // r16 (VERDICT r15 #7): pl04 is the heaviest composition (train +
      // calibrate + serve + admit) — with PerceptronStore the training
      // artifacts build once per probe JVM, so the probed growth is the
      // featurize scan + the scoring pass + pl01's chaining joins;
      // pl05's union-distinct of the two position-grain cut sets must
      // track duplicated tokens (both families grow linearly in the
      // clone design); ss18's batch serve must track corpus x probed
      // fraction, with routing/truth on the fixed query decile
      "pl04_model_gated_manifest", "pl05_combined_rewrite_manifest",
      "ss18_batched_ann_serving", "ss19_batched_ivfpq_adc",
      // r17 (VERDICT r16 #1-#4): ss20's serve must match ss18's
      // scale-flat shape over the accreted store (accretion itself is
      // batch-sized); dd21 adds a 3-row fold + one broadcast pick on
      // top of dd20's sweep (probed via its dd03/dd05 cores above);
      // pk05 rides tx20/tx21's vocabulary-sized encode + pk02's
      // two-phase rank; gr23's merge pass is component-grain — its
      // probed growth should be the edge-pipeline scan only
      "ss20_accreted_index_serving", "dd21_tuned_banding",
      "pk05_bpe_unit_shards", "gr23_incremental_cc",
      // r17 late additions: gr24's recompute must be sized by affected
      // components (the edge-pipeline scan is the floor); pk06 rides
      // pk05's encode + pk03's probed prefix sum; ss21/ss22 must hold
      // ss18/ss19's scale-flat serving shape off the accreted store
      "gr24_cc_edge_deletion", "pk06_bpe_unit_sequences",
      "ss21_accretion_drift_audit", "ss22_accreted_adc_serving",
      // gr25 composes both factored CC-delta cores; its probed growth,
      // like gr23/gr24's, should be the edge-pipeline scan
      "gr25_cc_mixed_delta",
      // ss23 composes ss21's audit fold (4 rows) with the chosen
      // posture's shipped serve — its probed shape is the serve's
      "ss23_drift_gated_retrain",
      // r17 continuation: pl06 composes pl05's cut union with tx21's
      // vocabulary pricing — the probed growth is the cut-position
      // index (duplicated tokens) + the encode, never corpus x vocab;
      // gr26's delta path must be sized by delta x degree (the store
      // build pays the wedge join once per probe JVM)
      "pl06_unit_priced_shards", "gr26_delta_triangles",
      // sk09's probed growth is the store build's one events scan (the
      // DiskMemo bootstrap); the serve itself reads day x cents rows
      "sk09_sketch_store_serving",
      // dd22 rides dd05's probed edge pipeline (the clone design grows
      // edges ~N²; the label work must stay component-grain on top)
      "dd22_incremental_clusters",
      // gr27's serve is one store read + a component-grain merge over
      // the delta2 slice — probed growth is the edge-pipeline scan
      "gr27_chained_cc_deltas",
      // q67's refresh must be sized by the drop terms (the store read
      // is the base view's I/O; the base x base join runs in no serve)
      "q67_join_mv_delta",
      // r18: gr28 is gr25's delta on the shuffled cores — same
      // edge-pipeline-scan growth plus per-join sort constants, never
      // a broadcast build; dc06 rides dc01's probed pair pipeline
      // (the sweep + choice are a 5-row fold); q68's counting refresh
      // adds a view-key aggregation that must track the view (linear),
      // never the base x base join; sk10/sk11's probed growth is the
      // store build's one events scan — the serves read day-grain
      // partial rows and must stay flat in everything but that scan
      "gr28_cc_delta_shuffled", "dc06_tuned_overlap",
      "q68_join_mv_counting", "sk10_hll_store_serving",
      "sk11_topk_store_serving",
      // ss24 serves ss20's scale-flat shape over the live view; the
      // tombstone anti-join probes a deletion-sized LONG set
      "ss24_deletion_serving",
      // q69's refresh is delta-term aggregates + one customer-grain
      // merge — the view's rows never materialize; growth must track
      // the delta joins, never base x base
      "q69_agg_mv_delta",
      // sk12 reads the same value-partial store as sk09 — growth is
      // the store build's one events scan, the serve day-grain
      "sk12_total_store_serving",
      // r19: dd23's probe-path verdicts are drop-sized over the live
      // view (the store build pays seed+accrete once per probe JVM;
      // the tombstone anti-joins probe a request-sized LONG set);
      // sk13 is sk09's serve over the restated store — the correction
      // is day-sized, growth is the store build's one events scan
      "dd23_erasure_verdicts", "sk13_restated_day_serving",
      // dd24's serve is a label-store read; its build rides dd23's
      // probe shape plus a COMPONENT-grain quotient fixpoint — probed
      // growth must track the probe hits, never corpus x corpus
      "dd24_streamed_cluster_labels",
      // r19: dc07/dc08 ride the registry build (create = one corpus
      // df scan, audits = dc01's probed broadcast asymmetry per
      // release); the serves are ledger reads — dc07 adds a
      // pair-grain anti-join, dc08 a release-count tombstone filter
      "dc07_retroactive_audit", "dc08_release_retraction",
      // q70's refresh is the q68/q69 delta-term joins plus an
      // affected-group multiset reconstruction off the persisted
      // row-grain view + stored delta (r19 optimization round — no
      // base scan in any refresh path) — growth must track the delta
      // terms and the affected groups' row support, never base x base
      "q70_minmax_mv_delta",
      // q71's refresh is the delta-term joins + a delta-key aux
      // lookup + a group-grain merge — growth must track the delta,
      // never the aux table's full size
      "q71_distinct_mv_delta")
      .map(n => n -> run(n))
    spark.stop()
    // regression gate: N x the data may cost at most ~N x the time (the
    // clone-group design makes output grow ~N² — a LINEAR time ratio
    // already means candidate generation is sublinear in output). A
    // hidden all-pairs would land near N², far past this bound.
    val bad = ratios.filter(_._2 >= factor)
    if (bad.nonEmpty) {
      System.err.println(s"[scaleprobe] FAIL: super-linear time ratios: " +
        bad.map { case (n, r) => f"$n=$r%.1f" }.mkString(", "))
      sys.exit(1)
    }
  }
}
