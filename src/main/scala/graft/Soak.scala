package graft
import org.apache.spark.sql.functions._
import graft.streaming.Events
import graft.dedup.Dedup
import graft.functions.cosine_distance
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timeIt(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SOAK|$name|${(System.nanoTime()-t0)/1e9}%.2f s|rows=$n")
    }
    // lineitem x20 = 12M rows, keys shifted so joins stay realistic
    val l0 = GraftSession.table(spark, dir, "lineitem")
    val REP = sys.env.getOrElse("SOAK_REPS", "20").toInt
    val reps = (0 until REP).map(i => l0.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
    val l = reps.reduce(_ unionByName _).cache()
    timeIt(s"materialize_lineitem_${REP * 600}k")(l.count())
    timeIt(s"agg_q01_${REP * 600}k") {
      l.filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), count(lit(1))).count()
    }
    timeIt(s"window_running_sum_${REP * 600}k") {
      l.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))).filter(col("rn") <= 5).count()
    }
    val o0 = GraftSession.table(spark, dir, "orders")
    val o = (0 until REP).map(i => o0.withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L))).reduce(_ unionByName _)
    timeIt(s"join_agg_${REP * 150}k_x_${REP * 600}k") {
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("l_extendedprice"))).count()
    }
    // events x20 = 2M rows sessionization
    val e0 = GraftSession.table(spark, dir, "events")
    val e = (0 until REP).map(i => e0.withColumn("user_id", col("user_id") + lit(i * 100000L))).reduce(_ unionByName _).cache()
    timeIt(s"materialize_events_${REP * 100}k")(e.count())
    timeIt(s"sessionize_${REP * 100}k")(Events.sessionize(e, 30).count())
    // embeddings x50 = 100k vectors: brute topk + lsh pairs
    val v0 = GraftSession.table(spark, dir, "embeddings")
    val VREP = math.max(REP * 5 / 2, 1)
    val v = (0 until VREP).map(i => v0.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))).reduce(_ unionByName _).cache()
    timeIt(s"materialize_vecs_${VREP * 2}k")(v.count())
    val q = v0.filter(col("vec_id") === 0).head().getSeq[Float](1).toArray
    timeIt(s"brute_topk_${VREP * 2}k")(graft.similarity.Knn.topK(v, "embedding", q, 20, "vec_id").count())
    timeIt(s"lsh_pairs_${VREP * 2}k")(Dedup.embeddingLshPairs(v, "embedding", "vec_id", 0.5, 16).count())
    // 3072-dim fp16 path (reference HALFVEC(3072) parity): vectors stored
    // encoded at 2 B/dim, widened to float + scored in the scan — the
    // at-rest layout the reference's pgvector halfvec column uses
    // documents x20 = 100k docs, each original carried as 20 near-dup
    // copies (one-token mutation) — the realistic shape a dedup run sees
    val d0 = GraftSession.table(spark, dir, "documents")
    val d = (0 until REP).map(i => d0.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" rep$i")).as("text")))
      .reduce(_ unionByName _).cache()
    timeIt(s"materialize_docs_${REP * 5}k")(d.count())
    timeIt(s"heavy_hitters_${REP * 5}k")(
      graft.text.TextAnalysis.heavyHitterShingles(d, "text", 3, 20).count())
    // exact posting-list Jaccard verifies every pair sharing a shingle —
    // Θ(shingles·D²) candidates on D-copy cliques; soaked at 5× as the
    // reference point for what the LSH path avoids
    val d5 = (0 until 5).map(i => d0.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" rep$i")).as("text")))
      .reduce(_ unionByName _)
    timeIt("jaccard_pairs_exact_25k")(
      Dedup.jaccardPairs(d5, "text", "doc_id", 0.5,
        maxShingleDf = Some(1000)).count())
    // the 100-TB path: banded candidates + exact per-pair verification
    timeIt(s"lsh_verified_pairs_${REP * 5}k")(
      Dedup.lshVerifiedPairs(d, "text", "doc_id", 0.5).count())
    timeIt(s"dedup_pipeline_lsh_${REP * 5}k")(
      Dedup.deduplicate(d, "text", "doc_id", 0.5, viaLsh = true).count())
    timeIt(s"decontaminate_${REP * 5}k_x_100") {
      val bench = d0.filter(col("doc_id") < 100)
        .select(col("doc_id"), concat(col("text"), lit(" bench")).as("text"))
      Dedup.crossCorpusPairs(d, bench, "text", "doc_id", 0.5,
        maxShingleDf = Some(1000)).count()
    }
    // r6 steady-state shape: a 5k mutated batch against the 100k corpus —
    // stage 1 (cross-corpus postings) must scale with the BATCH; every
    // batch doc matches the corpus, so internal dedup sees ~nothing
    timeIt(s"incremental_dedup_5k_vs_${REP * 5}k") {
      val batch = d0.select((col("doc_id") + 9000000L).as("doc_id"),
        concat(col("text"), lit(" newrev")).as("text"))
      Dedup.incrementalDeduplicate(d, batch, "text", "doc_id", 0.5).count()
    }
    // r6 quality filters over the same 100k near-dup corpus: the
    // repetition scan is a narrow no-shuffle projection; familiarity is
    // one explode + one bigram exchange + per-doc agg
    timeIt(s"repetition_scan_${REP * 5}k") {
      d.select(col("doc_id"),
          graft.text.TextAnalysis.dupKgramFraction(col("text"), 2).as("f2"),
          graft.text.TextAnalysis.dupKgramFraction(col("text"), 3).as("f3"))
        .filter(col("f2") <= 0.2 && col("f3") <= 0.18).count()
    }
    timeIt(s"bigram_familiarity_${REP * 5}k")(
      graft.text.TextAnalysis.bigramFamiliarity(d, "text", "doc_id").count())
    // r7 retrieval + corpus-prep families over the same 100k corpus
    timeIt(s"bm25_topk_${REP * 5}k")(
      graft.text.TextRank.bm25TopK(d, "text", "doc_id",
        Seq("join", "filter", "merge"), k = 20).count())
    val lexDir = graft.fixtures.Fp16Corpus.workRoot + s"/soak-lexindex-${REP * 5}k"
    timeIt(s"lexical_index_build_${REP * 5}k") {
      graft.text.TextRank.buildLexicalIndex(d, "text", "doc_id", lexDir); 1L
    }
    timeIt(s"lexical_index_search_${REP * 5}k")(
      graft.text.TextRank.searchLexicalIndex(spark, lexDir,
        Seq("join", "filter", "merge"), k = 20).count())
    // r8 delete/refresh lifecycle over the same index: a 5% takedown is
    // one O(batch) tombstone commit; the post-delete search pays one
    // anti-join until compaction merges (and physically erases)
    timeIt(s"lexical_delete_5pct_of_${REP * 5}k") {
      graft.text.TextRank.deleteFromLexicalIndex(spark, lexDir,
        d.filter(col("doc_id") % 20 === 3).select(col("doc_id")), "doc_id"); 1L
    }
    timeIt(s"lexical_search_tombstoned_${REP * 5}k")(
      graft.text.TextRank.searchLexicalIndex(spark, lexDir,
        Seq("join", "filter", "merge"), k = 20).count())
    timeIt(s"lexical_compact_${REP * 5}k") {
      graft.text.TextRank.compactLexicalIndex(spark, lexDir); 1L
    }
    timeIt(s"lexical_search_compacted_${REP * 5}k")(
      graft.text.TextRank.searchLexicalIndex(spark, lexDir,
        Seq("join", "filter", "merge"), k = 20).count())
    // CDC refresh at 100k: store + index application is O(delta); the
    // store version rewrite is the one O(corpus) pass (columnar stores
    // have no row-level update)
    locally {
      val storeDir = graft.fixtures.Fp16Corpus.workRoot +
        s"/soak-cdcstore-${REP * 5}k"
      val refLex = graft.fixtures.Fp16Corpus.workRoot +
        s"/soak-cdclex-${REP * 5}k"
      graft.sync.HighlightStore.writeAtomic(d, storeDir) // setup, untimed
      graft.text.TextRank.buildLexicalIndex(d, "text", "doc_id", refLex)
      val newSnap = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      timeIt(s"cdc_refresh_${REP * 5}k") {
        val delta = graft.sync.CorpusRefresh.refresh(spark, newSnap, "text",
          "doc_id", storeDir, lexIndexDir = Some(refLex))
        val out = delta.count(); delta.unpersist(); out
      }
    }
    timeIt(s"pack_token_stream_${REP * 5}k")(
      graft.text.CorpusPrep.packTokenStream(d, "text", "doc_id",
        windowTokens = 2048, bucketWidth = 1 << 16).count())
    // words sized for the bench (~10k distinct shingles → 8192×62 bits
    // keeps per-shingle FP ≈ 2e-4; an undersized filter saturates and
    // flags everything — the dial is documented on the operator)
    timeIt(s"bloom_decontaminate_${REP * 5}k_x_100") {
      val bench = d0.filter(col("doc_id") < 100)
        .select(col("doc_id"), concat(col("text"), lit(" bench")).as("text"))
      Dedup.bloomDecontaminate(d, bench, "text", "doc_id", words = 8192).count()
    }
    timeIt(s"cms_sketch_${REP * 5}k")(
      graft.text.TextAnalysis.cmsShingleCounts(d, "text").count())
    timeIt(s"temperature_mixture_${REP * 5}k") {
      val src = d.withColumn("source",
        concat(lit("s"), (col("doc_id") % 20).cast("string")))
      graft.text.CorpusPrep.temperatureMixture(src, "text", "source",
        alpha = 0.5, targetFrac = 0.5).count()
    }
    // r7 second-wave families over the soaked frames
    timeIt(s"hll_registers_${REP * 5}k") {
      val src = d.withColumn("source",
        concat(lit("s"), (col("doc_id") % 20).cast("string")))
      graft.text.TextAnalysis.hllRegisters(src, "text", "source").count()
    }
    // SemDeDup over 100k vectors (50-copy cliques): k grown with the
    // corpus (256 cells) so per-cell pair work stays ~ (n/k)^2 * k
    timeIt(s"semdedup_${VREP * 2}k_k256")(
      Dedup.semDeDup(v, "embedding", "vec_id",
        maxDistance = 0.1, k = 256, iters = 1).count())
    // salted join: planted 30%-hot key over the 2M-event fact side
    timeIt(s"salted_join_${REP * 100}k") {
      val skewed = e.withColumn("user_id",
        when(col("event_id") % 10 < 3, lit(7L)).otherwise(col("user_id")))
      val dim = skewed.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      graft.operators.SkewJoin.saltedJoin(skewed, dim,
        Seq("user_id"), nSalts = 32).count()
    }
    // bloom semi-join reduction over the soaked 12M-row lineitem
    timeIt(s"bloom_reduced_join_${REP * 600}k") {
      val hot = o.filter(col("o_totalprice") > 489000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
      graft.operators.SemiReduce.reducedJoin(l, hot,
        "l_orderkey", "o_orderkey", words = 4096).count()
    }
    // fuzzy join over 100k 24-char name prefixes (20-copy identical
    // cliques from the rep mutation — candidates are output-sensitive)
    timeIt(s"fuzzy_join_${REP * 5}k") {
      val names = d.select(col("doc_id"), substring(col("text"), 1, 24).as("t"))
      graft.operators.FuzzyJoin.editDistancePairs(names, "t", "doc_id",
        maxEdits = 1).count()
    }
    // PageRank over a 300k-edge content-derived graph, 3 iterations
    timeIt(s"pagerank_${REP * 5}k_docs_3x") {
      val n = REP * 5000L
      val h = graft.text.TextAnalysis.polyHash(col("text"))
      val dsts = (0 until 3).map { j =>
        (lit(graft.text.TextMath.MinHashA(j)) * h +
          lit(graft.text.TextMath.MinHashB(j))) %
          lit(graft.text.TextMath.Mod) % lit(n)
      }
      val edges = d.select(pmod(col("doc_id"), lit(n)).as("src"),
        explode(array(dsts: _*)).as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3).count()
    }
    // snapshot diff: 100k-doc re-ingest with 1/17 removals, 1/13 edits
    timeIt(s"snapshot_diff_${REP * 5}k") {
      val newSnap = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      graft.text.CorpusPrep.snapshotDiff(d, newSnap, "text", "doc_id").count()
    }
    // storage discipline: the dedup pipelines above ran full CCs; at most
    // each run's FINAL label generation may outlive it (until the driver
    // drops the reference and the ContextCleaner collects it) — measured
    // 4-5 = the deliberate l/e/v/d caches plus at most one lingering
    // final generation; superseded generations (one per CC ROUND) never
    // appear, which is the leak round 5 flagged
    println("SOAK|pinned_rdds|" + spark.sparkContext.getPersistentRDDs.size)
    val NV = sys.env.getOrElse("SOAK_VECS3072", "200000").toLong
    val store = {
      import spark.implicits._
      spark.range(NV)
        .mapPartitions(_.map(vid =>
          (vid, graft.functions.Fp16.encode(graft.fixtures.Fp16Corpus.vector(vid)))))
        .toDF("id", "emb16").cache()
    }
    timeIt(s"materialize_fp16_3072_${NV / 1000}k")(store.count())
    val probe3k = graft.fixtures.Fp16Corpus.probe
    timeIt(s"fp16_topk_3072_${NV / 1000}k") {
      store.select(col("id"),
          cosine_distance(graft.functions.fp16_decode(col("emb16")), typedLit(probe3k)).as("score"))
        .orderBy(col("score"), col("id")).limit(20).count()
    }
    // r10 ANN additions over the same soaked corpora --------------------
    // binary-sketch Hamming pre-filter: integer XOR+popcount over the
    // whole corpus, float math on 200 survivors only
    timeIt(s"hamming_prefilter_topk_${VREP * 2}k")(
      graft.similarity.Knn.hammingPrefilterTopK(v, "embedding", "vec_id",
        q, k = 20, candidates = 200).count())
    // int8-quantized scan (1 B/dim): encode once, fused dequant+cosine
    val v8 = v.select(col("vec_id"),
      graft.functions.int8_encode(col("embedding")).as("enc")).cache()
    timeIt(s"materialize_int8_${VREP * 2}k")(v8.count())
    timeIt(s"int8_topk_${VREP * 2}k") {
      v8.select(col("vec_id"),
          graft.functions.int8_cosine_distance(col("enc"), typedLit(q)).as("s"))
        .orderBy(col("s"), col("vec_id")).limit(20).count()
    }
    // the sketch at REFERENCE dimensionality, the way production runs it:
    // sketches computed ONCE at ingest and STORED (8 B/vector), the scan
    // reads sketches not vectors (6 KB fp16 → 8 B = 768×), rerank touches
    // 200 encoded rows via the fused fp16 kernel
    val sk3k = store.select(col("id"),
      graft.functions.hyperplane_bands(
        graft.functions.fp16_decode(col("emb16")), 2, 32, 777L).as("sk"))
      .cache()
    timeIt(s"materialize_sketch_3072_${NV / 1000}k")(sk3k.count())
    locally {
      val qsk = spark.range(1).select(graft.functions.hyperplane_bands(
          typedLit(probe3k), 2, 32, 777L).as("sk"))
        .head().getSeq[Long](0)
      val ham = (0 until 2)
        .map(b => bit_count(col("sk")(b).bitwiseXOR(lit(qsk(b)))))
        .reduce(_ + _)
      // two-phase serving: the sketch table answers the candidate cut
      // (8 B/row scan), then the vector store is probed for JUST those
      // 200 ids — locally an isin filter; at cluster scale the store is
      // bucketed by id and the probe is a partition-pruned point lookup
      timeIt(s"hamming_stored_sketch_scan_3072_${NV / 1000}k") {
        val ids = sk3k.withColumn("h", ham.cast("long"))
          .orderBy(col("h").asc, col("id").asc).limit(200)
          .select(col("id")).collect().map(_.getLong(0)).toSeq
        store.filter(col("id").isin(ids: _*))
          .select(col("id"), graft.functions.fp16_cosine_distance(
            col("emb16"), typedLit(probe3k)).as("score"))
          .orderBy(col("score"), col("id")).limit(20).count()
      }
    }
    // NN-Descent graph build at 10k nodes (the O(n·K̃²·rounds) family
    // member — q100's exact form would pay 100M pairs here)
    val v10k = v.filter(col("vec_id") % lit(10) === 0)
    timeIt(s"nndescent_build_${VREP / 5 * 2}k_x3") {
      graft.similarity.Knn.nnDescentGraph(v10k, "embedding", "vec_id",
        k = 5, rounds = 3).count()
    }
    // rolling 40-gram substring-dup profile over 100k docs
    timeIt(s"substring_dup_${REP * 5}k") {
      val g = d.select(col("doc_id"), explode(array_distinct(
        graft.functions.char_ngram_hashes(col("text"), 40))).as("gh"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))
      g.withColumn("nd", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("nd") > 1, 1L).otherwise(0L)).as("shared"))
        .count()
    }
    // r10 families over the same 100k near-dup corpus
    // trigram LM: counts shuffled by gram key, scoring = lag window +
    // five gram-key joins — the whole pipeline at 100k docs
    timeIt(s"ngram_lm_score_${REP * 5}k") {
      graft.text.TextAnalysis.ngramLmScore(d, "text", "doc_id",
        trainFilter = col("doc_id") % 10 < 8).count()
    }
    // the segment-maintained model: O(batch) append on top of a built
    // store — the claim is the APPEND cost, so time it alone
    val lmDir = graft.fixtures.Fp16Corpus.workRoot + s"/soak-lmstore-${REP * 5}k"
    timeIt(s"lm_store_build_${REP * 5}k") {
      graft.text.LmStore.build(d, "text", "doc_id", lmDir); 1L
    }
    timeIt(s"lm_store_append_5k_vs_${REP * 5}k") {
      graft.text.LmStore.append(d0.select(
          (col("doc_id") + 8000000L).as("doc_id"),
          concat(col("text"), lit(" lmrev")).as("text")),
        "text", "doc_id", lmDir); 1L
    }
    // weight-proportional sampling: narrow clocks + per-stratum top-k
    timeIt(s"weighted_sample_${REP * 5}k") {
      graft.text.CorpusPrep.weightedSample(
        d.withColumn("w", length(col("text")).cast("double"))
          .withColumn("src", pmod(col("doc_id"), lit(20L))),
        "text", "w", "doc_id", "src", k = 100).count()
    }
    // batch k-NN join: 2k queries x 100k corpus through one geometry —
    // neither side broadcasts; the broadcast form would ship 2k vectors
    // into every corpus task and window-rank 200M scored pairs
    timeIt(s"ivf_knn_join_2k_x_${VREP * 2}k") {
      val qs = v0.filter(col("vec_id") < 2000)
        .select((col("vec_id") + 77000000L).as("vec_id"), col("embedding"))
      graft.similarity.Knn.ivfKnnJoin(qs, v, "embedding", "vec_id",
        "embedding", "vec_id", k = 10, cells = 64, iters = 2,
        nprobe = 2).count()
    }
    spark.stop()
  }
}
