package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs before (and
  * after) dedup: reproducible subsetting and PII scrubbing. Pure Column
  * expressions — codegen'd, no UDFs, no shuffle of their own.
  * (100-TB extension surface; the reference has no corpus-prep analog.)
  */
object CorpusPrep {

  /** Deterministic content-hash sampling: keep a document iff
    * `polyHash(text) % buckets < keep` — a reproducible `keep/buckets`
    * subset that is stable across runs, partitionings, and id
    * reassignment (the hash is over CONTENT, not the key, so re-ingesting
    * the same corpus under new ids selects the same documents). This is
    * the sampling a pipeline uses for eval splits and for training
    * sketches (e.g. IVF centroids) where `.sample()`'s RNG would not be
    * replayable. Narrow filter — pushes to the scan, no shuffle. */
  def sampleByContentHash(df: DataFrame, textCol: String,
      buckets: Int, keep: Int): DataFrame = {
    require(buckets > 0 && keep >= 0 && keep <= buckets,
      s"sampleByContentHash: need 0 <= keep <= buckets, got $keep/$buckets")
    df.filter(pmod(TextAnalysis.polyHash(col(textCol)), lit(buckets.toLong))
      < keep.toLong)
  }

  /** Snapshot diff — the CDC primitive for corpus re-ingests: given an
    * old and a new snapshot of the same keyed corpus, emit one row per
    * key whose content changed, appeared, or disappeared. Training
    * pipelines re-crawl and re-ingest continuously; downstream stages
    * (re-embedding, re-dedup, index refresh) want the DELTA, never the
    * 100 TB "unchanged" set — so unchanged keys are filtered out before
    * anything materializes.
    *
    * Scale shape: each side reduces to (key, md5(text)) in a narrow
    * projection — the full-outer join carries 16-byte digests, never
    * document bodies — and the status derivation is a codegen'd CASE
    * over digest nullness/equality. One shuffle per side on the key.
    * Returns (keyCol, status) with status in added | removed | changed,
    * ordered by nothing (callers sort). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      keyCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("id"), md5(col(textCol)).as("odig"))
    val n = newDf.select(col(keyCol).as("id"), md5(col(textCol)).as("ndig"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(keyCol),
        when(col("odig").isNull, lit("added"))
          .when(col("ndig").isNull, lit("removed"))
          .when(col("odig") =!= col("ndig"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Exactly-n-per-stratum deterministic sample — eval-set and
    * human-review quota construction: rank every document inside its
    * stratum by (content hash, key) and keep the first `n`. Content-
    * keyed like [[sampleByContentHash]], so re-ingesting with different
    * surrogate keys selects the same documents; the key only breaks
    * exact-duplicate-text ties deterministically. Strata smaller than
    * `n` keep everything.
    *
    * Scale shape: one hash exchange on the stratum + a per-stratum sort
    * rank. The window truncates at `n`, but the SORT under it is over
    * each full stratum — for strata that are themselves shuffle-sized,
    * pre-filter with [[sampleByContentHash]] at a keep-rate a few ×
    * n/|stratum| first (content-keyed, so the pre-filter commutes with
    * the ranking), then rank the survivors. Returns the input rows that
    * made their stratum's quota. */
  def takeNPerStratum(df: DataFrame, textCol: String, strataCol: String,
      keyCol: String, n: Int): DataFrame = {
    require(n >= 0, s"takeNPerStratum: need n >= 0, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(TextAnalysis.polyHash(col(textCol)).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Weight-proportional sampling without replacement (Efraimidis &
    * Spirakis 2006, the exponential-clock form): every row draws
    * key = −ln(u)/w with u a CONTENT-HASH uniform in (0,1), and the k
    * smallest keys per stratum are exactly a w-proportional sample
    * without replacement — the quality-weighted subsample step of a
    * curation pipeline (w = quality score, token count, dup-cluster
    * size…). Hash-seeded rather than random, so re-runs, shards and the
    * oracle agree bit-for-bit; rows with w ≤ 0 are excluded (they have
    * no exponential clock).
    *
    * Scale shape: narrow per-row math + one per-stratum top-k. Same
    * stratum-size caveat as [[takeNPerStratum]]: the window sorts each
    * full stratum — for shuffle-sized strata either pre-thin with
    * [[sampleByContentHash]] or swap the window for the
    * `topk_pairs` bounded-heap aggregate (map-side partial heaps, no
    * sort). Returns (strataCol, rk, keyCol, weightCol) — the key
    * doubles stay internal so output stability never rides on ulp. */
  def weightedSample(df: DataFrame, textCol: String, weightCol: String,
      keyCol: String, strataCol: String, k: Int): DataFrame = {
    require(k >= 0, s"weightedSample: need k >= 0, got $k")
    val mod = TextMath.Mod
    val u = (TextAnalysis.polyHash(col(textCol)).cast("double") + lit(1.0)) /
      lit((mod + 1).toDouble)
    val key = -log(u) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(key.asc, col(keyCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(strataCol), col("rk"), col(keyCol), col(weightCol))
  }

  /** Scrub patterns. Kept RE2-compatible (no backtracking constructs) so
    * the same pattern text runs identically under Java regex (Spark) and
    * RE2 (DuckDB oracle) — and would under any RE2-based scan pushdown.
    * The email pattern is case-insensitive via the RE2-portable `(?i)`
    * flag (real corpora mix case; a lowercase-only class would ship
    * `John.Doe@Example.COM` through unmasked). */
  val EmailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IdPattern    = "\\d{3}-\\d{2}-\\d{4}"   // SSN-shaped 3-2-4
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"   // 3-3-4

  /** PII scrubbing: emails → `<EMAIL>`, SSN-shaped ids → `<ID>`,
    * phone-shaped numbers → `<PHONE>`. The 3-2-4 id pattern cannot match
    * inside a 3-3-4 phone (the middle-group widths differ), so the
    * replacement order is not load-bearing — but it is fixed, and the
    * composition is a single codegen'd expression chain per row. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        IdPattern, "<ID>"),
      PhonePattern, "<PHONE>")

  /** Source-weighted mixture sampling — training-data composition
    * control: each source keeps `rates(source)/buckets` of its documents
    * (`defaultKeep/buckets` for unlisted sources), decided by the same
    * content-hash rule as [[sampleByContentHash]] so the mixture is
    * reproducible across runs and id reassignment, and a document kept
    * at rate r stays kept at every rate ≥ r (nested subsets — raising a
    * source's weight only ADDS documents, never churns the ones already
    * selected). Narrow codegen filter; the rate lookup folds into a
    * CASE chain on the source column. */
  /** Per-source keep/copy rate as a CASE chain on the source column —
    * sorted fold → deterministic CASE order (Map iteration is not). */
  private def rateColumn(rates: Map[String, Int], defaultRate: Int,
      sourceCol: String): Column =
    rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
        when(col(sourceCol) === s, lit(r)).otherwise(acc)
      }

  def mixtureSample(df: DataFrame, textCol: String, sourceCol: String,
      rates: Map[String, Int], defaultKeep: Int, buckets: Int): DataFrame = {
    require(buckets > 0 && (rates.values ++ Seq(defaultKeep)).forall(r =>
      r >= 0 && r <= buckets),
      s"mixtureSample: every rate must be in [0, $buckets]; for rates " +
        "above buckets (upsampling) use mixtureResample")
    df.filter(pmod(TextAnalysis.polyHash(col(textCol)), lit(buckets.toLong))
      < rateColumn(rates, defaultKeep, sourceCol).cast("long"))
  }

  /** Mixture RESAMPLING — [[mixtureSample]] extended to rates above
    * `buckets`, the other half of training-mixture composition: a
    * high-value source is not only kept, it is repeated (epochs > 1). A
    * source at rate r emits `r / buckets` full copies of every document
    * plus one hash-selected extra copy for documents with
    * `polyHash(text) % buckets < r % buckets` — the same content-hash
    * rule as downsampling, so the fractional part keeps the nesting
    * guarantee (raising a rate only ADDS copies, never churns which
    * documents carry them) and rates ≤ buckets degenerate to exactly
    * [[mixtureSample]]'s selection. Each copy carries an `epoch` column
    * (0-based; the hash-selected remainder rides the LAST epoch) so a
    * downstream shuffle/interleave can keep repeated documents apart.
    *
    * `maxEpochs` is the repetition cap: every rate must satisfy
    * `rate ≤ maxEpochs · buckets` — the guard against a mixture config
    * silently repeating a small source dozens of times (memorization
    * risk outruns data value; the cap is refused loudly, not clamped).
    *
    * Shape: one narrow projection computes the copy count, then a single
    * generator (`explode(sequence(...))`) emits the copies — no shuffle,
    * no join; output rows scale with Σ rates/buckets, exactly the bytes
    * a downstream writer must produce anyway. */
  def mixtureResample(df: DataFrame, textCol: String, sourceCol: String,
      rates: Map[String, Int], defaultRate: Int, buckets: Int,
      maxEpochs: Int = 4): DataFrame = {
    require(buckets > 0 && maxEpochs >= 1,
      s"mixtureResample: need buckets > 0 and maxEpochs >= 1")
    require((rates.values ++ Seq(defaultRate)).forall(r =>
      r >= 0 && r <= maxEpochs * buckets),
      s"mixtureResample: every rate must be in [0, maxEpochs*buckets = " +
        s"${maxEpochs * buckets}] (repetition cap)")
    val r = rateColumn(rates, defaultRate, sourceCol).cast("long")
    val inFraction = pmod(TextAnalysis.polyHash(col(textCol)),
      lit(buckets.toLong)) < r % buckets
    // Column `/` is DOUBLE division — floor() it back to whole epochs
    val copies = floor(r / buckets).cast("long") +
      when(inFraction, 1L).otherwise(0L)
    // sequence(0, -1) would DESCEND, not return empty — drop zero-copy
    // rows before the generator
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), (col("__copies") - 1).cast("int"))))
      .drop("__copies")
  }

  /** Distribution-based length trimming (the C4-style outlier filter):
    * drop rows whose `lenCol` falls outside the corpus's own
    * [pLo, pHi] percentile band. The cutoffs are ONE tiny two-value
    * aggregate broadcast back over the corpus for a narrow filter.
    *
    * `approx = false` (default) uses the exact `percentile` aggregate —
    * deterministic and oracle-replicable, but it buffers every value per
    * group in the aggregation buffer. Over a single global cutoff pair
    * that is one buffer of corpus-cardinality values: fine for document
    * LENGTHS at any realistic scale factor, but the 100-TB-polite form
    * is `approx = true` — `percentile_approx` keeps a bounded sketch of
    * at most `accuracy` retained values (error ≤ 1/accuracy of the rank,
    * so accuracy = 10⁴ bounds the cutoff's rank error to 0.01 %), and
    * the sketch is mergeable, so partial aggregation stays map-side.
    * CorpusPrepSpec pins the divergence; the q75 gate keeps the exact
    * form (a sketch cutoff is implementation-defined, not portable SQL). */
  def trimByLength(df: DataFrame, lenCol: String, pLo: Double, pHi: Double,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi,
      s"trimByLength: need 0 <= pLo <= pHi <= 1, got [$pLo, $pHi]")
    val cuts =
      if (approx)
        df.agg(
          percentile_approx(col(lenCol), lit(pLo), lit(accuracy)).as("__lo"),
          percentile_approx(col(lenCol), lit(pHi), lit(accuracy)).as("__hi"))
      else
        df.agg(
          percentile(col(lenCol), lit(pLo)).as("__lo"),
          percentile(col(lenCol), lit(pHi)).as("__hi"))
    df.crossJoin(broadcast(cuts))
      .filter(col(lenCol) >= col("__lo") && col(lenCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Context-window chunking: split each document into overlapping
    * fixed-word-budget chunks — the op that turns raw documents into
    * training/RAG windows. Chunk i covers words
    * `[i·(chunkWords−overlap), i·(chunkWords−overlap) + chunkWords)`;
    * every document yields at least one chunk, and the last chunk is
    * allowed to run short rather than duplicating its predecessor's tail.
    * Per-row narrow math (the chunk count derives from the word count)
    * feeding one `posexplode` — rows multiply by ~n/step but nothing
    * shuffles; at scale the output is written partitioned, not collected.
    * The `transform` lambda here is interpreted (the HOF caveat from
    * SCALE.md) but runs once per CHUNK, not per token — ~n/step
    * invocations per document, each a bulk `slice` copy that the chunk
    * output requires anyway, so there is no per-element lambda tax to
    * move into a codegen expression.
    * Returns the input row's key plus (chunk_idx, chunk_text, n_words). */
  def chunkWords(df: DataFrame, textCol: String, keyCol: String,
      chunkWords: Int, overlap: Int): DataFrame = {
    require(chunkWords > 0 && overlap >= 0 && overlap < chunkWords,
      s"chunkWords: need 0 <= overlap < chunkWords, got $overlap/$chunkWords")
    val step = chunkWords - overlap
    val w = TextAnalysis.words(col(textCol))
    // ceil((n - overlap) / step) chunks cover all n words; floor 1
    val nChunks = greatest(lit(1),
      ceil((size(w) - overlap).cast("double") / step).cast("int"))
    df.select(col(keyCol), w.as("__w"), nChunks.as("__n"))
      .select(col(keyCol),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => slice(col("__w"), i * step + 1, lit(chunkWords)))))
      .select(col(keyCol), col("pos").cast("int").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_words"))
  }

  /** Token-stream sharding (the GPT-style concat-and-chunk packer): the
    * corpus is conceptually concatenated in `idCol` order and cut into
    * training windows of exactly `windowTokens` whitespace tokens; each
    * document reports which window its first token lands in
    * (`shard_start`), which its last lands in (`shard_end`), and its
    * token offset inside the first (`offset_in_shard`) — a
    * `shard_start != shard_end` row is one the loader must split across
    * windows. This is the layout decision a training pipeline makes once
    * per mixture epoch; everything downstream (loader shuffling, window
    * boundaries) is a pure function of these three integers.
    *
    * The global running token count is a two-level prefix sum, NOT one
    * giant window: documents bucket by `id div bucketWidth`, the
    * in-bucket prefix sum is a window over that bucket, and each
    * bucket's base offset comes from a window over the TINY per-bucket
    * subtotal table (one row per bucket), broadcast back. A single
    * `Window.orderBy(id)` over the corpus would drag every row through
    * one task — this shape keeps the big exchange hash-partitioned by
    * bucket with per-bucket sorts, and only bucket COUNT rows ever pass
    * through a single-partition window. Deterministic (bucket boundaries
    * are id arithmetic, not sampled range splits), so the assignment is
    * reproducible across runs and partitionings, and oracle-replicable.
    *
    * Returns (id, n_tokens, tokens_before, shard_start, shard_end,
    * offset_in_shard). */
  def packTokenStream(df: DataFrame, textCol: String, idCol: String,
      windowTokens: Int, bucketWidth: Long = 1 << 20): DataFrame = {
    require(windowTokens > 0 && bucketWidth > 0,
      s"packTokenStream: need windowTokens > 0 and bucketWidth > 0, " +
        s"got $windowTokens/$bucketWidth")
    val w = org.apache.spark.sql.expressions.Window
    val docs = df.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      floor(col(idCol) / bucketWidth).cast("long").as("__bucket"))
    val inBucket = w.partitionBy(col("__bucket")).orderBy(col("id"))
      .rowsBetween(w.unboundedPreceding, -1)
    // one row per bucket — a single-partition window over this table
    // touches bucket-count rows, never the corpus
    val bases = docs.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__subtotal"))
      .select(col("__bucket"),
        coalesce(sum(col("__subtotal")).over(
          w.orderBy(col("__bucket")).rowsBetween(w.unboundedPreceding, -1)),
          lit(0L)).as("__base"))
    val win = lit(windowTokens.toLong)
    docs
      .withColumn("__local", coalesce(sum(col("n_tokens")).over(inBucket), lit(0L)))
      .join(broadcast(bases), Seq("__bucket"))
      .select(col("id"), col("n_tokens"),
        (col("__base") + col("__local")).as("tokens_before"))
      .select(col("id"), col("n_tokens"), col("tokens_before"),
        floor(col("tokens_before") / win).cast("long").as("shard_start"),
        floor((col("tokens_before") + col("n_tokens") - 1) / win)
          .cast("long").as("shard_end"),
        pmod(col("tokens_before"), win).as("offset_in_shard"))
  }

  /** Shard EXPORT — where a curation pipeline ends: the corpus written
    * as one parquet directory per shard (whole documents, shard =
    * [[packTokenStream]]'s window containing the doc's first token, so
    * shards hold ~`shardTokens` whitespace tokens ± one document), plus
    * a MANIFEST relation derived from the files as WRITTEN (read back,
    * not from the input plan — the manifest proves the sink, not the
    * intent): per shard, document count, token count and an
    * order-independent `bit_xor(poly_hash(text))` content digest a
    * downstream loader can verify against.
    *
    * Scale shape: the pack is the two-level prefix sum; the write is one
    * `repartition(shard)` exchange + a partitioned write (one directory
    * per shard, loaders read shards independently); the manifest is one
    * aggregation over the written files. Deterministic end to end —
    * same corpus, same shard cuts, same digests, any partitioning. */
  def exportShards(df: DataFrame, textCol: String, idCol: String,
      outDir: String, shardTokens: Int): DataFrame = {
    if (df.isEmpty) {
      // an empty corpus writes nothing; reading the empty directory
      // back would fail schema inference — the honest manifest is the
      // empty relation with the manifest's schema
      import df.sparkSession.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("shard_id", "n_docs", "shard_tokens", "digest")
    }
    val packed = packTokenStream(df, textCol, idCol, shardTokens)
      .select(col("id").as(idCol), col("n_tokens"),
        col("shard_start").as("shard_id"))
    // every input column rides into the shards (ids, metadata, labels —
    // a loader needs more than the text), plus the pack bookkeeping
    df.join(packed, Seq(idCol))
      .repartition(col("shard_id"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .withColumn("__h", TextAnalysis.polyHash(col(textCol)))
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        expr("bit_xor(__h)").as("digest"))
  }

  /** Temperature-scaled mixture rates (the UniMax / multilingual-LM
    * sampling rule): given per-source document counts `c_s`, source s is
    * sampled with probability proportional to `c_s^alpha` — alpha = 1
    * reproduces natural proportions, alpha → 0 approaches uniform, the
    * usual dial is 0.3–0.7 to keep big web crawls from drowning small
    * high-value sources. The emitted integer `rate_ppm` (parts per
    * `buckets`) feeds the same content-hash keep rule as
    * [[mixtureSample]], so the selection inherits its reproducibility
    * and nesting guarantees.
    *
    * Rates derive from corpus statistics entirely IN-PLAN: the per-source
    * count aggregate is tiny (one row per source) and broadcast back —
    * no driver round-trip, no collected rates. Cross-source normalization
    * sums `c_s^alpha` in DECIMAL(25,6) — an order-independent exact sum,
    * so the rate is deterministic under any partitioning (a double sum's
    * partial-aggregation order is not). Expected kept volume is
    * `targetFrac` of the corpus when no source clips at rate 1.0 (a
    * source clips when temperature would UPsample it above keeping
    * everything; use [[mixtureResample]] with these rates to realize
    * epochs > 1 instead of clipping).
    *
    * Returns the input rows (kept subset) plus `rate_ppm`. Use
    * `ratesBySource` for the per-source rate table itself. */
  def temperatureMixture(df: DataFrame, textCol: String, sourceCol: String,
      alpha: Double, targetFrac: Double, buckets: Int = 1000000): DataFrame = {
    val rates = ratesBySource(df, sourceCol, alpha, targetFrac, buckets)
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(pmod(TextAnalysis.polyHash(col(textCol)), lit(buckets.toLong))
        < col("rate_ppm"))
  }

  /** The C4-style curation cascade (q140, and `Cli curate`'s engine —
    * ONE definition so the CLI report can never drift from the gated
    * query): language-ID → heuristic quality → LM average log-prob →
    * exact-hash dedup (canonical = min key per fingerprint), each doc
    * tagged with its FIRST failing stage. `lm` carries (keyCol,
    * avg_logprob) — [[TextAnalysis.ngramLmScore]] or the persistent
    * [[LmStore.score]], caller's choice. Returns (tagged, report):
    * tagged = (keyCol, sourceCol, reason) per doc; report = the
    * per-(source, reason) rollup ordered for replay. */
  def curationCascade(docs: DataFrame, textCol: String, keyCol: String,
      sourceCol: String, lm: DataFrame, qualityMin: Double = 0.6,
      lmMin: Double = -6.0): (DataFrame, DataFrame) = {
    val sig = docs.select(col(keyCol), col(sourceCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.polyHash(col(textCol)).as("fp"))
    val canon = sig.groupBy(col("fp"))
      .agg(min(col(keyCol)).as("canon_id"))
    val tagged = sig.join(lm, Seq(keyCol)).join(canon, Seq("fp"))
      .withColumn("reason",
        when(col("lang_pred") =!= "en", "1_lang")
          .when(col("quality") < qualityMin, "2_quality")
          .when(col("avg_logprob") < lmMin, "3_lm")
          .when(col(keyCol) =!= col("canon_id"), "4_duplicate")
          .otherwise("keep"))
      .select(col(keyCol), col(sourceCol), col("reason"))
    val report = tagged.groupBy(col(sourceCol), col("reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(sourceCol), col("reason"))
    (tagged, report)
  }

  /** The rate table behind [[temperatureMixture]]: one row per source —
    * (source, n_docs, rate_ppm). rate_ppm = floor(buckets · min(1,
    * targetFrac · N · q_s / c_s)) where q_s = c_s^alpha / Σ c_t^alpha. */
  def ratesBySource(df: DataFrame, sourceCol: String, alpha: Double,
      targetFrac: Double, buckets: Int = 1000000): DataFrame = {
    require(alpha > 0 && targetFrac > 0 && targetFrac <= 1 && buckets > 0,
      s"ratesBySource: need alpha > 0, 0 < targetFrac <= 1, buckets > 0; " +
        s"got $alpha/$targetFrac/$buckets")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      // c^alpha quantized to DECIMAL(25,6): deterministic per value, and
      // the cross-source sum is exact in any order
      .withColumn("__w",
        pow(col("n_docs").cast("double"), lit(alpha)).cast("decimal(25,6)"))
    val totals = counts.agg(sum(col("__w")).as("__tw"),
      sum(col("n_docs")).as("__n"))
    counts.crossJoin(broadcast(totals))
      .select(col(sourceCol), col("n_docs"),
        floor(lit(buckets.toDouble) *
          least(lit(1.0),
            (lit(targetFrac) * col("__n").cast("double") *
              (col("__w").cast("double") / col("__tw").cast("double"))) /
              col("n_docs").cast("double")))
          .cast("long").as("rate_ppm"))
  }

  /** DSIR importance weights (Xie et al., NeurIPS 2023 — "Data Selection
    * for Language Models via Importance Resampling"): score every RAW
    * document by how much more likely its hashed-bigram bag is under a
    * TARGET corpus's feature distribution than under the raw corpus's
    * own — the domain-targeting selector that turns "I have 100 TB of
    * web text and 100 MB that looks like what I want" into per-doc
    * log-importance. Features are ALL word bigrams (multiplicity kept,
    * [[TextAnalysis.ngramsAll]]) hashed into `buckets` cells with the
    * engine-portable [[TextAnalysis.polyHash]]; both sides become
    * add-one-smoothed bucket categoricals and
    * `logw(x) = Σ_features [ln p_t(b) − ln p_r(b)]` accumulates in
    * DECIMAL(25,12) — the q133 discipline, so the score is
    * partition-order-deterministic. Documents with no bigram (single
    * word) carry no evidence and are omitted.
    *
    * Scale shape: the bucket-count sides partial-aggregate to ≤
    * `buckets` rows each and the per-bucket log-ratio relation
    * BROADCASTS back; no shuffle is ever wider than the raw corpus's
    * own feature stream, and the target side (a benchmark or curated
    * seed set, tiny by construction) scans once. The raw corpus
    * tokenizes TWICE in one plan — once into its own bucket
    * distribution, once for scoring (the same recompute the q133 LM
    * chain accepts: both feeds are narrow explodes off the same scan,
    * and Spark caches nothing across subplans unless told) — persist
    * the raw frame upstream when the tokenize pass dominates. */
  def dsirWeights(raw: DataFrame, textCol: String, keyCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 1, s"dsirWeights: need buckets >= 1, got $buckets")
    def feats(df: DataFrame, tc: String, keep: Seq[Column]): DataFrame =
      df.select(keep :+ explode(
          TextAnalysis.ngramsAll(col(tc), 2)).as("bg"): _*)
        .withColumn("b", pmod(TextAnalysis.polyHash(col("bg")),
          lit(buckets.toLong)))
        .drop("bg")
    val rawFeats = feats(raw, textCol, Seq(col(keyCol).as("id")))
    val tgtCounts = feats(target, targetTextCol, Nil)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rawCounts = rawFeats.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = tgtCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
      .crossJoin(rawCounts.agg(sum(col("cr")).as("tr")))
    // every raw feature's bucket is in rawCounts by construction, so the
    // ratio relation LEFT-joins the target side in; smoothing keeps
    // target-unseen buckets finite (they score the floor, not -inf)
    val ratio = rawCounts
      .join(tgtCounts, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tt").cast("double") + lit(buckets.toDouble))) -
         log((col("cr").cast("double") + lit(1.0)) /
          (col("tr").cast("double") + lit(buckets.toDouble)))).as("lr"))
    rawFeats
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("lr").cast("decimal(25,12)")).cast("double").as("logw"))
      .select(col("id").as(keyCol), col("n_feats"), col("logw"))
  }

  /** DSIR selection on top of [[dsirWeights]]: keep the `k` raw docs
    * with the largest `logw + Gumbel` — Gumbel-top-k resampling, whose
    * inclusion odds are ∝ exp(logw) WITHOUT ever exponentiating (long
    * documents put `logw` at ±hundreds; `exp` would over/underflow to
    * ties). The Gumbel draw is the house content-hash uniform
    * (`g = −ln(−ln u)`, u from `polyHash(text)` — [[weightedSample]]'s
    * seeding), so selection is deterministic across runs, partitionings
    * and engines; ties break by key. One TakeOrdered over the weighted
    * relation — the selection never shuffles more than k rows. */
  def dsirSelect(raw: DataFrame, textCol: String, keyCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      buckets: Int = 4096): DataFrame = {
    require(k >= 0, s"dsirSelect: need k >= 0, got $k")
    val mod = TextMath.Mod
    val u = (TextAnalysis.polyHash(col(textCol)).cast("double") + lit(1.0)) /
      lit((mod + 1).toDouble)
    raw.select(col(keyCol), (-log(-log(u))).as("g"))
      .join(dsirWeights(raw, textCol, keyCol, target, targetTextCol,
        buckets), Seq(keyCol))
      .select(col(keyCol), col("n_feats"), col("logw"),
        (col("logw") + col("g")).as("gk"))
      .orderBy(col("gk").desc, col(keyCol).asc)
      .limit(k)
  }
}
