package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Text-analysis column builders for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language ID, fingerprinting.
  * (Reference analog: the scalar-function layer of SURVEY.md §2.7; extended
  * per the 100-TB pipeline mandate.)
  *
  * Everything is a pure Column expression (no UDFs) so Catalyst keeps the
  * whole pipeline inside codegen and pushes filters/pruning around it.
  */
object TextAnalysis {

  /** Whitespace tokens. Single-space tokenizer for oracle parity with
    * `string_split(text, ' ')`. */
  def words(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish regex token count (runs of letters / digits / single symbol). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Word k-gram shingles (distinct), empty array when fewer than k words
    * OR when the text is null (the `when(...).otherwise(array())` formula
    * this replaced — and the oracle's CASE — both yield [] on null, so
    * the null-intolerant expression is coalesced back to empty here).
    * Codegen'd [[WordShingles]] — the equivalent `transform(sequence(...))`
    * formula is an interpreted higher-order function and dominated
    * full-corpus scans (ShingleSpec pins the byte-for-byte equivalence,
    * null text included). */
  def shingles(text: Column, k: Int = 3): Column =
    coalesce(shims.column(WordShingles(shims.expression(text), k)),
      array().cast("array<string>"))

  /** ALL word k-grams, duplicates kept in document order — the
    * multiplicity-preserving sibling of [[shingles]] for
    * frequency-weighted statistics. Codegen'd [[WordNgrams]]. */
  def ngramsAll(text: Column, k: Int): Column =
    coalesce(shims.column(WordNgrams(shims.expression(text), k)),
      array().cast("array<string>"))

  def polyHash(c: Column): Column = shims.column(PolyHash(shims.expression(c)))

  /** Hash each element of a string array. Codegen'd [[ArrayPolyHash]] —
    * the `transform(arr, t => polyHash(t))` form ran the lambda
    * interpreted per element under every MinHash/SimHash signature. */
  def hashTokens(arr: Column): Column =
    shims.column(ArrayPolyHash(shims.expression(arr)))

  def minHashSig(tokenHashes: Column): Column =
    shims.column(MinHashSig(shims.expression(tokenHashes)))

  def simHash16(tokenHashes: Column): Column =
    shims.column(SimHash16(shims.expression(tokenHashes)))

  /** 64-bit SimHash over a raw token array (salted 16-bit blocks). */
  def simHash64(tokens: Column): Column =
    shims.column(SimHash64(shims.expression(tokens)))

  /** Rolling-hash fingerprint of the full text. */
  def fingerprint(text: Column): Column = polyHash(text)

  val Stopwords: Seq[String] = Seq("the", "a", "data", "value", "row")

  def stopwordRatio(text: Column): Column = {
    val w = words(text)
    size(filter(w, t => t.isin(Stopwords.map(x => x: Any): _*))).cast("double") /
      size(w).cast("double")
  }

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      length(text).cast("double")

  def avgWordLen(text: Column): Column = {
    val w = words(text)
    (length(text) - (size(w) - 1)).cast("double") / size(w).cast("double")
  }

  /** Duplicate word-k-gram fraction — the Gopher-family repetition
    * signal (Rae et al. 2021, §A1.1: "fraction of duplicate n-grams"),
    * count-based: 1 − distinct k-grams / total k-grams, 0 for texts
    * with fewer than k words. Boilerplate, keyboard mash, and SEO spam
    * score high; natural prose scores near 0 for k ≥ 2. Pure per-row
    * codegen column math: the distinct count comes from the codegen'd
    * [[WordShingles]] and the total from the word count alone, so a
    * full-corpus repetition scan is a narrow projection — no explode,
    * no shuffle, nothing leaves the row. */
  def dupKgramFraction(text: Column, k: Int): Column = {
    val total = (size(words(text)) - (k - 1)).cast("double")
    val distinct = size(shingles(text, k)).cast("double")
    when(total > 0, lit(1.0) - distinct / total).otherwise(lit(0.0))
  }

  /** Deterministic composite quality score in [0,1]: length signal,
    * punctuation sanity, stopword plausibility. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / 100.0) * 0.5 +
      (lit(1.0) - punctRatio(text)) * 0.25 +
      least(lit(1.0), stopwordRatio(text) * 5.0) * 0.25

  /** Language marker words: lang → distinct marker set. Deterministic
    * stopword-hit language ID with fixed precedence on ties. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "row"),
    "de" -> Seq("join", "merge", "hash"),
    "fr" -> Seq("sort", "filter", "order"),
    "zh" -> Seq("spark", "vector", "stream"))

  def markerHits(text: Column, markers: Seq[String]): Column = {
    val w = words(text)
    size(filter(w, t => t.isin(markers.map(x => x: Any): _*))).cast("long")
  }

  /** Predicted language = argmax marker hits, ties broken by declaration
    * order (en > es > de > fr > zh). Single-Column form; for wide scans
    * prefer [[withLangId]], which tokenizes once per row. */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight puts the first declared lang outermost → it wins ties
    hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best, lit(lang)).otherwise(acc)
    }
  }

  /** Staged language ID: tokenize ONCE into a projected column, derive the
    * per-language hit counts from it, then argmax — ~35% faster than the
    * single-expression form at scan width (the filter lambdas defeat
    * codegen subexpression elimination, so `split` would otherwise run
    * once per language). Output column semantics identical to [[langId]].
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    // temp names must not clobber caller columns — suffix until unique
    var prefix = "__langid"
    while (df.columns.exists(_.startsWith(prefix))) prefix += "_"
    val wCol = s"${prefix}_w"
    def hCol(lang: String) = s"${prefix}_h_$lang"
    val staged = df.withColumn(wCol, words(col(textCol)))
    val withHits = LangMarkers.foldLeft(staged) { case (acc, (lang, ms)) =>
      acc.withColumn(hCol(lang),
        size(filter(col(wCol), t => t.isin(ms.map(x => x: Any): _*))).cast("long"))
    }
    val best = LangMarkers.map(m => col(hCol(m._1)))
      .reduce((a, b) => greatest(a, b))
    val pred = LangMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(hCol(lang)) === best, lit(lang)).otherwise(acc)
    }
    withHits.withColumn(outCol, pred)
      .drop(wCol +: LangMarkers.map(m => hCol(m._1)): _*)
  }

  /** Top-N word-k-gram shingles by document frequency — the heavy-hitter
    * scan a training-data pipeline runs to find boilerplate, template
    * text, and benchmark contamination before dedup thresholds are tuned.
    * Shingles are distinct per document ([[shingles]]), so the count IS
    * document frequency. Scale shape: explode → hash aggregate with
    * map-side partial combine (the shuffle carries one row per distinct
    * shingle per task, never the corpus) → `TakeOrdered` top-N per
    * partition, N rows to the driver. Deterministic tie-break on the
    * shingle text. Returns (shingle, doc_freq). */
  def heavyHitterShingles(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int = 3, topN: Int = 20): org.apache.spark.sql.DataFrame =
    df.select(explode(shingles(col(textCol), k)).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("shingle"))
      .limit(topN)

  /** Count–min sketch of shingle document frequency: `depth` hash rows ×
    * `width` counters, built in ONE aggregation whose output cardinality
    * is bounded by depth·width — independent of vocabulary size. This is
    * the scale sibling of [[heavyHitterShingles]]: the exact form's
    * shuffle carries one row per distinct shingle (fine until the
    * vocabulary itself is shuffle-sized; a 100 TB web corpus has
    * billions of distinct shingles), the sketch's carries at most
    * depth·width rows per task after map-side combine, and sketches from
    * corpus shards MERGE by cell-wise addition. Counter indexes come
    * from the MinHash affine family over the shingle polyHash —
    * deterministic, engine-replicable. Returns (row_idx, counter_idx,
    * cnt); estimates are overestimates only (collisions add, never
    * subtract), within εN with the standard (depth, width) guarantees.
    */
  def cmsShingleCounts(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int = 3, depth: Int = 4, width: Int = 512): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 1,
      s"cmsShingleCounts: need 1 <= depth <= 16 and width >= 1, got $depth/$width")
    df.select(explode(shingles(col(textCol), k)).as("s"))
      .select(polyHash(col("s")).as("h"))
      .select(posexplode(array((0 until depth).map(j =>
        cmsCounterIdx(j, width)): _*)))
      .groupBy(col("pos").as("row_idx"), col("col").as("counter_idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Counter index of hash row `j` for the shingle polyHash column `h`. */
  private def cmsCounterIdx(j: Int, width: Int): Column =
    (lit(TextMath.MinHashA(j)) * col("h") + lit(TextMath.MinHashB(j))) %
      lit(TextMath.Mod) % lit(width.toLong)

  /** Point estimates from a count–min sketch for the shingles in
    * `queries` (a frame with a string column `shingle`): the minimum
    * over the sketch's depth rows of the addressed counters. The sketch
    * is depth·width rows — always broadcast; query shingles never
    * shuffle. Returns the input plus `cms_estimate`. */
  def cmsEstimate(cms: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      depth: Int = 4, width: Int = 512): org.apache.spark.sql.DataFrame = {
    val exploded = queries
      .withColumn("__h", polyHash(col("shingle")))
      .select(col("*"), posexplode(array((0 until depth).map { j =>
        (lit(TextMath.MinHashA(j)) * col("__h") + lit(TextMath.MinHashB(j))) %
          lit(TextMath.Mod) % lit(width.toLong)
      }: _*)))
    exploded
      .join(broadcast(cms),
        exploded("pos") === cms("row_idx") &&
          exploded("col") === cms("counter_idx"), "left")
      .groupBy(queries.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** HyperLogLog registers for per-group distinct-shingle cardinality —
    * the CARDINALITY member of the sketch family (count–min = frequency,
    * Bloom = membership): `m = 2^p` registers per group, each the max of
    * a geometric observable over the items that hash into it (Flajolet
    * et al. 2007). This is the scale form of `COUNT(DISTINCT ...)`
    * per group: the exact form's shuffle carries one row per distinct
    * item per group (billions of distinct shingles in a 100 TB web
    * corpus), the register form's carries at most `m` rows per group
    * per task after map-side partial MAX, and registers from corpus
    * shards MERGE by cell-wise max — the same one-aggregation shape as
    * [[cmsShingleCounts]]. Spark's own `approx_count_distinct` is
    * HLL++ with opaque binary registers; this one's registers are plain
    * (group, bucket, reg) rows, engine-replicable and hash-exact under
    * the oracle. Because the aggregation is a monotone MAX it also runs
    * UNCHANGED on a stream — complete-mode state is bounded at
    * groups × m rows with no watermark, and the streamed registers equal
    * the batch sketch of the union (StreamingSpec) — live distinct-user/
    * distinct-vocabulary monitoring over the ingest stream for free.
    *
    * Observable: with `h = polyHash(shingle)`, bucket = `h mod m` and
    * rho = (trailing zeros of `h >> p`) + 1, capped at [[HllMaxRho]]
    * when the suffix is 0 — trailing zeros of a uniform integer are
    * geometric(1/2) exactly like the leading-zero form, and
    * `bit_count((w & -w) - 1)` computes them portably in both engines.
    * Returns (groupCol, bucket, reg); absent buckets are empty registers
    * (reg = 0), handled by [[hllEstimate]]. */
  def hllRegisters(df: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String, k: Int = 3, p: Int = 6): org.apache.spark.sql.DataFrame = {
    require(p >= 4 && p <= 12, s"hllRegisters: need 4 <= p <= 12, got $p")
    val m = 1L << p
    val w = shiftright(col("h"), p)
    val rho = when(w === 0L, lit(HllMaxRho))
      .otherwise(bit_count(w.bitwiseAND(lit(0L) - w) - lit(1L)) + lit(1))
    df.select(col(groupCol), explode(shingles(col(textCol), k)).as("s"))
      .select(col(groupCol), polyHash(col("s")).as("h"))
      .select(col(groupCol), (col("h") % lit(m)).as("bucket"),
        rho.cast("int").as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  /** Max observable rank: polyHash < 2^30, so after dropping p <= 12
    * bucket bits the suffix has < 30 set-able bits — 25 caps the
    * suffix-is-zero case above any reachable trailing-zero count
    * (and keeps every register shift below 2^50). */
  val HllMaxRho = 25

  /** Bias-correction constant alpha_m (Flajolet et al. 2007, table-exact
    * for the small register counts, asymptotic formula above). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Raw HLL estimate from [[hllRegisters]] output: `alpha_m * m^2 /
    * sum_j 2^(-reg_j)`. The register sum is computed EXACTLY as the
    * integer `sum_j 2^(50 - reg_j)` (every term a power of two <= 2^50,
    * group total < m * 2^50 < 2^63 — order-independent under any
    * partitioning), so the only floating-point step is one final double
    * division of engine-identical operands. Absent rows are empty
    * registers: they contribute `2^50` each via the zero-register count
    * rather than a generated row. The standard small/large-range
    * corrections need `ln`, which is not correctly-rounded across
    * engines — instead of silently folding a non-portable correction in,
    * the zero-register count (linear counting's input) is emitted as a
    * column so callers can correct driver-side. Returns (groupCol,
    * hll_zero_regs, hll_estimate). */
  /** The estimate's numerator `alpha_m * m^2 * 2^50` as ONE Scala double
    * — public so the oracle SQL interpolates the bit-identical value. */
  def hllNumer(p: Int): Double = {
    val m = 1L << p
    hllAlpha(m.toInt) * m * m * math.pow(2.0, 50)
  }

  def hllEstimate(registers: org.apache.spark.sql.DataFrame,
      groupCol: String, p: Int = 6): org.apache.spark.sql.DataFrame = {
    val m = 1L << p
    val numer = hllNumer(p)
    registers.groupBy(col(groupCol))
      .agg(
        sum(expr("shiftleft(1L, cast(50 - reg as int))")).as("sp"),
        count(lit(1)).as("nb"))
      .select(col(groupCol),
        (lit(m) - col("nb")).as("hll_zero_regs"),
        (lit(numer) / (col("sp") +
          (lit(m) - col("nb")) * lit(1L << 50)).cast("double"))
          .as("hll_estimate"))
  }

  /** Top-N terms per document by TF-IDF. IDF here is the RAW RATIO
    * `N / doc_freq` (no logarithm): the ranking this produces is the
    * standard one for per-document keyword extraction, and an integer
    * ratio evaluated with one IEEE double division is bit-identical
    * across engines — `ln` is not guaranteed to be, and the correctness
    * gate is hash-exact. Term frequency counts repeated occurrences
    * (whitespace tokens, NOT deduplicated). Two aggregations — (doc,
    * term) tf, then term doc_freq derived from it — one broadcast-able
    * join of the (small) per-term df table, and a per-doc window rank
    * with a deterministic term tie-break. Returns (keyCol, term, tf,
    * score). */
  def tfIdfTopTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
      keyCol: String, topN: Int = 3): org.apache.spark.sql.DataFrame = {
    val docs = df.select(col(keyCol).as("id"), col(textCol).as("text"))
    val nDocs = docs.select(countDistinct(col("id")).as("n"))
    val tf = docs
      .select(col("id"), explode(words(col("text"))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(nDocs)
      .select(col("id"), col("term"), col("tf"),
        (col("tf").cast("double") * col("n").cast("double") /
          col("doc_freq").cast("double")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topN)
      .select(col("id").as(keyCol), col("term"), col("tf"), col("score"))
  }

  /** Corpus-frequency bigram familiarity — the deterministic analog of
    * perplexity-based quality filtering (score each document by how
    * "familiar" its word sequences are to an n-gram model trained on the
    * corpus itself; gibberish and mangled extractions score near 1, the
    * floor, because their bigrams occur nowhere else). The score is the
    * AVERAGE CORPUS OCCURRENCE COUNT of the document's bigrams:
    * integer-count sums divided once at the end — bit-exact across
    * engines, where a log-probability average is not (same reasoning as
    * [[tfIdfTopTerms]]'s ratio idf; float sum order is unspecified in a
    * distributed agg, integer sums are associative).
    *
    * Scale shape: one explode of [[ngramsAll]] (multiplicity preserved —
    * a repeated bigram must count every occurrence), ONE hash exchange on
    * the bigram for a window count (no separate count table and no join:
    * the count attaches to each occurrence in the same pass), then a
    * per-doc re-aggregation. Documents with fewer than 2 words are
    * dropped (no bigrams → no sequence evidence). Returns (keyCol,
    * n_bigrams, familiarity). */
  /** Stupid-backoff trigram language-model score (Brants et al.,
    * "Large Language Models in Machine Translation", EMNLP 2007 — the
    * backoff chosen PRECISELY because it needs no discounting state and
    * distributes as plain counts): train n-gram counts on
    * `trainFilter`'s subset, score EVERY document by its average
    * per-token log-probability. This is the CCNet/KenLM perplexity
    * filter shape for training-data curation (low avg_logprob =
    * boilerplate-free but also gibberish; high = fluent/common): score
    * with a clean-corpus-trained model, keep the middle of the
    * distribution.
    *
    * Per token w with context (w1, w2):
    *   c3(w1,w2,w) > 0 → c3 / c2(w1,w2)
    *   else c2(w2,w) > 0 → α · c2(w2,w) / c1(w2)
    *   else → α² · (c1(w)+1) / (T+V)     (Laplace unigram, OOV-safe)
    * Document starts fall through naturally: a null lag context matches
    * no count row. avg_logprob accumulates ln p in DECIMAL(25,12) (the
    * Lloyd-mean discipline), so the score is bit-deterministic under
    * any partitioning — and oracle-replicable.
    *
    * Scale shape: the model IS three count relations, partial-aggregated
    * and shuffled by gram key; scoring is five equi-joins on those keys
    * (no window beyond the per-doc lag pass, no driver state). At
    * 100 TB prune the model with `minCount` — dropping singleton
    * trigrams cuts the model ~10× and only moves rare tokens one
    * backoff level down. */
  def ngramLmScore(df: org.apache.spark.sql.DataFrame, textCol: String,
      keyCol: String, trainFilter: Column, alpha: Double = 0.4,
      minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    val grams = lmGrams(df, textCol, keyCol, Some(trainFilter))
    val (uni, big, tri) = lmCounts(grams.filter(col("is_train")))
    lmScoreWith(grams, uni, big, tri, alpha, minCount, keyCol)
  }

  /** (id, pos, w, w1, w2) token rows with the two previous words
    * attached by ONE per-doc lag window — the shared front half of LM
    * counting and LM scoring. */
  private[text] def lmGrams(df: org.apache.spark.sql.DataFrame,
      textCol: String, keyCol: String,
      trainFilter: Option[Column]): org.apache.spark.sql.DataFrame = {
    val base = trainFilter match {
      case Some(f) => df.select(col(keyCol).as("id"), f.as("is_train"),
        posexplode(words(col(textCol))).as(Seq("pos", "w")))
      case None => df.select(col(keyCol).as("id"),
        posexplode(words(col(textCol))).as(Seq("pos", "w")))
    }
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    base
      .withColumn("w1", lag(col("w"), 2).over(byDoc))
      .withColumn("w2", lag(col("w"), 1).over(byDoc))
  }

  /** The model's three count relations over [[lmGrams]] rows — RAW
    * counts (pruning belongs at scoring assembly: raw counts are what
    * stays additive across [[LmStore]] segments).
    *
    * Deliberately UNSHARED relations: [[lmScoreWith]] references uni
    * twice, big twice, tri once plus totals(uni), so a wholesale score
    * plan re-inlines this explode + lag-window subtree ~7x (q140's plan
    * holds 9 document scans). Measured r16 at sf0.1: cutting that to one
    * pass (aggregate once at (w1,w2,w), localCheckpoint, derive c1/c2 by
    * integer re-sums) LOST — q133 0.44→1.20 s, q140 1.52→2.30 s at a
    * cooler calib — because the eager materialization is a blocking job
    * + store pass while the redundant explodes are parallel codegen work.
    * When the token stream dominates (the 100 TB regime), persist the
    * model instead: that is [[LmStore]], whose segments ARE these
    * relations materialized. */
  private[text] def lmCounts(train: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = (
    train.groupBy(col("w")).agg(count(lit(1)).as("c1")),
    train.filter(col("w2").isNotNull)
      .groupBy(col("w2"), col("w")).agg(count(lit(1)).as("c2")),
    train.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2"), col("w")).agg(count(lit(1)).as("c3")))

  /** The backoff-scoring back half over prepared [[lmGrams]] rows and
    * count relations (wholesale-trained or [[LmStore]]-merged — the
    * score can't tell, which is exactly the append==wholesale gate). */
  private[text] def lmScoreWith(grams: org.apache.spark.sql.DataFrame,
      uniRaw: org.apache.spark.sql.DataFrame,
      bigRaw: org.apache.spark.sql.DataFrame,
      triRaw: org.apache.spark.sql.DataFrame,
      alpha: Double, minCount: Long,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    val uni = uniRaw
    // T and V are the UNPRUNED totals (pruning reshapes backoff, not
    // the unigram floor); one tiny row, broadcast
    val totals = uni.agg(sum(col("c1")).as("t_tokens"),
      count(lit(1)).as("vocab"))
    val big = bigRaw.filter(col("c2") >= minCount)
    val tri = triRaw.filter(col("c3") >= minCount)
    val scored = grams
      .join(tri, Seq("w1", "w2", "w"), "left")
      .join(big.select(col("w2").as("w1"), col("w").as("w2"),
        col("c2").as("c2ctx")), Seq("w1", "w2"), "left")
      .join(big, Seq("w2", "w"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1ctx")),
        Seq("w2"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
    val lp = log(
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2ctx").cast("double"))
      .when(col("c2").isNotNull,
        lit(alpha) * col("c2").cast("double") / col("c1ctx").cast("double"))
      .otherwise(lit(alpha) * lit(alpha) *
        (coalesce(col("c1"), lit(0L)).cast("double") + lit(1.0)) /
        (col("t_tokens").cast("double") + col("vocab").cast("double"))))
    scored.withColumn("lp", lp)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp").cast("decimal(25,12)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_logprob"))
      .select(col("id").as(keyCol), col("n_tokens"), col("avg_logprob"))
  }

  def bigramFamiliarity(df: org.apache.spark.sql.DataFrame, textCol: String,
      keyCol: String): org.apache.spark.sql.DataFrame = {
    val bi = df.select(col(keyCol).as("id"),
        explode(ngramsAll(col(textCol), 2)).as("bg"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bg"))
    bi.withColumn("bg_count", count(lit(1)).over(w))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("bg_count")).cast("double") /
          count(lit(1)).cast("double")).as("familiarity"))
      .select(col("id").as(keyCol), col("n_bigrams"), col("familiarity"))
  }
}
