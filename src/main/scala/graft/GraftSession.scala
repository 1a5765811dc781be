package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * Scale posture: these configs are the local[32] rendition of settings that
  * hold on a 1000-executor cluster — AQE on (runtime re-plan, skew-join
  * splitting, partition coalescing), shuffle partitions sized to cores
  * locally (on a real cluster this is AQE-advised from
  * `spark.sql.adaptive.coalescePartitions`), and broadcast threshold left at
  * default so dimension tables (region/nation/customer at any SF) broadcast
  * instead of shuffling the fact side.
  */
object GraftSession {

  def builder(master: String = "local[32]", cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata `events` carries TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read the raw int64 and convert in table().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local[32] split sizing: GB-scale local inputs need ≥32 splits to
      // keep every core busy (default 128m yields ~10 for a 1.2 GB scan).
      // Session-level posture, not operator logic — a real cluster keeps
      // the 128m default and lets AQE coalesce.
      .config("spark.sql.files.maxPartitionBytes", "32m")
      // push id IN-shortlists down to parquet as a real In predicate
      // instead of the (min,max) range fallback — the PQ re-rank's
      // point probe relies on row-group/page skipping, which a range
      // filter over a spread shortlist defeats (at 256 the r≥32 rungs
      // silently degraded to range filters and their p95 doubled —
      // r11 ladder in SCALE.md). Since r12 the refine stage ships its
      // shortlist through Knn.chunkedIn (balanced OR of ≤256-id legs),
      // so no single In ever approaches this threshold at any refine·k
      // — 4096 stays as defense in depth for ad-hoc user predicates.
      // Set membership per row-group stat is a sorted-array probe; the
      // eval cost is noise next to one decompressed 128 KB row group.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      // ObjectHashAggregate (the executor of TypedImperativeAggregates
      // like topk_pairs) falls back to SORT-based aggregation after
      // only 128 distinct keys per task by default — which silently
      // resurrects exactly the all-rows sort the bounded-heap aggregate
      // exists to avoid (measured: the 2 M cell-kNN build's partial agg
      // fell back and died in sort spill — r14, SCALE.md). Honest memory
      // math: each buffer is a PriorityQueue of boxed (Double, Long)
      // tuples, ~0.5–1 KB at k=10, so 2^21 keys in ONE task's hash map
      // is 1–2 GB worst-case — fine on this local[32] profile (driver =
      // executor, 128 GiB heap, and the kNN builds that actually reach
      // 2 M keys/task run alone), but NOT free. The pin is session-wide
      // because conf is read at execution time, so scoping it around a
      // lazily-built DataFrame doesn't stick; a memory-tight cluster
      // deployment should set this per job profile (or lower k · keys),
      // trading the sort fallback's spill for heap headroom.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 21).toString)
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    functions.registerAll(spark)
    spark
  }

  /** Configure an externally-built session (Verify/Bench own their builder). */
  def init(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // engine posture, not a builder-only nicety: the PQ refine stage's
    // id IN-shortlist pushdown (see the builder comment above) silently
    // range-degrades at the 10-value default, so a session that reached
    // the query path without this conf (Bench and Verify build their own
    // sessions) timed/served the degraded probe while GraftSession.get()
    // sessions served the pushed one. Runtime-settable SQLConf, so
    // pinning it here makes every entry point serve the same plan.
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
    functions.registerAll(spark)
    spark
  }

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table from an sf directory, normalizing timestamp
    * encodings across driver testdata generations: `events.ts` as
    * nanosecond int64 (TIMESTAMP(NANOS) parquet, read via nanosAsLong)
    * becomes a microsecond TimestampType column, and any TIMESTAMP_NTZ
    * column (plain `timestamp[us]` parquet without isAdjustedToUTC) is
    * cast to TimestampType — identical wall-clock values under the UTC
    * session timezone, but with the instant semantics every downstream
    * operator (unix_micros, interval arithmetic, windowing) expects. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" &&
          raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else raw
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df) { (d, c) =>
      d.withColumn(c, d.col(c).cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
