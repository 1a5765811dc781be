package graft.fixtures

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Fp16

/** Deterministic 3072-dim fp16-encoded corpus for the reference-dimension
  * search path (HALFVEC(3072) parity — readwise_vector_db/models/highlight.py:24-26).
  *
  * Components come from an integer mix over (vec_id, i) so the DuckDB
  * oracle can reproduce every value — including the fp16
  * round-to-nearest-even — in SQL. The mix reduces `vec_id*Dim + i` mod M
  * BEFORE multiplying by the Knuth constant: `(a*b) mod M` equals
  * `((a mod M)*b) mod M`, so the values are identical to the plain product
  * form for every vec_id, but the intermediate never exceeds
  * `(M-1)*b < 2^62` — no Int64 overflow for any vec_id below 2^52/Dim,
  * where the plain form silently wraps (Spark) or raises (DuckDB) from
  * vec_id ≈ 1.13M.
  *
  * The corpus is MATERIALIZED (written once per (sf, n) as parquet and
  * re-read) so queries over it time scan → decode/score → top-k, not
  * fixture synthesis: generation is driver-independent, parallel, and
  * happens outside the measured steady state (a real store's embeddings
  * are written by ingest, not conjured per query).
  */
object Fp16Corpus {

  val Dim = 3072
  val Mod = 1000003L
  val Mult = 2654435761L // Knuth multiplicative hash constant
  private val Half = (Mod - 1) / 2 // 500001

  /** Integer component value in [-500001, 500001]. */
  def mix(vecId: Long, i: Int): Long =
    ((vecId * Dim + i) % Mod) * Mult % Mod - Half

  /** Full-precision float32 component (what fp16_encode then rounds). */
  def component(vecId: Long, i: Int): Float =
    (mix(vecId, i).toDouble / Half.toDouble).toFloat

  def vector(vecId: Long): Array[Float] = {
    val a = new Array[Float](Dim)
    var i = 0
    while (i < Dim) { a(i) = component(vecId, i); i += 1 }
    a
  }

  /** The q48 probe: vec_id 0's vector at FULL precision (the stored corpus
    * row 0 is its fp16 rounding — same relationship as a live query
    * embedding probing its own stored copy). */
  def probe: Array[Float] = vector(0L)

  /** Root for prepared fixture data; override with SPARK_GRAFT_WORK.
    * LOCAL-filesystem only (existence checks use java.io) — this is bench/
    * verify fixture plumbing, not a production surface. */
  def workRoot: String = sys.env.getOrElse("SPARK_GRAFT_WORK", "/tmp/graft-prep")

  /** Prepared corpus `(vec_id BIGINT, emb16 BINARY)` of `n` rows, written
    * once per (sf-dir, n) under [[workRoot]] and re-read from parquet.
    * Idempotent: a complete write is detected via parquet's `_SUCCESS`
    * marker; a partial one is overwritten.
    *
    * The read is `.cache()`d: a serving store's working set is resident
    * (the reference's pgvector table lives in Postgres buffer cache), and
    * Spark's CacheManager matches the logical plan, so every query built
    * over the same (sf, n) corpus — across separate `prepared` calls in
    * one session — shares a single in-memory materialization instead of
    * re-decoding parquet per run. */
  def prepared(spark: SparkSession, sfDir: String, n: Long): DataFrame = {
    val tag = new File(sfDir).getName
    val path = s"$workRoot/fp16corpus-$tag-n$n.parquet"
    if (!new File(path, "_SUCCESS").isFile) {
      import spark.implicits._
      spark.range(n)
        .mapPartitions(_.map(vid => (vid, Fp16.encode(vector(vid)))))
        .toDF("vec_id", "emb16")
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path).cache()
  }
}
