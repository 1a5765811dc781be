package graft

import org.apache.spark.sql.functions._

/** Serving-latency probe against the reference's CI gate (P95 < 500 ms for
  * `POST /search` k=10, BASELINE.md): measures the full request lifecycle
  * — query-text embedding → SemanticSearch over a warm store → collect →
  * row decode — per request, at the reference's embedding dimensionality
  * (3072) over an fp16-encoded [[graft.sync.HighlightStore]].
  *
  * The store is warmed via [[graft.sync.HighlightStore.warm]]: the at-rest
  * emb16 relation is pinned in cache and every request's plan scores it
  * with the fused `fp16_cosine_distance` kernel — no parquet read, no
  * fp32 widening, 2 B/dim resident.
  *
  * env: LATENCY_VECS (default 200000), LATENCY_REQS (default 100).
  */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val n = sys.env.getOrElse("LATENCY_VECS", "200000").toLong
    val corpus = graft.fixtures.Fp16Corpus.prepared(spark, "/root/testdata/sf0.1", n)
    val storeDir = graft.fixtures.Fp16Corpus.workRoot + s"/fp16store3072-n$n"
    if (!new java.io.File(storeDir, "CURRENT").isFile) {
      // encoded corpus → fp32 surface → written back through the store's
      // fp16 mode (decode∘encode is the identity on stored halves)
      val fp32 = corpus.select(col("vec_id").cast("string").as("id"),
        graft.functions.fp16_decode(col("emb16")).as("embedding"))
      graft.sync.HighlightStore.writeAtomic(fp32, storeDir, fp16 = true)
    }
    val store = graft.sync.HighlightStore.readWarm(spark, storeDir).get
    val gw = new graft.serve.SearchGateway(
      store, graft.embed.HashNgramEmbedder(dim = 3072))
    val reqs = sys.env.getOrElse("LATENCY_REQS", "100").toInt
    val lat = (1 to reqs + 10).map { i =>
      val t0 = System.nanoTime()
      val rows = gw.search(
        graft.serve.SearchParams(query = s"latency probe query $i", k = 10)).toList
      require(rows.size == 10)
      (System.nanoTime() - t0) / 1e6
    }.drop(10).sorted // first 10 = JIT/codegen warmup, excluded
    def pct(p: Double) = lat(((lat.size - 1) * p).round.toInt)
    println(f"LATENCY3072|n=$n|reqs=${lat.size}|p50=${pct(0.5)}%.0f ms|" +
      f"p95=${pct(0.95)}%.0f ms|p99=${pct(0.99)}%.0f ms")
    spark.stop()
  }
}
