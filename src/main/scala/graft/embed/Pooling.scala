package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-document embeddings by chunk → embed → mean-pool → renormalize —
  * the standard fix for the reference's hard token-cap truncation
  * (core/embedding.py:24-31 truncates at 8191 tokens and throws the tail
  * away; pooling represents all of it). Chunks embed independently
  * (embarrassingly parallel — the embed pass is the expensive part and
  * scales with corpus tokens, not document count), per-dimension means
  * accumulate in DECIMAL so the pooled vector is bit-deterministic under
  * any partitioning, and the result renormalizes to unit length with the
  * embedder's own fp32 rounding so downstream cosine treats pooled and
  * single-chunk vectors identically.
  */
object Pooling {

  /** Returns (keyCol, v) — one unit-norm ARRAY<DOUBLE> per document,
    * the element-wise mean of its chunks' embeddings. Chunking is
    * [[graft.text.CorpusPrep.chunkWords]] with zero overlap (overlap
    * would double-weight boundary tokens in the mean). The per-element
    * HOFs at the end run once per OUTPUT dimension, not per corpus
    * token — the SCALE.md HOF caveat doesn't bite. */
  def pooledEmbedding(df: DataFrame, textCol: String, keyCol: String,
      chunkWords: Int, embedder: Embedder = Embedder.Default): DataFrame = {
    val chunks = graft.text.CorpusPrep.chunkWords(df, textCol, keyCol,
      chunkWords, overlap = 0)
    val emb = chunks.select(col(keyCol),
      posexplode(Embedder.embedUdf(embedder)(col("chunk_text")))
        .as(Seq("pos", "x")))
    val mean = emb.groupBy(col(keyCol), col("pos"))
      .agg((sum(col("x").cast("decimal(25,12)")).cast("double") /
        count(lit(1)).cast("double")).as("m"))
    mean.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(keyCol), expr("transform(pm, p -> p.m)").as("v"))
      .withColumn("__n2", expr("aggregate(v, 0D, (a, x) -> a + x * x)"))
      .withColumn("v", expr("CASE WHEN __n2 > 0 THEN " +
        "transform(v, x -> CAST(CAST(x / sqrt(__n2) AS FLOAT) AS DOUBLE)) " +
        "ELSE v END"))
      .select(col(keyCol), col("v"))
  }
}
