package graft.embed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EmbedderSpec extends SparkTestBase {
  import spark.implicits._

  test("deterministic, unit-norm, truncation cap") {
    val e = Embedder.Default
    val v1 = e.embed("spark vector search")
    assert(v1.toSeq == e.embed("spark vector search").toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    // char cap: text beyond maxChars doesn't change the vector
    val short = HashNgramEmbedder(maxChars = 10)
    assert(short.embed("0123456789IGNORED").toSeq == short.embed("0123456789XYZ").toSeq)
  }

  test("embedBatched matches the UDF form, handles nulls, stays narrow") {
    val docs = table("documents").filter($"doc_id" < 100)
      .select($"doc_id", $"text")
      .unionByName(Seq((999999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val viaBatch = Embedder.embedBatched(docs, "text", batchSize = 17)
    val viaUdf = docs.withColumn("embedding", Embedder.embedUdf()($"text"))
    assert(viaBatch.schema == viaUdf.schema ||
      viaBatch.schema.map(_.name) == viaUdf.schema.map(_.name))
    val b = viaBatch.orderBy($"doc_id").collect()
    val u = viaUdf.orderBy($"doc_id").collect()
    b.zip(u).foreach { case (rb, ru) =>
      val vb = Option(rb.getSeq[Float](2))
      val vu = Option(ru.getSeq[Float](2))
      assert(vb == vu, s"mismatch at doc ${rb.getLong(0)}")
    }
    assert(b.last.isNullAt(2)) // null text → null vector
    val plan = viaBatch.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("pooledEmbedding: unit norm, single-chunk ≈ plain embed, repartition-stable") {
    val docs = Seq(
      (1L, "short doc stays one chunk"),
      (2L, (1 to 70).map(i => s"tok$i").mkString(" ")), // 3 chunks at 30
      (3L, (1 to 60).map(i => s"w${i % 9}").mkString(" ")))
      .toDF("doc_id", "text")
    val pooled = Pooling.pooledEmbedding(docs, "text", "doc_id",
      chunkWords = 30).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // every pooled vector is unit norm (fp32-rounded)
    pooled.values.foreach { v =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6)
    }
    // a single-chunk doc pools to (approximately) its plain embedding —
    // the renormalize only re-rounds an already-unit vector
    val plain = Embedder.Default.embed("short doc stays one chunk")
      .map(_.toDouble)
    pooled(1L).zip(plain).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    // DECIMAL means: bit-identical under repartitioning
    val re = Pooling.pooledEmbedding(docs.repartition(7), "text", "doc_id",
      chunkWords = 30).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(re == pooled)
  }
}
