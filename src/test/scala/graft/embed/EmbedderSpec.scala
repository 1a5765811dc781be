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
}
