package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("attachBlob: binary payload + typed metadata struct") {
    val d = Multimodal.attachBlob(Seq((1L, "hello world")).toDF("doc_id", "text"))
    val r = d.head()
    assert(r.getAs[Array[Byte]]("blob") sameElements
      "hello world".getBytes(StandardCharsets.UTF_8))
    val meta = r.getAs[org.apache.spark.sql.Row]("media_meta")
    assert(meta.getAs[String]("mime") == "application/x-fake")
    assert(meta.getAs[Int]("n_bytes") == 11)
  }

  test("frame offsets and sampling cover the blob, last frame short") {
    val d = Multimodal.attachBlob(
      Seq((1L, "x" * 150), (2L, "")).toDF("doc_id", "text"), frameBytes = 64)
    val r = d.filter($"doc_id" === 1).select(
      Multimodal.frameOffsets($"blob", 64).as("offs"),
      Multimodal.sampleFrames($"blob", 64, every = 1).as("frames")).head()
    assert(r.getAs[scala.collection.Seq[Long]]("offs") == Seq(0L, 64L, 128L))
    val frames = r.getAs[scala.collection.Seq[Array[Byte]]]("frames")
    assert(frames.map(_.length) == Seq(64, 64, 22))
    // empty blob → no frames
    val e = d.filter($"doc_id" === 2)
      .select(Multimodal.frameOffsets($"blob", 64).as("offs")).head()
    assert(e.getAs[scala.collection.Seq[Long]]("offs").isEmpty)
  }

  test("decodeStub: deterministic stripe sums, batch-size invariant") {
    val bytes = "abcdefgh".getBytes(StandardCharsets.UTF_8)
    val f = FrameDecoder.decodeStub(Seq(bytes)).head
    assert(f.length == 8)
    assert(f.sum == bytes.map(_ & 0xff).sum)
    assert(f(0) == 'a'.toLong) // stripeLen = 1 → one byte per stripe
    assert(FrameDecoder.decodeStub(Seq(Array.emptyByteArray)).head.forall(_ == 0L))
  }

  test("extractFeatures: batched mapPartitions plumbing, no shuffle") {
    val docs = Multimodal.attachBlob(
      (0L until 300L).map(i => (i, s"doc $i " + ("y" * (i % 40).toInt)))
        .toDF("doc_id", "text"))
    // batch smaller than partition size → multiple batches per partition
    val feats = FrameDecoder.extractFeatures(docs, "doc_id", "blob", batchSize = 32)
    assert(feats.count() == 300)
    assert(feats.schema("features").dataType.typeName == "array")
    // no Exchange in the plan: mapPartitions is narrow
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // determinism: same input → same features regardless of batch size
    val a = feats.orderBy($"doc_id").collect().map(_.getSeq[Long](1))
    val b = FrameDecoder.extractFeatures(docs, "doc_id", "blob", batchSize = 7)
      .orderBy($"doc_id").collect().map(_.getSeq[Long](1))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("perceptualDedupPairs: exact copies at l1=0, one-byte edits within budget, misses distant blobs") {
    val texts = (0 until 40).map { i =>
      (i.toLong, s"media payload ${(i * 2654435761L) % 999983} frame $i data")
    }
    val planted = texts.map { case (id, t) =>
      (id + 1000, "x" + t.drop(1)) // same length, one byte differs
    }
    val exactCopy = Seq((2000L, texts.head._2))
    val docs = Multimodal.attachBlob(
      (texts ++ planted ++ exactCopy).toDF("doc_id", "text"))
    val pairs = Multimodal.perceptualDedupPairs(docs, "doc_id", "blob",
        maxL1 = 200L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    // the exact copy pairs with its original at l1 = 0
    assert(byPair.get((0L, 2000L)).contains(0L), byPair.get((0L, 2000L)))
    // every one-byte mutation is found against its original, within budget
    texts.foreach { case (id, _) =>
      val l1 = byPair.get((id, id + 1000))
      assert(l1.exists(v => v > 0 && v <= 200), s"pair ($id, ${id + 1000}): $l1")
    }
    // verification is real: no reported pair exceeds the budget
    assert(pairs.forall(_._3 <= 200L))
  }
}
