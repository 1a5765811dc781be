package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads ride
  * through the engine as opaque `BINARY` columns with a typed metadata
  * struct; decode / feature-extraction runs as *batched* per-partition
  * compute so a real decoder (image/audio codec, GPU preproc) amortizes
  * per-batch setup. The actual codec is STUBBED deterministically (this
  * container ships no media libraries — see [[FrameDecoder.decodeStub]]);
  * everything Spark-side (schema, partitioning, batch shape, column ops)
  * is real.
  *
  * (100-TB extension surface per the build mandate; the reference itself
  * has no media columns.)
  */
object Multimodal {

  /** Attach a deterministic fake payload: the document's text bytes as the
    * blob plus a typed metadata struct (the shape a real pipeline carries:
    * mime, byte size, a frame geometry hint). */
  def attachBlob(docs: DataFrame, textCol: String = "text",
      frameBytes: Int = 64): DataFrame =
    docs
      .withColumn("blob", to_binary(col(textCol), lit("utf-8")))
      .withColumn("media_meta", struct(
        lit("application/x-fake").as("mime"),
        octet_length(col("blob")).as("n_bytes"),
        lit(frameBytes).as("frame_bytes")))

  /** Number of fixed-size frames covering the blob (ceil division). */
  def frameCount(blob: Column, frameBytes: Int): Column =
    ceil(octet_length(blob).cast("double") / frameBytes).cast("long")

  /** 0-based byte offsets of each frame: [0, frameBytes, 2·frameBytes, …).
    * Pure column math — stays in codegen, no UDF. */
  def frameOffsets(blob: Column, frameBytes: Int): Column =
    when(octet_length(blob) > 0,
      sequence(lit(0L), (frameCount(blob, frameBytes) - 1L) * frameBytes,
        lit(frameBytes.toLong)))
      .otherwise(array().cast("array<bigint>"))

  /** Sample every `every`-th frame as a binary slice (substring on BINARY
    * is byte-addressed). The "video frame sampling" shape: explode-able,
    * each slice independently decodable downstream. */
  def sampleFrames(blob: Column, frameBytes: Int, every: Int = 1): Column =
    transform(
      filter(frameOffsets(blob, frameBytes),
        (off, i) => i % every === 0),
      off => substring(blob, (off + 1).cast("int"), lit(frameBytes)))

  /** Perceptual-hash near-duplicate pairs over MEDIA payloads — the
    * multimodal member of the dedup family (aHash/pHash lineage: decode,
    * reduce to coarse features, threshold against the per-item mean into
    * a compact signature, bucket on the signature, verify candidates
    * with a real distance). Features come from the batched decoder
    * ([[FrameDecoder.extractFeatures]] — stripe sums under the stub; a
    * real codec swaps in without touching this operator), the signature
    * sets bit i when `f_i · stripes > Σf` (integer-exact mean threshold,
    * no division), candidates are an EQUI-join on the signature — the
    * same one-exchange, output-sensitive shape as every hash-dedup
    * family here — and each candidate pair is verified by exact L1
    * distance over the feature vectors, kept when `<= maxL1`.
    *
    * Every step is integer arithmetic, so the whole pipeline —
    * signature, bucketing, verification — is engine-replicable and
    * oracle-gated end-to-end (q102). Returns (id_a, id_b, sig, l1)
    * with id_a < id_b. */
  def perceptualDedupPairs(df: DataFrame, keyCol: String,
      blobCol: String = "blob", maxL1: Long = 200L): DataFrame = {
    val stripes = FrameDecoder.Stripes
    val feats = FrameDecoder.extractFeatures(df, keyCol, blobCol)
      .withColumn("__tot",
        aggregate(col("features"), lit(0L), (a, x) => a + x))
      .withColumn("sig", (0 until stripes).map { i =>
        when(element_at(col("features"), i + 1) * stripes > col("__tot"),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _))
    val a = feats.select(col(keyCol).as("id_a"), col("features").as("fa"),
      col("sig"))
    val b = feats.select(col(keyCol).as("id_b"), col("features").as("fb"),
      col("sig"))
    a.join(b, Seq("sig")).filter(col("id_a") < col("id_b"))
      .withColumn("l1", aggregate(
        zip_with(col("fa"), col("fb"), (x, y) => abs(x - y)),
        lit(0L), (acc, d) => acc + d))
      .filter(col("l1") <= maxL1)
      .select(col("id_a"), col("id_b"), col("sig"), col("l1"))
  }
}

/** Batched per-partition "decoder" plumbing. Mirrors a batched-UDF media
  * decoder: rows are consumed in fixed-size batches, the (stub) codec is
  * invoked once per batch, outputs keep a stable schema. */
object FrameDecoder {

  val DefaultBatchSize = 128
  val Stripes = 8

  /** STUB decode: a real implementation would decode the media payload
    * (JPEG → pixels, PCM → spectrogram) here, once per batch on the
    * device. The deterministic fake emits, per blob, `Stripes` integer
    * features: the sum of byte values in each of 8 equal stripes —
    * reproducible by any engine, so the plumbing is oracle-checkable. */
  def decodeStub(batch: Seq[Array[Byte]]): Seq[Array[Long]] =
    batch.map { bytes =>
      val out = new Array[Long](Stripes)
      if (bytes.nonEmpty) {
        val stripeLen = math.max(1, (bytes.length + Stripes - 1) / Stripes)
        var i = 0
        while (i < bytes.length) {
          out(math.min(i / stripeLen, Stripes - 1)) += bytes(i) & 0xff
          i += 1
        }
      }
      out
    }

  /** (key, blob) → (key, features) via batched mapPartitions. Narrow — no
    * shuffle; each partition streams its rows through the decoder in
    * `batchSize` chunks (batch boundary never crosses partitions). */
  def extractFeatures(df: DataFrame, keyCol: String, blobCol: String,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val feats = decodeStub(chunk.map(_._2))
          chunk.iterator.zip(feats.iterator).map { case ((k, _), f) => (k, f) }
        }
      }
      .toDF(keyCol, "features")
  }
}
