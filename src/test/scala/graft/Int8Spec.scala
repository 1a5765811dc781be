package graft

import org.apache.spark.sql.functions._

import graft.functions.{cosine_distance, int8_cosine_distance, int8_decode, int8_encode, Int8}

class Int8Spec extends SparkTestBase {
  import spark.implicits._

  test("scalar codec: codes bounded, max|x| hits ±127, decode within half a step") {
    val v = Array(0.5f, -1.5f, 0.25f, 3.0f, -3.0f, 0f)
    val b = Int8.encode(v)
    assert(b.length == 8 + v.length)
    val scale = Int8.scaleOf(b)
    assert(scale == 127.0 / 3.0)
    val codes = b.drop(8).map(_.toInt)
    assert(codes.max == 127 && codes.min == -127)
    val dec = Int8.decode(b)
    // quantization error ≤ half a quantization step = 1/(2·scale)
    v.zip(dec).foreach { case (x, d) =>
      assert(math.abs(x.toDouble - d) <= 0.5 / scale + 1e-12,
        s"$x decoded to $d under scale $scale")
    }
    // all-zero vector: scale falls back to 1, codes all zero
    val z = Int8.encode(Array(0f, 0f))
    assert(Int8.scaleOf(z) == 1.0 && z.drop(8).forall(_ == 0))
  }

  test("column codec: 1 byte/dim + 8B scale header, small cosine distortion") {
    val emb = table("embeddings").limit(200)
    val coded = emb.select($"vec_id", $"embedding",
      int8_encode($"embedding").as("c"))
    val r = coded.select(octet_length($"c"), size($"embedding")).head()
    assert(r.getInt(0) == 8 + r.getInt(1)) // 1 byte/dim vs 4
    val err = coded
      .select(cosine_distance(
        int8_decode($"c").cast("array<float>"), $"embedding").as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(err < 1e-3, s"int8 round-trip cosine distortion $err")
  }

  test("fused kernel == decode-then-cosine, for literal and column queries") {
    val emb = table("embeddings").limit(100)
    val probe = emb.orderBy($"vec_id").select($"embedding")
      .head().getSeq[Float](0).toArray
    val coded = emb.select($"vec_id", $"embedding",
      int8_encode($"embedding").as("c")).cache()
    try {
      // literal query (folded-norm codegen path)
      val viaKernel = coded
        .select($"vec_id", int8_cosine_distance($"c", typedLit(probe)).as("d"))
        .orderBy($"vec_id").collect().map(_.getDouble(1))
      val viaDecode = coded.collect().map { row =>
        val b = row.getAs[Array[Byte]]("c")
        val dec = Int8.decode(b)
        val dot = dec.zip(probe).map { case (a, q) => a * q.toDouble }.sum
        val na = math.sqrt(dec.map(x => x * x).sum)
        val nq = math.sqrt(probe.map(x => x.toDouble * x.toDouble).sum)
        (row.getLong(0), 1.0 - dot / (na * nq))
      }.sortBy(_._1).map(_._2)
      viaKernel.zip(viaDecode).foreach { case (k, d) =>
        assert(math.abs(k - d) < 1e-12, s"kernel $k vs decode $d") }
      // column query (interpreted-args codegen path): self-distance ~ 0
      val self = coded
        .select(int8_cosine_distance($"c", $"embedding").as("d"))
        .agg(max(abs($"d"))).head().getDouble(0)
      assert(self < 1e-3, s"self-distance through quantization $self")
    } finally coded.unpersist()
  }

  test("SQL registration: int8 functions callable, errors typed") {
    val d = spark.sql(
      "SELECT int8_cosine_distance(int8_encode(array(CAST(1.0 AS FLOAT), " +
        "CAST(0.0 AS FLOAT))), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(math.abs(d) < 1e-12)
    val n = spark.sql(
      "SELECT size(int8_decode(int8_encode(array(CAST(0.5 AS FLOAT))))) AS n")
      .head().getInt(0)
    assert(n == 1)
    val e = intercept[Exception](
      spark.sql("SELECT int8_encode('nope')").collect())
    assert(e.getMessage.contains("int8_encode") ||
      Option(e.getCause).exists(_.getMessage.contains("int8_encode")))
  }
}
