package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{cosine_distance, fp16_decode, fp16_encode, Fp16}

class Fp16Spec extends SparkTestBase {
  import spark.implicits._

  test("scalar codec: exact for fp16-representable, RTN-even otherwise") {
    // exactly representable values round-trip bit-perfectly
    for (v <- Seq(0f, 1f, -1f, 0.5f, 2048f, -0.25f, 65504f /* fp16 max */ ))
      assert(Fp16.halfToFloat(Fp16.floatToHalf(v)) == v)
    // subnormal range survives
    val sub = 6.0e-8f
    assert(math.abs(Fp16.halfToFloat(Fp16.floatToHalf(sub)) - sub) < 6e-8)
    // overflow → Inf; NaN stays NaN; relative error ≤ 2^-11 in normal range
    assert(Fp16.halfToFloat(Fp16.floatToHalf(1e6f)).isInfinity)
    assert(Fp16.halfToFloat(Fp16.floatToHalf(Float.NaN)).isNaN)
    for (v <- Seq(0.1f, 3.14159f, -123.456f, 0.0007f)) {
      val r = Fp16.halfToFloat(Fp16.floatToHalf(v))
      assert(math.abs(r - v) / math.abs(v) <= math.pow(2, -11))
    }
  }

  test("column codec: 50% storage, small cosine perturbation") {
    val emb = table("embeddings").limit(200)
    val coded = emb.select($"vec_id", $"embedding",
      fp16_encode($"embedding").as("h"))
    val r = coded.select(octet_length($"h"), size($"embedding")).head()
    assert(r.getInt(0) == 2 * r.getInt(1)) // 2 bytes/dim vs 4
    val err = coded
      .select(cosine_distance($"embedding", fp16_decode($"h")).as("d"))
      .agg(max($"d")).head().getDouble(0)
    assert(err < 1e-5, s"fp16 round-trip cosine distortion $err")
  }

  test("FuseFp16Cosine: decode+cosine fuses in the plan, bit-exact result") {
    val emb = table("embeddings").limit(100)
    val coded = emb.select($"vec_id", $"embedding",
      fp16_encode($"embedding").as("h")).cache()
    val probe = emb.orderBy($"vec_id").select($"embedding")
      .head().getSeq[Float](0).toArray
    val fused = coded.select($"vec_id",
      cosine_distance(fp16_decode($"h"), typedLit(probe)).as("d"))
    // the optimized plan carries the fused expression, no decode
    val opt = fused.queryExecution.optimizedPlan.toString
    assert(opt.contains("fp16_cosine_distance") && !opt.contains("fp16_decode"),
      s"fusion did not fire:\n$opt")
    // and values are bit-identical to an explicit driver-side decode fed
    // through the reference scalar implementation
    val decoded = coded.collect().map { r =>
      val b = r.getAs[Array[Byte]](2)
      r.getLong(0) -> graft.functions.VectorMath.cosineDistance(
        Fp16.decode(b), probe)
    }.toMap
    fused.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(decoded(r.getLong(0))))
    }
    coded.unpersist()
  }

  test("fp16 store mode: emb16 at rest, fused kernel in the serving plan") {
    import graft.search.{SearchRequest, SemanticSearch}
    import graft.sync.HighlightStore
    val dir = java.nio.file.Files.createTempDirectory("fp16store").toString
    try {
      val emb = table("embeddings").limit(100)
      HighlightStore.writeAtomic(emb, dir, fp16 = true)
      // at rest: BINARY emb16, no fp32 embedding column
      val current = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "CURRENT")).trim
      val raw = spark.read.parquet(s"$dir/$current")
      assert(raw.schema(HighlightStore.Emb16Col).dataType ==
        org.apache.spark.sql.types.BinaryType)
      assert(!raw.columns.contains("embedding"))
      // read() surfaces embedding transparently; search over it fuses
      val store = HighlightStore.read(spark, dir).get
      val probe = emb.orderBy($"vec_id").select($"embedding")
        .head().getSeq[Float](0).toArray
      val res = SemanticSearch.search(store, SearchRequest(probe, k = 10),
        keyCol = "vec_id")
      val opt = res.queryExecution.optimizedPlan.toString
      assert(opt.contains("fp16_cosine_distance") && !opt.contains("fp16_decode"),
        s"serving plan not fused:\n$opt")
      // scores are bit-exact vs the scalar codec round-trip
      val expect = emb.select($"vec_id", $"embedding").collect().map { r =>
        r.getLong(0) -> graft.functions.VectorMath.cosineDistance(
          Fp16.decode(Fp16.encode(r.getSeq[Float](1).toArray)), probe)
      }.toMap
      val got = res.collect()
      assert(got.length == 10)
      got.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(
          r.getAs[Double]("score")) ==
          java.lang.Double.doubleToRawLongBits(expect(r.getAs[Long]("vec_id"))))
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("readWarm: serving plan scores the fused kernel over the cached encoded relation") {
    import graft.search.{SearchRequest, SemanticSearch}
    import graft.sync.HighlightStore
    val dir = java.nio.file.Files.createTempDirectory("fp16warm").toString
    try {
      val emb = table("embeddings").limit(50)
      HighlightStore.writeAtomic(emb, dir, fp16 = true)
      val store = HighlightStore.readWarm(spark, dir).get
      val probe = emb.orderBy($"vec_id").select($"embedding")
        .head().getSeq[Float](0).toArray
      val res = SemanticSearch.search(store, SearchRequest(probe, k = 5),
        keyCol = "vec_id")
      val p = res.queryExecution.executedPlan.toString
      // the scan under the score is the pinned in-memory AT-REST relation
      // (emb16 bytes), not a parquet re-read — and the score is the fused
      // kernel over it
      assert(p.contains("InMemoryTableScan"), s"not serving from cache:\n$p")
      assert(p.contains("fp16_cosine_distance") && !p.contains("fp16_decode"),
        s"not fused over the cache:\n$p")
      assert(res.collect().length == 5)
    } finally {
      spark.sharedState.cacheManager.clearCache()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("GraftExtensions: SQL functions resolve on an extensions-built session") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions exercises the same injection path as
      // spark.sql.extensions=graft.GraftExtensions (which only applies when
      // the session owns a fresh SparkContext — not reproducible in-suite)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql(
        "SELECT cosine_distance(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
          "array(CAST(0 AS FLOAT), CAST(1 AS FLOAT))) AS d, " +
          "poly_hash('ab') AS h, " +
          "octet_length(fp16_encode(array(CAST(1.5 AS FLOAT)))) AS n, " +
          "word_shingles('a b c d', 3) AS sh, " +
          "array_poly_hash(array('ab')) AS ah").head()
      assert(got.getDouble(0) == 1.0)
      assert(got.getLong(1) == 'a'.toLong * 31 + 'b'.toLong)
      assert(got.getInt(2) == 2)
      assert(got.getSeq[String](3) == Seq("a b c", "b c d"))
      assert(got.getSeq[Long](4) == Seq('a'.toLong * 31 + 'b'.toLong))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
