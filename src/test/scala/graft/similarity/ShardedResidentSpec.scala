package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.fixtures.ManifoldCorpus

/** [[Knn.ShardedResidentIndex]] — the fan-and-merge gateway the
  * single-index residency refusal points at. Pins (1) losslessness:
  * with exhaustive per-shard beams the merged top-k EQUALS the
  * unsharded exhaustive result, which equals brute force over the
  * union (the same deterministic contract q150 oracle-gates for one
  * shard); (2) the serving shape: one Spark job per shard per request,
  * all in flight together; (3) the budget mechanism: a corpus the
  * single-shard budget refuses SERVES through shards each inside that
  * budget; (4) recall at a selective beam matches the per-shard walk's
  * (the merge adds no loss); (5) `idOf` renders merged winners once. */
class ShardedResidentSpec extends SparkTestBase {
  import spark.implicits._

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private val N = 400L
  private lazy val corpus = (0L until N)
    .map(v => (v, ManifoldCorpus.vector(v).toSeq))
    .toDF("vec_id", "embedding").localCheckpoint()

  /** Build one shard's layout — ITS OWN kNN graph plus an id chain for
    * guaranteed connectivity (the q150 recipe), fp32 vectors so the
    * exhaustive form is bit-comparable to brute-force fp32 cosine. */
  private def buildShard(members: org.apache.spark.sql.DataFrame,
      dir: String, attrCols: Seq[String] = Nil): Unit = {
    val knn = Knn.knnGraph(members, "embedding", "vec_id", topK = 8)
      .select($"id_a", $"id_b")
    val ids = members.select($"vec_id").as[Long].collect().sorted
    val chain = ids.zip(ids.drop(1)).toSeq.toDF("id_a", "id_b")
    Knn.buildAdjacencyIndex(knn.unionByName(chain), members, "embedding",
      "vec_id", dir, buckets = 8, fp16 = false, attrCols = attrCols)
    Knn.buildGraphCodes(spark, dir, codec = "int8")
  }

  test("exhaustive sharded merge equals brute force over the union; one job per shard") {
    val root = java.nio.file.Files.createTempDirectory("shres").toString
    val dirA = s"$root/a"; val dirB = s"$root/b"
    try {
      // disjoint split by parity — the shards never communicate
      buildShard(corpus.filter($"vec_id" % 2 === 0), dirA)
      buildShard(corpus.filter($"vec_id" % 2 =!= 0), dirB)
      val sharded = Knn.ShardedResidentIndex.load(spark,
        Seq(dirA -> None, dirB -> None), ef = N.toInt)
      assert(sharded.numShards == 2)
      val qv = ManifoldCorpus.vector(7L)
      val sc = spark.sparkContext
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      val got = sharded.servingTopK(qv, 10, 0, None)
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val after = sc.statusTracker.getJobIdsForGroup(null).length
      // the whole fanned request is one refine job PER SHARD
      assert(after - before <= 2, s"ran ${after - before} jobs")
      // exhaustive beams make every shard's shortlist its whole live
      // set, so the merge must be exactly brute-force fp32 cosine
      // top-10 over the union, ordered (score, id)
      val want = Knn.topK(corpus, "embedding", qv, 10, "vec_id")
        .select($"vec_id", $"score")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"$got vs $want")
    } finally rmTree(root)
  }

  test("a corpus past the single-shard budget serves through shards inside it") {
    val root = java.nio.file.Files.createTempDirectory("shbud").toString
    val dirAll = s"$root/all"; val dirA = s"$root/a"; val dirB = s"$root/b"
    try {
      buildShard(corpus, dirAll)
      buildShard(corpus.filter($"vec_id" % 2 === 0), dirA)
      buildShard(corpus.filter($"vec_id" % 2 =!= 0), dirB)
      // the single index REFUSES the 400-node corpus at a 200 budget
      // and names the sharded mechanism
      val e = intercept[IllegalArgumentException] {
        Knn.ResidentGraphIndex.load(spark, dirAll, maxResidentNodes = 200L)
      }
      assert(e.getMessage.contains("ShardedResidentIndex"))
      // ...which serves the same corpus with each shard INSIDE the
      // budget that refused, and idOf renders the merged winners
      val sharded = Knn.ShardedResidentIndex.load(spark,
        Seq(dirA -> None, dirB -> None), ef = 64,
        maxResidentNodesPerShard = 200L,
        idOf = (id: Long) => id.toString)
      val got = sharded.servingTopK(ManifoldCorpus.vector(7L), 5, 0, None)
      assert(got.length == 5)
      assert(got.head.get(0).isInstanceOf[String], got.head.get(0).toString)
      // a shard past the per-shard budget still refuses — sharding
      // scales the TOTAL, never an individual shard's residency
      intercept[IllegalArgumentException] {
        Knn.ShardedResidentIndex.load(spark,
          Seq(dirA -> None, dirB -> None), maxResidentNodesPerShard = 100L)
      }
    } finally rmTree(root)
  }

  test("build: one call lays out routed shards the loader serves at >= 0.9 recall") {
    val root = java.nio.file.Files.createTempDirectory("shbld").toString
    try {
      // the pmod routing rule, per-shard adjacency + sidecar + entry
      // IVF, loadable as one gateway (loads run CONCURRENTLY)
      val dirs = Knn.ShardedResidentIndex.build(corpus, "embedding",
        "vec_id", root, shards = 2, topK = 8)
      assert(dirs == Seq(s"$root/shard0" -> Some(s"$root/shard0-ivf"),
        s"$root/shard1" -> Some(s"$root/shard1-ivf")), dirs.toString)
      dirs.foreach { case (d, ivf) =>
        assert(Knn.graphIndexReady(d) && Knn.graphCodesReady(d), d)
        assert(Knn.ivfIndexReady(ivf.get), ivf.get)
      }
      val sharded = Knn.ShardedResidentIndex.load(spark, dirs, ef = 32)
      assert(sharded.numShards == 2)
      val recalls = Seq(7L, 131L, 263L).map { q =>
        val qv = ManifoldCorpus.vector(q)
        val got = sharded.servingTopK(qv, 10, 0, None)
          .map(_.getLong(0)).toSet
        val want = Knn.topK(corpus, "embedding", qv, 10, "vec_id")
          .collect().map(_.getLong(0)).toSet
        (got & want).size / 10.0
      }
      assert(recalls.sum / recalls.size >= 0.9, s"recall@10 $recalls")
      // more shards than the key spread fails loudly, not silently thin
      intercept[IllegalArgumentException] {
        Knn.ShardedResidentIndex.build(
          corpus.filter($"vec_id" === 2L), "embedding", "vec_id",
          s"$root/thin", shards = 2)
      }
    } finally rmTree(root)
  }

  test("reloading: one fingerprint spans every shard; any shard's sidecar rebuild swaps the handle") {
    val root = java.nio.file.Files.createTempDirectory("shrel").toString
    try {
      val dirs = Knn.ShardedResidentIndex.build(corpus, "embedding",
        "vec_id", root, shards = 2, topK = 8)
      val h = Knn.ShardedResidentIndex.reloading(spark, dirs, ef = 32)
      val first = h.get
      assert(h.get eq first) // nothing moved -> same instance
      // one shard's sidecar rebuild (a refresh's O(corpus) fallback)
      // moves that shard's pqcodes pointer -> the WHOLE gateway handle
      // swaps at the next request (a half-updated view never serves)
      Knn.rebuildGraphCodes(spark, dirs(1)._1)
      val second = h.get
      assert(!(second eq first), "stale gateway served after a shard moved")
      val got = second.servingTopK(ManifoldCorpus.vector(7L), 5, 0, None)
      assert(got.length == 5)
    } finally rmTree(root)
  }

  test("selective-beam recall over shards matches the per-shard walks; ivf entries accepted") {
    val root = java.nio.file.Files.createTempDirectory("shrec").toString
    val dirA = s"$root/a"; val dirB = s"$root/b"
    val ivfA = s"$root/ia"; val ivfB = s"$root/ib"
    try {
      val even = corpus.filter($"vec_id" % 2 === 0)
      val odd = corpus.filter($"vec_id" % 2 =!= 0)
      buildShard(even, dirA); buildShard(odd, dirB)
      // per-shard entry IVFs: entries are node IDS, which only resolve
      // in their own shard's resident set
      Knn.ivfBuildIndex(even, "embedding", "vec_id", ivfA, k = 8,
        iters = 2, trainFilter = lit(true), fp16 = true)
      Knn.ivfBuildIndex(odd, "embedding", "vec_id", ivfB, k = 8,
        iters = 2, trainFilter = lit(true), fp16 = true)
      val sharded = Knn.ShardedResidentIndex.load(spark,
        Seq(dirA -> Some(ivfA), dirB -> Some(ivfB)), ef = 32)
      val recalls = Seq(7L, 131L, 263L).map { q =>
        val qv = ManifoldCorpus.vector(q)
        val got = sharded.servingTopK(qv, 10, 0, None)
          .map(_.getLong(0)).toSet
        val want = Knn.topK(corpus, "embedding", qv, 10, "vec_id")
          .collect().map(_.getLong(0)).toSet
        (got & want).size / 10.0
      }
      assert(recalls.sum / recalls.size >= 0.9, s"recall@10 $recalls")
    } finally rmTree(root)
  }

  test("filtered fan-out: sharded filtered top-k equals the unsharded " +
      "filtered top-k; rare predicates fall to per-shard scans, never " +
      "the store; attr-less shards refuse") {
    val root = java.nio.file.Files.createTempDirectory("shflt").toString
    try {
      val labeled = corpus
        .withColumn("label", pmod($"vec_id", lit(7L)))
        .withColumn("grp", floor($"vec_id" / 4).cast("long"))
        .localCheckpoint()
      buildShard(labeled.filter($"vec_id" % 2 === 0), s"$root/a",
        attrCols = Seq("label", "grp"))
      buildShard(labeled.filter($"vec_id" % 2 =!= 0), s"$root/b",
        attrCols = Seq("label", "grp"))
      buildShard(labeled, s"$root/all", attrCols = Seq("label", "grp"))
      // exhaustive per-shard beams → per-shard filtered top-k is exact,
      // so the merge must equal BOTH the unsharded filtered result and
      // brute force over the filtered union
      val sharded = Knn.ShardedResidentIndex.load(spark,
        Seq(s"$root/a" -> None, s"$root/b" -> None), ef = N.toInt)
      assert(sharded.attrColumns == Seq("grp", "label"))
      val unsharded = Knn.ResidentGraphIndex.load(spark, s"$root/all",
        ef = N.toInt)
      val qv = ManifoldCorpus.vector(7L)
      def brute(cond: org.apache.spark.sql.Column,
          k: Int): Seq[(Long, Double)] = labeled.filter(cond)
        .select($"vec_id", graft.functions.cosine_distance(
          $"embedding", typedLit(qv)).as("score"))
        .orderBy($"score".asc, $"vec_id".asc).limit(k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      def rows(a: Array[org.apache.spark.sql.Row]): Seq[(Long, Double)] =
        a.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // broad predicate: both shards contribute, merge is lossless
      val broadCond = $"label" === 3
      val viaShards = rows(sharded.servingTopK(qv, 10, 0, Some(broadCond)))
      assert(viaShards == rows(
        unsharded.servingTopK(qv, 10, 0, Some(broadCond))))
      assert(viaShards == brute(broadCond, 10), viaShards.toString)
      // rare predicate (4 matches — starves every walk): each shard
      // degrades to ITS OWN exhaustive self-row scan and the merge
      // still returns every match exactly — no store fallback exists
      // on this path by construction
      val rareCond = $"grp" === 17
      val viaRare = rows(sharded.servingTopK(qv, 10, 0, Some(rareCond)))
      assert(viaRare.length == 4 && viaRare == brute(rareCond, 10),
        viaRare.toString)
      // attr-less shards refuse filters toward the store route
      buildShard(labeled.filter($"vec_id" % 2 === 0), s"$root/p0")
      buildShard(labeled.filter($"vec_id" % 2 =!= 0), s"$root/p1")
      val plain = Knn.ShardedResidentIndex.load(spark,
        Seq(s"$root/p0" -> None, s"$root/p1" -> None), ef = 16)
      val e = intercept[IllegalArgumentException] {
        plain.servingTopK(qv, 5, 0, Some($"label" === 1))
      }
      assert(e.getMessage.contains("attr"))
    } finally rmTree(root)
  }
}
