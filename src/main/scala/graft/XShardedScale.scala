package graft
import org.apache.spark.sql.functions._

/** Sharded-resident-gateway scale measurement (r15): the single
  * [[graft.similarity.Knn.ResidentGraphIndex]] refuses past its
  * residency budget and points at
  * [[graft.similarity.Knn.ShardedResidentIndex]] — this main proves the
  * pointer is a mechanism, not a sentence. It builds `XSH_SHARDS`
  * disjoint id-range shards of `XSH_SHARD_N` manifold nodes each (per
  * shard: cellKnnGraph adjacency + int8 sidecar + entry IVF), loads the
  * fan-and-merge gateway with the per-shard budget pinned AT the shard
  * size (so a single index over the union would refuse — demonstrated
  * directly when the r15 bucket ladder's 2 M layout is on disk), then
  * records:
  *  - XSH_LOAD: gateway load wall + steady heap (the SUM of shard
  *    residencies — the scaling the class note prices);
  *  - XSH_REFUSE: the union corpus REFUSES a single-index load at the
  *    per-shard budget (the exact situation sharding exists for);
  *  - XSH_RECALL10: merged recall@10 vs brute force over the UNION;
  *  - XSH_SERVE: p50/p95 under the locust shape — per request, one
  *    driver walk + one refine job per shard, all shards in flight.
  * Artifacts cache under the Fp16Corpus work root, keyed per shard. */
object XShardedScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("XSH_SHUFFLE", "256"))
    val shardN = sys.env.getOrElse("XSH_SHARD_N", "1000000").toLong
    val shards = sys.env.getOrElse("XSH_SHARDS", "2").toInt
    val dim = sys.env.getOrElse("XSH_DIM", "128").toInt
    val deg = sys.env.getOrElse("XSH_DEG", "10").toInt
    val ef = sys.env.getOrElse("XSH_EF", "16").toInt
    val users = sys.env.getOrElse("XSH_USERS", "20").toInt
    val reqs = sys.env.getOrElse("XSH_REQS", "25").toInt
    // r15 bucket-density dial — the ONE production rule (Knn.bucketsFor,
    // ~50 k adjacency rows per bucket incl. its clamps), not a re-derive
    val buckets = sys.env.get("XSH_BUCKETS").map(_.toInt)
      .getOrElse(graft.similarity.Knn.bucketsFor(shardN * (deg + 1L)))
    val n = shardN * shards
    import spark.implicits._
    val dirs = (0 until shards).map { s =>
      val root = graft.fixtures.Fp16Corpus.workRoot +
        s"/shardscale-s$s-n$shardN-d$dim"
      val fixturePath = s"$root/corpus.parquet"
      if (!new java.io.File(fixturePath, "_SUCCESS").isFile) {
        spark.range(s * shardN, (s + 1) * shardN).mapPartitions(_.map { vid =>
          (vid, graft.functions.Fp16.encode(
            graft.fixtures.ManifoldCorpus.vector(vid).take(dim)))
        }).toDF("vec_id", "emb16")
          .write.mode("overwrite").parquet(fixturePath)
      }
      val corpus = spark.read.parquet(fixturePath)
        .select(col("vec_id"), graft.functions.fp16_decode(col("emb16"))
          .cast("array<float>").as("embedding"))
      val idxDir = s"$root/adj-b$buckets"
      val ivfDir = s"$root/ivf"
      if (!graft.similarity.Knn.graphIndexReady(idxDir)) {
        val tb = System.nanoTime()
        val edges = graft.similarity.Knn.cellKnnGraph(corpus, "embedding",
          "vec_id", topK = deg, cells = (shardN / 800L).max(8L).toInt,
          iters = 2, nprobe = 2).select(col("id_a"), col("id_b"))
        graft.similarity.Knn.buildAdjacencyIndex(edges, corpus, "embedding",
          "vec_id", idxDir, buckets = buckets)
        println(f"XSH_BUILD|shard=$s|graph_min=" +
          f"${(System.nanoTime() - tb) / 6e10}%.1f|buckets=$buckets")
      }
      if (!graft.similarity.Knn.graphCodesReady(idxDir))
        graft.similarity.Knn.buildGraphCodes(spark, idxDir, codec = "int8")
      if (!graft.similarity.Knn.ivfIndexReady(ivfDir))
        graft.similarity.Knn.ivfBuildIndex(corpus, "embedding", "vec_id",
          ivfDir, k = 256, iters = 2,
          trainFilter = col("vec_id") % (shardN / 20000L).max(1L) === 0,
          fp16 = true)
      (idxDir, Option(ivfDir))
    }
    // ---- the union corpus refuses a SINGLE resident load at the
    // per-shard budget (when the r15 ladder's union layout is cached)
    val unionAdj = graft.fixtures.Fp16Corpus.workRoot +
      s"/residentscale-n$n-d$dim/adj-b440"
    if (graft.similarity.Knn.graphIndexReady(unionAdj) &&
        graft.similarity.Knn.graphCodesReady(unionAdj)) {
      try {
        graft.similarity.Knn.ResidentGraphIndex.load(spark, unionAdj, None,
          maxResidentNodes = shardN)
        println("XSH_REFUSE|MISSING (single-index load past the budget " +
          "unexpectedly succeeded)")
      } catch {
        case e: IllegalArgumentException =>
          println("XSH_REFUSE|" +
            e.getMessage.replace('\n', ' ').take(110))
      }
    }
    // ---- gateway load: wall + steady heap (sum of shard residencies)
    val rt = Runtime.getRuntime
    def used(): Long = rt.totalMemory() - rt.freeMemory()
    System.gc(); Thread.sleep(500)
    val base = used()
    val t0 = System.nanoTime()
    val idx = graft.similarity.Knn.ShardedResidentIndex.load(spark,
      dirs, ef = ef, maxResidentNodesPerShard = shardN)
    val loadSec = (System.nanoTime() - t0) / 1e9
    System.gc(); Thread.sleep(500)
    val steady = used()
    println(f"XSH_LOAD|shards=$shards|shard_n=$shardN|dim=$dim|" +
      f"load_s=$loadSec%.1f|base_gb=${base / 1e9}%.2f|" +
      f"steady_gb=${steady / 1e9}%.2f")
    // ---- recall@10 vs brute force over the UNION, 20 fp32 probes
    val union = dirs.indices.map { s =>
      spark.read.parquet(graft.fixtures.Fp16Corpus.workRoot +
        s"/shardscale-s$s-n$shardN-d$dim/corpus.parquet")
    }.reduce(_ unionByName _)
      .select(col("vec_id"), graft.functions.fp16_decode(col("emb16"))
        .cast("array<float>").as("embedding"))
    val qids = (0 until 20).map(i => (i * 99991L) % n)
    val recalls = qids.map { q =>
      val qv = graft.fixtures.ManifoldCorpus.vector(q).take(dim)
      val got = idx.servingTopK(qv, 10, 0, None)
        .map(_.get(0).asInstanceOf[Long]).toSet
      val want = graft.similarity.Knn
        .topK(union, "embedding", qv, 10, "vec_id")
        .collect().map(_.getLong(0)).toSet
      got.intersect(want).size / 10.0
    }
    println(f"XSH_RECALL10|mean=${recalls.sum / recalls.size}%.3f|" +
      f"min=${recalls.min}%.2f")
    // ---- the locust shape: `users` threads, `reqs` sequential each
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
    val threads = (0 until users).map { u =>
      new Thread(() => {
        (0 until reqs).foreach { r =>
          val q = java.lang.Math.floorMod(u * 7919L + r * 104729L, n)
          val qv = graft.fixtures.ManifoldCorpus.vector(q).take(dim)
          val t = System.nanoTime()
          idx.servingTopK(qv, 10, 0, None)
          lat.add((System.nanoTime() - t) / 1e6)
        }
      })
    }
    val tg = System.nanoTime()
    threads.foreach(_.start()); threads.foreach(_.join())
    val wall = (System.nanoTime() - tg) / 1e9
    import scala.jdk.CollectionConverters._
    val ls = lat.asScala.map(_.doubleValue()).toSeq.sorted
    def pct(p: Double): Double = ls(math.min((ls.size * p).toInt, ls.size - 1))
    println(f"XSH_SERVE|users=$users|reqs=${ls.size}|wall_s=$wall%.1f|" +
      f"p50_ms=${pct(0.5)}%.0f|p95_ms=${pct(0.95)}%.0f|ef=$ef|" +
      s"buckets=$buckets")
    spark.stop()
  }
}
