package graft
import org.apache.spark.sql.functions._

/** Resident-walk budget-edge measurement (r14): the residency contract
  * (`ResidentGraphIndex.DefaultMaxResidentNodes` = 2 M, refuse-over-
  * budget) had only ever been exercised at 200 k nodes — the budget's
  * EDGE had unmeasured load wall, driver heap and p95. This main builds
  * a manifold graph at `XRS_N` nodes (default the 2 M edge) at a
  * reduced dimension `XRS_DIM` (default 128: the walk's cost model is
  * dim-independent except the code bytes, and 2 M × 3072 adjacency rows
  * would need ~130 GB of disk this VM lacks; the manifold's 8-dim
  * latent projects into any prefix, so navigation structure survives
  * the slice), then records:
  *  - XRS_LOAD: load wall, heap BEFORE / PEAK DURING / STEADY AFTER the
  *    load — the r13 verdict's boxed-Row transient concern, re-measured
  *    over the primitive collects (done = peak ≈ steady + data size);
  *  - XRS_REFUSE: that an over-budget load refuses in count-time (the
  *    pre-check), not after a collect;
  *  - XRS_RECALL10: recall@10 vs brute force, 20 queries;
  *  - XRS_SERVE: p50/p95 under the 20-user locust shape.
  * Artifacts cache under the Fp16Corpus work root and are rebuildable.
  */
object XResidentScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    // the session default (32) leaves the cell-kNN build's per-task rank
    // sorts at ~100M rows each at n=2M — the pointer array overflows and
    // the spill dies under the same pressure. More partitions = smaller
    // per-task sorts; AQE coalesces the small stages back down.
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("XRS_SHUFFLE", "256"))
    val n = sys.env.getOrElse("XRS_N", "2000000").toLong
    val dim = sys.env.getOrElse("XRS_DIM", "128").toInt
    val deg = sys.env.getOrElse("XRS_DEG", "10").toInt
    val ef = sys.env.getOrElse("XRS_EF", "16").toInt
    val users = sys.env.getOrElse("XRS_USERS", "20").toInt
    val reqs = sys.env.getOrElse("XRS_REQS", "25").toInt
    // the bucket-density dial (r14 verdict): the refine job's task count
    // is ≤ef (one per distinct shortlist bucket) regardless of `buckets`,
    // but each task SCANS its whole bucket's row groups — at 2 M nodes ×
    // 64 buckets that is ~344 k rows/task vs the gated 200 k fixture's
    // ~50 k. buckets ≈ adjacencyRows / 50 k keeps each task a point probe
    val buckets = sys.env.get("XRS_BUCKETS").map(_.toInt)
      .getOrElse(64)
    val root = graft.fixtures.Fp16Corpus.workRoot + s"/residentscale-n$n-d$dim"
    val fixturePath = s"$root/corpus.parquet"
    if (!new java.io.File(fixturePath, "_SUCCESS").isFile) {
      import spark.implicits._
      val tb = System.nanoTime()
      spark.range(n).mapPartitions(_.map { vid =>
        (vid, graft.functions.Fp16.encode(
          graft.fixtures.ManifoldCorpus.vector(vid).take(dim)))
      }).toDF("vec_id", "emb16")
        .write.mode("overwrite").parquet(fixturePath)
      println(f"XRS_BUILD|fixture_min=${(System.nanoTime() - tb) / 6e10}%.1f")
    }
    val corpus = spark.read.parquet(fixturePath)
      .select(col("vec_id"), graft.functions.fp16_decode(col("emb16"))
        .cast("array<float>").as("embedding"))
    // layouts key by buckets AND (non-default) degree — a donor graph
    // is bucket-independent but NOT deg-independent, so re-bucketing a
    // deg-10 graph into a deg-20 run would measure a config that never
    // existed
    val degTag = if (deg == 10) "" else s"-deg$deg"
    val idxDir = if (buckets == 64 && deg == 10) s"$root/adj"
      else s"$root/adj-b$buckets$degTag"
    val ivfDir = s"$root/ivf"
    if (!graft.similarity.Knn.graphIndexReady(idxDir)) {
      val tb = System.nanoTime()
      // the kNN GRAPH is bucket-independent — when a layout at another
      // bucket count already exists for this (n, dim, deg), re-bucket
      // its edges (one shuffle + write) instead of re-running the
      // ~26 min 2 M cellKnnGraph, so the density dial measures layout,
      // not build
      val donor = Option(new java.io.File(root).listFiles()).toSeq.flatten
        .map(_.getPath)
        .filter(p => { val b = new java.io.File(p).getName
          val sameDeg =
            if (deg == 10) b == "adj" || (b.startsWith("adj-b") &&
              !b.contains("-deg"))
            else b.startsWith("adj-b") && b.endsWith(degTag)
          sameDeg && p != idxDir })
        .find(graft.similarity.Knn.graphIndexReady)
      val edges = donor match {
        case Some(d) =>
          println(s"XRS_BUILD|rebucket_from=$d")
          graft.similarity.Knn.AdjIndex.load(spark, d).relation
            .filter(col("src") =!= col("dst"))
            .select(col("src").as("id_a"), col("dst").as("id_b"))
        case None =>
          graft.similarity.Knn.cellKnnGraph(corpus, "embedding",
            "vec_id", topK = deg, cells = (n / 800L).max(8L).toInt, iters = 2,
            nprobe = 2).select(col("id_a"), col("id_b"))
      }
      graft.similarity.Knn.buildAdjacencyIndex(edges, corpus, "embedding",
        "vec_id", idxDir, buckets = buckets)
      println(f"XRS_BUILD|graph_min=${(System.nanoTime() - tb) / 6e10}%.1f" +
        s"|buckets=$buckets")
    }
    if (!graft.similarity.Knn.graphCodesReady(idxDir)) {
      val tc = System.nanoTime()
      graft.similarity.Knn.buildGraphCodes(spark, idxDir, codec = "int8")
      println(f"XRS_BUILD|codes_min=${(System.nanoTime() - tc) / 6e10}%.1f")
    }
    if (!graft.similarity.Knn.ivfIndexReady(ivfDir)) {
      graft.similarity.Knn.ivfBuildIndex(corpus, "embedding", "vec_id",
        ivfDir, k = 256, iters = 2,
        trainFilter = col("vec_id") % (n / 20000L).max(1L) === 0,
        fp16 = true)
    }
    // ---- load: wall + heap(before / peak-during / steady-after)
    val rt = Runtime.getRuntime
    def used(): Long = rt.totalMemory() - rt.freeMemory()
    System.gc(); Thread.sleep(500)
    val base = used()
    @volatile var peak = base
    @volatile var polling = true
    val poller = new Thread(() => {
      while (polling) { peak = math.max(peak, used()); Thread.sleep(20) }
    })
    poller.setDaemon(true); poller.start()
    val t0 = System.nanoTime()
    val idx = graft.similarity.Knn.ResidentGraphIndex.load(spark, idxDir,
      Some(ivfDir), ef = ef)
    val loadSec = (System.nanoTime() - t0) / 1e9
    polling = false; poller.join()
    System.gc(); Thread.sleep(500)
    val steady = used()
    println(f"XRS_LOAD|n=$n|dim=$dim|deg=$deg|load_s=$loadSec%.1f|" +
      f"base_gb=${base / 1e9}%.2f|peak_gb=${peak / 1e9}%.2f|" +
      f"steady_gb=${steady / 1e9}%.2f|" +
      f"transient_gb=${math.max(0L, peak - steady) / 1e9}%.2f")
    // ---- over-budget refusal must cost a count, never a collect
    val tr = System.nanoTime()
    try {
      graft.similarity.Knn.ResidentGraphIndex.load(spark, idxDir, None,
        maxResidentNodes = n - 1)
      println("XRS_REFUSE|MISSING (load unexpectedly succeeded)")
    } catch {
      case e: IllegalArgumentException =>
        println(f"XRS_REFUSE|s=${(System.nanoTime() - tr) / 1e9}%.2f|" +
          e.getMessage.replace('\n', ' ').take(70))
    }
    // ---- recall@10 vs brute force, 20 fp32 probes
    val qids = (0 until 20).map(i => (i * 99991L) % n)
    val recalls = qids.map { q =>
      val qv = graft.fixtures.ManifoldCorpus.vector(q).take(dim)
      val got = idx.servingTopK(qv, 10, 0, None)
        .map(_.get(0).asInstanceOf[Long]).toSet
      val want = graft.similarity.Knn
        .topK(corpus, "embedding", qv, 10, "vec_id")
        .collect().map(_.getLong(0)).toSet
      got.intersect(want).size / 10.0
    }
    println(f"XRS_RECALL10|mean=${recalls.sum / recalls.size}%.3f|" +
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
    println(f"XRS_SERVE|users=$users|reqs=${ls.size}|wall_s=$wall%.1f|" +
      f"p50_ms=${pct(0.5)}%.0f|p95_ms=${pct(0.95)}%.0f|ef=$ef|" +
      s"buckets=$buckets")
    spark.stop()
  }
}
