package graft

import org.apache.spark.sql.functions._

/** OPQ sweep ladder (r16 verdict item 7): `opqTrain(sweeps = s)` enters
  * the fused [[graft.similarity.Knn.pqTrain]] s+1 times (one per sweep +
  * the final-rotation codebook pass), so the r16 fused-Lloyd win
  * compounds per sweep. This main verifies the fused path is what runs
  * — Spark JOB COUNT per sweep, via listener — and times a sweeps
  * ladder, printing one JSON line per rung. Measurement tooling only
  * (never run by Bench/Verify; q155 serves a cached rotation, the live
  * trainer runs in `ivfPqBuildIndex(opqSweeps > 0)` serving builds).
  *
  * Expected jobs per rung at (m, ksub, iters): fixed session work
  * (dim head = 1) + per pqTrain call [seeds 1 + iters collects]
  * + per sweep [rotate checkpoint 1 + cross-covariance collect 1].
  * The UNFUSED r15 trainer paid m·(iters+1)+1 jobs per pqTrain call
  * instead of iters+1 — at the m=64 serving default 193 vs 4.
  *
  * Usage: runMain graft.XOpqSweeps [sfDir] [m] [ksub] [iters]
  */
object XOpqSweeps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val m = if (args.length > 1) args(1).toInt else 2
    val ksub = if (args.length > 2) args(2).toInt else 4
    val iters = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.init(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val emb = GraftSession.table(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull)
    // one untimed warm pass so JIT/codegen is out of the rungs
    graft.similarity.Knn.opqTrain(emb, "embedding", "vec_id",
      m, ksub, iters, sweeps = 1)
    Seq(1, 2, 3).foreach { sweeps =>
      // listener events are async: settle before snapshotting
      Thread.sleep(500)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val (rot, cb) = graft.similarity.Knn.opqTrain(emb, "embedding",
        "vec_id", m, ksub, iters, sweeps)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val nj = jobs.get() - j0
      println(s"""{"metric":"opq_sweeps","sweeps":$sweeps,"m":$m,"ksub":$ksub,"iters":$iters,"sec":${"%.3f".format(dt)},"jobs":$nj,"dim":${rot.length},"codebooks":${cb.length}}""")
    }
    spark.stop()
  }
}
