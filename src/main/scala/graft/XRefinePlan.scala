package graft

import org.apache.spark.sql.functions._

/** Dump the PQ-refine read-back plan under a Bench-built session — the
  * committed evidence for the r16 `inFilterThreshold` parity claim (r16
  * verdict item 5): the declared-query plan corpus never exercises the
  * persistent IVFADC refine stage, so its id-IN-shortlist pushdown was
  * asserted but not shown. This main builds an `ivfPqBuildIndex(refine =
  * true)` layout, runs `IvfPqIndex.search(refine > 1)` up to (not
  * through) the stage-2 action, and writes the formatted plan: with
  * `GraftSession.init`'s `inFilterThreshold = 4096` pin the scan's
  * PushedFilters must carry a real `In(id, …)` over the shortlist (and
  * the partition filter over the probed cells); at the 10-value default
  * it silently range-degrades.
  *
  * Usage: runMain graft.XRefinePlan <sfDir> <outFile>
  */
object XRefinePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1)
      else "plans/r17/pq_refine_pushdown.txt"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // EXACTLY Bench's builder (see XPlans): inFilterThreshold is NOT set
    // here — it must arrive via GraftSession.init, the path Bench's
    // queries take, or the parity claim is untested
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 21).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.init(spark)
    val e = GraftSession.table(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull)
    val indexDir = java.nio.file.Files
      .createTempDirectory("xrefineplan").toString + "/ivfpq"
    graft.similarity.Knn.ivfPqBuildIndex(e, "embedding", "vec_id",
      indexDir, cells = 4, m = 2, ksub = 4, iters = 2,
      trainFilter = col("vec_id") % 5 === 0, refine = true)
    val idx = graft.similarity.Knn.IvfPqIndex.load(spark, indexDir)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    // refine=4, k=10 → a 40-id shortlist: over the 10-value default In
    // threshold (would range-degrade), far under the 4096 pin and the
    // 256-id chunkedIn leg size (single In, no OR tree)
    val stage2 = idx.search(qv, k = 10, nprobe = 2, refine = 4)
    val conf = spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
    val txt =
      s"""PQ-refine stage-2 read-back plan under the Bench-built session
         |(builder configs identical to graft.Bench; inFilterThreshold
         |arrives only via GraftSession.init, as in every query path).
         |
         |spark.sql.parquet.pushdown.inFilterThreshold = $conf
         |index: ivfPqBuildIndex(cells=4, m=2, ksub=4, refine=true) over
         |$sfDir embeddings; search(k=10, nprobe=2, refine=4) → 40-id
         |shortlist.
         |
         |""".stripMargin +
        stage2.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outFile).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outFile; In-pushdown present: ${
      txt.contains("In(id") || txt.contains("in(id")}")
    spark.stop()
  }
}
