package graft

/** Dump `.explain("formatted")` for every declared query — the r16
  * optimization round's measurement aid (guide §1: capture the plan shape
  * before and after each change so Exchange counts / join strategies /
  * PushedFilters claims are checkable without running Spark).
  *
  * Usage: runMain graft.XPlans <sfDir> <outDir> [qPrefix,qPrefix,...]
  *
  * Builds each query's DataFrame against `sfDir` (eager side-effect
  * builds — index construction and the like — run exactly as the bench
  * runs them) under the same session configs as [[Bench]], and writes
  * one `<name>.txt` per query with the formatted physical plan. Queries
  * whose build throws record the error instead, so a broken row is
  * visible rather than silently absent.
  */
object XPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r16/all"
    val only = if (args.length > 2)
      Some(args(2).split(',').map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // EXACTLY Bench's session configs: the captured plans must be the
    // plans the bench times. (Since r16, GraftSession.init pins
    // inFilterThreshold=4096 at runtime for EVERY entry point — Bench,
    // Verify, XPlans, and GraftSession.get() all serve the same
    // pushdown plan; the builder configs below only need to match
    // Bench's remaining settings: shuffle partitions, AQE, split size,
    // agg fallback threshold.)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.exists(p => name.startsWith(p)))) {
        spark.sparkContext.setJobDescription(s"xplans: $name")
        val txt =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable =>
            s"ERROR building $name: ${e.getClass.getName}: ${e.getMessage}"
          }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
