package graft
import org.apache.spark.sql.functions._
object XDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"XDEBUG|$label|rows=$n|sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // warm the session/codegen
    time("warm") { SparkEntry.queries("q119_nndescent_graph")(spark, dir).count() }
    time("q119_r3") { SparkEntry.queries("q119_nndescent_graph")(spark, dir).count() }
    time("q149_r3") { SparkEntry.queries("q149_compressed_descent")(spark, dir).count() }
    val e = GraftSession.table(spark, dir, "embeddings").filter(col("vec_id") < 200)
    time("q149_r1") { graft.similarity.Knn.nnDescentGraphCompressed(
      e, "embedding", "vec_id", k = 5, rounds = 1).count() }
    time("q149_r3_sp8") {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val n = graft.similarity.Knn.nnDescentGraphCompressed(
        e, "embedding", "vec_id", k = 5, rounds = 3).count()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      n
    }
    time("q149_r3_sp4") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val n = graft.similarity.Knn.nnDescentGraphCompressed(
        e, "embedding", "vec_id", k = 5, rounds = 3).count()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      n
    }
    time("q149_r3_again") { SparkEntry.queries("q149_compressed_descent")(spark, dir).count() }
    spark.stop()
  }
}
