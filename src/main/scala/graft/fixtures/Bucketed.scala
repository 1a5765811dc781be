package graft.fixtures

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed copies of the join fact tables — the storage-layout answer to
  * repeated fact-fact joins at 100 TB: both sides written
  * `CLUSTERED BY (orderkey) SORTED BY (orderkey) INTO 8 BUCKETS`, so a
  * join on the bucket key needs NO Exchange on either side (bucket i
  * joins bucket i; Spark plans a SortMergeJoin straight over the bucket
  * files). The distributed analog of the IVF cell layout: pay the
  * organization once at write time, skip the shuffle on every read.
  *
  * Catalog entries are per-session (in-memory catalog); the DATA persists
  * under [[Fp16Corpus.workRoot]] keyed by (sf, both row counts), and a
  * new session re-registers an external bucketed table over the existing
  * files instead of rewriting them. A partial write (no `_SUCCESS`, e.g.
  * a killed JVM mid-CTAS) is deleted and rewritten — CTAS refuses
  * non-empty locations, so a leftover dir would otherwise wedge the
  * fixture permanently.
  */
object Bucketed {

  private def deleteDir(d: File): Unit = {
    Option(d.listFiles()).toSeq.flatten.foreach(deleteDir)
    d.delete(); ()
  }

  /** Bucket count: at least the session's core count, floor 8 — buckets
    * cap the join's parallelism (bucket i joins bucket i, one task each),
    * so fewer buckets than cores idles the difference. On a real cluster
    * you'd size this to the target executor count × cores at layout time. */
  def bucketCount(s: SparkSession): Int =
    math.max(s.sparkContext.defaultParallelism, 8)

  private def ensureTable(s: SparkSession, table: String, location: String,
      schema: String, bucketCol: String, src: DataFrame): DataFrame = {
    if (!s.catalog.tableExists(table)) {
      val spec = s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
        s"INTO ${bucketCount(s)} BUCKETS"
      val loc = new File(location)
      if (new File(loc, "_SUCCESS").isFile)
        s.sql(s"""CREATE TABLE $table ($schema) USING parquet $spec
                 |LOCATION '$location'""".stripMargin)
      else {
        if (loc.exists()) deleteDir(loc) // partial write from a killed JVM
        val view = s"${table}_src"
        src.createOrReplaceTempView(view)
        s.sql(s"""CREATE TABLE $table USING parquet $spec
                 |LOCATION '$location' AS SELECT * FROM $view""".stripMargin)
      }
    }
    s.table(table)
  }

  /** (orders, lineitem) bucketed on the orderkey, built from the given
    * source frames (column set fixed to the join's needs). */
  def ordersLineitem(s: SparkSession, sfDir: String,
      orders: DataFrame, lineitem: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val oSrc = orders.select(col("o_orderkey"), col("o_custkey"))
    val lSrc = lineitem.select(col("l_orderkey"), col("l_extendedprice"),
      col("l_discount"))
    val tag = new File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    // bucket count is part of the layout: a session with a different core
    // count must not re-register (or silently reuse) files bucketed for
    // another width — key the fixture on it
    val key = s"${tag}_c${oSrc.count()}_${lSrc.count()}_b${bucketCount(s)}"
    val root = s"${Fp16Corpus.workRoot}/bucketed-$key"
    val o = ensureTable(s, s"orders_bkt_$key", s"$root/orders",
      "o_orderkey BIGINT, o_custkey BIGINT", "o_orderkey", oSrc)
    val l = ensureTable(s, s"lineitem_bkt_$key", s"$root/lineitem",
      "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
      "l_orderkey", lSrc)
    (o, l)
  }
}
