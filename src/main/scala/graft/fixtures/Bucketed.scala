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
  * under [[Fp16Corpus.workRoot]] keyed by (sf, row count), and a new
  * session re-registers an external bucketed table over the existing
  * files instead of rewriting them.
  */
object Bucketed {

  private def ensureTable(s: SparkSession, table: String, location: String,
      schema: String, bucketCol: String, select: String): DataFrame = {
    if (!s.catalog.tableExists(table)) {
      val spec = s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO 8 BUCKETS"
      if (new File(location, "_SUCCESS").isFile)
        s.sql(s"""CREATE TABLE $table ($schema) USING parquet $spec
                 |LOCATION '$location'""".stripMargin)
      else
        s.sql(s"""CREATE TABLE $table USING parquet $spec
                 |LOCATION '$location' AS $select""".stripMargin)
    }
    s.table(table)
  }

  /** (orders, lineitem) bucketed on the orderkey. `ordersView` /
    * `lineitemView` must be registered temp views over the sf tables. */
  def ordersLineitem(s: SparkSession, sfDir: String, cnt: Long)
      : (DataFrame, DataFrame) = {
    val tag = new File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${Fp16Corpus.workRoot}/bucketed-$tag-c$cnt"
    val o = ensureTable(s, s"orders_bkt_${tag}_c$cnt", s"$root/orders",
      "o_orderkey BIGINT, o_custkey BIGINT", "o_orderkey",
      "SELECT o_orderkey, o_custkey FROM graft_bucketed_orders_src")
    val l = ensureTable(s, s"lineitem_bkt_${tag}_c$cnt", s"$root/lineitem",
      "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
      "l_orderkey",
      "SELECT l_orderkey, l_extendedprice, l_discount FROM graft_bucketed_lineitem_src")
    (o, l)
  }
}
