package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest pipeline, Spark-first (reference: readwise_vector_db/core/
  * readwise.py:40-64 export flattening, jobs/parser.py:7-36 parsing,
  * db/supabase_ops.py:112-208 ON CONFLICT upsert).
  */
object Ingest {

  /** Flatten a Readwise-export-shaped frame: one row per page with
    * `results: array<struct<..., highlights: array<struct<...>>>>` →
    * one row per highlight carrying its parent book's fields (the
    * reference's only join-like op, a 1:N denormalization that needs no
    * shuffle — parent and children co-arrive in one document;
    * core/readwise.py:51-64).
    */
  def flattenExport(pages: DataFrame): DataFrame =
    pages
      .select(explode(col("results")).as("book"))
      .select(col("book"), explode(col("book.highlights")).as("h"))

  /** Parse a flattened highlight into the canonical schema: tag-name
    * extraction, URL coalesce, null-on-error ISO timestamp parse
    * (jobs/parser.py:19-36; SURVEY.md §1.4 drift resolution). */
  def parseHighlights(flat: DataFrame): DataFrame =
    flat.select(
      col("h.id").cast("string").as("id"),
      col("h.text").as("text"),
      coalesce(col("book.category"), lit("article")).as("source_type"),
      col("book.author").as("source_author"),
      col("book.title").as("source_title"),
      coalesce(col("h.url"), col("book.source_url")).as("source_url"),
      col("book.category").as("category"),
      col("h.note").as("note"),
      col("h.location").cast("int").as("location"),
      // try_to_timestamp = null-on-error under ANSI mode, matching
      // parse_iso_datetime's invalid→None semantics (jobs/parser.py:7-16)
      try_to_timestamp(col("h.highlighted_at")).as("highlighted_at"),
      try_to_timestamp(col("h.updated_at")).as("updated_at"),
      transform(col("h.tags"), t => t.getField("name")).as("tags"))

  /** Keyed newest-wins upsert, the ON CONFLICT (id) DO UPDATE analog
    * (db/supabase_ops.py:148-166). `version` is the arrival-order
    * tiebreaker (executemany applies batch rows in order — SURVEY.md §7.4);
    * higher version wins, then updates beat existing on equal version.
    *
    * Idempotent: applying the same batch twice ≡ once. One shuffle on the
    * key; at scale write the result with partition overwrite or Delta MERGE.
    */
  def upsert(existing: DataFrame, updates: DataFrame, keyCol: String,
      versionCol: String): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}

/** Incremental-sync watermark checkpoint (reference `syncstate` table:
  * models/sync_state.py:7-11, jobs/incremental.py:36-47,78). At-least-once:
  * the cursor only advances after a successful batch; the keyed upsert makes
  * reprocessing idempotent.
  *
  * Stored through the Hadoop FileSystem API so the checkpoint can live on
  * shared cluster storage next to the store it guards; the commit goes
  * through [[graft.sync.FsUtil.atomicReplace]] (java.nio ATOMIC_MOVE on
  * local filesystems, FileContext OVERWRITE rename on HDFS). */
object SyncState {
  import org.apache.hadoop.fs.{Path => HPath}

  private def conf() =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def read(path: String, service: String): Option[java.time.Instant] = {
    val p = new HPath(path, s"$service.watermark")
    val fs = p.getFileSystem(conf())
    if (!fs.exists(p)) None
    else Some(java.time.Instant.parse(
      scala.util.Using.resource(fs.open(p)) { in =>
        new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
      }))
  }

  /** Atomic write-to-temp + rename (plain-FS upsert atomicity,
    * SURVEY.md §7.4). */
  def write(path: String, service: String, at: java.time.Instant): Unit = {
    val dir = new HPath(path)
    val fs = dir.getFileSystem(conf())
    fs.mkdirs(dir)
    val tmp = new HPath(dir, s".$service.watermark.tmp")
    scala.util.Using.resource(fs.create(tmp, true))(
      _.write(at.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    graft.sync.FsUtil.atomicReplace(fs, conf(), tmp,
      new HPath(dir, s"$service.watermark"))
  }
}
