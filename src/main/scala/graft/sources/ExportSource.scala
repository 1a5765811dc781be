package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One page fetched from a cursor-paginated export API: the raw JSON body
  * plus the continuation cursor (reference: `nextPageCursor`,
  * readwise_vector_db/core/readwise.py:16-38). */
final case class Page(body: String, nextPageCursor: Option[String])

/** A fetch failure that retrying cannot fix (4xx client errors: bad token,
  * malformed request) — [[ExportClient]] surfaces it immediately instead
  * of burning the backoff budget. */
final class FatalFetchException(msg: String) extends RuntimeException(msg)

/** Cursor-paginated export source (reference: ReadwiseClient,
  * core/readwise.py:16-76).
  *
  * Spark-first split: the *driver* walks the cursor chain (inherently
  * sequential, politeness-delayed I/O — S1's 3 s inter-page pacing), while
  * the *cluster* does all parsing/flattening via
  * [[ExportSource.pagesToHighlights]]. The fetch function is injected so
  * tests (and any transport) plug in without HTTP coupling; a page fetch
  * maps to `GET {base}/api/v2/export/?pageCursor=...&updatedAfter=...`.
  */
final class ExportClient(
    fetchPage: (String, Map[String, String]) => Page,
    delayMillis: Long = 3000,
    retryAttempts: Int = 3,
    retryBaseMillis: Long = 1000,
    sleep: Long => Unit = Thread.sleep) {

  /** Exponential-backoff retry around one page fetch (reference policy:
    * 3 attempts, 1 s base, ×2 — db/supabase_ops.py:22-73). */
  private def fetchWithRetry(path: String, params: Map[String, String]): Page = {
    var attempt = 1
    var delay = retryBaseMillis
    var result: Option[Page] = None
    while (result.isEmpty) {
      try result = Some(fetchPage(path, params))
      catch {
        case e: FatalFetchException => throw e // 4xx: retry cannot help
        case scala.util.control.NonFatal(e) =>
          if (attempt >= retryAttempts) throw e
          sleep(delay)
          delay *= 2
          attempt += 1
      }
    }
    result.get
  }

  /** Follow `nextPageCursor` until exhausted, pacing between pages
    * (readwise.py:29-38). Lazy: pages fetch as consumed. */
  def pages(path: String, params: Map[String, String]): Iterator[String] =
    new Iterator[String] {
      private var cursor: Option[String] = None
      private var first = true
      private var done = false
      def hasNext: Boolean = !done
      def next(): String = {
        if (!first) sleep(delayMillis)
        val p = fetchWithRetry(path, params ++ cursor.map("pageCursor" -> _))
        first = false
        cursor = p.nextPageCursor
        done = cursor.isEmpty
        p.body
      }
    }

  /** All export pages, optionally incremental (readwise.py:40-52). */
  def export(updatedAfter: Option[String] = None): Iterator[String] =
    pages("/api/v2/export/",
      updatedAfter.map("updatedAfter" -> _).toMap)

  /** Reader v3 list pages with `updated__gt` (readwise.py:66-76). */
  def readerList(updatedAfter: Option[String] = None): Iterator[String] =
    pages("/api/v3/list/",
      updatedAfter.map("updated__gt" -> _).toMap)
}

object ExportSource {

  /** Declared schema of an export page (readwise.py:51-64 book fields;
    * jobs/parser.py:19-36 highlight fields) — fixed, not inferred, per the
    * reference's declared-schema posture (SURVEY.md §1.4). */
  val highlightSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("text", StringType),
    StructField("note", StringType),
    StructField("location", LongType),
    StructField("url", StringType),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("highlighted_at", StringType),
    StructField("updated_at", StringType)))

  val bookSchema: StructType = StructType(Seq(
    StructField("user_book_id", LongType),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("category", StringType),
    StructField("source", StringType),
    StructField("source_url", StringType),
    StructField("highlights", ArrayType(highlightSchema))))

  val pageSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(bookSchema)),
    StructField("nextPageCursor", StringType)))

  /** Page JSON strings → one parsed canonical-highlight row each, on the
    * cluster: from_json with the declared schema, then the S2 flatten and
    * S4/S5 parse. Pages parallelize across the cluster; each page is
    * independent. */
  def pagesToHighlights(spark: SparkSession, pages: Seq[String]): DataFrame = {
    import spark.implicits._
    val raw: Dataset[String] = spark.createDataset(pages)
    val parsed = raw.select(from_json(col("value"), pageSchema).as("page"))
      .select(col("page.results").as("results"))
    graft.ingest.Ingest.parseHighlights(
      graft.ingest.Ingest.flattenExport(parsed))
  }
}
