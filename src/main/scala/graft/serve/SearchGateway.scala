package graft.serve

import java.sql.Timestamp
import java.time.format.DateTimeFormatter

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row}

import graft.embed.Embedder
import graft.search.{SearchRequest, SemanticSearch}

/** Glue between the protocol layer ([[SearchParams]]) and the Spark query
  * (embed query text → [[SemanticSearch]] top-k → row dicts) — the
  * reference's `SearchService.execute_search` lifecycle
  * (readwise_vector_db/mcp/search_service.py:167-262, core/search.py:44-122,
  * row decode db/supabase_ops.py:278-295).
  *
  * The store is a highlight-schema DataFrame (FIXTURES.md §1). k ≤ 100 so
  * the collected result is tiny; the heavy lifting stays distributed in
  * `TakeOrderedAndProject`.
  */
final class SearchGateway(store: DataFrame, embedder: Embedder = Embedder.Default) {

  private val iso = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  def search(params: SearchParams): Iterator[Map[String, Any]] = {
    val req = SearchRequest(
      queryVec = embedder.embed(params.query),
      k = params.k,
      sourceType = params.sourceType,
      author = params.author,
      tags = params.tags,
      highlightedAtRange = params.highlightedAtRange.map { case (f, t) =>
        (Timestamp.valueOf(f.atStartOfDay()),
          Timestamp.valueOf(t.atStartOfDay())) })
    val rows = SemanticSearch.search(store, req).collect().iterator
    rows.map(decode)
  }

  /** Row → serving dict, the 12-col + score shape of supabase_ops.py:278-295
    * (missing store columns surface as absent keys → JSON null at the edge,
    * matching api/routes.py:205-217 defaulting). */
  private def decode(row: Row): Map[String, Any] = {
    val fields = Seq("id", "text", "source_type", "source_author",
      "source_title", "source_url", "category", "note", "location",
      "highlighted_at", "tags", "score")
    fields.foldLeft(ListMap.empty[String, Any]) { (acc, f) =>
      if (!row.schema.fieldNames.contains(f)) acc
      else acc + (f -> (row.getAs[Any](f) match {
        case ts: Timestamp => ts.toLocalDateTime.format(iso)
        case seq: Seq[_] => seq
        case other => other
      }))
    }
  }
}
