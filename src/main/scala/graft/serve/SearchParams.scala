package graft.serve

import java.time.LocalDate

/** Validated search parameters shared by every protocol entry (reference:
  * readwise_vector_db/mcp/search_service.py SearchParams + the two parsers).
  * Query text is embedded downstream; filters map 1:1 onto
  * [[graft.search.SemanticSearch]] columns. */
final case class SearchParams(
    query: String,
    k: Int = SearchParams.DefaultK,
    sourceType: Option[String] = None,
    author: Option[String] = None,
    tags: Option[Seq[String]] = None,
    highlightedAtRange: Option[(LocalDate, LocalDate)] = None,
    // opt-in hybrid retrieval (100-TB extension surface, not a reference
    // behavior): dense cosine top-k + BM25 top-k fused by reciprocal
    // rank; the reported score becomes the RRF value
    hybrid: Boolean = false,
    // opt-in MMR diversification (q116's operator at the serving edge):
    // λ ∈ (0, 1] re-orders a pooled dense top-4k by
    // λ·rel − (1−λ)·max-sim greedy selection. Dense store-scan path
    // only; ignored when hybrid is set (RRF candidates carry no
    // embedding to diversify on)
    mmrLambda: Option[Double] = None)

object SearchParams {
  /** Reference defaults: k=20, invalid k silently coerced to the default
    * (search_service.py:78-80); HTTP clamps to [1, 100] (routes.py:100). */
  val DefaultK = 20
  val MaxK = 100

  private def parseDate(s: String): Option[LocalDate] =
    try Option(s).filter(_.nonEmpty).map(LocalDate.parse)
    catch { case _: Exception => None }

  /** Both-ends-or-nothing date-range fold (search_service.py:88-102,
    * 147-156): any unparseable or missing end drops the whole range. */
  def dateRange(from: Option[String], to: Option[String]): Option[(LocalDate, LocalDate)] =
    for {
      f <- from.flatMap(parseDate)
      t <- to.flatMap(parseDate)
    } yield (f, t)

  /** Comma-split + trim + drop-empty for the HTTP `tags` query param
    * (api/routes.py:134-137). */
  def splitTags(raw: Option[String]): Option[Seq[String]] =
    raw.map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)

  /** MCP params parsing (search_service.py:60-111). Missing/invalid `q` is
    * the only hard error; invalid k falls back to the default. */
  def fromMcp(params: Map[String, Any]): Either[String, SearchParams] =
    params.get("q") match {
      case Some(q: String) if q.nonEmpty =>
        val k = params.get("k") match {
          case Some(n: Long) if n > 0 => n.toInt
          case Some(n: Int) if n > 0 => n
          case Some(d: Double) if d.isWhole && d > 0 => d.toInt
          case _ => DefaultK
        }
        val range = params.get("highlighted_at_range") match {
          case Some(xs: Seq[_]) if xs.length >= 2 =>
            dateRange(
              Option(xs(0)).map(_.toString),
              Option(xs(1)).map(_.toString))
          case _ => None
        }
        Right(SearchParams(
          query = q,
          k = k,
          sourceType = params.get("source_type").collect { case s: String => s },
          author = params.get("author").collect { case s: String => s },
          tags = params.get("tags").collect {
            case xs: Seq[_] => xs.map(_.toString) }.filter(_.nonEmpty),
          highlightedAtRange = range,
          hybrid = parseHybrid(params.get("hybrid")),
          mmrLambda = parseMmr(params.get("mmr"))))
      case _ => Left("Missing or invalid 'q' parameter")
    }

  /** Lenient λ parse matching the k philosophy: only a numeric value in
    * (0, 1] opts in; anything else (absent, junk, out of range) is the
    * plain-ranking default. λ=1 is legal and ≡ plain top-k — a caller
    * probing the dial's endpoint gets the consistent answer. */
  private def parseMmr(v: Option[Any]): Option[Double] = (v match {
    case Some(d: Double) => Some(d)
    case Some(n: Long) => Some(n.toDouble)
    case Some(n: Int) => Some(n.toDouble)
    case Some(s: String) => s.toDoubleOption
    case _ => None
  }).filter(l => l > 0.0 && l <= 1.0)

  /** Lenient opt-in flag, matching the k philosophy: only an explicit
    * true-ish value turns hybrid on; anything else is the dense default. */
  private def parseHybrid(v: Option[Any]): Boolean = v match {
    case Some(b: Boolean) => b
    case Some(s: String) => s.equalsIgnoreCase("true")
    case _ => false
  }

  /** HTTP query-param parsing (search_service.py:113-165 + the route's
    * comma-split). */
  def fromHttp(query: String, k: Int = DefaultK,
      sourceType: Option[String] = None, author: Option[String] = None,
      tagsCsv: Option[String] = None, fromDate: Option[String] = None,
      toDate: Option[String] = None,
      hybrid: Option[String] = None,
      mmr: Option[String] = None): Either[String, SearchParams] =
    if (query == null || query.isEmpty) Left("Missing or invalid 'q' parameter")
    else Right(SearchParams(
      query = query,
      k = if (k > 0) math.min(k, MaxK) else DefaultK,
      sourceType = sourceType,
      author = author,
      tags = splitTags(tagsCsv),
      highlightedAtRange = dateRange(fromDate, toDate),
      hybrid = parseHybrid(hybrid),
      mmrLambda = parseMmr(mmr)))
}
