package graft.serve

import org.scalatest.funsuite.AnyFunSuite

class McpFramingSpec extends AnyFunSuite {

  test("pack: compact NDJSON, key order, id rules") {
    // request with id
    assert(McpFraming.pack(McpFraming.request("search", Map("q" -> "x"), Some(7L))) ==
      """{"jsonrpc":"2.0","method":"search","params":{"q":"x"},"id":7}""" + "\n")
    // notification: id omitted entirely
    assert(McpFraming.pack(McpFraming.request("search", Map("q" -> "x"))) ==
      """{"jsonrpc":"2.0","method":"search","params":{"q":"x"}}""" + "\n")
    // response: id always present
    assert(McpFraming.pack(McpFraming.response(Seq.empty, "null")) ==
      """{"jsonrpc":"2.0","id":"null","result":[]}""" + "\n")
    // error response without id → id serialized as null (spec-required member)
    assert(McpFraming.pack(
      McpFraming.errorResponse(JsonRpcErrorCodes.ParseError, "bad")) ==
      """{"jsonrpc":"2.0","id":null,"error":{"code":-32700,"message":"bad"}}""" + "\n")
  }

  test("parseLine round-trips a request") {
    val m = McpFraming.parseLine(
      """{"jsonrpc":"2.0","method":"search","params":{"q":"spark","k":3},"id":"a1"}""")
    assert(m.method.contains("search"))
    assert(m.id.contains("a1"))
    assert(m.params.get("q") == "spark")
    assert(m.params.get("k") == 3L)
  }

  test("parseLine error taxonomy") {
    // invalid JSON → framing error (-32700 class)
    intercept[McpFramingException](McpFraming.parseLine("{not json"))
    // empty line → framing error
    intercept[McpFramingException](McpFraming.parseLine(""))
    // too long → framing error
    intercept[McpFramingException](
      McpFraming.parseLine("x" * 100, maxLineLength = 10))
    // non-object → protocol error
    intercept[McpProtocolException](McpFraming.parseLine("[1,2,3]"))
    // wrong version → protocol error
    intercept[McpProtocolException](
      McpFraming.parseLine("""{"jsonrpc":"1.0","method":"search"}"""))
    intercept[McpProtocolException](
      McpFraming.parseLine("""{"method":"search"}"""))
  }
}

class SseFramingSpec extends AnyFunSuite {

  test("result/complete/error event shapes") {
    assert(SseFraming.resultEvent(
      scala.collection.immutable.ListMap("id" -> "h1", "score" -> 0.25)) ==
      "event: result\ndata: {\"id\":\"h1\",\"score\":0.25}\n\n")
    assert(SseFraming.completeEvent(3) ==
      "event: complete\ndata: {\"total\":3}\n\n")
    assert(SseFraming.errorEvent("boom") ==
      "event: error\ndata: {\"message\":\"boom\"}\n\n")
  }

  test("stream frames rows then a complete event with the count") {
    val rows = Iterator(Map[String, Any]("id" -> 1), Map[String, Any]("id" -> 2))
    val events = SseFraming.stream(rows).toList
    assert(events.length == 3)
    assert(events(0).startsWith("event: result\n"))
    assert(events(2) == "event: complete\ndata: {\"total\":2}\n\n")
  }

  test("disconnect stops the stream without a complete event") {
    var polls = 0
    val rows = Iterator.tabulate(5)(i => Map[String, Any]("id" -> i))
    val events = SseFraming.stream(rows, isDisconnected = () => {
      polls += 1; polls > 2 // disconnect after 2 rows
    }).toList
    assert(events.length == 2)
    assert(events.forall(_.startsWith("event: result\n")))
  }
}

class SearchParamsSpec extends AnyFunSuite {

  test("mcp parsing: q required, invalid k → default, date range fold") {
    assert(SearchParams.fromMcp(Map()) ==
      Left("Missing or invalid 'q' parameter"))
    assert(SearchParams.fromMcp(Map("q" -> "")).isLeft)

    val p = SearchParams.fromMcp(Map(
      "q" -> "spark", "k" -> 5L, "source_type" -> "book",
      "tags" -> Seq("a", "b"),
      "highlighted_at_range" -> Seq("2024-01-01", "2024-06-30"))).toOption.get
    assert(p.k == 5 && p.sourceType.contains("book"))
    assert(p.tags.contains(Seq("a", "b")))
    assert(p.highlightedAtRange.get._1.toString == "2024-01-01")

    // invalid k silently defaults (search_service.py:78-80)
    assert(SearchParams.fromMcp(Map("q" -> "x", "k" -> -3L)).toOption.get.k == 20)
    // bad date → range dropped, not an error
    assert(SearchParams.fromMcp(Map("q" -> "x",
      "highlighted_at_range" -> Seq("nope", "2024-01-01")))
      .toOption.get.highlightedAtRange.isEmpty)
  }

  test("http parsing: k clamp to [1,100], tags comma-split") {
    assert(SearchParams.fromHttp("x", k = 500).toOption.get.k == 100)
    assert(SearchParams.fromHttp("x", k = 0).toOption.get.k == 20)
    assert(SearchParams.fromHttp("x",
      tagsCsv = Some(" a, b ,, c")).toOption.get.tags.contains(Seq("a", "b", "c")))
    assert(SearchParams.fromHttp("x", tagsCsv = Some(" , ")).toOption.get.tags.isEmpty)
    assert(SearchParams.fromHttp("").isLeft)
  }
}
