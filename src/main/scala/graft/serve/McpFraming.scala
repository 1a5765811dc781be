package graft.serve

import java.io.{BufferedReader, Writer}

import scala.collection.immutable.ListMap

/** JSON-RPC 2.0 / NDJSON framing for the MCP TCP protocol (reference:
  * readwise_vector_db/mcp/framing.py). Same wire format and error taxonomy:
  * one compact JSON object per line; parse failures → -32700, protocol
  * violations → -32600, unknown method → -32601, bad params → -32602,
  * internal → -32603.
  */
object JsonRpcErrorCodes {
  val ParseError = -32700
  val InvalidRequest = -32600
  val MethodNotFound = -32601
  val InvalidParams = -32602
  val InternalError = -32603
}

final class McpFramingException(msg: String) extends Exception(msg)
final class McpProtocolException(msg: String) extends Exception(msg)

/** One JSON-RPC 2.0 message. `id` is Option[Any] (string or long);
  * responses always carry the id member (null when absent), notifications
  * omit it — mirroring framing.py:36-48. */
final case class McpMessage(
    jsonrpc: String = "2.0",
    method: Option[String] = None,
    params: Option[Map[String, Any]] = None,
    id: Option[Any] = None,
    result: Option[Any] = None,
    error: Option[Map[String, Any]] = None) {

  def toWireMap: Map[String, Any] = {
    var m: ListMap[String, Any] = ListMap("jsonrpc" -> jsonrpc)
    method.foreach(v => m = m + ("method" -> v))
    params.foreach(v => m = m + ("params" -> v))
    val hasResultOrError = result.isDefined || error.isDefined
    if (hasResultOrError || id.isDefined)
      m = m + ("id" -> id.orNull)
    result.foreach(v => m = m + ("result" -> v))
    error.foreach(v => m = m + ("error" -> v))
    m
  }
}

object McpFraming {
  val DefaultMaxLineLength: Int = 1024 * 1024

  def request(method: String, params: Map[String, Any],
      requestId: Option[Any] = None): McpMessage =
    McpMessage(method = Some(method), params = Some(params), id = requestId)

  def response(result: Any, requestId: Any): McpMessage =
    McpMessage(result = Some(result), id = Option(requestId))

  def errorResponse(code: Int, message: String,
      requestId: Option[Any] = None, data: Option[Any] = None): McpMessage = {
    val err = ListMap("code" -> code, "message" -> message) ++
      data.map(d => "data" -> d)
    McpMessage(error = Some(err), id = requestId)
  }

  /** NDJSON pack: compact JSON + newline (framing.py:80-98). */
  def pack(message: McpMessage): String = Json.write(message.toWireMap) + "\n"

  /** Parse one NDJSON line into a message, enforcing the same guards as
    * read_mcp_message (framing.py:159-206): length cap, non-empty,
    * JSON-object shape, jsonrpc == "2.0". */
  def parseLine(line: String,
      maxLineLength: Int = DefaultMaxLineLength): McpMessage = {
    // the cap is in BYTES: chars > max always means bytes > max (UTF-8 is
    // ≥1 byte/char); otherwise count exactly only when 4×chars could exceed
    val tooLong = line.length > maxLineLength ||
      (line.length.toLong * 4 > maxLineLength &&
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length > maxLineLength)
    if (tooLong)
      throw new McpFramingException(s"Message too long: > $maxLineLength bytes")
    val trimmed = line.stripLineEnd
    if (trimmed.isEmpty)
      throw new McpFramingException("Empty message received")
    val data =
      try Json.parseObject(trimmed)
      catch {
        case e: IllegalArgumentException => throw new McpProtocolException(e.getMessage)
        case e: Exception => throw new McpFramingException(s"Invalid JSON: ${e.getMessage}")
      }
    if (!data.get("jsonrpc").contains("2.0"))
      throw new McpProtocolException("Invalid or missing jsonrpc version")
    McpMessage(
      jsonrpc = "2.0",
      method = data.get("method").collect { case s: String => s },
      params = data.get("params").collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]] },
      id = data.get("id").flatMap(Option(_)),
      result = data.get("result").flatMap(Option(_)),
      error = data.get("error").collect { case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]] })
  }

  /** Read one message from a buffered reader (null line = connection
    * closed). */
  def read(in: BufferedReader,
      maxLineLength: Int = DefaultMaxLineLength): Option[McpMessage] =
    Option(in.readLine()).map(parseLine(_, maxLineLength))

  /** Write one message; flush per message = the JVM analog of
    * `await writer.drain()` back-pressure (framing.py:209-229). */
  def write(out: Writer, message: McpMessage): Unit = {
    out.write(pack(message))
    out.flush()
  }
}
