package graft.serve

/** Server-Sent-Events framing for streamed search results (reference:
  * readwise_vector_db/api/routes.py:39-66 `_generate_sse_events`). Pure
  * formatting: `event: result` per row, terminal `event: complete` with the
  * total, `event: error` on failure; a disconnect check callback stops the
  * stream early.
  */
object SseFraming {

  def resultEvent(row: Map[String, Any]): String =
    s"event: result\ndata: ${Json.write(row)}\n\n"

  def completeEvent(total: Int): String =
    s"event: complete\ndata: ${Json.write(Map("total" -> total))}\n\n"

  def errorEvent(message: String): String =
    s"event: error\ndata: ${Json.write(Map("message" -> message))}\n\n"

  /** Frame a (already-computed, k ≤ 100) result stream into SSE events.
    * `isDisconnected` is polled before each row — on disconnect the stream
    * stops without the `complete` event, matching routes.py:51-61. */
  def stream(rows: Iterator[Map[String, Any]],
      isDisconnected: () => Boolean = () => false): Iterator[String] = {
    var sent = 0
    var disconnected = false
    val results = rows.takeWhile { _ =>
      disconnected = isDisconnected()
      !disconnected
    }.map { row =>
      sent += 1
      resultEvent(row)
    }
    results ++ new Iterator[String] {
      private var done = false
      def hasNext: Boolean = !done && !disconnected && !isDisconnected()
      def next(): String = { done = true; completeEvent(sent) }
    }
  }
}
