package graft.serve

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Compact deterministic JSON for the serving edge (reference analog:
  * `json.dumps(..., separators=(",", ":"))` in
  * readwise_vector_db/mcp/framing.py:93-98). Jackson ships on Spark's
  * classpath; map insertion order is preserved so framing output is
  * byte-stable. */
object Json {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.USE_LONG_FOR_INTS, true)
    m
  }

  /** Compact serialization (no spaces), UTF-8 semantics. */
  def write(value: Any): String = mapper.writeValueAsString(value)

  /** Parse a JSON object string into a Scala Map. Throws on malformed
    * input or non-object top level. */
  def parseObject(s: String): Map[String, Any] = {
    val parsed = mapper.readValue(s, classOf[Any])
    parsed match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other =>
        throw new IllegalArgumentException(
          s"Message must be a JSON object, got ${other.getClass.getSimpleName}")
    }
  }
}
