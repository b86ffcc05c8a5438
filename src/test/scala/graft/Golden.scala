package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Loads the committed golden fixtures (generated once from the reference
  * implementation by scripts/gen_goldens.py).
  */
object Golden {
  private val mapper = new ObjectMapper()

  def load(name: String): JsonNode = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource $name")
    try mapper.readTree(in)
    finally in.close()
  }

  def elems(n: JsonNode): Vector[JsonNode] = n.elements().asScala.toVector

  def strings(n: JsonNode): Vector[String] =
    elems(n).map(_.asText())

  def fields(n: JsonNode): Vector[(String, JsonNode)] =
    n.properties().asScala.toVector.map(e => e.getKey -> e.getValue)
}
