package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON re-serialization — the exact analog of the
  * reference's protobuf re-serialize-before-hash
  * (Deduplicator.java:71-106): parse, recursively sort every object's
  * keys, serialize compactly. Two payloads that differ only in key
  * order / whitespace / number spelling become one canonical string;
  * nested objects are handled (a schema-based `from_json` to a flat
  * map would null them out and MERGE distinct payloads — the bug this
  * expression exists to avoid).
  *
  * An UNPARSEABLE input is returned verbatim: garbage stays distinct
  * garbage (collapsing all malformed payloads to one canonical form
  * would dedup-drop real messages). Jackson (already on Spark's
  * classpath) does the parse; CodegenFallback is fine here — the
  * expression is one opaque library call either way, and it sits in
  * key-derivation, not an inner arithmetic loop.
  */
case class CanonicalJson(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    try {
      val node = CanonicalJson.mapper.readTree(s)
      if (node == null) input // empty string parses to null node
      else UTF8String.fromString(
        CanonicalJson.mapper.writeValueAsString(CanonicalJson.sortNode(node)))
    } catch {
      case _: Exception => input // unparseable → raw bytes stay the identity
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalJson =
    copy(child = newChild)
}

object CanonicalJson {
  @transient private lazy val mapperHolder = new ObjectMapper()
  private[plans] def mapper: ObjectMapper = mapperHolder

  private[plans] def sortNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val sorted = mapper.createObjectNode()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = o.fieldNames()
      while (it.hasNext) names += it.next()
      names.sorted.foreach(f => sorted.set[JsonNode](f, sortNode(o.get(f))))
      sorted
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach(e => out.add(sortNode(e)))
      out
    case other => other
  }

  def apply(c: Column): Column =
    GraftShim.column(CanonicalJson(GraftShim.expression(c)))
}
