package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods

/** User-supplied JSON schema reader — the dynamic-schema path
  * (robosystems/schemas/custom.py:53-76 type validation; JSON shape as
  * in examples/custom_graph_demo/schema.json: name/version/nodes[]/
  * relationships[] with per-property name/type/is_primary_key). */
object CustomSchemaJson {

  def parse(json: String): GraphSchema = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)

    def str(v: JValue, field: String, default: Option[String] = None): String =
      (v \ field) match {
        case JString(s) => s
        case JNothing | JNull =>
          default.getOrElse(throw new IllegalArgumentException(s"missing field: $field"))
        case other => other.values.toString
      }

    def bool(v: JValue, field: String): Boolean = (v \ field) match {
      case JBool(b) => b
      case _ => false
    }

    def props(v: JValue): Seq[Property] = (v \ "properties") match {
      case JArray(items) => items.map { p =>
        Property(
          name = str(p, "name"),
          tpe = GraftType.parse(str(p, "type")),
          isPrimaryKey = bool(p, "is_primary_key"),
          nullable = !bool(p, "is_required") && !bool(p, "is_primary_key"))
      }
      case _ => Seq.empty
    }

    val nodes = (root \ "nodes") match {
      case JArray(items) => items.map(n => NodeDef(str(n, "name"), props(n)))
      case _ => Seq.empty
    }
    val rels = (root \ "relationships") match {
      case JArray(items) => items.map(r =>
        RelDef(str(r, "name"), str(r, "from_node"), str(r, "to_node"), props(r)))
      case _ => Seq.empty
    }

    val schema = GraphSchema(
      str(root, "name", Some("custom")),
      str(root, "version", Some("1.0")),
      nodes, rels)
    val errors = schema.validate()
    require(errors.isEmpty, s"invalid custom schema: ${errors.mkString("; ")}")
    schema
  }
}
