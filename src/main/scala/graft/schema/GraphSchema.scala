package graft.schema

import org.apache.spark.sql.types._

/** Schema-full property-graph model: each node label and relationship
  * type is a table with a declared column schema.
  *
  * Re-expresses the reference's schema system
  * (robosystems/schemas/models.py:11-113 — Property/Node/Relationship/
  * Schema emitting Cypher DDL) as case classes emitting Spark
  * `StructType`. Type mapping follows SURVEY.md §1.3
  * (robosystems/schemas/custom.py:53-76).
  */
sealed trait GraftType { def spark: DataType }
object GraftType {
  case object STRING extends GraftType { val spark: DataType = StringType }
  case object INT8 extends GraftType { val spark: DataType = ByteType }
  case object INT16 extends GraftType { val spark: DataType = ShortType }
  case object INT32 extends GraftType { val spark: DataType = IntegerType }
  case object INT64 extends GraftType { val spark: DataType = LongType }
  case object INT128 extends GraftType { val spark: DataType = DecimalType(38, 0) }
  case object UINT8 extends GraftType { val spark: DataType = ShortType }
  case object UINT16 extends GraftType { val spark: DataType = IntegerType }
  case object UINT32 extends GraftType { val spark: DataType = LongType }
  case object UINT64 extends GraftType { val spark: DataType = DecimalType(20, 0) }
  case object FLOAT extends GraftType { val spark: DataType = FloatType }
  case object DOUBLE extends GraftType { val spark: DataType = DoubleType }
  case object BOOLEAN extends GraftType { val spark: DataType = BooleanType }
  case object BLOB extends GraftType { val spark: DataType = BinaryType }
  case object DATE extends GraftType { val spark: DataType = DateType }
  case object TIMESTAMP extends GraftType { val spark: DataType = TimestampType }
  case object INTERVAL extends GraftType { val spark: DataType = DayTimeIntervalType() }
  /** UUIDv7 strings in the reference (robosystems/schemas/base.py:19-21). */
  case object UUID extends GraftType { val spark: DataType = StringType }
  final case class LIST(element: GraftType) extends GraftType {
    def spark: DataType = ArrayType(element.spark)
  }
  final case class MAP(key: GraftType, value: GraftType) extends GraftType {
    def spark: DataType = MapType(key.spark, value.spark)
  }
  final case class STRUCT(fields: Seq[(String, GraftType)]) extends GraftType {
    def spark: DataType = StructType(fields.map { case (n, t) => StructField(n, t.spark) })
  }
  /** Tagged union (SURVEY §1.3: UNION → tag + one nullable field per
    * variant — the relational encoding of a sum type; exactly one
    * variant field is non-null and `tag` names it). */
  final case class UNION(variants: Seq[(String, GraftType)]) extends GraftType {
    require(variants.nonEmpty, "UNION needs at least one variant")
    require(!variants.exists(_._1.equalsIgnoreCase("tag")),
      "UNION variant may not be named 'tag' (reserved for the discriminant)")
    // tag is semantically required, but declared nullable: Catalyst
    // refuses to CAST a nullable field onto a NOT-NULL one, which
    // would break conform() for every incoming frame
    def spark: DataType = StructType(
      StructField("tag", StringType, nullable = true) +:
        variants.map { case (n, t) => StructField(n, t.spark, nullable = true) })
  }

  /** Reference DDL spelling of a type (inverse of `parse` on the
    * names the declared schemas actually use). */
  def ddlName(t: GraftType): String = t match {
    case LIST(e) => s"${ddlName(e)}[]"
    case MAP(k, v) => s"MAP(${ddlName(k)}, ${ddlName(v)})"
    case STRUCT(fs) =>
      fs.map { case (n, ft) => s"$n ${ddlName(ft)}" }.mkString("STRUCT(", ", ", ")")
    case UNION(vs) =>
      vs.map { case (n, vt) => s"$n ${ddlName(vt)}" }.mkString("UNION(", ", ", ")")
    case other => other.toString
  }

  /** Split a parameter list on top-level commas only — `(`/`)` and
    * `<`/`>` nest (`MAP(STRING, LIST<INT64>)` is ONE value type). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    s.zipWithIndex.foreach {
      case (c, _) if c == '(' || c == '<' => depth += 1
      case (c, _) if c == ')' || c == '>' => depth -= 1
      case (',', i) if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** `name TYPE` field list for STRUCT/UNION parameters. Field-name
    * case is preserved (only the TYPE token is case-insensitive). */
  private def fieldList(inner: String, what: String): Seq[(String, GraftType)] = {
    val fs = splitTop(inner).map { f =>
      val sp = f.indexWhere(_.isWhitespace)
      require(sp > 0, s"$what field needs 'name TYPE', got: '$f'")
      (f.take(sp), parse(f.drop(sp + 1)))
    }
    require(fs.nonEmpty, s"$what needs at least one field")
    require(fs.map(_._1).distinct.length == fs.length,
      s"duplicate field names in $what(${inner.trim})")
    fs
  }

  /** Parse a reference type name (schemas/custom.py:53-78 VALID_TYPES,
    * including the composite spellings `LIST<T>`/`T[]`, `MAP(K, V)`,
    * `STRUCT(name T, …)` and `UNION(name T, …)` — the parameterized
    * forms the reference's engine DDL uses; an unparameterized
    * composite token has no column type and is rejected with the
    * spelling to use). `NODE`/`REL` appear in the reference's
    * VALID_TYPES set but are table types — as a PROPERTY type they are
    * rejected loudly here rather than producing an unusable column. */
  def parse(name: String): GraftType = {
    val s = name.trim
    val up = s.toUpperCase
    def inner(prefix: Int): String = {
      require(up.endsWith(")") || up.endsWith(">"),
        s"unterminated type parameters in: $s")
      s.substring(prefix, s.length - 1)
    }
    if (up.endsWith("[]")) LIST(parse(s.dropRight(2)))
    else if (up.startsWith("LIST<") && up.endsWith(">")) LIST(parse(inner(5)))
    else if (up.startsWith("MAP(")) {
      val parts = splitTop(inner(4))
      require(parts.length == 2, s"MAP needs exactly (key, value) types, got: $s")
      MAP(parse(parts(0)), parse(parts(1)))
    }
    else if (up.startsWith("STRUCT(")) STRUCT(fieldList(inner(7), "STRUCT"))
    else if (up.startsWith("UNION(")) UNION(fieldList(inner(6), "UNION"))
    else up match {
      case "STRING" | "VARCHAR" | "TEXT" => STRING
      case "INT8" => INT8
      case "INT16" => INT16
      case "INT32" | "INT" => INT32
      case "INT64" | "LONG" => INT64
      case "INT128" => INT128
      case "UINT8" => UINT8
      case "UINT16" => UINT16
      case "UINT32" => UINT32
      case "UINT64" => UINT64
      case "FLOAT" | "REAL" => FLOAT
      case "DOUBLE" => DOUBLE
      case "BOOLEAN" | "BOOL" => BOOLEAN
      case "BLOB" | "BYTES" => BLOB
      case "DATE" => DATE
      case "TIMESTAMP" => TIMESTAMP
      case "INTERVAL" => INTERVAL
      case "UUID" => UUID
      case "NODE" | "REL" =>
        throw new IllegalArgumentException(
          s"$up is a table type, not a property type — declare a node " +
            "label or relationship instead (schemas/custom.py lists it " +
            "in VALID_TYPES but no column can carry it)")
      case "LIST" | "MAP" | "STRUCT" | "UNION" =>
        throw new IllegalArgumentException(
          s"$up needs type parameters — e.g. LIST<STRING>, MAP(STRING, " +
            "INT64), STRUCT(a INT64, b STRING), UNION(i INT64, s STRING)")
      case other => throw new IllegalArgumentException(s"unknown graph type: $other")
    }
  }
}

/** One declared column (robosystems/schemas/models.py:11). */
final case class Property(
    name: String,
    tpe: GraftType,
    isPrimaryKey: Boolean = false,
    nullable: Boolean = true) {
  def field: StructField = StructField(name, tpe.spark, nullable && !isPrimaryKey)
  /** `name TYPE` (models.py:19 Property.to_cypher). */
  def ddl: String = s"$name ${GraftType.ddlName(tpe)}"
}

/** A node label = one table (models.py:26). */
final case class NodeDef(name: String, properties: Seq[Property]) {
  require(properties.exists(_.isPrimaryKey), s"node $name needs a primary key")
  def primaryKey: String = properties.find(_.isPrimaryKey).get.name
  def structType: StructType = StructType(properties.map(_.field))
  /** `CREATE NODE TABLE IF NOT EXISTS …(props, PRIMARY KEY(pk))`
    * (models.py:33 Node.to_cypher, safe_mode default). */
  def ddl(safeMode: Boolean = true): String = {
    val props = properties.map(_.ddl).mkString(",\n        ")
    val pks = properties.filter(_.isPrimaryKey).map(_.name).mkString(", ")
    val exists = if (safeMode) "IF NOT EXISTS " else ""
    s"CREATE NODE TABLE $exists$name(\n        $props,\n        PRIMARY KEY($pks)\n    )"
  }
}

/** A relationship type = one table with src, dst, then properties
  * (models.py:67; src/dst contract at
  * robosystems/graph_api/core/duckdb/manager.py:124-135). */
final case class RelDef(
    name: String,
    from: String,
    to: String,
    properties: Seq[Property] = Seq.empty) {
  def structType: StructType = StructType(
    StructField("src", StringType, nullable = false) +:
      StructField("dst", StringType, nullable = false) +:
      properties.map(_.field))
  /** `CREATE REL TABLE IF NOT EXISTS …(FROM a TO b, props)`
    * (models.py:76 Relationship.to_cypher). */
  def ddl(safeMode: Boolean = true): String = {
    val props =
      if (properties.isEmpty) ""
      else ",\n        " + properties.map(_.ddl).mkString(",\n        ")
    val exists = if (safeMode) "IF NOT EXISTS " else ""
    s"CREATE REL TABLE $exists$name(FROM $from TO $to$props)"
  }
}

/** Named, versioned schema collection (models.py:104). Extensions
  * compose by concatenation (robosystems/schemas/manager.py:52). */
final case class GraphSchema(
    name: String,
    version: String,
    nodes: Seq[NodeDef],
    rels: Seq[RelDef]) {

  lazy val nodeByName: Map[String, NodeDef] = nodes.map(n => n.name -> n).toMap
  lazy val relByName: Map[String, RelDef] = rels.map(r => r.name -> r).toMap

  def node(label: String): NodeDef =
    nodeByName.getOrElse(label, throw new NoSuchElementException(s"node table $label"))
  def rel(tpe: String): RelDef =
    relByName.getOrElse(tpe, throw new NoSuchElementException(s"rel table $tpe"))

  /** Compose an extension onto this schema (later defs win on clash). */
  def extend(ext: GraphSchema): GraphSchema = GraphSchema(
    s"$name+${ext.name}", version,
    (nodes.filterNot(n => ext.nodeByName.contains(n.name)) ++ ext.nodes),
    (rels.filterNot(r => ext.relByName.contains(r.name)) ++ ext.rels))

  /** Validate relationship endpoints refer to declared node tables
    * (robosystems/schemas/loader.py:181-279 validation). */
  def validate(): Seq[String] = {
    val labels = nodeByName.keySet
    rels.flatMap { r =>
      Seq(
        Option.unless(labels.contains(r.from))(s"rel ${r.name}: unknown from-node ${r.from}"),
        Option.unless(labels.contains(r.to))(s"rel ${r.name}: unknown to-node ${r.to}")
      ).flatten
    }
  }
}
