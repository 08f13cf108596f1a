package graft.schema

import GraftType._

/** The fixed base schema shared by every graph: 7 node tables + 7
  * relationship tables (robosystems/schemas/base.py:13 BASE_NODES,
  * base.py:158 BASE_RELATIONSHIPS). Property lists follow the
  * reference's declarations; every node table's primary key is the
  * STRING `identifier` (base.py:19). */
object BaseSchema {

  private def pk = Property("identifier", STRING, isPrimaryKey = true)
  private def s(n: String) = Property(n, STRING)
  private def b(n: String) = Property(n, BOOLEAN)

  val Entity: NodeDef = NodeDef("Entity", Seq(
    pk, s("uri"), s("scheme"), s("cik"), s("ticker"), s("exchange"),
    s("name"), s("legal_name"), s("industry"), s("entity_type"),
    s("sic"), s("sic_description"), s("category"),
    s("state_of_incorporation"), s("fiscal_year_end"), s("ein"),
    s("tax_id"), s("lei"), s("phone"), s("website"), s("status"),
    b("is_parent"), s("parent_entity_id"), s("created_at"), s("updated_at")))

  /** Dates deliberately STRING (ISO-8601, compared lexicographically —
    * robosystems/operations/views/trial_balance.py:40-41). */
  val Period: NodeDef = NodeDef("Period", Seq(
    pk, s("uri"), s("instant_date"), s("start_date"), s("end_date"),
    b("forever_date"), Property("fiscal_year", INT32), s("fiscal_quarter"),
    b("is_annual"), b("is_quarterly"), Property("days_in_period", INT32),
    s("period_type"), b("is_ytd")))

  val Unit: NodeDef = NodeDef("Unit", Seq(
    pk, s("uri"), s("measure"), s("value"),
    s("numerator_uri"), s("denominator_uri")))

  val Element: NodeDef = NodeDef("Element", Seq(
    pk, s("uri"), s("qname"), s("name"), s("period_type"), s("type"),
    s("balance"), b("is_abstract"), b("is_dimension_item"),
    b("is_domain_member"), b("is_hypercube_item"), b("is_integer"),
    b("is_numeric"), b("is_shares"), b("is_fraction"), b("is_textblock"),
    s("substitution_group"), s("item_type"), s("classification")))

  val Label: NodeDef = NodeDef("Label", Seq(pk, s("value"), s("type"), s("language")))

  val Reference: NodeDef = NodeDef("Reference", Seq(pk, s("value"), s("type")))

  val Taxonomy: NodeDef = NodeDef("Taxonomy", Seq(
    pk, s("uri"), s("name"), s("version"), s("namespace"), s("description")))

  val nodes: Seq[NodeDef] =
    Seq(Entity, Period, Unit, Element, Label, Reference, Taxonomy)

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_EVOLVED_FROM", "Entity", "Entity",
      Seq(s("evolution_type"), s("evolution_date"), s("notes"), s("created_at"))),
    RelDef("ENTITY_OWNS_ENTITY", "Entity", "Entity"),
    RelDef("ELEMENT_HAS_LABEL", "Element", "Label"),
    RelDef("ELEMENT_HAS_REFERENCE", "Element", "Reference"),
    RelDef("ELEMENT_IN_TAXONOMY", "Element", "Taxonomy"),
    RelDef("TAXONOMY_HAS_LABEL", "Taxonomy", "Label"),
    RelDef("TAXONOMY_HAS_REFERENCE", "Taxonomy", "Reference"))

  val schema: GraphSchema = GraphSchema("base", "1.0", nodes, rels)
}

/** The roboledger extension: XBRL + accounting tables
  * (robosystems/schemas/extensions/roboledger.py:44-345). */
object RoboledgerSchema {
  import BaseSchema.{schema => base}

  private def pk = Property("identifier", STRING, isPrimaryKey = true)
  private def s(n: String) = Property(n, STRING)
  private def b(n: String) = Property(n, BOOLEAN)
  private def d(n: String) = Property(n, DOUBLE)

  val Report: NodeDef = NodeDef("Report", Seq(
    pk, s("uri"), s("name"), s("accession_number"), s("form"),
    s("filing_date"), s("report_date"), s("acceptance_date"),
    s("period_end_date"), b("is_inline_xbrl"),
    s("xbrl_processor_version"), b("processed"), b("failed"), s("updated_at")))

  val Fact: NodeDef = NodeDef("Fact", Seq(
    pk, s("uri"), s("value"), d("numeric_value"), s("fact_type"),
    s("decimals"), s("value_type"), s("content_type")))

  val Structure: NodeDef = NodeDef("Structure", Seq(
    pk, s("uri"), s("network_uri"), s("definition"), s("number"),
    s("type"), s("name")))

  val FactDimension: NodeDef = NodeDef("FactDimension", Seq(
    pk, s("axis_uri"), s("member_uri"), s("type"),
    b("is_explicit"), b("is_typed")))

  /** `root` declared STRING though the ETL writes booleans
    * (roboledger.py:115 vs xbrl_graph.py:1460) — keep the declared type. */
  val Association: NodeDef = NodeDef("Association", Seq(
    pk, s("arcrole"), d("order_value"), s("association_type"),
    d("weight"), s("root"), s("preferred_label")))

  val FactSet: NodeDef = NodeDef("FactSet", Seq(pk))

  val Transaction: NodeDef = NodeDef("Transaction", Seq(
    pk, s("uri"), s("transaction_number"), d("amount"), s("description"),
    Property("date", GraftType.DATE), Property("transaction_date", GraftType.DATE),
    s("reference_number"), s("transaction_type"), s("type"), s("number"),
    s("sync_hash"), s("currency"), s("plaid_merchant_name"),
    s("plaid_category"), b("plaid_pending"), s("updated_at")))

  val LineItem: NodeDef = NodeDef("LineItem", Seq(
    pk, s("uri"), s("description"), d("debit_amount"), d("credit_amount"),
    s("updated_at")))

  val Process: NodeDef = NodeDef("Process", Seq(
    pk, s("name"), s("process_type"), s("description")))

  val nodes: Seq[NodeDef] = Seq(
    Report, Fact, Structure, FactDimension, Association, FactSet,
    Transaction, LineItem, Process)

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_HAS_REPORT", "Entity", "Report", Seq(s("filing_context"))),
    RelDef("REPORT_HAS_FACT", "Report", "Fact", Seq(s("fact_context"))),
    RelDef("FACT_HAS_ELEMENT", "Fact", "Element"),
    RelDef("FACT_HAS_ENTITY", "Fact", "Entity", Seq(s("entity_context"))),
    RelDef("FACT_HAS_PERIOD", "Fact", "Period", Seq(s("period_context"))),
    RelDef("FACT_HAS_UNIT", "Fact", "Unit", Seq(s("unit_context"))),
    RelDef("STRUCTURE_HAS_TAXONOMY", "Structure", "Taxonomy"),
    RelDef("FACT_HAS_DIMENSION", "Fact", "FactDimension"),
    RelDef("FACT_DIMENSION_AXIS_ELEMENT", "FactDimension", "Element"),
    RelDef("FACT_DIMENSION_MEMBER_ELEMENT", "FactDimension", "Element"),
    RelDef("FACT_SET_CONTAINS_FACT", "FactSet", "Fact"),
    RelDef("REPORT_HAS_FACT_SET", "Report", "FactSet"),
    RelDef("REPORT_USES_TAXONOMY", "Report", "Taxonomy"),
    RelDef("STRUCTURE_HAS_ASSOCIATION", "Structure", "Association"),
    RelDef("ASSOCIATION_HAS_FROM_ELEMENT", "Association", "Element"),
    RelDef("ASSOCIATION_HAS_TO_ELEMENT", "Association", "Element"),
    RelDef("ENTITY_HAS_TRANSACTION", "Entity", "Transaction", Seq(s("transaction_context"))),
    RelDef("TRANSACTION_HAS_LINE_ITEM", "Transaction", "LineItem", Seq(s("line_item_context"))),
    RelDef("LINE_ITEM_RELATES_TO_ELEMENT", "LineItem", "Element", Seq(s("mapping_context"))))

  val extension: GraphSchema = GraphSchema("roboledger", "1.0", nodes, rels)

  /** base + roboledger, the shape every financial graph uses. */
  val schema: GraphSchema = base.extend(extension)
}
