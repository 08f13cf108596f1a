package graft.fixtures

import org.apache.spark.sql.SparkSession
import graft.schema.RoboledgerSchema
import graft.storage.GraphStore

/** Deterministic SEC/XBRL fixture (FIXTURES.md §2): 2 entities, 4
  * reports, ~600 facts over 25 elements × 8 periods × 2 units, ~10%
  * dimensioned; one presentation + one calculation Structure with ±1.0
  * weighted Associations. Invariant from the reference ETL:
  * numeric_value = raw × 10^decimals
  * (robosystems/adapters/sec/processors/xbrl_graph.py:575-583). */
object SecFixture {

  def ingest(spark: SparkSession, root: String, graphId: String = "sec"): GraphStore = {
    import spark.implicits._
    val store = new GraphStore(spark, root, graphId, RoboledgerSchema.schema)

    store.ingestNodes("Entity", Seq(
      ("ent_apple", "0000320193", "AAPL", "Apple Inc.", "active"),
      ("ent_msft", "0000789019", "MSFT", "Microsoft Corp.", "active"))
      .toDF("identifier", "cik", "ticker", "name", "status"), Some("sec0"))

    val elements = (0 until 25).map { i =>
      val cls = Seq("asset", "liability", "equity", "revenue", "expense")(i % 5)
      val bal = if (cls == "asset" || cls == "expense") "debit" else "credit"
      (s"elem_$i", s"us-gaap:Elem$i", s"Element $i", cls, bal,
        if (i % 7 == 0) "instant" else "duration", i % 4 != 0)
    }
    store.ingestNodes("Element",
      elements.toDF("identifier", "qname", "name", "classification",
        "balance", "period_type", "is_numeric"), Some("sec0"))

    val periods = (0 until 8).map { q =>
      val year = 2023 + q / 4
      val qn = q % 4 + 1
      val start = f"$year-${qn * 3 - 2}%02d-01"
      val end = f"$year-${qn * 3}%02d-28"
      (s"per_${year}q$qn", start, end, year, s"Q$qn", qn == 4, true, "duration")
    }
    store.ingestNodes("Period",
      periods.toDF("identifier", "start_date", "end_date", "fiscal_year",
        "fiscal_quarter", "is_annual", "is_quarterly", "period_type"), Some("sec0"))

    store.ingestNodes("Unit", Seq(
      ("unit_usd", "iso4217:USD", "USD"),
      ("unit_shares", "xbrli:shares", "shares"))
      .toDF("identifier", "measure", "value"), Some("sec0"))

    val reports = Seq(
      ("rep_a_10k", "ent_apple", "10-K", "2023-12-31"),
      ("rep_a_10q", "ent_apple", "10-Q", "2024-03-31"),
      ("rep_m_10k", "ent_msft", "10-K", "2023-12-31"),
      ("rep_m_10q", "ent_msft", "10-Q", "2024-03-31"))
    store.ingestNodes("Report",
      reports.map(r => (r._1, r._3, r._4, true, true))
        .toDF("identifier", "form", "period_end_date", "is_inline_xbrl", "processed"),
      Some("sec0"))
    store.ingestRels("ENTITY_HAS_REPORT",
      reports.map(r => (r._2, r._1)).toDF("from", "to"), Some("sec0"))

    // facts: element × period per entity; deterministic values with the
    // decimals-scaling invariant
    case class F(id: String, raw: Double, decimals: Int, elem: String,
        per: String, unit: String, ent: String, rep: String, dim: Boolean)
    val facts = for {
      (rep, ent, _, _) <- reports.map(r => (r._1, r._2, r._3, r._4))
      ei <- 0 until 25
      qi <- 0 until 4
    } yield {
      val per = periods((if (rep.endsWith("10q")) 4 else 0) + qi)._1
      val raw = ((ei * 31 + qi * 7 + ent.length) % 900 + 100).toDouble
      val dec = Seq(-3, 0, 3)(ei % 3)
      F(s"fact_${rep}_${ei}_$qi", raw, dec, s"elem_$ei", per,
        if (ei % 5 == 0) "unit_shares" else "unit_usd",
        ent, rep, dim = ei % 10 == 0)
    }
    store.ingestNodes("Fact", facts.map(f =>
      (f.id, f.raw.toString, f.raw * math.pow(10, f.decimals), "Numeric",
        f.decimals.toString, "inline"))
      .toDF("identifier", "value", "numeric_value", "fact_type", "decimals",
        "value_type"), Some("sec0"))
    store.ingestRels("REPORT_HAS_FACT",
      facts.map(f => (f.rep, f.id)).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_HAS_ELEMENT",
      facts.map(f => (f.id, f.elem)).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_HAS_PERIOD",
      facts.map(f => (f.id, f.per)).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_HAS_UNIT",
      facts.map(f => (f.id, f.unit)).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_HAS_ENTITY",
      facts.map(f => (f.id, f.ent)).toDF("from", "to"), Some("sec0"))

    // ~10% dimensioned facts: one FactDimension each, axis/member elements
    val dims = facts.filter(_.dim).map(f =>
      (s"fd_${f.id}", "us-gaap:SegmentAxis", "us-gaap:AmericasMember", true, false))
    store.ingestNodes("FactDimension",
      dims.toDF("identifier", "axis_uri", "member_uri", "is_explicit", "is_typed"),
      Some("sec0"))
    store.ingestRels("FACT_HAS_DIMENSION",
      facts.filter(_.dim).map(f => (f.id, s"fd_${f.id}")).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_DIMENSION_AXIS_ELEMENT",
      facts.filter(_.dim).map(f => (s"fd_${f.id}", "elem_1")).toDF("from", "to"), Some("sec0"))
    store.ingestRels("FACT_DIMENSION_MEMBER_ELEMENT",
      facts.filter(_.dim).map(f => (s"fd_${f.id}", "elem_2")).toDF("from", "to"), Some("sec0"))

    // presentation + calculation structures with weighted associations
    store.ingestNodes("Structure", Seq(
      ("struct_pres", "presentation", "Balance Sheet"),
      ("struct_calc", "calculation", "Income Statement"))
      .toDF("identifier", "type", "name"), Some("sec0"))
    val assocs = (1 until 10).map { i =>
      (s"assoc_$i", "parent-child", i.toDouble,
        if (i % 2 == 0) 1.0 else -1.0, "false")
    }
    store.ingestNodes("Association",
      assocs.toDF("identifier", "association_type", "order_value", "weight", "root"),
      Some("sec0"))
    store.ingestRels("STRUCTURE_HAS_ASSOCIATION",
      assocs.map(a => (if (a._3 < 5) "struct_pres" else "struct_calc", a._1))
        .toDF("from", "to"), Some("sec0"))
    store.ingestRels("ASSOCIATION_HAS_FROM_ELEMENT",
      assocs.map(a => (a._1, "elem_0")).toDF("from", "to"), Some("sec0"))
    store.ingestRels("ASSOCIATION_HAS_TO_ELEMENT",
      assocs.zipWithIndex.map { case (a, i) => (a._1, s"elem_${i + 1}") }
        .toDF("from", "to"), Some("sec0"))

    store
  }
}
