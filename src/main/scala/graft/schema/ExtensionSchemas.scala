package graft.schema

import GraftType._

/** The six schema extensions beyond roboledger, ported 1:1 from the
  * reference's declarative extension modules
  * (robosystems/schemas/extensions/{roboinvestor,robofo,robohrm,
  * roboepm,roboscm,roboreport}.py — each an EXTENSION_NODES /
  * EXTENSION_RELATIONSHIPS pair of literals). Property names, declared
  * types, and rel endpoints follow the reference exactly, including its
  * quirks:
  *
  *  - these extensions key nodes on `id` (not the base schema's
  *    `identifier`, base.py:19);
  *  - several relationships reference a `User` node that NO schema
  *    module declares (e.g. roboinvestor.py:242, robofo.py:393,
  *    robohrm.py:217, roboepm.py:283, roboreport.py:256) — the
  *    reference concatenates without endpoint validation
  *    (manager.py:113-127), so the dangling endpoint is faithful;
  *    `GraphSchema.validate()` surfaces it;
  *  - robohrm and roboreport lean on robofo's Contact/Address/Document
  *    tables (robohrm.py EMPLOYEE_HAS_CONTACT, roboreport.py
  *    DOCUMENT_SUPPORTS_FILING) — cross-extension dependencies resolved
  *    only when both extensions are selected, again faithful;
  *  - robofo and roboscm BOTH declare Contact and Address with
  *    different columns; the reference would create whichever loads
  *    second (concatenation), our `extend` is explicit later-wins.
  */
private[schema] object ExtDsl {
  def pk = Property("id", STRING, isPrimaryKey = true)
  def s(n: String) = Property(n, STRING)
  def b(n: String) = Property(n, BOOLEAN)
  def d(n: String) = Property(n, DOUBLE)
  def i(n: String) = Property(n, INT64)
  def dt(n: String) = Property(n, DATE)
  def ts(n: String) = Property(n, TIMESTAMP)
}

/** Portfolio / securities analytics (roboinvestor.py:12-250). */
object RoboinvestorSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("Portfolio", Seq(
      pk, s("name"), s("strategy"), s("risk_level"), dt("inception_date"),
      d("total_value"))),
    NodeDef("Security", Seq(
      pk, s("identifier"), s("uri"), s("name"), s("ticker"), s("figi"),
      s("composite_figi"), s("security_type"), s("security_type2"),
      s("security_description"), s("market_sector"), s("share_class_figi"),
      s("exchange_code"), s("updated_at"))),
    NodeDef("Position", Seq(
      pk, d("quantity"), d("avg_cost_basis"), d("current_price"),
      d("market_value"), d("unrealized_gain_loss"), dt("position_date"))),
    NodeDef("Trade", Seq(
      pk, s("trade_type"), d("quantity"), d("price"), d("commission"),
      d("total_amount"), dt("trade_date"), dt("settlement_date"))),
    NodeDef("Benchmark", Seq(pk, s("symbol"), s("name"), s("description"))),
    NodeDef("MarketData", Seq(
      pk, dt("date"), d("open_price"), d("high_price"), d("low_price"),
      d("close_price"), i("volume"), d("adjusted_close"))),
    NodeDef("Dividend", Seq(
      pk, dt("ex_date"), dt("record_date"), dt("payment_date"),
      d("amount_per_share"), s("dividend_type"), s("currency"))),
    NodeDef("Risk", Seq(
      pk, s("risk_type"), s("risk_level"), d("beta"), d("volatility"),
      d("value_at_risk"), dt("assessment_date"), s("notes"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_ISSUES_SECURITY", "Entity", "Security",
      Seq(s("issue_date"), s("security_context"))),
    RelDef("ENTITY_HAS_PORTFOLIO", "Entity", "Portfolio", Seq(s("portfolio_context"))),
    RelDef("PORTFOLIO_HAS_POSITION", "Portfolio", "Position",
      Seq(s("position_context"), d("allocation_percentage"))),
    RelDef("POSITION_IN_SECURITY", "Position", "Security", Seq(s("security_context"))),
    RelDef("PORTFOLIO_HAS_TRADE", "Portfolio", "Trade", Seq(s("trade_context"))),
    RelDef("TRADE_INVOLVES_SECURITY", "Trade", "Security", Seq(s("security_context"))),
    RelDef("PORTFOLIO_BENCHMARKED_AGAINST", "Portfolio", "Benchmark",
      Seq(d("benchmark_weight"))),
    RelDef("SECURITY_HAS_MARKET_DATA", "Security", "MarketData", Seq(s("data_source"))),
    RelDef("SECURITY_PAYS_DIVIDEND", "Security", "Dividend", Seq(s("payment_context"))),
    RelDef("PORTFOLIO_HAS_RISK", "Portfolio", "Risk", Seq(s("risk_context"))),
    RelDef("SECURITY_HAS_RISK", "Security", "Risk", Seq(s("risk_context"))),
    RelDef("TRADE_CREATES_POSITION", "Trade", "Position", Seq(s("position_impact"))),
    RelDef("USER_MANAGES_PORTFOLIO", "User", "Portfolio",
      Seq(s("management_role"), s("permission_level"))))

  val extension: GraphSchema = GraphSchema("roboinvestor", "1.0", nodes, rels)
}

/** CRM / front-office (robofo.py:12-514). */
object RobofoSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("Lead", Seq(
      pk, s("lead_source"), s("lead_status"), i("lead_score"), s("industry"),
      s("entity_size"), d("annual_revenue"), d("estimated_budget"),
      s("pain_points"), s("buying_timeline"), b("decision_maker"), s("notes"),
      s("updated_at"))),
    NodeDef("Opportunity", Seq(
      pk, s("opportunity_name"), s("stage"), d("probability"), d("amount"),
      s("currency"), dt("expected_close_date"), dt("actual_close_date"),
      s("close_reason"), s("competitor"), s("next_step"), s("notes"),
      s("created_by"), s("updated_at"))),
    NodeDef("Customer", Seq(
      pk, s("customer_number"), s("customer_type"), s("industry"),
      dt("customer_since"), dt("last_order_date"), d("total_lifetime_value"),
      d("average_order_value"), s("payment_terms"), d("credit_limit"),
      s("risk_rating"), s("notes"), s("updated_at"))),
    NodeDef("Deal", Seq(
      pk, s("deal_number"), s("deal_type"), d("deal_value"), s("currency"),
      d("margin_percentage"), d("commission_rate"), i("contract_length_months"),
      b("recurring_revenue"), dt("signed_date"), s("effective_date"),
      s("expiration_date"))),
    NodeDef("Campaign", Seq(
      pk, s("campaign_name"), s("campaign_type"), s("channel"), s("start_date"),
      s("end_date"), d("budget"), s("currency"), s("target_audience"), s("goal"),
      s("status"), s("created_by"), s("updated_at"))),
    NodeDef("Activity", Seq(
      pk, s("activity_type"), s("subject"), s("description"), s("outcome"),
      i("duration_minutes"), s("priority"), s("due_date"), s("completed_date"),
      s("created_by"), s("assigned_to"), s("updated_at"))),
    NodeDef("Pipeline", Seq(
      pk, s("pipeline_name"), s("pipeline_type"), s("stages"),
      b("default_pipeline"), b("active"))),
    NodeDef("Quote", Seq(
      pk, s("quote_number"), dt("quote_date"), s("expiration_date"),
      d("total_amount"), s("currency"), d("discount_percentage"), d("tax_amount"),
      s("status"), s("terms"), s("notes"), s("created_by"), s("updated_at"))),
    NodeDef("Contact", Seq(
      pk, s("first_name"), s("last_name"), s("full_name"), s("email"), s("phone"),
      s("mobile"), s("title"), s("contact_type"), s("status"), s("updated_at"))),
    NodeDef("Address", Seq(
      pk, s("address_line_1"), s("address_line_2"), s("city"), s("state"),
      s("postal_code"), s("country"), s("address_type"), b("is_primary"))),
    NodeDef("Document", Seq(
      pk, s("name"), s("document_type"), s("file_path"), i("file_size"),
      s("mime_type"), s("checksum"), s("version"), s("status"), s("updated_at"))),
    NodeDef("Event", Seq(
      pk, s("event_type"), s("title"), s("description"), s("event_date"),
      i("duration_minutes"), s("status"), s("created_by"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("LEAD_HAS_CONTACT", "Lead", "Contact", Seq(s("contact_role"))),
    RelDef("LEAD_CONVERTS_TO_OPPORTUNITY", "Lead", "Opportunity",
      Seq(dt("conversion_date"), s("conversion_notes"))),
    RelDef("OPPORTUNITY_HAS_CONTACT", "Opportunity", "Contact",
      Seq(s("contact_role"), s("influence_level"))),
    RelDef("OPPORTUNITY_FOR_CUSTOMER", "Opportunity", "Customer",
      Seq(s("opportunity_context"))),
    RelDef("OPPORTUNITY_BECOMES_DEAL", "Opportunity", "Deal",
      Seq(dt("conversion_date"), d("final_discount_percentage"))),
    RelDef("CUSTOMER_HAS_CONTACT", "Customer", "Contact",
      Seq(s("contact_role"), b("is_primary"))),
    RelDef("CUSTOMER_BECOMES_ENTITY", "Customer", "Entity",
      Seq(dt("promotion_date"), s("promotion_reason"))),
    RelDef("CAMPAIGN_GENERATES_LEAD", "Campaign", "Lead",
      Seq(d("attribution_percentage"))),
    RelDef("ACTIVITY_FOR_LEAD", "Activity", "Lead", Seq(s("activity_context"))),
    RelDef("ACTIVITY_FOR_OPPORTUNITY", "Activity", "Opportunity",
      Seq(s("activity_context"))),
    RelDef("ACTIVITY_FOR_CUSTOMER", "Activity", "Customer", Seq(s("activity_context"))),
    RelDef("OPPORTUNITY_IN_PIPELINE", "Opportunity", "Pipeline",
      Seq(s("current_stage"), dt("stage_entry_date"))),
    RelDef("OPPORTUNITY_HAS_QUOTE", "Opportunity", "Quote", Seq(s("quote_context"))),
    RelDef("QUOTE_FOR_CUSTOMER", "Quote", "Customer", Seq(s("quote_context"))),
    RelDef("USER_OWNS_LEAD", "User", "Lead", Seq(s("ownership_type"))),
    RelDef("USER_OWNS_OPPORTUNITY", "User", "Opportunity", Seq(s("ownership_type"))),
    RelDef("USER_MANAGES_CUSTOMER", "User", "Customer", Seq(s("management_role"))),
    RelDef("CONTACT_HAS_ADDRESS", "Contact", "Address", Seq(s("address_context"))),
    RelDef("ENTITY_HAS_ADDRESS", "Entity", "Address", Seq(s("address_context"))),
    RelDef("ENTITY_HAS_DOCUMENT", "Entity", "Document",
      Seq(s("document_context"), s("access_level"))),
    RelDef("USER_HAS_DOCUMENT", "User", "Document",
      Seq(s("document_context"), s("access_level"))),
    RelDef("CONTACT_HAS_DOCUMENT", "Contact", "Document",
      Seq(s("document_context"), s("access_level"))),
    RelDef("ENTITY_HAS_EVENT", "Entity", "Event",
      Seq(s("event_context"), s("participant_role"))),
    RelDef("USER_HAS_EVENT", "User", "Event",
      Seq(s("event_context"), s("participant_role"))),
    RelDef("CONTACT_HAS_EVENT", "Contact", "Event",
      Seq(s("event_context"), s("participant_role"))),
    RelDef("DOCUMENT_DERIVED_FROM", "Document", "Document",
      Seq(s("derivation_type"), s("derivation_date"), s("transformation_notes"))))

  val extension: GraphSchema = GraphSchema("robofo", "1.0", nodes, rels)
}

/** HR management (robohrm.py:12-385). Leans on robofo's
  * Contact/Address tables when both extensions are selected. */
object RobohrmSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("Employee", Seq(
      pk, s("employee_number"), s("first_name"), s("last_name"), s("full_name"),
      s("email"), s("phone"), s("hire_date"), s("termination_date"),
      s("employment_status"), s("employment_type"), s("work_location"),
      s("manager_id"), d("salary"), d("hourly_rate"), s("currency"),
      s("pay_frequency"), s("tax_id"), s("emergency_contact"), s("updated_at"))),
    NodeDef("Department", Seq(
      pk, s("department_code"), s("department_name"), s("description"),
      s("cost_center"), d("budget"), s("head_of_department"),
      s("parent_department_id"), b("active"), s("updated_at"))),
    NodeDef("Position", Seq(
      pk, s("position_code"), s("job_title"), s("job_description"), s("job_level"),
      s("job_family"), d("minimum_salary"), d("maximum_salary"),
      s("required_skills"), s("preferred_skills"), s("education_requirement"),
      i("experience_years"), s("reports_to_position"), b("active"), s("updated_at"))),
    NodeDef("Payroll", Seq(
      pk, s("payroll_period"), dt("pay_date"), d("gross_pay"), d("net_pay"),
      d("federal_tax"), d("state_tax"), d("social_security"), d("medicare"),
      d("insurance_deduction"), d("retirement_contribution"), d("other_deductions"),
      d("overtime_hours"), d("overtime_pay"), d("bonus"), d("commission"),
      s("currency"), dt("processed_date"), s("processed_by"))),
    NodeDef("Benefit", Seq(
      pk, s("benefit_code"), s("benefit_name"), s("benefit_type"),
      s("benefit_category"), s("provider"), s("description"), d("employee_cost"),
      d("employer_cost"), s("coverage_level"), i("waiting_period_days"),
      b("active"), s("effective_date"), s("termination_date"), s("updated_at"))),
    NodeDef("Performance", Seq(
      pk, s("review_period"), s("review_type"), s("review_date"), s("reviewer"),
      d("overall_rating"), b("goals_met"), s("strengths"),
      s("areas_for_improvement"), s("career_development_goals"),
      b("promotion_ready"), b("raise_recommended"), d("raise_percentage"),
      s("next_review_date"), s("comments"), s("employee_comments"), s("updated_at"))),
    NodeDef("Training", Seq(
      pk, s("training_code"), s("training_name"), s("training_type"),
      s("training_category"), s("provider"), d("duration_hours"), d("cost"),
      s("delivery_method"), b("completion_required"), s("certification_earned"),
      s("expiration_date"), s("updated_at"))),
    NodeDef("TimeOff", Seq(
      pk, s("time_off_type"), s("start_date"), s("end_date"), d("total_days"),
      s("approval_status"), s("approved_by"), s("approval_date"), s("reason"),
      b("paid"), d("balance_before"), d("balance_after"), s("updated_at"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("EMPLOYEE_IS_USER", "Employee", "User",
      Seq(dt("account_creation_date"), s("access_level"))),
    RelDef("EMPLOYEE_HAS_CONTACT", "Employee", "Contact",
      Seq(s("contact_relationship"), b("is_primary"))),
    RelDef("EMPLOYEE_IN_DEPARTMENT", "Employee", "Department",
      Seq(s("start_date"), s("end_date"), d("allocation_percentage"))),
    RelDef("EMPLOYEE_HAS_POSITION", "Employee", "Position",
      Seq(s("start_date"), s("end_date"), b("promotion"))),
    RelDef("EMPLOYEE_REPORTS_TO_EMPLOYEE", "Employee", "Employee",
      Seq(dt("reporting_start_date"), dt("reporting_end_date"), s("reporting_type"))),
    RelDef("EMPLOYEE_HAS_PAYROLL", "Employee", "Payroll", Seq(s("payroll_context"))),
    RelDef("EMPLOYEE_ENROLLED_IN_BENEFIT", "Employee", "Benefit",
      Seq(dt("enrollment_date"), s("effective_date"), s("termination_date"),
        s("coverage_level"), d("employee_contribution"))),
    RelDef("EMPLOYEE_HAS_PERFORMANCE", "Employee", "Performance",
      Seq(s("performance_context"))),
    RelDef("EMPLOYEE_COMPLETED_TRAINING", "Employee", "Training",
      Seq(dt("enrollment_date"), s("completion_date"), d("score"),
        s("certification_number"), s("expiration_date"))),
    RelDef("EMPLOYEE_HAS_TIME_OFF", "Employee", "TimeOff", Seq(s("time_off_context"))),
    RelDef("DEPARTMENT_HAS_POSITION", "Department", "Position",
      Seq(s("position_allocation"))),
    RelDef("ENTITY_HAS_EMPLOYEE", "Entity", "Employee", Seq(s("employment_context"))),
    RelDef("ENTITY_HAS_DEPARTMENT", "Entity", "Department", Seq(s("department_context"))),
    RelDef("ENTITY_OFFERS_BENEFIT", "Entity", "Benefit", Seq(s("benefit_context"))),
    RelDef("ENTITY_PROVIDES_TRAINING", "Entity", "Training", Seq(s("training_context"))),
    RelDef("EMPLOYEE_HAS_ADDRESS", "Employee", "Address", Seq(s("address_type"))),
    RelDef("DEPARTMENT_HAS_ADDRESS", "Department", "Address", Seq(s("address_type"))))

  val extension: GraphSchema = GraphSchema("robohrm", "1.0", nodes, rels)
}

/** Enterprise performance management (roboepm.py:12-366). */
object RoboepmSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("KPI", Seq(
      pk, s("kpi_code"), s("kpi_name"), s("description"), s("kpi_category"),
      s("measurement_unit"), s("calculation_method"), s("data_source"),
      s("frequency"), d("target_value"), d("threshold_green"),
      d("threshold_yellow"), d("threshold_red"), b("higher_is_better"),
      b("active"), s("owner"), s("updated_at"))),
    NodeDef("Budget", Seq(
      pk, s("budget_name"), s("budget_type"), s("budget_period"),
      s("budget_status"), d("total_budget"), s("currency"), s("approved_by"),
      s("approval_date"), s("effective_start_date"), s("effective_end_date"),
      i("revision_number"), s("notes"), s("created_by"), s("updated_at"))),
    NodeDef("Forecast", Seq(
      pk, s("forecast_name"), s("forecast_type"), s("forecast_method"),
      s("forecast_period"), d("forecast_value"), d("confidence_level"),
      d("variance_from_budget"), d("variance_percentage"), s("assumptions"),
      s("risk_factors"), s("forecast_date"), s("forecaster"), b("approved"),
      s("approved_by"), s("approval_date"), s("updated_at"))),
    NodeDef("Target", Seq(
      pk, s("target_name"), s("target_type"), s("target_period"),
      d("target_value"), s("measurement_unit"), d("baseline_value"),
      d("stretch_target"), d("minimum_acceptable"), d("weight"),
      dt("achievement_date"), d("actual_value"), d("achievement_percentage"),
      s("status"), s("owner"), s("updated_at"))),
    NodeDef("Metric", Seq(
      pk, dt("metric_date"), s("metric_period"), d("actual_value"),
      d("target_value"), d("variance"), d("variance_percentage"),
      s("performance_status"), s("trend"), s("data_quality"), s("notes"),
      s("measured_by"), s("measurement_date"))),
    NodeDef("Dashboard", Seq(
      pk, s("dashboard_name"), s("dashboard_type"), s("description"),
      s("layout_config"), s("refresh_frequency"), b("auto_refresh"),
      s("access_level"), s("owner"), s("viewers"), b("active"), s("updated_at"))),
    NodeDef("Scorecard", Seq(
      pk, s("scorecard_name"), s("scorecard_type"), s("scoring_method"),
      d("total_score"), d("max_possible_score"), s("performance_rating"),
      s("period"), s("owner"), s("reviewers"), s("status"), s("last_updated"),
      s("updated_at"))),
    NodeDef("Goal", Seq(
      pk, s("goal_name"), s("goal_type"), s("description"), s("priority"),
      s("start_date"), s("target_date"), s("completion_date"), s("status"),
      d("progress_percentage"), s("success_criteria"), s("obstacles"),
      s("owner"), s("updated_at"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_HAS_KPI", "Entity", "KPI",
      Seq(s("kpi_context"), dt("implementation_date"))),
    RelDef("KPI_HAS_METRIC", "KPI", "Metric", Seq(s("metric_context"))),
    RelDef("KPI_HAS_TARGET", "KPI", "Target", Seq(s("target_context"))),
    RelDef("ENTITY_HAS_BUDGET", "Entity", "Budget", Seq(s("budget_context"))),
    RelDef("BUDGET_HAS_FORECAST", "Budget", "Forecast",
      Seq(s("forecast_context"), s("variance_analysis"))),
    RelDef("DASHBOARD_DISPLAYS_KPI", "Dashboard", "KPI",
      Seq(s("widget_config"), i("display_order"))),
    RelDef("SCORECARD_INCLUDES_KPI", "Scorecard", "KPI",
      Seq(d("weight"), d("score"), s("performance_rating"))),
    RelDef("USER_OWNS_KPI", "User", "KPI",
      Seq(s("ownership_start_date"), s("ownership_end_date"),
        s("responsibility_level"))),
    RelDef("USER_OWNS_DASHBOARD", "User", "Dashboard", Seq(s("ownership_type"))),
    RelDef("GOAL_SUPPORTS_KPI", "Goal", "KPI", Seq(d("contribution_weight"))),
    RelDef("GOAL_HAS_TARGET", "Goal", "Target", Seq(s("target_alignment"))),
    RelDef("PERIOD_FOR_BUDGET", "Period", "Budget", Seq(s("budget_period_context"))),
    RelDef("PERIOD_FOR_FORECAST", "Period", "Forecast",
      Seq(s("forecast_period_context"))),
    RelDef("PERIOD_FOR_METRIC", "Period", "Metric",
      Seq(s("measurement_period_context"))),
    RelDef("ENTITY_HAS_GOAL", "Entity", "Goal", Seq(s("goal_context"))),
    RelDef("SCORECARD_TRACKS_GOAL", "Scorecard", "Goal", Seq(s("tracking_context"))))

  val extension: GraphSchema = GraphSchema("roboepm", "1.0", nodes, rels)
}

/** Supply chain management (roboscm.py:12-348). Declares its OWN
  * Contact/Address shapes, different columns from robofo's. */
object RoboscmSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("Supplier", Seq(
      pk, s("supplier_code"), s("name"), d("rating"), s("certification"),
      s("payment_terms"), s("currency"), s("status"), s("updated_at"))),
    NodeDef("Product", Seq(
      pk, s("sku"), s("name"), s("description"), s("category"), s("subcategory"),
      s("unit_of_measure"), d("unit_cost"), d("list_price"), d("weight"),
      s("dimensions"), b("hazmat"), i("shelf_life_days"), s("updated_at"))),
    NodeDef("Warehouse", Seq(
      pk, s("warehouse_code"), s("name"), s("warehouse_type"),
      d("capacity_cubic_feet"), b("temperature_controlled"), s("status"))),
    NodeDef("Inventory", Seq(
      pk, i("quantity_on_hand"), i("quantity_available"), i("quantity_reserved"),
      i("reorder_level"), i("max_stock_level"), i("safety_stock"),
      d("average_cost"), dt("last_count_date"), ts("last_updated"))),
    NodeDef("PurchaseOrder", Seq(
      pk, s("po_number"), dt("order_date"), dt("requested_delivery_date"),
      dt("expected_delivery_date"), d("total_amount"), s("currency"), s("status"),
      s("terms"), s("notes"), s("created_by"), s("updated_at"))),
    NodeDef("Contract", Seq(
      pk, s("contract_number"), s("contract_type"), dt("start_date"),
      dt("end_date"), d("total_value"), s("currency"), b("auto_renew"),
      s("status"), s("terms"), s("updated_at"))),
    NodeDef("Shipment", Seq(
      pk, s("tracking_number"), s("carrier"), s("service_level"),
      s("origin_address"), s("destination_address"), dt("ship_date"),
      s("expected_delivery"), s("actual_delivery"), d("shipping_cost"),
      d("weight"), s("status"), s("updated_at"))),
    NodeDef("Demand", Seq(
      pk, s("demand_type"), d("quantity"), dt("demand_date"), s("priority"),
      s("source"), d("confidence_level"), s("notes"))),
    NodeDef("Contact", Seq(
      pk, s("name"), s("title"), s("email"), s("phone"), s("mobile"),
      s("department"), b("is_primary"), s("created_at"), s("updated_at"))),
    NodeDef("Address", Seq(
      pk, s("address_type"), s("street1"), s("street2"), s("city"), s("state"),
      s("postal_code"), s("country"), d("latitude"), d("longitude"),
      b("is_primary"), s("created_at"), s("updated_at"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_HAS_SUPPLIER", "Entity", "Supplier",
      Seq(s("relationship_type"), b("preferred_supplier"))),
    RelDef("SUPPLIER_HAS_CONTACT", "Supplier", "Contact",
      Seq(s("contact_role"), b("is_primary"))),
    RelDef("SUPPLIER_HAS_ADDRESS", "Supplier", "Address", Seq(s("address_role"))),
    RelDef("SUPPLIER_PROVIDES_PRODUCT", "Supplier", "Product",
      Seq(i("lead_time_days"), i("minimum_order_quantity"),
        s("supplier_part_number"), d("unit_price"), dt("effective_date"),
        dt("expiration_date"))),
    RelDef("ENTITY_HAS_WAREHOUSE", "Entity", "Warehouse", Seq(s("warehouse_role"))),
    RelDef("WAREHOUSE_HAS_INVENTORY", "Warehouse", "Inventory",
      Seq(s("location_code"))),
    RelDef("INVENTORY_OF_PRODUCT", "Inventory", "Product",
      Seq(s("lot_number"), dt("expiration_date"))),
    RelDef("ENTITY_HAS_PURCHASE_ORDER", "Entity", "PurchaseOrder",
      Seq(s("order_context"))),
    RelDef("PURCHASE_ORDER_TO_SUPPLIER", "PurchaseOrder", "Supplier",
      Seq(dt("supplier_acknowledgment_date"))),
    RelDef("PURCHASE_ORDER_CONTAINS_PRODUCT", "PurchaseOrder", "Product",
      Seq(i("quantity_ordered"), d("unit_price"), d("line_total"),
        i("quantity_received"))),
    RelDef("ENTITY_HAS_CONTRACT", "Entity", "Contract", Seq(s("contract_role"))),
    RelDef("CONTRACT_WITH_SUPPLIER", "Contract", "Supplier", Seq(s("contract_role"))),
    RelDef("SHIPMENT_FOR_PURCHASE_ORDER", "Shipment", "PurchaseOrder",
      Seq(s("shipment_type"))),
    RelDef("SHIPMENT_CONTAINS_PRODUCT", "Shipment", "Product",
      Seq(i("quantity_shipped"))),
    RelDef("PRODUCT_HAS_DEMAND", "Product", "Demand", Seq(s("demand_context"))),
    RelDef("WAREHOUSE_HAS_ADDRESS", "Warehouse", "Address", Seq(s("address_type"))))

  val extension: GraphSchema = GraphSchema("roboscm", "1.0", nodes, rels)
}

/** Regulatory reporting (roboreport.py:12-313). Leans on robofo's
  * Contact/Document tables when both extensions are selected. */
object RoboreportSchema {
  import ExtDsl._

  val nodes: Seq[NodeDef] = Seq(
    NodeDef("Regulation", Seq(
      pk, s("regulation_code"), s("regulation_name"), s("regulatory_body"),
      s("description"), s("frequency"), b("mandatory"), s("effective_date"),
      dt("sunset_date"), d("penalty_amount"), s("updated_at"))),
    NodeDef("Filing", Seq(
      pk, s("filing_number"), s("filing_type"), s("filing_status"),
      s("filing_period"), s("due_date"), s("submitted_date"), s("accepted_date"),
      s("confirmation_number"), d("filing_fee"), s("currency"), s("priority"),
      s("notes"), s("created_by"), s("updated_at"))),
    NodeDef("Submission", Seq(
      pk, s("submission_id"), s("submission_method"), ts("submission_date"),
      b("acknowledgment_received"), ts("acknowledgment_date"),
      s("processing_status"), s("review_comments"), b("resubmission_required"),
      s("final_status"), s("updated_at"))),
    NodeDef("Deadline", Seq(
      pk, s("deadline_type"), s("deadline_date"), s("reminder_date"),
      b("reminder_sent"), s("extended_deadline"), s("extension_reason"),
      s("status"), s("impact_level"), s("updated_at"))),
    NodeDef("Compliance", Seq(
      pk, s("compliance_area"), s("compliance_status"), s("assessment_date"),
      s("next_assessment_date"), s("risk_level"), b("remediation_required"),
      s("remediation_deadline"), d("compliance_score"), s("notes"),
      s("assessed_by"), s("updated_at"))),
    NodeDef("Review", Seq(
      pk, s("review_type"), s("review_status"), s("reviewer"), s("review_date"),
      s("completed_date"), s("findings"), s("recommendations"),
      b("action_required"), s("follow_up_date"), s("approval_level"),
      s("updated_at"))),
    NodeDef("Approval", Seq(
      pk, s("approval_type"), s("approval_status"), s("approver"),
      s("approval_date"), s("conditions"), s("expiration_date"),
      s("approval_notes"), b("escalation_required"), s("escalation_level"),
      s("updated_at"))),
    NodeDef("RegulatoryContact", Seq(
      pk, s("agency"), s("department"), s("role"), s("specialization"),
      s("preferred_contact_method"), i("response_time_days"), s("notes"),
      s("updated_at"))))

  val rels: Seq[RelDef] = Seq(
    RelDef("ENTITY_SUBJECT_TO_REGULATION", "Entity", "Regulation",
      Seq(s("applicability_start_date"), s("applicability_end_date"),
        s("exemption_status"))),
    RelDef("REGULATION_REQUIRES_FILING", "Regulation", "Filing",
      Seq(s("filing_context"))),
    RelDef("FILING_HAS_SUBMISSION", "Filing", "Submission",
      Seq(i("submission_attempt"))),
    RelDef("FILING_HAS_DEADLINE", "Filing", "Deadline", Seq(s("deadline_context"))),
    RelDef("FILING_REQUIRES_REVIEW", "Filing", "Review",
      Seq(s("review_context"), b("mandatory_review"))),
    RelDef("REVIEW_REQUIRES_APPROVAL", "Review", "Approval",
      Seq(s("approval_context"))),
    RelDef("ENTITY_HAS_COMPLIANCE", "Entity", "Compliance",
      Seq(s("compliance_context"))),
    RelDef("COMPLIANCE_BASED_ON_REGULATION", "Compliance", "Regulation",
      Seq(s("assessment_scope"))),
    RelDef("USER_REVIEWS_FILING", "User", "Filing",
      Seq(s("review_role"), s("responsibility_level"))),
    RelDef("CONTACT_IS_REGULATORY_CONTACT", "Contact", "RegulatoryContact",
      Seq(s("contact_context"))),
    RelDef("FILING_COMMUNICATES_WITH_CONTACT", "Filing", "RegulatoryContact",
      Seq(s("communication_type"), s("communication_date"))),
    RelDef("DOCUMENT_SUPPORTS_FILING", "Document", "Filing",
      Seq(s("document_role"), b("required"))),
    RelDef("DEADLINE_FOR_COMPLIANCE", "Deadline", "Compliance",
      Seq(s("compliance_context"))),
    RelDef("SUBMISSION_RECEIVES_REVIEW", "Submission", "Review",
      Seq(s("review_stage"))))

  val extension: GraphSchema = GraphSchema("roboreport", "1.0", nodes, rels)
}

/** Name → extension registry + base-plus-extensions composer, the
  * Scala face of the reference's SchemaManager
  * (robosystems/schemas/manager.py:17-27 SchemaType,
  * manager.py:80-135 load_and_compile_schema: start from base, then
  * concatenate each named extension's nodes/relationships). */
object SchemaExtensions {

  val byName: Map[String, GraphSchema] = Map(
    "roboledger" -> RoboledgerSchema.extension,
    "roboinvestor" -> RoboinvestorSchema.extension,
    "robofo" -> RobofoSchema.extension,
    "robohrm" -> RobohrmSchema.extension,
    "roboepm" -> RoboepmSchema.extension,
    "roboscm" -> RoboscmSchema.extension,
    "roboreport" -> RoboreportSchema.extension)

  val names: Seq[String] = Seq(
    "roboledger", "roboinvestor", "robofo", "robohrm", "roboepm",
    "roboscm", "roboreport")

  def extension(name: String): GraphSchema =
    byName.getOrElse(name.trim.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown schema extension '$name' (available: ${names.mkString(", ")})"))

  /** Compile base + named extensions in the order given, like
    * manager.py:113-127 (later extensions win on table-name clash —
    * the reference concatenates, which in Kuzu means the first CREATE
    * wins and later IF NOT EXISTS are no-ops; `extend`'s later-wins is
    * the explicit version of the same single-table outcome). */
  def resolve(extensions: Seq[String]): GraphSchema =
    extensions.foldLeft(BaseSchema.schema)((acc, n) => acc.extend(extension(n)))
}
