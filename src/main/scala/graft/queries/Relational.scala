package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational coverage (SURVEY §2.5–2.6): aggregation, joins, window
  * functions, top-k, set ops, rollup, string functions.
  *
  * Float discipline for the DuckDB oracle: double sums are
  * accumulation-order-dependent, so every money aggregate is computed over
  * `DECIMAL` (exact, associative) and only cast to DOUBLE at the end —
  * bit-identical in both engines.
  *
  * Scale notes — broadcast-hint discipline (file-wide, PlanSpec-pinned):
  * explicit `broadcast()` hints appear ONLY on frames whose size is a
  * CONSTANT of the schema — `nation` (25 rows), `region` (5), and 1-row
  * scalar aggregates (q15's max, q22's mean, q11's threshold). Frames
  * derived from `customer`/`supplier`/`part` are SF-SCALED (TPC-H
  * customer is SF×150k, supplier SF×10k rows — 10⁹–10¹⁰ rows at a
  * 100 TB SF), so they carry NO hint: the planner + AQE's runtime size
  * check auto-broadcast them at any SF where that is safe and fall back
  * to a shuffle join when they outgrow the threshold, whereas a forced
  * hint would OOM every executor at scale. The fact tables (`lineitem`,
  * `orders`, `events`) shuffle only for their join/group keys, and AQE
  * handles skew/coalescing at runtime.
  */
object Relational {

  private val CutoffDate = "1997-06-01"

  // l_extendedprice has 2 decimal digits; products with (1±x) factors have
  // ≤6 — cast to DECIMAL before summing so the aggregate is exact.
  private def decSum(c: org.apache.spark.sql.Column, scale: Int) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** TPC-H Q1-style pricing summary (hash aggregate, SURVEY R7). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice"), 2).as("sum_base_price"),
        decSum(disc, 4).as("sum_disc_price"),
        decSum(disc * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (decSum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
    * `customer` is SF-scaled, so it carries no hint (the planner
    * auto-broadcasts it wherever safe); `orders ⋈ lineitem` is the one
    * genuine shuffle, on the join key.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit(CutoffDate).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit(CutoffDate).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier revenue: 6-way join — constant-size
    * nation/region hinted, SF-scaled customer/supplier planner-sized.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q4-style order-priority check: orders in one quarter with at
    * least one LATE lineitem (shipped > 30 days after the order date —
    * the fixture's stand-in for Q4's commitdate < receiptdate, which
    * the schema doesn't carry), counted per priority. The EXISTS
    * decorrelates to a left-semi join whose condition spans both sides
    * (key equality + the late predicate) — the classic correlated-
    * subquery plan shape beside [[ordersAboveCustAvg]]'s scalar-agg
    * decorrelation. Exchanges hash on the order key only.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q14-style promo revenue share: one ship month, the SF-scaled
    * part dim planner-sized, and the PROMO fraction of discounted revenue as a
    * percentage. Both numerator and denominator go through the DECIMAL
    * sum (exact), so the single double division + round is the only
    * float step — the ratio-of-money discipline shared with
    * [[globalStats]].
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        decSum(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)), 4)
          .as("promo"),
        decSum(disc, 4).as("total"))
      .select(round(lit(100.0) * col("promo") / col("total"), 4)
        .as("promo_revenue_pct"))
  }

  /** TPC-H Q19-style disjunctive filter: OR-of-ANDs over (brand, size,
    * quantity) bands after the part join (planner-sized) — the predicate
    * shape that exercises disjunction pushdown and branch-heavy
    * codegen. One revenue row out.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(decSum(disc, 4).as("revenue"))
  }

  /** TPC-H Q13-style customer order distribution: how many customers
    * placed exactly k orders, for every k INCLUDING zero — the plan
    * shape Q13 exists to test is the outer join feeding a double
    * aggregation (per-customer count, then a histogram over the
    * counts). The priority exclusion stands in for Q13's
    * `o_comment NOT LIKE` (the fixture carries no comment column) and
    * sits on the orders side BEFORE the join, so the outer join
    * preserves customers whose every order was excluded (they count as
    * zero, exactly like Q13). Scale: one shuffle on the join/group key
    * (`custkey` — the second aggregate's key space is |distinct
    * counts|, tiny); `count(o_orderkey)` counts non-null keys only, so
    * the no-match row contributes 0, not 1.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select("o_custkey", "o_orderkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17-style small-quantity revenue: lineitems of one brand
    * whose quantity is below half that part's average quantity, summed
    * as a yearly average. Q17's correlated per-part scalar average is
    * expressed as a window aggregate over `l_partkey` rather than the
    * textbook aggregate-then-rejoin — one exchange instead of two (the
    * [[graft.queries.TextAnalysis.bigramLm]] c1 pattern), and at 100 TB
    * the per-part average table for a brand is millions of rows, so the
    * rejoin could not broadcast anyway. Float discipline: quantities
    * are integral doubles (window sum/count exact), the 0.5 multiplier
    * is exact, and revenue goes through the DECIMAL sum with one final
    * double division + round.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val brand = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#11")
      .select("p_partkey")
    val w = Window.partitionBy(col("l_partkey"))
    li.join(brand, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", sum(col("l_quantity")).over(w) / count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(decSum(col("l_extendedprice"), 2) / 7.0, 4).as("avg_yearly"))
  }

  /** TPC-H Q18-style large-volume customers: orders whose total
    * quantity across lineitems exceeds 300, with their customer, top
    * 100 by total price. The lineitem aggregate filters hard (46 of
    * 15k orders at sf0.01), so the orders join's build side is tiny at
    * runtime — left un-hinted on purpose: AQE's runtime size check is
    * the right mechanism for a data-dependent cardinality cliff,
    * where a static broadcast hint would gamble on the threshold.
    * The final top-100 is TakeOrderedAndProject (no global sort), tie
    * broken by order key.
    */
  def q18LargeVolume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q22-style dormant high-balance customers: above the
    * positive-balance average, no order since 1999, counted and summed
    * per nation (the fixture's stand-in for Q22's phone-prefix country
    * code). Plan shape: a 1-row broadcast scalar (exact DECIMAL mean),
    * then a left-anti join against the recent-orders key set — the
    * anti side is date-pruned at the scan, so the shuffle carries only
    * recent order keys, not order history. Money stays in DECIMAL
    * until the final cast.
    */
  def q22Dormant(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((decSum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), decSum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q7-style two-nation trade volume: discounted revenue per
    * (supplier nation, customer nation, ship year) for the two-way
    * trade between NATION_0 and NATION_1 — the plan shape where ONE
    * dimension table (nation) joins the fact chain in TWO ROLES, each
    * broadcast independently. The nation filters push into both
    * hinted nation sides (supplier/customer are SF-scaled —
    * planner-sized), so the five-table join prunes before the fact
    * scan's one real shuffle (lineitem ⋈ orders on the order key).
    */
  def q7TradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_0", "NATION_1")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n1 = Tables.nation(spark, dir)
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(decSum(disc, 4).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 national market share, adapted to the fixture schema (no
    * partsupp; p_type plays Q8's part filter): NATION_1's share of
    * ECONOMY-part revenue among AMERICA-region customers, per order
    * year. The widest snowflake in the surface — seven tables — and its
    * plan is the point: part/supplier/nation×2/customer/region all
    * arrive as broadcasts onto the lineitem scan, orders joins on the
    * one shuffled fact key, and numerator + denominator are a single
    * conditional DECIMAL aggregate over the same pass (never two
    * scans). Hint discipline: only the FIXED-cardinality dimensions
    * (nation ≤ 25, region ≤ 5) carry explicit broadcast hints;
    * part/supplier/customer scale with SF, so the planner (AQE runtime
    * stats) decides for them — auto-broadcast at fixture scale,
    * shuffle join when an SF-100k customer table outgrows the
    * threshold. The share divides two decimal-exact doubles, so both
    * engines divide IDENTICAL values (the q14 ratio discipline).
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir)
      .filter(col("r_name") === "AMERICA").select("r_regionkey")
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") <= lit("1996-12-31").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val part = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        decSum(when(col("supp_nation") === "NATION_1", vol).otherwise(lit(0.0)),
          4).as("nation_volume"),
        decSum(vol, 4).as("total_volume"))
      .select(col("o_year"),
        round(col("nation_volume") / col("total_volume"), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q10-style returned-item reporting: the top-20 customers by
    * revenue lost to returns in one quarter — the
    * top-k-after-aggregation shape over a selective fact filter
    * (returnflag = 'R' pushes to the scan). Nation hinted, the
    * SF-scaled customer planner-sized; TakeOrderedAndProject caps the
    * output without a global
    * sort; ties cannot occur on the DECIMAL-exact revenue sum except
    * for identical values, broken by c_custkey.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(decSum(disc, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q15-style top supplier: the argmax-over-aggregated-view
    * shape — per-supplier quarterly revenue, then the supplier(s)
    * achieving the maximum (ties KEPT, as Q15 specifies). The 1-row
    * max broadcasts back onto the revenue view; revenue is
    * DECIMAL-exact, so the equality join is exact (no float-max
    * tolerance needed).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(decSum(disc, 4).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21-style sole late supplier: suppliers who were the ONLY
    * late supplier on a multi-supplier order — the double-correlation
    * shape (EXISTS another supplier on the order, NOT EXISTS another
    * LATE supplier), decorrelated to a semi join and an anti join over
    * the same lineitem table with different conditions. Lateness is
    * the fixture convention from q4 (shipped > 30 days after the order
    * date). The LATE side is deduplicated before the joins (its rows
    * ARE the output grain — numwait counts orders, not lineitems); the
    * participants side is NOT (r21): it only ever feeds a LEFT SEMI
    * probe, whose result is duplicate-insensitive, and the distinct
    * cost a corpus-scale exchange + aggregate over the full fact table
    * before the join re-exchanged it on the correlation key anyway.
    */
  def q21SoleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val participants = li.select(col("l_orderkey").as("p_okey"),
      col("l_suppkey").as("p_skey"))
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(col("l_orderkey").as("w_okey"), col("l_suppkey").as("w_skey"))
      .distinct()
    val withOthers = late.join(participants,
      col("w_okey") === col("p_okey") && col("w_skey") =!= col("p_skey"),
      "left_semi")
    val lateOthers = late.select(col("w_okey").as("x_okey"),
      col("w_skey").as("x_skey"))
    val sole = withOthers.join(lateOthers,
      col("w_okey") === col("x_okey") && col("w_skey") =!= col("x_skey"),
      "left_anti")
    sole.join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("w_skey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(10)
  }

  /** TPC-H Q2-style minimum-cost supplier, adapted to the fixture
    * schema (no partsupp: a supplier's offer price for a part is the
    * MINIMUM l_extendedprice it ever shipped that part at — min is
    * order-independent and exact on 2-decimal doubles, so the money
    * needs no DECIMAL detour). For mid-size LARGE parts, the
    * supplier(s) in one region achieving the per-part minimum, ties
    * KEPT as Q2 specifies. The correlated-min subquery decorrelates
    * the textbook way — aggregate per (part, supplier), re-aggregate
    * per part, join back on (part, min-cost) — NOT q17's single-window
    * trick, because the two aggregates differ in grain and the
    * decorrelated form is the plan shape Q2 exists to test. Scale: the
    * per-part min frame is |parts|-sized and grows with SF, so the
    * equality join back is a shuffle join on (p_partkey, cost); the
    * offers subtree feeds BOTH join sides, and at runtime AQE's
    * exchange reuse computes it once — the executed plan carries one
    * lineitem scan + a ReusedExchange (PlanSpec pins this; a second
    * fact scan at 100 TB would double the dominant cost).
    * Supplier/nation/region fold into one region-supplier dim; only
    * the CONSTANT-size nation/region sides carry broadcast hints — the
    * supplier- and part-derived frames are SF-scaled, so the planner
    * (AQE at runtime) decides whether they broadcast, same as q8.
    * Top-100 via TakeOrderedAndProject on the (acctbal, nation, name,
    * part) key, which is unique per offer row.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
      .select("p_partkey", "p_name")
    val regionSup = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "AMERICA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val offers = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(regionSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val minCost = offers.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost")).as("min_cost"))
    offers.join(minCost,
        col("p_partkey") === col("mk") && col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q9-style product-type profit, adapted to the fixture schema
    * (no partsupp: supply cost is proxied by p_retailprice × quantity —
    * the profit SIGN is synthetic but the plan is Q9's): for parts
    * whose name contains one noun, profit per supplier nation per
    * order year across a five-table join. Float discipline: both
    * products (2-decimal price × (1−discount) ≤ 4 decimals;
    * 2-decimal retailprice × integral quantity = 2 decimals) are cast
    * to DECIMAL(18,4) BEFORE the subtraction, so the per-row amount
    * and its sum are exact in both engines. Only the constant-size
    * nation dim is broadcast-hinted; the name-filtered part and the
    * supplier-nation frames are SF-scaled, so the planner sizes them
    * (q8 precedent). Orders joins on the one shuffled fact key, then
    * one hash aggregate on (nation, year).
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").contains("widget"))
      .select("p_partkey", "p_retailprice")
    val supNat = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val amount =
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)") -
      (col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supNat, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q11-style important parts, adapted to the fixture schema
    * (no partsupp: a part's "stock value" held by one region's
    * suppliers is the summed extendedprice of their shipments of it):
    * parts whose value exceeds a FIXED FRACTION of the region's total
    * — so the output shrinks as SF grows, exactly Q11's design (its
    * 0.0001/SF fraction). The comparison happens in DECIMAL on both
    * sides (value and the 1-row threshold 0.001 × total, the 0.001
    * itself a DECIMAL literal — a double 0.001 would poison the
    * product), so no float ever decides membership; the value is cast
    * to double only for output. Plan: region suppliers fold into one
    * dim (hinted broadcasts only on constant-size nation/region; the
    * SF-scaled supplier side is planner-sized, the q8 precedent),
    * one hash aggregate on l_partkey, the grand total
    * re-aggregates THAT |parts|-sized frame (never the fact table
    * twice — the DataFrame API duplicates the subtree in the initial
    * plan, but AQE's exchange reuse executes one lineitem scan +
    * ReusedExchange; PlanSpec pins it), and the 1-row threshold
    * broadcasts back.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val regionSup = Tables.supplier(spark, dir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(regionSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value_dec"))
    val thr = value
      .agg((sum(col("value_dec")) * expr("CAST(0.001 AS DECIMAL(4,3))"))
        .as("thr"))
    value.crossJoin(broadcast(thr))
      .filter(col("value_dec") > col("thr"))
      .select(col("l_partkey").as("p_partkey"),
        col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey").asc)
  }

  /** TPC-H Q12-style late-shipment priority split, adapted to the
    * fixture schema (l_returnflag plays Q12's shipmode; lateness is
    * the house convention from q4/q21 — shipped > 30 days after the
    * order date, standing in for commitdate < receiptdate): for two
    * flag classes and one ship year, how many late lineitems carried
    * urgent orders vs not. The CASE pair aggregates in one pass
    * (never two scans); the ship-year and flag filters push to the
    * lineitem scan, so the orders join shuffles only late-candidate
    * rows. Counts are longs — no float anywhere.
    */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(high, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q16-style supplier variety per part attribute class, adapted
    * to the fixture schema (no partsupp: "who can supply this part"
    * is read off lineitem; negative account balance stands in for
    * Q16's complaint suppliers): distinct supplier count per (brand,
    * type, size) over an excluded-brand/type/size-IN filter, minus the
    * excluded suppliers via a broadcast anti join. The countDistinct
    * runs as Spark's two-phase distinct aggregate (partial dedup
    * map-side on (attrs, suppkey), then count — never a row explosion
    * to the driver); part and the excluded-supplier set are SF-scaled,
    * so the planner sizes both (auto-broadcast at fixture scale).
    */
  def q16PartVariety(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#11" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 15, 23, 31, 40, 47))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** TPC-H Q20-style dominant supplier, adapted to the fixture schema
    * (no partsupp availqty: "has excess stock to promote" becomes
    * "shipped more than half of a part's yearly volume" — the same
    * qty > 0.5 × aggregate comparison): suppliers in one region who
    * dominated at least one 'small'-named part's 1996 shipments. The
    * nested-subquery chain decorrelates to: per-(part, supplier)
    * quantity aggregate, per-part total via a WINDOW over the same
    * grain (one exchange, the q17 trick — valid here because the
    * comparison row and the total share the (part, supplier) frame),
    * then a distinct supplier-key set driving a left-semi join into
    * the supplier dim. Quantities are integral doubles — window sum
    * and the 0.5 multiply are exact, so dominance is decided
    * identically in both engines.
    */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val perPS = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val dominant = perPS
      .withColumn("part_qty",
        sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") > lit(0.5) * col("part_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "AMERICA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  /** Semi/anti join: customers with ≥1 order vs none (SURVEY §2.6 joins). */
  def joinSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ordKeys = Tables.orders(spark, dir).select("o_custkey")
    val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(true).as("has_orders"))
    val noO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(false).as("has_orders"))
    withO.unionByName(noO).orderBy("c_custkey")
  }

  /** Argmax / top-k (SURVEY R8): TakeOrderedAndProject, no full sort. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Global aggregate (SURVEY R9): exact + distinct counts, min/max. */
  def globalStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      sum(col("l_quantity")).as("sum_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))
  }

  /** ROLLUP grouping sets over lineitem flags. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS (the general form rollup/cube specialize —
    * SURVEY §2.6 noted grouping sets as available-but-unused; this
    * closes the taxonomy cell): the two single-column marginals plus
    * the grand total, WITHOUT the (flag, status) pairs a rollup would
    * force — the shape a reporting layer actually asks for. Same one
    * Expand + hash-agg plan as rollup/cube; sums stay exact (integral
    * quantities in double).
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** RANGE-frame window (SURVEY §2.6: "no frame-spec usage" in the
    * reference — the events surface exercises it): per-user rolling
    * 1-hour event count and max value, the frame bounded by VALUE
    * (seconds) not rows. Value-based frames are tie-safe by
    * construction (all rows at equal `us` share one frame, whatever
    * their order), and count/max are order-independent, so the result
    * hashes exactly with no float-sum discipline needed. First 30 rows
    * per user via a deterministic (us, event_id) row_number.
    */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("us"), col("value"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val wRange = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3599L, 0L)
    ev.withColumn("rn", row_number().over(wOrd))
      .withColumn("n_1h", count(lit(1)).over(wRange))
      .withColumn("max_1h", max(col("value")).over(wRange))
      .filter(col("rn") <= 30)
      .select(col("user_id"), col("rn"), col("event_id"), col("n_1h"),
        round(col("max_1h"), 4).as("max_1h"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** Running-window aggregates (frame spec) per supplier — deterministic
    * total order via (shipdate, orderkey, linenumber) tie-break
    * (SURVEY §7 "determinism").
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn") <= 50)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** String function coverage over `part` (SURVEY §2.6 string functions). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "^\\w+", 0).as("type_head"),
        col("p_name").contains("a").as("has_a"))
      .orderBy("p_partkey")

  /** Set operations: INTERSECT / EXCEPT on customer key sets. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
    val ordCust = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val both = custKeys.intersect(ordCust).withColumn("op", lit("intersect"))
    val only = custKeys.except(ordCust).withColumn("op", lit("except"))
    both.unionByName(only).orderBy("op", "k")
  }

  /** TPC-H Q6-style forecast revenue: tight filter + global agg — the
    * whole query collapses into the parquet scan + one partial/final agg.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"))

  /** CUBE grouping sets (all four groupings at once). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact distinct aggregation per group. */
  def eventsDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** R11 config-name split (main.py:330 `rsplit('_', 1)`): last-underscore
    * split of `strategy_model` collection names.
    */
  def configSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = for (s <- graft.chunk.Chunkers.strategyNames;
      m <- graft.embed.HashingEmbedder.models.map(_.name)) yield s + "_" + m
    names.toDF("collection")
      .select(col("collection"),
        regexp_extract(col("collection"), "^(.*)_[^_]+$", 1).as("strategy"),
        regexp_extract(col("collection"), "([^_]+)$", 1).as("model"))
      .orderBy("collection")
  }

  /** Exact interpolated percentiles of an integral-valued measure —
    * linear interpolation on exact values is deterministic in both
    * engines (Spark `percentile` ≡ DuckDB `quantile_cont`).
    */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, 0.99)").as("p99_qty"))
      .orderBy("l_returnflag")

  /** Histogram-sketch percentiles — the 100 TB path beside [[quantiles]]'
    * exact interpolation: exact percentiles need a global sort (or an
    * engine-internal equivalent), but a fixed 1000-bin histogram is one
    * scan + a map-side-combined aggregate onto ≤1000 keys, mergeable
    * across any partitioning, with error bounded by one bin width —
    * the same accuracy/cost trade `percentile_approx` makes, here in a
    * form both engines replay bit-identically (Spark's and DuckDB's
    * built-in sketches differ, so the SKETCH ITSELF is the portable
    * contract). Estimates report each quantile bin's upper edge; all
    * binning arithmetic is written with identical operator order on
    * both sides.
    */
  def quantilesHist(spark: SparkSession, dir: String): DataFrame = {
    val B = 1000
    val o = Tables.orders(spark, dir).select(col("o_totalprice").as("x"))
    val mm = o.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    // mx = mn (a constant column) would divide by zero and NULL every
    // bin — route the degenerate case to bin 0, where the upper-edge
    // estimate collapses to the constant itself
    val binned = o.crossJoin(broadcast(mm))
      .select(when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(floor((col("x") - col("mn")) * lit(1000.0) /
          (col("mx") - col("mn"))).cast("long"), lit((B - 1).toLong))).as("b"),
        col("mn"), col("mx"), col("n"))
      .groupBy(col("b"), col("mn"), col("mx"), col("n"))
      .agg(count(lit(1)).as("c"))
    // the window runs over ≤1000 sketch rows — sketch-merge scale, not
    // data scale
    val cum = binned.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("b"))))
    val qdf = spark.range(1)
      .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
    qdf.crossJoin(cum)
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q"), col("mn"), col("mx"), col("n"))
      .agg(min(col("b")).as("b"))
      .select(col("q"),
        round(col("mn") + (col("b") + 1) * (col("mx") - col("mn")) / lit(1000.0), 4)
          .as("est"),
        col("n"))
      .orderBy("q")
  }

  /** Mean/variance/stddev computed from EXACT integer power sums rather
    * than the engines' (order-dependent, mutually different) streaming
    * moment kernels — bit-identical cross-engine by construction.
    */
  def aggMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum(x * x).as("sxx"))
      .select(
        col("l_returnflag"),
        col("n"),
        (col("sx") / col("n")).as("mean_qty"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("var_qty"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Window-function family: lag/lead/dense_rank/ntile/first over the
    * same deterministic per-supplier order as windowRunning.
    */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
      .withColumn("dr", dense_rank().over(
        Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity").asc)))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("first_order", first(col("l_orderkey")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn") <= 30)
      .select(col("l_suppkey"), col("rn"), col("prev_qty"), col("next_qty"),
        col("dr"), col("quartile"), col("first_order"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Correlated aggregate predicate: orders priced above their customer's
    * (exact, DECIMAL-routed) average order price.
    */
  def ordersAboveCustAvg(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val custAvg = ord.groupBy(col("o_custkey").as("ck"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("avg_price"))
    ord.join(custAvg, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey")
  }

  /** Bloom-filter semi-join pruning — the runtime-filter primitive that
    * keeps a 100 TB fact table from shuffling rows that cannot match
    * (Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
    * does this opaquely; here the filter is explicit and deterministic
    * so its selectivity is oracle-checkable). The bloom is m=4096 bits,
    * k=3, with bit positions drawn from md5("bloom"+i+"|"+key) — any
    * engine reproduces the exact bit set, the exact candidate set, and
    * the exact false-positive count.
    *
    * Scale shape: the bit set is built from the SMALL side (one
    * distinct over ≤ m integer positions, broadcast); the fact side
    * probes it with a broadcast join on the bit — no shuffle of orders
    * beyond the final count. A bloom-passing row count vs the true
    * semi-join exposes the fp rate the filter would ship to the join.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val (cands, matches) = bloomParts(seg, orders)
    val nc = cands.agg(count(lit(1)).as("n_candidates"))
    val nm = matches.agg(count(lit(1)).as("n_matches"))
    // zero guard: on an empty candidate set Spark's 0/0 yields NULL but
    // DuckDB yields NaN — pin both engines to 0.0 (ADVICE r9)
    nc.crossJoin(nm)
      .select(col("n_candidates"), col("n_matches"),
        (col("n_candidates") - col("n_matches")).as("n_false_pos"),
        when(col("n_candidates") > 0,
          round((col("n_candidates") - col("n_matches")).cast("double") /
            col("n_candidates"), 4)).otherwise(lit(0.0)).as("fp_rate"))
  }

  /** (bloom-passing candidate rows, true semi-join rows) for a key set
    * `seg` (column c_custkey) and fact rows (o_orderkey, o_custkey) —
    * the spec entry point: candidates must be a superset of matches
    * (a Bloom filter never false-negatives).
    */
  private[graft] def bloomParts(seg: DataFrame, orders: DataFrame)
      : (DataFrame, DataFrame) = {
    val mBits = 4096
    val kHash = 3
    def bitOf(i: Int, key: org.apache.spark.sql.Column) =
      (conv(substring(md5(concat(lit(s"bloom$i|"), key.cast("string"))), 1, 4),
        16, 10).cast("int") % mBits).as("bit")
    val bits = (0 until kHash)
      .map(i => seg.select(bitOf(i, col("c_custkey"))))
      .reduce(_ union _)
      .distinct()
    // a fact row is a candidate iff all k of its positions are set
    val cands = (0 until kHash)
      .map(i => orders.select(col("o_orderkey"), col("o_custkey"),
        bitOf(i, col("o_custkey"))))
      .reduce(_ union _)
      .join(broadcast(bits), "bit")
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === kHash)
      .select(col("o_orderkey"), col("o_custkey"))
    val matches = orders
      .join(seg.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_custkey")) // USING reorders cols
    (cands, matches)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bloom_semi_join" -> (bloomSemiJoin _),
    "window_funcs" -> (windowFuncs _),
    "orders_above_cust_avg" -> (ordersAboveCustAvg _),
    "quantiles" -> (quantiles _),
    "agg_moments" -> (aggMoments _),
    "q6_forecast" -> (q6Forecast _),
    "cube_agg" -> (cubeAgg _),
    "events_distinct" -> (eventsDistinct _),
    "config_split" -> (configSplit _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q13_order_distribution" -> (q13OrderDistribution _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q18_large_volume" -> (q18LargeVolume _),
    "q22_dormant" -> (q22Dormant _),
    "q7_trade_volume" -> (q7TradeVolume _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q21_sole_late_supplier" -> (q21SoleLateSupplier _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q12_late_priority" -> (q12LatePriority _),
    "q16_part_variety" -> (q16PartVariety _),
    "q20_dominant_supplier" -> (q20DominantSupplier _),
    "quantiles_hist" -> (quantilesHist _),
    "join_semi_anti" -> (joinSemiAnti _),
    "topk_orders" -> (topkOrders _),
    "global_stats" -> (globalStats _),
    "rollup_agg" -> (rollupAgg _),
    "grouping_sets_agg" -> (groupingSetsAgg _),
    "window_range_frame" -> (windowRangeFrame _),
    "window_running" -> (windowRunning _),
    "string_funcs" -> (stringFuncs _),
    "set_ops" -> (setOps _),
  )

  private val duckRevenue =
    "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  private val configSplitOracle: String = {
    val names = for (s <- graft.chunk.Chunkers.strategyNames;
      m <- graft.embed.HashingEmbedder.models.map(_.name)) yield s"('${s}_$m')"
    s"""SELECT collection,
       |  regexp_extract(collection, '^(.*)_[^_]+$$', 1) AS strategy,
       |  regexp_extract(collection, '([^_]+)$$', 1) AS model
       |FROM (VALUES ${names.mkString(", ")}) AS t(collection)
       |ORDER BY collection""".stripMargin
  }

  // DuckDB replay of Spark's conv(substr(md5,1,4),16,10): 4 hex chars
  // to an integer via digit positions.
  private def duckHex4(h: String): String =
    s"((((strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr($h, 2, 1)) - 1)) * 16 + " +
      s"(strpos('0123456789abcdef', substr($h, 3, 1)) - 1)) * 16 + " +
      s"(strpos('0123456789abcdef', substr($h, 4, 1)) - 1))"

  def oracles: Map[String, String] = Map(
    // Bloom replay: identical md5-derived bit positions, identical bit
    // set, so candidate and false-positive counts match exactly.
    "bloom_semi_join" -> {
      def bit(key: String) = duckHex4(
        s"md5('bloom' || CAST(i.i AS VARCHAR) || '|' || CAST($key AS VARCHAR))") +
        " % 4096"
      s"""WITH seg AS (
         |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         |bits AS (
         |  SELECT DISTINCT ${bit("s.c_custkey")} AS bit
         |  FROM seg s, range(3) i(i)),
         |pos AS (
         |  SELECT o.o_orderkey, o.o_custkey, ${bit("o.o_custkey")} AS bit
         |  FROM orders o, range(3) i(i)),
         |cands AS (
         |  SELECT o_orderkey, o_custkey FROM pos JOIN bits USING (bit)
         |  GROUP BY 1, 2 HAVING count(*) = 3),
         |agg AS (SELECT
         |  (SELECT count(*) FROM cands) AS n_candidates,
         |  (SELECT count(*) FROM orders o
         |   WHERE o.o_custkey IN (SELECT c_custkey FROM seg)) AS n_matches)
         |SELECT n_candidates, n_matches,
         |  n_candidates - n_matches AS n_false_pos,
         |  CASE WHEN n_candidates > 0
         |    THEN round(CAST(n_candidates - n_matches AS DOUBLE) / n_candidates, 4)
         |    ELSE 0.0 END AS fp_rate
         |FROM agg""".stripMargin
    },
    "window_funcs" ->
      """WITH t AS (
        |  SELECT l_suppkey,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    lag(l_quantity, 1) OVER w AS prev_qty,
        |    lead(l_quantity, 1) OVER w AS next_qty,
        |    CAST(dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity ASC) AS INTEGER) AS dr,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |    first_value(l_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC))
        |SELECT l_suppkey, rn, prev_qty, next_qty, dr, quartile, first_order
        |FROM t WHERE rn <= 30 ORDER BY l_suppkey, rn""".stripMargin,
    "orders_above_cust_avg" ->
      """WITH ca AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey
        |FROM orders JOIN ca ON o_custkey = ck
        |WHERE o_totalprice > avg_price
        |ORDER BY o_orderkey""".stripMargin,
    "quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_quantity, 0.99) AS p99_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(l_quantity) AS sx, sum(l_quantity * l_quantity) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  (sxx - sx * sx / n) / (n - 1) AS var_qty,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(100.0 *
        |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |                     THEN l_extendedprice * (1.0 - l_discount)
        |                     ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_1'
        |                       THEN l_extendedprice * (1.0 - l_discount)
        |                       ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                  AS DECIMAL(18,4))) AS DOUBLE), 4) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <= TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q7_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_0', 'NATION_1')
        |  AND n2.n_name IN ('NATION_0', 'NATION_1')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                       AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_suppkey AS skey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY),
        |participants AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_suppkey AS skey FROM lineitem)
        |SELECT s_name, count(*) AS numwait FROM late w
        |JOIN supplier ON w.skey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM participants p
        |    WHERE p.okey = w.okey AND p.skey <> w.skey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late x
        |    WHERE x.okey = w.okey AND x.skey <> w.skey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 10""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |         min(l_extendedprice) AS cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |    AND r_name = 'AMERICA'
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |mc AS (SELECT p_partkey AS mk, min(cost) AS min_cost
        |       FROM offers GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        |FROM offers JOIN mc ON p_partkey = mk AND cost = min_cost
        |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                AS DECIMAL(18,4)) -
        |           CAST(p_retailprice * l_quantity
        |                AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE contains(p_name, 'widget')
        |GROUP BY 1, 2
        |ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1),
        |thr AS (SELECT sum(value_dec) * CAST(0.001 AS DECIMAL(4,3)) AS t
        |        FROM val)
        |SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM val, thr WHERE value_dec > t
        |ORDER BY value DESC, p_partkey ASC""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q16_part_variety" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 15, 23, 31, 40, 47)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "q20_dominant_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |dom AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, qty,
        |           sum(qty) OVER (PARTITION BY l_partkey) AS part_qty
        |    FROM ps)
        |  WHERE qty > 0.5 * part_qty)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND s_suppkey IN (SELECT l_suppkey FROM dom)
        |ORDER BY s_name""".stripMargin,
    "quantiles_hist" ->
      """WITH mm AS (
        |  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
        |         count(*) AS n
        |  FROM orders),
        |binned AS (
        |  SELECT CASE WHEN mx = mn THEN 0
        |              ELSE LEAST(CAST(floor((o_totalprice - mn) * 1000.0 / (mx - mn))
        |                         AS BIGINT), 999) END AS b,
        |         mn, mx, n
        |  FROM orders CROSS JOIN mm),
        |cnt AS (
        |  SELECT b, mn, mx, n, count(*) AS c FROM binned GROUP BY 1, 2, 3, 4),
        |cum AS (
        |  SELECT b, mn, mx, n, sum(c) OVER (ORDER BY b) AS cum FROM cnt),
        |qs(q) AS (VALUES (0.5), (0.9), (0.99))
        |SELECT q,
        |       round(mn + (b + 1) * (mx - mn) / 1000.0, 4) AS est, n
        |FROM (
        |  SELECT q, mn, mx, n, min(b) AS b
        |  FROM qs CROSS JOIN cum
        |  WHERE cum >= ceil(q * n)
        |  GROUP BY q, mn, mx, n)
        |ORDER BY q""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |                  AS DOUBLE) / 7.0, 4) AS avg_yearly
        |FROM (
        |  SELECT l_quantity, l_extendedprice,
        |         CAST(sum(l_quantity) OVER (PARTITION BY l_partkey) AS DOUBLE) /
        |         count(*) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11')
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "q18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q22_dormant" ->
      """WITH ab AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) /
        |         count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > avg_bal
        |  AND c_custkey NOT IN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "events_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "config_split" -> configSplitOracle,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $duckRevenue AS revenue
         |FROM lineitem, orders, customer
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '$CutoffDate'
         |  AND l_shipdate > TIMESTAMP '$CutoffDate'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT r_name, n_name, $duckRevenue AS revenue
         |FROM lineitem, orders, customer, supplier, nation, region
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "join_semi_anti" ->
      """SELECT c_custkey, EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "global_stats" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  sum(l_quantity) AS sum_qty,
        |  min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "grouping_sets_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "window_range_frame" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS us, value
        |  FROM events),
        |t AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY us ASC, event_id ASC) AS INTEGER) AS rn,
        |    event_id,
        |    count(*) OVER wr AS n_1h,
        |    round(max(value) OVER wr, 4) AS max_1h
        |  FROM e
        |  WINDOW wr AS (PARTITION BY user_id ORDER BY us
        |                RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
        |SELECT user_id, rn, event_id, n_1h, max_1h FROM t
        |WHERE rn <= 30 ORDER BY user_id, rn""".stripMargin,
    "window_running" ->
      """WITH t AS (
        |  SELECT l_suppkey,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    l_orderkey, l_linenumber,
        |    sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC))
        |SELECT * FROM t WHERE rn <= 50 ORDER BY l_suppkey, rn""".stripMargin,
    "string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lc,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_type, 1, 5) AS type_pfx,
        |  length(p_name) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  coalesce(regexp_extract(p_type, '^\w+'), '') AS type_head,
        |  contains(p_name, 'a') AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "set_ops" ->
      """WITH ck AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0),
        |     ok AS (SELECT o_custkey AS k FROM orders)
        |SELECT k, 'intersect' AS op FROM (SELECT * FROM ck INTERSECT SELECT * FROM ok)
        |UNION ALL
        |SELECT k, 'except' AS op FROM (SELECT * FROM ck EXCEPT SELECT * FROM ok)
        |ORDER BY op, k""".stripMargin,
  )
}
