package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Relational coverage queries over the TPC-H-ish tables (TESTDATA.md).
  *
  * The reference's own relational surface is tiny (SURVEY §2.3: one windowed
  * max, no joins); the engine inherits the full relational algebra from Spark
  * SQL and these queries pin its correctness against the DuckDB oracle and
  * feed the benchmark.
  *
  * Determinism policy for the oracle hash-compare:
  *  - monetary aggregates are computed in DECIMAL (exact, order-independent)
  *    and cast to DOUBLE at the end — both engines produce bit-identical
  *    doubles from the same exact decimal;
  *  - averages are expressed as exact-decimal sum / count (double division)
  *    rather than engine-native avg (whose internal rounding differs);
  *  - every query ends in a total ORDER BY.
  *
  * Scale notes: joins keep their natural shuffle keys; dimension tables
  * (region/nation/supplier/customer at these SFs) are broadcast — at 100 TB
  * the fact-side stays shuffle-free on those joins. AQE handles skew.
  */
object Relational {

  private val dec12 = DecimalType(12, 2)
  private val dec4 = DecimalType(4, 2)

  /** l_extendedprice * (1 - l_discount), exact decimal. */
  private def discPrice: Column =
    col("l_extendedprice").cast(dec12) * (lit(1).cast(dec4) - col("l_discount").cast(dec4))

  /** TPC-H Q1-style pricing summary: scan + filter + hash agg (map-side
    * partial agg; shuffle only 6 groups).
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec12)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec12)).cast(DoubleType).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice * (lit(1).cast(dec4) + col("l_tax").cast(dec4)))
          .cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity").cast(dec12)).cast(DoubleType) / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join + agg + top-k.
    *
    * customer is FACT-sized at real TPC-H scale (~15B rows at 100 TB), so no
    * broadcast hint — AQE picks broadcast vs shuffle from runtime stats (at
    * sf0.1 the filtered side is tiny and AQE broadcasts it anyway; at 100 TB
    * it shuffle-hash-joins on the key without OOMing anything).
    */
  def q3TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast(TimestampType)
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  /** TPC-H Q6-style: pure scan + tight filter + global agg — the pushdown
    * showcase (every predicate reaches the parquet scan; zero shuffle beyond
    * the single-row final agg).
    */
  def q6Filter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").cast(dec4).between(
            lit(0.05).cast(dec4), lit(0.07).cast(dec4)) &&
          col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec12) * col("l_discount").cast(dec4))
        .cast(DoubleType).as("revenue"))

  /** TPC-H Q10-style: returned-item revenue by customer — 4-way join +
    * group + top-k. customer/orders/lineitem all fact-sized: no hints,
    * natural shuffle keys; nation broadcast.
    */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1996-07-01").cast(TimestampType)
    val hi = lit("1996-10-01").cast(TimestampType)
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18-style: large-volume orders — aggregate-then-semijoin shape.
    * The HAVING-style pre-aggregation keys the join to a small filtered set
    * before touching orders/customer (classic shuffle-minimizing order).
    */
  def q18BigOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec12)).cast(DoubleType).as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Rollup aggregation: Q1's grouping with subtotal and grand-total rows
    * (GROUPING SETS lattice; `grouping_id` distinguishes the levels). Same
    * map-side-partial-agg scale shape as q1 — the lattice multiplies the
    * tiny group count, not the scan.
    */
  def q1Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast(LongType).as("gid"),
        sum(col("l_quantity").cast(dec12)).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Pivot: events per (hour-of-day x event_type) as a wide table — the
    * conditional-aggregation shape (each cell is a filtered count; one
    * shuffle on the 24-row hour key).
    */
  def pivotHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, sfDir)
      .groupBy(hour(col("ts")).cast(LongType).as("hour"))
      .pivot("event_type", types)
      .count()
      .na.fill(0, types)
      .orderBy("hour")
  }

  /** TPC-H Q14-style: promotion revenue share — lineitem x part join with a
    * conditional aggregate ratio. part scales with the fact tables, so no
    * broadcast hint (AQE decides); the ratio is exact-decimal sums divided
    * once in double.
    */
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(0).cast(dec12))).cast(DoubleType) * 100.0 /
          sum(discPrice).cast(DoubleType)).as("promo_revenue_pct"))
  }

  /** Ranking window functions: top-3 orders per customer by total price
    * (row_number over a per-key ordered window — per-key state, single
    * shuffle on the customer key).
    */
  def windowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
  }

  /** Set difference: (user, hour) slots with a click but no purchase
    * (EXCEPT over distinct composite keys — each side shuffles once on the
    * key; the difference is a hash anti-join).
    */
  def exceptUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    def slots(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), hour(col("ts")).cast(LongType).as("hour"))
      .distinct()
    slots("click").except(slots("purchase")).orderBy("user_id", "hour")
  }

  /** Bag-semantics EXCEPT ALL — each (user, hour) click slot survives
    * once per UNMATCHED multiplicity (exceptUsers's set form collapses
    * multiplicity; retention/attribution analytics usually needs the bag
    * form: 3 clicks, 1 purchase → 2 surviving slots). Spark's native
    * exceptAll plans the Tungsten replicate-rows strategy — one keyed
    * count-diff shuffle, no join explosion.
    */
  def exceptAllUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    def slots(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), hour(col("ts")).cast(LongType).as("hour"))
    slots("click").exceptAll(slots("purchase"))
      .groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_surviving"))
      .orderBy("user_id", "hour")
  }

  /** Relative-position window functions — percent_rank and cume_dist of
    * each order's price within its customer (the distribution-position
    * scoring that ntile's fixed buckets approximate). One keyed window;
    * both are exact rational values so the doubles match bit-for-bit
    * across engines after round(6).
    */
  def windowPct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .drop("o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Left-semi join: customers having at least one order in 1996 — the
    * existence-check shape (no row multiplication, key-only shuffle).
    */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    Tables.customer(spark, sfDir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** TPC-H Q5-style: 6-way join + agg.
    *
    * Broadcast hints only on the genuinely tiny dimensions (region: 5 rows,
    * nation: 25 rows at every scale). customer/supplier grow with the fact
    * tables, so their joins carry no hint — AQE decides at runtime. lineitem
    * is pruned to the 4 needed columns before the join so the shuffle moves
    * a quarter of the bytes.
    */
  def q5Join(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1996-01-01").cast(TimestampType)
    val hi = lit("1997-01-01").cast(TimestampType)
    val r = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, sfDir)
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Skew-defended keyed aggregation — the salting pattern as a first-class
    * operator: phase 1 aggregates by (key, salt) so a pathological hot key
    * spreads over `salts` tasks; phase 2 merges the salt partials by key.
    * Result is IDENTICAL to the direct groupBy (all-exact aggregates:
    * count/min/max), which is exactly what the oracle checks; only the
    * shuffle shape differs. At 100 TB this is the drop-in for any keyed agg
    * whose key histogram is too skewed for AQE's skew handling alone.
    */
  def saltedEventCounts(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("__salt", pmod(hash(col("event_id")), lit(salts)))
      .groupBy(col("event_type"), col("__salt"))
      .agg(count(lit(1)).as("c"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_events"),
        min(col("mn")).as("min_value"), max(col("mx")).as("max_value"))
      .orderBy("event_type")

  /** Dominant-key share from a seeded 5% sample — the cheap skew probe
    * behind [[saltedCountsAuto]]'s plan choice. The seeded sample is
    * deterministic only for a FIXED partition layout — a different
    * environment/partitioning can flip the salted_auto plan choice.
    * Benign for answers: both physical paths produce identical results
    * (all-exact aggregates), so correctness never depends on the probe.
    */
  private[graft] def skewProbe(df: DataFrame, key: String): Double = {
    val shares = df.sample(withReplacement = false, 0.05, 42L)
      .groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).cast(DoubleType) / sum(col("c")))
    Option(shares.head.get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0)
  }

  /** Cost-based physical choice for the keyed aggregation: probe the key
    * distribution with a seeded sample ([[skewProbe]]) and pick the
    * salted two-phase plan only when one key dominates (> half the
    * sampled rows) — the poor man's runtime re-optimization for engines
    * without AQE skew handling on aggregations. Both paths produce
    * byte-identical results (salting is associative-decomposition only),
    * so the ORACLE is the plain GROUP BY regardless of which plan ran —
    * the decision changes the shuffle shape, never the answer.
    */
  def saltedCountsAuto(spark: SparkSession, sfDir: String,
      salts: Int = 16): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val plain = skewProbe(e, "event_type") <= 0.5
    if (plain)
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .orderBy("event_type")
    else saltedEventCounts(spark, sfDir, salts)
  }

  /** TPC-H Q4-style: order-priority checking — orders in a quarter having at
    * least one line shipped > 30 days after the order date (the synthetic
    * schema has no commit/receipt dates, so the lateness predicate adapts).
    * Grouped EXISTS = left-semi join with a cross-table condition; no row
    * multiplication, counts stay exact under multi-line matches.
    */
  def q4Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q7-style: volume shipping between two nations, by supplier
    * nation x customer nation x ship year. The two nation dims are filtered
    * to the pair BEFORE broadcasting, so the fact join fans out only the
    * qualifying rows; the disjunctive pair condition reduces to
    * supp_nation <> cust_nation after the IN filters.
    */
  def q7Volume(spark: SparkSession, sfDir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(spark, sfDir).filter(col("n_name").isInCollection(pair))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, sfDir).filter(col("n_name").isInCollection(pair))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q13-style: customer order-count distribution — LEFT OUTER join
    * (zero-order customers count with c_count = 0) + two chained
    * aggregations. `count(o_orderkey)` skips the outer join's nulls, which
    * is the whole point of the shape.
    */
  def q13CustDist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q15-style: top supplier by quarterly revenue — aggregate "view"
    * + scalar max subquery (kept DECIMAL-exact so the equality against the
    * max is bit-safe in both engines; cast to double only for output).
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(discPrice).as("tr"))
    val top = rev.agg(max(col("tr")).as("max_tr"))
    Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(top))
      .filter(col("tr") === col("max_tr"))
      .select(col("s_suppkey"), col("s_name"),
        col("tr").cast(DoubleType).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-style: small-quantity revenue for one brand — per-part
    * average-quantity subquery joined back as the filter cut. Quantities
    * are integer-valued doubles, so the double sum/count cut is exact and
    * order-independent; the revenue sum stays DECIMAL.
    */
  def q17SmallQty(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("pa_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * 0.5).as("qty_cut"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#3").select("p_partkey")
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(cut, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((sum(col("l_extendedprice").cast(dec12)).cast(DoubleType) / 7.0)
        .as("avg_yearly"))
  }

  /** TPC-H Q19-style: disjunctive brand/size/quantity predicates over the
    * lineitem x part join — the OR-of-conjunctions shape optimizers must
    * keep join-key-pushable (the common p_partkey = l_partkey equi-key
    * stays a hash join; the disjunction evaluates post-join).
    */
  def q19Disjunct(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size")
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)))
      .agg(sum(discPrice).cast(DoubleType).as("revenue"))
  }

  /** TPC-H Q22-style: well-funded customers with no orders, by segment —
    * scalar average subquery (DECIMAL-exact, order-independent) + anti-join.
    */
  def q22Idle(spark: SparkSession, sfDir: String): DataFrame = {
    val avgBal = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(dec12)).cast(DoubleType) /
        count(lit(1))).as("avg_bal"))
    Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, sfDir).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(dec12)).cast(DoubleType).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q12-flavored shipping-delay profile: per order priority, how many
    * lines shipped more than 60 days after their order date (conditional
    * aggregation over the orders x lineitem join; the synthetic schema has
    * no ship modes, so priority plays the grouping role).
    */
  def shipDelay(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .join(Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, 1)
          .otherwise(0)).as("late_lines"),
        count(lit(1)).as("total_lines"))
      .orderBy("o_orderpriority")

  /** TPC-H Q2-style: minimum-cost supplier per part. The synthetic schema
    * has no partsupp, so the offer book derives from lineitem: a supplier's
    * cost for a part is its minimum observed unit price. The correlated
    * min-cost subquery becomes an aggregate joined back on equality — the
    * doubles compare bit-identically because both sides compute the same
    * division over the same rows. Region dims broadcast; the offer
    * aggregation is the only fact-sized shuffle. The offer subtree appears
    * on both sides of the min-cost join — planned twice, but AQE stage
    * reuse materializes the shuffle once at runtime (verified: the executed
    * plan carries ReusedExchange nodes).
    */
  def q2MinCost(spark: SparkSession, sfDir: String): DataFrame = {
    val offers = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val eu = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val euOffers = offers.join(eu, col("l_suppkey") === col("s_suppkey"))
    val minCost = euOffers.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    val p = Tables.part(spark, sfDir)
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_brand")
    euOffers
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(minCost,
        col("l_partkey") === col("mc_partkey") &&
          col("cost") === col("min_cost"))
      // NOT round(cost, 4): the two engines' round() of the SAME double
      // disagree when cost*10^4 lands on a half-point after the multiply's
      // own rounding (hit at sf0.1: 954.29875 -> .2987 vs .2988). The
      // explicit floor(x*10^4 + 0.5)/10^4 is the same IEEE op sequence on
      // both engines, so the quantized double is bit-identical.
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        (floor(col("cost") * 10000d + 0.5d) / 10000d).as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** TPC-H Q8-style: a nation's market share inside a region, per order
    * year — two independent nation lookups (customer side filtered to the
    * region, supplier side labeling the share nation), conditional-sum
    * ratio of exact decimals divided once in double.
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val nc = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val ns = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("c_nk"), "left_semi")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_1", discPrice)
        .otherwise(lit(0).cast(dec12))).cast(DoubleType) /
        sum(discPrice).cast(DoubleType)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-style: profit by supplier nation and ship year. No partsupp
    * supply cost in the schema, so cost is proxied as half the part's retail
    * price per unit. Both legs are summed as exact decimals per group and
    * combined once in double, keeping the hash order-independent.
    */
  def q9Profit(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO")
      .select("p_partkey", "p_retailprice")
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast(LongType).as("o_year"))
      .agg((sum(discPrice).cast(DoubleType) -
        sum(col("p_retailprice").cast(dec12) * col("l_quantity").cast(dec12))
          .cast(DoubleType) * 0.5).as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q11-style: important parts by inventory value. Value derives
    * from lineitem revenue of ASIA-region suppliers (no partsupp), and the
    * Q11 fixed fraction is replaced by 2x the mean per-part value so the
    * result-set size is scale-invariant (the fixed fraction degenerates as
    * the part count grows — same reason Q11 scales its own threshold by
    * 1/SF). One fact shuffle on part; the total is a 1-row broadcast (BNLJ
    * whitelisted). The per-part value subtree feeds both the output and the
    * total — AQE stage reuse computes its shuffle once at runtime.
    */
  def q11ImportantPart(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val vals = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(discPrice).as("value_dec"))
    val tot = vals.agg(sum(col("value_dec")).as("tot_dec"),
      count(lit(1)).as("nparts"))
    vals.crossJoin(broadcast(tot))
      .filter(col("value_dec").cast(DoubleType) >
        col("tot_dec").cast(DoubleType) / col("nparts") * 2.0)
      .select(col("p_partkey"), col("value_dec").cast(DoubleType).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q16-style: how many distinct suppliers can deliver each
    * (brand, size) slice — supplier-part pairs from lineitem (no partsupp),
    * excluding a deterministic "complaints" supplier subset (suppkey % 4 = 0
    * stands in for the comment-text predicate the synthetic schema lacks).
    * countDistinct dedups the pair explosion map-side before the shuffle.
    */
  def q16SupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
      .filter(col("p_type") =!= "PROMO" && col("p_size") <= 25)
      .select("p_partkey", "p_brand", "p_size")
    val excluded = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") % 4 === 0).select("s_suppkey")
    Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_size").cast(LongType).as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** TPC-H Q20-style: suppliers who moved real volume of a part class in a
    * year (the availqty-threshold EXISTS chain becomes a shipped-quantity
    * aggregate + semi-join; threshold calibrated to the synthetic volume
    * distribution). Quantities are integer-valued doubles, so the sum is
    * exact and order-independent.
    */
  def q20Excess(spark: SparkSession, sfDir: String): DataFrame = {
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "SMALL").select("p_partkey")
    val movers = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 300.0)
    Tables.supplier(spark, sfDir)
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_name")
  }

  /** TPC-H Q21-style: suppliers who were the sole late shipper on a
    * multi-supplier order. The schema has no commit/receipt dates, so "late"
    * is shipping > 90 days after the order date; the EXISTS / NOT EXISTS
    * pair collapses to per-(order, supplier) lateness flags re-aggregated
    * per order — two keyed shuffles, no correlated re-scans of lineitem.
    */
  def q21Waiting(spark: SparkSession, sfDir: String): DataFrame = {
    val perOS = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, 1)
        .otherwise(0)).as("is_late"))
    val perOrder = perOS.groupBy(col("l_orderkey").as("po_orderkey"))
      .agg(count(lit(1)).as("ns"), sum(col("is_late")).as("nl"))
      .filter(col("ns") >= 2 && col("nl") === 1)
    perOS.filter(col("is_late") === 1)
      .join(perOrder, col("l_orderkey") === col("po_orderkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Offset window functions: previous/next order price and quartile bucket
    * per customer — lag/lead/ntile over one keyed window (single shuffle on
    * the customer key; ntile is per-key so no global funnel).
    */
  def windowLag(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .drop("o_orderdate")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Frame-edge window functions — first/last/nth order price per
    * customer over the FULL partition frame (unbounded both ways; the
    * default RANGE frame stops at CURRENT ROW, where last_value is just
    * the current row — the classic window gotcha, pinned explicitly
    * here). One keyed window.
    */
  /** NTILE quartiles per event type — ntile's remainder-to-early-buckets
    * rule in exact closed form over the two-level rank machinery
    * ([[graft.operators.TextPipeline.rankPerKey]]): `floor(value)` is a
    * deterministic value-range bucket monotone in the sort's leading
    * term, so `offset + within-(type, bucket) row_number` IS the rank a
    * naive `ntile(4) OVER (PARTITION BY event_type ORDER BY value,
    * event_id)` would assign positions from — but no event type's whole
    * stream ever sorts in ONE window task (the round-11 stratum-window
    * gate; the native form serialized each type's full history). With
    * per-type count n, q = n div 4, r = n mod 4: the first r tiles hold
    * q+1 rows — the [[graft.operators.TextPipeline.curriculumFrom]]
    * closed form, per key. Total order inside each partition via
    * (value, event_id) so bucket boundaries cannot tie-break differently.
    */
  def windowNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val counts = base.groupBy("event_type")
      .agg(count(lit(1)).cast(LongType).as("n"))
    val ranked = graft.operators.TextPipeline.rankPerKey(
      base, "event_type", floor(col("value")).cast(LongType),
      Seq(col("value"), col("event_id")), "rk")
    val q = floor(col("n") / 4)
    val r = col("n") % 4
    val bigRows = (q + 1) * r
    ranked.join(broadcast(counts), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("rk") <= bigRows, floor((col("rk") + q) / (q + 1)))
          .otherwise(r + floor((col("rk") - bigRows + q - 1) / q))
          .cast(LongType).as("quartile"))
      .orderBy("event_id")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: count of (from_event, to_event) adjacencies in per-user
    * time order, with the transition probability as a per-from share —
    * the behavioral-model summary (and the generator for sequence-aware
    * sampling). One keyed lag window + a #types²-bounded agg; ties on
    * identical timestamps break by event_id so the sequence is total-
    * ordered on both engines.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sw = Window.partitionBy("from_event")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_event", lag(col("event_type"), 1).over(w))
      .filter(col("from_event").isNotNull)
      .groupBy(col("from_event"), col("event_type").as("to_event"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        floor(col("n").cast(DoubleType) / sum(col("n")).over(sw)
          * 10000 + 0.5) / 10000)
      .orderBy("from_event", "to_event")
  }

  /** Trailing-7-day DISTINCT user count per active day — the rolling-
    * uniques series a dashboard calls WAU. Distinct-over-a-sliding-frame
    * has no native window form (count(distinct) over RANGE is
    * unsupported in every engine); the scalable shape is (user, day)
    * de-dup first — volume collapses to user-days — then a day-spine ⨝
    * user-days range join bounded by calendar x active-users, never raw
    * event volume.
    */
  def rollingDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val userDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val days = userDays.select(col("d").as("day")).distinct()
    days.join(userDays,
        col("d") <= col("day") && col("d") >= date_sub(col("day"), 6))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy("day")
  }

  /** Ordered conversion funnel view -> click -> purchase per user: a
    * user reaches a stage when the stage's event occurs strictly AFTER
    * their first event of the previous stage (the product-analytics
    * sequence-match shape, expressed as three keyed min-aggs + joins —
    * no per-user sorting, no session windows needed for first-touch
    * semantics). Counts are exact; conversion ratios use the explicit
    * floor(x*1e4 + 0.5)/1e4 quantization (identical IEEE sequence on
    * both engines — the q2_min_cost recipe). Three tiny stage counts
    * reach the driver (the pagerank node-count discipline).
    */
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("vt"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("vt"))
      .groupBy("user_id").agg(min(col("ts")).as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("ct"))
      .groupBy("user_id").agg(min(col("ts")).as("pt"))
    val (nv, nc, np) = (v.count(), c.count(), p.count())
    def conv(n: Long, prev: Long): Double =
      if (prev == 0) 0.0
      else math.floor(n.toDouble / prev * 10000 + 0.5) / 10000
    import spark.implicits._
    Seq((1L, "view", nv, 1.0),
      (2L, "click_after_view", nc, conv(nc, nv)),
      (3L, "purchase_after_click", np, conv(np, nc)))
      .toDF("stage_idx", "stage", "n_users", "conv_rate")
      .orderBy("stage_idx")
  }

  /** Weekly cohort retention: users grouped by their first-activity
    * week; for each (cohort, week offset), the fraction of the cohort
    * active that week — the classic retention triangle, built from two
    * keyed aggs and one join (first-touch per user, distinct
    * user-weeks), all exact integers until the final quantized ratio
    * (the floor(x*1e4+0.5)/1e4 recipe).
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("user_id"), col("ts"))
    val firsts = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val activity = e
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    val counts = activity.join(firsts, "user_id")
      .select(col("cohort"),
        (datediff(col("w"), col("cohort")) / 7).cast(LongType)
          .as("week_offset"))
      .groupBy("cohort", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    counts.join(sizes, "cohort")
      .select(col("cohort"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (floor(col("n_active").cast(DoubleType) / col("cohort_size")
          * 10000 + 0.5) / 10000).as("retention"))
      .orderBy("cohort", "week_offset")
  }

  /** SCD Type-2 dimension build (Kimball): collapse each customer's
    * order-status observations into validity intervals — keep only
    * change rows (status != previous), stamp valid_from/valid_to from
    * the change date and its lead, flag the open interval. The
    * warehouse "history table from event stream" shape: two keyed
    * windows over the same (custkey, date) partition-order, everything
    * exact types. Multi-order days collapse to min(status) per day
    * first, so the observation stream is unambiguous on both engines.
    */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(min(col("o_orderstatus")).as("status"))
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
    val changes = obs
      .withColumn("prev", lag(col("status"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
    val wc = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
    changes
      .select(col("o_custkey"), col("status"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(wc).as("valid_to"),
        row_number().over(wc).cast(LongType).as("version"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "valid_from")
  }

  def windowFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("first_price", first(col("o_totalprice")).over(w))
      .withColumn("last_price", last(col("o_totalprice")).over(w))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
      .drop("o_orderdate", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Trailing 30-day RANGE-frame moving aggregate per customer — the
    * time-windowed running metric (moving spend) the ROWS-frame family
    * (windowLag) cannot express: the frame is bounded by event-time
    * distance, not row count. Spark needs a numeric range key, so the
    * order column is epoch seconds; the monetary sum runs in
    * DECIMAL(12,2) inside the frame (exact, order-independent) and casts
    * to DOUBLE at the edge — the engine-equivalence discipline of the
    * relational family. One customer-keyed shuffle; frames are per-key
    * and bounded by order density, never corpus-wide.
    */
  def windowMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        col("o_totalprice"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("sum_30d",
        sum(col("o_totalprice").cast(dec12)).over(w).cast(DoubleType))
      .select(col("o_custkey"), col("o_orderkey"), col("n_30d"),
        col("sum_30d"),
        round(col("sum_30d") / col("n_30d"), 4).as("avg_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Gap-filled daily resample of the order series + a 7-day moving sum
    * — the time-series regularization pass (a ROWS window over a SPARSE
    * series silently spans gaps; resampling onto a dense date spine is
    * what makes "last 7 days" mean calendar days). The spine comes from
    * a 1-row min/max agg exploded by `sequence` — CALENDAR-sized (rows =
    * span days, independent of data volume), so the left join broadcasts
    * the daily totals against it and the ordering window is bounded by
    * the calendar, not the corpus. Revenue stays DECIMAL through the
    * window and casts to DOUBLE at the edge (exact on both engines).
    */
  def resampleDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice"))
    val daily = o.groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec12)).as("rev_dec"))
    val spine = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev_dec"), lit(0).cast(dec12)).as("rd"))
      .withColumn("rev7", sum(col("rd")).over(w).cast(DoubleType))
      .select(col("day"), col("n_orders"),
        col("rd").cast(DoubleType).as("revenue"), col("rev7"))
      .orderBy("day")
  }

  /** CUBE lattice over Q1's grouping — all four grouping-set levels with
    * `grouping_id` labels. Same map-side-partial shape as q1/rollup; the
    * lattice multiplies the tiny group count only.
    */
  def q1Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast(LongType).as("gid"),
        sum(col("l_quantity").cast(dec12)).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS over DISJOINT axes — ((returnflag),
    * (linestatus), ()) is expressible as neither rollup nor cube (no
    * nesting, no full cross), the one grouping-lattice shape
    * [[q1Rollup]]/[[q1Cube]] don't exercise. Same Expand-based plan
    * class: one scan, the lattice multiplies rows only by its 3 sets.
    */
  def q1Sets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast(LongType).as("gid"),
        sum(col("l_quantity").cast(dec12)).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Set intersection: (user, hour) slots with BOTH a click and a purchase —
    * the INTERSECT twin of [[exceptUsers]] (distinct per side, hash
    * semi-join on the composite key).
    */
  def intersectUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    def slots(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), hour(col("ts")).cast(LongType).as("hour"))
      .distinct()
    slots("click").intersect(slots("purchase")).orderBy("user_id", "hour")
  }

  /** Exact interpolated percentiles per key — the distribution profile a
    * pipeline computes before setting thresholds/buckets. `percentile` is
    * Spark's exact linear-interpolation aggregate (matches DuckDB's
    * quantile_cont); at 100 TB swap for approx_percentile when the exactness
    * isn't worth the per-group sort — same query shape.
    */
  /** History/delta split point for [[aggIncremental]] — the last five
    * days of the 30-day events table arrive as the "new partition".
    */
  private val IncrementalCutoff = "2024-01-26 00:00:00"

  /** Incremental aggregate maintenance — the contract that lets a daily
    * 100 TB pipeline ship per-key metrics WITHOUT recomputing history:
    * per-user partial aggregates are built separately over the history
    * partition (`ts < cutoff`, in the recurring shape a persisted store)
    * and the delta partition, then MERGED by re-aggregating the union of
    * the two partial frames with each metric's merge function. Every
    * emitted metric is chosen mergeable: counts and micro-integer sums
    * add; min/max timestamps combine by min/max; first/last event types
    * ride min/max over `struct(ts, event_id, event_type)` (event_id
    * makes the order total, so the struct extremum IS the arg-min/max).
    * The driver oracle recomputes from the full log — the hash match is
    * the proof that merge(partials) ≡ recompute.
    *
    * Scale: both partial aggregations are map-side-combined keyed aggs
    * over ONE partition-pruned scan each (at 100 TB the history side is
    * a key-sized stored frame, not a scan), and the merge re-agg is over
    * two key-sized frames — delta-sized work end to end.
    */
  def aggIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        floor(col("value") * 100d + 0.5d).cast(LongType).as("v_c"))
    def partials(part: DataFrame): DataFrame = part
      .groupBy("user_id")
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("v_c")).as("sum_c"),
        // ts is TIMESTAMP_NTZ; the cast interprets it in the session tz
        // (UTC everywhere here), matching DuckDB's naive epoch_us
        min(unix_micros(col("ts").cast("timestamp"))).as("min_ts_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("max_ts_us"),
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .as("first_s"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("last_s"))
    val cutoff = lit(IncrementalCutoff).cast("timestamp_ntz")
    val hist = partials(e.filter(col("ts") < cutoff))
    val delta = partials(e.filter(col("ts") >= cutoff))
    hist.unionByName(delta)
      .groupBy("user_id")
      .agg(sum(col("n")).as("n_events"),
        sum(col("sum_c")).as("sum_value_c"),
        min(col("min_ts_us")).as("min_ts_us"),
        max(col("max_ts_us")).as("max_ts_us"),
        min(col("first_s")).getField("event_type").as("first_type"),
        max(col("last_s")).getField("event_type").as("last_type"))
      .orderBy("user_id")
  }

  private[graft] def aggIncrementalOracleSql: String =
    s"""WITH r AS (SELECT user_id, value, ts, event_id, event_type,
  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
  FROM events)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c,
  CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
  CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us,
  max(CASE WHEN rf = 1 THEN event_type END) AS first_type,
  max(CASE WHEN rl = 1 THEN event_type END) AS last_type
FROM r GROUP BY user_id ORDER BY user_id"""

  /** Z-order (Morton) data-layout audit — the locality argument behind
    * multi-dimensional clustering of a 100 TB table: interleave the low
    * 16 bits of (l_partkey, l_suppkey) into a 32-bit Morton key, bucket
    * by `z >> 14` (dropping 7 interleaved bit-pairs, so every bucket is
    * EXACTLY a 128×128 tile of the key plane), and report each bucket's
    * bounding box over BOTH dimensions. Because the Morton curve is
    * locality-preserving, every bucket's (span_part × span_supp) box is
    * ≤ 16384 cells regardless of data volume — which is exactly why
    * parquet min/max column stats on a z-clustered layout prune scans
    * for predicates on EITHER key (a single-column sort prunes only its
    * leading column). The emitted per-bucket boxes are the audit that a
    * writer using this key would achieve that pruning.
    *
    * Scale: one scan (the interleave is 32 codegen'd integer ops per
    * row), one map-side-combined keyed agg to at most 2^18 = 262,144
    * bucket rows (a 32-bit Morton key >> 14) — tile-count-bounded,
    * never data-volume-bounded. At real key widths the inputs are first
    * rank-quantized to 16 bits; the masked demo keys fit directly at
    * these SFs.
    */
  def zorderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_partkey").bitwiseAND(lit(65535L))
    val y = col("l_suppkey").bitwiseAND(lit(65535L))
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    Tables.lineitem(spark, sfDir)
      .select(x.as("px"), y.as("py"), shiftright(z, 14).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        min(col("px")).as("min_part"), max(col("px")).as("max_part"),
        min(col("py")).as("min_supp"), max(col("py")).as("max_supp"))
      .select(col("bucket"), col("n_rows"),
        col("min_part"), col("max_part"), col("min_supp"), col("max_supp"),
        ((col("max_part") - col("min_part") + 1)
          * (col("max_supp") - col("min_supp") + 1)).as("bbox_area"))
      .orderBy("bucket")
  }

  /** The DuckDB replay of [[zorderStats]] (same unrolled interleave). */
  private[graft] def zorderStatsOracleSql: String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(s"(((x >> $i) & 1) << ${2 * i})",
        s"(((y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
    s"""WITH b AS (SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y FROM lineitem),
z AS (SELECT x AS px, y AS py, ($terms) >> 14 AS bucket FROM b)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
  min(px) AS min_part, max(px) AS max_part,
  min(py) AS min_supp, max(py) AS max_supp,
  (max(px) - min(px) + 1) * (max(py) - min(py) + 1) AS bbox_area
FROM z GROUP BY bucket ORDER BY bucket"""
  }

  def statsQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
}
