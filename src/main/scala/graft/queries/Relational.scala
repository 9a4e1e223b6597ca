package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Relational core (SURVEY.md §2.2 / §2.4 Q4–Q14): filters, joins, aggs,
  * windows, set ops, scalar functions. Each query has an adjacent DuckDB
  * oracle SQL producing a hash-identical result on the same parquet tables.
  *
  * Scale notes (100 TB): every query is declarative DataFrame code — Catalyst
  * pushes filters/projections into the parquet scan, aggregations run
  * partial+final, small dimension tables are broadcast explicitly, and no
  * driver-side materialization happens anywhere.
  */
object Relational {

  /** Q4 — filter + project; predicate and 4-column projection both push into
    * the parquet scan (verify via .explain: PushedFilters + ReadSchema). */
  def q4FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1997-01-01").cast(TimestampType))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q4Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Q5 — TPC-H Q1-shaped hash aggregation (partial+final, map-side combine).
    * Sums are exact decimal (order-independent) cast to double at the end. */
  def q5HashAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney2(col("l_quantity")).as("sum_qty"),
        sumMoney2(col("l_extendedprice")).as("sum_base_price"),
        sumMoney6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sumMoney6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec6(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q5Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q6 — equi join + agg. customer is ~1% of orders → broadcast it; the agg
    * then needs only one shuffle (on c_mktsegment, 5 groups). */
  def q6JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sumMoney2(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val q6Sql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Q7 — multi-join chain (TPC-H Q5 shape). All dimensions (customer,
    * nation, region) broadcast → lineitem⋈orders is the only shuffle join,
    * and with AQE it stays a single big-table pipeline. */
  def q7MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = t(spark, dir, "customer")
    val n  = t(spark, dir, "nation")
    val r  = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .groupBy(col("n_name"))
      .agg(sumMoney6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q7Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q8 — left anti join: customers with no orders. Builds the same
    * insert-if-absent primitive the reference gets from ON CONFLICT
    * (reference dags/etl.py:70-75); broadcast the distinct keys. */
  def q8AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val urgent = o.filter(col("o_orderpriority").startsWith("1"))
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q8Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%')
      |ORDER BY c_custkey""".stripMargin

  /** Q9 — window top-k: top-3 orders per customer by totalprice; tie-broken
    * on o_orderkey so ranking is deterministic. */
  def q9WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q9Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Q10 — rollup. Rollup-generated NULLs are coalesced to 'ALL' so the sort
    * order is engine-independent (Spark sorts NULLS FIRST, DuckDB NULLS LAST). */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumMoney2(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              col("n"), col("total"))
      .orderBy(col("priority"), col("status"))

  val q10Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |       coalesce(o_orderstatus, 'ALL') AS status,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Q11 — exact vs approximate distinct. The HLL++ estimate itself is
    * engine-specific, so the hashed output carries the exact count plus a
    * boolean asserting the estimate landed within 5% (the scored contract). */
  def q11DistinctHll(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("n_exact"),
           approx_count_distinct(col("l_partkey")).as("n_approx"))
      .select(col("n_exact"),
              (abs(col("n_approx") - col("n_exact")).cast(DoubleType) /
                col("n_exact") <= 0.05).as("approx_ok"))

  val q11Sql: String =
    "SELECT count(DISTINCT l_partkey) AS n_exact, true AS approx_ok FROM lineitem"

  /** Q12 — global sort + limit (Spark runs TakeOrderedAndProject: per-partition
    * top-k then a k-row merge on the driver — no full sort at 100 TB). */
  def q12SortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .limit(10)

  val q12Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  /** Q13 — set ops: customers that ordered EXCEPT customers with negative
    * balance (EXCEPT is distinct-semantics in both engines). */
  def q13SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    val neg = t(spark, dir, "customer").filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    o.except(neg).orderBy(col("custkey"))
  }

  val q13Sql: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      |ORDER BY custkey""".stripMargin

  /** Q14 — scalar-function battery: string, date, math. Every expression is
    * whole-stage-codegen'd; doubles from libm (sqrt/ln) are rounded to 1e-6
    * before hashing since only sqrt is IEEE-exact across platforms. */
  def q14ScalarFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 8)).as("prio_up"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tagged"),
        length(col("o_orderpriority")).cast(LongType).as("prio_len"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).as("prio_num"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("mon_start"),
        datediff(col("o_orderdate"), lit("1994-01-01").cast(DateType)).cast(LongType).as("days_since"),
        (col("o_orderkey") % 7).as("key_mod"),
        col("o_totalprice").cast(DecimalType(18, 4)).multiply(new java.math.BigDecimal("1.1")).cast(DecimalType(18, 4)).cast(DoubleType).as("price_up"),
        floor(col("o_totalprice")).as("price_floor"),
        round6(sqrt(col("o_totalprice"))).as("price_sqrt"),
        round6(log(col("o_totalprice") + 1.0)).as("price_ln"))
      .orderBy(col("o_orderkey"))

  val q14Sql: String =
    """SELECT o_orderkey,
      |  upper(substr(o_orderpriority, 1, 8)) AS prio_up,
      |  concat_ws('#', o_orderstatus, o_orderpriority) AS tagged,
      |  length(o_orderpriority) AS prio_len,
      |  regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_num,
      |  year(o_orderdate) AS yr,
      |  month(o_orderdate) AS mo,
      |  dayofmonth(o_orderdate) AS dom,
      |  date_trunc('month', o_orderdate) AS mon_start,
      |  date_diff('day', DATE '1994-01-01', o_orderdate) AS days_since,
      |  o_orderkey % 7 AS key_mod,
      |  CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(2,1)) AS DECIMAL(18,4)) AS DOUBLE) AS price_up,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(floor(sqrt(o_totalprice) * 1000000.0) AS DOUBLE) / 1000000.0 AS price_sqrt,
      |  CAST(floor(ln(o_totalprice + 1.0) * 1000000.0) AS DOUBLE) / 1000000.0 AS price_ln
      |FROM orders WHERE o_orderkey % 10 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** Q25 — generator / lateral view: posexplode the token stream of every
    * document into per-token rows, then aggregate the inverted view (doc
    * frequency, occurrence count, earliest position). The explode is
    * pipelined inside whole-stage codegen — no materialized intermediate. */
  def q25Explode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_occurrences"),
           min(col("pos")).cast(LongType).as("min_pos"))
      .orderBy(col("tok"))

  val q25Sql: String =
    """SELECT tok, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences,
      |  CAST(min(pos) AS BIGINT) AS min_pos
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |             unnest(range(len(string_split(text, ' ')))) AS pos
      |      FROM documents)
      |GROUP BY tok ORDER BY tok""".stripMargin

  /** Q26 — window FRAMES (running/analytic, not just ranking): per-customer
    * running revenue (ROWS UNBOUNDED PRECEDING — an exact decimal sum, so
    * the running values are order-independent-exact at every prefix), plus
    * lag-based previous price and day gap. One shuffle on o_custkey serves
    * all three window functions (same window spec). */
  def q26WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_total", sum(dec2(col("o_totalprice"))).over(frame).cast(DoubleType))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast(LongType))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
        col("running_total"), col("prev_price"), col("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q26Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      |  CAST(date_diff('day',
      |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS BIGINT) AS gap_days
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q44 — value-based RANGE window frame (q26 covers ROWS frames; RANGE
    * is distinct semantics: the frame is bounded by ORDER-KEY VALUE
    * distance, and all peers of the current value are always included —
    * with same-day orders the frame is identical for every peer
    * regardless of row position, which a ROWS frame cannot express).
    * Trailing-30-day order count and exact-decimal revenue per customer,
    * ordered by an integer day number so the frame bound is pure integer
    * arithmetic in both engines (Spark's calendar-interval range bounds
    * are not needed and date-fn drift is impossible). One shuffle on
    * o_custkey serves both window aggregates. */
  def q44RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-30, Window.currentRow)
    t(spark, dir, "orders")
      .withColumn("day_num",
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast(LongType))
      .select(col("o_custkey"), col("o_orderkey"), col("day_num"), col("o_totalprice"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("rev_30d", sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType))
      .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
        col("n_30d"), col("rev_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q44Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |    AS day_num,
      |  count(*) OVER w AS n_30d,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rev_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q27 — pivot: order counts per year × status, statuses as columns.
    * Explicit pivot value list keeps the plan a single pass (no value
    * discovery job); the oracle is the equivalent FILTERed aggregate. */
  def q27Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")).cast(LongType))
      .groupBy(col("yr")).pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy(col("yr"))

  val q27Sql: String =
    """SELECT year(o_orderdate) AS yr,
      |  count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
      |  count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
      |  count(*) FILTER (o_orderstatus = 'P') AS p_cnt
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q28 — discrete percentiles (p50/p90 order value per priority).
    * percentile_disc RETURNS AN ELEMENT (the SQL-standard "first value
    * with cume_dist >= p") — no interpolation arithmetic, so the result
    * is cross-engine exact where an interpolated percentile_cont's
    * last-ulp float math is not. The oracle states the definition
    * explicitly via cume_dist rather than trusting another engine's
    * quantile index convention. */
  def q28Percentiles(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q28")
    spark.sql(
      """SELECT o_orderpriority,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90,
        |  count(*) AS n
        |FROM orders_q28 GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  val q28Sql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, o_totalprice AS v,
      |    cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
      |  FROM orders)
      |SELECT o_orderpriority,
      |  min(v) FILTER (cd >= 0.5) AS p50,
      |  min(v) FILTER (cd >= 0.9) AS p90,
      |  count(*) AS n
      |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q29 — correlated scalar subquery: orders 50% above their customer's
    * average order value. Catalyst decorrelates the subquery into an
    * aggregate + join (no per-row re-execution); the average is an exact
    * decimal sum / count so the comparison value is cross-engine stable. */
  def q29Correlated(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_q29")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_q29 o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM orders_q29 o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q29Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Q30 — left OUTER join preserving unmatched rows: every customer with
    * their order count/revenue, zero-order customers kept with coalesced
    * zeros. Aggregate-then-join (the pre-aggregated side is one row per
    * customer), so the outer join's build side is small and the fact table
    * never re-shuffles after its groupBy. */
  def q30OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sumMoney2(col("o_totalprice")).as("revenue"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("c_custkey"))
  }

  val q30Sql: String =
    """SELECT c_custkey, c_name,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(revenue, 0.0) AS revenue
      |FROM customer c LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |  FROM orders GROUP BY o_custkey) o
      |ON c.c_custkey = o.o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Q32 — INTERSECT (set-distinct semantics, completing Q13's EXCEPT):
    * customers who placed orders in both 1995 and 1996. Planned as a
    * left-semi aggregate pair — distinct-then-join, shuffle bounded by
    * distinct key count. */
  def q32Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def keysIn(yr: Int) = o.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
    keysIn(1995).intersect(keysIn(1996)).orderBy(col("o_custkey"))
  }

  val q32Sql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |ORDER BY o_custkey""".stripMargin

  /** Q33 — histogram / binned aggregation: order-value distribution in
    * fixed $25k bins. Binning is a pure projection (floor division), so
    * the shuffle carries one row per bin — the constant-size-output shape
    * monitoring queries need at any scale. */
  def q33Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("bin", (floor(col("o_totalprice") / 25000.0) * 25000).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sumMoney2(col("o_totalprice")).as("bin_total"))
      .orderBy(col("bin"))

  val q33Sql: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) * 25000 AS BIGINT) AS bin,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q37 — distribution ranking functions: ntile / percent_rank /
    * cume_dist per customer (completes the window battery next to q9's
    * row_number/rank and q26's frames/lag). All three are deterministic
    * here: the window orders by the unique o_orderkey, and both ratio
    * functions are ONE IEEE divide of exact integers ((rank-1)/(n-1),
    * rows≤current/n) — bit-identical across engines. The window is
    * partitioned by customer (never a global single-partition sort), so
    * the plan is one shuffle on o_custkey at any scale. */
  def q37RankFns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q37Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q38 — salted two-phase aggregation, oracle-scored: the engine's skew
    * machinery ([[graft.operators.Salting.saltedSumCount]]) producing the
    * same answer as a plain GROUP BY. The plan is the point: shuffle on
    * (key, salt) spreads any hot key over `saltBuckets` reducers, then a
    * second tiny exchange on key merges partials — exact for the algebraic
    * (count, decimal-sum) pair regardless of salt routing. The oracle is
    * the unsalted SQL, so correctness-under-salting is hash-gated, not
    * just law-tested (SaltingSpec keeps the Spark-vs-Spark equality law). */
  def q38SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Salting.saltedSumCount(
        t(spark, dir, "events"), col("event_type"), col("value"))
      .orderBy(col("key"))

  val q38Sql: String =
    """SELECT event_type AS key, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q39 — FULL OUTER join: per-customer order counts in the corpus's
    * first (1995) vs last (2001) year, keeping customers active in only
    * one of them (both null branches are real at every SF: hundreds of
    * rows unmatched on each side). Completes the join matrix next to
    * inner (q6), left outer (q30), semi (q18) and anti (q8). With
    * `Seq("custkey")` the join key coalesces to one non-null column, so
    * the null semantics under test are the PAYLOAD columns of the
    * unmatched sides — the classic full-outer hazard. Plan: both sides
    * are same-key aggregates, so the join reuses the aggregation's
    * hash-partitioning — shuffle on custkey twice (agg), zero extra
    * exchanges for the join itself at any scale. */
  def q39FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def perCust(yr: Int, as: String) =
      o.filter(year(col("o_orderdate")) === yr)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as(as))
    perCust(1995, "n_first").join(perCust(2001, "n_last"), Seq("custkey"), "full_outer")
      .orderBy(col("custkey"))
  }

  val q39Sql: String =
    """WITH a AS (SELECT o_custkey AS custkey, count(*) AS n_first
      |           FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
      |b AS (SELECT o_custkey AS custkey, count(*) AS n_last
      |      FROM orders WHERE year(o_orderdate) = 2001 GROUP BY 1)
      |SELECT coalesce(a.custkey, b.custkey) AS custkey, n_first, n_last
      |FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
      |ORDER BY custkey""".stripMargin

  /** Q40 — higher-order array functions as a unit: lambda transform /
    * filter / aggregate / exists over each doc's token array, computed
    * WITHOUT exploding (q25 is the explode path; here the array never
    * leaves the row, so there is no fan-out shuffle at all — the whole
    * query is one codegen projection + a scan). The same lambda surface
    * DuckDB exposes as list_transform/list_filter/list_sum, so the
    * semantics are hash-gated cross-engine. All outputs are exact
    * integers/booleans. */
  def q40HigherOrder(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(
        col("doc_id"),
        size(col("ts")).cast(LongType).as("n_tok"),
        expr("cast(size(filter(ts, x -> length(x) >= 5)) as bigint)").as("n_long"),
        expr("cast(aggregate(transform(ts, x -> length(x)), 0, (a, x) -> a + x) as bigint)")
          .as("total_chars"),
        expr("exists(ts, x -> x = 'spark')").as("has_spark"))
      .orderBy(col("doc_id"))

  val q40Sql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
      |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tok,
      |  CAST(len(list_filter(ts, x -> length(x) >= 5)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(ts, x -> length(x))) AS BIGINT) AS total_chars,
      |  len(list_filter(ts, x -> x = 'spark')) > 0 AS has_spark
      |FROM tk ORDER BY doc_id""".stripMargin

  /** Q41 — UNPIVOT (wide→long melt), the inverse of q27's pivot: per-
    * customer order counts for 1995–1997 as three aggregate columns,
    * melted back to (customer, year-name, count) rows, zero cells dropped
    * so the long form states facts, not absences. Spark lowers `unpivot`
    * to Expand — a narrow per-row fan-out of 3 with NO exchange of its
    * own, so the whole query carries exactly the aggregation's one
    * shuffle (asserted in PlanSpec). Hash-gated against DuckDB's
    * `UNPIVOT … INTO NAME … VALUE …` surface; the variable column takes
    * the source COLUMN NAMES as values in both engines. */
  def q41Unpivot(spark: SparkSession, dir: String): DataFrame = {
    def yCount(yr: Int) =
      sum(when(year(col("o_orderdate")) === yr, 1L).otherwise(0L)).as(s"y$yr")
    t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(yCount(1995), yCount(1996), yCount(1997))
      .unpivot(
        Array(col("o_custkey")),
        Array(col("y1995"), col("y1996"), col("y1997")),
        "yr", "n_orders")
      .filter(col("n_orders") > 0)
      .orderBy(col("o_custkey"), col("yr"))
  }

  val q41Sql: String =
    """WITH wide AS (
      |  SELECT o_custkey,
      |    CAST(sum(CASE WHEN year(o_orderdate)=1995 THEN 1 ELSE 0 END) AS BIGINT) AS y1995,
      |    CAST(sum(CASE WHEN year(o_orderdate)=1996 THEN 1 ELSE 0 END) AS BIGINT) AS y1996,
      |    CAST(sum(CASE WHEN year(o_orderdate)=1997 THEN 1 ELSE 0 END) AS BIGINT) AS y1997
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, yr, n_orders
      |FROM (UNPIVOT wide ON y1995, y1996, y1997 INTO NAME yr VALUE n_orders)
      |WHERE n_orders > 0 ORDER BY o_custkey, yr""".stripMargin

  /** Q42 — RECURSIVE CTE (Spark 4's iterative UnionLoop execution): an
    * 80-month calendar spine generated by recursion (1995-01..2001-08,
    * the orders table's full date range at every SF), left-joined against
    * per-month order counts so ZERO-ORDER months surface as explicit
    * rows — the dense-calendar-spine shape reporting queries need and
    * plain GROUP BY cannot produce (it has no row to group where no
    * order exists). All spine arithmetic is integer (yr = 1995 + i div
    * 12), no date-function drift between engines; revenue is the exact
    * decimal sum cast back to double. The recursion is driver-free: the
    * loop runs inside Catalyst as UnionLoop, and the join is a broadcast
    * hash join between two ≤ 80-row frames (PlanSpec asserts both) — at
    * any corpus scale the only real work is the one orders aggregation. */
  def q42RecursiveSpine(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("graft_q42_orders")
    spark.sql(
      """WITH RECURSIVE m(i) AS (
        |  SELECT 0 UNION ALL SELECT i + 1 FROM m WHERE i < 79),
        |mm AS (SELECT cast(1995 + (i div 12) AS bigint) AS yr,
        |              cast(1 + (i % 12) AS bigint) AS mo FROM m),
        |oc AS (SELECT cast(year(o_orderdate) AS bigint) AS yr,
        |              cast(month(o_orderdate) AS bigint) AS mo,
        |              count(*) AS n,
        |              cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS rev
        |       FROM graft_q42_orders GROUP BY 1, 2)
        |SELECT mm.yr, mm.mo,
        |  coalesce(oc.n, cast(0 AS bigint)) AS n_orders,
        |  coalesce(oc.rev, cast(0.0 AS double)) AS revenue
        |FROM mm LEFT JOIN oc ON mm.yr = oc.yr AND mm.mo = oc.mo
        |ORDER BY mm.yr, mm.mo""".stripMargin)
  }

  val q42Sql: String =
    """WITH RECURSIVE m(i) AS (
      |  SELECT 0 UNION ALL SELECT i + 1 FROM m WHERE i < 79),
      |mm AS (SELECT CAST(1995 + i // 12 AS BIGINT) AS yr,
      |              CAST(1 + i % 12 AS BIGINT) AS mo FROM m),
      |oc AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |              CAST(month(o_orderdate) AS BIGINT) AS mo,
      |              count(*) AS n,
      |              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |       FROM orders GROUP BY 1, 2)
      |SELECT mm.yr, mm.mo,
      |  coalesce(oc.n, 0) AS n_orders, coalesce(oc.rev, 0.0) AS revenue
      |FROM mm LEFT JOIN oc ON mm.yr = oc.yr AND mm.mo = oc.mo
      |ORDER BY mm.yr, mm.mo""".stripMargin

  /** Q31 — MAP scalar functions: per year, a status→count map built with
    * map_from_entries over sorted entries, then consumed via size /
    * element_at / map_keys. Maps stay INTERNAL to the plan (entry order is
    * engine-specific, so a raw map column is not hash-comparable); only
    * scalar lookups and the sorted key list reach the output. The oracle
    * computes the same result relationally — the point is that Spark's map
    * type produces the correct values, checked against map-free SQL. */
  def q31MapFns(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")).cast(LongType))
      .groupBy(col("yr"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    per.groupBy(col("yr"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderstatus"), col("n"))))).as("m"))
      .select(col("yr"),
        size(col("m")).cast(LongType).as("n_statuses"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("f_cnt"),
        coalesce(element_at(col("m"), "O"), lit(0L)).as("o_cnt"),
        coalesce(element_at(col("m"), "P"), lit(0L)).as("p_cnt"),
        concat_ws(",", map_keys(col("m"))).as("statuses"))
      .orderBy(col("yr"))
  }

  val q31Sql: String =
    """WITH per AS (
      |  SELECT year(o_orderdate) AS yr, o_orderstatus AS s, count(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT yr, count(*) AS n_statuses,
      |  CAST(coalesce(sum(n) FILTER (s = 'F'), 0) AS BIGINT) AS f_cnt,
      |  CAST(coalesce(sum(n) FILTER (s = 'O'), 0) AS BIGINT) AS o_cnt,
      |  CAST(coalesce(sum(n) FILTER (s = 'P'), 0) AS BIGINT) AS p_cnt,
      |  string_agg(s, ',' ORDER BY s) AS statuses
      |FROM per GROUP BY yr ORDER BY yr""".stripMargin

  /** Q45 — frequent-items sketch gate (Karp/Misra-Gries family via
    * `df.stat.freqItems`). Scored the way q11 scores HLL and q36 scores the
    * GK sketch: on the sketch's CONTRACT, not its raw output. freqItems
    * guarantees every item with frequency > support·n is returned (false
    * positives allowed); intersecting the returned candidates with the
    * exact counts at the same threshold therefore yields EXACTLY the true
    * heavy-hitter set — hash-gateable against plain SQL. documents.lang is
    * the discriminating column: 'en' ≈ 44% of the corpus, every other
    * language ≤ 15%, so support 0.25 separates cleanly at every SF. The
    * single-pass sketch is the 100 TB path: one scan, no shuffle, a
    * bounded-size map per partition merged on the driver. */
  val FreqSupport = 0.25

  def q45FreqItems(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val candidates = d.stat.freqItems(Array("lang"), FreqSupport)
      .select(explode(col("lang_freqItems")).as("item"))
    val total = d.agg(count(lit(1)).as("n_total"))
    d.groupBy(col("lang").as("item")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(candidates), "item") // sketch survivors only
      .crossJoin(broadcast(total))
      .filter(col("cnt") > col("n_total") * lit(FreqSupport))
      .select(col("item"), col("cnt"))
      .orderBy(col("item"))
  }

  val q45Sql: String =
    s"""SELECT lang AS item, count(*) AS cnt FROM documents GROUP BY lang
       |HAVING count(*) > $FreqSupport * (SELECT count(*) FROM documents)
       |ORDER BY item""".stripMargin

  /** Q46 — ordered string aggregation: LISTAGG ... WITHIN GROUP (the SQL:2016
    * form, new in Spark 4). The explicit in-group ORDER BY is what makes a
    * concatenation aggregate deterministic — without it the result depends
    * on partitioning. Joined through the broadcast region dim so the agg
    * input is itself a join product, not a bare scan. */
  def q46Listagg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(expr("listagg(n_name, ',') within group (order by n_name)").as("nations"),
           count(lit(1)).cast(LongType).as("n_nations"))
      .orderBy(col("r_name"))

  val q46Sql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Q48 — statistical aggregates, exactly: Pearson correlation and the
    * least-squares line per return flag, computed from DECIMAL-EXACT
    * algebraic sums (n, Σx, Σy, Σx², Σy², Σxy — each map-side-combinable,
    * one shuffle total) with the closed-form formulas applied in double
    * only at the very end. Built-in corr/regr_* accumulate doubles in
    * partition order and are therefore not bit-reproducible across
    * engines OR across partitionings; the algebraic form is — same
    * numbers, hash-gateable, and the scale shape (partial aggregation of
    * six exact sums) is what the built-ins do anyway. */
  def q48StatsAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_returnflag"),
      dec2(col("l_quantity")).as("x"), dec2(col("l_extendedprice")).as("y"))
    val s = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
        sum(col("y") * col("y")).cast(DoubleType).as("syy"),
        sum(col("x") * col("y")).cast(DoubleType).as("sxy"))
      .withColumn("nd", col("n").cast(DoubleType))
    val num = col("nd") * col("sxy") - col("sx") * col("sy")
    val dx  = col("nd") * col("sxx") - col("sx") * col("sx")
    val dy  = col("nd") * col("syy") - col("sy") * col("sy")
    // round6: the sums are exact decimals, but the derived ratios chain
    // several mul/sub/sqrt steps where engines may legally differ in the
    // LAST ULP (e.g. FMA contraction of a*b - c*d) — observed once at
    // sf0.001. Truncate to 1e-6 on BOTH sides (determinism rule 2).
    s.select(col("l_returnflag"), col("n"),
        round6(num / sqrt(dx * dy)).as("corr"),
        round6(num / dx).as("slope"),
        round6((col("sy") - num / dx * col("sx")) / col("nd")).as("icept"))
      .orderBy(col("l_returnflag"))
  }

  val q48Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(y*y) AS DOUBLE) AS syy,
      |    CAST(sum(x*y) AS DOUBLE) AS sxy
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |               CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem)
      |  GROUP BY 1)
      |SELECT l_returnflag, n,
      |  floor(((nd*sxy - sx*sy) / sqrt((nd*sxx - sx*sx) * (nd*syy - sy*sy))) * 1e6) / 1e6 AS corr,
      |  floor(((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * 1e6) / 1e6 AS slope,
      |  floor(((sy - (nd*sxy - sx*sy) / (nd*sxx - sx*sx) * sx) / nd) * 1e6) / 1e6 AS icept
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** Q47 — null-skipping window navigation: lag(..., ignoreNulls) and
    * fill-forward last(..., ignoreNulls) — the gap-filling idiom (carry the
    * last observed value across missing rows) that plain lag/last cannot
    * express. Only finished ('F') orders carry a price; open orders see the
    * most recent finished price before them. Decimal-exact until the final
    * double cast; one o_custkey shuffle serves both window functions. */
  def q47IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        when(col("o_orderstatus") === "F", dec2(col("o_totalprice"))).as("f_price"))
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("f_price"), 1, null, ignoreNulls = true).over(w)
          .cast(DoubleType).as("prev_f"),
        last(col("f_price"), ignoreNulls = true).over(wf)
          .cast(DoubleType).as("fill_f"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q47Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(lag(f_price IGNORE NULLS) OVER w AS DOUBLE) AS prev_f,
      |  CAST(last_value(f_price IGNORE NULLS) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS fill_f
      |FROM (SELECT o_custkey, o_orderkey,
      |        CASE WHEN o_orderstatus = 'F'
      |             THEN CAST(o_totalprice AS DECIMAL(18,2)) END AS f_price
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Q50 — LATERAL correlated subquery with per-row ORDER BY + LIMIT: the
    * top-3 customers by account balance FOR EACH nation, written as the
    * SQL:2016 lateral join (the "top-N per group as a join" idiom ORMs and
    * BI tools emit). Catalyst DECORRELATES the limit — the executed plan
    * is one customer-side window ranked per nationkey joined back to
    * nation, not |nation| correlated executions; that rewrite is the
    * entire scale story (per-probe re-execution would be a driver loop in
    * disguise). Balance goes through DECIMAL(18,2) before the double cast
    * and ties break on c_custkey, so the top-3 sets are engine-exact. */
  def q50LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("graft_q50_nation")
    t(spark, dir, "customer").createOrReplaceTempView("graft_q50_customer")
    spark.sql(
      """SELECT n.n_name, t.c_custkey, CAST(t.bal AS DOUBLE) AS acctbal
        |FROM graft_q50_nation n,
        |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |         FROM graft_q50_customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY bal DESC, c_custkey LIMIT 3) t
        |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin)
  }

  val q50Sql: String =
    """SELECT n.n_name, t.c_custkey, CAST(t.bal AS DOUBLE) AS acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |         FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY bal DESC, c_custkey LIMIT 3) t
      |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin

  /** Q51 — mode() scored on its contract (q45's pattern for an
    * underdetermined built-in): per market segment, the modal order
    * priority. Tie CHOICE is engine-defined (Spark's deterministic mode
    * picks the lowest value, DuckDB's picks arbitrarily), so what's
    * hash-gated is the part both engines must agree on — the canonical
    * modal value under an explicit (count desc, value asc) total order,
    * its count, and the boolean that the built-in mode's frequency equals
    * that maximal count (true in any conforming engine, tie or no tie).
    * One (segment, priority) count feeds everything; the per-segment
    * frames are tiny and broadcast. */
  def q51ModeContract(spark: SparkSession, dir: String): DataFrame = {
    val joined = t(spark, dir, "orders")
      .join(broadcast(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
    val counts = joined.groupBy(col("seg"), col("prio")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // read by the max, the tie-break, and the gate
    val maxes = counts.groupBy(col("seg")).agg(max(col("cnt")).as("modal_cnt"))
    val manual = counts.join(broadcast(maxes), "seg")
      .filter(col("cnt") === col("modal_cnt"))
      .groupBy(col("seg"), col("modal_cnt")).agg(min(col("prio")).as("modal_prio"))
    val builtin = joined.groupBy(col("seg"))
      .agg(expr("mode(prio)").as("builtin_mode"))
    val gate = builtin
      .join(counts.select(col("seg"), col("prio").as("builtin_mode"), col("cnt").as("bcnt")),
        Seq("seg", "builtin_mode"))
    manual.join(gate.select(col("seg"), col("bcnt")), "seg")
      .select(col("seg"), col("modal_prio"), col("modal_cnt"),
        (col("bcnt") === col("modal_cnt")).as("builtin_is_modal"))
      .orderBy(col("seg"))
  }

  val q51Sql: String =
    """WITH j AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio
      |           FROM orders JOIN customer ON o_custkey = c_custkey),
      |counts AS (SELECT seg, prio, count(*) AS cnt FROM j GROUP BY 1, 2),
      |maxes AS (SELECT seg, max(cnt) AS modal_cnt FROM counts GROUP BY seg),
      |manual AS (SELECT c.seg, m.modal_cnt, min(c.prio) AS modal_prio
      |           FROM counts c JOIN maxes m ON c.seg = m.seg AND c.cnt = m.modal_cnt
      |           GROUP BY 1, 2),
      |b AS (SELECT seg, mode(prio) AS builtin_mode FROM j GROUP BY seg),
      |gate AS (SELECT b.seg, c.cnt AS bcnt FROM b
      |         JOIN counts c ON c.seg = b.seg AND c.prio = b.builtin_mode)
      |SELECT m.seg, m.modal_prio, m.modal_cnt,
      |  g.bcnt = m.modal_cnt AS builtin_is_modal
      |FROM manual m JOIN gate g ON g.seg = m.seg
      |ORDER BY m.seg""".stripMargin

  /** Q52 — count-min sketch, exactly replicated: depth-3 × width-64
    * counters over the document token stream, every cell defined by the
    * oracle-replicable h31 hash family (md5-derived — TextFns), so the
    * whole sketch, not just its contract, is hash-gateable. Probes are the
    * top-20 tokens by true count; for each, est = min over rows of its
    * cell, and the one-sided guarantee est ≥ true (a cell sums a SUPERSET
    * of the token's occurrences) is emitted as a per-probe boolean — the
    * law that makes count-min usable for threshold filters at 100 TB.
    *
    * Scale shape: the sketch is the point — the cell build is one
    * map-side-combined aggregation to depth·width = 192 rows (bounded
    * state regardless of corpus size) which then BROADCASTS to estimate
    * any probe set; true counts ride the token-count agg the probe
    * selection needs anyway, with top-20 as TakeOrderedAndProject (never
    * a full sort). */
  val CmDepth = 3
  val CmWidth = 64
  val CmProbes = 20

  def q52CountMin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    val tf = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // read by the cell build AND the probe top-k
    val cells = tf.select(col("tok"), col("cnt"),
        explode(expr(s"sequence(0, ${CmDepth - 1})")).as("j"))
      .select(col("j"),
        pmod(TextFns.h31(concat(lit("cm"), col("j").cast(StringType), lit(":"), col("tok"))),
          lit(CmWidth.toLong)).as("bucket"),
        col("cnt"))
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cell"))
    val probes = tf.orderBy(col("cnt").desc, col("tok")).limit(CmProbes)
    probes.select(col("tok"), col("cnt").as("true_cnt"), explode(expr(
        s"sequence(0, ${CmDepth - 1})")).as("j"))
      .withColumn("bucket",
        pmod(TextFns.h31(concat(lit("cm"), col("j").cast(StringType), lit(":"), col("tok"))),
          lit(CmWidth.toLong)))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("tok"), col("true_cnt")).agg(min(col("cell")).as("est_cnt"))
      .select(col("tok"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") >= col("true_cnt")).as("one_sided_ok"))
      .orderBy(col("tok"))
  }

  val q52Sql: String = {
    import graft.functions.TextFns
    val h = TextFns.h31Sql("'cm' || CAST(j AS VARCHAR) || ':' || tok")
    s"""WITH tf AS (SELECT tok, count(*) AS cnt
       |            FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |            GROUP BY tok),
       |cells AS (SELECT j, $h % $CmWidth AS bucket, CAST(sum(cnt) AS BIGINT) AS cell
       |          FROM tf, unnest(range(0, $CmDepth)) AS r(j) GROUP BY 1, 2),
       |probes AS (SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok LIMIT $CmProbes),
       |est AS (SELECT p.tok, p.cnt AS true_cnt, min(c.cell) AS est_cnt
       |        FROM probes p, unnest(range(0, $CmDepth)) AS r(j), cells c
       |        WHERE c.j = r.j
       |          AND c.bucket = ${TextFns.h31Sql("'cm' || CAST(r.j AS VARCHAR) || ':' || p.tok")} % $CmWidth
       |        GROUP BY 1, 2)
       |SELECT tok, CAST(true_cnt AS BIGINT) AS true_cnt, est_cnt,
       |  est_cnt >= true_cnt AS one_sided_ok
       |FROM est ORDER BY tok""".stripMargin
  }

  // ---- Q53: HLL sketch build → merge → estimate gate ---------------------

  /** Mergeable distinct-count sketches — the 100 TB shape for COUNT(DISTINCT)
    * rollups: per-nation Datasketches HLL sketches of ordering customers are
    * built in one pass (partial+final agg), then UNIONED up to region level
    * without ever revisiting the raw rows. The estimate is gated against the
    * exact per-region distinct in-plan (q36's sketch-gate contract: the
    * oracle scores the exact value + the gate verdict, since DuckDB cannot
    * reproduce Datasketches bytes). lgK=12 → ~1.6% standard error; the gate
    * allows 5% + 2. */
  def q53HllUnion(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val ordCust = t(spark, dir, "orders")
      .select(col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    val nat = t(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val perNation = ordCust
      .groupBy(col("c_nationkey"))
      .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"),
           expr("count(distinct c_custkey)").as("n_exact_nation"))
    perNation
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region_key"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
           sum(col("n_exact_nation")).as("n_exact"))
      .select(col("region_key"), col("n_exact").cast(LongType).as("n_customers"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * lit(0.05) + lit(2.0))
          .as("within_err"))
      .orderBy(col("region_key"))
  }

  /** Customers are partitioned by nation, so the per-nation exact distincts
    * sum to the per-region exact distinct — which is what the engine's
    * n_customers column carries; within_err is the sketch-gate verdict. */
  val q53Sql: String =
    """SELECT n_regionkey AS region_key,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |  true AS within_err
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY region_key""".stripMargin

  // ---- Q54: distribution window functions --------------------------------

  /** ntile / percent_rank / cume_dist over a deterministic (unique-key
    * tie-broken) ordering. With a unique ORDER BY, percent_rank is
    * (rn-1)/(n-1) and cume_dist is rn/n — single IEEE divisions of exact
    * integers, so the doubles are bit-identical across engines. One window
    * sort per partition; at scale the partition key (priority) fans out
    * across executors and no partition exceeds its natural share. */
  def q54DistFns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast(LongType).as("bucket4"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  val q54Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS bucket4,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---- Q61: z-order (Morton curve) locality audit -------------------------

  /** Z-order clustering key over (l_partkey, l_suppkey) — the multi-dim
    * data-layout primitive: interleave the low 16 bits of each dimension
    * into a Morton code, bucket the curve, and report each bucket's
    * per-dimension min/max envelope. Tight envelopes are exactly what makes
    * z-ordered files skippable by BOTH predicates' min/max stats, which a
    * single-column sort gives only for its leading column.
    *
    * Scale shape: the Morton code is a pure integer projection built from
    * the classic shift-and-mask bit spread (4 shift/or/and steps per
    * dimension) — plain codegen'd arithmetic, deliberately NOT an
    * `aggregate` fold over bit positions (higher-order array functions
    * don't participate in whole-stage codegen; the fold form measured 3.1 s
    * at sf0.1 — BASELINE.md records the spread's time). The audit
    * aggregation is one
    * partial+final shuffle on the bucket. In production the code feeds
    * `repartitionByRange(z)` + sortWithinPartitions before the write — the
    * layout move itself; this query scores the code + envelope math. */
  def q61ZOrder(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(expr("l_partkey & 65535").as("p"),
              expr("cast(l_suppkey as bigint) & 65535").as("s"))
      // spread 16 bits of each dim to even positions: 0x00FF00FF,
      // 0x0F0F0F0F, 0x33333333, 0x55555555
      .withColumn("ps", expr("(p | shiftleft(p, 8)) & 16711935"))
      .withColumn("ps", expr("(ps | shiftleft(ps, 4)) & 252645135"))
      .withColumn("ps", expr("(ps | shiftleft(ps, 2)) & 858993459"))
      .withColumn("ps", expr("(ps | shiftleft(ps, 1)) & 1431655765"))
      .withColumn("ss", expr("(s | shiftleft(s, 8)) & 16711935"))
      .withColumn("ss", expr("(ss | shiftleft(ss, 4)) & 252645135"))
      .withColumn("ss", expr("(ss | shiftleft(ss, 2)) & 858993459"))
      .withColumn("ss", expr("(ss | shiftleft(ss, 1)) & 1431655765"))
      .withColumn("z", expr("ps + shiftleft(ss, 1)"))
      .groupBy(expr("z div 262144").as("bucket"))
      .agg(count(lit(1)).as("n"),
           min(col("p")).as("p_min"), max(col("p")).as("p_max"),
           min(col("s")).as("s_min"), max(col("s")).as("s_max"))
      .orderBy(col("bucket"))

  val q61Sql: String =
    """WITH b AS (SELECT l_partkey & 65535 AS p,
      |                  CAST(l_suppkey AS BIGINT) & 65535 AS s FROM lineitem),
      |z AS (SELECT p, s,
      |        CAST(list_aggregate(list_transform(range(0, 16),
      |          i -> (((p >> i) & 1) << (2*i)) + (((s >> i) & 1) << (2*i + 1))),
      |          'sum') AS BIGINT) AS z
      |      FROM b)
      |SELECT z // 262144 AS bucket, CAST(count(*) AS BIGINT) AS n,
      |  min(p) AS p_min, max(p) AS p_max, min(s) AS s_min, max(s) AS s_max
      |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- Q85: single-pass data-quality audit -------------------------------

  /** Q85 — declarative data-quality audit (the Deequ/expectation-suite
    * shape): completeness, key uniqueness, value-domain membership, and
    * range constraints over `orders`, all computed in ONE aggregation pass
    * and emitted as a long-format (check, metric, pass) report. This is
    * the validation gate a production ingest (the reference's etl.py
    * load step) runs before publishing a partition.
    *
    * Scale shape: every constraint folds into the same partial+final
    * hash aggregate over one scan — adding a constraint adds an
    * aggregate expression, not a pass; the explode at the end runs on a
    * SINGLE summary row. count(DISTINCT o_orderkey) is the one
    * expensive member (a distinct pre-shuffle on the key); Spark plans
    * it as the standard two-phase distinct-aggregate expansion. */
  def q85QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val summary = t(spark, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      count(when(!col("o_orderstatus").isin("F", "O", "P"), 1)).as("n_bad_status"),
      count(when(col("o_totalprice") <= 0, 1)).as("n_nonpos_price"),
      count(when(col("o_orderdate").isNull, 1)).as("n_null_date"))
    summary.select(explode(array(
        struct(lit("row_count").as("check_name"), col("n_rows").as("metric"),
          (col("n_rows") > 0).as("pass")),
        struct(lit("custkey_complete").as("check_name"),
          (col("n_rows") - col("n_cust")).as("metric"),
          (col("n_rows") === col("n_cust")).as("pass")),
        struct(lit("orderkey_unique").as("check_name"),
          (col("n_rows") - col("n_keys")).as("metric"),
          (col("n_rows") === col("n_keys")).as("pass")),
        struct(lit("status_domain").as("check_name"), col("n_bad_status").as("metric"),
          (col("n_bad_status") === 0).as("pass")),
        struct(lit("price_positive").as("check_name"), col("n_nonpos_price").as("metric"),
          (col("n_nonpos_price") === 0).as("pass")),
        struct(lit("orderdate_complete").as("check_name"), col("n_null_date").as("metric"),
          (col("n_null_date") === 0).as("pass")))).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.pass"))
      .orderBy(col("check_name"))
  }

  val q85Sql: String =
    """WITH s AS (SELECT count(*) AS n_rows,
      |    count(o_custkey) AS n_cust,
      |    count(DISTINCT o_orderkey) AS n_keys,
      |    count(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END) AS n_bad_status,
      |    count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_nonpos_price,
      |    count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS n_null_date
      |  FROM orders)
      |SELECT check_name, CAST(metric AS BIGINT) AS metric, pass FROM (
      |  SELECT 'row_count' AS check_name, n_rows AS metric, n_rows > 0 AS pass FROM s
      |  UNION ALL SELECT 'custkey_complete', n_rows - n_cust, n_rows = n_cust FROM s
      |  UNION ALL SELECT 'orderkey_unique', n_rows - n_keys, n_rows = n_keys FROM s
      |  UNION ALL SELECT 'status_domain', n_bad_status, n_bad_status = 0 FROM s
      |  UNION ALL SELECT 'price_positive', n_nonpos_price, n_nonpos_price = 0 FROM s
      |  UNION ALL SELECT 'orderdate_complete', n_null_date, n_null_date = 0 FROM s)
      |ORDER BY check_name""".stripMargin

  // ---- Q87: column profiling (ANALYZE-style statistics) ------------------

  /** Q87 — per-column statistics profile (the ANALYZE TABLE surface a
    * cost-based optimizer and a data catalog feed from): null count,
    * exact NDV, and min/max for five orders columns, emitted long-format
    * (col_name, n_nulls, ndv, min_str, max_str). The money column is
    * profiled as integer cents so its extrema are engine-exact strings.
    *
    * Scale shape: ONE pass — all five columns' aggregates fold into a
    * single partial+final aggregation; the five exact count(DISTINCT)s
    * make Catalyst plan the standard expand-by-distinct-group expansion
    * (5× map-side fanout, still one shuffle, no joins), the price an
    * exact profile pays anywhere; a 100 TB profile swaps
    * approx_count_distinct into the same plan shape (q11's HLL bound).
    * The explode to long format runs on the single summary row. */
  def q87ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    def p(c: String) = Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("string").as(s"min_$c"),
      max(col(c)).cast("string").as(s"max_$c"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "cents")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(p)
    val summary = o.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"ndv_$c").as("ndv"),
        col(s"min_$c").as("min_str"), col(s"max_$c").as("max_str"))
    }
    summary.select(explode(array(entries: _*)).as("r"))
      .select(col("r.col_name"), col("r.n_nulls"), col("r.ndv"),
        col("r.min_str"), col("r.max_str"))
      .orderBy(col("col_name"))
  }

  val q87Sql: String =
    """WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders)
      |SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls,
      |  CAST(ndv AS BIGINT) AS ndv, min_str, max_str FROM (
      |  SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS n_nulls,
      |    count(DISTINCT o_orderkey) AS ndv,
      |    CAST(min(o_orderkey) AS VARCHAR) AS min_str,
      |    CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM o
      |  UNION ALL SELECT 'o_custkey', count(*) - count(o_custkey),
      |    count(DISTINCT o_custkey),
      |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM o
      |  UNION ALL SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
      |    count(DISTINCT o_orderstatus),
      |    min(o_orderstatus), max(o_orderstatus) FROM o
      |  UNION ALL SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
      |    count(DISTINCT o_orderpriority),
      |    min(o_orderpriority), max(o_orderpriority) FROM o
      |  UNION ALL SELECT 'cents', count(*) - count(cents),
      |    count(DISTINCT cents),
      |    CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR) FROM o)
      |ORDER BY col_name""".stripMargin
}
