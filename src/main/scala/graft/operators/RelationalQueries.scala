package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Batch relational operator surface (SURVEY.md §2.2 matrix): scans,
  * filters/projections, every join shape, aggregation (plain, distinct,
  * rollup/cube/grouping sets), window functions, sort/top-k, set operations.
  *
  * Each query is a [[graft.core.Q]]: Spark implementation + DuckDB oracle SQL.
  * Output column aliases match the oracle exactly (driver hash-compares after
  * sorting columns by name). Double-valued aggregates are rounded on BOTH
  * sides so accumulation order can't flip the hash.
  *
  * Scale stance (100 TB design point, graded per the brief):
  *   - group-bys rely on Catalyst's partial aggregation: the exchange moves
  *     O(partitions x groups) rows, not O(input);
  *   - fixed-cardinality dims (region=5, nation=25) are explicitly
  *     `broadcast()`; fact-fact joins stay shuffle joins keyed on the join
  *     column so AQE can pick SMJ/SHJ and split skewed partitions;
  *   - window functions partition on high-cardinality keys (custkey,
  *     suppkey, user_id) — one shuffle, no driver-side work;
  *   - as-of join is the union+last-ignoreNulls rewrite: ONE shuffle over
  *     (key, ts) instead of a per-key nested loop (SURVEY §7.3).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------------ scans/agg

  /** TPC-H Q1-shaped pricing summary: filter -> 6-group hash agg.
    * At 100 TB the shipdate filter is pushed to the parquet scan
    * (PushedFilters) and partial agg reduces each task to 6 rows pre-shuffle.
    */
  val q1 = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Pure filter+projection: both predicate and the 3-column ReadSchema must
    * reach the parquet scan — this is the pushdown/pruning litmus query.
    */
  val q2 = Q(
    "q2_filter_pushdown",
    """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM lineitem
      |WHERE l_quantity > 45
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
  }

  /** TPC-H Q6-shaped single-table agg: tight range predicates, scalar result. */
  val q6 = Q(
    "q6_revenue_forecast",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }

  // ---------------------------------------------------------------------- joins

  /** TPC-H Q3-shaped 3-way join + agg + top-k. customer is filtered then
    * joined; orders-lineitem is the fact-fact shuffle join (SMJ/SHJ via AQE).
    * Top-10 runs as TakeOrderedAndProject — no global sort materialization.
    */
  val q3 = Q(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(li, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Left-semi join (EXISTS): orders having at least one heavy lineitem.
    * Semi join keeps the build side to (l_orderkey) only — minimal shuffle
    * payload; at scale this is the idiom for existence filtering, never a
    * join+distinct.
    */
  val q4 = Q(
    "q4_priority_semi",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 49).select("l_orderkey")
    t(s, dir, "orders")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Left-anti join (NOT EXISTS) + broadcast dim: customers with no 1995
    * order, counted per nation. nation(25) is broadcast at any scale; the
    * anti-join build side is pre-filtered and projected to one column.
    */
  val q5 = Q(
    "q5_customers_no_orders",
    """SELECT n_name, count(*) AS idle_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
      |GROUP BY n_name""".stripMargin) { (s, dir) =>
    val orderedKeys = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-01-01")).select("o_custkey")
    t(s, dir, "customer")
      .join(orderedKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("idle_customers"))
  }

  /** Left-outer join + double aggregation (TPC-H Q13 shape): distribution of
    * orders-per-customer including zero. Both aggs are partial-agg friendly.
    */
  val q7 = Q(
    "q7_orders_per_customer_dist",
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").select("c_custkey")
      .join(t(s, dir, "orders").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Star join through two broadcast dims (region->nation) down to the orders
    * fact: revenue per region per year. The only shuffle is the final agg.
    */
  val q8 = Q(
    "q8_region_year_revenue",
    """SELECT r_name, year(o_orderdate) AS order_year,
      |  round(sum(o_totalprice), 2) AS revenue,
      |  count(*) AS n_orders
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |GROUP BY r_name, year(o_orderdate)""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Non-equi (range/theta) join against a tiny in-engine band table:
    * BroadcastNestedLoopJoin with a 4-row build side — the right physical
    * shape for interval classification at any scale (never shuffle the fact).
    */
  val q9 = Q(
    "q9_acctbal_bands",
    """SELECT band, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |JOIN (VALUES ('negative', -99999.0, 0.0), ('low', 0.0, 3000.0),
      |             ('mid', 3000.0, 7000.0), ('high', 7000.0, 99999.0))
      |  AS bands(band, lo, hi)
      |  ON c_acctbal >= lo AND c_acctbal < hi
      |GROUP BY band""".stripMargin) { (s, dir) =>
    import s.implicits._
    val bands = Seq(
      ("negative", -99999.0, 0.0), ("low", 0.0, 3000.0),
      ("mid", 3000.0, 7000.0), ("high", 7000.0, 99999.0))
      .toDF("band", "lo", "hi")
    t(s, dir, "customer")
      .join(broadcast(bands), col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /** As-of join: for every 'error' event, the latest 'click' of the same user
    * at-or-before it (SURVEY §2.2 / §7.3). Implementation is the scalable
    * union + last(ignoreNulls) window rewrite: ONE shuffle on (user_id),
    * linear scan per partition — no per-row range probe, no nested loop.
    * Oracle uses DuckDB's native ASOF JOIN.
    */
  val q10 = Q(
    "q10_asof_click_before_error",
    """SELECT e.event_id, e.user_id, c.event_id AS click_id
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val tagged = ev.filter(col("event_type").isin("error", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", col("event_id")).as("click_src"))
    // clicks sort before errors at equal ts => ties resolve as "at-or-before"
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_id", last(col("click_src"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("click_id"))
  }

  // ------------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer by price (row_number with a
    * deterministic orderkey tiebreak). One shuffle on o_custkey.
    */
  val q11 = Q(
    "q11_top3_orders_per_customer",
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
  }

  /** Analytic window with an explicit rows frame: per-supplier running
    * quantity in ship order. l_quantity closes the frame order: the fixture
    * has a (suppkey, shipdate, orderkey, linenumber) collision (sf0.1:
    * orderkey 45185 linenumber 7, quantities 13 vs 16) where engines may
    * order the pair differently; with quantity as the last key the order is
    * total up to rows whose swap cannot change any prefix sum, so
    * running_qty is well-defined on EVERY input.
    */
  val q12 = Q(
    "q12_running_supplier_qty",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
  }

  /** lag/lead analytic window over the event stream: per-user deltas.
    * event_id tiebreak keeps the frame order total.
    */
  val q13 = Q(
    "q13_event_value_delta",
    """SELECT event_id, user_id,
      |  round(value - lag(value) OVER w, 2) AS delta,
      |  lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  // ------------------------------------------- rollup / cube / grouping sets

  /** Rollup over the dim hierarchy region -> nation. Catalyst expands to a
    * single Expand + one hash agg — no multi-pass scan.
    */
  val q14 = Q(
    "q14_rollup_region_nation",
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /** Cube over the two lineitem status flags. */
  val q15 = Q(
    "q15_cube_flags",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
  }

  /** GROUPING SETS through the SQL surface (spark.sql over registered views)
    * — exercises the parser path end-to-end, not just the DataFrame DSL.
    */
  val q16 = Q(
    "q16_grouping_sets_sql",
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin)
  }

  // ------------------------------------------------------------------- set ops

  /** INTERSECT / EXCEPT / UNION over yearly buyer sets, tagged into one
    * result. Set ops hash-shuffle on the full row — keys are projected to
    * custkey first so the exchange carries 8 bytes/row.
    */
  val q17 = Q(
    "q17_buyer_setops",
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |               AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
      |     y96 AS (SELECT DISTINCT o_custkey FROM orders
      |             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      |SELECT 'both' AS tag, count(*) AS n FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96) t
      |UNION ALL
      |SELECT 'only95' AS tag, count(*) AS n FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96) t
      |UNION ALL
      |SELECT 'either' AS tag, count(*) AS n FROM (SELECT * FROM y95 UNION SELECT * FROM y96) t""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    def buyers(from: String, until: String) =
      o.filter(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
        .select("o_custkey").distinct()
    val y95 = buyers("1995-01-01", "1996-01-01")
    val y96 = buyers("1996-01-01", "1997-01-01")
    val both = y95.intersect(y96).agg(count(lit(1)).as("n")).withColumn("tag", lit("both"))
    val only95 = y95.except(y96).agg(count(lit(1)).as("n")).withColumn("tag", lit("only95"))
    val either = y95.union(y96).distinct().agg(count(lit(1)).as("n")).withColumn("tag", lit("either"))
    both.union(only95).union(either).select(col("tag"), col("n"))
  }

  /** Global top-k: agg then TakeOrderedAndProject (no full sort). The join to
    * supplier names happens AFTER the top-k cut — at scale you join 10 rows,
    * not 10 million.
    */
  val q18 = Q(
    "q18_top_suppliers",
    """SELECT s_name, round(revenue, 2) AS revenue FROM (
      |  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
      |  FROM lineitem GROUP BY l_suppkey
      |  ORDER BY revenue DESC, l_suppkey LIMIT 10) t
      |JOIN supplier ON s_suppkey = l_suppkey""".stripMargin) { (s, dir) =>
    val top = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_suppkey"))
      .limit(10)
    top.join(broadcast(t(s, dir, "supplier")), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_name"), round(col("revenue"), 2).as("revenue"))
  }

  // ---------------------------------------------------------------- subqueries

  /** Correlated-subquery semantics (customers above their nation's average
    * balance) implemented as a window agg: one shuffle on nationkey instead
    * of a re-scan per group — the scalable decorrelated form.
    */
  val q24 = Q(
    "q24_above_nation_avg",
    """SELECT c_custkey FROM (
      |  SELECT c_custkey, c_acctbal,
      |         avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
      |  FROM customer) t
      |WHERE c_acctbal > nation_avg""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
    t(s, dir, "customer")
      .withColumn("nation_avg", avg(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"))
  }

  /** Scalar subquery via the SQL surface: orders above the global average
    * price. Catalyst plans the subquery as a broadcast scalar, the main scan
    * stays a single pass.
    */
  val q25 = Q(
    "q25_above_avg_orders",
    """SELECT o_orderkey FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin)
  }

  /** CORRELATED scalar subquery — the same question as q24 (customers above
    * their nation's average balance) but phrased as a per-row correlated
    * aggregate, which exercises Catalyst's decorrelation
    * (RewriteCorrelatedScalarSubquery): the subquery becomes a grouped
    * aggregate joined back on the correlation key — one agg + one join, NOT
    * a per-row re-scan. q24's window formulation must return the identical
    * rows (cross-checked in the suite); which plan wins at scale depends on
    * group count vs row width, so the engine supports both phrasings.
    */
  val q43 = Q(
    "q43_correlated_scalar_subquery",
    """SELECT c_custkey FROM customer c
      |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  /** q54: local-supplier volume — the TPC-H Q5 shape, the canonical
    * multi-join optimizer benchmark: two fact tables (orders ⋈ lineitem) and
    * a full dimension chain (customer → nation → region → supplier), with
    * the "local" twist that the supplier must sit in the customer's nation
    * (s_nationkey = c_nationkey — a second equi condition on a non-PK
    * column).
    *
    * Scale shape: the only fact-fact shuffle is orders ⋈ lineitem on
    * l_orderkey; the year predicate and the region filter prune before it
    * (pushed to the orders scan / folded through the broadcast dim chain).
    * nation and region are fixed-cardinality broadcasts; customer and
    * supplier join on high-cardinality keys and stay AQE-adaptive. Revenue
    * is rounded to cents — accumulation noise at these magnitudes sits
    * orders below the grid (q8's established idiom).
    */
  val q54 = Q(
    "q54_local_supplier_volume",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
      |GROUP BY n_name""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(t(s, dir, "orders").filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q58: LATERAL correlated subquery — the SQL-standard phrasing of
    * per-row top-N ("each customer's 2 largest orders"), identical SQL on
    * both engines. Catalyst DECORRELATES it: DecorrelateInnerQuery +
    * RewriteLateralSubquery turn the per-row subquery into a ranked window
    * over one join — the same physical shape as q11's explicit window —
    * and additionally plants partial+final `WindowGroupLimit`, pruning to
    * 2 rows per customer MAP-SIDE before the shuffle (snapshot-pinned).
    * So the lateral phrasing costs nothing at scale: no per-row
    * re-execution (how a naive engine runs it) and less shuffle than a
    * hand-rolled window that filters rn only after the exchange.
    */
  val q58 = Q(
    "q58_lateral_topn",
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").createOrReplaceTempView("customer")
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
  }

  /** q59: SQL-standard aggregate FILTER clause — conditional aggregation
    * without CASE scaffolding, one pass over orders producing per-priority
    * counts and sums restricted by independent predicates. Same SQL text on
    * both engines. Catalyst compiles each FILTER into the aggregate's
    * update condition inside one partial+final hash agg — one scan, one
    * shuffle, exactly like the q15/q35 CASE forms, so the nicer phrasing is
    * free at scale.
    */
  val q59 = Q(
    "q59_filtered_agg",
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1997), 2)
      |    AS rev_1997,
      |  round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
      |    AS avg_large
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  round(sum(o_totalprice) FILTER (WHERE year(o_orderdate) = 1997), 2)
        |    AS rev_1997,
        |  round(avg(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
        |    AS avg_large
        |FROM orders
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** q60: complete monthly revenue spine including gap months — the classic
    * reporting shape a GROUP BY alone cannot produce (empty months simply
    * don't exist in the fact table; the spine manufactures them). The
    * ORACLE is a WITH RECURSIVE CTE, and [[q60RecursiveSql]] is written to
    * be valid on BOTH engines: DuckDB executes it as the gate oracle, and
    * the suite (`RecursiveCteTwinSpec`) executes the very same text through
    * Spark 4's UnionLoop and pins it equal to the production path — the
    * recursion is certified cross-engine without being the plan we'd run at
    * scale.
    *
    * Scale stance (and round-5 post-mortem): the production path generates
    * the ~80-row month dimension with ONE min/max agg over orders +
    * `explode(sequence(...))` — a single job — and pre-aggregates orders by
    * month BEFORE the spine join, so the join sees ~80 x ~80 rows instead
    * of spine x fact. Round 5 ran the recursion itself as the production
    * plan with the stop condition as a scalar subquery over orders INSIDE
    * the loop: ~80 full fact scans + 80 driver-scheduled jobs, 15 s at
    * sf0.1, a scale-killer at 100 TB. Even bound-carried (fact scanned only
    * in the anchor), UnionLoop still pays ~80 sequential driver jobs for an
    * 80-row dimension (measured 1.9 s at sf0.1); the sequence() spine is
    * one job and leaves the fact pass as a partial+final hash agg. Rule of
    * thumb encoded here: recursion-over-dimension is for ENGINE
    * CERTIFICATION; dimension GENERATION at scale wants a closed form.
    */
  val q60RecursiveSql: String =
    """WITH RECURSIVE months(m, hi) AS (
      |  SELECT date_trunc('MONTH', min(o_orderdate)),
      |         date_trunc('MONTH', max(o_orderdate)) FROM orders
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
      |)
      |SELECT CAST(m AS DATE) AS month_start,
      |  coalesce(count(o_orderkey), 0) AS n_orders,
      |  coalesce(round(sum(o_totalprice), 2), 0) AS revenue
      |FROM months LEFT JOIN orders ON date_trunc('MONTH', o_orderdate) = m
      |GROUP BY 1""".stripMargin

  val q60 = Q("q60_recursive_date_spine", q60RecursiveSql) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(
      """WITH bounds AS (
        |  SELECT date_trunc('MONTH', min(o_orderdate)) AS lo,
        |         date_trunc('MONTH', max(o_orderdate)) AS hi FROM orders
        |),
        |months AS (
        |  SELECT explode(sequence(lo, hi, interval 1 month)) AS m FROM bounds
        |),
        |by_month AS (
        |  SELECT date_trunc('MONTH', o_orderdate) AS m,
        |         count(o_orderkey) AS n,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1
        |)
        |SELECT CAST(months.m AS DATE) AS month_start,
        |  coalesce(n, 0) AS n_orders,
        |  coalesce(rev, 0) AS revenue
        |FROM months LEFT JOIN by_month ON by_month.m = months.m""".stripMargin)
  }

  /** q62: TPC-H Q21-shape multi-correlated quantifiers — EXISTS and NOT
    * EXISTS subqueries against the SAME fact with DIFFERENT correlated
    * predicates ("the only supplier with a returned item on a
    * multi-supplier finished order"; the reference fixture has no
    * commit/receipt dates, so `l_returnflag = 'R'` plays Q21's late-flag
    * role — the quantifier structure is identical). q43/q58 pin scalar and
    * LATERAL decorrelation; this pins Catalyst STACKING both quantifier
    * rewrites on one fact: RewritePredicateSubquery turns the EXISTS into
    * a LeftSemi and the NOT EXISTS into a LeftAnti against two more scans
    * of lineitem, each keyed on l_orderkey — set-at-a-time joins, never
    * per-row re-execution (PlanShapeSpec pins one semi + one anti and no
    * nested-loop fallback).
    *
    * Scale shape: all three lineitem passes shuffle on l_orderkey, so AQE
    * can reuse co-partitioning; the semi/anti inner sides carry only
    * (l_orderkey, l_suppkey[, l_returnflag]) after pruning. At 100 TB the
    * non-equal `l_suppkey <>` residual rides the equi-join on orderkey —
    * no theta explosion — and the final supplier join broadcasts the
    * k-row dimension.
    */
  val q62 = {
    val sql =
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin
    Q("q62_only_bad_supplier", sql) { (s, dir) =>
      Seq("supplier", "lineitem", "orders").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n))
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(
    q1, q2, q3, q4, q5, q6, q7, q8, q9, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q24, q25, q43, q54, q58, q59, q60,
    q62)
}
