package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.core.{Q, Tables}

/** Remaining SURVEY §2.2 coverage: map functions, full-outer join,
  * null-handling conditionals.
  */
object MiscQueries {

  /** q29: schema-on-read into MAP<STRING,STRING> + map functions (the
    * `props` payload pattern from FIXTURES.md). Oracle reads the same facts
    * through DuckDB's JSON functions.
    */
  val q29 = Q(
    "q29_map_functions",
    """SELECT len(json_keys(props))::BIGINT AS n_keys,
      |  json_extract_string(props, '$.k')::BIGINT % 2 AS k_parity,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("pmap", from_json(col("props"), MapType(StringType, StringType)))
      .groupBy(
        size(map_keys(col("pmap"))).cast("long").as("n_keys"),
        (element_at(col("pmap"), "k").cast("long") % 2).as("k_parity"))
      .agg(count(lit(1)).as("n"))
  }

  /** q30: full outer join — row provenance census over rich customers vs
    * 1995 orders. Both null-sides are populated by construction.
    */
  val q30 = Q(
    "q30_full_outer_join",
    """SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
      |            WHEN o_orderkey IS NULL THEN 'cust_only'
      |            ELSE 'both' END AS side,
      |  count(*) AS n
      |FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) c
      |FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
      |                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |                   AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00') o
      |  ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 5000).select("c_custkey")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
      .select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .groupBy(
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "cust_only")
          .otherwise("both").as("side"))
      .agg(count(lit(1)).as("n"))
  }

  /** q31: null-handling conditionals — nullif/coalesce/CASE interplay. */
  val q31 = Q(
    "q31_null_conditionals",
    """SELECT coalesce(nullif(l_discount, 0.0), -1.0) AS discount_bucket,
      |  count(*) AS n,
      |  sum(CASE WHEN l_tax > l_discount THEN 1 ELSE 0 END)::BIGINT AS tax_gt_disc
      |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("discount_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_tax") > col("l_discount"), 1L).otherwise(0L)).as("tax_gt_disc"))
  }

  /** q33: right outer join — every customer kept, big-ticket orders
    * attached where they exist (the preserved side is on the RIGHT; q7/q30
    * cover left/full). Same broadcast rules as any outer join at scale: the
    * preserved side streams, only the non-preserved side may broadcast.
    */
  val q33 = Q(
    "q33_right_outer_join",
    """SELECT CASE WHEN o_orderkey IS NULL THEN 'no_big_order' ELSE 'big_order' END AS side,
      |  count(*) AS n,
      |  count(DISTINCT c_custkey) AS n_customers
      |FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 150000) o
      |RIGHT JOIN customer ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 150000)
      .select("o_orderkey", "o_custkey")
    o.join(Tables.load(s, dir, "customer"), col("c_custkey") === col("o_custkey"), "right_outer")
      .groupBy(
        when(col("o_orderkey").isNull, "no_big_order").otherwise("big_order").as("side"))
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("n_customers"))
  }

  /** q34: exact percentiles per group — the sort-based aggregation surface
    * (percentile plans as SortAggregate/ObjectHashAggregate, not hash-agg;
    * every other agg in the registry is hash-based). Exact percentile
    * buffers per-group values, so at 100 TB the drop-in is
    * `approx_percentile` (t-digest sketch, mergeable partial agg — same
    * family as q28's HLL); the exact form is what the oracle can replay
    * deterministically (linear interpolation matches DuckDB quantile_cont).
    */
  val q34 = Q(
    "q34_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
      |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_price"),
        count(lit(1)).as("n"))
  }

  /** q39: approx_percentile — q34's documented 100 TB drop-in as a
    * first-class registered op. Greenwald-Khanna sketches are mergeable, so
    * this is a partial+final (object-hash) aggregation with bounded state —
    * no per-group value buffering like exact percentile. Sketch
    * interpolation is engine-specific, so raw estimates can never
    * hash-match an oracle; like q28 the row is a TOLERANCE CERTIFICATE:
    * Spark computes the sketch AND the exact percentile per group and
    * emits a within-2% verdict per quantile (the suite's existing
    * envelope), which the oracle asserts literally alongside the exact
    * group counts. The exact VALUES stay pinned by q34 — this row pins the
    * sketch's distance from them under the gate's hash compare.
    */
  val q39 = Q(
    "q39_approx_percentiles",
    """SELECT l_returnflag, count(*) AS n,
      |  'within_bound' AS median_check,
      |  'within_bound' AS p95_check
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("pcts"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p95"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        when(abs(element_at(col("pcts"), 1) - col("exact_p50")) / col("exact_p50") <= 0.02,
          "within_bound").otherwise("out_of_bound").as("median_check"),
        when(abs(element_at(col("pcts"), 2) - col("exact_p95")) / col("exact_p95") <= 0.02,
          "within_bound").otherwise("out_of_bound").as("p95_check"))
  }

  /** q42: multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * MULTIPLICITIES (q17 covers the distinct forms): a user who clicked 5
    * times and errored twice contributes 2 to the intersection and 3 to the
    * difference. Spark plans these as aggregate+generate over a count
    * column — partial-agg friendly, one shuffle on the compared columns.
    */
  val q42 = Q(
    "q42_setops_all",
    """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
      |     e AS (SELECT user_id FROM events WHERE event_type = 'error')
      |SELECT 'intersect_all' AS op, count(*) AS n
      |  FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM e) t
      |UNION ALL
      |SELECT 'except_all', count(*) FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM e) t
      |UNION ALL
      |SELECT 'union_all', count(*) FROM (SELECT * FROM c UNION ALL SELECT * FROM e) t""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val c = ev.filter(col("event_type") === "click").select("user_id")
    val e = ev.filter(col("event_type") === "error").select("user_id")
    def counted(op: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    counted("intersect_all", c.intersectAll(e))
      .union(counted("except_all", c.exceptAll(e)))
      .union(counted("union_all", c.unionAll(e)))
  }

  /** q44: conversion funnel — signup -> first click within 6h -> first
    * purchase within 12h of that click, reported as users reaching each
    * stage (150 -> 14 -> 6 on this corpus). The sequential-pattern op of
    * event analytics: each stage is a per-user min-aggregation joined to the
    * previous stage's anchor time, so the whole funnel is K keyed
    * shuffles for a K-stage funnel — never a per-user sort of the full
    * history — and each stage's anchor relation shrinks, so AQE broadcasts
    * the later joins. All comparisons in integer microseconds.
    */
  val q44 = Q(
    "q44_funnel_conversion",
    """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS st FROM events
      |           WHERE event_type = 'signup' GROUP BY 1),
      |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS ct FROM events e
      |      JOIN s ON s.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.st
      |        AND epoch_us(e.ts) <= s.st + 21600000000 GROUP BY 1),
      |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS pt FROM events e
      |      JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.ct
      |        AND epoch_us(e.ts) <= c.ct + 43200000000 GROUP BY 1)
      |SELECT 'signup' AS stage, count(*) AS n_users FROM s
      |UNION ALL SELECT 'click_within_6h', count(*) FROM c
      |UNION ALL SELECT 'purchase_within_12h', count(*) FROM p""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val us = unix_micros(col("ts"))
    // Each stage anchor is localCheckpoint'ed: it is referenced twice (next
    // stage's join + its own census count) and AQE's runtime stage reuse
    // only catches one of the duplicated subtrees — without the checkpoint
    // the events scan re-runs ~6x across the union (measured). The anchors
    // are per-user aggregates (bounded by the user population), so the
    // materialization is tiny at any corpus scale, while each stage's
    // events pass keeps its pushed-down event_type filter.
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(us).as("st"))
      .localCheckpoint()
    val click = ev.filter(col("event_type") === "click")
      .join(signup, Seq("user_id"))
      .filter(us > col("st") && us <= col("st") + lit(21600000000L))
      .groupBy(col("user_id")).agg(min(us).as("ct"))
      .localCheckpoint()
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, Seq("user_id"))
      .filter(us > col("ct") && us <= col("ct") + lit(43200000000L))
      .groupBy(col("user_id")).agg(min(us).as("pt"))
      .localCheckpoint()
    def counted(stage: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
    counted("signup", signup)
      .union(counted("click_within_6h", click))
      .union(counted("purchase_within_12h", purchase))
  }

  /** q45: interval join at scale — clicks within 1h AFTER each error, per
    * user. Written naively (oracle side) this is a theta join, which Spark
    * can only execute as a broadcast nested loop — quadratic work per user
    * and a non-starter at 100 TB. The engine side rewrites it as the
    * standard bucketed interval join: quantize time into buckets equal to
    * the window length, explode only the PROBE side to its two covering
    * buckets, and equi-join on (user_id, bucket) with the exact interval as
    * a residual filter. Each click lands in exactly one bucket, and an
    * error's two bucket rows are distinct, so no pair is found twice — no
    * dedup pass needed. Plan: one shuffle per side on a high-cardinality
    * compound key, BNLJ impossible (guarded by PlanShapeSpec).
    */
  val q45 = Q(
    "q45_interval_bucket_join",
    """WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS eus FROM events
      |             WHERE event_type = 'error'),
      |clk AS (SELECT event_id, user_id, epoch_us(ts) AS cus FROM events
      |        WHERE event_type = 'click'),
      |m AS (SELECT e.event_id, count(c.event_id) AS n_clicks
      |      FROM err e LEFT JOIN clk c ON c.user_id = e.user_id
      |        AND c.cus > e.eus AND c.cus <= e.eus + 3600000000
      |      GROUP BY 1)
      |SELECT n_clicks, count(*) AS n_errors FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
    val WindowUs = 3600000000L
    val ev = Tables.load(s, dir, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("eid"), col("user_id"), unix_micros(col("ts")).as("eus"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"), unix_micros(col("ts")).as("cus"))
      .withColumn("bucket", expr(s"cus DIV $WindowUs"))
    val probe = err.withColumn("bucket",
      explode(array(expr(s"eus DIV $WindowUs"), expr(s"eus DIV $WindowUs + 1"))))
    val counts = probe.join(clk, Seq("user_id", "bucket"))
      .filter(col("cus") > col("eus") && col("cus") <= col("eus") + lit(WindowUs))
      .groupBy(col("eid")).agg(count(lit(1)).as("nc"))
    err.select(col("eid")).join(counts, Seq("eid"), "left")
      .select(coalesce(col("nc"), lit(0L)).as("n_clicks"))
      .groupBy(col("n_clicks")).agg(count(lit(1)).as("n_errors"))
  }

  /** q46: ntile — equi-depth quartiles of customer balance within each
    * nation (completes the ranking-window family: row_number q11/q37,
    * rank/dense via s-queries, ntile here). Partitioned by nation so the
    * sort is per-group and parallel — a GLOBAL ntile would funnel the corpus
    * through one partition; the partitioned form is the scale-correct one
    * (a global variant at 100 TB would use approx_percentile cut points
    * instead, q39's machinery). Tie-broken by c_custkey for determinism.
    */
  val q46 = Q(
    "q46_ntile_quartiles",
    """SELECT c_nationkey, q, count(*) AS n,
      |  round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
      |FROM (SELECT c_nationkey, c_acctbal,
      |        ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS q
      |      FROM customer) t
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_nationkey"), col("c_acctbal"), ntile(4).over(w).as("q"))
      .groupBy(col("c_nationkey"), col("q"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 2).as("lo"),
        round(max(col("c_acctbal")), 2).as("hi"))
  }

  /** q50: distribution-position windows — percent_rank and cume_dist per
    * nation (the remaining members of the ranking-window family after
    * row_number/rank/ntile: q11, q37, q46). The order key includes
    * c_custkey so ranks are tie-free and both engines agree exactly;
    * values rounded to 4 (they are ratios of ranks — exact in both
    * engines, rounding is belt-and-braces for the hash compare).
    * Partitioned by nation: per-group parallel sort, no global funnel.
    */
  val q50 = Q(
    "q50_rank_distribution",
    """SELECT c_custkey, c_nationkey,
      |  round(percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 4) AS pr,
      |  round(cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 4) AS cd
      |FROM customer""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
  }

  /** q51: null-preserving generator — explode_outer keeps the parent row
    * (with a NULL element) when its array is empty, where plain explode
    * drops it. The distinction matters for any per-document expansion that
    * must not silently lose documents (here: docs with no long token still
    * appear, so downstream per-doc accounting stays total). DuckDB has no
    * outer unnest; the oracle models the semantics with an explicit
    * [NULL]-substitution, which is exactly the contract being pinned.
    */
  val q51 = Q(
    "q51_explode_outer",
    """WITH r AS (SELECT doc_id,
      |  list_filter(string_split(text, ' '), w -> len(w) >= 8) AS l FROM documents)
      |SELECT doc_id,
      |  unnest(CASE WHEN len(l) = 0 THEN [NULL::VARCHAR] ELSE l END) AS rare_tok
      |FROM r""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode_outer(expr("filter(split(text, ' '), w -> length(w) >= 8)"))
          .as("rare_tok"))
  }

  /** q52: null-safe equality join — `<=>` (IS NOT DISTINCT FROM) treats
    * NULL as a joinable value, so rows with a NULL key still find their
    * dimension row where plain `=` silently drops them (the classic
    * nullable-FK lookup bug). Crucially EqualNullSafe remains an EQUI-join
    * key for Spark — the plan is a hash join, not the nested-loop a
    * `coalesce`-wrapped workaround can degrade to.
    */
  val q52 = Q(
    "q52_nullsafe_join",
    """WITH c AS (SELECT nullif(c_nationkey % 5, 0) AS bucket FROM customer),
      |dim AS (SELECT DISTINCT bucket, coalesce(bucket::VARCHAR, 'none') AS label FROM c)
      |SELECT dim.label, count(*) AS n
      |FROM c JOIN dim ON c.bucket IS NOT DISTINCT FROM dim.bucket
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
      .select(expr("nullif(c_nationkey % 5, 0)").as("bucket"))
    val dim = c.distinct()
      .select(col("bucket").as("dbucket"),
        coalesce(col("bucket").cast("string"), lit("none")).as("label"))
    c.join(dim, col("bucket") <=> col("dbucket"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
  }

  /** q53: statistical aggregates from exact integer moments — per-language
    * Pearson correlation of document length in chars vs tokens, plus the
    * sample stddev of token counts. Built-in `corr`/`stddev_samp` fold
    * doubles in partition order, so their low bits are engine- AND
    * run-dependent; here every moment (n, Σx, Σy, Σx², Σy², Σxy) is an
    * exact BIGINT sum — order-insensitive and identical on every engine —
    * and the statistics are derived from those moments in one closed-form
    * double expression, making a 4-place rounding bit-stable.
    *
    * Scale shape: one partial+final hash agg on lang (six sums ride the
    * same shuffle row), then scalar arithmetic on the k aggregated rows.
    * This moment-sketch formulation is also the mergeable form a streaming
    * or partitioned deployment needs: moments add across shards; the
    * built-in two-pass formulations do not.
    */
  val q53 = Q(
    "q53_moment_stats",
    """WITH t AS (
      |  SELECT lang, n_chars AS x, len(string_split(text, ' '))::BIGINT AS y
      |  FROM documents),
      |m AS (
      |  SELECT lang, count(*)::BIGINT AS n,
      |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
      |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy,
      |    sum(x*y)::BIGINT AS sxy
      |  FROM t GROUP BY 1)
      |SELECT lang, n AS n_docs,
      |  CASE WHEN n > 1 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
      |    round((n*sxy - sx*sy)::DOUBLE
      |      / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)), 4)
      |  END AS corr_chars_tokens,
      |  CASE WHEN n > 1 THEN
      |    round(sqrt((n*syy - sy*sy)::DOUBLE / (n::DOUBLE * (n - 1)::DOUBLE)), 4)
      |  END AS sd_tokens
      |FROM m""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("n_chars").as("x"),
        size(split(col("text"), " ")).cast("long").as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lang"), col("n").as("n_docs"),
        // degenerate-group guard (cross-engine): n = 1 or zero variance
        // yields NaN/Infinity in Spark but NULL/error semantics in DuckDB —
        // both sides agree on NULL instead
        when(col("n") > 1 &&
            col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 4))
          .as("corr_chars_tokens"),
        when(col("n") > 1,
          round(sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")
            / (col("n").cast("double") * (col("n") - 1).cast("double"))), 4))
          .as("sd_tokens"))
  }

  /** Session gap for q55, in microseconds (30 minutes — w3's gap). */
  val SessionGapUs = 30L * 60 * 1000 * 1000

  /** q55: batch sessionization — the lag/flag/prefix-sum idiom that
    * reconstructs sessions from an event log offline (the batch twin of
    * w3's `session_window` and the backfill path for any session metric):
    * a session breaks where the gap to the previous event of the same user
    * exceeds 30 minutes; the running sum of break flags numbers each
    * user's sessions; one aggregation yields per-session extent and size.
    * Timestamps are compared and reported as exact integer microseconds
    * (q41/q47's portable idiom).
    *
    * Scale shape: one shuffle on user_id feeds BOTH windows and the final
    * agg (same partitioning, Catalyst reuses the sort); everything after
    * the shuffle is a linear per-partition pass. No global sort, no
    * self-join — the naive "join each event to its predecessor" phrasing
    * would shuffle twice and skew on hot users.
    */
  val q55 = Q(
    "q55_sessionize",
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
       |g AS (SELECT user_id, event_id, tus,
       |  CASE WHEN lag(tus) OVER w IS NULL
       |         OR tus - lag(tus) OVER w > $SessionGapUs
       |       THEN 1 ELSE 0 END AS brk
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
       |s AS (SELECT user_id, tus,
       |  sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM g)
       |SELECT user_id, session_idx::BIGINT AS session_idx,
       |  count(*) AS n_events, min(tus) AS start_us, max(tus) AS end_us
       |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("brk",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"), max(col("tus")).as("end_us"))
  }

  /** q56: rolling 7-day distinct users per day — the DAU/WAU family
    * computed the scalable way: windowed COUNT(DISTINCT) cannot ride a
    * frame (set union is not subtractable), so the naive forms are a range
    * self-join (quadratic-ish) or a per-day re-scan. Instead each (user,
    * active-day) pair — already deduped by a partial+final agg — is
    * EXPLODED to the 7 window-end days it contributes to: a constant ×7
    * linear expansion of a much-reduced relation, then one distinct-agg
    * keyed by day. Day arithmetic is integer days-since-epoch (portable,
    * like q41/q55's microseconds); output keeps only days that exist in
    * the log (trailing partial windows would otherwise emit).
    */
  val q56 = Q(
    "q56_rolling_distinct",
    """WITH ud AS (SELECT DISTINCT user_id,
      |    date_diff('day', DATE '1970-01-01', ts::DATE) AS d
      |  FROM events),
      |days AS (SELECT DISTINCT d FROM ud),
      |m AS (SELECT ud.user_id, ud.d + o AS wd
      |      FROM ud, unnest(generate_series(0, 6)) AS t(o))
      |SELECT m.wd AS day_no, count(DISTINCT m.user_id) AS rolling7_users
      |FROM m JOIN days ON days.d = m.wd
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val ud = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("unix_date(CAST(ts AS DATE))").as("d"))
      .distinct()
    val days = ud.select(col("d").as("wd")).distinct()
    ud.select(col("user_id"), explode(expr("sequence(d, d + 6)")).as("wd"))
      .join(days, Seq("wd"))
      .groupBy(col("wd"))
      .agg(countDistinct(col("user_id")).as("rolling7_users"))
      .select(col("wd").cast("long").as("day_no"), col("rolling7_users"))
  }

  /** q57: windowed COUNT(DISTINCT) via the dense_rank rewrite — Spark
    * rejects DISTINCT aggregates over windows outright, so the standard
    * rewrite is max(dense_rank) over the same partition: ranking the
    * partition by the counted column assigns each distinct value one rank,
    * and the partition max of that rank IS the distinct count. The oracle
    * runs DuckDB's NATIVE `count(DISTINCT ...) OVER` — so the hash match
    * certifies the rewrite against an engine that implements the semantics
    * directly. Attached per event: how many distinct event types its user
    * has ever emitted (a per-entity diversity feature).
    *
    * Scale shape: one shuffle on user_id; both windows (the rank and the
    * partition max) reuse that partitioning and sort — no second exchange
    * (the plan snapshot pins it).
    *
    * NULL discipline: SQL's count(DISTINCT) ignores NULLs, but a bare
    * dense_rank would hand a NULL event_type its own rank. Ranking with
    * NULLS LAST and taking the max over non-null rows only (coalesced to 0
    * for an all-null partition) makes the rewrite NULL-exact — the fixture
    * is non-null today, so the oracle certifies the guard is at least
    * harmless; the semantics no longer depend on that fixture property.
    */
  val q57 = Q(
    "q57_windowed_distinct",
    """SELECT event_id, user_id,
      |  count(DISTINCT event_type) OVER (PARTITION BY user_id) AS n_types
      |FROM events""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("rk",
        dense_rank().over(byUser.orderBy(col("event_type").asc_nulls_last)))
      .select(col("event_id"), col("user_id"),
        coalesce(max(when(col("event_type").isNotNull, col("rk"))).over(byUser),
          lit(0L)).cast("long").as("n_types"))
  }

  /** q61: weekly cohort retention — the product-analytics matrix next to
    * q44's funnel: users are cohorted by FIRST-activity week (min-agg, no
    * window needed) and each later active week contributes to that
    * cohort's retention at its week offset. Both week keys are Monday
    * truncations on both engines, so the offset in days is always a
    * multiple of 7 and `div 7` is exact; the retention rate is reported as
    * integer per-mille (`n·1000 div size`) — no float anywhere, exact
    * cross-engine hash.
    *
    * Scale shape: the only corpus-sized stages are the (user, week)
    * distinct and the user-keyed cohort join — both partial-agg'd /
    * key-shuffled, never a per-user sort or window over raw events; the
    * output is |weeks| x |offsets|, constant in event volume.
    */
  val q61 = Q(
    "q61_cohort_retention",
    """WITH ev AS (SELECT DISTINCT user_id,
      |    date_trunc('week', ts)::DATE AS wk FROM events),
      |firstwk AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
      |sizes AS (SELECT cohort_wk, count(*) AS cohort_size FROM firstwk GROUP BY 1),
      |ret AS (SELECT f.cohort_wk, (e.wk - f.cohort_wk) // 7 AS week_offset,
      |    count(DISTINCT e.user_id) AS n_retained
      |  FROM ev e JOIN firstwk f ON f.user_id = e.user_id
      |  GROUP BY 1, 2)
      |SELECT r.cohort_wk, r.week_offset::BIGINT AS week_offset,
      |  r.n_retained::BIGINT AS n_retained, s.cohort_size::BIGINT AS cohort_size,
      |  (r.n_retained * 1000) // s.cohort_size AS retention_pm
      |FROM ret r JOIN sizes s ON s.cohort_wk = r.cohort_wk""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val firstwk = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val sizes = firstwk.groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_size"))
    val ret = ev.join(firstwk, Seq("user_id"))
      .select(col("cohort_wk"),
        expr("datediff(wk, cohort_wk) div 7").as("week_offset"), col("user_id"))
      .groupBy(col("cohort_wk"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_retained"))
    ret.join(sizes, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("week_offset"), col("n_retained"),
        col("cohort_size"),
        expr("(n_retained * 1000L) div cohort_size").as("retention_pm"))
  }

  /** q64: DATA-QUALITY CONSTRAINT CENSUS — the Deequ-style unit-test-for-data
    * gate (Schelter et al., "Automating Large-Scale Data Quality
    * Verification", VLDB 2018) every production pipeline runs before
    * accepting a new partition: size, completeness, key uniqueness, value
    * domain, range, and format constraints verified in ONE aggregation pass
    * and emitted as a constant-size report of (constraint, metric,
    * violations, status) rows.
    *
    * Shape: every metric is a conditional count folded into a single
    * partial+final hash aggregate (the one countDistinct adds Spark's
    * standard Expand-based distinct split), so the scan is one pass over
    * the fact table with map-side combine and the shuffle carries a handful
    * of scalars — at 100 TB the cost is the scan itself, which an ingest
    * job is already paying; q28's HLL sketch is the documented uniqueness
    * drop-in when exact distinct is too hot. The `max_value_le_100`
    * constraint FAILS by construction (the fixture's value field tops out
    * near 500), so the fail path — nonzero violation count surfaced, not
    * swallowed — is under the hash too, the same discipline as q28/q39's
    * verdict columns. All metrics are BIGINT; status is a string verdict,
    * so the report hashes exactly on any engine.
    */
  val q64 = Q(
    "q64_quality_constraints",
    """WITH m AS (
      |  SELECT count(*)::BIGINT AS n,
      |    count(user_id)::BIGINT AS nn_user,
      |    count(DISTINCT event_id)::BIGINT AS u_event,
      |    sum(CASE WHEN event_type IN ('click','error','purchase','signup','view')
      |             THEN 0 ELSE 1 END)::BIGINT AS v_domain,
      |    sum(CASE WHEN value > 0 AND value <= 500 THEN 0 ELSE 1 END)::BIGINT AS v_range,
      |    sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT AS v_cap,
      |    sum(CASE WHEN props LIKE '{%' THEN 0 ELSE 1 END)::BIGINT AS v_json
      |  FROM events),
      |r AS (
      |  SELECT 'row_count' AS constraint_name, n AS metric, 0::BIGINT AS violations FROM m
      |  UNION ALL SELECT 'completeness_user_id', nn_user, n - nn_user FROM m
      |  UNION ALL SELECT 'uniqueness_event_id', u_event, n - u_event FROM m
      |  UNION ALL SELECT 'domain_event_type', n - v_domain, v_domain FROM m
      |  UNION ALL SELECT 'range_value_0_500', n - v_range, v_range FROM m
      |  UNION ALL SELECT 'max_value_le_100', n - v_cap, v_cap FROM m
      |  UNION ALL SELECT 'pattern_props_json', n - v_json, v_json FROM m)
      |SELECT constraint_name, metric, violations,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM r""".stripMargin) {
    (s, dir) =>
      val m = Tables.load(s, dir, "events").agg(
        count(lit(1)).as("n"),
        count(col("user_id")).as("nn_user"),
        countDistinct(col("event_id")).as("u_event"),
        sum(when(col("event_type").isin("click", "error", "purchase", "signup", "view"), 0L)
          .otherwise(1L)).as("v_domain"),
        sum(when(col("value") > 0 && col("value") <= 500, 0L).otherwise(1L)).as("v_range"),
        sum(when(col("value") > 100, 1L).otherwise(0L)).as("v_cap"),
        sum(when(col("props").startsWith("{"), 0L).otherwise(1L)).as("v_json"))
      val report = m.select(explode(array(
        struct(lit("row_count").as("constraint_name"), col("n").as("metric"),
          lit(0L).as("violations")),
        struct(lit("completeness_user_id").as("constraint_name"), col("nn_user").as("metric"),
          (col("n") - col("nn_user")).as("violations")),
        struct(lit("uniqueness_event_id").as("constraint_name"), col("u_event").as("metric"),
          (col("n") - col("u_event")).as("violations")),
        struct(lit("domain_event_type").as("constraint_name"),
          (col("n") - col("v_domain")).as("metric"), col("v_domain").as("violations")),
        struct(lit("range_value_0_500").as("constraint_name"),
          (col("n") - col("v_range")).as("metric"), col("v_range").as("violations")),
        struct(lit("max_value_le_100").as("constraint_name"),
          (col("n") - col("v_cap")).as("metric"), col("v_cap").as("violations")),
        struct(lit("pattern_props_json").as("constraint_name"),
          (col("n") - col("v_json")).as("metric"), col("v_json").as("violations")))).as("c"))
      report.select(col("c.constraint_name").as("constraint_name"),
        col("c.metric").as("metric"), col("c.violations").as("violations"),
        when(col("c.violations") === 0L, "pass").otherwise("fail").as("status"))
  }

  val all: Seq[Q] =
    Seq(q29, q30, q31, q33, q34, q39, q42, q44, q45, q46, q50, q51, q52, q53,
      q55, q56, q57, q61, q64)
}
