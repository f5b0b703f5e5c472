package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Round-3 coverage: relational reshaping (pivot/unpivot), the
  * latest-record-per-key pattern, and deterministic hash splitting — the
  * remaining table-shape operators a curation pipeline leans on.
  */
object ReshapeQueries {

  /** q35: PIVOT — revenue matrix of order priority x order year. The pivot
    * values are enumerated explicitly, which is also the 100 TB stance: an
    * implicit pivot first runs a distinct over the pivot column (an extra
    * corpus pass) and can explode the schema; explicit values make the plan
    * a single partial+final hash agg with a fixed output width.
    */
  val q35 = Q(
    "q35_pivot_revenue",
    """SELECT o_orderpriority,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 1995), 2) AS y1995,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 1996), 2) AS y1996,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 1997), 2) AS y1997,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 1998), 2) AS y1998,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 1999), 2) AS y1999,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 2000), 2) AS y2000,
      |  round(sum(o_totalprice) FILTER (year(o_orderdate) = 2001), 2) AS y2001
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .withColumn("yr", concat(lit("y"), year(col("o_orderdate"))))
      .groupBy(col("o_orderpriority"))
      .pivot("yr", Seq("y1995", "y1996", "y1997", "y1998", "y1999", "y2000", "y2001"))
      .agg(round(sum(col("o_totalprice")), 2))
  }

  /** q36: UNPIVOT (melt) — wide per-flag aggregates back to long
    * (flag, metric, value) form. Unpivot is a per-row expression expansion
    * (a generator, no shuffle beyond the feeding agg), so it scales as a map
    * stage over the already-aggregated relation.
    */
  val q36 = Q(
    "q36_unpivot_metrics",
    """WITH w AS (
      |  SELECT l_returnflag,
      |    round(sum(l_quantity), 2) AS sum_qty,
      |    round(sum(l_extendedprice), 2) AS sum_price,
      |    round(avg(l_discount), 4) AS avg_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
      |UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM w""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
  }

  /** q37: latest record per key — the CDC/compaction pattern ("current state
    * of every user"), ROW_NUMBER() = 1 over (key, ts DESC). At scale this is
    * one shuffle on the key with the window evaluated per partition; the
    * event_id tiebreak makes it deterministic under equal timestamps.
    */
  val q37 = Q(
    "q37_latest_event_per_user",
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
  }

  /** q38: deterministic train/val/test split (8/1/1) — hash-mod bucketing on
    * the row key, the standard reproducible dataset-split op. The hash is
    * the portable md5-prefix (identical in the oracle), so the SAME rows
    * land in the same split on every engine and every run; a `rand()` split
    * would be neither reproducible nor oracle-checkable. Pure map stage +
    * hash agg — shuffle carries 3 rows.
    */
  val q38 = Q(
    "q38_hash_split",
    s"""SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
       |FROM (
       |  SELECT l_extendedprice,
       |    ${graft.core.PortableHash.duck("l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR")} % 10 AS b
       |  FROM lineitem) t
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .withColumn("b",
        expr(graft.core.PortableHash.spark(
          "concat_ws('|', CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING))") + " % 10"))
      .groupBy(
        when(col("b") < 8, "train").when(col("b") === 8, "val").otherwise("test").as("split"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
  }

  /** q41: time-RANGE window frame — each event's trailing 1-hour sum of
    * value for its user, framed on exact integer MICROSECONDS
    * (unix_micros / epoch_us; the fixtures carry sub-second components, so
    * second-granularity framing would disagree between engines at the
    * boundary). RANGE frames are the time-series surface rows-between
    * cannot express: the frame follows the clock, not the row count. One
    * shuffle on the key; per-partition sort + sliding accumulator.
    */
  val q41 = Q(
    "q41_time_range_window",
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS trailing_1h,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_in_window
      |FROM events""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000 * 1000, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 2).as("trailing_1h"),
        count(lit(1)).over(w).as("n_in_window"))
  }

  /** q47: SCD2 validity intervals — each purchase event opens a version of
    * the user's `value` attribute valid until the next purchase
    * (half-open [valid_from, valid_to) in integer microseconds; the current
    * version is closed with a Long.MaxValue sentinel, the warehouse
    * convention that keeps range predicates sargable — a NULL end would
    * need IS NULL branches in every as-of probe). One shuffle on the key;
    * lead() is evaluated in the same per-partition sort as q37's
    * compaction, so building history costs the same as keeping only the
    * latest.
    */
  val q47 = Q(
    "q47_scd2_intervals",
    """SELECT user_id, event_id, value AS attr_value, epoch_us(ts) AS valid_from,
      |  coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      |           9223372036854775807) AS valid_to
      |FROM events WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value").as("attr_value"),
        unix_micros(col("ts")).as("valid_from"),
        coalesce(lead(unix_micros(col("ts")), 1).over(w), lit(Long.MaxValue))
          .as("valid_to"))
  }

  /** q48: MERGE/upsert census — reconcile a base snapshot (latest purchase
    * per user in the first 3 days) with an update batch (latest in the last
    * 3 days) and report the MERGE action mix: insert (new key), update
    * (key in both), keep (base key untouched). The full-outer join on the
    * key IS the merge: at scale the update batch is the small side (AQE
    * broadcasts it) and the preserved base streams — the shape every
    * compaction/upsert sink (Delta/Iceberg-style) executes underneath.
    */
  val q48 = Q(
    "q48_merge_upsert",
    """WITH base AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value,
      |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase'
      |      AND ts < TIMESTAMP '2024-01-04 00:00:00') t WHERE rn = 1),
      |upd AS (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value,
      |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE event_type = 'purchase'
      |      AND ts >= TIMESTAMP '2024-01-28 00:00:00') t WHERE rn = 1),
      |m AS (SELECT CASE WHEN b.user_id IS NULL THEN 'insert'
      |             WHEN u.user_id IS NULL THEN 'keep'
      |             ELSE 'update' END AS action,
      |        coalesce(u.value, b.value) AS final_value
      |      FROM base b FULL OUTER JOIN upd u ON u.user_id = b.user_id)
      |SELECT action, count(*) AS n, round(sum(final_value), 2) AS total_value
      |FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
    def latest(range: org.apache.spark.sql.Column) = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase" && range)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("value"))
    }
    val base = latest(col("ts") < lit("2024-01-04"))
    val upd = latest(col("ts") >= lit("2024-01-28"))
    base.as("b").join(upd.as("u"), col("b.user_id") === col("u.user_id"), "full_outer")
      .select(
        when(col("b.user_id").isNull, "insert")
          .when(col("u.user_id").isNull, "keep")
          .otherwise("update").as("action"),
        coalesce(col("u.value"), col("b.value")).as("final_value"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n"), round(sum(col("final_value")), 2).as("total_value"))
  }

  /** q49: arg-max compaction — q37's latest-record-per-key computed as a
    * partial+final AGGREGATION (max_by keyed on the event-time micros)
    * instead of a ranking window. Same answer (QueriesSmokeSpec
    * cross-checks the two), very different scale profile: the window form
    * must shuffle EVERY raw row to its key partition before ranking;
    * max_by reduces map-side first, so the exchange carries one row per
    * (map partition, key) — the preferred compaction shape at 100 TB.
    * Plan nuance worth knowing: with only fixed-width payloads this is a
    * pure HashAggregate; a string payload (event_type here) makes the agg
    * buffer variable-width, which Spark executes as SortAggregate — a
    * per-partition sort on the GROUP key, but still with the map-side
    * partial reduction that is the point (guarded by PlanShapeSpec: no
    * Window, partial_max_by below the exchange). Deterministic because the
    * fixture has no (user_id, ts) ties (asserted in the suite); with ties
    * the window form's explicit tiebreak is the correct tool.
    */
  val q49 = Q(
    "q49_argmax_compaction",
    """SELECT user_id, max_by(event_id, epoch_us(ts)) AS event_id,
      |  max_by(event_type, epoch_us(ts)) AS event_type,
      |  max_by(value, epoch_us(ts)) AS value
      |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        expr("max_by(event_id, unix_micros(ts))").as("event_id"),
        expr("max_by(event_type, unix_micros(ts))").as("event_type"),
        expr("max_by(value, unix_micros(ts))").as("value"))
  }

  /** q63: forward-fill (LOCF) via `last_value(... IGNORE NULLS)` — the
    * gap-filling idiom every sensor/metrics lake runs: carry each user's
    * last observed reading forward across rows that did not report one
    * ('view' events play the non-reporting role). IGNORE NULLS is the one
    * window-function modifier the frame family (q12/q13/q41) never
    * touches; the frame is the running ROWS prefix over a TOTAL per-user
    * order (ts, event_id), so the fill is well-defined on every input,
    * and users whose first events are non-reporting keep NULL (the oracle
    * counts those heads too — both engines must agree where the fill has
    * nothing to carry).
    *
    * Scale shape: one window over the user_id partitioning — single
    * shuffle on a high-cardinality key, no global sort; identical to the
    * q12 running-sum plan with a different aggregate.
    */
  val q63 = Q(
    "q63_forward_fill",
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type <> 'view' THEN round(value, 2) END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM events""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        last(when(col("event_type") =!= "view", round(col("value"), 2)),
          ignoreNulls = true).over(w).as("filled"))
  }

  /** q65: DATE-SPINE GAP-FILL with linear interpolation — the resample
    * shape q63's forward-fill doesn't cover: a sparse per-series daily
    * aggregate is DENSIFIED onto a generated day spine (`sequence` +
    * `explode`, each series spanning its own min..max), and missing days
    * are linearly interpolated between the neighboring observed points
    * (time-weighted, not last-value-carried). The residue filter
    * (`user_id % 191 = 0`) makes the fixture genuinely sparse so the
    * spine manufactures rows and the interpolation arithmetic is
    * load-bearing. The fill is computed in INTEGER CENTS with floor
    * division — interpolating two 2-decimal endpoints at frac 1/2 lands
    * EXACTLY on a decimal midpoint (x.xx5), where Java's binary-aware
    * HALF_UP and DuckDB's decimal rounding disagree by one cent; integer
    * arithmetic has no midpoint to disagree on (the true quotient's
    * distance from any integer is ≥ 1/interval-days, far above double
    * error, so floor is deterministic on both engines).
    * Scale shape: spine generation is per-series `sequence` (no cross
    * join against a calendar table), the fill is one partitioned window
    * pass — series-keyed shuffle, never a global sort.
    */
  val q65 = Q(
    "q65_gapfill_interpolate",
    """WITH src AS (
      |  SELECT event_type, ts::DATE AS day, round(sum(value), 2) AS v,
      |    count(*) AS n
      |  FROM events WHERE user_id % 191 = 0 GROUP BY 1, 2),
      |b AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM src GROUP BY 1),
      |spine AS (
      |  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM b),
      |j AS (
      |  SELECT s.event_type, s.day, src.v, src.n
      |  FROM spine s LEFT JOIN src USING (event_type, day)),
      |f AS (
      |  SELECT *,
      |    last_value(v IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
      |    first_value(v IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day
      |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY day
      |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j)
      |SELECT event_type, day, coalesce(n, 0) AS n,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE (CAST(round(pv * 100) AS BIGINT)
      |             + floor(((CAST(round(nv * 100) AS BIGINT)
      |                       - CAST(round(pv * 100) AS BIGINT))
      |                      * (day - pd))::DOUBLE / (nd - pd)::DOUBLE))::DOUBLE / 100.0
      |  END AS filled,
      |  (v IS NULL) AS is_gap
      |FROM f""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val src = Tables.load(s, dir, "events")
      .filter(col("user_id") % 191 === 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))
    val spine = src.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val j = spine.join(src, Seq("event_type", "day"), "left")
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    val knownDay = when(col("v").isNotNull, col("day"))
    j.select(col("event_type"), col("day"), col("v"), col("n"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
        last(knownDay, ignoreNulls = true).over(wPrev).as("pd"),
        first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
        first(knownDay, ignoreNulls = true).over(wNext).as("nd"))
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("v").isNotNull, col("v"))
          .otherwise(
            (round(col("pv") * 100).cast("long") +
              floor(((round(col("nv") * 100).cast("long") -
                round(col("pv") * 100).cast("long")) *
                datediff(col("day"), col("pd")).cast("long")).cast("double") /
                datediff(col("nd"), col("pd")).cast("double")))
              .cast("double") / 100.0).as("filled"),
        col("v").isNull.as("is_gap"))
  }

  val all: Seq[Q] = Seq(q35, q36, q37, q38, q41, q47, q48, q49, q63, q65)
}
