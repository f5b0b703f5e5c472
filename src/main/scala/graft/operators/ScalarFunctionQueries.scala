package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Scalar-function coverage (SURVEY §2.2: string / date / math / array /
  * JSON). All functions are Catalyst built-ins (whole-stage codegen'd) — no
  * UDFs in any hot path. Outputs are cast so Spark and DuckDB agree on type
  * (Spark `length`/`year` yield int, DuckDB bigint; Spark `floor` yields
  * long, DuckDB double).
  */
object ScalarFunctionQueries {

  /** String functions over customer names. */
  val q19 = Q(
    "q19_string_functions",
    """SELECT c_custkey,
      |  upper(substring(c_name, 1, 8)) AS uname,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS id_str,
      |  length(c_name) AS name_len,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged,
      |  lpad(c_custkey::VARCHAR, 10, '0') AS padded,
      |  replace(lower(c_name), 'customer', 'cust') AS shortname
      |FROM customer WHERE c_custkey < 200""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "customer").filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("uname"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_str"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        regexp_replace(lower(col("c_name")), "customer", "cust").as("shortname"))
  }

  /** Date/time functions over orders. */
  val q20 = Q(
    "q20_date_functions",
    """SELECT o_orderkey,
      |  year(o_orderdate)    AS order_year,
      |  month(o_orderdate)   AS order_month,
      |  quarter(o_orderdate) AS order_quarter,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
      |  o_orderdate + INTERVAL 7 DAY AS ship_deadline,
      |  epoch(o_orderdate)::BIGINT AS unix_ts
      |FROM orders WHERE o_orderkey < 300""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders").filter(col("o_orderkey") < 300)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_2002"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("ship_deadline"),
        unix_timestamp(col("o_orderdate")).as("unix_ts"))
  }

  /** Math functions over lineitem. sqrt/ln are rounded on both sides (IEEE
    * ops are deterministic, rounding just guards repr drift).
    */
  val q21 = Q(
    "q21_math_functions",
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice * 0.1, 4) AS price10,
      |  abs(l_quantity - 25.0) AS qdev,
      |  pow(l_quantity, 2) AS qsq,
      |  floor(l_extendedprice)::BIGINT AS price_floor,
      |  ceil(l_extendedprice)::BIGINT AS price_ceil,
      |  round(sqrt(l_extendedprice), 6) AS price_sqrt,
      |  round(ln(l_extendedprice), 6) AS price_ln,
      |  l_orderkey % 7 AS key_mod,
      |  greatest(l_quantity, l_discount * 100) AS gr,
      |  least(l_tax, l_discount) AS ls
      |FROM lineitem WHERE l_orderkey < 150""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 150)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // 4 places: the product has <=3 significant decimals, so no engine
        // ever sees a round-half tie (2 places hits .xx5 boundaries)
        round(col("l_extendedprice") * 0.1, 4).as("price10"),
        abs(col("l_quantity") - 25.0).as("qdev"),
        pow(col("l_quantity"), 2).as("qsq"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_tax"), col("l_discount")).as("ls"))
  }

  /** Array higher-order functions over the embedding vectors: size, index,
    * slice, transform+aggregate (norm, mean). Element arithmetic is widened
    * to double before any fold on BOTH sides so float summation matches.
    */
  val q22 = Q(
    "q22_array_functions",
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  round(embedding[1]::DOUBLE, 6) + 0.0 AS first_val,
      |  round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6) + 0.0 AS max_val,
      |  round(sqrt(list_sum(list_transform(embedding, x -> (x::DOUBLE)*(x::DOUBLE)))), 4) AS l2_norm,
      |  round(list_sum(list_transform(embedding, x -> x::DOUBLE)) / len(embedding), 4) + 0.0 AS mean_val,
      |  round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 4) + 0.0 AS head_sum
      |FROM embeddings""".stripMargin) { (s, dir) =>
    // `+ 0.0` on BOTH sides squashes IEEE negative zero: DuckDB's round
    // keeps -0.0 where Spark's (BigDecimal) yields +0.0, and the driver
    // compares rendered strings — first seen as a real mismatch on
    // mean_val at sf0.1 (a mean rounding to zero from below)
    Tables.load(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 6) + 0.0).as("first_val"),
        (round(array_max(expr("transform(embedding, x -> CAST(x AS DOUBLE))")), 6) + 0.0).as("max_val"),
        round(sqrt(expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")), 4).as("l2_norm"),
        (round(expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))") / size(col("embedding")), 4) + 0.0).as("mean_val"),
        (round(expr(
          "aggregate(slice(embedding, 1, 8), CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 4) + 0.0).as("head_sum"))
  }

  /** JSON functions over the events payload column: schema-on-read with
    * get_json_object, then a numeric rollup by extracted key.
    */
  val q23 = Q(
    "q23_json_functions",
    """SELECT json_extract_string(props, '$.k')::BIGINT % 10 AS k_bucket,
      |  count(*) AS n,
      |  round(avg(value), 2) AS avg_value
      |FROM events
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
  }

  /** q40: STRUCT functions — construct (named_struct), explode an array of
    * structs built with a higher-order transform, and field-access the
    * pieces back out. Completes the complex-type family (q22 arrays, q29
    * maps, q23 JSON). Struct construction is pure projection — codegen'd,
    * shuffle-free — and `explode` of a bounded 8-element array is a bounded
    * generator, so the op is a map stage at any scale.
    */
  val q40 = Q(
    "q40_struct_functions",
    """SELECT vec_id, s.idx AS idx, round(s.val, 6) AS val,
      |  round(s.val * s.idx, 6) AS weighted
      |FROM (
      |  SELECT vec_id,
      |    unnest(list_transform(generate_series(1, 8),
      |      i -> struct_pack(idx := i::BIGINT, val := embedding[i]::DOUBLE))) AS s
      |  FROM embeddings WHERE vec_id < 50) t""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), explode(expr(
        """transform(sequence(1, 8),
          |  i -> named_struct('idx', CAST(i AS BIGINT), 'val', CAST(element_at(embedding, i) AS DOUBLE)))""".stripMargin))
        .as("s"))
      .select(col("vec_id"), col("s.idx").as("idx"),
        round(col("s.val"), 6).as("val"),
        round(col("s.val") * col("s.idx"), 6).as("weighted"))
  }

  val all: Seq[Q] = Seq(q19, q20, q21, q22, q23, q40)
}
