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

  /** q28: approx_count_distinct (HLL++). Sketch internals are
    * engine-specific, so there is deliberately NO DuckDB oracle (driver
    * records a rows-only check); the companion exact count is oracle-checked
    * in q17/d1.
    */
  val q28 = Q.rowsOnly("q28_approx_distinct") { (s, dir) =>
    Tables.load(s, dir, "lineitem").agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
  }

  val all: Seq[Q] = Seq(q26, q27, q28)
}
