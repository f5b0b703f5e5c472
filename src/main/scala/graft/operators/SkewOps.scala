package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Skew-mitigation utilities (SURVEY §7.4 "salting for skew", builder brief
  * "skewed keys -> salting or AQE skew-join").
  *
  * AQE's skew-join handles most partition skew at runtime; salting is the
  * explicit tool for the cases AQE can't re-split: a single hot KEY inside
  * one task (aggregation skew), or a join key whose hot value dominates.
  * Both utilities are deterministic and produce results identical to their
  * unsalted forms — proved through the oracle gate (q32).
  */
object SkewOps {

  /** Two-phase salted aggregation: groupBy (key, salt) partial aggregate,
    * then groupBy key to merge. A hot key's rows spread across `nSalts`
    * tasks in phase 1 instead of serializing through one.
    *
    * @param saltBy any per-row column used to derive the deterministic salt
    *               (a unique id gives uniform spread)
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBy: Column, nSalts: Int): DataFrame =
    df.select(key.as("__key"), value.as("__v"), pmod(hash(saltBy), lit(nSalts)).as("__salt"))
      .groupBy(col("__key"), col("__salt"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as("__sum"))

  /** Salted join of a skewed big side against a small-but-not-broadcastable
    * side: big rows get a deterministic salt in [0, nSalts); the small side
    * is replicated nSalts times; the join key becomes (key, salt), so one
    * hot key spreads over nSalts shuffle partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      saltBy: Column, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltBy), lit(nSalts)))
    val repSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(repSmall,
      saltedBig(bigKey) === repSmall(smallKey) && saltedBig("__salt") === repSmall("__salt"))
      .drop("__salt")
  }

  /** q32: salted two-phase aggregation returns exactly the plain groupBy
    * result — the equivalence is the point (oracle is the unsalted SQL).
    * l_returnflag has only 3 values: a genuinely skew-prone key.
    */
  val q32 = Q(
    "q32_salted_agg",
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.load(s, dir, "lineitem")
    saltedSum(li, col("l_returnflag"), col("l_quantity"),
        concat(col("l_orderkey"), lit("-"), col("l_linenumber")), nSalts = 16)
      .select(col("__key").as("l_returnflag"), round(col("__sum"), 2).as("sum_qty"))
  }

  val all: Seq[Q] = Seq(q32)
}
