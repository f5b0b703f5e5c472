package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.SkewOps

/** Salting must be a pure execution-shape change: results identical to the
  * unsalted operators.
  */
class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("saltedJoin equals the plain join") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey")
    val salted = SkewOps.saltedJoin(orders, customer, "o_custkey", "c_custkey",
        saltBy = col("o_orderkey"), nSalts = 8)
      .select("o_orderkey", "c_custkey")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedSum equals the plain aggregation") {
    val li = Tables.load(spark, sf, "lineitem")
    val plain = li.groupBy(col("l_returnflag")).agg(sum("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedSum(li, col("l_returnflag"), col("l_quantity"),
        col("l_orderkey") * 10 + col("l_linenumber"), nSalts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }
}
