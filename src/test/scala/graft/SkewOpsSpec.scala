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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // Isolated session: skew detection thresholds are global conf, and this
    // suite must not perturb parallel suites' plans (same discipline as
    // BucketedJoinSpec). Thresholds are shrunk so the fixture-scale skew
    // trips the same code path a 100 TB hot key would.
    val s = GraftTestSpark.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    import org.apache.spark.sql.functions._
    import s.implicits._
    // one hot key holding ~90% of the left side
    val left = s.range(0, 200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("attr"))
    val j = left.join(right, "k").groupBy().agg(count(lit(1)).as("n"), sum("attr").as("s"))
    val n = j.collect().head.getLong(0)
    assert(n === 200000L - (200000L / 10) + 100, s"join result wrong: $n") // hot key 7 matches + ids<1000 divisible by 10
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join split in the final plan:\n$plan")
  }

  test("runtime Bloom filter is injected on the probe side of a selective join") {
    // At 100 TB the optimizer's runtime row-level filtering is a major scan
    // saver: a selective dimension filter becomes a Bloom filter evaluated
    // on the fact side BEFORE the shuffle. Thresholds here are shrunk so
    // fixture-sized relations take the same code path (isolated session).
    val s = GraftTestSpark.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join, the case that matters
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    import org.apache.spark.sql.functions._
    val li = Tables.load(s, sf, "lineitem")
    val o = Tables.load(s, sf, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)).as("n"))
    val planned = j.queryExecution.executedPlan.toString
    assert(planned.contains("might_contain"),
      s"expected a runtime Bloom filter (might_contain) on the lineitem probe side:\n$planned")
    // and it must not change the answer
    val expected = li.join(Tables.load(s, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(j.collect().head.getLong(0) === expected)
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
