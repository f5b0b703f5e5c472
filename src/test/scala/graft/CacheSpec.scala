package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Cached-relation surface: persist() must serve repeated readers from the
  * in-memory columnar store (InMemoryTableScan in the plan) with identical
  * results. The 100 TB usage is a hot dimension or an iterative algorithm's
  * working set — never the fact table; eviction (unpersist) is part of the
  * contract, so the test exercises the full lifecycle.
  */
class CacheSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("persisted dimension serves repeat queries from InMemoryTableScan") {
    val nation = Tables.load(spark, sf, "nation").persist()
    try {
      val uncachedCount = Tables.load(spark, sf, "nation").count()
      // first action materializes the cache
      assert(nation.count() === uncachedCount)
      // a different query over the same cached relation must scan memory,
      // not parquet
      val q = nation.groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"expected the cached relation to plan InMemoryTableScan:\n$plan")
      // results identical to the cold path
      val cold = Tables.load(spark, sf, "nation")
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.get(0), r.get(1))).toSet
      val warm = q.collect().map(r => (r.get(0), r.get(1))).toSet
      assert(warm === cold)
    } finally nation.unpersist(blocking = true)
    // after eviction the plan reverts to the file scan
    val after = Tables.load(spark, sf, "nation").groupBy(col("n_regionkey")).count()
    after.collect()
    assert(!after.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
  }
}
