package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Co-located joins via bucketing (SURVEY §2.2 "bucketing for co-located
  * joins"): fact tables pre-bucketed on the join key join WITHOUT any
  * Exchange — at 100 TB this converts the dominant fact-fact shuffle into a
  * local merge per bucket.
  */
class BucketedJoinSpec extends AnyFunSuite {
  // ISOLATED session (shared SparkContext, private SQLConf): this suite
  // disables autoBroadcastJoinThreshold for its assertion, and sbt runs
  // suites in parallel against one session — mutating the SHARED conf here
  // raced PlanSnapshotSpec (a broadcast-shaped query planned during the
  // window snapshotted as SortMergeJoin). Conf-mutating suites must never
  // touch GraftTestSpark.spark's conf directly.
  private lazy val spark = GraftTestSpark.spark.newSession()

  test("bucketed fact-fact join plans with no Exchange") {
    // clear any orphan warehouse leftovers from earlier test JVMs
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val orphan = new java.io.File(s"spark-warehouse/$t")
      if (orphan.exists()) new scala.reflect.io.Directory(orphan).deleteRecursively()
    }
    Tables.load(spark, GraftTestSpark.sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.load(spark, GraftTestSpark.sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    // forbid broadcast so the test proves bucketing (not small-table luck)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed sides must not re-shuffle on the join key")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed sides must not re-shuffle on the join key")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
