package graft

import org.scalatest.funsuite.AnyFunSuite

/** q60's oracle is a WITH RECURSIVE CTE whose text is valid on BOTH engines.
  * DuckDB runs it as the correctness gate; this spec runs the SAME text
  * through Spark 4's recursive-CTE support (UnionLoop) and pins it equal to
  * the production explode(sequence(...)) path — so the recursion capability
  * is certified in Spark without being the plan used at scale (the loop
  * costs one driver-scheduled job per month; the closed form is one job
  * total — see the q60 scaladoc).
  */
class RecursiveCteTwinSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("Spark executes q60's recursive oracle SQL and matches the production path") {
    import graft.operators.RelationalQueries
    val production = RelationalQueries.q60.fn(spark, GraftTestSpark.sf)
      .collect().map(_.toString).sorted
    // q60.fn registered the `orders` view; reuse it for the recursive twin.
    val recursive = spark.sql(RelationalQueries.q60RecursiveSql)
      .collect().map(_.toString).sorted
    assert(recursive.nonEmpty)
    assert(recursive === production)
  }
}
