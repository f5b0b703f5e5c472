package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** Property checks on the similarity primitives: the fused codegen
  * hyperplane-bucket expression must equal its higher-order-function spec
  * (which is the exact text the DuckDB oracle replays), on real fixture
  * embeddings.
  */
class SimilarityPropertySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("codegen hyperplane_bucket equals the lambda spec on fixture embeddings") {
    val rows = graft.core.Tables.load(spark, sf, "embeddings")
      .selectExpr(
        "hyperplane_bucket(embedding) AS fast",
        s"${SimilarityOps.bucketSparkSpec} AS spec")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("hyperplane_bucket participates in whole-stage codegen (no CodegenFallback)") {
    import graft.functions.HyperplaneBucket
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[HyperplaneBucket]))
  }
}
