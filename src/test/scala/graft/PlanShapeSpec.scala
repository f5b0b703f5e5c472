package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalQueries

/** Physical-plan regression guards (builder brief: ".explain the plan and
  * iterate until it's the plan you'd want"). These assert the scale-critical
  * plan properties survive refactors: filters/projections reach the parquet
  * scan, fixed-size dims broadcast, aggregation is partial+final, top-k
  * never global-sorts, and hot paths stay inside whole-stage codegen.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def plan(q: graft.core.Q): String =
    q.fn(spark, sf).queryExecution.executedPlan.toString

  test("q2: predicate and projection are pushed into the parquet scan") {
    val p = plan(RelationalQueries.q2)
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThan(l_quantity"), "quantity filter must reach the scan")
    // 4-column read schema, not the 11-column table
    assert(!p.contains("l_returnflag"), "unused columns must be pruned from the scan")
  }

  test("q8: star joins through nation/region are broadcast, not shuffled") {
    val p = plan(RelationalQueries.q8)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "fixed-cardinality dims must never SMJ")
  }

  test("q1: aggregation splits into partial + final") {
    val p = plan(RelationalQueries.q1)
    assert(p.contains("partial_sum") || p.contains("partial_"),
      "map-side partial aggregation must precede the exchange")
  }

  test("q3: top-10 plans as TakeOrderedAndProject, no global sort") {
    val p = plan(RelationalQueries.q3)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q4: EXISTS plans as a semi join") {
    val p = plan(RelationalQueries.q4)
    assert(p.contains("LeftSemi"))
  }

  test("q5: NOT EXISTS plans as an anti join") {
    val p = plan(RelationalQueries.q5)
    assert(p.contains("LeftAnti"))
  }

  test("q9: tiny band table plans as broadcast nested loop, fact not shuffled") {
    val p = plan(RelationalQueries.q9)
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("d6: adjacent-pair shingle join is an equi join, never a nested loop") {
    val p = plan(graft.operators.DedupOps.d6)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "doc_id+1 must be a materialized equi key (nested loop re-evaluates shingles per pair)")
  }

  test("q1: hot path is whole-stage codegen") {
    // AQE hides codegen spans until the final plan exists -> execute first
    val df = RelationalQueries.q1.fn(spark, sf)
    df.collect()
    // codegen stages render as "*(n) Node" in the final plan string
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("vec_dot participates in whole-stage codegen (no CodegenFallback)") {
    import graft.functions.VectorDot
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[VectorDot]))
  }

  test("simhash32 participates in whole-stage codegen (no CodegenFallback)") {
    import graft.functions.SimHash32
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[SimHash32]))
  }

  test("minhash16 participates in whole-stage codegen (no CodegenFallback)") {
    import graft.functions.MinHash16
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    assert(!classOf[CodegenFallback].isAssignableFrom(classOf[MinHash16]))
  }

  test("e1: near-dup pairing is an equi join on the LSH bucket, never all-pairs") {
    val p = plan(graft.operators.SimilarityOps.e1)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "e1 must pair only within hyperplane buckets (equi join on the bucket key)")
  }

  test("d4: verify joins broadcast the per-doc word sets; no shuffle of arrays") {
    val p = plan(graft.operators.DedupOps.d4)
    // the two sets joins (on a and b) plus the oversize anti join must all be
    // broadcast — round 1 shipped word-hash arrays through shuffle joins
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBroadcast >= 3, s"expected >=3 broadcast joins (anti + 2 verify), got $nBroadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), "verify stage must never sort-merge the word-set arrays")
  }

  test("t6: document-frequency relation broadcasts into the tf side") {
    val p = plan(graft.functions.TextOps.t6)
    assert(p.contains("BroadcastHashJoin"),
      "vocabulary-sized df must broadcast, never shuffle the tf fact side")
  }

  test("d7: simhash band self-join reuses one exchange") {
    val df = graft.operators.DedupOps.d7.fn(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }

  test("d4: band self-join reuses one exchange (signature subtree not duplicated)") {
    // aliased self-join over the same plan object: the second side must plan
    // as ReusedExchange after execution (AQE finalizes reuse at runtime)
    val df = graft.operators.DedupOps.d4.fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"expected the pairing self-join to reuse the bands exchange in:\n$p")
  }
}
