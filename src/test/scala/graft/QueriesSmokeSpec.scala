package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end at sf0.001 (value equality vs the
  * DuckDB oracle is the driver's gate + tools/selfcheck.py; this guards
  * against runtime regressions offline).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      assert(fn(spark, GraftTestSpark.sf).count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("registry names are unique (duplicates would vanish in toMap)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
  }
}
