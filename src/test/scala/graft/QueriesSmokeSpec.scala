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

  test("q28 approx distinct counts land within the HLL++ error envelope") {
    // q28 is rows-only in the driver gate (sketches are engine-specific), so
    // bound it here against the exact counts: approx_count_distinct
    // documents rsd = 0.05 default / 0.01 for the parts column, and a
    // 5*rsd envelope is ~5 sigma — a miss means the sketch is broken, not
    // unlucky.
    import org.apache.spark.sql.functions._
    val approx = graft.functions.AggregatorOps.q28.fn(spark, GraftTestSpark.sf).head()
    val exact = graft.core.Tables.load(spark, GraftTestSpark.sf, "lineitem")
      .agg(countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts")).head()
    def within(approxV: Long, exactV: Long, rsd: Double): Unit = {
      val rel = math.abs(approxV - exactV).toDouble / exactV
      assert(rel <= 5 * rsd,
        s"approx $approxV vs exact $exactV: relative error $rel exceeds 5*rsd=${5 * rsd}")
    }
    within(approx.getLong(0), exact.getLong(0), 0.05)
    within(approx.getLong(1), exact.getLong(1), 0.01)
  }

  test("q39 approx percentiles land within 2% of the exact q34 values") {
    // q39 is rows-only in the driver gate (sketch interpolation is
    // engine-specific); bound it against exact percentile here. At accuracy
    // 10000 the GK rank error is n/10000 ranks — far inside 2% in value on
    // this price distribution.
    val approx = graft.operators.MiscQueries.q39.fn(spark, GraftTestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.operators.MiscQueries.q34.fn(spark, GraftTestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (m, p95)) =>
      val (am, ap95) = approx(flag)
      assert(math.abs(am - m) / m <= 0.02, s"$flag median: approx $am vs exact $m")
      assert(math.abs(ap95 - p95) / p95 <= 0.02, s"$flag p95: approx $ap95 vs exact $p95")
    }
  }

  test("q43 correlated subquery agrees with q24's window formulation") {
    // two independent phrasings of "above nation average" — decorrelated
    // aggregate+join vs window — must select the same customers
    val sub = graft.operators.RelationalQueries.q43.fn(spark, GraftTestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    val win = graft.operators.RelationalQueries.q24.fn(spark, GraftTestSpark.sf)
      .collect().map(_.getLong(0)).toSet
    assert(sub.nonEmpty && sub === win)
  }

  test("q49 arg-max compaction equals q37's window formulation") {
    // same semantics, agg vs window plan — and the determinism precondition:
    // max_by needs tie-free ordering keys
    val ev = graft.core.Tables.load(spark, GraftTestSpark.sf, "events")
    assert(ev.count() === ev.select("user_id", "ts").distinct().count(),
      "(user_id, ts) ties would make max_by nondeterministic")
    def rows(q: graft.core.Q) = q.fn(spark, GraftTestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(rows(graft.operators.ReshapeQueries.q49) ===
      rows(graft.operators.ReshapeQueries.q37))
  }

  test("registry names are unique (duplicates would vanish in toMap)") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
  }

  test("README documents the registry counts (they drifted in rounds 4+5)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    // The counts line is GENERATED (graft.SyncCounts rewrites the marked
    // region from the registry); this guard proves the regeneration ran.
    assert(readme.contains(SyncCounts.countsLine),
      s"README counts are stale: run `sbt \"runMain graft.SyncCounts\"` " +
        s"(expected: ${SyncCounts.countsLine})")
  }
}
