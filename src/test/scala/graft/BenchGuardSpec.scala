package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's contention defense only adjudicates queries that have a
  * committed reference time — round 5's q60 landed after bench_ref.json
  * was recorded and its 15 s outlier could never be flagged. These pin the
  * coverage defense (ref_missing) and the batch/streaming split.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("a registered query missing from an active ref is flagged") {
    assert(Bench.refGaps(Seq("q1", "q60", "st1"), Map("q1" -> 0.2, "st1" -> 9.0))
      === Seq("q60"))
  }

  test("an inactive ref (empty) disables the check instead of flagging everything") {
    assert(Bench.refGaps(Seq("q1", "q2"), Map.empty) === Seq.empty)
  }

  test("every currently registered query classifies as batch xor streaming-replay") {
    val names = SparkEntry.registry.map(_.name)
    val streaming = names.filter(Bench.isStreamingReplay)
    // st* are exactly the ReplayHarness rows; w1-w3 are batch window twins
    assert(streaming.forall(_.matches("st\\d+_.*")), streaming.mkString(","))
    assert(streaming.size === names.count(_.matches("st\\d+_.*")))
  }

  test("the committed bench_ref covers the whole registry (coverage defense teeth)") {
    val p = java.nio.file.Paths.get("bench_ref.json")
    assume(java.nio.file.Files.exists(p))
    val text = java.nio.file.Files.readString(p)
    val refNames = """"([A-Za-z0-9_]+)"\s*:\s*[0-9.Ee+-]+""".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val gaps = Bench.refGaps(SparkEntry.registry.map(_.name),
      refNames.iterator.map(_ -> 1.0).toMap)
    assert(gaps.isEmpty,
      s"bench_ref.json is stale — re-record it on a quiet box (missing: ${gaps.mkString(", ")})")
  }
}
