package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.SimilarityOps

/** Targeted invariants for the tokenizer-training (t15) and diversified
  * re-rank (e5) operators, pinning the two load-bearing claims their
  * scaladocs make: the wrapped-symbol `replace` IS greedy BPE merge, and
  * MMR's greedy recurrence selects from the candidate pool without
  * repeating itself and seeds at pure relevance.
  */
class BpeMmrSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("wrapped-symbol replace is left-to-right non-overlapping greedy merge") {
    val r = spark.sql(
      "SELECT replace('<a> <a> <a>', '<a> <a>', '<aa>') AS overlap, " +
        "replace('<al> <l> <o>', '<a> <l>', '<al>') AS boundary")
      .collect().head
    // greedy: the first pair is consumed, the third symbol survives
    assert(r.getString(0) === "<aa> <a>")
    // a multi-char symbol never exposes a bare pair across its boundary
    assert(r.getString(1) === "<al> <l> <o>")
  }

  test("t15 emits one distinct lowercase merge per round") {
    val rows = TextOps.t15.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length === TextOps.BpeRounds)
    assert(rows.map(_._1).sorted.toSeq === (1L to TextOps.BpeRounds.toLong))
    val merged = rows.map(_._2)
    assert(merged.distinct.length === merged.length)
    merged.foreach(m => assert(m.matches("[a-z]{2,}"), s"merged symbol '$m'"))
    rows.foreach { case (_, _, cnt) => assert(cnt > 0) }
  }

  test("e5 selects k+1 distinct candidates per query, seeded at pure relevance") {
    val sel = SimilarityOps.e5.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val perQ = sel.groupBy(_._1)
    assert(perQ.keySet === Set(0L, 1L, 2L))
    perQ.foreach { case (qid, rows) =>
      assert(rows.length === SimilarityOps.MmrPicks + 1, s"qid=$qid")
      val docs = rows.map(_._3)
      assert(docs.distinct.length === docs.length, s"qid=$qid repeats a doc")
      // the round-0 seed is the relevance argmax of everything e5 selected
      val seed = rows.find(_._2 == 0L).get
      assert(rows.forall(r => r._4 <= seed._4), s"qid=$qid seed not max-rel")
    }
  }
}
