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

  test("t15 emits consecutive rounds of distinct lowercase merges up to the cap") {
    val rows = TextOps.t15.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length === TextOps.BpeMaxRounds,
      s"fixture corpus saturated before the ${TextOps.BpeMaxRounds}-round cap")
    assert(rows.map(_._1).sorted.toSeq === (1L to rows.length.toLong))
    val merged = rows.map(_._2)
    assert(merged.distinct.length === merged.length)
    merged.foreach(m => assert(m.matches("[a-z]{2,}"), s"merged symbol '$m'"))
    rows.foreach { case (_, _, cnt) => assert(cnt >= TextOps.BpeMinPairCount) }
  }

  // ---- bpeTrain property checks vs an independent in-memory reference ----

  /** Reference BPE: symbol-VECTOR representation (no string replace), the
    * same weighted pair count, (count desc, wrapped-pair asc) tie-break,
    * left-to-right non-overlapping greedy merge, and the same
    * stop-below-minCount rule — an independent implementation of Sennrich
    * et al.'s algorithm to catch any divergence in t15's string-level one.
    */
  private def refBpe(
      words: Seq[(String, Long)], maxRounds: Int, minCount: Long): Seq[(Long, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var stop = false
    while (!stop && out.length < maxRounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, s"<$x> <$y>") }
        if (c < minCount) stop = true
        else {
          vocab = vocab.map { case (syms, f) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), f)
          }
          out += ((out.length + 1L, a + b, c))
        }
      }
    }
    out.toSeq
  }

  /** Run the engine's bpeTrain over an explicit word->freq corpus. */
  private def engineBpe(
      words: Seq[(String, Long)], maxRounds: Int, minCount: Long): Seq[(Long, String, Long)] = {
    import spark.implicits._
    val vocab = words.toDF("w", "freq")
      .selectExpr("trim(regexp_replace(w, '(.)', '<$1> ')) AS syms", "freq")
    TextOps.bpeTrain(spark, vocab, maxRounds, minCount)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("bpeTrain matches the reference BPE on a crafted tie/overlap corpus") {
    // overlapping runs ("aaaa"), cross-word shared pairs, a tie between
    // "<a> <b>" and "<b> <a>" at equal count (pair-asc must pick "<a> <b>"),
    // and a length-1 word that can never pair
    val corpus = Seq(("aaaa", 3L), ("abab", 2L), ("baba", 2L), ("cab", 4L), ("c", 9L))
    assert(engineBpe(corpus, 8, 2L) === refBpe(corpus, 8, 2L))
  }

  test("bpeTrain stops data-dependently: saturation before the round cap") {
    // every adjacent pair is unique -> all counts 1 < minCount 2 -> 0 merges
    val unique = Seq(("abc", 1L), ("def", 1L), ("ghij", 1L))
    assert(engineBpe(unique, 10, 2L) === Seq.empty)
    assert(refBpe(unique, 10, 2L) === Seq.empty)
    // merges for a few rounds, then the best pair falls under the threshold
    // mid-run: the engine must emit exactly the reference's prefix
    val midStop = Seq(("aaa", 5L), ("bb", 1L), ("cd", 1L))
    val eng = engineBpe(midStop, 10, 3L)
    assert(eng === refBpe(midStop, 10, 3L))
    assert(eng.nonEmpty && eng.length < 10, s"expected a mid-run stop, got $eng")
  }

  test("bpeTrain matches the reference BPE on randomized small-alphabet corpora") {
    val rng = new scala.util.Random(0xb9e5eedL)
    (1 to 4).foreach { trial =>
      val nWords = 5 + rng.nextInt(15)
      val corpus = (0 until nWords).map { _ =>
        val len = 1 + rng.nextInt(6)
        val w = (0 until len).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
        (w, 1L + rng.nextInt(5))
      }.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq
      val eng = engineBpe(corpus, 10, 2L)
      val ref = refBpe(corpus, 10, 2L)
      assert(eng === ref, s"trial $trial corpus=$corpus")
    }
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

  /** Candidate pool for direct mmrRerank tests: (qid, doc_id, emb, rel) with
    * 4-dim float embeddings, norm precomputed like the e5 pipeline does.
    */
  private def candPool(rows: Seq[(Long, Long, Seq[Float], Double)]) = {
    import spark.implicits._
    rows.toDF("qid", "doc_id", "emb", "rel")
      .selectExpr("qid", "doc_id", "cast(emb AS array<float>) AS emb",
        "sqrt(vec_dot(cast(emb AS array<float>), cast(emb AS array<float>))) AS dn", "rel")
  }

  test("mmrRerank with k past pool exhaustion returns the whole pool, then stops") {
    // qid 0 has 3 candidates, qid 1 has 2 — ask for k=10 picks
    val pool = candPool(Seq(
      (0L, 10L, Seq(1f, 0f, 0f, 0f), 0.9),
      (0L, 11L, Seq(0f, 1f, 0f, 0f), 0.8),
      (0L, 12L, Seq(0f, 0f, 1f, 0f), 0.7),
      (1L, 20L, Seq(1f, 1f, 0f, 0f), 0.6),
      (1L, 21L, Seq(0f, 0f, 1f, 1f), 0.5)))
    val sel = SimilarityOps.mmrRerank(pool, 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("sel_round"), r.getAs[Long]("doc_id")))
    assert(sel.count(_._1 == 0L) === 3)
    assert(sel.count(_._1 == 1L) === 2)
    // rounds are consecutive from 0 within each query; no doc repeats
    Seq(0L, 1L).foreach { q =>
      val rows = sel.filter(_._1 == q)
      assert(rows.map(_._2).sorted.toSeq === (0L until rows.length.toLong))
      assert(rows.map(_._3).distinct.length === rows.length)
    }
  }

  test("iteration loops release superseded localCheckpoint blocks (bounded storage)") {
    // Dataset.unpersist is a no-op for local checkpoints (the blocks hang
    // off the RDD, invisible to the CacheManager) — so without the explicit
    // Checkpoints.release every round would pin one dead frontier copy in
    // executor storage for the session lifetime. Assert the net growth in
    // persistent RDDs per call is O(1), not O(rounds).
    def persistentCount = spark.sparkContext.getPersistentRDDs.size
    val pool = candPool((0L until 12L).map(i =>
      (0L, 100L + i, Seq(i.toFloat, 1f, 0f, 0f), 1.0 - i * 0.01)))
    val before = persistentCount
    SimilarityOps.mmrRerank(pool, 10).collect()
    val after = persistentCount
    assert(after - before <= 2,
      s"mmrRerank leaked checkpoints: $before -> $after persistent RDDs for k=10")

    import spark.implicits._
    val vocab = Seq(("<a> <b> <a> <b>", 10L), ("<a> <b> <c>", 5L), ("<b> <c> <a>", 3L))
      .toDF("syms", "freq")
    val b0 = persistentCount
    TextOps.bpeTrain(spark, vocab, maxRounds = 6, minPairCount = 1L).collect()
    val b1 = persistentCount
    assert(b1 - b0 <= 2,
      s"bpeTrain leaked checkpoints: $b0 -> $b1 persistent RDDs for 6 rounds")

    // connectedComponents: a 16-node path forces several hash-min rounds
    // (path halving converges in O(log diameter)); each round supersedes
    // two checkpoints (prop, frontier) that must release
    val pairs = (1L until 16L).map(i => (i, i + 1)).toDF("a", "b")
    val c0 = persistentCount
    graft.operators.ClusterOps.connectedComponents(pairs).collect()
    val c1 = persistentCount
    assert(c1 - c0 <= 2,
      s"connectedComponents leaked checkpoints: $c0 -> $c1 persistent RDDs")
  }

  test("mmrRerank reproduces the greedy MMR recurrence on a crafted pool") {
    // two near-identical high-relevance docs (A, A') and one orthogonal
    // lower-relevance doc B: pure relevance would pick A then A'; MMR with
    // lambda=0.7 must pick A, then B (A' is redundant), then A'
    val pool = candPool(Seq(
      (0L, 1L, Seq(1f, 0f, 0f, 0f), 0.95),      // A
      (0L, 2L, Seq(0.999f, 0.04f, 0f, 0f), 0.94), // A' ~ A
      (0L, 3L, Seq(0f, 0f, 1f, 0f), 0.6)))      // B orthogonal
    val sel = SimilarityOps.mmrRerank(pool, 2)
      .collect().map(r => (r.getAs[Long]("sel_round"), r.getAs[Long]("doc_id"))).sorted
    assert(sel === Seq((0L, 1L), (1L, 3L), (2L, 2L)))
  }
}
