package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Property-style checks on the dedup primitives (SURVEY §5.2): signature
  * determinism, permutation-invariance of the normalized fingerprint, and
  * MinHash similarity ordering on fixed inputs.
  */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def sigOf(texts: Seq[String]): Map[String, Seq[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .selectExpr("text", s"${DedupOps.wordHashesSpark} AS whashes")
      .selectExpr("text", s"${DedupOps.sigExprSpark} AS sig")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
  }

  test("identical texts yield identical MinHash signatures") {
    val s = sigOf(Seq("spark scan table join", "spark scan table join"))
    assert(s.size === 1) // map collapses equal keys; one distinct text
    assert(s.values.head.length === 16)
  }

  test("word order does not change the signature (set semantics)") {
    val s = sigOf(Seq("join table scan spark", "spark scan table join x".replace(" x", "")))
    assert(s("join table scan spark") === s("spark scan table join"))
  }

  test("near-identical docs agree on more hash slots than disjoint docs") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = a + " iota" // jaccard 8/9
    val c = "one two three four five six seven eight"
    val s = sigOf(Seq(a, b, c))
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count { case (p, q) => p == q }
    assert(agree(s(a), s(b)) > agree(s(a), s(c)))
  }

  test("codegen word_hashes expression equals the lambda spec on fixture documents") {
    // exact sequence equality (order and duplicates included) on real corpus
    // text, plus edge cases
    val docs = graft.core.Tables.load(spark, GraftTestSpark.sf, "documents").select("text")
    import spark.implicits._
    val edge = Seq("", " ", "a", "a a b", "x  y").toDF("text")
    docs.union(edge)
      .selectExpr("word_hashes(text) AS fast", s"${DedupOps.wordHashesSpark} AS spec")
      .collect()
      .foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("codegen shingles3 expression equals the lambda spec on fixture documents") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, GraftTestSpark.sf, "documents").select("text")
    // lambda spec is only defined for >= 3 tokens (sequence runs descending
    // below that and slice(ws, 0, _) throws); kernel is total: edge cases
    // checked separately below
    docs
      .selectExpr(
        "shingles3(text) AS fast",
        """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) AS spec""".stripMargin)
      .collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    val edges = Seq("", "a", "a b").toDF("text")
      .selectExpr("shingles3(text) AS sg").collect()
    edges.foreach(r => assert(r.getSeq[String](0) === Seq.empty))
  }

  test("codegen winnow_fps equals a naive positional-hash + winnow spec") {
    import spark.implicits._
    // naive spec: O(n·k) positional polynomial hashes, then window minima —
    // the mathematical definition the O(n) rolling kernel must reproduce
    def spec(text: String): Seq[Long] = {
      val K = 8; val W = 4; val B = 31L; val P = 1000000007L
      val cps = text.codePoints().toArray
      if (cps.length < K) return Seq.empty
      val hashes = (0 to cps.length - K).map { i =>
        (0 until K).foldLeft(0L)((h, j) => (h * B + cps(i + j)) % P)
      }
      val nw = math.max(hashes.length - W + 1, 1)
      (0 until nw).map(i => hashes.slice(i, i + W).min).distinct.sorted
    }
    val docs = graft.core.Tables.load(spark, GraftTestSpark.sf, "documents")
      .select("text").as[String].collect()
    val edge = Seq("", "1234567", "12345678", "123456789", "aaaaaaaaaaaa",
      "über-höhe ünïcode ™ text 🙂 with astral chars beyond the BMP")
    val rows = (docs.toSeq ++ edge).toDF("text")
      .selectExpr("text", "winnow_fps(text) AS fast").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === spec(r.getString(0)), s"text: ${r.getString(0).take(40)}")
    }
    // winnowing guarantee on a planted overlap: any shared substring of
    // length >= K + W - 1 = 11 chars shares at least one fingerprint
    val shared = "the quick brown fox jumps"
    val fpA = spec("AAAA " + shared + " BBBB")
    val fpB = spec("cccccccc " + shared + " dddd")
    assert(fpA.toSet.intersect(fpB.toSet).nonEmpty)
  }

  test("codegen minhash16 expression equals the higher-order-function spec") {
    import spark.implicits._
    val rows = Seq("alpha beta gamma", "one one two", "x", "", "a b c d e f g h i j")
      .toDF("text")
      .selectExpr("text", s"${DedupOps.wordHashesSpark} AS whashes")
      .selectExpr(
        "minhash16(whashes) AS fast",
        s"${DedupOps.sigExprSpark} AS spec")
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("codegen simhash32 expression equals the higher-order-function formulation") {
    import spark.implicits._
    // The lambda form is the executable spec (it also mirrors the DuckDB
    // oracle); simhash32 is the fused one-pass codegen replacement d5 ships.
    val rows = Seq("alpha beta gamma", "one one two", "x", "", "a b c d e f g h i j")
      .toDF("text")
      .selectExpr("text", s"${DedupOps.wordHashesSpark} AS whashes")
      .selectExpr(
        "simhash32(whashes) AS fast",
        """concat_ws('', transform(sequence(31, 0, -1), j ->
          |  CASE WHEN aggregate(whashes, CAST(0 AS BIGINT),
          |      (acc, h) -> acc + CASE WHEN (shiftright(h, j) % 2) = 1
          |                        THEN 1 ELSE -1 END) > 0
          |  THEN '1' ELSE '0' END)) AS spec""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("simhash of identical texts is identical and 32 bits") {
    import spark.implicits._
    val rows = Seq("a b c", "a b c", "x y z").toDF("text")
      .selectExpr("""concat_ws('', transform(sequence(31, 0, -1), j ->
        |  CASE WHEN aggregate(array_distinct(split(text, ' ')), CAST(0 AS BIGINT),
        |      (acc, w) -> acc + CASE WHEN (shiftright(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT), j) % 2) = 1
        |                        THEN 1 ELSE -1 END) > 0
        |  THEN '1' ELSE '0' END)) AS simhash""".stripMargin)
      .collect().map(_.getString(0))
    assert(rows(0) === rows(1))
    assert(rows(0).length === 32 && rows(0).forall(c => c == '0' || c == '1'))
    assert(rows(0) !== rows(2))
  }
}
