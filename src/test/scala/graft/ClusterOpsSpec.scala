package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** connectedComponents correctness against a driver-side union-find on
  * randomized graphs, plus the topology edge cases the fixpoint loop must
  * survive: empty input, a long chain (pointer-jump round bound), and a
  * dense clique.
  */
class ClusterOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ccSpark(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    ClusterOps.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Textbook union-find with path compression — the sequential spec. */
  private def ccSpec(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // canonical label = min node id in the component
    val byRoot = nodes.groupBy(find)
    byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(50)
      val m = 20 + rnd.nextInt(60)
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      assert(ccSpark(pairs) === ccSpec(pairs), s"trial $trial (n=$n m=${pairs.size})")
    }
  }

  test("empty pair set yields empty labeling") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ClusterOps.connectedComponents(empty).count() === 0)
  }

  test("a 40-hop chain converges (log-diameter pointer jumping)") {
    // pure path graph: worst case for plain hash-min (diameter rounds);
    // with path halving it must converge well inside MaxRounds
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = ccSpark(chain)
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 40L).toSet)
  }

  test("a clique and an isolated pair stay separate components") {
    val clique = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = ccSpark(clique :+ ((100L, 101L)))
    assert(got.filter(_._1 < 100).values.toSet === Set(10L))
    assert(got(100L) === 100L && got(101L) === 100L)
  }

  test("c5 hierarchical assignment mostly agrees with exact assignment") {
    // the super-cluster prefilter is approximate only at super boundaries;
    // the two paths must agree for the majority of vectors (the exact
    // agreement set is pinned cross-engine by c5's oracle — this asserts
    // the approximation QUALITY claim). Measured on the sf0.01 corpus (500
    // vectors): synthetic embeddings are near-uniform — no real cluster
    // structure — so this is the prefilter's worst case; real semantic
    // embeddings separate far better (the regime SemDeDup targets).
    val embs = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = ClusterOps.kmeansAssign(embs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier = ClusterOps.kmeansAssignHier(embs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hier.keySet === exact.keySet, "hier path lost or duplicated vectors")
    val frac = hier.count { case (v, c) => exact(v) == c }.toDouble / hier.size
    assert(frac >= 0.7, s"hier/exact agreement only $frac")
  }

  test("c4 semdedup census is invariant under input partitioning and order") {
    // the keeper rule (drop iff a smaller-id near-dup shares the cluster) is
    // set-defined, so no physical layout of the input may change the census —
    // the determinism claim behind oracle-checking the exact selection
    val embs = graft.core.Tables.load(spark, GraftTestSpark.sf, "embeddings")
    def census(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      ClusterOps.semdedupCensus(df).collect()
        .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
    val base = census(embs)
    assert(base.map(_._2).sum === embs.count())
    assert(census(embs.repartition(7)) === base)
    assert(census(embs.orderBy(org.apache.spark.sql.functions.col("vec_id").desc)) === base)
  }
}
