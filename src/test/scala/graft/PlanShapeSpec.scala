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
  import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
  import org.apache.spark.sql.types.ArrayType

  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def plan(q: graft.core.Q): String =
    q.fn(spark, sf).queryExecution.executedPlan.toString

  /** Every physical node, descending through AQE wrappers and query stages
    * (the final adaptive plan is what actually ran).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  /** Broadcast hints in the analyzed logical plan — a forced broadcast is a
    * compile-time size claim, so any relation hinted here must be bounded at
    * ANY corpus scale, not just this fixture's.
    */
  private def broadcastHints(df: org.apache.spark.sql.DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  /** Shuffle exchanges partitioned by the LSH band key in the final plan. */
  private def bandKeyShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    allNodes(p).collect { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.toString.contains("band_key"))

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

  test("q62: stacked EXISTS + NOT EXISTS plan as one semi + one anti join, set-at-a-time") {
    val p = plan(RelationalQueries.q62)
    assert(p.contains("LeftSemi"), "EXISTS must decorrelate to a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must decorrelate to an anti join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "both quantifiers must ride the l_orderkey equi key (the l_suppkey <> " +
        "residual is a join condition, not a nested-loop driver)")
  }

  test("q62 at scale: semi/anti degrade to shuffle joins on l_orderkey, never BNLJ") {
    // At sf0.01 the planner broadcasts lineitem as the semi/anti build side —
    // fine at fixture scale, impossible at 100 TB. Shrinking the broadcast
    // thresholds simulates the at-scale planner: the stacked quantifiers
    // must survive as SHUFFLE joins riding the l_orderkey equi key (the
    // l_suppkey <> residual as a join condition), with no
    // BroadcastNestedLoopJoin fallback anywhere in the plan.
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = RelationalQueries.q62.fn(spark, sf)
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      val p = nodes.mkString("\n")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        "with broadcasts off, the quantifiers must not fall back to a nested loop")
      val joins = nodes.collect { case j: BaseJoinExec => j }
      def shuffled(t: String) = joins.filter(_.joinType.toString == t)
      for (t <- Seq("LeftSemi", "LeftAnti")) {
        val js = shuffled(t)
        assert(js.nonEmpty, s"expected a $t join in the plan")
        js.foreach { j =>
          assert(j.isInstanceOf[SortMergeJoinExec] || j.isInstanceOf[ShuffledHashJoinExec],
            s"$t must plan as a shuffle join at scale, got ${j.nodeName}")
          assert(j.leftKeys.map(_.sql).mkString(",").contains("l_orderkey"),
            s"$t must key on l_orderkey, got ${j.leftKeys.map(_.sql)}")
        }
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
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

  test("e1: bucket-equi pairing, zero forced broadcasts, no embeddings on the band shuffle") {
    val df = graft.operators.SimilarityOps.e1.fn(spark, sf)
    // embeddings are corpus-cardinality: nothing in e1 may claim broadcast
    // size at compile time — AQE decides from measured sizes at runtime
    assert(broadcastHints(df).isEmpty,
      "e1 must not force-broadcast any relation (embeddings grow with the corpus)")
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val p = nodes.mkString("\n")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "e1 must pair only within hyperplane buckets (equi join on the bucket key)")
    // scale invariant: the 64-float arrays move keyed by vec_id only, never
    // partitioned by the band topology
    bandKeyShuffles(df.queryExecution.executedPlan).foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"embedding array shuffled on the band key: ${e.output.map(a => s"${a.name}:${a.dataType}")}")
    }
  }

  test("d4: no corpus-sized broadcast hint; word-hash arrays never ride the band-key shuffle") {
    val df = graft.operators.DedupOps.d4.fn(spark, sf)
    // The only permitted compile-time broadcast is the oversize-bucket list:
    // (band_idx, band_key) scalars, bounded by N*bands/CAP. A hint whose
    // subtree outputs an ARRAY column would re-pin the O(corpus) word-set
    // broadcast that round 2 shipped — an executor OOM at 100x.
    broadcastHints(df).foreach { h =>
      assert(!h.child.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"broadcast hint carries an array-typed (per-document) relation: " +
          h.child.output.map(a => s"${a.name}:${a.dataType}"))
    }
    df.collect()
    // Round 1's 494 s lesson as an invariant: word-hash arrays are hashed by
    // doc id when they move; the band-key shuffles carry scalars only.
    bandKeyShuffles(df.queryExecution.executedPlan).foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"word-hash array shuffled on the band key: ${e.output.map(a => s"${a.name}:${a.dataType}")}")
    }
    // Size-adaptivity, not size-pinning: at fixture scale the sets relation
    // measures tiny, so the runtime plan should still COME OUT broadcast for
    // the anti + 2 verify joins — chosen by AQE/statistics, not by hint.
    val p = allNodes(df.queryExecution.executedPlan).mkString("\n")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    assert(nBroadcast >= 3,
      s"expected the size-based planner to pick >=3 broadcast joins at this tiny scale, got $nBroadcast")
  }

  test("d12: no hints; shingle arrays never ride the prefix-key shuffle") {
    val df = graft.operators.DedupOps.d12.fn(spark, sf)
    // the exact similarity join must stay fully size-adaptive: df, prefix,
    // candidate and verify relations all scale with the corpus
    assert(broadcastHints(df).isEmpty,
      "d12 must carry no compile-time broadcast hints")
    df.collect()
    // d4's discipline applied to the prefix join: candidates move as
    // (g, doc_id) scalars; the shingle SETS re-attach keyed by doc id only
    val gShuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
      .filter(_.outputPartitioning.toString.matches("hashpartitioning\\(g#.*"))
    assert(gShuffles.nonEmpty, "expected the candidate join keyed on the prefix shingle")
    gShuffles.foreach { e =>
      assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"shingle array shuffled on the prefix key: ${e.output.map(a => s"${a.name}:${a.dataType}")}")
    }
  }

  test("t6: df join is size-adaptive — only the single-row doc count may be hinted") {
    val df = graft.functions.TextOps.t6.fn(spark, sf)
    // the df relation's cardinality is the corpus vocabulary — unbounded for
    // web text — so the only allowed hint is the 1-row global doc count
    broadcastHints(df).foreach { h =>
      assert(h.child.output.map(_.name) == Seq("n"),
        s"only the single-row doc-count aggregate may be hint-broadcast, got: ${h.child.output}")
    }
    df.collect()
    // at fixture scale the vocabulary measures small: the size-based planner
    // should broadcast it (at 100 TB the same code degrades to a term-keyed
    // shuffle join with one df row per key — no blowup, AQE splits skew)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "expected AQE/statistics to choose broadcast for the small measured vocabulary")
  }

  test("e8: only k-bounded PQ relations are hint-broadcast; no nested loop") {
    val df = graft.operators.SimilarityOps.e8.fn(spark, sf)
    // the ONLY compile-time broadcasts PQ may claim are bounded by the
    // m x k geometry (codebooks, 128 rows) or the seed-id list (16 rows) —
    // codes and sub-vectors are corpus-cardinality and must never be hinted
    val hints = broadcastHints(df)
    assert(hints.nonEmpty, "codebooks/seed ids should be explicitly broadcast")
    hints.foreach { h =>
      val cols = h.child.output.map(_.name)
      assert(cols == Seq("seed_id") || cols == Seq("s", "cid", "cent", "csq"),
        s"only the seed-id list or the (s,cid,cent,csq) codebook may be hinted, got: $cols")
    }
    df.collect()
    val p = allNodes(df.queryExecution.executedPlan).mkString("\n")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "ADC scoring must ride the (s, cid) equi key")
  }

  test("e9: IVF-PQ broadcasts only k-bounded index relations; scoring rides the cell/code keys") {
    val df = graft.operators.SimilarityOps.e9.fn(spark, sf)
    // bounded-by-construction relations only: coarse centroids (k rows, in
    // both (cid,...) and (cell,...) renamings), PQ codebooks (m x k rows),
    // seed ids (16) — codes/residuals are corpus-cardinality, never hinted
    val allowed = Set(
      Seq("seed_id"), Seq("s", "cid", "cent", "csq"),
      Seq("cid", "cent", "csq"), Seq("cell", "ccent"), Seq("cell", "ccent", "ccsq"))
    broadcastHints(df).foreach { h =>
      val cols = h.child.output.map(_.name)
      assert(allowed.contains(cols),
        s"unexpected broadcast hint (corpus-sized relation?): $cols")
    }
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val p = nodes.mkString("\n")
    assert(!p.contains("CartesianProduct"), "no unbounded cartesian anywhere")
    // BNLJ appears ONLY as the k-row centroid cross during probe/assign
    // (c3's canonical assignment shape — bounded 8x fan-out); every such
    // node must have a broadcast child, never two corpus-sized sides
    nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.foreach { j =>
      val out = (j.left.output ++ j.right.output).map(_.name)
      assert(out.exists(n => n == "cell" || n == "cid"),
        s"BNLJ outside the bounded centroid cross: ${out.mkString(",")}")
    }
  }

  test("q45: interval join runs as bucket equi-join, never a nested loop") {
    val df = graft.operators.MiscQueries.q45.fn(spark, sf)
    df.collect()
    val p = allNodes(df.queryExecution.executedPlan).mkString("\n")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the time-window theta join must be rewritten onto the (user, bucket) equi key")
  }

  test("q49: arg-max compaction is a partial+final agg, never a ranking window") {
    val p = plan(graft.operators.ReshapeQueries.q49)
    assert(!p.contains("Window"),
      "max_by must compact via aggregation, not a ranking window")
    // the scale property: map-side partial reduction BELOW the exchange, so
    // the shuffle carries one row per (map partition, key), not every event.
    // (The string payload makes this a SortAggregate — var-width buffer —
    // but partial/final split is what bounds the shuffle.)
    val exchangeAt = p.indexOf("Exchange")
    val partialAt = p.indexOf("partial_max_by")
    assert(partialAt > exchangeAt && exchangeAt >= 0,
      "partial_max_by must sit below the exchange in the printed plan")
  }

  test("d9: decontamination probes train shingles via a semi join, no nested loop") {
    val df = graft.operators.DedupOps.d9.fn(spark, sf)
    df.collect()
    val p = allNodes(df.queryExecution.executedPlan).mkString("\n")
    assert(p.contains("LeftSemi"), "the contamination probe must be a semi join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("t8: bigram top-20 plans as TakeOrderedAndProject, no global sort") {
    val p = plan(graft.functions.TextOps.t8)
    assert(p.contains("TakeOrderedAndProject"))
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

  test("p4: chunk expansion is shuffle-free — one generator map stage") {
    val df = graft.operators.CurationOps.p4.fn(spark, sf)
    val shuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      "chunking must be a pure map/generator stage with zero exchanges")
  }

  test("t10: LM scoring join is size-adaptive — only the 1-row (N,V) totals hinted") {
    val df = graft.functions.TextOps.t10.fn(spark, sf)
    // the unigram count relation is vocabulary-cardinality (unbounded for
    // web text) — t6's rule applies: never hint it, let AQE decide
    broadcastHints(df).foreach { h =>
      assert(h.child.output.map(_.name) == Seq("n", "v"),
        s"only the single-row (N,V) totals may be hint-broadcast, got: ${h.child.output}")
    }
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "expected AQE/statistics to choose broadcast for the small measured vocabulary")
  }

  test("c3: only k-bounded centroid relations are hint-broadcast") {
    val df = graft.operators.ClusterOps.c3.fn(spark, sf)
    val hints = broadcastHints(df)
    assert(hints.nonEmpty, "centroids should be explicitly broadcast (k rows)")
    hints.foreach { h =>
      assert(h.child.output.map(_.name) == Seq("cid", "cent", "csq"),
        s"only the k-row centroid relation may be hint-broadcast, got: ${h.child.output}")
    }
  }

  test("m1: payload build + magic-byte decode is shuffle-free (blobs never leave the executor)") {
    val df = graft.multimodal.MultimodalOps.m1.fn(spark, sf)
    val shuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      "media decode must be pipelined map stages with zero exchanges")
  }

  test("m5: PCM decode + per-channel stats is shuffle-free (samples never leave the executor)") {
    val df = graft.multimodal.MultimodalOps.m5.fn(spark, sf)
    val shuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      "audio feature extraction must be pipelined map stages with zero exchanges " +
        "(per-channel accumulation happens inside the decode closure, not in an agg)")
  }

  test("m3: header sniff shuffles only the 3-key census agg, never payload bytes") {
    val df = graft.multimodal.MultimodalOps.m3.fn(spark, sf)
    val shuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1, s"expected exactly the census agg exchange, got ${shuffles.size}")
    shuffles.foreach { e =>
      assert(!e.child.output.exists(_.name == "payload"),
        "payload bytes must be reduced to (modality, n_bytes, n_frames) before the shuffle")
    }
  }

  test("f10: blob content never rides the census shuffle (m3's discipline on the file path)") {
    val df = graft.sources.FormatQueries.f10.fn(spark, sf)
    val shuffles = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    shuffles.foreach { e =>
      assert(!e.child.output.exists(_.name == "content"),
        "binaryFile content must be reduced to (modality, n_bytes, doc_id) before the exchange")
    }
  }

  test("f4: the partitioned read-back scan prunes on the partition column") {
    // the plan snapshot's Location normalizer swallows the rest of the scan
    // line, so the pruning evidence is pinned here on the raw plan string
    val p = plan(graft.sources.FormatQueries.f4)
    assert("""PartitionFilters: \[[^\]]*o_year[^\]]*1995""".r.findFirstIn(p).isDefined,
      s"expected a partition filter on o_year = 1995 in the scan:\n$p")
  }

  test("f6: the fact scan carries a dynamic-pruning subquery from the dim filter") {
    // anchored on PartitionFilters content (the f4 pattern): DPP planned
    // anywhere else in the plan would not prune the fact directories
    val p = plan(graft.sources.FormatQueries.f6)
    assert("""PartitionFilters: \[[^\]]*dynamicpruning""".r.findFirstIn(p).isDefined,
      s"expected a dynamicpruningexpression in the fact scan's PartitionFilters:\n$p")
  }

  test("s4: codes-not-vectors through the cell exchanges; only k-bounded or knob-bounded broadcasts") {
    import org.apache.spark.sql.types.FloatType
    val df = graft.operators.SimilarityOps.s4.fn(spark, sf)
    // forced broadcasts must be bounded at any corpus size: the supers
    // (N/supStride — THE documented knob, set ∝ √k1 at production N) and
    // the 1-row SDC pair table. Neither may carry a corpus-sized relation;
    // structurally, none may output more than a handful of columns of
    // array type unless it is the pair table / super relation itself.
    val hints = broadcastHints(df).filter(
      _.hints.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
    assert(hints.nonEmpty, "s4 pins its bounded broadcasts explicitly")
    hints.foreach { h =>
      val cols = h.child.output.map(_.name).toSet
      val bounded = cols.contains("tflat") ||  // 1-row SDC pair table
        cols.contains("semb") ||               // supers (N/supStride, the knob)
        cols.contains("csq") ||                // PQ codebooks (8x16 rows)
        cols.contains("seed_id")               // PQ seed ids (16 rows)
      assert(bounded,
        s"unexpected forced broadcast in s4: $cols — only the SDC pair " +
          "table, supers, and codebook relations are bounded at every " +
          "corpus size")
    }
    df.collect()
    // THE scale invariant (round 15's measured ~13 GB at the rung's 16x):
    // no shuffle keyed by the cell/sup/salt topology may carry a float
    // vector — corpus-sized exchanges move 8-byte PQ code rows only; raw
    // embeddings re-attach by uniform vec_id keys after the shortlist.
    val exchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    val topoShuffles = exchanges.filter { e =>
      val p = e.outputPartitioning.toString
      p.contains("cell") || p.contains("sup") || p.contains("salt")
    }
    assert(topoShuffles.nonEmpty, "expected cell/sup-keyed exchanges in s4")
    topoShuffles.foreach { e =>
      val floatArrays = e.output.filter(a => a.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      assert(floatArrays.isEmpty,
        s"raw float vectors shuffled on the cell topology: " +
          floatArrays.map(a => s"${a.name}:${a.dataType}").mkString(", "))
    }
  }

  test("t14: winnowed fingerprinting is a shuffle-free codegen map stage") {
    val df = graft.functions.TextOps.t14.fn(spark, sf)
    val p = df.queryExecution.executedPlan
    val shuffles = allNodes(p).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, "fingerprinting must be a pure map stage")
    // exchange-free plans print codegen spans as `*(n)` markers rather than
    // a WholeStageCodegen wrapper node; don't pin the stage id — any extra
    // node renumbers it
    assert("""\*\(\d+\) Project""".r.findFirstIn(p.toString).isDefined,
      "the winnow_fps projection must sit inside a whole-stage codegen span")
  }
}
