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

  test("s4 salting is oracle-invisible: an aggressive cellCap reproduces the default graph") {
    // salting redistributes the cell join physically (probes replicate per
    // member shard) but must never change WHICH pairs are candidates —
    // cellCap=2 forces many shards per cell at fixture scale, so any
    // dropped or duplicated pair-slot would diverge here
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val base = SimilarityOps.knnJoin(embs).collect().map(_.toSeq).toSet
    val salted = SimilarityOps.knnJoin(embs, cellCap = 2).collect().map(_.toSeq).toSet
    assert(base.nonEmpty)
    assert(salted == base, "salting changed the kNN graph")
  }

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

  test("hyperplane_bucket equals the lambda spec on malformed vectors (wrong dim, null element)") {
    // the spec's zip_with pads with null and the null poisons every plane's
    // fold to '0' — the kernel must reproduce that, not silently truncate
    import spark.implicits._
    val cases = Seq(
      Array.fill(32)(0.5f),              // too short
      Array.fill(100)(-0.25f),           // too long
      Array.fill(64)(1.0f)               // well-formed control
    ).map(Tuple1(_)).toDF("embedding")
      .union(Seq(Tuple1(Array.fill(64)(0.5f))).toDF("embedding")
        .selectExpr("transform(embedding, (x, i) -> CASE WHEN i = 3 THEN CAST(NULL AS FLOAT) ELSE x END) AS embedding"))
    val rows = cases.selectExpr(
      "hyperplane_bucket(embedding) AS fast",
      s"${SimilarityOps.bucketSparkSpec} AS spec").collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(rows.map(_.getString(0)).count(_ == "000000") === 3,
      "all three malformed vectors must bucket to the poisoned all-zero key")
  }

  test("hyperplane_bucket_n widens the key additively (6-bit prefix identical)") {
    // the widened key is the e1 scale knob: first 6 bits must equal the
    // fixture key exactly (same plane formula), so widening only ever
    // SPLITS buckets — never reshuffles vectors between them
    val rows = graft.core.Tables.load(spark, sf, "embeddings")
      .selectExpr(
        "hyperplane_bucket(embedding) AS narrow",
        "hyperplane_bucket_n(embedding, 14) AS wide")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).length === 14)
      assert(r.getString(1).startsWith(r.getString(0)))
    }
  }

  test("e1 banding recalls >= 90% of planted cos >= 0.9 near-dup pairs") {
    // The fixtures contain NO pairs above cos 0.8 (measured: max regime is
    // 0.4-0.5, where 2x3 banding keeps 29/59 — documented in e1), so the
    // near-dup regime the operator is FOR is tested by planting it: each of
    // the first 100 fixture vectors gets a lightly-perturbed twin (~2% added
    // noise -> cos ~0.997..0.999), and the banding must recall >= 90% of the
    // planted pairs. Geometry: at cos >= 0.99 a sign bit flips with
    // p = theta/pi <= 0.045, so P(some 3-bit band agrees) >= 1-(1-0.87)^2
    // ~ 0.98 — the 0.9 bar leaves room for unlucky planes, not a weak op.
    import spark.implicits._
    val base = graft.core.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .take(100)
    val rnd = new scala.util.Random(7)
    val planted = base.map { case (id, v) =>
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val twin = v.map(x => (x + rnd.nextGaussian() * 0.02 * nrm / 8).toFloat)
      (id + 1_000_000L, twin, id)
    }
    // planted pairs really are in the >= 0.9 regime (exact JVM cosine)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val byId = base.toMap
    planted.foreach { case (_, twin, origId) =>
      assert(cos(byId(origId), twin) >= 0.9, "planting must produce a cos >= 0.9 pair")
    }
    val all = (base.map { case (id, v) => (id, v) } ++
      planted.map { case (id, v, _) => (id, v) }).toSeq.toDF("vec_id", "embedding")
    val cands = SimilarityOps
      .bandCandidatePairs(SimilarityOps.bucketed(all), SimilarityOps.E1Bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = planted.map { case (tid, _, origId) => (origId, tid) }
    val recalled = truePairs.count(cands.contains)
    val recall = recalled.toDouble / truePairs.length
    info(f"planted-pair recall at ${SimilarityOps.E1Bands}x${SimilarityOps.NPlanes / SimilarityOps.E1Bands} banding: $recall%.3f ($recalled/${truePairs.length})")
    assert(recall >= 0.9, s"near-dup recall $recall below 0.9")
    // knob direction: collapsing to ONE 6-bit band (fewer, finer buckets)
    // can only shrink the candidate set — recall must not increase
    val oneBand = SimilarityOps
      .bandCandidatePairs(SimilarityOps.bucketed(all), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.count(oneBand.contains) <= recalled)
    assert(oneBand.subsetOf(cands), "a 1x6 candidate must always be a 2x3 candidate")
    // the SCALE geometry (widened 2x7 key, the 16x-corpus shape from
    // ScaleProbe) must still recall true near-dups: per-bit agreement for
    // cos ~0.997 is ~0.97, so P(some 7-bit band agrees) ~ 0.96 — the 0.85
    // bar is ~8 sigma below the mean over 100 planted pairs. Widening
    // bounds the buckets without giving up the near-dup regime.
    val wide = SimilarityOps
      .bandCandidatePairs(SimilarityOps.bucketedWith(all, 14), 2, 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wideRecall = truePairs.count(wide.contains).toDouble / truePairs.length
    info(f"planted-pair recall at widened 2x7 banding: $wideRecall%.3f")
    assert(wideRecall >= 0.85, s"widened-geometry recall $wideRecall below 0.85")
  }

  test("e8/e9 PQ quality: recall vs exact L2 top-5, residual coding reconstructs better") {
    import org.apache.spark.sql.functions._
    // exact L2 top-5 per query (the ground truth both sketches approximate)
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding", "vec_dot(embedding, embedding) AS sq")
    val q = embs.filter(col("vec_id") < 3)
      .selectExpr("vec_id AS qid", "embedding AS qemb", "sq AS qsq")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))
    val exact = embs.join(broadcast(q), col("vec_id") =!= col("qid"))
      .selectExpr("qid", "vec_id", "sq + qsq - 2 * vec_dot(embedding, qemb) AS d")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.count(exact.contains).toDouble / exact.size
    }
    val r8 = recallOf(SimilarityOps.e8.fn(spark, sf))
    val r9 = recallOf(SimilarityOps.e9.fn(spark, sf))
    val r10 = recallOf(SimilarityOps.e10.fn(spark, sf))
    info(f"recall@5 vs exact L2: e8 (PQ) $r8%.2f, e9 (IVF-PQ, 2/8 cells probed) $r9%.2f, " +
      f"e10 (refine) $r10%.2f")
    // the refine stage exists to repair ADC ranking error: exact re-rank
    // over the 20-deep shortlist must never score below raw ADC, and on
    // this fixture (cell coverage 1.0 at one probe — BENCH_NOTES r10) it
    // should recover most of the exact top-5
    assert(r10 >= r9, f"exact re-rank scored BELOW raw ADC: $r10%.2f < $r9%.2f")
    assert(r10 >= 0.5, f"e10 refine recall $r10%.2f below 0.5 - shortlist too shallow?")
    // Honest calibration: the fixture's near-uniform synthetic vectors are
    // PQ's WORST case (no cluster structure for 16-cell sub-quantizers to
    // exploit; real embedding corpora are far more compressible), and e9
    // additionally probes only 2 of 8 cells. Measured ~0.27 / ~0.20 here —
    // ~20-27x the random-baseline overlap of top-5 in a 500-vector corpus
    // (5/499 ~ 1%). The floors certify "the compressed-domain ranking
    // carries real signal and stays deterministic", an order of magnitude
    // above chance, with headroom for codebook-seed sensitivity.
    assert(r8 >= 0.15, f"e8 PQ recall collapsed toward chance: $r8%.2f")
    assert(r9 >= 0.10, f"e9 IVF-PQ recall collapsed toward chance: $r9%.2f")

    // residual coding must reconstruct better than direct coding — THE
    // reason IVF-PQ encodes x - centroid(cell) instead of x. Reconstruct
    // each vector from its codes (concatenate looked-up sub-centroids in
    // subspace order, plus the coarse centroid for e9) and compare mean
    // squared reconstruction error corpus-wide.
    def mse(reconstructed: org.apache.spark.sql.DataFrame): Double =
      reconstructed.join(embs.select("vec_id", "embedding"), Seq("vec_id"))
        .selectExpr("vec_dot(cast(zip_with(embedding, rec, (a, b) -> CAST(a - b AS FLOAT)) AS array<float>), " +
          "cast(zip_with(embedding, rec, (a, b) -> CAST(a - b AS FLOAT)) AS array<float>)) AS e2")
        .agg(avg(col("e2"))).head.getDouble(0)

    def decode(codes: org.apache.spark.sql.DataFrame, cb: org.apache.spark.sql.DataFrame) =
      codes.join(cb, Seq("s", "cid"))
        .groupBy(col("vec_id"))
        .agg(expr("flatten(transform(array_sort(collect_list(struct(s, cent))), x -> x.cent))").as("rec"))

    val cb8 = SimilarityOps.pqCodebooks(embs)
    val codes8 = SimilarityOps.pqEncode(embs, cb8)
    val direct = mse(decode(codes8, cb8))

    val cents = graft.operators.ClusterOps.finalCentroids(embs)
    val assign = graft.operators.ClusterOps.kmeansAssign(embs)
      .select(col("vec_id"), col("cid").as("cell"))
    val res = embs.join(assign, Seq("vec_id"))
      .join(broadcast(cents.selectExpr("cid AS cell", "cent AS ccent")), Seq("cell"))
      .selectExpr("vec_id", "cell",
        "zip_with(embedding, ccent, (a, b) -> CAST(CAST(a AS DOUBLE) - CAST(b AS DOUBLE) AS FLOAT)) AS remb")
    val rEmb = res.selectExpr("vec_id", "remb AS embedding")
    val cb9 = SimilarityOps.pqCodebooks(rEmb)
    val codes9 = SimilarityOps.pqEncode(rEmb, cb9)
    val residualRec = decode(codes9, cb9)
      .join(res.select("vec_id", "cell"), Seq("vec_id"))
      .join(broadcast(cents.selectExpr("cid AS cell", "cent AS ccent")), Seq("cell"))
      .selectExpr("vec_id",
        "cast(zip_with(ccent, rec, (a, b) -> CAST(CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS FLOAT)) AS array<float>) AS rec")
    val residual = mse(residualRec)
    info(f"mean squared reconstruction error: direct PQ $direct%.4f, residual IVF-PQ $residual%.4f")
    assert(residual < direct,
      f"residual coding must reconstruct better than direct PQ ($residual%.4f vs $direct%.4f)")
  }

  test("e15 filtered ANN: pre-filter recall >= post-filter at equal probe and candidate budget") {
    import org.apache.spark.sql.functions._
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val allowed = embs.filter(col("label") < 4).select("vec_id")
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    assert(allowedSet.size > 50, "predicate unexpectedly selective — fixture drifted")

    // ground truth: exact FILTERED top-5 per query (brute force over the
    // allowed subset only — what a user asking "nearest WHERE label < 4"
    // means; a disallowed true-neighbor must never count as a hit)
    val base = embs.selectExpr("vec_id", "embedding", "vec_dot(embedding, embedding) AS sq")
    val q = base.filter(col("vec_id") < 3)
      .selectExpr("vec_id AS qid", "embedding AS qemb", "sq AS qsq")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d"), col("vec_id"))
    // ground-truth predicate must MATCH the allowed set exactly (label < 4,
    // SQL three-valued: nulls excluded) — a null-label arm here would admit
    // neighbors neither scan path may legally return, skewing every recall
    // denominator below
    val exact = base.filter(col("label") < 4)
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .selectExpr("qid", "vec_id", "sq + qsq - 2 * vec_dot(embedding, qemb) AS d")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val idx = SimilarityOps.ivfpqBuild(embs)
    val queries = embs.filter(col("vec_id") < 3)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val pre = hits(SimilarityOps.ivfpqFilteredScan(queries, idx, allowed))
    val postEqual = hits(SimilarityOps.ivfpqPostFilteredScan(queries, idx, allowed))
    val postOver = hits(SimilarityOps.ivfpqPostFilteredScan(queries, idx, allowed,
      fetchK = 4 * SimilarityOps.PqTopK))

    // the contract: every returned row satisfies the predicate, on both paths
    assert(pre.forall { case (_, d) => allowedSet.contains(d) }, "pre-filter leaked a disallowed doc")
    assert(postEqual.forall { case (_, d) => allowedSet.contains(d) }, "post-filter leaked a disallowed doc")

    def recall(got: Set[(Long, Long)]): Double =
      got.count(exact.contains).toDouble / exact.size
    val (rPre, rPostEq, rPostOver) = (recall(pre), recall(postEqual), recall(postOver))
    info(f"filtered recall@5 vs exact-filtered: pre $rPre%.2f, " +
      f"post(equal budget) $rPostEq%.2f, post(4x over-fetch) $rPostOver%.2f " +
      f"(post kept ${postEqual.size} of ${pre.size} slots at equal budget)")
    // the pinned property: at equal probe + candidate budget the pre-filter
    // scan never scores below over-fetch-then-filter — it spends the whole
    // k budget on allowed rows while post-filter forfeits ~(1-selectivity)*k
    assert(rPre >= rPostEq,
      f"pre-filter recall $rPre%.2f below equal-budget post-filter $rPostEq%.2f")
    // and the slot count makes the mechanism visible: post-filter at equal
    // budget returns fewer allowed rows than the full k the pre-filter fills
    assert(postEqual.size <= pre.size,
      s"post-filter returned more rows (${postEqual.size}) than pre-filter (${pre.size})")
    // over-fetch vs pre-filter: recall-vs-recall is NOT mathematically
    // guaranteed here (recall counts exact-distance hits while both scans
    // rank by approximate ADC, so the over-fetch's candidate SUBSET can by
    // luck promote a true neighbor the pre-filter's ADC top-k excluded).
    // The provable property is ADC-rank dominance: post-over ranks the
    // same ADC order over a subset of the pre-filter's candidate pool
    // (allowed rows of the probed cells), so per query its i-th best ADC
    // distance can never beat the pre-filter's i-th best.
    def rankDist(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Double] =
      df.select("qid", "rnk", "adist").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val preD = rankDist(SimilarityOps.ivfpqFilteredScan(queries, idx, allowed))
    val overD = rankDist(SimilarityOps.ivfpqPostFilteredScan(queries, idx, allowed,
      fetchK = 4 * SimilarityOps.PqTopK))
    overD.foreach { case (key @ (qid, rnk), d) =>
      val p = preD.get(key)
      assert(p.isDefined, s"pre-filter missing rank $rnk for qid $qid that over-fetch filled")
      assert(p.get <= d + 1e-6,
        s"over-fetch post-filter out-ranked the pre-filter at qid=$qid rnk=$rnk: " +
          s"pre adist ${p.get}, post adist $d — the mask lost candidates")
    }
  }

  test("e16 denormalized mask: identical results to e15's semi join, pushed scan filter, no mask join") {
    import org.apache.spark.sql.functions._
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val queries = embs.filter(col("vec_id") < 3)
    val allowed = embs.filter(col("label") < 4)

    // e16's stored shape: label denormalized into the codes parquet
    val idx = SimilarityOps.ivfpqDenormBuild(embs, Seq("label"))
    val base = graft.streaming.ReplayHarness.scratchDir("graft_denorm_spec_")
    try {
      val codesDir = base.resolve("codes").toString
      idx.codes.write.partitionBy("cell").parquet(codesDir)
      val stored = spark.read.parquet(codesDir)
        .select(col("vec_id"), col("s"), col("code"),
          col("cell").cast("long").as("cell"), col("label"))
      val denorm = SimilarityOps.ivfpqScan(queries,
        SimilarityOps.IvfPqIndex(idx.cents, idx.cb, stored.filter(col("label") < 4)))

      // contract 1: row-identical to the semi-join mask (same candidates,
      // same ADC scores, same deterministic tie-break)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "rnk", "doc_id", "adist").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val semiDf = SimilarityOps.ivfpqFilteredScan(queries,
        SimilarityOps.ivfpqBuild(embs), allowed)
      assert(rows(denorm) === rows(semiDf),
        "denormalized-predicate scan diverged from the semi-join mask")

      // contract 2: the mask reached the STORAGE layer — the codes scan
      // carries a pushed label filter, and no semi join (e15's mask shape)
      // survives anywhere in the plan
      val plan = denorm.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(label), LessThan(label,4)"),
        s"label predicate not pushed to the codes scan:\n${plan.take(4000)}")
      assert(!plan.contains("LeftSemi"),
        "denormalized path must not carry a semi-join mask")
      // and e15's plan DOES carry it — the negative control
      assert(semiDf.queryExecution.executedPlan.toString.contains("LeftSemi"),
        "e15 mask shape changed — the negative control lost its teeth")
    } finally graft.streaming.ReplayHarness.cleanupScratch(base)
  }

  test("quantizer drift: frozen ingest equals build at the 25% point; rebuild pays once the stream shifts") {
    // the ScaleProbe ivfpqdrift rung's suite-scale bounds (same fixture
    // construction: quantizers trained on vec_id % 4 == 0, ingest waves
    // pulled toward a fixed direction and renormalized)
    import org.apache.spark.sql.functions._
    val sim = SimilarityOps
    val raw = graft.core.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding")
    def shifted(wave: org.apache.spark.sql.DataFrame, delta: Double) = wave
      .selectExpr("vec_id",
        s"transform(embedding, x -> CAST(x + ${delta} * 0.125D AS FLOAT)) AS e1")
      .selectExpr("vec_id", "e1", "CAST(sqrt(vec_dot(e1, e1)) AS DOUBLE) AS nrm")
      .selectExpr("vec_id", "transform(e1, x -> CAST(x / nrm AS FLOAT)) AS embedding")
    val base = raw.filter(col("vec_id") % 4 === 0)
    val idx1 = sim.ivfpqBuild(base)

    // (1) the 25% point is EXACT by rule identity: re-encoding the base
    // through the ingest path against its own frozen quantizers yields
    // byte-identical code rows — e11's "assignment and encode are the
    // identical rule on both sides", pinned as set equality
    def codeRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("s"), col("code"), col("cell").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(codeRows(sim.ivfpqIngest(base, idx1)) === codeRows(idx1.codes),
      "ingest-path encode diverged from build-path encode on identical inputs")

    def recallAt(corpus: org.apache.spark.sql.DataFrame,
        queries: org.apache.spark.sql.DataFrame, idx: sim.IvfPqIndex): Double = {
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
      val exact = queries
        .selectExpr("vec_id AS qid", "embedding AS qemb",
          "vec_dot(embedding, embedding) AS qsq")
        .crossJoin(corpus.selectExpr("vec_id", "embedding AS emb",
          "vec_dot(embedding, embedding) AS sq"))
        .filter(col("vec_id") =!= col("qid"))
        .selectExpr("qid", "vec_id", "qsq + sq - 2 * vec_dot(qemb, emb) AS dist")
        .withColumn("rnk", row_number().over(wx)).filter(col("rnk") <= sim.PqTopK)
        .collect().groupBy(_.getAs[Long]("qid"))
        .map { case (g, rs) => g -> rs.map(_.getAs[Long]("vec_id")).toSet }
      val got = sim.ivfpqScan(queries, idx).collect()
        .groupBy(_.getAs[Long]("qid"))
        .map { case (g, rs) => g -> rs.map(_.getAs[Long]("doc_id")).toSet }
      exact.map { case (g, want) =>
        got.getOrElse(g, Set.empty).count(want).toDouble / want.size
      }.sum / exact.size
    }
    // (2) recall floor at the 25% point (measured 0.467 on this fixture —
    // a quantizer or fixture regression drops it loudly)
    val qBase = base.filter(col("vec_id") < 12)
    val r25 = recallAt(base, qBase, idx1)
    assert(r25 >= 0.4, f"base-point recall@5 $r25%.3f below the 0.4 floor")

    // (3) the rung's raison d'être: once the stream has shifted (100%
    // point — two drifted waves ingested against frozen v1), a rebuild
    // must recover strictly more recall on fresh queries than the frozen
    // quantizers retain (measured 0.200 vs 0.067)
    val wave1 = shifted(raw.filter(col("vec_id") % 4 === 1), 1.0)
    val wave2 = shifted(raw.filter(col("vec_id") % 4 >= 2), 2.0)
    val corpus = base.unionByName(wave1).unionByName(wave2).cache()
    val qids = wave2.select("vec_id").orderBy(col("vec_id")).limit(3)
      .collect().map(_.getLong(0))
    val fresh = corpus.filter(col("vec_id").isin(qids: _*))
    val frozenCodes = idx1.codes
      .unionByName(sim.ivfpqIngest(wave1, idx1))
      .unionByName(sim.ivfpqIngest(wave2, idx1))
    val rFrozen = recallAt(corpus, fresh, idx1.copy(codes = frozenCodes))
    val rRebuilt = recallAt(corpus, fresh, sim.ivfpqBuild(corpus))
    info(f"drift 100%% point: recall5 frozen $rFrozen%.3f, rebuilt $rRebuilt%.3f")
    assert(rRebuilt > rFrozen,
      f"rebuild did not pay under planted drift: frozen $rFrozen%.3f >= rebuilt $rRebuilt%.3f")
    corpus.unpersist()
  }

  test("e7 BM25: idf ordering, tf saturation, and length normalization") {
    import spark.implicits._
    // crafted corpus — every pad token is unique to its document, so pads
    // shape only dl/L/N, never another doc's term match. Query doc 0 holds
    // exactly the two probe terms; "rare" matches one corpus doc per
    // variant (df=4 total), "common" matches 6 docs (df=7).
    def pads(tag: String, n: Int) = (1 to n).map(i => tag + ("a" * i))
    def doc(words: Seq[String]) = words.mkString(" ")
    val docs = (Seq(
      0L  -> doc(Seq("rare", "common")),
      10L -> doc("rare" +: pads("p", 9)),                 // tf=1, dl=10
      11L -> doc("common" +: pads("q", 9)),               // tf=1, dl=10
      12L -> doc(Seq.fill(4)("rare") ++ pads("r", 6)),    // tf=4, dl=10
      13L -> doc("rare" +: pads("s", 29))                 // tf=1, dl=30
    ) ++ (20L to 24L).map(i =>
      i -> doc("common" +: pads("t" + i, 9)))             // df(common) fodder
    ).toDF("doc_id", "text")
    val scores = SimilarityOps.bm25Retrieve(docs)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    // idf ordering: same tf and dl, rarer term must outscore the common one
    assert(scores(10L) > scores(11L),
      s"rare-term doc must outscore common-term doc: $scores")
    // tf saturation: more occurrences score higher, but sub-linearly
    assert(scores(12L) > scores(10L), s"tf=4 must beat tf=1: $scores")
    assert(scores(12L) < 4 * scores(10L),
      s"BM25 must saturate below linear tf growth: $scores")
    // length normalization: same tf in a 3x longer doc must score lower
    assert(scores(13L) < scores(10L),
      s"longer doc with equal tf must score lower: $scores")
  }

  test("e11 ingest: encode-only growth is complete, cell-valid, and load-bearing downstream") {
    import org.apache.spark.sql.functions.col
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val existing = embs.filter(col("vec_id") % 5 =!= 4)
    val arriving = embs.filter(col("vec_id") % 5 === 4)
    val idx = SimilarityOps.ivfpqBuild(existing)
    val ingested = SimilarityOps.ivfpqIngest(arriving, idx).cache()
    try {
      // completeness: every arriving vector yields exactly one code per
      // subspace (a partially-encoded vector would ADC-score garbage)
      val nArr = arriving.count()
      assert(ingested.count() === nArr * SimilarityOps.PqSubspaces)
      assert(ingested.select("vec_id").distinct().count() === nArr)
      // only arriving ids, and only EXISTING cells/codes — ingest must
      // never invent a cell (there is no inverted list to put it in) nor
      // touch the existing corpus
      assert(ingested.filter(col("vec_id") % 5 =!= 4).isEmpty)
      val k = graft.operators.ClusterOps.KMeansK
      assert(ingested.filter(col("cell") < 0 || col("cell") >= k).isEmpty)
      assert(ingested.filter(col("code") < 0 || col("code") >= SimilarityOps.PqK).isEmpty)
      // fixture guard for the e11 oracle's teeth: the grown read path must
      // surface at least one ARRIVING id in its top-5 — if fixture drift
      // ever voids this, a silently-dropped ingest batch would stop being
      // hash-breaking and e11 needs a deeper output
      val out = SimilarityOps.ivfpqGrowRetrieve(embs).collect()
      assert(out.nonEmpty)
      assert(out.exists(_.getAs[Long]("doc_id") % 5 === 4),
        "no arriving vector in the e11 top-5 — the ingest path is no longer load-bearing")
    } finally { ingested.unpersist(); () }
  }

  test("e12 upsert: tombstones and re-encodes are load-bearing in the served top-5") {
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val out = SimilarityOps.ivfpqUpsertRetrieve(embs).collect()
    assert(out.nonEmpty)
    // a served stale ver-0 row or a resurfacing delete must be able to
    // break the e12 hash: the fixture's top-5 must CONTAIN at least one
    // re-encoded (updated) id and must NEVER contain a deleted id
    assert(out.exists(_.getAs[Long]("doc_id") % 7 === 3),
      "no updated vector in the e12 top-5 — the ver-1 ingest path is no longer load-bearing")
    assert(out.forall(_.getAs[Long]("doc_id") % 11 !== 5),
      "a deleted vector resurfaced in the e12 top-5")
    // and the delete mask must be doing work the shortlist would otherwise
    // surface: the unchurned read path (e10 refine over the same corpus)
    // ranks at least one id e12 deletes, so the tombstone is load-bearing
    val unchurned = SimilarityOps.ivfpqRefine(embs).collect()
    assert(unchurned.exists(_.getAs[Long]("doc_id") % 11 === 5),
      "no deleted id in the unchurned top-5 — fixture drift voided the tombstone teeth; " +
        "deepen the output or re-pick the delete residue")
  }

  test("ivfpqCompactCodes folds mask + ver-1 physically, touching only dirty cells") {
    import org.apache.spark.sql.functions.{broadcast, col}
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val idx = SimilarityOps.ivfpqBuild(embs)
    val dir = GraftTestSpark.tmpDir("ivfpq_compact") + "/codes"
    idx.codes.write.partitionBy("cell").parquet(dir)

    // e12-shaped churn, deliberately SMALL (2 updates + 1 delete over 8
    // cells) so clean cells must exist and the cell-pruning assertion has
    // teeth — an update dirties at most its old + new cell, a delete one
    val rot = "transform(sequence(1, 64), i -> element_at(embedding, (i % 64) + 1))"
    val updSet = Seq(3L, 200L)
    val cur = embs.selectExpr("vec_id",
      s"CASE WHEN vec_id IN (3, 200) THEN $rot ELSE embedding END AS embedding")
    val delIds = embs.filter(col("vec_id") === 100L).select("vec_id")
    val arriving = cur.filter(col("vec_id").isin(updSet: _*))
      .join(delIds, Seq("vec_id"), "left_anti")
    val ver1 = SimilarityOps.ivfpqIngest(arriving, idx)
    val mask = embs.filter(col("vec_id").isin(updSet: _*)).select("vec_id")
      .union(delIds).distinct()
    val served = spark.read.parquet(dir)
      .join(broadcast(mask), Seq("vec_id"), "left_anti")
      .unionByName(ver1.select("vec_id", "s", "code", "cell"))
      .selectExpr("CAST(vec_id AS LONG) vec_id", "CAST(s AS INT) s",
        "CAST(code AS INT) code", "CAST(cell AS LONG) cell")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet

    val fsPath = new org.apache.hadoop.fs.Path(dir)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafState(): Map[String, Set[(String, Long)]] =
      fs.listStatus(fsPath).filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .map(p => p.getPath.getName -> fs.listStatus(p.getPath)
          .filter(_.isFile).map(f => (f.getPath.getName, f.getModificationTime)).toSet)
        .toMap
    val before = leafState()

    val dirty = SimilarityOps.ivfpqCompactCodes(spark, dir, ver1, mask)
    assert(dirty.nonEmpty, "no dirty cells — churn fixture degenerated")
    assert(dirty.size < before.size,
      s"every cell dirty (${dirty.size} of ${before.size}) — the cell-pruning claim is untestable " +
        "on this fixture; shrink the churn residues")

    // logical fold: the compacted table IS the served view, mask no longer needed
    val after = spark.read.parquet(dir)
      .selectExpr("CAST(vec_id AS LONG) vec_id", "CAST(s AS INT) s",
        "CAST(code AS INT) code", "CAST(cell AS LONG) cell")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(after === served, "compacted codes differ from the served (masked+ver1) view")
    // physical scope: clean cells byte-untouched (same files, same mtimes)
    val untouched = leafState().filter { case (name, _) =>
      !dirty.contains(name.stripPrefix("cell=").toLong) }
    assert(untouched === before.view.filterKeys(untouched.keySet).toMap,
      "a clean cell's files changed — compaction is not cell-pruned")
  }
}
