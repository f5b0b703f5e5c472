package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Methodology:
  *   - results are materialized through the `noop` sink — a bare count()
  *     would let Catalyst prune away the very projections being measured;
  *   - one warmup execution per query (JIT + code cache + page cache), then
  *     the better of two timed runs is reported — steady-state per-query
  *     latency, which is what a resident service would see;
  *   - contention defense: this host varies up to 10x under load, and in
  *     round 4 a single contended window recorded t12 at 29 s (1.77 s
  *     isolated) into the official artifact. After the main pass, any query
  *     measuring >3x its committed clean reference (bench_ref.json, same
  *     scale factor) is re-measured twice more and the minimum wins; if the
  *     re-measure disagrees by >2x the query is flagged in a `contended`
  *     list so one noisy window can neither dominate the artifact nor pass
  *     silently. Both the original and re-measured times are recorded in
  *     the artifact (`remeasured`), and a query whose BEST time still
  *     exceeds the 3x gate lands in `still_slow` — so a genuine regression
  *     vs the reference cannot be silently absorbed by the keep-min rule.
  *   - coverage defense: when a reference recording is active, every
  *     registered query missing from it is listed in `ref_missing` — a
  *     query added after the recording (round 5's q60 was benched against
  *     nothing) is flagged loudly instead of silently skipping the gate.
  *   - the artifact splits `batch_total` from `streaming_replay_total`:
  *     st* rows replay fixed per-micro-batch machinery (state-store commits
  *     + WAL, constant in data size — see ReplayHarness scaladoc), so
  *     folding them into one number would drown the batch throughput
  *     signal the 2x baseline gate is about. `value` stays the grand total
  *     for driver compatibility.
  */
object Bench {

  /** st* rows are streaming REPLAYS (fixed-cost machinery), everything else
    * measures batch operator throughput.
    */
  def isStreamingReplay(name: String): Boolean = name.startsWith("st")

  /** Registered queries missing from an ACTIVE reference recording — these
    * dodge the contention re-measure pass entirely, so they must be loud.
    * An empty ref (missing file / sf mismatch) disables the check rather
    * than flagging everything.
    */
  def refGaps(registered: Seq[String], ref: Map[String, Double]): Seq[String] =
    if (ref.isEmpty) Seq.empty else registered.filterNot(ref.contains).sorted
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional arg: comma-separated query-name prefixes to run (iteration aid).
    val filter: String => Boolean =
      if (args.isEmpty) _ => true
      else { val ps = args(0).split(','); n => ps.exists(n.startsWith) }
    val spark = graft.core.GraftSession.getOrCreate()

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).filter(p => filter(p._1)).map {
      case (name, fn) =>
        val t = try {
          runOnce(fn) // warmup
          math.min(runOnce(fn), runOnce(fn))
        } catch { case _: Throwable => -1.0 }
        // Inter-query hygiene: round 1's q24-q28 ran 13-54 s in the full bench
        // but 0.3-0.9 s in isolation — heap/GC debris from the (then) 494 s d4
        // poisoned later queries. A forced GC lets Spark's ContextCleaner drop
        // dead broadcast/shuffle state so each query is measured cold-state.
        System.gc()
        System.err.println(f"[bench] $name%-28s ${t}%9.3f s")
        (name, fn, t)
    }

    // Contention re-measure pass (see header). The reference is keyed to its
    // recording's sf dir — a mismatched scale factor disables the comparison
    // rather than re-measuring everything.
    val ref: Map[String, Double] = {
      val p = java.nio.file.Paths.get("bench_ref.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val text = java.nio.file.Files.readString(p)
        val sfOk = """"_sf"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(text)
          .exists(_.group(1) == sfDir)
        if (!sfOk) Map.empty
        else """"([A-Za-z0-9_]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    final case class Adjudicated(name: String, best: Double,
        contended: Boolean, firstPass: Option[Double], remeasure: Option[Double],
        stillSlow: Boolean)
    val adjudicated = results.map { case (name, fn, t) =>
      // suspect gate: 3x the reference, padded by 0.5 s only for sub-0.3 s
      // references where JVM noise dominates. The old unconditional pad let
      // a 3.67x draw on a 0.55 s reference (2.02 s < 3*0.55+0.5) skip
      // re-measure entirely — refs >= 0.3 s are big enough that 3x alone
      // separates contention from noise.
      val gate = ref.get(name).map(r => if (r >= 0.3) 3 * r else 3 * r + 0.5)
      val suspect = t >= 0 && gate.exists(t > _)
      if (!suspect) Adjudicated(name, t, contended = false, None, None, stillSlow = false)
      else {
        val t2 = try math.min(runOnce(fn), runOnce(fn))
        catch { case _: Throwable => t }
        System.gc()
        val best = math.min(t, t2)
        val contended = math.max(t, t2) > 2 * best
        // keep-min can mask a real regression: if even the best time still
        // trips the gate, surface it instead of absorbing it
        val stillSlow = gate.exists(best > _)
        System.err.println(
          f"[bench] $name%-28s re-measured: $t%9.3f -> $t2%9.3f s (ref ${ref(name)}%.3f)" +
            (if (stillSlow) "  STILL-SLOW" else ""))
        Adjudicated(name, best, contended, Some(t), Some(t2), stillSlow)
      }
    }

    def strArr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = adjudicated.map(a => "\"" + a.name + "\":" + a.best).mkString("{", ",", "}")
    val valid = adjudicated.filter(_.best >= 0)
    val total = valid.map(_.best).sum
    val batchTotal = valid.filterNot(a => isStreamingReplay(a.name)).map(_.best).sum
    val streamingTotal = valid.filter(a => isStreamingReplay(a.name)).map(_.best).sum
    val remeasuredJson = adjudicated.collect {
      case Adjudicated(n, _, _, Some(t1), Some(t2), _) =>
        // [first-pass time, re-measure time]; min is what `queries` reports
        s""""$n":[$t1,$t2]"""
    }.mkString("{", ",", "}")
    val gaps = refGaps(results.map(_._1), ref)
    if (gaps.nonEmpty)
      System.err.println(s"[bench] WARNING: no bench_ref entry for ${gaps.mkString(", ")} — " +
        "contention defense cannot adjudicate these; refresh bench_ref.json")
    val line = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""batch_total":$batchTotal,"streaming_replay_total":$streamingTotal,""" +
      s""""queries":$qs,"contended":${strArr(adjudicated.filter(_.contended).map(_.name))},""" +
      s""""still_slow":${strArr(adjudicated.filter(_.stillSlow).map(_.name))},""" +
      s""""remeasured":$remeasuredJson,"ref_missing":${strArr(gaps)},"sf":"$sfDir"}"""
    println(line)
    // sbt prefixes stdout with [info], which broke the driver's JSON parse in
    // round 1 ("parsed": null) — also write the line to a file it can read.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
