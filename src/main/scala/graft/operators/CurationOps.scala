package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Dataset-curation operators a training pipeline runs after filtering and
  * dedup: packing documents into fixed token budgets and drawing
  * reproducible stratified samples.
  */
object CurationOps {

  /** Token budget per packed sequence (a typical LM context length). */
  val PackBudget = 2048L

  /** p1: sequence packing — assign consecutive documents to fixed
    * token-budget bins and report per-bin fill. Offset-chunking semantics:
    * a document goes to the bin where its token span STARTS
    * (bin = exclusive-prefix-sum DIV budget), so bins are contiguous doc
    * runs and a straddling document belongs to the bin it begins in —
    * deterministic, order-stable, and exactly reproducible by the oracle
    * (greedy first-fit packing is neither).
    *
    * Scale shape: the prefix sum is a window PARTITIONED BY lang — packing
    * is independent per language (as a real pipeline packs per shard), so
    * there is no global total sort; one shuffle on lang, per-partition sort,
    * then a partial+final hash agg on (lang, bin). At 100 TB the partition
    * key would be (lang, shard) with the identical plan.
    */
  val p1 = Q(
    "p1_pack_sequences",
    s"""WITH t AS (
       |  SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT lang, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t)
       |SELECT lang, ((cum - n_tokens) // $PackBudget)::BIGINT AS bin,
       |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS bin_tokens
       |FROM c GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) DIV $PackBudget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
  }

  /** p2: stratified sampling — per-language rates (majority class
    * downsampled: en keeps 50%, every other language 10%) decided by the
    * portable md5-prefix hash of the row key, as in q38: the SAME rows are
    * sampled on every engine and every run, which `TABLESAMPLE`/`rand()`
    * cannot promise. Census output (per stratum: population and sample
    * size) so the oracle check covers the selection itself.
    *
    * Scale shape: pure map stage + partial+final hash agg on lang — the
    * sample predicate would push into any downstream scan-and-keep pipeline
    * unchanged.
    */
  val p2 = Q(
    "p2_stratified_sample",
    s"""SELECT lang, count(*) AS n_total,
       |  sum(CASE WHEN pct < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
       |      THEN 1 ELSE 0 END)::BIGINT AS n_sampled
       |FROM (
       |  SELECT lang,
       |    ${graft.core.PortableHash.duck("doc_id::VARCHAR")} % 100 AS pct
       |  FROM documents) t
       |GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("pct",
        expr(graft.core.PortableHash.spark("CAST(doc_id AS STRING)") + " % 100"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("pct") < when(col("lang") === "en", 50).otherwise(10), 1L)
          .otherwise(0L)).as("n_sampled"))
  }

  /** Training shards for p3 (the number of output files/workers an epoch is
    * striped across). */
  val NShards = 8L

  /** p3: deterministic global shuffle — assign every document a training
    * shard and an intra-shard position from the portable md5 hash of its
    * id. The hash IS the shuffle: it is uniform, reproducible across
    * engines and runs (rand() is neither), and seedable by salting the
    * hashed key. Consumers read shards in parallel and each shard in
    * position order — a full random epoch order with no global sort.
    *
    * Scale shape: shard = hash % N is a pure map; position is a window
    * PARTITIONED BY shard (one shuffle on the shard key, per-shard local
    * sort) — the global total order is never materialized on one node,
    * which is what makes this the 100 TB epoch-shuffle shape.
    */
  val p3 = Q(
    "p3_shuffle_shard",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ${graft.core.PortableHash.duck("doc_id::VARCHAR")} AS hv
       |  FROM documents)
       |SELECT doc_id, (hv % $NShards)::BIGINT AS shard,
       |  (row_number() OVER (PARTITION BY hv % $NShards ORDER BY hv, doc_id))::BIGINT
       |    AS pos
       |FROM h""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        expr(graft.core.PortableHash.spark("CAST(doc_id AS STRING)")).as("hv"))
      .withColumn("shard", expr(s"hv % $NShards"))
    val w = Window.partitionBy(col("shard")).orderBy(col("hv"), col("doc_id"))
    h.select(col("doc_id"), col("shard"),
      row_number().over(w).cast("long").as("pos"))
  }

  /** Context-window chunk length and stride for p4 (75% advance = 25%
    * token overlap between consecutive chunks). */
  val ChunkSize = 64
  val ChunkStride = 48

  /** p4: overlapping context-window chunking — split each document's token
    * stream into fixed-length windows advancing by a stride smaller than
    * the window, the standard prep for models whose context is shorter
    * than a document (the overlap preserves cross-boundary continuity).
    * A window starts at every stride multiple <= n_tokens, so the final
    * window may be short (and, for a tail shorter than the overlap, nested
    * in its predecessor — chunk accounting is deliberately exhaustive
    * rather than trimmed, and the downstream packer p1 handles budgets).
    * Each chunk carries the portable hash of its text so the oracle checks
    * CONTENT, not just arithmetic.
    *
    * Scale shape: shuffle-free — one generator expansion per row (sequence
    * of starts, codegen), no joins, no aggregation; the natural map stage
    * before p3's shard assignment.
    */
  val p4 = Q(
    "p4_chunk_windows",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id, ((st - 1) // $ChunkStride)::BIGINT AS chunk_id,
       |  (least(st + ${ChunkSize - 1}, len(toks)) - st + 1)::BIGINT AS n_chunk_tokens,
       |  ${graft.core.PortableHash.duck(
      s"array_to_string(toks[st : least(st + ${ChunkSize - 1}, len(toks))], ' ')")}
       |    AS chunk_fp
       |FROM t, unnest(generate_series(1, len(toks), $ChunkStride)) AS u(st)""".stripMargin) {
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          explode(expr(s"sequence(1, size(toks), $ChunkStride)")).as("st"),
          col("toks"))
        .select(col("doc_id"),
          expr(s"CAST((st - 1) DIV $ChunkStride AS BIGINT)").as("chunk_id"),
          expr(s"CAST(least(st + ${ChunkSize - 1}, size(toks)) - st + 1 AS BIGINT)")
            .as("n_chunk_tokens"),
          expr(graft.core.PortableHash.spark(
            s"concat_ws(' ', slice(toks, st, least(st + ${ChunkSize - 1}, size(toks)) - st + 1))"))
            .as("chunk_fp"))
  }

  /** Per-source document cap for p5 (the anti-domination quota). */
  val SourceCap = 20

  /** p5: per-source cap — the anti-domination quota every web-scale corpus
    * applies (no single domain/source may contribute more than K documents):
    * rank each source's documents by a quality proxy (longer first,
    * doc_id tiebreak for determinism) and keep the top K. Census output per
    * source — population, kept count, and an exact integer checksum of the
    * kept ids — so the oracle verifies the SELECTION, not just the counts.
    *
    * Scale shape: one shuffle on source, per-source local sort, rank,
    * filter — the same parallel-per-group window as q11/q37/q46; no global
    * sort, no skew beyond the largest single source (which is exactly the
    * quantity this op bounds going forward).
    */
  val p5 = Q(
    "p5_source_cap",
    s"""WITH r AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM documents)
       |SELECT source, count(*) AS n_total,
       |  sum(CASE WHEN rnk <= $SourceCap THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  sum(CASE WHEN rnk <= $SourceCap THEN doc_id ELSE 0 END)::BIGINT
       |    AS kept_checksum
       |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rnk") <= SourceCap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rnk") <= SourceCap, col("doc_id")).otherwise(0L))
          .as("kept_checksum"))
  }

  /** p6: mixture rebalancing plan — the data-mixing step that sets
    * per-stratum sampling rates so the training mixture hits a target
    * distribution (here: equal token share per language, downsample-only).
    * Output per language: token mass, current share, the sampling rate
    * `min(1, target/actual)`, and the expected post-sampling token count.
    * The expected count is computed as exact integer arithmetic
    * (`least(n_tokens, total DIV k)`), so the oracle pins it exactly;
    * share/rate are closed-form doubles from those integers (q53's moment
    * discipline). Feed the rates into p2's deterministic hash sampler to
    * EXECUTE the plan.
    *
    * Scale shape: one explode-free token-count agg on lang (size(split())
    * is a map stage), a k-row total broadcast, scalar arithmetic.
    */
  val p6 = Q(
    "p6_mixture_weights",
    """WITH c AS (
      |  SELECT lang, sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT sum(n_tokens)::BIGINT AS total, count(*)::BIGINT AS k FROM c)
      |SELECT lang, n_tokens,
      |  round(n_tokens::DOUBLE / t.total, 4) AS share,
      |  round(least(1.0, (t.total::DOUBLE / t.k) / n_tokens::DOUBLE), 4) AS sample_rate,
      |  least(n_tokens, t.total // t.k)::BIGINT AS expected_tokens
      |FROM c, t""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("lang"))
      .agg(sum(col("nt")).as("n_tokens"))
    val t = c.agg(sum(col("n_tokens")).as("total"), count(lit(1)).as("k"))
    c.join(broadcast(t))
      .select(col("lang"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total"), 4).as("share"),
        round(least(lit(1.0),
          (col("total").cast("double") / col("k")) / col("n_tokens").cast("double")), 4)
          .as("sample_rate"),
        least(col("n_tokens"), expr("total DIV k")).as("expected_tokens"))
  }

  /** p7: mixture EXECUTION — the closed loop p6 plans and p2 approximates
    * with fixed constants: compute the per-language downsampling target
    * (equal token share, downsample-only — p6's exact integer arithmetic),
    * then actually draw the sample with the portable hash as the coin:
    * keep a document iff `hash(doc_id) % lang_tokens < expected_tokens`,
    * an integer-exact per-stratum rate of expected/actual that needs no
    * floating-point rate column anywhere. Census output per language —
    * kept docs, kept token mass, and an id checksum — so the oracle pins
    * WHICH documents the executed mixture keeps, not just how many.
    *
    * Scale shape: two scans of the corpus (one to weigh strata, one to
    * draw), a k-row rate table broadcast between them — the decision is a
    * map-side filter against broadcast state, so the draw itself neither
    * shuffles nor sorts; the census agg is the usual partial+final hash
    * agg on lang. At 100 TB the weigh pass is the same single agg and the
    * rate table is still k rows.
    */
  val p7 = Q(
    "p7_mixture_execute",
    s"""WITH d AS (
       |  SELECT lang, doc_id,
       |    len(string_split(text, ' '))::BIGINT AS nt,
       |    ${graft.core.PortableHash.duck("doc_id::VARCHAR")} AS hv
       |  FROM documents),
       |c AS (SELECT lang, sum(nt)::BIGINT AS lang_tokens FROM d GROUP BY 1),
       |t AS (SELECT sum(lang_tokens)::BIGINT AS total, count(*)::BIGINT AS k FROM c),
       |r AS (SELECT lang, lang_tokens,
       |        least(lang_tokens, t.total // t.k)::BIGINT AS expected_tokens
       |      FROM c, t)
       |SELECT d.lang, r.lang_tokens, r.expected_tokens,
       |  sum(CASE WHEN d.hv % r.lang_tokens < r.expected_tokens
       |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  sum(CASE WHEN d.hv % r.lang_tokens < r.expected_tokens
       |      THEN d.nt ELSE 0 END)::BIGINT AS tokens_kept,
       |  sum(CASE WHEN d.hv % r.lang_tokens < r.expected_tokens
       |      THEN d.doc_id ELSE 0 END)::BIGINT AS kept_checksum
       |FROM d JOIN r USING (lang)
       |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val d = Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        expr(graft.core.PortableHash.spark("CAST(doc_id AS STRING)")).as("hv"))
    val c = d.groupBy(col("lang")).agg(sum(col("nt")).as("lang_tokens"))
    val t = c.agg(sum(col("lang_tokens")).as("total"), count(lit(1)).as("k"))
    val r = c.join(broadcast(t))
      .select(col("lang"), col("lang_tokens"),
        least(col("lang_tokens"), expr("total DIV k")).as("expected_tokens"))
    val keep = col("hv") % col("lang_tokens") < col("expected_tokens")
    d.join(broadcast(r), Seq("lang"))
      .groupBy(col("lang"), col("lang_tokens"), col("expected_tokens"))
      .agg(
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, col("nt")).otherwise(0L)).as("tokens_kept"),
        sum(when(keep, col("doc_id")).otherwise(0L)).as("kept_checksum"))
  }

  /** Epoch count for p8's reshuffle schedule. */
  val NEpochs = 3

  /** p8: MULTI-EPOCH deterministic reshuffle — p3 fixes ONE epoch's order;
    * a training run makes E passes and each must see a DIFFERENT
    * permutation that any worker can recompute from (doc_id, epoch) alone:
    * the portable hash key is salted with the epoch, so every epoch gets a
    * fresh pseudo-random shard assignment and within-shard order while
    * staying byte-reproducible — no stored shuffle files, no seed
    * coordination, and a worker resuming epoch 2 / shard 5 after a restart
    * recomputes its exact order from the ids. The oracle replays the
    * salted-hash arithmetic for all E epochs, so the row certifies both
    * the reshuffle (epochs really differ — different salts, different
    * hashes) and its reproducibility.
    *
    * Scale shape: the epoch dimension is an E-row generator cross (exactly
    * the intended ×E expansion, nothing quadratic), shard = hash % N stays
    * a pure map, and positions come from windows partitioned by
    * (epoch, shard) — E·N independent local sorts; the global per-epoch
    * order is never materialized on one node.
    */
  val p8 = Q(
    "p8_epoch_reshuffle",
    s"""WITH e AS (SELECT unnest(generate_series(0, ${NEpochs - 1})) AS epoch),
       |h AS (
       |  SELECT e.epoch, d.doc_id,
       |    ${graft.core.PortableHash.duck("d.doc_id::VARCHAR || ':' || e.epoch::VARCHAR")} AS hv
       |  FROM documents d CROSS JOIN e)
       |SELECT epoch::BIGINT AS epoch, doc_id, (hv % $NShards)::BIGINT AS shard,
       |  (row_number() OVER (PARTITION BY epoch, hv % $NShards
       |                      ORDER BY hv, doc_id))::BIGINT AS pos
       |FROM h""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val h = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(expr(s"sequence(0, ${NEpochs - 1})")).as("epoch"))
      .select(col("epoch").cast("long").as("epoch"), col("doc_id"),
        expr(graft.core.PortableHash.spark(
          "concat(CAST(doc_id AS STRING), ':', CAST(epoch AS STRING))")).as("hv"))
      .withColumn("shard", expr(s"hv % $NShards"))
    val w = Window.partitionBy(col("epoch"), col("shard")).orderBy(col("hv"), col("doc_id"))
    h.select(col("epoch"), col("doc_id"), col("shard"),
      row_number().over(w).cast("long").as("pos"))
  }

  /** p9: GROUP-AWARE train/test split — rows follow their GROUP's hash
    * (here: every event goes where its USER goes, 80/20 by the portable
    * md5 hash of user_id), the leakage-prevention discipline: a row-level
    * split (p2/p3's shape) would put one user's events on both sides of
    * the boundary, and any model that memorizes user behavior then grades
    * itself on training data. The in-query guard pins the invariant
    * DIRECTLY — zero users straddle — so a refactor back to row hashing
    * fails the row, not a code review. Census per side (rows, distinct
    * users, id checksum) makes the exact membership oracle-checked.
    *
    * Scale shape: the split is a pure map stage (hash of the group key
    * rides each row — no join against a group table, no shuffle); the
    * guard is one aggregate. At 100 TB the same predicate pushes into
    * every downstream scan unchanged.
    */
  val p9 = Q(
    "p9_group_split",
    s"""WITH t AS (
       |  SELECT *, CASE WHEN ${graft.core.PortableHash.duck("user_id::VARCHAR")} % 10 < 8
       |    THEN 'train' ELSE 'test' END AS split
       |  FROM events)
       |SELECT split, count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
       |  sum(event_id)::BIGINT AS id_checksum
       |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
    val t = Tables.load(s, dir, "events")
      .withColumn("split",
        when(expr(graft.core.PortableHash.spark("CAST(user_id AS STRING)") + " % 10") < 8,
          "train").otherwise("test"))
    require(t.groupBy(col("user_id"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).isEmpty,
      "group split leaked: a user appears on both sides of the boundary")
    t.groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("event_id")).as("id_checksum"))
  }

  val all: Seq[Q] = Seq(p1, p2, p3, p4, p5, p6, p7, p8, p9)
}
