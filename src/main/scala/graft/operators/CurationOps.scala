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

  val all: Seq[Q] = Seq(p1, p2)
}
