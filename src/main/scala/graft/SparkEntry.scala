package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Q
import graft.functions.{AggregatorOps, TextOps}
import graft.multimodal.MultimodalOps
import graft.operators.{ClusterOps, CurationOps, DedupOps, MiscQueries, RelationalQueries, ReshapeQueries, ScalarFunctionQueries, SimilarityOps, SkewOps}
import graft.streaming.{StreamingQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from the per-module registries so
  * each operator family lives next to its implementation.
  */
object SparkEntry {

  /** Every registered query across all operator modules. */
  def registry: Seq[Q] =
    RelationalQueries.all ++ ScalarFunctionQueries.all ++ TextOps.all ++
      DedupOps.all ++ SimilarityOps.all ++ MultimodalOps.all ++
      WindowQueries.all ++ StreamingQueries.all ++ AggregatorOps.all ++ MiscQueries.all ++ SkewOps.all ++
      ReshapeQueries.all ++ ClusterOps.all ++ CurationOps.all ++
      graft.sources.FormatQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.toQueryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Q.toOracleMap(registry)
}
