package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark implementation plus (optionally) the DuckDB
  * oracle SQL the driver uses for hash-equality checking. Keeping the pair in
  * one value makes name/alias drift between the two sides a code-review error
  * rather than a silent hash mismatch.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), fn)

  /** Non-SQL-expressible op: driver falls back to a rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, None, fn)

  def toQueryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap

  def toOracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
