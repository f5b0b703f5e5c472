package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Batch relational operator surface (SURVEY.md §2.2 matrix).
  *
  * Each query is a named (SparkSession, sfDir) => DataFrame with a matching
  * DuckDB oracle in [[oracles]]. Column aliases MUST match the oracle SQL
  * exactly (driver hash-compares after sorting columns by name).
  *
  * Scale notes are attached per query: these run at sf0.01 for correctness
  * but are written for the 100 TB plan shape — partial aggregation before
  * shuffle, broadcast for fixed-size dims, sort-merge for fact-fact joins.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- aggregates

  /** TPC-H Q1-shaped pricing summary. Hash aggregate with map-side partial
    * aggregation: 600M+ rows at 100 TB reduce to 6 groups before the shuffle,
    * so the exchange moves O(partitions * groups) rows only.
    */
  def q1_pricing_summary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1_pricing_summary _)
  )
}
