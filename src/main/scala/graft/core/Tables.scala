package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver corpus (TESTDATA.md / FIXTURES.md §2).
  *
  * Tables are plain Parquet directories; the scan is a standard
  * `FileSourceScanExec`, so Catalyst predicate pushdown / column pruning /
  * partition pruning apply for free. At 100 TB these paths would be
  * partitioned directories (e.g. orders by month) and everything downstream
  * is unchanged — the loaders deliberately expose nothing but a DataFrame.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables: always broadcast-eligible at any scale
    * (region=5 rows, nation=25 rows — fixed-size in TPC-H regardless of SF).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects outright. Read nanos as long (legacy conf), then
    * rescale to a microsecond TIMESTAMP — lossless for this corpus (every ts
    * has zero sub-microsecond component) and identical to what DuckDB's
    * reader yields for the oracle.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // integer DIV, not `/`: double division loses 1us at 2024-epoch magnitude
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register every fixture table as a temp view so `spark.sql` text matches
    * the DuckDB oracle text as closely as possible.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
