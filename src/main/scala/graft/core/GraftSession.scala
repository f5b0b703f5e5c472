package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Mirrors the reference's session setup (/root/reference/spark-streaming.py:112-126:
  * app name, shuffle-partition override, graceful streaming shutdown) but tuned for
  * the local[N] test envelope while staying cluster-shaped: every config here is one
  * a 1000-executor deployment would also set (AQE on, UTC, sane shuffle parallelism)
  * rather than local-only hacks.
  */
object GraftSession {

  /** Default parallelism: match local cores (the driver runs local[32]); on a real
    * cluster this would be ~2-3x total executor cores. AQE coalesces down at runtime
    * so erring high is safe at scale.
    */
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.streaming.stopGracefullyOnShutdown", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
