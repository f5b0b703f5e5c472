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

  /** Scratch for shuffle blocks and spill files (`spark.local.dir`).
    * Principle (guide-of-record §6): local dirs belong on the FASTEST
    * local storage available — on a production node that is the NVMe
    * array; in this sandbox java.io.tmpdir is ext4 on a virtual disk
    * while /dev/shm is a 128 GiB tmpfs, so tmpfs IS the fastest local
    * storage (measured: exact-percentile q34 −26%, prefix-join d12
    * −15% wall with identical calibration). Parameterised via
    * SPARK_GRAFT_LOCAL_DIR so a deployment points it at its own disks;
    * falls back to the JVM default when /dev/shm is absent. Spark
    * creates per-app subdirectories and removes them on shutdown, so
    * shared use across concurrent JVMs is safe.
    */
  def localDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      "/dev/shm/graft_spark_local"
    else System.getProperty("java.io.tmpdir")
  })

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.local.dir", localDir)
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
