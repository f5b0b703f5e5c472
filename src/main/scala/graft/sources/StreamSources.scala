package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable stream sources (SURVEY §7.1 "offline Kafka").
  *
  * The reference subscribes to Kafka topic `users_queue`
  * (/root/reference/spark-streaming.py:150-155). This container has no
  * kafka-sql jar and no broker, so the Kafka path is format-string
  * indirection behind an availability probe: compile-time safe, constructed
  * only when the format exists on the classpath. Tests and offline e2e use
  * MemoryStream / rate / file sources — identical DataFrame surface.
  */
object StreamSources {

  /** True when the kafka DSv2 provider is on the classpath. */
  def kafkaAvailable(spark: SparkSession): Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider",
        false, Thread.currentThread().getContextClassLoader)
      true
    } catch { case _: ClassNotFoundException => false }

  /** Kafka stream scan, 1:1 with the reference (subscribe from earliest).
    * Throws with a clear message when the connector jar is absent rather
    * than failing downstream with a provider-lookup error.
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame = {
    require(kafkaAvailable(spark),
      "spark-sql-kafka is not on the classpath; use MemoryStream/rate/file sources offline")
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
  }

  /** Rate source: the offline stand-in for the reference's bounded-duration
    * producer loop (kafka-streamer.py:41-49) — load-shaped row generation.
    */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()

  /** File stream source over a directory of parquet drops — the batch-file
    * analogue of a topic (each new file = new micro-batch input).
    */
  def parquetDir(spark: SparkSession, schema: org.apache.spark.sql.types.StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Kafka producer sink, 1:1 with the reference's value-only send
    * (kafka-streamer.py:45): a `value` column serialized as JSON bytes.
    * Same availability guard as the source.
    */
  def kafkaWriter(df: DataFrame, bootstrap: String, topic: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(kafkaAvailable(df.sparkSession),
      "spark-sql-kafka is not on the classpath; use memory/parquet sinks offline")
    import org.apache.spark.sql.functions.{struct, to_json, col}
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
  }
}
