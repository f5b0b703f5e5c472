package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.StreamSources

/** Batch source-format coverage (SURVEY §2.2 scan rows): the same relation
  * round-trips through parquet (native), CSV and JSON with explicit schemas
  * — schema declared, never inferred in the hot path (SURVEY §1.3).
  * Stream sources: rate works offline; kafka is guarded by the
  * availability probe (no jar in this container — SURVEY §7.1).
  */
class SourceFormatsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("csv and json round-trip the nation table with explicit schemas") {
    val nation = Tables.load(spark, GraftTestSpark.sf, "nation")
    val base = GraftTestSpark.tmpDir("fmt")
    nation.write.option("header", "true").csv(s"$base/csv")
    nation.write.json(s"$base/json")
    val fromCsv = spark.read.schema(nation.schema).option("header", "true").csv(s"$base/csv")
    val fromJson = spark.read.schema(nation.schema).json(s"$base/json")
    val want = nation.collect().map(_.toString).sorted.toSeq
    assert(fromCsv.collect().map(_.toString).sorted.toSeq === want)
    assert(fromJson.collect().map(_.toString).sorted.toSeq === want)
  }

  test("rate stream source produces rows offline") {
    val q = StreamSources.rate(spark, 100)
      .writeStream.format("memory").queryName("rate_out").start()
    try {
      // rate source is wall-clock driven; poll until the first batch lands
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        q.processAllAvailable()
        n = spark.sql("SELECT * FROM rate_out").count()
      }
      assert(n > 0)
    } finally q.stop()
  }

  test("file stream source picks up new parquet drops incrementally") {
    val dropDir = GraftTestSpark.tmpDir("drops")
    val nation = Tables.load(spark, GraftTestSpark.sf, "nation")
    // first drop BEFORE the stream starts (initial listing), second after
    // (incremental discovery) — each new file is a new micro-batch input
    nation.filter("n_nationkey < 10").write.parquet(s"$dropDir/d1.parquet")
    val q = StreamSources.parquetDir(spark, nation.schema, s"$dropDir/*.parquet")
      .writeStream.format("memory").queryName("drops_out").outputMode("append").start()
    q.processAllAvailable()
    val first = spark.sql("SELECT * FROM drops_out").count()
    nation.filter("n_nationkey >= 10").write.parquet(s"$dropDir/d2.parquet")
    q.processAllAvailable()
    val total = spark.sql("SELECT * FROM drops_out").count()
    q.stop()
    assert(first === 10)
    assert(total === nation.count())
  }

  test("kafka source is unavailable offline and fails with a clear message") {
    assert(!StreamSources.kafkaAvailable(spark))
    val e = intercept[IllegalArgumentException] {
      StreamSources.kafka(spark, "localhost:9092", "users_queue")
    }
    assert(e.getMessage.contains("MemoryStream/rate/file"))
    val e2 = intercept[IllegalArgumentException] {
      StreamSources.kafkaWriter(
        StreamSources.rate(spark, 1), "localhost:9092", "users_queue")
    }
    assert(e2.getMessage.contains("memory/parquet"))
  }

  test("avro resolves via the FQCN fallback here; f9 round-trip equals the parquet truth") {
    import graft.sources.FormatQueries
    // this container: spark-sql ships the Avro classes but not the
    // ServiceLoader registration, so the probe must land on the FQCN
    // fallback (the "avro" short name throws Spark's external-module
    // policy error); with the real spark-avro jar it resolves to "avro"
    val fmt = FormatQueries.avroFormat
    assert(fmt.isDefined, "no Avro support found — f9 cannot run")
    info(s"avro format resolved as: ${fmt.get}")
    // value-exact certification against the unconverted original
    import org.apache.spark.sql.functions._
    val got = FormatQueries.f9.fn(spark, GraftTestSpark.sf)
      .collect().map(_.toString).sorted.toSeq
    val want = graft.core.Tables.load(spark, GraftTestSpark.sf, "part")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("p_retailprice")), 2).as("price_sum"),
        sum(col("p_partkey")).as("key_checksum"),
        sum(col("p_size")).cast("long").as("size_sum"),
        sum(expr(graft.core.PortableHash.spark("p_name"))).as("name_checksum"))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }

  test("scala UDF surface works (builtins remain preferred in hot paths)") {
    import org.apache.spark.sql.functions._
    val up = udf((s: String) => if (s == null) null else s.toUpperCase)
    spark.udf.register("graft_upper", up)
    val got = Tables.load(spark, GraftTestSpark.sf, "nation")
      .select(up(col("n_name")).as("a"), upper(col("n_name")).as("b"),
        expr("graft_upper(n_name)").as("c"))
      .collect()
    assert(got.forall(r => r.getString(0) == r.getString(1) && r.getString(1) == r.getString(2)))
  }
}
