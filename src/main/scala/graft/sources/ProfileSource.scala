package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-profiles`: a custom DataSource V2 micro-batch streaming source —
  * the PROD-SHAPE Spark-native form of the reference's HTTP profile puller
  * (SURVEY R1, kafka-streamer.py:13-33: GET randomuser.me -> flatten ->
  * JSON). The reference keeps the producer external; this source shows the
  * same feed as a first-class `readStream.format("graft-profiles")`
  * connector built purely on the public connector API (TableProvider /
  * MicroBatchStream / PartitionReader — no Spark internals).
  *
  * Emitted rows are wire-format JSON strings (one `value STRING` column,
  * exactly what `CAST(value AS STRING)` yields on the Kafka path), so the
  * stream plugs straight into [[graft.streaming.UserIngestPipeline.parse]].
  * The generator is deterministic in the record index — no network, no
  * clock, no RNG — and reproduces the upstream's data quirks on a fixed
  * cadence: every 7th record has an alphanumeric (UK-style) postcode
  * (SURVEY §1.2 defect 1), every 31st is a torn/non-JSON payload
  * (exercising the PERMISSIVE corrupt-record side channel, SURVEY §2.3).
  *
  * Options:
  *   - `rowsPerBatch` (default 10): offset advance per trigger;
  *   - `maxRecords` (default 100): total emission bound — the Spark-native
  *     form of the reference's 30s-burst-then-exit loop (R5): once reached,
  *     `latestOffset` stops advancing and `processAllAvailable`/
  *     `Trigger.AvailableNow` drain and stop;
  *   - `numPartitions` (default 2): reader parallelism per batch.
  *
  * Scale: offsets are a single monotonically increasing count, planning
  * splits each batch range evenly across `numPartitions` readers, and
  * record synthesis is pure CPU per index — the source itself holds no
  * state beyond the restart-recoverable offset, so it scales exactly like
  * the built-in rate source.
  */
object ProfileSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))

  private val FirstNames = Array("Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Leslie", "Margaret")
  private val LastNames = Array("Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth", "Lamport", "Hamilton")
  private val Streets = Array("Main St", "High St", "Station Rd", "Church Ln", "Park Ave")
  private val Cities = Array("Springfield", "Riverton", "Lakeside", "Hillview")

  /** Deterministic wire record for global index i. */
  def recordJson(i: Long): String = {
    if (i % 31 == 17) return s"""torn-payload-$i{""" // poison pill, not JSON
    val first = FirstNames((i % FirstNames.length).toInt)
    val last = LastNames(((i / FirstNames.length) % LastNames.length).toInt)
    val gender = if (i % 2 == 0) "female" else "male"
    val street = Streets((i % Streets.length).toInt)
    val city = Cities((i % Cities.length).toInt)
    val postcode =
      if (i % 7 == 3) s"EC${i % 9}A ${1 + i % 9}BB" // alphanumeric: numeric cast policy must null it
      else (10000 + i % 90000).toString
    s"""{"full_name": "$first $last", "gender": "$gender", """ +
      s""""address": "${100 + i % 900} $street, $city", "postcode": "$postcode", """ +
      s""""email": "${first.toLowerCase}.${last.toLowerCase}.$i@example.com", """ +
      s""""phone": "555-${1000 + i % 9000}"}"""
  }
}

class ProfileSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-profiles"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ProfileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new ProfileTable
}

class ProfileTable extends Table with SupportsRead {
  override def name(): String = "graft-profiles"
  override def schema(): StructType = ProfileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ProfileSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ProfileMicroBatchStream(
          rowsPerBatch = options.getLong("rowsPerBatch", 10L),
          maxRecords = options.getLong("maxRecords", 100L),
          numPartitions = options.getInt("numPartitions", 2))
    }
}

/** Offset = count of records emitted so far (exclusive upper index). */
case class ProfileOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class ProfileMicroBatchStream(rowsPerBatch: Long, maxRecords: Long, numPartitions: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = ProfileOffset(0L)

  // Legacy no-arg form: PURE — "everything this bounded source will ever
  // have". An engine path without admission control reads the cap in one
  // batch; the rowsPerBatch cadence lives only in the stateless
  // latestOffset(start, limit) overload below (the path the engine actually
  // uses, since this source implements SupportsTriggerAvailableNow). A
  // stateful implementation here would skip records if ever called twice in
  // a batch.
  override def latestOffset(): Offset = ProfileOffset(maxRecords)

  // --- admission control (SupportsTriggerAvailableNow) -------------------
  // Trigger.AvailableNow snapshots "everything available" at start and then
  // drains it in rowsPerBatch steps — the exact Spark-native form of the
  // reference's bounded burst loop (R5), now first-class on this source.

  override def prepareForTriggerAvailableNow(): Unit = () // cap is already static

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val base = start.asInstanceOf[ProfileOffset].n
    val step = limit match {
      case r: ReadMaxRows => math.min(rowsPerBatch, r.maxRows())
      case _ => rowsPerBatch
    }
    ProfileOffset(math.min(base + step, maxRecords))
  }

  override def reportLatestOffset(): Offset = ProfileOffset(maxRecords)

  override def deserializeOffset(json: String): Offset = ProfileOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ProfileOffset].n
    val hi = end.asInstanceOf[ProfileOffset].n
    val total = hi - lo
    if (total <= 0) return Array.empty
    val per = math.max(1L, (total + numPartitions - 1) / numPartitions)
    (lo until hi by per).map(s => ProfileRange(s, math.min(s + per, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val r = partition.asInstanceOf[ProfileRange]
      new PartitionReader[InternalRow] {
        private var i = r.from - 1
        override def next(): Boolean = { i += 1; i < r.until }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(ProfileSource.recordJson(i)))
        override def close(): Unit = ()
      }
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ProfileRange(from: Long, until: Long) extends InputPartition
