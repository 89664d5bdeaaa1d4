package graft.sources.msggen

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source generating a deterministic envelope
  * stream with planted duplicates — the soak/bench analog of the
  * reference's Pulsar consumer, usable without any external system:
  *
  * {{{
  * spark.read.format("graft-msggen")
  *   .option("rows", 100000).option("dupEvery", 3)
  *   .option("partitions", 32).load()
  * }}}
  *
  * Every `dupEvery`-th row replays the payload/properties of an earlier
  * row with a later event time (a replica within the dedup window), so
  * `Envelope.firstOccurrence`/`Dedup` over this source have known
  * expected cardinalities. Generation is pure function of (row id),
  * so any subset of partitions reproduces identically — the property
  * that makes the source safe under task retries at cluster scale.
  */
class MsgGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-msggen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MsgGen.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives the CASE-SENSITIVE user options — normalize
    // (option("dupEvery", …) must match regardless of casing).
    val opts = new CaseInsensitiveStringMap(properties)
    new MsgGenTable(
      opts.getOrDefault("rows", "1000").toLong,
      opts.getOrDefault("dupevery", "3").toInt,
      opts.getOrDefault("partitions", "4").toInt)
  }
}

object MsgGen {
  val Schema: StructType = StructType(Seq(
    StructField("payload", BinaryType, nullable = false),
    StructField("properties", MapType(StringType, StringType), nullable = false),
    StructField("event_ts", TimestampType, nullable = false),
    StructField("topic", StringType, nullable = false)))

  val BaseUs: Long = 1704067200000000L // 2024-01-01T00:00:00Z

  /** Deterministic row: id → envelope. A duplicate row replays the
    * content of (id - id % dupEvery) with its own (later) timestamp. */
  def row(id: Long, dupEvery: Int): InternalRow = {
    val contentId = if (dupEvery > 1 && id % dupEvery != 0) id - (id % dupEvery) else id
    val payload = s"msg-$contentId".getBytes("UTF-8")
    val props = ArrayBasedMapData(
      Array[Any](UTF8String.fromString("k")),
      Array[Any](UTF8String.fromString((contentId % 100).toString)))
    InternalRow(payload, props, BaseUs + id * 1000000L,
      UTF8String.fromString("msggen"))
  }
}

class MsgGenTable(rows: Long, dupEvery: Int, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"msggen($rows rows)"
  override def schema(): StructType = MsgGen.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = MsgGen.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1L, (rows + partitions - 1) / partitions)
        (0L until rows by per)
          .map(start => MsgGenPartition(start, math.min(start + per, rows), dupEvery))
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val p = partition.asInstanceOf[MsgGenPartition]
          new PartitionReader[InternalRow] {
            private var id = p.start - 1
            override def next(): Boolean = { id += 1; id < p.end }
            override def get(): InternalRow = MsgGen.row(id, p.dupEvery)
            override def close(): Unit = ()
          }
        }
    }
}

case class MsgGenPartition(start: Long, end: Long, dupEvery: Int) extends InputPartition
