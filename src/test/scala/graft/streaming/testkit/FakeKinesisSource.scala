package graft.streaming.testkit

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Test-only micro-batch source registered (test classpath only, via
  * META-INF/services) under the REAL `spark-sql-kinesis` short name
  * `aws-kinesis`, emitting the connector's column shape:
  * (data: binary, streamName, partitionKey, sequenceNumber,
  * approximateArrivalTimestamp: timestamp).
  *
  * Purpose: the production jar cannot run in this sandbox, but
  * [[graft.streaming.StreamSources.recordStream]]'s `Kinesis` branch — the
  * reshape to engine record columns, the ARN reconstruction from
  * region/account options, and the timestamp→epoch-seconds conversion —
  * is real code that deserves a spec. Registering this fake under the same
  * format name lets the spec execute that branch verbatim, no production
  * code paths forked for testing.
  */
object FakeKinesisSource {
  final case class Rec(
      data: Array[Byte],
      streamName: String,
      partitionKey: String,
      sequenceNumber: String,
      approximateArrivalTimestampSec: Long)

  /** Set by the spec before starting the query; one micro-batch total. */
  @volatile var records: Seq[Rec] = Nil

  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))
}

class FakeKinesisSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "aws-kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKinesisSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new FakeKinesisTable
}

class FakeKinesisTable extends Table with SupportsRead {
  override def name(): String = "fake-aws-kinesis"
  override def schema(): StructType = FakeKinesisSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeKinesisSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream = new FakeKinesisStream
      }
    }
}

final case class FakeOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final case class FakeKinesisPartition(recs: Seq[FakeKinesisSource.Rec])
  extends InputPartition

class FakeKinesisStream extends MicroBatchStream {
  override def initialOffset(): Offset = FakeOffset(0)
  override def latestOffset(): Offset =
    FakeOffset(FakeKinesisSource.records.size.toLong)
  override def deserializeOffset(json: String): Offset =
    FakeOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[FakeOffset].n.toInt
    val e = end.asInstanceOf[FakeOffset].n.toInt
    if (e > s) Array(FakeKinesisPartition(FakeKinesisSource.records.slice(s, e)))
    else Array.empty
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = {
        val it = partition.asInstanceOf[FakeKinesisPartition].recs.iterator
        new PartitionReader[InternalRow] {
          private var cur: FakeKinesisSource.Rec = _
          override def next(): Boolean =
            if (it.hasNext) { cur = it.next(); true } else false
          override def get(): InternalRow = InternalRow(
            cur.data,
            UTF8String.fromString(cur.streamName),
            UTF8String.fromString(cur.partitionKey),
            UTF8String.fromString(cur.sequenceNumber),
            cur.approximateArrivalTimestampSec * 1000000L)
          override def close(): Unit = ()
        }
      }
    }
}
