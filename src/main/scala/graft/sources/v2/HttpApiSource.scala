package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.PaginatedHttpSource.Transport

/** DataSource V2 face of the reference's HTTP API scan (S1/S2,
  * `src/kafka_client/kafka_stream_data.py:48-75` + `constants.py:12`):
  *
  *   spark.read.format("graft.sources.v2.HttpApiSource")
  *     .schema(...)
  *     .option("transport", <registry name>)
  *     .option("limit", "100").option("maxOffset", "10000")
  *     .load()
  *     .filter($"date_de_publication" > "2024-01-05")   // PUSHED to the API
  *
  * What it adds over the driver-side `PaginatedHttpSource`:
  *  - the `date_de_publication > ts` predicate is absorbed by
  *    `SupportsPushDownFilters` and becomes the remote `where` parameter —
  *    Catalyst removes the residual filter from the plan (S2 as true
  *    source pushdown, not a fetch argument);
  *  - offset windows become `InputPartition`s, so pages are fetched IN
  *    PARALLEL by executors (the reference pages sequentially).
  *
  * Scope note: the offset-cap restart + watermark advance (S3/S4) are
  * driver-side incremental-state concerns and stay in
  * `PaginatedHttpSource`; this scan covers the steady-state read. The
  * transport registry is process-local (fine under local[*] and tests); a
  * cluster deployment would construct the HTTP transport from options
  * (URL template) instead.
  */
class HttpApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.pipeline.RappelConso.schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpApiTable(schema, properties.asScala.toMap)
}

object TransportRegistry {
  private val reg = new java.util.concurrent.ConcurrentHashMap[String, Transport]()
  def register(name: String, t: Transport): Unit = reg.put(name, t)
  def get(name: String): Transport =
    Option(reg.get(name)).getOrElse(sys.error(s"no transport registered as '$name'"))
}

class HttpApiTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft_http_api"
  override def schema(): StructType = schema_
  private val schema_ = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpApiScanBuilder(schema, props ++ options.asScala)
}

class HttpApiScanBuilder(schema: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {

  private val dateCol = opts.getOrElse("dateColumn", "date_de_publication")
  private var where: String = opts.getOrElse("initialWhere", "0001-01-01")
  private var pushed: Array[Filter] = Array.empty

  /** Absorb `dateCol > literal` (the API's native predicate); everything
    * else is residual for Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (mine, residual) = filters.partition {
      case GreaterThan(c, v: String) if c == dateCol => true
      case _ => false
    }
    mine.foreach {
      case GreaterThan(_, v: String) => if (v > where) where = v
      case _ => () // partition above only admits GreaterThan(dateCol, String)
    }
    pushed = mine
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = HttpApiScan(schema,
    opts.getOrElse("transport", sys.error("option 'transport' is required")),
    where,
    opts.getOrElse("limit", "100").toInt,
    opts.getOrElse("maxOffset", "10000").toInt)
}

case class HttpPagePartition(offset: Int) extends InputPartition

case class HttpApiScan(schema: StructType, transportName: String,
                       where: String, limit: Int, maxOffset: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"HttpApiScan(transport=$transportName, pushed where $where, limit=$limit)"
  override def planInputPartitions(): Array[InputPartition] =
    (0 until maxOffset / limit).map(i => HttpPagePartition(i * limit)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new HttpPageReaderFactory(schema, transportName, where, limit)
}

class HttpPageReaderFactory(schema: StructType, transportName: String,
                            where: String, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val offset = partition.asInstanceOf[HttpPagePartition].offset
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[Map[String, String]] =
        TransportRegistry.get(transportName)(where, offset, limit).iterator
      private var current: Map[String, String] = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(schema.fields.map(f =>
          current.get(f.name).map(UTF8String.fromString).orNull: Any))
      override def close(): Unit = ()
    }
  }
}
