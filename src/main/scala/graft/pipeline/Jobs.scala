package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.operators.Relational
import graft.sources.{JdbcIO, KafkaIO, PaginatedHttpSource}
import graft.streaming.EventStreams

/** The reference's two jobs as library entry points (EP1/EP2, SURVEY §3),
  * each CLI-invokable and sink-pluggable.
  */
object Jobs {

  /** EP1 (producer): incremental fetch since watermark → 31→25-col
    * transform → last-wins dedup (done inside the source read) → sink.
    * Sink is either a Kafka topic (reference parity) or a parquet/JSON dir
    * (broker-less environments and tests).
    */
  def producer(spark: SparkSession, transport: PaginatedHttpSource.Transport,
               watermarkPath: String, sinkDir: Option[String],
               kafkaServers: Option[String] = None): DataFrame = {
    val raw = PaginatedHttpSource.read(spark, transport, watermarkPath)
    val transformed = RappelConso.transform(raw)
    kafkaServers.foreach(s => KafkaIO.write(transformed, s))
    sinkDir.foreach(d => KafkaIO.toJsonValue(transformed)
      .write.mode("append").text(d))
    transformed
  }

  /** EP2 (ingest): streaming JSON-line source (Kafka in production, file
    * dir here — same value format) → P1–P3 parse → J1 anti-join → W1
    * append, under Trigger.AvailableNow. Returns the query for
    * awaitTermination.
    */
  def ingest(spark: SparkSession, srcDir: String, sinkDir: String,
             checkpointDir: String): StreamingQuery = {
    val lines = spark.readStream.text(srcDir)
    val parsed = KafkaIO.parseJsonValue(
      lines.select(col("value").cast("string").as("value")), RappelConso.schema)
    EventStreams.idempotentParquetSink(parsed, sinkDir, "reference_fiche", checkpointDir)
  }

  /** EP1+EP2 over the DSv2 HTTP source: the watermark predicate is PUSHED
    * into the source (reaching the remote transport's `where` parameter,
    * S2 as true source pushdown) → last-wins dedup in fetch order (A1;
    * pagination restarts re-fetch rows) → 31→25-col transform → key-pruned
    * anti-join against the JDBC sink → append (J1/J2/W1), then the
    * watermark advances (S4). Returns the appended rows.
    *
    * The fetched frame is persisted so the watermark aggregate and the
    * append materialize ONE fetch (a lazy plan would re-drive the page
    * loop per action).
    */
  def ingestV2(spark: SparkSession, transportName: String, rawSchema: StructType,
               watermarkPath: String, url: String, table: String,
               properties: Properties, limit: Int = 100,
               maxOffset: Int = 10000): DataFrame = {
    val wm = PaginatedHttpSource.readWatermark(watermarkPath)
    val raw = spark.read.format("graft.sources.v2.HttpApiSource")
      .schema(rawSchema)
      .option("transport", transportName)
      .option("limit", limit.toString).option("maxOffset", maxOffset.toString)
      .load()
      .filter(col("date_de_publication") > lit(wm))
      // pages are planned as input partitions in fetch order, so the
      // partition-major id reproduces the reference's positional last-wins
      .withColumn("_seq", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deduped = Relational.lastWinsByKey(raw, Seq("reference_fiche"), col("_seq"))
        .drop("_seq")
      val transformed = RappelConso.transform(deduped)
      val existing = JdbcIO
        .readKeys(spark, url, table, "reference_fiche", properties)
        .toDF("reference_fiche")
      // localCheckpoint (eager) CUTS the lineage before the append: the
      // anti-join read the JDBC table pre-append, so any later
      // re-materialization of the returned frame (cache eviction, caller
      // action) would re-run it against the post-append table and silently
      // return empty. The checkpointed blocks are the frame.
      val fresh = Relational.idempotentAppend(transformed, existing, "reference_fiche")
        .localCheckpoint(true)
      JdbcIO.append(fresh, url, table, properties)
      val maxDate = deduped.agg(max(col("date_de_publication"))).head().getString(0)
      Option(maxDate).foreach(PaginatedHttpSource.writeWatermark(watermarkPath, _))
      fresh
    } finally raw.unpersist(blocking = false)
  }
}
