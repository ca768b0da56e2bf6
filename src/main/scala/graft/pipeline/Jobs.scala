package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.{KafkaIO, PaginatedHttpSource}
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
}
