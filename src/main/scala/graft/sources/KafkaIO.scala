package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka source/sink wrappers (reference K1/K2/P1–P3,
  * `src/kafka_client/kafka_stream_data.py:101-125`,
  * `src/spark_pgsql/spark_streaming.py:38-63`).
  *
  * The CI container has no broker AND no spark-sql-kafka connector jar;
  * these are exercised through the same parse/serialize columns by the
  * file-backed jobs and specs (the `format("kafka")` calls are the only
  * untested lines — identical call shape to the reference's). Deployments
  * must ship `spark-sql-kafka-0-10` on the classpath.
  */
object KafkaIO {

  val topic = "rappel_conso" // one constant — the reference drifts between
                             // rappel_conso (code) and rappel-conso (README)

  /** K2: streaming Kafka source (standard 7-column frame). */
  def readStream(spark: SparkSession, servers: String, topicName: String = topic,
                 startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topicName)
      .option("startingOffsets", startingOffsets)
      .load()

  /** P1–P3: value bytes → string → from_json(schema) → flattened columns. */
  def parseJsonValue(kafkaFrame: DataFrame, schema: StructType): DataFrame =
    kafkaFrame.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), schema).as("data"))
      .select(col("data.*"))

  /** K1's wire format: one JSON object per row in `value`. */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** K1: batch write to a Kafka topic. */
  def write(df: DataFrame, servers: String, topicName: String = topic): Unit =
    toJsonValue(df).write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topicName)
      .save()
}
