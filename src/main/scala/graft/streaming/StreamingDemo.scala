package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable streaming-analytics example over the synthetic `events` table:
  * file-streams the parquet under Trigger.AvailableNow through watermarked
  * tumbling windows and session windows, writing to parquet sinks.
  *
  *   sbt "runMain graft.streaming.StreamingDemo [sfDir]"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = Files.createTempDirectory("graft_stream_demo").toString
    // stage the single parquet file as a streaming source directory
    Files.createDirectories(Paths.get(s"$tmp/src"))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$tmp/src/events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // streaming read needs an explicit schema; ts arrives as nanos (long)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$tmp/src").schema
    val raw = spark.readStream.schema(rawSchema).parquet(s"$tmp/src")
    // ts arrives as nanos (long) in legacy corpora, micros timestamp in
    // current ones — shim only the long variant (the Tables.events rule)
    val stream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }

    val q1 = EventStreams.tumblingCounts(stream, "1 hour", "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/cp_tumbling")
      .option("path", s"$tmp/out_tumbling")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q1.awaitTermination()
    val tumbling = spark.read.parquet(s"$tmp/out_tumbling")
    println(s"[stream-demo] tumbling windows closed: ${tumbling.count()}")
    tumbling.orderBy("window_start", "event_type").show(6, truncate = false)

    val q2 = EventStreams.sessionCounts(stream, "10 minutes", "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/cp_session")
      .option("path", s"$tmp/out_session")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q2.awaitTermination()
    val sessions = spark.read.parquet(s"$tmp/out_session")
    println(s"[stream-demo] sessions closed: ${sessions.count()}")

    import spark.implicits._
    val typed = stream.as[EventStreams.Event]
    val q3 = EventStreams.sessionizeWithState(typed, gapMinutes = 10, watermark = "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/cp_fmgs")
      .option("path", s"$tmp/out_fmgs")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q3.awaitTermination()
    val custom = spark.read.parquet(s"$tmp/out_fmgs")
    println(s"[stream-demo] stateful sessions (flatMapGroupsWithState): ${custom.count()}")

    // stream-stream join: clicks to same-user purchases within 30 minutes
    EventStreams.useRocksDbStateStore(spark)
    val q4 = EventStreams.clickPurchaseJoin(
        stream.filter(col("event_type") === "click"),
        stream.filter(col("event_type") === "purchase"), 30, "1 hour")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/cp_ssj")
      .option("path", s"$tmp/out_ssj")
      .trigger(Trigger.AvailableNow()).format("parquet").start()
    q4.awaitTermination()
    println(s"[stream-demo] click→purchase joins (RocksDB state): " +
      spark.read.parquet(s"$tmp/out_ssj").count())
    spark.stop()
  }
}
