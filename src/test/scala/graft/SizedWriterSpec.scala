package graft

import org.apache.spark.sql.functions._
import graft.sources.SizedWriter

class SizedWriterSpec extends SparkSpec {
  import spark.implicits._

  test("sized write produces ceil(rows/rowsPerFile) files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sized").toString
    val df = spark.range(0, 10000).toDF("id").repartition(32) // worst-case input: 32 tiny parts
    SizedWriter.sized(df, rowsPerFile = 2500).write.mode("overwrite").parquet(s"$dir/out")
    val files = spark.read.parquet(s"$dir/out").select(input_file_name()).distinct().count()
    assert(files == 4, s"expected 4 files, got $files")
    assert(spark.read.parquet(s"$dir/out").count() == 10000)
  }

  test("sizedByRange keeps key ranges disjoint across files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sizedr").toString
    val df = spark.range(0, 8000).toDF("id").repartition(16)
    SizedWriter.sizedByRange(df, rowsPerFile = 2000, key = $"id")
      .write.mode("overwrite").parquet(s"$dir/out")
    val ranges = spark.read.parquet(s"$dir/out")
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "file key ranges overlap")
      case _ => ()
    }
  }
}
