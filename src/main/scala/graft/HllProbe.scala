package graft
import org.apache.spark.sql.SparkSession
object HllProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (n <- Seq(100, 1000, 5000, 50000)) {
      val df = (0 until n * 3).map(i => (i % 30, (i % n).toLong))
        .toDF("part", "uid").repartition(8).cache()
      df.count(): Unit
      val direct = df.agg(hll_sketch_estimate(hll_sketch_agg($"uid"))).head.getLong(0)
      val parts = df.groupBy($"part").agg(hll_sketch_agg($"uid").as("sk"))
      val unioned = parts.agg(hll_sketch_estimate(hll_union_agg($"sk"))).head.getLong(0)
      val direct1 = df.coalesce(1).agg(hll_sketch_estimate(hll_sketch_agg($"uid"))).head.getLong(0)
      println(s"n=$n direct=$direct direct1part=$direct1 unionOfParts=$unioned")
    }
    spark.stop()
  }
}
