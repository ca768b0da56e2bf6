package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name substrings (dev loop)
    val nameFilter: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(","); n => pats.exists(n.contains) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Output boundary: the oracle (DuckDB) reads the driver's NTZ-flavored
    // testdata as naive timestamps, so any TIMESTAMP column we emit must be
    // written NTZ too or the gate's repr compare sees "+00:00" vs naive.
    // Internally everything computes in session-TZ timestamps (UTC — see
    // Tables.table); the cast here is wall-clock-identity under UTC.
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, StructField}
    def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def swap(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = dt match {
        case TimestampType => TimestampNTZType
        case org.apache.spark.sql.types.StructType(fs) =>
          org.apache.spark.sql.types.StructType(fs.map(f => f.copy(dataType = swap(f.dataType))))
        case org.apache.spark.sql.types.ArrayType(et, n) =>
          org.apache.spark.sql.types.ArrayType(swap(et), n)
        case org.apache.spark.sql.types.MapType(k, v, n) =>
          org.apache.spark.sql.types.MapType(swap(k), swap(v), n)
        case other => other
      }
      df.schema.fields.foldLeft(df) { case (d, StructField(n, dt, _, _)) =>
        val t = swap(dt)
        if (t == dt) d
        else d.withColumn(n, org.apache.spark.sql.functions.col(n).cast(t))
      }
    }
    SparkEntry.queries.filter(kv => nameFilter(kv._1)).foreach { case (name, fn) =>
      try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => nameFilter(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
