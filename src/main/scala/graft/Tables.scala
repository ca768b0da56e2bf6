package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet through
  * here, so filter/column pushdown applies at the scan (verified via
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Run `body` with runtime conf `key` set to `value`, restoring the
    * caller's prior value (or unsetting) after — parquet schema inference
    * resolves eagerly inside `spark.read.parquet(...)`, so the override
    * never has to outlive the call, and unrelated reads in the same
    * session keep their own settings (ADVICE r8: no session-global
    * side effects from a table load). */
  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prior match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  def table(name: String): DataFrame = {
    // The driver's generator writes timestamps with isAdjustedToUTC=false;
    // Spark 4 would infer those as TIMESTAMP_NTZ, which half the timestamp
    // function surface (unix_millis, to_utc_timestamp, …) rejects. Read them
    // as session-TZ timestamps instead (session is pinned UTC everywhere, so
    // wall-clock values are identical) — same runtime-conf pattern as the
    // nanosAsLong shim below. Verify re-emits NTZ at the output boundary so
    // the dumped parquet stays repr-identical with DuckDB's naive reads.
    //
    // Schema inference is DRIVER work repeated per load (~93 ms vs ~8 ms
    // with the schema provided — measured, guide §5): memoize the
    // inferred StructType per (path, length, mtime) so every later load
    // of the same immutable file skips the footer-inference pass. The
    // type produced is identical by construction (the memo stores exactly
    // what inference produced under the same confs), so plans, pushdown
    // and results are unchanged.
    val path = s"$dir/$name.parquet"
    val f = new java.io.File(path)
    val key = (path, f.length(), f.lastModified())
    val cached = Tables.schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else withConf("spark.sql.parquet.inferTimestampNTZ.enabled", "false") {
      val df = spark.read.parquet(path)
      Tables.schemaCache.put(key, df.schema)
      df
    }
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long and truncate to microseconds with
    * integral division (`div`, not `/` — double division would lose
    * precision above 2^53 ns), matching DuckDB's ns→µs truncation.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw // file already carries µs timestamps — nothing to convert
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Inferred parquet schema per (path, length, mtime) — the input files
    * are immutable per driver contract, and the (length, mtime) key
    * invalidates on any rewrite. JVM-global: a 400-query bench session
    * pays schema inference once per table, not once per load. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()
}
