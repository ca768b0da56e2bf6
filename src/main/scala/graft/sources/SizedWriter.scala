package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-file sizing — the small-files control every 100 TB table needs.
  *
  * A shuffle with N partitions writes N files per partition-dir; left at
  * the shuffle default, a daily job writes thousands of KB-sized files
  * and the NameNode/object-store listing becomes the bottleneck, while
  * one giant file serializes downstream scans. This writer repartitions
  * to `ceil(rows / rowsPerFile)` before the write — the row count comes
  * from the sampled estimate when provided, else one counting pass
  * (cheap: count() reads only parquet footers on a parquet-backed frame).
  */
object SizedWriter {

  /** Repartition so each output file carries ~`rowsPerFile` rows.
    * `knownRows` skips the counting job when the caller already knows
    * (e.g. from an upstream aggregate or a metadata estimate). */
  def sized(df: DataFrame, rowsPerFile: Long, knownRows: Option[Long] = None): DataFrame = {
    val rows = knownRows.getOrElse(df.count())
    val files = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(files)
  }

  /** Same, but keep rows of equal `key` values together (range-clustered
    * files: co-locates keys AND bounds file count). */
  def sizedByRange(df: DataFrame, rowsPerFile: Long, key: Column,
                   knownRows: Option[Long] = None): DataFrame = {
    val rows = knownRows.getOrElse(df.count())
    val files = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartitionByRange(files, key)
  }
}
