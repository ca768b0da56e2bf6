package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.ManifestTable

/** METADATA TABLES — the lakehouse's inspection surface as plain SQL
  * (the Iceberg `db.t.files` idiom):
  *
  * {{{
  *   SELECT * FROM graft.db.t.files      -- per manifest entry: seq, kind, path, stats/bloom cols
  *   SELECT * FROM graft.db.t.history    -- per version: entry counts by kind + publish instant
  *   SELECT * FROM graft.db.t.branches   -- per branch: fork and head versions
  * }}}
  *
  * All three are manifest-only (zero data IO, driver-side string work) —
  * "why didn't my point read skip?", "is compaction due?", "what forks
  * exist?" answered without a library import. Served as a [[LocalScan]]:
  * the row set is metadata-sized by construction. */
object GraftMetadataTable {
  val Kinds: Set[String] = Set("files", "history", "branches")
}

class GraftMetadataTable(parentDir: String, ident: String, kind: String)
    extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = ident
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def schema(): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("seq", IntegerType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("path", StringType, nullable = false),
      StructField("stats_cols", StringType, nullable = false),
      StructField("bloom_cols", StringType, nullable = false)))
    case "history" => StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("publish_millis", LongType, nullable = false),
      StructField("n_entries", IntegerType, nullable = false),
      StructField("n_data_files", IntegerType, nullable = false),
      StructField("n_eq_deletes", IntegerType, nullable = false),
      StructField("n_pos_deletes", IntegerType, nullable = false)))
    case "branches" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("fork_version", IntegerType, nullable = false),
      StructField("head_version", IntegerType, nullable = false)))
    case other => sys.error(s"unknown metadata table kind '$other'")
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val out = schema()
        val data: Seq[org.apache.spark.sql.Row] = kind match {
          case "files" =>
            ManifestTable.filesTable(spark, parentDir).collect().toSeq
          case "history" =>
            val instants = ManifestTable.versionTimestamps(parentDir).toMap
            ManifestTable.historyTable(spark, parentDir).collect().toSeq
              .map { r =>
                org.apache.spark.sql.Row(r.getInt(0),
                  instants.getOrElse(r.getInt(0), 0L), r.getInt(1),
                  r.getInt(2), r.getInt(3), r.getInt(4))
              }
          case "branches" =>
            ManifestTable.listBranches(parentDir).map { case (n, fork, head) =>
              org.apache.spark.sql.Row(n, fork, head)
            }
        }
        val conv = CatalystTypeConverters.createToCatalystConverter(out)
        val internal = data.map(r => conv(r).asInstanceOf[InternalRow]).toArray
        new LocalScan {
          override def rows(): Array[InternalRow] = internal
          override def readSchema(): StructType = out
          override def description(): String = s"graft metadata $ident"
        }
      }
    }
}
