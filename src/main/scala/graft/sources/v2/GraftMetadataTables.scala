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
  val Kinds: Set[String] = Set("files", "history", "branches", "partitions",
    "tags")
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
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    case "partitions" => StructType(Seq(
      StructField("partition", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      // null when any member file predates row-count stats
      StructField("n_rows", LongType, nullable = true),
      StructField("total_bytes", LongType, nullable = false)))
    case other => sys.error(s"unknown metadata table kind '$other'")
  }

  /** `db.t.partitions` — per-cell file/row/byte counts straight from the
    * manifest's `_ptn_*` stats entries (plus one `stat()` per file for
    * bytes — still zero DATA IO): "is my clustering balanced?", "which
    * day is the fat one?", "did compaction leave stragglers?" answered
    * without opening a footer. A file whose cell stats span values (a
    * pre-declaration straggler) reports as `<transform>=mixed`;
    * unpartitioned tables roll up to one `(table)` row. */
  private def partitionRows(): Seq[org.apache.spark.sql.Row] = {
    val v = ManifestTable.currentVersion(parentDir)
    val datas = if (v < 1) Seq.empty
      else ManifestTable.sqlEntriesAt(parentDir, v).filter(_.isData)
    // declared cells: the SPJ bucket column's manifest tag + every
    // hidden transform's _ptn_ column
    val bucketTag = {
      val p = java.nio.file.Paths.get(parentDir, "_partition.bucket")
      if (!java.nio.file.Files.exists(p)) None
      else Some {
        val c = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          .split('\n').head.trim
        (s"bucket($c)", s"_ptn_bucket_$c")
      }
    }
    val transformTags = ManifestTable.partitionTransforms(parentDir).map {
      case ManifestTable.DaysTransform(src) => (s"days($src)", s"_ptn_days_$src")
      case b: ManifestTable.BucketTransform =>
        (s"md5bucket(${b.n}, ${b.source})", b.ptnCol)
    }
    val tags = (bucketTag.toSeq ++ transformTags)
    def cellOf(stats: Map[String, (Double, Double)]): String =
      if (tags.isEmpty) "(table)"
      else tags.map { case (label, key) =>
        stats.get(key) match {
          case Some((lo, hi)) if lo == hi => s"$label=${lo.toLong}"
          case Some(_)                    => s"$label=mixed"
          case None                       => s"$label=untracked"
        }
      }.mkString(", ")
    datas.groupBy(e => cellOf(e.stats)).toSeq.sortBy(_._1).map {
      case (cell, es) =>
        val rows = es.map(_.stats.get("__rows").map(_._1.toLong))
        val nRows: Any =
          if (rows.forall(_.isDefined)) rows.map(_.get).sum else null
        val bytes = es.map(e => new java.io.File(e.path).length()).sum
        org.apache.spark.sql.Row(cell, es.size, nRows, bytes)
    }
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
          case "partitions" => partitionRows()
          case "tags" =>
            ManifestTable.tags(parentDir).toSeq.sortBy(_._1).map {
              case (n, v) => org.apache.spark.sql.Row(n, v)
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
