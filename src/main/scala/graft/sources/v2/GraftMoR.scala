package graft.sources.v2

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.sources.ManifestTable

/** MERGE-ON-READ through the SQL face (Iceberg's equality-delete read
  * path, re-expressed over Spark's own DSv2 parquet machinery): a
  * snapshot carrying equality-delete entries is served by grouping its
  * data files by WHICH delete commits apply (a delete at sequence d
  * erases matching keys only from data with seq < d, so the groups are
  * contiguous in sequence and there are at most |delete commits|+1 of
  * them), planning one stock parquet batch per group — file pruning,
  * pushed filters, column pruning all intact — and filtering each
  * group's rows against ITS applicable delete-key sets in the partition
  * reader. The key sets are loaded once on the driver (delete files are
  * key-only and orders of magnitude smaller than data; a loud cap
  * refuses pathological sets with a pointer to compact()) and shipped to
  * executors via a torrent broadcast, so a 1000-executor scan fetches
  * each set once, not once per task.
  *
  * Null semantics match the library read path ([[ManifestTable.read]]'s
  * left-anti join): a NULL key value never matches a delete — the row
  * survives — and NULL delete keys erase nothing.
  */
/** One delete specification applicable to a group: the (possibly
  * composite) key columns' positions/kinds in the group's read schema and
  * the deleted key tuples (each row = one composite key, scalar = one
  * element). */
private[v2] final case class MoRDeleteSet(
    keyIdxs: Array[Int],
    keyKinds: Array[Int],          // 0=long 1=int 2=double 3=string 4=boolean
    keyRows: Array[Array[Any]])

private[v2] final case class MoRGroupSpec(
    deleteSets: Array[MoRDeleteSet],
    projection: Array[Int],       // read-schema position of each OUTPUT column
    readTypes: Array[DataType],
    readNullable: Array[Boolean]) {
  def identityProjection: Boolean =
    projection.length == readTypes.length &&
      projection.zipWithIndex.forall { case (p, i) => p == i }
  def hasKeys: Boolean = deleteSets.nonEmpty
}

/** `posPath`: set when this partition is ONE position-deleted file read
  * whole in range order — the reader then counts ordinals against the
  * file's deleted positions before any key filtering. */
private[v2] final case class MoRInputPartition(group: Int,
                                               inner: InputPartition,
                                               posPath: Option[String] = None)
    extends InputPartition

private[v2] final class MoRReaderFactory(
    innerFactories: Array[PartitionReaderFactory],
    touchedFactories: Array[PartitionReaderFactory],
    specs: Broadcast[Array[MoRGroupSpec]],
    posDeletes: Broadcast[Map[String, Array[Long]]])
    extends PartitionReaderFactory {

  // row-based on purpose — twice over: the delete filters need per-row
  // key/ordinal handling, and Spark forbids mixing columnar and
  // row-based partitions within one scan, so even delete-free groups
  // read rows (the inner parquet reader still decodes pages vectorized
  // internally)
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MoRInputPartition]
    val base = p.posPath match {
      case None => innerFactories(p.group).createReader(p.inner)
      // ordinal filter FIRST (it must see every physical row of the
      // file), key filter on whatever survives
      case Some(path) => new PosFilteringReader(
        touchedFactories(p.group).createReader(p.inner),
        posDeletes.value(path))
    }
    val spec = specs.value(p.group)
    if (!spec.hasKeys && spec.identityProjection) base
    else new MoRFilteringReader(base, spec)
  }
}

/** Drops rows whose key value is in an applicable delete set, then
  * projects the group's (possibly widened) read schema down to the scan's
  * declared output. */
private[v2] final class MoRFilteringReader(inner: PartitionReader[InternalRow],
                                           spec: MoRGroupSpec)
    extends PartitionReader[InternalRow] {

  // scalar keys probe a HashSet[Any] directly (no per-row allocation);
  // composite keys probe a HashSet of value vectors
  private val sets: Array[java.util.HashSet[Any]] = spec.deleteSets.map { ds =>
    val s = new java.util.HashSet[Any](math.max(16, ds.keyRows.length * 2))
    ds.keyRows.foreach { r =>
      if (r.forall(_ != null)) {
        val key: Any = if (r.length == 1) r(0) else r.toVector
        s.add(key): Unit
      }
    }
    s
  }

  private val project: InternalRow => InternalRow =
    if (spec.identityProjection) identity
    else {
      val proj = UnsafeProjection.create(spec.projection.toIndexedSeq.map(i =>
        BoundReference(i, spec.readTypes(i), spec.readNullable(i))))
      row => proj(row)
    }

  private var current: InternalRow = _

  private def extract(row: InternalRow, i: Int, kind: Int): Any =
    kind match {
      case 0 => row.getLong(i)
      case 1 => row.getInt(i)
      case 2 => row.getDouble(i)
      case 3 => row.getUTF8String(i).toString
      case 4 => row.getBoolean(i)
    }

  private def deleted(row: InternalRow): Boolean = {
    var j = 0
    while (j < spec.deleteSets.length) {
      val ds = spec.deleteSets(j)
      // a NULL in any key column never matches a delete (the left-anti
      // null-rejecting contract) — skip this set
      var i = 0
      var anyNull = false
      while (i < ds.keyIdxs.length && !anyNull) {
        if (row.isNullAt(ds.keyIdxs(i))) anyNull = true
        i += 1
      }
      if (!anyNull) {
        val key: Any =
          if (ds.keyIdxs.length == 1) extract(row, ds.keyIdxs(0), ds.keyKinds(0))
          else Vector.tabulate(ds.keyIdxs.length)(k =>
            extract(row, ds.keyIdxs(k), ds.keyKinds(k)))
        if (sets(j).contains(key)) return true
      }
      j += 1
    }
    false
  }

  override def next(): Boolean = {
    while (inner.next()) {
      val row = inner.get()
      if (!deleted(row)) { current = project(row); return true }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

// -------------------------------------------------------- position deletes

/** Drops rows whose ORDINAL within the file is position-deleted. Sound
  * because the partition covers the whole file in range order and the
  * inner scan pushed NO filters (row-group skipping or predicate
  * filtering inside the reader would shift ordinals). */
private[v2] final class PosFilteringReader(inner: PartitionReader[InternalRow],
                                           deleted: Array[Long])
    extends PartitionReader[InternalRow] {
  private val dels = new java.util.HashSet[Long](math.max(16, deleted.length * 2))
  deleted.foreach(d => dels.add(d): Unit)
  private var ordinal: Long = -1
  private var current: InternalRow = _
  override def next(): Boolean = {
    while (inner.next()) {
      ordinal += 1
      if (!dels.contains(ordinal)) { current = inner.get(); return true }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}

/** The composite scan serving EVERY delete shape through SQL: one inner
  * parquet batch per equality-delete-scope group (filters pushed, files
  * pruned), plus — for position-deleted files — a per-group UNPUSHED
  * batch whose partitions each cover one whole file in range order, so
  * the ordinal counter sees every physical row (any pushed filter or
  * row-group skip would shift ordinals; the catalog declares every
  * filter residual, so Spark re-applies them above the scan and
  * exactness never depends on the pushdown). A mixed chain — equality
  * deletes AND position deletes on one snapshot, the shape the r10
  * session-2 face still refused — composes as drop-if-either: ordinals
  * are physical file positions (untouched by logical equality deletes),
  * and equality deletes scope by commit sequence exactly as in the
  * delete-free-file case, matching `ManifestTable.assemble`'s library
  * semantics row for row. `dataPaths` backs
  * [[GraftCatalog.scannedFiles]] pruning assertions. */
private[v2] final class GraftMoRScan(spark: SparkSession,
                                     output: StructType,
                                     groupBatches: Seq[Batch],
                                     touchedBatches: Seq[Batch],
                                     groupSpecs: Seq[MoRGroupSpec],
                                     posDeletes: Map[String, Array[Long]],
                                     val dataPaths: Seq[String]) extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = output

  // byte-size estimate from the data files themselves: without it the
  // relation reports the default Long.MaxValue and every join over a
  // merge-on-read snapshot plans sort-merge (no broadcast). Row count is
  // deliberately absent — deletes make it unknowable without IO.
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(dataPaths.map { p =>
          try java.nio.file.Files.size(java.nio.file.Paths.get(p))
          catch { case _: java.io.IOException => 0L }
        }.sum)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  override def description(): String =
    s"GraftMoRScan(${groupBatches.length} delete-scope groups, " +
      s"${posDeletes.size} position-deleted files)"
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      import org.apache.spark.sql.execution.datasources.FilePartition
      val out = Array.newBuilder[InputPartition]
      var idx = 0
      groupBatches.zipWithIndex.foreach { case (b, gi) =>
        b.planInputPartitions().foreach { p =>
          out += MoRInputPartition(gi, p); idx += 1
        }
        // regroup the group's pos-touched ranges: ALL ranges of one file
        // in one partition, ordered by start — the ordinal precondition
        val byFile = touchedBatches(gi).planInputPartitions().flatMap {
          case fp: FilePartition => fp.files
          case other => sys.error(s"GraftMoRScan: unexpected partition $other")
        }.groupBy(f => f.filePath.toPath.toUri.getPath)
        byFile.toSeq.sortBy(_._1).foreach { case (path, ranges) =>
          out += MoRInputPartition(gi,
            FilePartition(idx, ranges.sortBy(_.start)), Some(path))
          idx += 1
        }
      }
      out.result()
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new MoRReaderFactory(
        groupBatches.map(_.createReaderFactory()).toArray,
        touchedBatches.map(_.createReaderFactory()).toArray,
        spark.sparkContext.broadcast(groupSpecs.toArray),
        spark.sparkContext.broadcast(posDeletes))
  }
}

// ---------------------------------------------------------------- delta write

/** SupportsDelta landing path for SQL UPDATE / MERGE INTO / DELETE on a
  * keyed table (TBLPROPERTIES 'write.key'): Spark hands the operation as
  * per-row deltas — delete(rowId) / insert(row) — and the whole mutation
  * commits as ONE manifest version pairing an equality-delete of the
  * touched keys with an append of the replacement rows
  * ([[ManifestTable.publishDeltaExpected]]). Cost is O(|touched rows|)
  * with ZERO target-file rewrites — the asymptotic fix over the
  * group-based ReplaceData path, which rewrites the whole table. Readers
  * serve the result merge-on-read ([[GraftMoRScan]]); compact()
  * materializes it physically when the delete chain grows. */
final case class DeltaStagedMessage(delPath: Option[String],
                                    rowPath: Option[String])
    extends WriterCommitMessage

class GraftDeltaBatchWrite(dir: String, keyCol: String,
                           rowSchema: StructType, idSchema: StructType)
    extends DeltaBatchWrite {
  private val stagingDir = s"$dir/_staging/delta-${java.util.UUID.randomUUID()}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    GraftDeltaWriterFactory(stagingDir, rowSchema, idSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: DeltaStagedMessage => m }
    val dels = msgs.flatMap(_.delPath).toSeq
    val rows = msgs.flatMap(_.rowPath).toSeq
    if (dels.isEmpty && rows.isEmpty) { cleanupStaging(); return } // no-op delta
    // same claim-then-move-then-CAS shape as ManifestBatchWrite.commit
    val v = ManifestTable.currentVersion(dir) + 1
    def move(staged: Seq[String], sub: String): Seq[String] = {
      val dataDir = java.nio.file.Paths.get(dir, "data", s"commit-$v", sub)
      java.nio.file.Files.createDirectories(dataDir)
      staged.sorted.map { p =>
        val t = dataDir.resolve(java.nio.file.Paths.get(p).getFileName)
        java.nio.file.Files.move(java.nio.file.Paths.get(p), t)
        t.toAbsolutePath.toString
      }
    }
    val delFinal = move(dels, "del")
    val rowFinal = move(rows, "rows")
    ManifestTable.publishDeltaExpected(dir, v, keyCol, delFinal, rowFinal): Unit
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

  private def cleanupStaging(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(stagingDir))
  }
}

final case class GraftDeltaWriterFactory(stagingDir: String,
                                         rowSchema: StructType,
                                         idSchema: StructType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, rowSchema, idSchema, partitionId, taskId)
}

/** Per-task delta writer: touched-row ids stream into a key-only parquet
  * file, replacement/new rows into a data parquet file — both lazily, so
  * a task that only deletes stages no row file and vice versa. UPDATE
  * arrives as delete+insert (`representUpdateAsDeleteAndInsert`), so
  * `update` only exists for API completeness. */
class GraftDeltaWriter(stagingDir: String, rowSchema: StructType,
                       idSchema: StructType, partitionId: Int, taskId: Long)
    extends DeltaWriter[InternalRow] {

  private var delWriter: ManifestDataWriter = _
  private var rowWriter: ManifestDataWriter = _
  private def del(): ManifestDataWriter = {
    if (delWriter == null)
      delWriter = new ManifestDataWriter(s"$stagingDir/del", idSchema,
        partitionId, taskId)
    delWriter
  }
  private def rows(): ManifestDataWriter = {
    if (rowWriter == null)
      rowWriter = new ManifestDataWriter(s"$stagingDir/rows", rowSchema,
        partitionId, taskId)
    rowWriter
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    del().write(id)
  override def insert(row: InternalRow): Unit = rows().write(row)
  override def update(metadata: InternalRow, id: InternalRow,
                      row: InternalRow): Unit = {
    delete(metadata, id); insert(row)
  }

  override def commit(): WriterCommitMessage = DeltaStagedMessage(
    Option(delWriter).map(_.commit()).map {
      case StagedFileMessage(p) => p
    },
    Option(rowWriter).map(_.commit()).map {
      case StagedFileMessage(p) => p
    })

  override def abort(): Unit = {
    Option(delWriter).foreach(_.abort())
    Option(rowWriter).foreach(_.abort())
  }
  override def close(): Unit = ()
}
