package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.ManifestTable

/** A DataSource V2 `TableCatalog` over [[graft.sources.ManifestTable]]
  * warehouses — the SQL face of the lakehouse stack. Register once:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/lake")
  * }}}
  *
  * and every verb is plain SQL, no library imports in query code:
  *
  * {{{
  *   CREATE TABLE graft.db.t (k BIGINT, v STRING)
  *   INSERT INTO graft.db.t SELECT ...          -- manifest commit vN
  *   INSERT OVERWRITE graft.db.t SELECT ...     -- overwrite commit
  *   SELECT * FROM graft.db.t                   -- snapshot-at-analysis read
  *   SELECT * FROM graft.db.t VERSION AS OF 2   -- time travel
  * }}}
  *
  * Reads resolve the manifest ONCE at table-load time (snapshot isolation:
  * a running query never sees a concurrent commit), hand the live file
  * list to Spark's own `ParquetTable`, and keep ALL of its machinery —
  * columnar batch reads, row-group skipping, column pruning, even DSv2
  * aggregate pushdown — by delegating the scan build. On top of that,
  * [[GraftScanBuilder]] intercepts the pushed-down conjuncts and prunes
  * whole FILES against the manifest's per-column min/max stats before the
  * parquet reader ever opens a footer: the q315 file-skipping contract,
  * now reachable from `WHERE` clauses in SQL. At 100 TB this ordering is
  * the whole game — manifest pruning is O(|manifest|) string work on the
  * driver, footer pruning is a round-trip per file.
  *
  * Writes delegate to [[ManifestWriteBuilder]] — the staged-write /
  * atomic-publish commit protocol (and its type envelope:
  * long/int/double/boolean/string) is shared with the batch writer.
  *
  * Honest partiality, enforced loudly: a snapshot carrying row-level
  * DELETE entries or hidden-partition columns needs merge-on-read
  * assembly, which belongs to `ManifestTable.read` — loadTable throws
  * with that pointer rather than serving wrong rows. Compaction purges
  * deletes, after which the SQL face serves the table again.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.error(s"GraftCatalog '$name': set spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def tableDir(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")
  private def isTable(dir: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir, "_manifests")) ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_schema.ddl"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = java.nio.file.Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!java.nio.file.Files.isDirectory(ns)) Array.empty
    else {
      val s = java.nio.file.Files.list(ns)
      try s.iterator().asScala
        .filter(p => isTable(p.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally s.close()
    }
  }

  override def loadTable(ident: Identifier): Table =
    loadAt(ident, -1)
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, try version.toInt catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"GraftCatalog: VERSION AS OF expects an integer commit, got '$version'")
    })
  /** TIMESTAMP AS OF: the newest version published at or before the
    * instant (micros since epoch, per the TableCatalog contract) — the
    * publish instant is the manifest's atomically-set mtime, so no extra
    * metadata exists to drift from it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val at = ManifestTable.versionTimestamps(dir)
      .filter(_._2 * 1000L <= timestamp)
    if (at.isEmpty) throw new IllegalArgumentException(
      s"GraftCatalog: $ident has no version at or before timestamp $timestamp")
    loadAt(ident, at.map(_._1).max)
  }

  private def loadAt(ident: Identifier, version: Int): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    new GraftSqlTable(ident.toString, dir, version)
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tableDir(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "GraftCatalog: PARTITIONED BY is not supported — the manifest table " +
        "prunes via file stats and hidden partition transforms instead " +
        "(ManifestTable.commitPartitioned)")
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    // schema-on-read everywhere else; the DDL file only serves loads of a
    // table that has no commits yet
    java.nio.file.Files.write(p.resolve("_schema.ddl"),
      schema.toDDL.getBytes("UTF-8"))
    // TBLPROPERTIES('write.order'='col'): every INSERT range-clusters on
    // the column (see ManifestWriteBuilder) — persist the declaration
    Option(properties.get("write.order")).foreach { c =>
      require(schema.fieldNames.contains(c),
        s"GraftCatalog: write.order column '$c' is not in the schema")
      val parts = Option(properties.get("write.order.partitions"))
        .map(_.trim).getOrElse("0")
      java.nio.file.Files.write(p.resolve("_write.order"),
        s"$c\n$parts".getBytes("UTF-8")): Unit
    }
    new GraftSqlTable(ident.toString, dir, -1)
  }

  /** ALTER TABLE ADD COLUMNS — the catalog face of the manifest table's
    * add-column evolution (q329): the widened schema lands in
    * `_schema.ddl`, existing files read the new columns as NULL (the
    * scan's user-specified schema back-fills), no data is rewritten, and
    * time travel still serves whatever each version's files carry. Drops,
    * renames, and type changes stay out of scope — same as the manifest
    * line format's contract. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val cur = new GraftSqlTable(ident.toString, dir, -1).schema()
    val added = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "GraftCatalog: nested ADD COLUMN is not supported")
        val name = a.fieldNames()(0)
        require(!cur.fieldNames.contains(name),
          s"GraftCatalog: column '$name' already exists on $ident")
        StructField(name, a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER TABLE change $other — only ADD " +
          "COLUMNS (the manifest evolution contract) is supported")
    }
    val widened = StructType(cur.fields ++ added)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_schema.ddl"),
      widened.toDDL.getBytes("UTF-8"))
    new GraftSqlTable(ident.toString, dir, -1)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit }
      rm(new java.io.File(dir)); true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("GraftCatalog: RENAME is not supported")

  // Namespaces are implicit directories (the JDBC-catalog convention):
  // any single level exists on demand, created physically by the first
  // CREATE TABLE beneath it.
  override def listNamespaces(): Array[Array[String]] = {
    val root = java.nio.file.Paths.get(warehouse)
    if (!java.nio.file.Files.isDirectory(root)) Array.empty
    else {
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
        .filterNot(p => isTable(p.toString))
        .map(p => Array(p.getFileName.toString)).toArray
      finally s.close()
    }
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (namespace.length == 1 &&
      java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(warehouse, namespace.head)))
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get((warehouse +: namespace.toSeq).mkString("/"))): Unit
  }
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("GraftCatalog: ALTER NAMESPACE unsupported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = java.nio.file.Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!java.nio.file.Files.isDirectory(p)) false
    else if (cascade) {
      // DROP NAMESPACE ... CASCADE: recursive delete of every table under
      // the namespace (ADVICE r9 — a plain Files.delete threw
      // DirectoryNotEmptyException on any non-empty namespace)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit
      }
      rm(p.toFile); true
    } else {
      val empty = {
        val s = java.nio.file.Files.list(p)
        try !s.iterator().hasNext finally s.close()
      }
      if (!empty)
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
          namespace, s"namespace ${namespace.mkString(".")} contains tables; " +
            "use DROP NAMESPACE ... CASCADE")
      java.nio.file.Files.delete(p); true
    }
  }
}

object GraftCatalog {
  /** The files the query's optimized plan will actually open — read from
    * the v2 scan's own FileIndex. (`Dataset.inputFiles` only reports
    * `FileTable`-backed v2 relations, which a catalog table wrapping its
    * scan is not — this is the assertion surface for pruning tests.) */
  def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        (r.scan match {
          case s: GraftStreamableScan => s.batchScan
          case s => s
        }) match {
          case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            fs.fileIndex.inputFiles.toSeq
          case _ => Seq.empty
        }
    }.flatten
}

/** Batch scans delegate untouched; `spark.readStream.table("graft.db.t")`
  * gets the q344 version-offset micro-batch stream (one commit = one
  * batch, O(delta) planning, exactly-once resume) over the same table. */
class GraftStreamableScan(val batchScan: Scan, dir: String,
                          required: StructType,
                          startVersion: Int = 0) extends Scan {
  override def readSchema(): StructType = batchScan.readSchema()
  override def description(): String = batchScan.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    batchScan.toBatch
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val bad = required.fields.filterNot(f => f.dataType match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.DoubleType |
           _: org.apache.spark.sql.types.BooleanType |
           _: org.apache.spark.sql.types.StringType => true
      case _ => false
    })
    require(bad.isEmpty,
      s"GraftCatalog streaming read: unsupported column types " +
        s"${bad.map(f => s"${f.name}: ${f.dataType}").mkString(", ")} " +
        "(the streaming reader carries long/int/double/boolean/string)")
    new ManifestMicroBatchStream(dir, required, startVersion)
  }
}

/** One catalog table = one manifest directory, pinned at `version`
  * (-1 = current at load time — snapshot-at-analysis).
  *
  * DELETE FROM routes to [[ManifestTable.deleteWhereCow]] — copy-on-write
  * with the predicate's stats bounds limiting the rewrite to overlapping
  * files — so the post-delete snapshot stays delete-entry-free and every
  * SQL verb keeps working on it (the merge-on-read delete shapes remain
  * the library path's choice). TRUNCATE TABLE publishes an empty
  * overwrite commit: zero files, history intact. */
class GraftSqlTable(ident: String, dir: String, version: Int)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  private def spark: SparkSession = SparkSession.active

  /** The pinned snapshot's manifest entries; empty table → no entries. */
  private lazy val entries: Seq[(String, Map[String, (Double, Double)])] = {
    val v = if (version > 0) version else ManifestTable.currentVersion(dir)
    if (v == 0) Seq.empty
    else {
      val es = ManifestTable.entriesAt(dir, v)
      require(es.forall(_._1),
        s"GraftCatalog: $ident carries row-level delete entries at v$v — " +
          "merge-on-read assembly is ManifestTable.read's job; compact the " +
          "table to serve it through SQL again")
      es.map { case (_, path, stats) => (path, stats) }
    }
  }

  private lazy val innerTable: Option[ParquetTable] =
    if (entries.isEmpty) None
    else Some(ParquetTable(ident, spark,
      new CaseInsensitiveStringMap(Map("mergeSchema" -> "true").asJava),
      entries.map(_._1).toIndexedSeq, None, classOf[ParquetFileFormat]))

  override def name(): String = ident
  override def schema(): StructType = {
    val ddlPath = java.nio.file.Paths.get(dir, "_schema.ddl")
    val ddl: Option[StructType] =
      if (java.nio.file.Files.exists(ddlPath))
        Some(StructType.fromDDL(
          new String(java.nio.file.Files.readAllBytes(ddlPath), "UTF-8")))
      else None
    innerTable match {
      case Some(t) =>
        val s: StructType = t.schema
        require(!s.fieldNames.exists(_.startsWith("_ptn_")),
          s"GraftCatalog: $ident carries hidden partition columns — read it " +
            "via ManifestTable.readSourceDays/readSourceBucket")
        // ALTER-added columns not yet present in any file read as NULL
        val missing = ddl.map(_.fields.filterNot(f => s.fieldNames.contains(f.name)))
          .getOrElse(Array.empty[StructField])
        StructType(s.fields ++ missing)
      case None => ddl.getOrElse(new StructType())
    }
  }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // `.option("branch", "exp")` reads the branch head instead of main —
    // the q349 surface reachable from the reader API (branch manifests
    // are full snapshot listings, so everything downstream — pruning,
    // aggregate pushdown — works unchanged). Branches carry appends
    // only through commitToBranch's default; delete-carrying branch
    // snapshots hit the same refusal as main.
    val branchEntries = Option(options.get("branch")).map { b =>
      val v = ManifestTable.branchVersion(dir, b)
      val es = ManifestTable.branchEntriesAt(dir, b, v)
      require(es.forall(_._1),
        s"GraftCatalog: branch '$b' of $ident carries delete entries — " +
          "read it via ManifestTable.readBranch")
      es.map { case (_, path, stats) => (path, stats) }
    }
    new GraftScanBuilder(ident, spark, branchEntries.getOrElse(entries),
      schema(), options, streamDir = Some(dir))
  }

  private def writeOrder: Option[(String, Int)] = {
    val p = java.nio.file.Paths.get(dir, "_write.order")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val ls = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .split('\n').map(_.trim)
      Some((ls(0), if (ls.length > 1 && ls(1).nonEmpty) ls(1).toInt else 0))
    }
  }

  override def properties(): util.Map[String, String] =
    writeOrder.map { case (c, _) => util.Map.of("write.order", c) }
      .getOrElse(util.Collections.emptyMap())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version <= 0,
      s"GraftCatalog: cannot write to $ident VERSION AS OF $version — " +
        "writes go to the table head")
    writeOrder match {
      case Some((c, n)) => new ManifestWriteBuilder(dir, info.schema(), Some(c), n)
      case None         => new ManifestWriteBuilder(dir, info.schema())
    }
  }

  private def filterToColumn(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
      case And(l, r) => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
      case Or(l, r)  => for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
      case Not(c)    => filterToColumn(c).map(!_)
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    version <= 0 && filters.forall(filterToColumn(_).isDefined)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val pred = filters.flatMap(filterToColumn(_))
      .reduceOption(_ && _).getOrElse(lit(true))
    ManifestTable.deleteWhereCow(spark, dir, pred): Unit
  }

  override def truncateTable(): Boolean = {
    ManifestTable.publish(dir, Seq.empty, append = false)
    true
  }

  /** UPDATE and MERGE INTO via Spark's group-based row-level rewrite:
    * the operation's scan reads the WHOLE current snapshot (deliberately
    * no file pruning and no filter forwarding — the group-based contract
    * is "the write replaces exactly what the scan produced", so any scan-
    * side row loss would silently drop rows), Spark applies the
    * UPDATE/MERGE logic, and the write lands as ONE overwrite commit
    * through the same staged-write protocol as INSERT OVERWRITE — time
    * travel across the mutation for free. This is the always-correct
    * full-table copy-on-write; the stats-bounded variants are the
    * library verbs (updateWhere / deleteWhereCow / merge). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(version <= 0,
      s"GraftCatalog: cannot mutate $ident at a pinned version")
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, WriteBuilder}
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          new GraftScanBuilder(ident, spark, entries, GraftSqlTable.this.schema(),
            options) {
            // group = the whole table: never prune, never forward filters
            override def pushFilters(filters: Seq[Expression]): Seq[Expression] = filters
          }
        override def newWriteBuilder(wInfo: LogicalWriteInfo): WriteBuilder = {
          if (sys.env.contains("GRAFT_DEBUG_RL"))
            println("RL-WRITE-SCHEMA=" + wInfo.schema().toDDL +
              " ROWID=" + wInfo.rowIdSchema() + " META=" + wInfo.metadataSchema())
          val b = new ManifestWriteBuilder(dir, wInfo.schema(), rowLevel = true)
          b.truncate()
          b
        }
      }
    }
  }
}

/** Records the pushed conjuncts, prunes the FILE LIST against the
  * manifest's per-column min/max before any footer is opened, then builds
  * Spark's own ParquetScanBuilder over the surviving files and forwards
  * the same filters + column pruning to it. Every filter is declared
  * residual (returned back to Spark), so correctness never depends on the
  * stats — pruning is a strict superset by the same argument as
  * `ManifestTable.readWhere`. */
class GraftScanBuilder(ident: String, spark: SparkSession,
                       entries: Seq[(String, Map[String, (Double, Double)])],
                       fullSchema: StructType,
                       options: CaseInsensitiveStringMap,
                       streamDir: Option[String] = None)
    extends ScanBuilder with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var conjuncts: Seq[Expression] = Nil
  private var required: StructType = fullSchema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    conjuncts = filters
    filters // all residual — stats pruning must stay a superset
  }
  override def pushedFilters(): Array[Predicate] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    innerOpt.foreach(_.pruneColumns(requiredSchema))
  }

  // Aggregate pushdown (COUNT/MIN/MAX from parquet footers, zero row
  // reads — needs spark.sql.parquet.aggregatePushDown=true) forwards to
  // the inner ParquetScanBuilder, which must therefore exist before
  // build(): Spark pushes filters first, so the pruned path set is
  // already stable here.
  private var innerOpt: Option[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder] = None
  private def inner(): org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =
    innerOpt.getOrElse {
      val t = ParquetTable(ident, spark,
        new CaseInsensitiveStringMap(Map("mergeSchema" -> "true").asJava),
        prunedPaths.toIndexedSeq, Some(fullSchema), classOf[ParquetFileFormat])
      val sb = t.newScanBuilder(options)
      sb.pushFilters(conjuncts): Unit
      innerOpt = Some(sb)
      sb
    }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner().supportCompletePushDown(agg)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner().pushAggregation(agg)

  private[v2] def prunedPaths: Seq[String] = {
    // interval extraction is shared with ManifestTable.updateWhere — the
    // same metadata bounds reads and writes
    val bounds = conjuncts.flatMap(ManifestTable.splitConjuncts)
      .flatMap(ManifestTable.intervalOf)
      .groupBy(_._1).map { case (c, ivs) =>
        c -> (ivs.map(_._2).max, ivs.map(_._3).min) }
    entries.filter { case (_, stats) =>
      bounds.forall { case (c, (lo, hi)) =>
        stats.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }.map(_._1)
  }

  override def build(): Scan = {
    // An empty table (or a fully pruned one) still builds: Spark's
    // InMemoryFileIndex handles an empty path list (zero partitions
    // planned) and `fullSchema` is supplied, so nothing is inferred.
    val sb = inner()
    sb.pruneColumns(required)
    val batchScan = sb.build()
    streamDir match {
      case None    => batchScan
      case Some(d) => new GraftStreamableScan(batchScan, d, required,
        // `.option("startVersion", "3")` tails the table from a chosen
        // commit instead of the beginning (historical versions may
        // already be expired — the CDC consumer's catch-up knob)
        Option(options.get("startVersion")).map(_.toInt).getOrElse(0))
    }
  }
}
