package graft.sources.v2

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, ViewAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.StructType

/** SQL VIEW storage for [[GraftCatalog]] — `CREATE VIEW graft.db.v AS
  * SELECT ...` persisted in the warehouse (Spark 4's `ViewCatalog`
  * contract), so the lakehouse's derived-query layer lives next to its
  * tables with zero external metastore:
  *
  * {{{
  *   CREATE VIEW graft.db.daily AS
  *     SELECT CAST(ts AS DATE) d, count(*) n FROM graft.db.events GROUP BY 1
  *   SELECT * FROM graft.db.daily WHERE d >= ...   -- expands inline
  * }}}
  *
  * A view is its DEFINITION, not data: Spark re-parses the stored SQL
  * at every reference with the stored catalog/namespace context, so the
  * view inlines into the reading query's plan and EVERYTHING downstream
  * still applies — manifest file pruning, aggregate pushdown, DPP. At
  * 100 TB a view therefore costs exactly what its underlying query
  * costs; there is no materialization to go stale. (Materialized
  * derivatives are the medallion loop's job — q350 — with the change
  * feed keeping them incremental.)
  *
  * Storage: one `_view.properties` (java.util.Properties — newline-safe
  * escaping for free) per view directory, written tmp→ATOMIC_MOVE so a
  * reader never sees a torn definition. The directory is NOT a table
  * (`isTable` looks for `_manifests`/`_schema.ddl`), so views and
  * tables share the namespace tree without colliding in listings. */
private[v2] object GraftViews {

  private def propsFile(dir: String): Path = Paths.get(dir, "_view.properties")

  def isView(dir: String): Boolean = Files.exists(propsFile(dir))

  def list(nsDir: String, namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get(nsDir)
    if (!Files.isDirectory(ns)) Array.empty
    else {
      val s = Files.list(ns)
      try s.iterator().asScala
        .filter(p => isView(p.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
      finally s.close()
    }
  }

  def create(dir: String, info: ViewInfo): View = {
    if (isView(dir)) throw new ViewAlreadyExistsException(info.ident())
    val p = new util.Properties()
    p.setProperty("sql", info.sql())
    p.setProperty("currentCatalog", info.currentCatalog())
    p.setProperty("currentNamespace", info.currentNamespace().mkString("\u0001"))
    p.setProperty("schemaDDL", info.schema().toDDL)
    def arr(prefix: String, vs: Array[String]): Unit = {
      p.setProperty(s"$prefix.n", vs.length.toString)
      vs.zipWithIndex.foreach { case (v, i) =>
        if (v != null) p.setProperty(s"$prefix.$i", v)
      }
    }
    arr("qcol", info.queryColumnNames())
    arr("alias", info.columnAliases())
    arr("comment", info.columnComments())
    info.properties().asScala.foreach { case (k, v) =>
      p.setProperty(s"prop.$k", v)
    }
    write(dir, p)
    load(dir, info.ident())
  }

  private def write(dir: String, p: util.Properties): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".view.tmp-${java.util.UUID.randomUUID()}")
    val out = Files.newOutputStream(tmp)
    try p.store(out, null) finally out.close()
    Files.move(tmp, propsFile(dir), StandardCopyOption.ATOMIC_MOVE): Unit
  }

  def load(dir: String, ident: Identifier): View = {
    if (!isView(dir)) throw new NoSuchViewException(ident)
    val p = new util.Properties()
    val in = Files.newInputStream(propsFile(dir))
    try p.load(in) finally in.close()
    def arr(prefix: String): Array[String] = {
      val n = Option(p.getProperty(s"$prefix.n")).map(_.toInt).getOrElse(0)
      Array.tabulate(n)(i => p.getProperty(s"$prefix.$i")) // null = absent
    }
    val props = p.stringPropertyNames().asScala.toSeq.sorted
      .filter(_.startsWith("prop."))
      .map(k => k.stripPrefix("prop.") -> p.getProperty(k)).toMap
    new View {
      override def name(): String = ident.toString
      override def query(): String = p.getProperty("sql")
      override def currentCatalog(): String = p.getProperty("currentCatalog")
      override def currentNamespace(): Array[String] = {
        val ns = p.getProperty("currentNamespace")
        if (ns == null || ns.isEmpty) Array.empty
        else ns.split('\u0001')
      }
      override def schema(): StructType =
        StructType.fromDDL(p.getProperty("schemaDDL"))
      override def queryColumnNames(): Array[String] = arr("qcol")
      override def columnAliases(): Array[String] = arr("alias")
      override def columnComments(): Array[String] = arr("comment")
      override def properties(): util.Map[String, String] = props.asJava
    }
  }

  def drop(dir: String): Boolean =
    isView(dir) && {
      Option(Paths.get(dir).toFile.listFiles()).toSeq.flatten
        .foreach(f => Files.delete(f.toPath))
      Files.delete(Paths.get(dir))
      true
    }

  def rename(fromDir: String, toDir: String, from: Identifier,
             toExists: Boolean, to: Identifier): Unit = {
    if (!isView(fromDir)) throw new NoSuchViewException(from)
    if (toExists) throw new ViewAlreadyExistsException(to)
    Files.createDirectories(Paths.get(toDir).getParent)
    Files.move(Paths.get(fromDir), Paths.get(toDir)): Unit
  }

  def alter(dir: String, ident: Identifier,
            changes: Seq[(String, Option[String])]): View = {
    if (!isView(dir)) throw new NoSuchViewException(ident)
    val p = new util.Properties()
    val in = Files.newInputStream(propsFile(dir))
    try p.load(in) finally in.close()
    changes.foreach {
      case (k, Some(v)) => p.setProperty(s"prop.$k", v): Unit
      case (k, None)    => p.remove(s"prop.$k"): Unit
    }
    write(dir, p)
    load(dir, ident)
  }
}
