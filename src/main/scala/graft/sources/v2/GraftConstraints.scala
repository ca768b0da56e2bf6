package graft.sources.v2

import java.nio.file.{Files, Paths}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint}

/** CHECK-constraint persistence for [[GraftCatalog]] tables — the data-
  * quality gate at ingest. The catalog declares
  * `TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT`, the table reports
  * its stored checks through `Table.constraints()`, and SPARK does the
  * enforcement: the analyzer's `ResolveTableConstraints` compiles every
  * enforced check into a codegen'd validation over the write query, so an
  * INSERT / UPDATE / MERGE carrying a violating row fails BEFORE the
  * commit point (and with the staged CTAS/RTAS path, before anything is
  * visible at all). Nothing here runs per-row — this file is only the
  * catalog's storage half of the contract.
  *
  * Storage: `_constraints` next to the table metadata, one check per
  * line, `name \t enforced \t base64(predicateSql)` — base64 because a
  * predicate is arbitrary SQL (`a || b`, embedded newlines in string
  * literals) and must never collide with a line format. At 100 TB the
  * file is O(|constraints|) driver-side metadata, read once per table
  * load. */
object GraftConstraints {
  private def file(dir: String) = Paths.get(dir, "_constraints")

  def load(dir: String): Seq[Check] = {
    val p = file(dir)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val Array(name, enforced, sql64) = line.split('\t')
      Constraint.check(name)
        .predicateSql(new String(Base64.getDecoder.decode(sql64), "UTF-8"))
        .enforced(enforced.toBoolean)
        .build()
    }
  }

  def store(dir: String, checks: Seq[Check]): Unit = {
    val lines = checks.map { c =>
      s"${c.name()}\t${c.enforced()}\t" +
        Base64.getEncoder.encodeToString(c.predicateSql().getBytes("UTF-8"))
    }
    if (lines.isEmpty) Files.deleteIfExists(file(dir)): Unit
    else Files.write(file(dir), lines.asJava): Unit
  }

  /** Accept only CHECK constraints — PRIMARY KEY / UNIQUE / FOREIGN KEY
    * are promises no engine can enforce on write without an index; a
    * declaration the engine would silently not honor is worse than a
    * loud refusal (the keyed-table `write.key` property is the uniqueness
    * contract this engine does act on). */
  def asCheck(c: Constraint): Check = c match {
    case ck: Check => ck
    case other => throw new UnsupportedOperationException(
      s"GraftCatalog: only CHECK constraints are supported — got " +
        s"'${other.toDDL}'. Declare row identity with " +
        "TBLPROPERTIES('write.key'=...) instead of PRIMARY KEY/UNIQUE.")
  }
}
