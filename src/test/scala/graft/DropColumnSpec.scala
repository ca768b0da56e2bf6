package graft

import graft.sources.ManifestTable

/** ALTER TABLE DROP COLUMN on [[graft.sources.v2.GraftCatalog]] tables:
  * metadata-only (zero files rewritten), with the load-bearing-column
  * guard matrix and the name-resurrection refusal. */
class DropColumnSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dropcol")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gdc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdc.warehouse", d.toString)
    d.toString
  }

  test("DROP COLUMN hides the column everywhere without rewriting a file") {
    import spark.implicits._
    wh: Unit
    Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "scratch", "v")
      .createOrReplaceTempView("dc_src")
    spark.sql("CREATE TABLE gdc.ns.t AS SELECT * FROM dc_src")
    val dir = s"$wh/ns/t"
    val files = ManifestTable.fileCount(dir)
    val ver = ManifestTable.currentVersion(dir)
    spark.sql("ALTER TABLE gdc.ns.t DROP COLUMN scratch")
    assert(ManifestTable.fileCount(dir) == files &&
      ManifestTable.currentVersion(dir) == ver,
      "DROP COLUMN must be metadata-only: no rewrite, no new commit")
    assert(spark.table("gdc.ns.t").columns.toSeq == Seq("k", "v"))
    intercept[Exception] { spark.sql("SELECT scratch FROM gdc.ns.t").collect() }
    // new writes simply lack the column; old + new files serve together
    spark.sql("INSERT INTO gdc.ns.t VALUES (3, 30)")
    assert(spark.sql("SELECT sum(v) FROM gdc.ns.t").head.getLong(0) == 60L)
    // time travel reports the CURRENT schema (the tombstone is table-level
    // state, like Iceberg's schema projection of old snapshots)
    assert(spark.sql("SELECT * FROM gdc.ns.t VERSION AS OF 1").columns.toSeq
      == Seq("k", "v"))
    // re-adding the dropped name refuses (old files would resurface its
    // values); a fresh name is fine
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gdc.ns.t ADD COLUMNS (scratch STRING)")
    }
    assert(e.getMessage.contains("dropped"), e.getMessage)
    spark.sql("ALTER TABLE gdc.ns.t ADD COLUMNS (note STRING)")
    assert(spark.table("gdc.ns.t").columns.toSeq == Seq("k", "v", "note"))
  }

  test("RENAME COLUMN: pure metadata before AND after the first commit") {
    wh: Unit
    spark.sql("CREATE TABLE gdc.ns.rn (old_name BIGINT, v BIGINT)")
    spark.sql("ALTER TABLE gdc.ns.rn RENAME COLUMN old_name TO k")
    assert(spark.table("gdc.ns.rn").columns.toSeq == Seq("k", "v"))
    spark.sql("INSERT INTO gdc.ns.rn VALUES (1, 10)")
    assert(spark.sql("SELECT k FROM gdc.ns.rn").head.getLong(0) == 1L)
    // post-data rename is pure metadata too (r10: the name-mapping
    // contract — committed files keep the birth name, the catalog
    // translates; RenameColumnSpec pins the full surface)
    spark.sql("ALTER TABLE gdc.ns.rn RENAME COLUMN v TO w")
    assert(spark.table("gdc.ns.rn").columns.toSeq == Seq("k", "w"))
    assert(spark.sql("SELECT w FROM gdc.ns.rn").head.getLong(0) == 10L)
  }

  test("load-bearing columns refuse to drop") {
    wh: Unit
    spark.sql("CREATE TABLE gdc.ns.g (k BIGINT NOT NULL, v BIGINT, w BIGINT," +
      " CONSTRAINT vpos CHECK (v >= 0)) TBLPROPERTIES ('write.key'='k')")
    val e1 = intercept[Exception] { spark.sql("ALTER TABLE gdc.ns.g DROP COLUMN k") }
    assert(e1.getMessage.contains("write.key"), e1.getMessage)
    val e2 = intercept[Exception] { spark.sql("ALTER TABLE gdc.ns.g DROP COLUMN v") }
    assert(e2.getMessage.contains("vpos"), e2.getMessage)
    spark.sql("ALTER TABLE gdc.ns.g DROP CONSTRAINT vpos")
    spark.sql("ALTER TABLE gdc.ns.g DROP COLUMN v")
    // unknown column: refuse, unless IF EXISTS
    intercept[Exception] { spark.sql("ALTER TABLE gdc.ns.g DROP COLUMN nope") }
    spark.sql("ALTER TABLE gdc.ns.g DROP COLUMN IF EXISTS nope")
    // the ordered-layout column guard
    spark.sql("CREATE TABLE gdc.ns.ord (a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('write.order'='a')")
    val e3 = intercept[Exception] { spark.sql("ALTER TABLE gdc.ns.ord DROP COLUMN a") }
    assert(e3.getMessage.contains("write.order"), e3.getMessage)
  }
}
