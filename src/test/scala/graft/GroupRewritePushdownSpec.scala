package graft

/** Regression pin for the group-rewrite pushdown data-loss bug the
  * evolution property test found (seed 1337): a group-based row-level
  * operation's scan must NOT let the command condition filter rows
  * INSIDE scanned files — the write replaces whole files with the
  * scan's output, so a parquet-side row-group/page skip (here:
  * `col >= x` skipping all-NULL pages) erased every non-matching row
  * of every touched file. The condition may prune FILES only. */
class GroupRewritePushdownSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_grp")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ggrp", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ggrp.warehouse", d.toString)
    d.toString
  }

  test("row-level DELETE whose condition matches nothing rewrites nothing away") {
    wh: Unit
    val T = "ggrp.ns.t"
    // the adversarial shape: the predicate column is all-NULL in every
    // file (ALTER-added after the data, then renamed), so parquet-side
    // evaluation of `w >= 423` would skip every row of every file
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (609), (648), (303)")
    spark.sql(s"ALTER TABLE $T ADD COLUMNS (b BIGINT)")
    spark.sql(s"ALTER TABLE $T DROP COLUMN a")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN b TO w")
    spark.sql(s"ALTER TABLE $T ADD COLUMNS (c BIGINT)")
    spark.sql(s"DELETE FROM $T WHERE c >= 1")          // fast path: no-op
    spark.sql(s"ALTER TABLE $T RENAME COLUMN c TO z")
    spark.sql(s"DELETE FROM $T WHERE w >= 423")        // row-level: no-op
    assert(spark.sql(s"SELECT count(*) FROM $T").head.getLong(0) == 3L,
      "a DELETE matching nothing must keep every row")
  }

  test("row-level DELETE erases exactly the matching rows of touched files") {
    wh: Unit
    val T = "ggrp.ns.mix"
    // mixed files: every file holds matching AND non-matching rows, so
    // any in-file filtering of the command condition loses data
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $T SELECT id, id * 10 FROM range(100)")
    spark.sql(s"DELETE FROM $T WHERE v >= 500")        // fast path CoW
    assert(spark.sql(s"SELECT count(*) FROM $T").head.getLong(0) == 50L)
    // force the ROW-LEVEL path via a renamed predicate column
    spark.sql(s"ALTER TABLE $T RENAME COLUMN v TO w")
    spark.sql(s"DELETE FROM $T WHERE w >= 250")
    val got = spark.sql(s"SELECT count(*), sum(w) FROM $T").head
    assert(got.getLong(0) == 25L && got.getLong(1) == (0L until 25L).map(_ * 10).sum,
      s"row-level DELETE must keep every non-matching row, got $got")
  }
}
