package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Dynamic overwrite — `df.writeTo(t).overwrite(cond)` — lands as ONE
  * atomic commit: delete-matching (stats-bounded copy-on-write) plus
  * append-new, with untouched files carried forward verbatim and no
  * window where readers see the partition missing. */
class DynamicOverwriteSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dynover")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gdo", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdo.warehouse", d.toString)
    d.toString
  }

  test("overwrite(cond) replaces exactly the matching rows in one commit") {
    import spark.implicits._
    wh: Unit
    // write.order on day => one file per day-ish range; stats prune the
    // delete side to the day-3 file(s)
    spark.sql("CREATE TABLE gdo.ns.t (day BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.order'='day', 'write.order.partitions'='5')")
    (1L to 5L).flatMap(d => (1L to 100L).map(i => (d, d * 1000 + i)))
      .toDF("day", "v").createOrReplaceTempView("do_src")
    spark.sql("INSERT INTO gdo.ns.t SELECT * FROM do_src")
    val dir = s"$wh/ns/t"
    val v1 = ManifestTable.currentVersion(dir)
    val before = ManifestTable.sqlEntriesAt(dir, v1).filter(_.isData)
    val untouched = before.filter(e =>
      e.stats.get("day").exists { case (_, mx) => mx < 3 }).map(_.path)
    assert(untouched.nonEmpty, "need day<3 files to pin carry-forward")
    // the nightly pattern: re-ingest day 3 with corrected values
    (1L to 50L).map(i => (3L, 999000L + i)).toDF("day", "v")
      .writeTo("gdo.ns.t").overwrite($"day" === 3L)
    assert(ManifestTable.currentVersion(dir) == v1 + 1,
      "dynamic overwrite must be exactly one commit")
    val after = ManifestTable
      .sqlEntriesAt(dir, v1 + 1).filter(_.isData).map(_.path).toSet
    assert(untouched.forall(after.contains),
      "files outside the overwrite scope must carry forward verbatim")
    // old day-3 rows gone, new ones in, other days intact
    assert(spark.sql("SELECT count(*) FROM gdo.ns.t WHERE day = 3")
      .head.getLong(0) == 50L)
    assert(spark.sql("SELECT min(v) FROM gdo.ns.t WHERE day = 3")
      .head.getLong(0) == 999001L)
    assert(spark.sql("SELECT count(*) FROM gdo.ns.t").head.getLong(0) == 450L)
    // the pre-overwrite snapshot is still time-travelable
    assert(spark.sql(s"SELECT count(*) FROM gdo.ns.t VERSION AS OF $v1")
      .head.getLong(0) == 500L)
  }

  test("overwrite of one day on a days-transform table keeps cells and pruning") {
    wh: Unit
    import graft.sources.v2.GraftCatalog.scannedFiles
    spark.sql("CREATE TABLE gdo.ns.ht (id BIGINT, d DATE, v BIGINT) " +
      "PARTITIONED BY (days(d))")
    spark.sql("""INSERT INTO gdo.ns.ht
                |SELECT id, DATE_ADD(DATE'2024-03-01', CAST(id % 4 AS INT)), id
                |FROM range(0, 400) r(id)""".stripMargin)
    val dir = s"$wh/ns/ht"
    val v1 = ManifestTable.currentVersion(dir)
    val before = ManifestTable.sqlEntriesAt(dir, v1).filter(_.isData)
    assert(before.length == 4, "one file per day")
    val untouched = before.filterNot(_.stats.exists { case (k, mm) =>
      k.startsWith("_ptn_days_") && mm._1 == 19785d }).map(_.path)
    assert(untouched.length == 3)
    // re-ingest 2024-03-03 (epoch day 19785) with corrected values
    spark.sql("""SELECT id, DATE'2024-03-03' AS d, id + 1000000 AS v
                |FROM range(0, 40) r(id)""".stripMargin)
      .writeTo("gdo.ns.ht").overwrite(col("d") === java.sql.Date.valueOf("2024-03-03"))
    assert(ManifestTable.currentVersion(dir) == v1 + 1, "one commit")
    val after = ManifestTable.sqlEntriesAt(dir, v1 + 1).filter(_.isData)
    assert(untouched.forall(after.map(_.path).toSet.contains),
      "other days' cells must carry forward verbatim")
    assert(after.forall(e => e.stats.exists { case (k, mm) =>
      k.startsWith("_ptn_days_") && mm._1 == mm._2 }),
      "every file must still be a single-day cell")
    // pruning still cuts to one cell per day; values correct
    val q = spark.sql("SELECT count(*), min(v) FROM gdo.ns.ht " +
      "WHERE d = DATE'2024-03-03'")
    assert(q.head.getLong(0) == 40L && q.head.getLong(1) == 1000000L)
    assert(scannedFiles(q).length == 1, "day-point read must prune to 1 cell")
    assert(spark.sql("SELECT count(*) FROM gdo.ns.ht").head.getLong(0) == 340L)
  }

  test("overwrite on a plain table, compound conditions, and truncate equivalence") {
    import spark.implicits._
    wh: Unit
    spark.sql("CREATE TABLE gdo.ns.p (k BIGINT, tag STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c")).toDF("k", "tag")
      .createOrReplaceTempView("do_p")
    spark.sql("INSERT INTO gdo.ns.p SELECT * FROM do_p")
    Seq((9L, "b")).toDF("k", "tag").writeTo("gdo.ns.p")
      .overwrite($"tag" === "b" && $"k" >= 2L)
    val got = spark.sql("SELECT k, tag FROM gdo.ns.p ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (4L, "c"), (9L, "b")), got.toString)
    // overwrite(true) degenerates to INSERT OVERWRITE (truncate+append)
    Seq((7L, "z")).toDF("k", "tag").writeTo("gdo.ns.p").overwrite(lit(true))
    assert(spark.sql("SELECT k FROM gdo.ns.p").collect().map(_.getLong(0)).toSeq
      == Seq(7L))
  }
}
