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

  test("overwrite on a bucketed table re-splits survivors and keeps every file SPJ-tagged") {
    import spark.implicits._
    wh: Unit
    spark.sql("CREATE TABLE gdo.ns.bf (k BIGINT, src BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gdo.ns.bd (k BIGINT, w BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    // two source batches → files with disjoint src stats, so the
    // overwrite's delete side is provably bounded
    (1L to 100L).map(k => (k, 1L, k * 2)).toDF("k", "src", "v")
      .createOrReplaceTempView("do_b1")
    (101L to 200L).map(k => (k, 2L, k * 2)).toDF("k", "src", "v")
      .createOrReplaceTempView("do_b2")
    spark.sql("INSERT INTO gdo.ns.bf SELECT * FROM do_b1")
    spark.sql("INSERT INTO gdo.ns.bf SELECT * FROM do_b2")
    (1L to 200L).map(k => (k, k * 5)).toDF("k", "w").createOrReplaceTempView("do_bd")
    spark.sql("INSERT INTO gdo.ns.bd SELECT * FROM do_bd")
    val dir = s"$wh/ns/bf"
    val v0 = ManifestTable.currentVersion(dir)
    val before = ManifestTable.sqlEntriesAt(dir, v0).filter(_.isData)
    val untouched = before.filter(e =>
      e.stats.get("src").exists { case (mn, _) => mn >= 2 }).map(_.path)
    assert(untouched.nonEmpty, "need src=2 files to pin carry-forward")
    // the nightly re-ingest of source 1, corrected (and 20 rows shorter)
    (1L to 80L).map(k => (k, 1L, k * 3)).toDF("k", "src", "v")
      .writeTo("gdo.ns.bf").overwrite($"src" === 1L)
    assert(ManifestTable.currentVersion(dir) == v0 + 1,
      "bucketed dynamic overwrite must be exactly one commit")
    val after = ManifestTable.sqlEntriesAt(dir, v0 + 1).filter(_.isData)
    assert(untouched.forall(after.map(_.path).toSet.contains),
      "files outside the overwrite scope must carry forward verbatim")
    assert(after.forall(_.stats.contains("_ptn_bucket_k")),
      "every post-overwrite file (kept, rewritten, new) must be SPJ-tagged")
    assert(spark.sql("SELECT count(*) FROM gdo.ns.bf").head.getLong(0) == 180L)
    assert(spark.sql("SELECT sum(v) FROM gdo.ns.bf WHERE src = 1").head.getLong(0)
      == (1L to 80L).map(_ * 3).sum)
    // SPJ still plans zero exchanges after the overwrite
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    try {
      confs.foreach { case (c, x) => spark.conf.set(c, x) }
      val q = spark.sql(
        "SELECT f.k, f.v, d.w FROM gdo.ns.bf f JOIN gdo.ns.bd d ON f.k = d.k")
      assert(q.collect().length == 180)
      assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
        "SPJ must survive the dynamic overwrite with zero exchanges")
    } finally saved.foreach {
      case (c, Some(x)) => spark.conf.set(c, x)
      case (c, None)    => spark.conf.unset(c)
    }
    // pre-overwrite snapshot still time-travelable
    assert(spark.sql(s"SELECT count(*) FROM gdo.ns.bf VERSION AS OF $v0")
      .head.getLong(0) == 200L)
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
