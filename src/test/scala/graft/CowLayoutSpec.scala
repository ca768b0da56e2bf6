package graft

import graft.sources.ManifestTable
import graft.sources.v2.GraftCatalog.scannedFiles

/** Group copy-on-write SQL (UPDATE / MERGE on UNKEYED tables) must
  * preserve the table's declared clustering: bucketed tables republish
  * every replacement file with its `_ptn_bucket_*` tag (SPJ eligibility
  * is all-files-tagged), transform-partitioned tables re-split per cell
  * (hidden-partition pruning keeps cutting). Before this, one SQL UPDATE
  * silently degraded the layout until a compact. */
class CowLayoutSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cowlayout")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gcl", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcl.warehouse", d.toString)
    d.toString
  }

  test("UPDATE and MERGE on a bucketed table keep every file SPJ-tagged") {
    import spark.implicits._
    wh: Unit
    spark.sql("CREATE TABLE gcl.ns.f (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gcl.ns.d (k BIGINT, w BIGINT) PARTITIONED BY (bucket(4, k))")
    (1L to 200L).map(k => (k, k * 2)).toDF("k", "v").createOrReplaceTempView("cl_f")
    (1L to 200L).map(k => (k, k * 5)).toDF("k", "w").createOrReplaceTempView("cl_d")
    spark.sql("INSERT INTO gcl.ns.f SELECT * FROM cl_f")
    spark.sql("INSERT INTO gcl.ns.d SELECT * FROM cl_d")
    val fdir = s"$wh/ns/f"
    def allTagged(): Boolean = {
      val es = ManifestTable.sqlEntriesAt(fdir, ManifestTable.currentVersion(fdir))
        .filter(_.isData)
      es.nonEmpty && es.forall(_.stats.contains("_ptn_bucket_k"))
    }
    assert(allTagged())
    spark.sql("UPDATE gcl.ns.f SET v = v + 1 WHERE k % 10 = 0")
    assert(allTagged(), "a CoW UPDATE must republish replacement files WITH " +
      "their bucket tags")
    (190L to 210L).map(k => (k, k * 7)).toDF("k", "nv")
      .createOrReplaceTempView("cl_m")
    spark.sql("""MERGE INTO gcl.ns.f t USING cl_m s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = s.nv
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
                |""".stripMargin)
    assert(allTagged(), "a CoW MERGE must keep the bucket tags too")
    // SPJ still plans zero exchanges after two mutations
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    try {
      confs.foreach { case (c, x) => spark.conf.set(c, x) }
      val q = spark.sql(
        "SELECT f.k, f.v, d.w FROM gcl.ns.f f JOIN gcl.ns.d d ON f.k = d.k")
      val rows = q.collect()
      assert(rows.length == 200)
      val expect = (1L to 200L).map { k =>
        val v = if (k >= 190) k * 7 else if (k % 10 == 0) k * 2 + 1 else k * 2
        k -> v
      }.toMap
      assert(rows.forall(r => expect(r.getLong(0)) == r.getLong(1)))
      assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
        "SPJ must survive UPDATE + MERGE with zero exchanges")
    } finally saved.foreach {
      case (c, Some(x)) => spark.conf.set(c, x)
      case (c, None)    => spark.conf.unset(c)
    }
    // the merge's inserts (201..210) landed in their buckets
    assert(spark.sql("SELECT sum(v) FROM gcl.ns.f WHERE k > 200").head.getLong(0)
      == (201L to 210L).map(_ * 7).sum)
  }

  test("UPDATE on a days-transform table keeps cells, stats, and pruning") {
    wh: Unit
    spark.sql("CREATE TABLE gcl.ns.t (id BIGINT, d DATE, v BIGINT) " +
      "PARTITIONED BY (days(d))")
    spark.sql("""INSERT INTO gcl.ns.t
                |SELECT id, DATE_ADD(DATE'2024-03-01', CAST(id % 5 AS INT)), id * 3
                |FROM range(0, 500) r(id)""".stripMargin)
    val tdir = s"$wh/ns/t"
    val v1 = ManifestTable.currentVersion(tdir)
    val entries1 = ManifestTable.sqlEntriesAt(tdir, v1).filter(_.isData)
    assert(entries1.length == 5, s"one file per day, got ${entries1.length}")
    def dayStats(stats: Map[String, (Double, Double)]): Option[(Double, Double)] =
      stats.collectFirst { case (k2, mm) if k2.startsWith("_ptn_days_") => mm }
    assert(entries1.forall(e => dayStats(e.stats).exists(mm => mm._1 == mm._2)),
      "every inserted file must be a single-day cell")
    val untouched = entries1.filter(e =>
      dayStats(e.stats).exists(_._1 < 19785)).map(_.path).toSet // Mar 1-2 = epoch days 19783-19784
    spark.sql("UPDATE gcl.ns.t SET v = v + 1 WHERE d >= DATE'2024-03-03'")
    val entries2 = ManifestTable
      .sqlEntriesAt(tdir, ManifestTable.currentVersion(tdir)).filter(_.isData)
    assert(untouched.subsetOf(entries2.map(_.path).toSet),
      "files whose stats exclude the UPDATE window must survive untouched")
    assert(entries2.forall(e => dayStats(e.stats).exists(mm => mm._1 == mm._2)),
      "every replacement file must be a single-day cell again")
    // hidden-partition pruning still cuts to one file per day
    val q = spark.sql("SELECT sum(v) FROM gcl.ns.t WHERE d = DATE'2024-03-04'")
    assert(q.head.getLong(0) ==
      (0L until 500L).filter(_ % 5 == 3).map(_ * 3 + 1).sum)
    assert(scannedFiles(q).length == 1,
      s"day-point read must prune to 1 cell, scanned ${scannedFiles(q).length}")
  }
}
