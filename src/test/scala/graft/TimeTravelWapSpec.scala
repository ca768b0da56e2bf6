package graft

import graft.sources.ManifestTable

/** DataFrame-reader time travel options (versionAsOf / timestampAsOf,
  * tag-aware) and the session-level write-audit-publish conf
  * (`spark.graft.wap.branch`). */
class TimeTravelWapSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wap")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gwap", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwap.warehouse", d.toString)
    d.toString
  }

  test("reader options: versionAsOf (int and tag), timestampAsOf") {
    wh: Unit
    val T = "gwap.ns.tt"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1)")                 // v1
    val dir = s"$wh/ns/tt"
    ManifestTable.createTag(dir, "first")
    spark.sql(s"INSERT INTO $T VALUES (10)")                // v2
    val t1 = ManifestTable.versionTimestamps(dir).toMap.apply(1)

    def sumAt(opts: (String, String)*): Long = {
      var r = spark.read
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.table(T).agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0)
    }
    // Spark's analyzer lifts these options into loadTable(version /
    // timestamp) — the catalog's tag-aware AS OF resolution serves them
    val t1Str = java.time.Instant.ofEpochMilli(t1)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(sumAt() == 11L)
    assert(sumAt("versionAsOf" -> "1") == 1L)
    assert(sumAt("versionAsOf" -> "first") == 1L)           // tag resolves
    assert(sumAt("timestampAsOf" -> t1Str) == 1L)           // v1's instant
    intercept[Exception] { sumAt("versionAsOf" -> "99") }
    intercept[Exception] { sumAt("versionAsOf" -> "nope") }
    intercept[Exception] { sumAt("timestampAsOf" -> "1970-01-02 00:00:00") }
  }

  test("spark.graft.wap.branch routes appends to the audit branch; mutations refuse") {
    wh: Unit
    val T = "gwap.ns.w"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1)")
    val dir = s"$wh/ns/w"
    ManifestTable.createBranch(dir, "audit")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      // the ETL job's INSERT, unchanged, lands on the branch
      spark.sql(s"INSERT INTO $T VALUES (2), (3)")
      assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 1L,
        "main must stay untouched while staging")
      assert(spark.read.option("branch", "audit").table(T)
        .agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0) == 6L,
        "the audit branch must hold the staged rows")
      // r11: unkeyed row-level SQL now STAGES too (the group CoW has a
      // branch commit verb) — main still never moves
      spark.sql(s"UPDATE $T SET a = a + 10 WHERE a = 2")
      spark.sql(s"DELETE FROM $T WHERE a = 3")
      assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 1L,
        "main must stay untouched across staged row-level SQL")
      assert(spark.read.option("branch", "audit").table(T)
        .agg(org.apache.spark.sql.functions.sum("a")).head.getLong(0) == 13L,
        "the audit branch must serve the staged mutations (1 + 12)")
      // verbs with no branch story still refuse loudly
      intercept[Exception] { spark.sql(s"TRUNCATE TABLE $T") }
    } finally spark.conf.unset("spark.graft.wap.branch")
    // publish: fast-forward replays the audited lineage onto main
    ManifestTable.fastForward(dir, "audit")
    assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 13L)
    assert(spark.sql(s"SELECT count(*) FROM $T").head.getLong(0) == 2L)
  }

  test("WAP staging refuses on bucketed UNKEYED tables (no tagged branch CoW verb)") {
    wh: Unit
    spark.sql("CREATE TABLE gwap.ns.bw (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gwap.ns.bw VALUES (1, 1), (2, 2)")
    ManifestTable.createBranch(s"$wh/ns/bw", "audit")
    spark.conf.set("spark.graft.wap.branch", "audit")
    try {
      intercept[Exception] { spark.sql("UPDATE gwap.ns.bw SET v = 0 WHERE k = 1") }
    } finally spark.conf.unset("spark.graft.wap.branch")
    // and the refusal left both main and the branch untouched
    assert(spark.sql("SELECT sum(v) FROM gwap.ns.bw").head.getLong(0) == 3L)
    assert(ManifestTable.branchVersion(s"$wh/ns/bw", "audit") == 1)
  }

  test("spark.graft.wap.branch stages KEYED row-level SQL on the audit branch (r11)") {
    import spark.implicits._
    wh: Unit
    val T = "gwap.ns.kw"
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT) TBLPROPERTIES('write.key'='k')")
    (1L to 100L).map(k => (k, k)).toDF("k", "v").createOrReplaceTempView("wap_src")
    spark.sql(s"INSERT INTO $T SELECT * FROM wap_src")                // main v1
    val dir = s"$wh/ns/kw"
    val mainFiles = ManifestTable.sqlEntriesAt(dir, 1).filter(_.isData).map(_.path)
    ManifestTable.createBranch(dir, "stage")
    spark.conf.set("spark.graft.wap.branch", "stage")
    try {
      // staged mutations COMPOSE: each op scan reads the branch head
      spark.sql(s"UPDATE $T SET v = v + 1000 WHERE k <= 10")          // branch v2
      spark.sql(s"DELETE FROM $T WHERE k > 90")                       // branch v3
      (5L to 15L).map(k => (k, k * 7)).toDF("k", "nv")
        .createOrReplaceTempView("wap_m")
      spark.sql(s"""MERGE INTO $T t USING wap_m s ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET v = s.nv
                   |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
                   |""".stripMargin)                                  // branch v4
      // main NEVER moved; the op scans saw only the branch
      assert(ManifestTable.currentVersion(dir) == 1, "main must stay pinned")
      assert(spark.sql(s"SELECT sum(v) FROM $T").head.getLong(0) == (1L to 100L).sum)
      // zero pre-mutation data files rewritten — pure delta staging
      val bv = ManifestTable.branchVersion(dir, "stage")
      assert(bv == 4, s"three staged mutations expected, head v$bv")
      val branchEntries = ManifestTable.sqlBranchEntriesAt(dir, "stage", bv)
      assert(mainFiles.toSet.subsetOf(
        branchEntries.filter(_.isData).map(_.path).toSet),
        "staged deltas must keep every pre-mutation file")
      assert(branchEntries.exists(_.deleteKey.isDefined))
      // the AUDIT leg: merge-on-read over the staged deltas
      val expect = ((1L to 90L).map(k => k ->
          (if (k <= 10) k + 1000 else k)).toMap ++
        (5L to 15L).map(k => k -> k * 7).toMap).values.sum
      assert(spark.read.option("branch", "stage").table(T)
        .agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) == expect,
        "the audit read must serve the staged merge-on-read state")
    } finally spark.conf.unset("spark.graft.wap.branch")
    // publish: the staged lineage replays onto main verbatim
    ManifestTable.fastForward(dir, "stage")
    assert(spark.sql(s"SELECT sum(v) FROM $T").head.getLong(0) == {
      ((1L to 90L).map(k => k -> (if (k <= 10) k + 1000 else k)).toMap ++
        (5L to 15L).map(k => k -> k * 7).toMap).values.sum
    })
    // maintenance materializes the fast-forwarded deltas physically
    spark.sql("CALL gwap.system.compact('ns.kw', 2)").collect()
    assert(spark.sql(s"SELECT count(*) FROM $T").head.getLong(0) == 90L)
  }
}
