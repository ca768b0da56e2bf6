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
      // non-append mutations refuse loudly instead of touching main
      intercept[Exception] { spark.sql(s"UPDATE $T SET a = 0 WHERE a = 1") }
      intercept[Exception] { spark.sql(s"DELETE FROM $T WHERE a = 1") }
      intercept[Exception] { spark.sql(s"TRUNCATE TABLE $T") }
    } finally spark.conf.unset("spark.graft.wap.branch")
    // publish: fast-forward replays the audited commit onto main
    ManifestTable.fastForward(dir, "audit")
    assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 6L)
  }
}
