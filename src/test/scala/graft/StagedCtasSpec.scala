package graft

import graft.sources.ManifestTable
import graft.sources.v2.GraftCatalog

/** Atomic CTAS / RTAS (`StagingTableCatalog`) through
  * [[graft.sources.v2.GraftCatalog]]: failure atomicity, history
  * preservation, layout swap, and the create arbitration. */
class StagedCtasSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_staged_ctas")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gsc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsc.warehouse", d.toString)
    d.toString
  }

  private def stagingEntries: Seq[String] = {
    val p = java.nio.file.Paths.get(wh, ".staging")
    if (!java.nio.file.Files.isDirectory(p)) Seq.empty
    else Option(p.toFile.listFiles()).toSeq.flatten.map(_.getName)
  }

  test("a failing CTAS leaves NO table and no stage garbage") {
    import spark.implicits._
    wh: Unit
    (1L to 50L).toDF("k").createOrReplaceTempView("sc_src")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE gsc.ns.boom AS
                  |SELECT k, assert_true(k < 10) AS chk FROM sc_src""".stripMargin)
    }
    assert(e.getMessage != null)
    // atomicity: the table never became visible — not half-written, not
    // empty-created; and the abort reclaimed the stage bytes
    intercept[Exception] { spark.table("gsc.ns.boom").collect() }
    assert(!spark.sql("SHOW TABLES IN gsc.ns").collect()
      .map(_.getString(1)).contains("boom"))
    assert(stagingEntries.isEmpty, s"stage garbage left: $stagingEntries")
  }

  test("a failing RTAS leaves the old table byte-identical") {
    import spark.implicits._
    wh: Unit
    (1L to 50L).toDF("k").createOrReplaceTempView("sc_src2")
    spark.sql("CREATE TABLE gsc.ns.keep AS SELECT k FROM sc_src2")
    val v = ManifestTable.currentVersion(s"$wh/ns/keep")
    intercept[Exception] {
      spark.sql("""REPLACE TABLE gsc.ns.keep AS
                  |SELECT k, assert_true(k < 10) AS chk FROM sc_src2""".stripMargin)
    }
    assert(ManifestTable.currentVersion(s"$wh/ns/keep") == v,
      "a failed replace must not advance the version chain")
    assert(spark.sql("SELECT count(*), sum(k) FROM gsc.ns.keep").head.toSeq ==
      Seq(50L, (1L to 50L).sum))
    assert(stagingEntries.isEmpty)
  }

  test("RTAS preserves the version chain: old snapshots stay time-travelable") {
    import spark.implicits._
    wh: Unit
    (1L to 40L).map(k => (k, s"old$k")).toDF("k", "t")
      .createOrReplaceTempView("sc_src3")
    spark.sql("CREATE TABLE gsc.ns.hist AS SELECT * FROM sc_src3")
    spark.sql("INSERT INTO gsc.ns.hist SELECT k + 100, t FROM sc_src3")
    assert(ManifestTable.currentVersion(s"$wh/ns/hist") == 2)
    spark.sql("REPLACE TABLE gsc.ns.hist AS SELECT k * 10 AS k FROM sc_src3")
    // the replace is version 3 ON the chain, not a fresh table
    assert(ManifestTable.currentVersion(s"$wh/ns/hist") == 3)
    assert(spark.sql("SELECT count(*), sum(k) FROM gsc.ns.hist").head.toSeq ==
      Seq(40L, (1L to 40L).map(_ * 10).sum))
    assert(spark.table("gsc.ns.hist").columns.toSeq == Seq("k"))
    // pre-replace snapshots serve verbatim (old schema's columns included)
    val v1 = spark.sql("SELECT * FROM gsc.ns.hist VERSION AS OF 1")
    assert(v1.count() == 40 &&
      v1.columns.contains("t") && v1.columns.contains("k"))
    val v2n = spark.sql("SELECT count(*) FROM gsc.ns.hist VERSION AS OF 2")
      .head.getLong(0)
    assert(v2n == 80)
  }

  test("RTAS swaps the layout declarations with the data") {
    import spark.implicits._
    wh: Unit
    (1L to 60L).map(k => (k, k % 5)).toDF("k", "g")
      .createOrReplaceTempView("sc_src4")
    spark.sql("""CREATE TABLE gsc.ns.lay TBLPROPERTIES('write.key'='k')
                |AS SELECT * FROM sc_src4""".stripMargin)
    def props() = spark.sql("SHOW TBLPROPERTIES gsc.ns.lay").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("write.key").contains("k"))
    spark.sql("""REPLACE TABLE gsc.ns.lay TBLPROPERTIES('write.order'='g')
                |AS SELECT g, count(*) AS n FROM sc_src4 GROUP BY g""".stripMargin)
    // old declaration gone, new one live
    assert(props().get("write.key").isEmpty)
    assert(props().get("write.order").contains("g"))
    assert(spark.sql("SELECT sum(n) FROM gsc.ns.lay").head.getLong(0) == 60)
  }

  test("bucketed CTAS: the staged layout clusters, and a replace keeps the SPJ tags") {
    import spark.implicits._
    wh: Unit
    (1L to 200L).map(k => (k, k * 3)).toDF("k", "v")
      .createOrReplaceTempView("sc_src5")
    spark.sql("""CREATE TABLE gsc.ns.spj PARTITIONED BY (bucket(4, k))
                |AS SELECT * FROM sc_src5""".stripMargin)
    def bucketTags(dir: String): Int = {
      val v = ManifestTable.currentVersion(dir)
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, "_manifests", s"v$v.list"))
        .toArray.map(_.toString).count(_.contains("_ptn_bucket_"))
    }
    assert(bucketTags(s"$wh/ns/spj") == 4,
      "a bucketed CTAS must land one tagged file per bucket")
    spark.sql("""REPLACE TABLE gsc.ns.spj PARTITIONED BY (bucket(4, k))
                |AS SELECT k, v * 2 AS v FROM sc_src5""".stripMargin)
    assert(bucketTags(s"$wh/ns/spj") == 4,
      "the replace commit must carry the staged bucket tags verbatim")
    assert(spark.sql("SELECT sum(v) FROM gsc.ns.spj").head.getLong(0) ==
      (1L to 200L).map(_ * 6).sum)
    // and the key-grouped scan still serves: bucket-key aggregation works
    assert(spark.sql("SELECT count(DISTINCT k) FROM gsc.ns.spj")
      .head.getLong(0) == 200)
  }

  test("concurrent CREATE arbitration: exactly one staged create wins") {
    wh: Unit
    val cat = spark.sessionState.catalogManager.catalog("gsc")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns"), "race")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
    val none = new java.util.HashMap[String, String]()
    val s1 = cat.stageCreate(ident, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], none)
    val s2 = cat.stageCreate(ident, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform], none)
    s1.commitStagedChanges()
    intercept[Exception] { s2.commitStagedChanges() }
    assert(cat.tableExists(ident))
    assert(stagingEntries.isEmpty, "the losing stage must reclaim itself")
  }
}
