package graft

import graft.sources.ManifestTable
import graft.sources.v2.GraftCatalog.scannedFiles

/** ALTER TABLE SET/UNSET TBLPROPERTIES on [[graft.sources.v2.GraftCatalog]]
  * tables: the write-layout declarations (write.order / write.key /
  * write.target-file-size) become mutable post-creation, with the
  * validation each declaration implies. */
class TblPropertiesSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_props")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gtp", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtp.warehouse", d.toString)
    d.toString
  }

  test("SET write.order retrofits range clustering onto future inserts") {
    import spark.implicits._
    wh: Unit
    spark.sql("CREATE TABLE gtp.ns.wo (k BIGINT, v BIGINT)")
    // pre-declaration insert: shuffled, multi-partition — files overlap
    (0L until 400L).map(k => (k, k)).sortBy(t => t._1 % 7)
      .toDF("k", "v").repartition(4).createOrReplaceTempView("tp_src1")
    spark.sql("INSERT INTO gtp.ns.wo SELECT * FROM tp_src1")
    val dir = s"$wh/ns/wo"
    val before = ManifestTable.fileCount(dir)
    assert(before > 1, s"expected several unclustered files, got $before")
    val q0 = spark.sql("SELECT sum(v) FROM gtp.ns.wo WHERE k >= 10 AND k < 40")
    assert(scannedFiles(q0).length == before,
      "shuffled pre-declaration files must all overlap the narrow range")
    spark.sql("ALTER TABLE gtp.ns.wo SET TBLPROPERTIES " +
      "('write.order'='k', 'write.order.partitions'='4')")
    assert(spark.sql("SHOW TBLPROPERTIES gtp.ns.wo").collect()
      .exists(r => r.getString(0) == "write.order" && r.getString(1) == "k"))
    // post-declaration insert: the SAME shuffled shape now range-clusters
    (400L until 800L).map(k => (k, k)).sortBy(t => t._1 % 7)
      .toDF("k", "v").repartition(4).createOrReplaceTempView("tp_src2")
    spark.sql("INSERT INTO gtp.ns.wo SELECT * FROM tp_src2")
    val total = ManifestTable.fileCount(dir)
    assert(total > before, "the clustered insert must add files")
    val q1 = spark.sql("SELECT sum(v) FROM gtp.ns.wo WHERE k >= 410 AND k < 440")
    assert(scannedFiles(q1).length < total - before,
      s"a narrow range over the NEW batch must prune its clustered files " +
        s"(scanned ${scannedFiles(q1).length} of ${total - before} new)")
    assert(q1.head.getLong(0) == (410L until 440L).sum)
    // UNSET lifts the declaration; SHOW no longer reports it
    spark.sql("ALTER TABLE gtp.ns.wo UNSET TBLPROPERTIES ('write.order')")
    assert(!spark.sql("SHOW TBLPROPERTIES gtp.ns.wo").collect()
      .exists(_.getString(0) == "write.order"))
  }

  test("SET write.key opts an existing table into delta row-level SQL") {
    import spark.implicits._
    wh: Unit
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "tag", "v").createOrReplaceTempView("tp_keyed_src")
    spark.sql("CREATE TABLE gtp.ns.kt AS SELECT * FROM tp_keyed_src")
    spark.sql("ALTER TABLE gtp.ns.kt SET TBLPROPERTIES ('write.key'='k')")
    val dir = s"$wh/ns/kt"
    val dataBefore = ManifestTable.sqlEntriesAt(dir, ManifestTable.currentVersion(dir))
      .filter(_.isData).map(_.path).toSet
    spark.sql("UPDATE gtp.ns.kt SET v = v + 1 WHERE k = 2")
    // the delta path: ONE commit, every pre-mutation data file still live
    val after = ManifestTable.sqlEntriesAt(dir, ManifestTable.currentVersion(dir))
    assert(dataBefore.subsetOf(after.filter(_.isData).map(_.path).toSet),
      "a keyed UPDATE must not rewrite pre-mutation data files")
    assert(after.exists(!_.isData), "the UPDATE must land an equality delete")
    assert(spark.sql("SELECT v FROM gtp.ns.kt WHERE k = 2").head.getLong(0) == 21L)
    // changing or unsetting the key under outstanding deletes refuses
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.kt UNSET TBLPROPERTIES ('write.key')")
    }
    assert(e1.getMessage.contains("compact"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.kt SET TBLPROPERTIES ('write.key'='tag')")
    }
    assert(e2.getMessage.contains("compact"), e2.getMessage)
    // compact materializes the deltas; the key is then droppable
    spark.sql("CALL gtp.system.compact('ns.kt', 1)")
    spark.sql("ALTER TABLE gtp.ns.kt UNSET TBLPROPERTIES ('write.key')")
    assert(!spark.sql("SHOW TBLPROPERTIES gtp.ns.kt").collect()
      .exists(_.getString(0) == "write.key"))
  }

  test("SET write.key validates existing data for NULL keys") {
    import spark.implicits._
    wh: Unit
    Seq((Some(1L), 10L), (None, 20L)).toDF("k", "v")
      .createOrReplaceTempView("tp_null_src")
    spark.sql("CREATE TABLE gtp.ns.nk AS SELECT * FROM tp_null_src")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.nk SET TBLPROPERTIES ('write.key'='k')")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("unknown and invalid property declarations refuse loudly") {
    wh: Unit
    spark.sql("CREATE TABLE gtp.ns.misc (k BIGINT)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.misc SET TBLPROPERTIES ('write.nope'='1')")
    }
    assert(e.getMessage.contains("write.nope"), e.getMessage)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.misc SET TBLPROPERTIES " +
        "('write.target-file-size'='lots')")
    }
    intercept[Exception] { // order column must exist
      spark.sql("ALTER TABLE gtp.ns.misc SET TBLPROPERTIES ('write.order'='zz')")
    }
    // a bucketed table's layout belongs to its partitioning
    spark.sql("CREATE TABLE gtp.ns.bkt (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gtp.ns.bkt SET TBLPROPERTIES ('write.order'='v')")
    }
    assert(e2.getMessage.contains("partition"), e2.getMessage)
    // target-file-size round-trips
    spark.sql("ALTER TABLE gtp.ns.misc SET TBLPROPERTIES " +
      "('write.target-file-size'='1048576')")
    assert(spark.sql("SHOW TBLPROPERTIES gtp.ns.misc").collect()
      .exists(r => r.getString(0) == "write.target-file-size" &&
        r.getString(1) == "1048576"))
    spark.sql("ALTER TABLE gtp.ns.misc UNSET TBLPROPERTIES ('write.target-file-size')")
  }
}
