package graft

import graft.sources.ManifestTable

/** Partition-spec evolution (q384's spec half): the guard matrix, the
  * DROP direction, and spec changes composing with the rest of the
  * table machinery. */
class PartitionEvolutionSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pev")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gpev", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpev.warehouse", d.toString)
    d.toString
  }

  test("add, drop, and re-add partition fields on a live table") {
    wh: Unit
    val T = "gpev.ns.ev"
    spark.sql(s"CREATE TABLE $T (k BIGINT, d DATE, v BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1, DATE '2024-01-01', 10), " +
      "(2, DATE '2024-02-01', 20)")
    val dir = s"$wh/ns/ev"

    // evolve: days(d); new commits cluster, old files stay
    spark.sql(s"CALL gpev.system.add_partition_field('ns.ev', 'days(d)')")
    spark.sql(s"INSERT INTO $T VALUES (3, DATE '2024-01-02', 30), " +
      "(4, DATE '2024-03-01', 40)")
    val entries = ManifestTable.sqlEntriesAt(dir,
      ManifestTable.currentVersion(dir)).filter(_.isData)
    assert(entries.exists(_.stats.contains("_ptn_days_d")) &&
      entries.exists(!_.stats.contains("_ptn_days_d")),
      "both eras must coexist in one snapshot")
    assert(spark.sql(s"SELECT sum(v) FROM $T WHERE d < DATE '2024-01-15'")
      .head.getLong(0) == 40L, "old files must survive the mapped prune")

    // duplicate source refuses; a second DIFFERENT source stacks
    intercept[Exception] {
      spark.sql(s"CALL gpev.system.add_partition_field('ns.ev', 'days(d)')")
    }
    spark.sql(s"CALL gpev.system.add_partition_field('ns.ev', 'md5bucket(8, k)')")
    assert(ManifestTable.partitionTransforms(dir).size == 2)
    spark.sql(s"INSERT INTO $T VALUES (5, DATE '2024-01-03', 50)")
    assert(spark.sql(s"SELECT sum(v) FROM $T").head.getLong(0) == 150L)

    // drop one field: future writes stop clustering by it, reads stay exact
    spark.sql(s"CALL gpev.system.drop_partition_field('ns.ev', 'k')")
    assert(ManifestTable.partitionTransforms(dir).size == 1)
    intercept[Exception] {
      spark.sql(s"CALL gpev.system.drop_partition_field('ns.ev', 'k')")
    }
    spark.sql(s"INSERT INTO $T VALUES (6, DATE '2024-01-04', 60)")
    assert(spark.sql(s"SELECT sum(v) FROM $T").head.getLong(0) == 210L)

    // drop the last field: the table is plain again
    spark.sql(s"CALL gpev.system.drop_partition_field('ns.ev', 'd')")
    assert(ManifestTable.partitionTransforms(dir).isEmpty)
    spark.sql(s"INSERT INTO $T VALUES (7, DATE '2024-01-05', 70)")
    assert(spark.sql(s"SELECT sum(v) FROM $T").head.getLong(0) == 280L)
  }

  test("evolution guard matrix") {
    wh: Unit
    val T = "gpev.ns.g"
    spark.sql(s"CREATE TABLE $T (k BIGINT, s STRING, d DATE) " +
      "TBLPROPERTIES ('write.order'='k')")
    spark.sql(s"INSERT INTO $T VALUES (1, 'x', DATE '2024-01-01')")
    // one clustering owner per table: write.order blocks the add
    intercept[Exception] {
      spark.sql(s"CALL gpev.system.add_partition_field('ns.g', 'days(d)')")
    }
    spark.sql(s"ALTER TABLE $T UNSET TBLPROPERTIES ('write.order')")
    // days() needs a temporal source
    intercept[Exception] {
      spark.sql(s"CALL gpev.system.add_partition_field('ns.g', 'days(k)')")
    }
    // unknown source refuses
    intercept[Exception] {
      spark.sql(s"CALL gpev.system.add_partition_field('ns.g', 'days(nope)')")
    }
    // a renamed source refuses (load-bearing names stay physical==logical)
    spark.sql(s"ALTER TABLE $T RENAME COLUMN d TO event_date")
    intercept[Exception] {
      spark.sql(
        s"CALL gpev.system.add_partition_field('ns.g', 'days(event_date)')")
    }
    // and the reverse guard: a transform source refuses rename
    spark.sql(s"ALTER TABLE $T RENAME COLUMN event_date TO d")
    spark.sql(s"CALL gpev.system.add_partition_field('ns.g', 'days(d)')")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T RENAME COLUMN d TO event_date")
    }
  }
}
