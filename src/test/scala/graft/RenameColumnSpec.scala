package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable
import graft.sources.v2.GraftSqlTable

/** POST-DATA RENAME COLUMN — the name-mapping contract (r10): a column's
  * storage identity is its birth name (every committed file carries it);
  * `_schema.names` maps logical -> physical and the catalog translates
  * at the scan/write boundaries. These specs pin the surfaces the q382
  * gate doesn't reach: rename chains and rename-back, keyed tables
  * (delta UPDATE + merge-on-read SELECT through a renamed value column),
  * dynamic overwrite keyed on a renamed column, the load-bearing guard
  * matrix in BOTH directions, and the RTAS sidecar swap (stale
  * tombstones / rename maps must die with the replaced table). */
class RenameColumnSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_rename")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.grnc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grnc.warehouse", d.toString)
    d.toString
  }

  test("rename chains, rename-back, and the reserved storage name") {
    wh: Unit
    val T = "grnc.ns.chain"
    spark.sql(s"CREATE TABLE $T (a BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1, 10), (2, 20), (3, 30)")
    val dir = s"$wh/ns/chain"

    // a -> b: committed data serves under the new name, physical intact
    spark.sql(s"ALTER TABLE $T RENAME COLUMN a TO b")
    assert(GraftSqlTable.renameMap(dir) == Map("b" -> "a"))
    assert(spark.sql(s"SELECT sum(b) FROM $T").head.getLong(0) == 6L)
    // chain b -> c: still ONE map entry, to the birth name
    spark.sql(s"ALTER TABLE $T RENAME COLUMN b TO c")
    assert(GraftSqlTable.renameMap(dir) == Map("c" -> "a"))
    assert(spark.sql(s"SELECT sum(c) FROM $T").head.getLong(0) == 6L)
    // the intermediate logical name 'b' never hit a file — adding it is
    // legal and reads NULL + fresh values only
    spark.sql(s"ALTER TABLE $T ADD COLUMNS (b BIGINT)")
    assert(spark.sql(s"SELECT count(*) FROM $T WHERE b IS NULL")
      .head.getLong(0) == 3L)
    spark.sql(s"ALTER TABLE $T DROP COLUMN b")
    // the STORAGE name 'a' is reserved while the column lives
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T ADD COLUMNS (a BIGINT)")
    }
    // rename BACK to the birth name erases the map entirely
    spark.sql(s"ALTER TABLE $T RENAME COLUMN c TO a")
    assert(GraftSqlTable.renameMap(dir).isEmpty)
    assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 6L)
  }

  test("footer aggregates push down through a rename on physical references") {
    import spark.implicits._
    wh: Unit
    val T = "grnc.ns.fagg"
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT)")
    (1L to 1000L).map(k => (k, k * 2)).toDF("k", "v")
      .createOrReplaceTempView("rn_agg_src")
    spark.sql(s"INSERT INTO $T SELECT * FROM rn_agg_src")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN k TO key")
    spark.conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_AGGREGATE_PUSHDOWN_ENABLED.key, "true")
    try {
      // r11: previously a renamed reference REFUSED pushdown for the
      // rest of the table's life; now the v2 Aggregation is rebuilt on
      // the physical (storage) names the footers actually carry
      val q = spark.sql(s"SELECT count(*), min(key), max(key), min(v) FROM $T")
      val row = q.head
      assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
        (1000L, 1L, 1000L, 2L))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"), plan.take(2000))
      assert(plan.contains("MIN(k)"), // the PHYSICAL name reaches the scan
        plan.take(2000))
    } finally spark.conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_AGGREGATE_PUSHDOWN_ENABLED.key, "false")
  }

  test("GROUPED aggregates through a rename: correct, and footer pushdown falls back (ADVICE r11)") {
    import spark.implicits._
    wh: Unit
    val T = "grnc.ns.gagg"
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT)")
    (1L to 1000L).map(k => (k % 7, k)).toDF("k", "v")
      .createOrReplaceTempView("rn_gagg_src")
    spark.sql(s"INSERT INTO $T SELECT * FROM rn_gagg_src")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN k TO key")
    spark.conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_AGGREGATE_PUSHDOWN_ENABLED.key, "true")
    try {
      // ParquetScanBuilder only pushes GROUP BY over PARTITION columns
      // and the inner table declares none — so a grouped aggregate must
      // take the ordinary scan+agg plan. ADVICE r11: the positional
      // output contract for a PUSHED group-by through a rename is
      // undocumented; this pins the fallback path (correct values, no
      // grouped PushedAggregation) so a Spark upgrade that starts
      // pushing it fails loudly here instead of silently mis-mapping.
      val q = spark.sql(
        s"SELECT key, count(*) AS n, min(v) AS lo FROM $T GROUP BY key ORDER BY key")
      val rows = q.collect()
      assert(rows.length == 7)
      assert(rows.map(_.getLong(1)).sum == 1000L)
      assert(rows.head.getLong(0) == 0L && rows.head.getLong(2) == 7L)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("PushedAggregation: [COUNT"),
        "grouped aggregates must NOT ride the footer path: " + plan.take(2000))
      // the ungrouped shape in the same session still pushes (sanity)
      val p2 = spark.sql(s"SELECT count(*), min(key) FROM $T")
        .queryExecution.executedPlan.toString
      assert(p2.contains("PushedAggregation: [COUNT"), p2.take(2000))
    } finally spark.conf.set(org.apache.spark.sql.internal.SQLConf.PARQUET_AGGREGATE_PUSHDOWN_ENABLED.key, "false")
  }

  test("keyed table: delta UPDATE and merge-on-read SELECT through a renamed column") {
    wh: Unit
    val T = "grnc.ns.keyed"
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT, tag STRING) " +
      "TBLPROPERTIES ('write.key'='k')")
    spark.sql(s"INSERT INTO $T VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'x')")
    val dir = s"$wh/ns/keyed"
    val before = ManifestTable.sqlEntriesAt(dir, ManifestTable.currentVersion(dir))
      .filter(_.isData).map(_.path).toSet

    spark.sql(s"ALTER TABLE $T RENAME COLUMN v TO score")
    // the key stays physical==logical; renaming IT refuses
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T RENAME COLUMN k TO id")
    }
    // delta UPDATE through the renamed value column: one equality-delete
    // + append commit, ZERO pre-mutation files rewritten
    spark.sql(s"UPDATE $T SET score = score + 5 WHERE k = 2")
    val vNow = ManifestTable.currentVersion(dir)
    val after = ManifestTable.sqlEntriesAt(dir, vNow)
    assert(before.subsetOf(after.filter(_.isData).map(_.path).toSet),
      "delta UPDATE must keep every pre-mutation data file")
    assert(after.exists(_.deleteKey.isDefined),
      "the UPDATE must land as an equality-delete commit")
    // merge-on-read SELECT serves the renamed schema over physical files
    val got = spark.sql(s"SELECT k, score FROM $T ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 25L), (3L, 30L)))
    // filter + projection through the MoR scan with the renamed name
    assert(spark.sql(s"SELECT sum(score) FROM $T WHERE score >= 25")
      .head.getLong(0) == 55L)
    // declaring a RENAMED column load-bearing refuses (the other guard
    // direction): write.key must stay physical==logical
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('write.key'='score')")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T SET TBLPROPERTIES ('write.order'='score')")
    }
  }

  test("dynamic overwrite keyed on a renamed column translates bounds and filter") {
    wh: Unit
    val T = "grnc.ns.dynov"
    spark.sql(s"CREATE TABLE $T (day BIGINT, amt BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1, 100), (1, 101), (2, 200), (2, 201)")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN day TO event_day")
    // replace event_day=2 with corrected rows, one atomic commit; the
    // predicate names the LOGICAL column, stats + files speak physical
    spark.sql("SELECT 2 AS event_day, 999 AS amt")
      .writeTo(T).overwrite(col("event_day") === 2L)
    val got = spark.sql(s"SELECT event_day, sum(amt) AS s FROM $T " +
      "GROUP BY event_day ORDER BY event_day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 201L), (2L, 999L)))
  }

  test("RTAS clears stale tombstones and rename maps with the replaced table") {
    wh: Unit
    val T = "grnc.ns.rtas"
    spark.sql(s"CREATE TABLE $T (a BIGINT, x BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1, 7)")
    spark.sql(s"ALTER TABLE $T DROP COLUMN x")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN a TO b")
    val dir = s"$wh/ns/rtas"
    assert(GraftSqlTable.droppedColumns(dir).nonEmpty &&
      GraftSqlTable.renameMap(dir).nonEmpty)
    // the replacement legitimately declares a column named 'x' — the OLD
    // table's tombstone must not hide it, and the old rename map must
    // not mistranslate the new scans
    spark.sql(s"REPLACE TABLE $T AS SELECT 5L AS a, 6L AS x")
    assert(GraftSqlTable.droppedColumns(dir).isEmpty,
      "RTAS must clear the replaced table's tombstones")
    assert(GraftSqlTable.renameMap(dir).isEmpty,
      "RTAS must clear the replaced table's rename map")
    assert(spark.sql(s"SELECT a, x FROM $T").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 6L)))
  }

  test("constraints, defaults, and streaming reads survive a rename") {
    wh: Unit
    val T = "grnc.ns.mixed"
    spark.sql(s"CREATE TABLE $T (a BIGINT, v BIGINT DEFAULT 42)")
    spark.sql(s"INSERT INTO $T VALUES (1, 5)")
    spark.sql(s"ALTER TABLE $T RENAME COLUMN v TO amount")
    // a constraint-referenced column refuses rename; a renamed column
    // accepts NEW constraints (validation probes read logical names)
    spark.sql(s"ALTER TABLE $T ADD CONSTRAINT pos CHECK (amount > 0)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $T RENAME COLUMN amount TO amt")
    }
    // enforcement gates writes through the renamed name
    intercept[Exception] {
      spark.sql(s"INSERT INTO $T VALUES (2, -1)")
    }
    // the CREATE-time DEFAULT rides the rename (metadata travels)
    spark.sql(s"INSERT INTO $T (a) VALUES (3)")
    assert(spark.sql(s"SELECT amount FROM $T WHERE a = 3").head.getLong(0) == 42L)
    // streaming read over the renamed table serves the logical schema
    val dirCp = java.nio.file.Files.createTempDirectory("grnc_cp").toString
    val nm = "grnc_mem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = spark.readStream.table(T)
      .groupBy().agg(sum(col("amount")).as("s"))
      .writeStream.format("memory").queryName(nm).outputMode("complete")
      .option("checkpointLocation", s"$dirCp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(nm).head.getLong(0) == 47L)
  }
}
