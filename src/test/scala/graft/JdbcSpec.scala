package graft

import java.util.Properties

import graft.operators.Relational
import graft.pipeline.RappelConso
import graft.sources.JdbcIO

/** Real JDBC round-trip against embedded Derby (ships with Spark): DDL →
  * append → key-pruned scan → anti-join → second append — the reference's
  * J1/J2/W1/D1 path (`spark_streaming.py:73-87`, `create_table.py:29-45`)
  * without a Postgres container.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("DDL + append + key-pruned scan + idempotent re-append (J1/J2/W1/D1)") {
    val table = "rappel_conso_table"
    JdbcIO.createAllTextTable(url, table, RappelConso.dbFields,
      "reference_fiche", props, colType = "VARCHAR(512)")

    def mkRow(ref: String) = RappelConso.dbFields.map {
      case "reference_fiche" => ref
      case f => s"v_$f".take(20)
    }
    val batch1 = Seq(mkRow("R-1"), mkRow("R-2"))
      .map(vs => org.apache.spark.sql.Row(vs: _*))
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(batch1), RappelConso.schema)
    JdbcIO.append(df1, url, table, props)
    assert(JdbcIO.readTable(spark, url, table, props).count() == 2)

    // key-pruned existing scan → anti-join → only the new key lands
    val keys = JdbcIO.readKeys(spark, url, table, "reference_fiche", props)
    assert(keys.columns.toSeq == Seq("reference_fiche".toUpperCase) ||
      keys.columns.toSeq == Seq("reference_fiche")) // Derby uppercases identifiers
    val keysNormalized = keys.toDF("reference_fiche")
    val batch2 = Seq(mkRow("R-2"), mkRow("R-3"))
      .map(vs => org.apache.spark.sql.Row(vs: _*))
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(batch2), RappelConso.schema)
    val fresh = Relational.idempotentAppend(df2, keysNormalized, "reference_fiche")
    assert(fresh.select("reference_fiche").as[String].collect().toSeq == Seq("R-3"))
    JdbcIO.append(fresh, url, table, props)
    val finalRows = JdbcIO.readTable(spark, url, table, props)
    assert(finalRows.count() == 3)
    assert(finalRows.select("reference_fiche").as[String].collect().sorted.toSeq ==
      Seq("R-1", "R-2", "R-3"))
  }

  test("readKeys splits the key scan across >1 JDBC partitions") {
    val table = "keyed_events"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (id INT, ref VARCHAR(32))")
      (0 until 100).foreach(i => st.execute(s"INSERT INTO $table VALUES ($i, 'K-$i')"))
      st.close()
    } finally conn.close()

    val keys = JdbcIO.readKeys(spark, url, table, "ref", props,
      numPartitions = 4, partitionExpr = Some("id"))
    assert(keys.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${keys.rdd.getNumPartitions}")
    assert(keys.count() == 100)
    assert(keys.toDF("ref").as[String].collect().toSet ==
      (0 until 100).map(i => s"K-$i").toSet)
    // bounds auto-fetch didn't drop boundary rows
    val explicit = JdbcIO.readKeys(spark, url, table, "ref", props,
      numPartitions = 4, partitionExpr = Some("id"), bounds = Some((0L, 99L)))
    assert(explicit.count() == 100)
  }

  test("readKeys on an empty table: NULL min/max falls back to one partition") {
    val table = "empty_keys"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (id INT, ref VARCHAR(32))")
      st.close()
    } finally conn.close()
    // MIN/MAX over zero rows is SQL NULL; getLong would silently read (0,0)
    // and hand spark.read.jdbc degenerate bounds — the wasNull guard must
    // route to the single-partition path instead.
    val keys = JdbcIO.readKeys(spark, url, table, "ref", props,
      numPartitions = 4, partitionExpr = Some("id"))
    assert(keys.count() == 0)
    assert(keys.rdd.getNumPartitions == 1)
  }

  test("syncFromFeed replays merge/delete/append into JDBC; duplicate replay is a no-op (r13)") {
    import graft.sources.ManifestTable
    val table = "cdc_sink"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (k BIGINT PRIMARY KEY, v BIGINT)")
      st.close()
    } finally conn.close()
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcout").toString + "/t"
    ManifestTable.commit((1L to 20L).map(k => (k, k * 2)).toDF("k", "v"),
      dir, append = false)                                                // v1
    ManifestTable.merge(Seq((4L, 400L), (8L, 800L)).toDF("k", "v"),
      dir, "k")                                                           // v2 update
    ManifestTable.delete(Seq(5L, 10L).toDF("k"), dir, "k")                // v3 delete
    ManifestTable.commit(Seq((5L, 555L), (21L, 42L)).toDF("k", "v"),
      dir, append = true)                                                 // v4: re-used key + new
    JdbcIO.append(ManifestTable.read(spark, dir, 1), url, table, props)
    assert(JdbcIO.syncFromFeed(spark, dir, url, table, "k", props, 1) == 4)
    def sinkMap() = JdbcIO.readTable(spark, url, table, props)
      .toDF("k", "v").as[(Long, Long)].collect().toMap
    val expect = ((1L to 20L).map(k => k -> k * 2).toMap
      ++ Map(4L -> 400L, 8L -> 800L) -- Seq(5L, 10L)
      ++ Map(5L -> 555L, 21L -> 42L))
    assert(sinkMap() == expect)
    // crash recovery = re-run: the full replay must change nothing
    JdbcIO.syncFromFeed(spark, dir, url, table, "k", props, 1)
    assert(sinkMap() == expect)
    // an incremental follow-up replays only the new commit
    ManifestTable.commit(Seq((22L, 44L)).toDF("k", "v"), dir, append = true)
    JdbcIO.syncFromFeed(spark, dir, url, table, "k", props, 4)
    assert(sinkMap() == expect + (22L -> 44L))
  }

  test("syncFromFeed stays delta-bounded: the sink key set is never fully scanned (r14)") {
    import graft.sources.ManifestTable
    val table = "cdc_sink_bd"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (k BIGINT PRIMARY KEY, v BIGINT)")
      st.close()
    } finally conn.close()
    // a "large" pre-existing sink the delta must never scan
    JdbcIO.append((1L to 5000L).map(k => (k, k)).toDF("k", "v"),
      url, table, props)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcbd").toString + "/t"
    ManifestTable.commit((1L to 5000L).map(k => (k, k)).toDF("k", "v"),
      dir, append = false)
    // delta: 3 updates + 2 fresh keys (spanning multiple probe batches
    // is covered below); replay from v1
    ManifestTable.merge(Seq((7L, 70L), (9L, 90L), (11L, 110L))
      .toDF("k", "v"), dir, "k")
    ManifestTable.commit(Seq((6001L, 1L), (6002L, 2L)).toDF("k", "v"),
      dir, append = true)
    val scans0 = JdbcIO.fullKeyScans.get()
    JdbcIO.syncFromFeed(spark, dir, url, table, "k", props, 1)
    assert(JdbcIO.fullKeyScans.get() == scans0,
      "CDC-out must probe the delta's keys point-wise, never run a " +
        "full sink key scan (readKeys)")
    val sink = JdbcIO.readTable(spark, url, table, props)
      .toDF("k", "v").as[(Long, Long)].collect().toMap
    assert(sink(7L) == 70L && sink(9L) == 90L && sink(11L) == 110L &&
      sink(6001L) == 1L && sink(6002L) == 2L && sink.size == 5002)
    // probeExistingKeys itself: multi-batch probe returns exactly the
    // present subset, with the caller's types
    val probed = JdbcIO.probeExistingKeys(
      ((4990L to 5010L) ++ Seq(6001L)).toDF("k"), url, table, "k", props,
      batchSize = 7).as[Long].collect().toSet
    assert(probed == ((4990L to 5000L).toSet + 6001L))
  }

  test("probeExistingKeys compares in the DB's typed domain — DECIMAL scale never fakes absence (ADVICE r14)") {
    val table = "typed_probe"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (k DECIMAL(20,3) PRIMARY KEY, v INT)")
      st.execute(s"INSERT INTO $table VALUES (123.000, 1), (7.500, 2)")
      st.close()
    } finally conn.close()
    // Spark's default decimal encoding carries scale 18 — its string
    // rendering ('123.000000000000000000') never equals the driver's
    // ('123.000'), which used to mark PRESENT keys absent and re-insert
    // them on replay. The probe must let the DATABASE compare the bound
    // parameter instead.
    val probe = Seq(Some(BigDecimal("123.000000")),
      Some(BigDecimal("7.5")), Some(BigDecimal("9.125")), None)
      .toDF("k")
    val found = JdbcIO.probeExistingKeys(probe, url, table, "k", props)
      .collect().map(_.getDecimal(0).doubleValue()).toSet
    assert(found == Set(123.0, 7.5),
      s"present DECIMAL keys must probe present regardless of scale " +
        s"representation; NULL keys are absent by definition: $found")
  }

  test("syncFromFeed rejects NULL insert keys loudly (no silent replay duplication)") {
    import graft.sources.ManifestTable
    val table = "cdc_null"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE TABLE $table (k BIGINT PRIMARY KEY, v BIGINT)")
      st.close()
    } finally conn.close()
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcnull")
      .toString + "/t"
    ManifestTable.commit(Seq((Some(1L), 10L), (Some(2L), 20L))
      .toDF("k", "v"), dir, append = false)
    ManifestTable.commit(Seq((Option.empty[Long], 30L), (Some(3L), 30L))
      .toDF("k", "v"), dir, append = true)
    val e = intercept[IllegalArgumentException] {
      JdbcIO.syncFromFeed(spark, dir, url, table, "k", props, 1)
    }
    assert(e.getMessage.contains("NULL"),
      s"the refusal must name the null-key contract: ${e.getMessage}")
  }
}
