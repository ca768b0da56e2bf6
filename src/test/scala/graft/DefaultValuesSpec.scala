package graft

/** Column DEFAULT declarations on [[graft.sources.v2.GraftCatalog]]
  * tables: stored in the schema's JSON twin (`_schema.json` — DDL text
  * cannot carry metadata), compiled into INSERTs by Spark's analyzer
  * from the reported schema's CURRENT_DEFAULT, and applied to pre-ALTER
  * rows through EXISTS_DEFAULT at scan time. */
class DefaultValuesSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_defaults")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gdv", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.warehouse", d.toString)
    d.toString
  }

  test("CREATE TABLE with DEFAULT: partial INSERTs and the DEFAULT keyword fill in") {
    wh: Unit
    spark.sql("""CREATE TABLE gdv.ns.t (
                |  k BIGINT,
                |  status STRING DEFAULT 'new',
                |  score BIGINT DEFAULT 100
                |)""".stripMargin)
    spark.sql("INSERT INTO gdv.ns.t (k) VALUES (1)")
    spark.sql("INSERT INTO gdv.ns.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql("INSERT INTO gdv.ns.t VALUES (3, 'done', 7)")
    val got = spark.sql("SELECT k, status, score FROM gdv.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "new", 100L), (2L, "new", 100L), (3L, "done", 7L)))
  }

  test("ALTER ADD COLUMN with DEFAULT: old rows read the default, new inserts fill it") {
    wh: Unit
    spark.sql("CREATE TABLE gdv.ns.evo (k BIGINT)")
    spark.sql("INSERT INTO gdv.ns.evo VALUES (1), (2)")
    spark.sql("ALTER TABLE gdv.ns.evo ADD COLUMNS (tier STRING DEFAULT 'legacy')")
    val pre = spark.sql("SELECT k, tier FROM gdv.ns.evo ORDER BY k").collect()
    assert(pre.map(_.getString(1)).toSeq == Seq("legacy", "legacy"),
      "pre-ALTER rows must read the EXISTS_DEFAULT, not NULL")
    spark.sql("INSERT INTO gdv.ns.evo (k) VALUES (3)")
    spark.sql("INSERT INTO gdv.ns.evo VALUES (4, 'vip')")
    val got = spark.sql("SELECT k, tier FROM gdv.ns.evo ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "legacy"), (2L, "legacy"), (3L, "legacy"), (4L, "vip")))
    // a NOT NULL add without a default refuses on a non-empty table
    intercept[Exception] {
      spark.sql("ALTER TABLE gdv.ns.evo ADD COLUMNS (must STRING NOT NULL)")
    }
  }

  test("CALL compact preserves EXISTS_DEFAULTs (reads the catalog view, not raw files)") {
    wh: Unit
    spark.sql("CREATE TABLE gdv.ns.cmp (k BIGINT)")
    spark.sql("INSERT INTO gdv.ns.cmp VALUES (1), (2), (3)")        // pre-ALTER file
    spark.sql("ALTER TABLE gdv.ns.cmp ADD COLUMNS (score BIGINT DEFAULT 100)")
    spark.sql("INSERT INTO gdv.ns.cmp VALUES (4, 7)")               // post-ALTER file
    assert(spark.sql("SELECT sum(score) FROM gdv.ns.cmp").head.getLong(0) == 307L)
    // the maintenance rewrite must materialize the EXISTS_DEFAULT the
    // catalog readers see — a raw mergeSchema compact writes NULL for
    // the pre-ALTER rows and the default is lost FOREVER (r11; same
    // class as the overwriteWhere mixed-touch-set fix)
    spark.sql("CALL gdv.system.compact('ns.cmp', 1)").collect()
    assert(spark.sql("SELECT sum(score) FROM gdv.ns.cmp").head.getLong(0) == 307L,
      "compaction must not replace EXISTS_DEFAULT values with NULL")
    assert(spark.sql("SELECT count(*) FROM gdv.ns.cmp WHERE score = 100")
      .head.getLong(0) == 3L)
  }

  test("CALL binpack preserves EXISTS_DEFAULTs (reads the catalog view, not raw files) (r13)") {
    wh: Unit
    spark.sql("CREATE TABLE gdv.ns.bp (k BIGINT)")
    spark.sql("INSERT INTO gdv.ns.bp VALUES (1), (2), (3)")         // pre-ALTER small file
    spark.sql("ALTER TABLE gdv.ns.bp ADD COLUMNS (score BIGINT DEFAULT 100)")
    spark.sql("INSERT INTO gdv.ns.bp VALUES (4, 7)")                // post-ALTER small file
    assert(spark.sql("SELECT sum(score) FROM gdv.ns.bp").head.getLong(0) == 307L)
    // same contract as compact, through the SMALL-FILE merge path: the
    // binpack rewrite must read each sub-threshold file against the
    // catalog's physical schema, or the pre-ALTER rows' EXISTS_DEFAULT
    // freezes to NULL in the merged file (ADVICE r12 high — the exact
    // bug compact fixed in r11, reintroduced by the raw-mergeSchema
    // compactSmall)
    spark.sql("CALL gdv.system.binpack('ns.bp', 1048576L)").collect()
    assert(spark.sql("SELECT sum(score) FROM gdv.ns.bp").head.getLong(0) == 307L,
      "binpack must not replace EXISTS_DEFAULT values with NULL")
    assert(spark.sql("SELECT count(*) FROM gdv.ns.bp WHERE score = 100")
      .head.getLong(0) == 3L)
  }
}
