package graft

/** Enforced CHECK constraints on [[graft.sources.v2.GraftCatalog]]
  * tables: DDL round-trip, write-time enforcement (Spark-injected), and
  * validation-on-add. */
class CheckConstraintSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_checks")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gcc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcc.warehouse", d.toString)
    d.toString
  }

  test("CREATE TABLE with CHECK: violating inserts refuse, clean ones land") {
    wh: Unit
    spark.sql("""CREATE TABLE gcc.ns.t (
                |  k BIGINT, cents BIGINT,
                |  CONSTRAINT nonneg CHECK (cents >= 0)
                |)""".stripMargin)
    spark.sql("INSERT INTO gcc.ns.t VALUES (1, 100), (2, 0)")
    assert(spark.sql("SELECT count(*) FROM gcc.ns.t").head.getLong(0) == 2)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcc.ns.t VALUES (3, -5)")
    }
    assert(e.getMessage.toLowerCase.contains("nonneg") ||
      e.getMessage.toLowerCase.contains("check"), e.getMessage)
    // the failed insert committed nothing
    assert(spark.sql("SELECT count(*) FROM gcc.ns.t").head.getLong(0) == 2)
    // NULL satisfies a CHECK per SQL semantics (unknown is not a violation)
    spark.sql("INSERT INTO gcc.ns.t VALUES (4, NULL)")
    assert(spark.sql("SELECT count(*) FROM gcc.ns.t").head.getLong(0) == 3)
  }

  test("CHECK constraints gate row-level SQL too: delta UPDATE/MERGE and CoW UPDATE") {
    wh: Unit
    spark.sql("CREATE TABLE gcc.ns.rk (k BIGINT, v BIGINT, " +
      "CONSTRAINT pos CHECK (v >= 0)) TBLPROPERTIES('write.key'='k')")
    spark.sql("INSERT INTO gcc.ns.rk VALUES (1, 10), (2, 20)")
    intercept[Exception] { // the delta path must not smuggle violations in
      spark.sql("UPDATE gcc.ns.rk SET v = v - 100 WHERE k = 1")
    }
    assert(spark.sql("SELECT v FROM gcc.ns.rk WHERE k = 1").head.getLong(0) == 10L,
      "a refused delta UPDATE must leave the row untouched")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cc_msrc AS SELECT 2 AS k, -7 AS nv")
    intercept[Exception] {
      spark.sql("MERGE INTO gcc.ns.rk t USING cc_msrc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.nv")
    }
    assert(spark.sql("SELECT v FROM gcc.ns.rk WHERE k = 2").head.getLong(0) == 20L)
    // the unkeyed group copy-on-write path enforces too
    spark.sql("CREATE TABLE gcc.ns.ru (k BIGINT, v BIGINT, " +
      "CONSTRAINT pos CHECK (v >= 0))")
    spark.sql("INSERT INTO gcc.ns.ru VALUES (1, 10)")
    intercept[Exception] {
      spark.sql("UPDATE gcc.ns.ru SET v = -5 WHERE k = 1")
    }
    assert(spark.sql("SELECT v FROM gcc.ns.ru WHERE k = 1").head.getLong(0) == 10L,
      "a refused CoW UPDATE must leave the snapshot untouched")
  }

  test("ALTER TABLE ADD CONSTRAINT validates existing rows first") {
    import spark.implicits._
    wh: Unit
    Seq((1L, 10L), (2L, -3L)).toDF("k", "v").createOrReplaceTempView("cc_src")
    spark.sql("CREATE TABLE gcc.ns.dirty AS SELECT * FROM cc_src")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcc.ns.dirty ADD CONSTRAINT pos CHECK (v >= 0)")
    }
    assert(e.getMessage.contains("violate"), e.getMessage)
    // a satisfiable constraint lands, and is enforced from then on
    spark.sql("ALTER TABLE gcc.ns.dirty ADD CONSTRAINT lo CHECK (v >= -10)")
    intercept[Exception] {
      spark.sql("INSERT INTO gcc.ns.dirty VALUES (3, -100)")
    }
    spark.sql("INSERT INTO gcc.ns.dirty VALUES (3, -10)")
    assert(spark.sql("SELECT count(*) FROM gcc.ns.dirty").head.getLong(0) == 3)
    // DROP CONSTRAINT lifts the gate
    spark.sql("ALTER TABLE gcc.ns.dirty DROP CONSTRAINT lo")
    spark.sql("INSERT INTO gcc.ns.dirty VALUES (4, -100)")
    assert(spark.sql("SELECT count(*) FROM gcc.ns.dirty").head.getLong(0) == 4)
    intercept[Exception] {
      spark.sql("ALTER TABLE gcc.ns.dirty DROP CONSTRAINT nope")
    }
    spark.sql("ALTER TABLE gcc.ns.dirty DROP CONSTRAINT IF EXISTS nope")
  }

  test("checks survive RTAS only when restated; PRIMARY KEY refuses loudly") {
    import spark.implicits._
    wh: Unit
    Seq((1L, 5L)).toDF("k", "v").createOrReplaceTempView("cc_src2")
    spark.sql("CREATE TABLE gcc.ns.r (k BIGINT, v BIGINT, CHECK (v > 0))")
    spark.sql("INSERT INTO gcc.ns.r SELECT * FROM cc_src2")
    // REPLACE TABLE declares a fresh contract — the old check does not
    // silently carry over (it may not even type against the new schema)
    spark.sql("REPLACE TABLE gcc.ns.r AS SELECT k, v - 10 AS v FROM cc_src2")
    assert(spark.sql("SELECT v FROM gcc.ns.r").head.getLong(0) == -5L)
    // unenforceable constraint kinds refuse instead of lying
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcc.ns.pk (k BIGINT, PRIMARY KEY (k) RELY)")
    }
    assert(e.getMessage.contains("write.key"), e.getMessage)
  }
}
