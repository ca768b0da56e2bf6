package graft

import graft.sources.ManifestTable

/** CTAS / REPLACE TABLE and SQL views through [[graft.sources.v2.GraftCatalog]]. */
class CtasViewsSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ctas_views")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gcv", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcv.warehouse", d.toString)
    d.toString
  }

  test("CTAS and REPLACE TABLE AS SELECT commit through the catalog") {
    import spark.implicits._
    wh: Unit
    (1L to 50L).map(k => (k, s"t$k")).toDF("k", "t")
      .createOrReplaceTempView("cv_src")
    spark.sql("CREATE TABLE gcv.ns.ct AS SELECT * FROM cv_src")
    assert(spark.sql("SELECT count(*), sum(k) FROM gcv.ns.ct").head.toSeq ==
      Seq(50L, (1L to 50L).sum))
    // the CTAS result is an ordinary manifest table: time travel works
    assert(ManifestTable.currentVersion(s"$wh/ns/ct") == 1)
    spark.sql("REPLACE TABLE gcv.ns.ct AS SELECT k FROM cv_src WHERE k <= 10")
    assert(spark.sql("SELECT count(*) FROM gcv.ns.ct").head.getLong(0) == 10)
    assert(spark.table("gcv.ns.ct").columns.toSeq == Seq("k"))
    spark.sql("CREATE OR REPLACE TABLE gcv.ns.ct2 AS SELECT k FROM cv_src")
    assert(spark.sql("SELECT count(*) FROM gcv.ns.ct2").head.getLong(0) == 50)
  }

  test("views: CREATE / SELECT / SHOW / ALTER / RENAME / DROP, definitions expand inline") {
    import spark.implicits._
    wh: Unit
    (1L to 100L).map(k => (k, k % 7)).toDF("k", "g")
      .createOrReplaceTempView("cv_src2")
    spark.sql("CREATE TABLE gcv.ns.base AS SELECT * FROM cv_src2")
    spark.sql("""CREATE VIEW gcv.ns.sums AS
                |SELECT g, count(*) AS n, sum(k) AS s
                |FROM gcv.ns.base GROUP BY g""".stripMargin)
    // the view expands into the reading query
    val r = spark.sql("SELECT sum(n), sum(s) FROM gcv.ns.sums").head
    assert(r.getLong(0) == 100L && r.getLong(1) == (1L to 100L).sum)
    // a view over the view — multi-level expansion
    spark.sql("CREATE VIEW gcv.ns.tops AS " +
      "SELECT g FROM gcv.ns.sums WHERE n >= 14")
    assert(spark.sql("SELECT count(*) FROM gcv.ns.tops").head.getLong(0) ==
      (0L until 7L).count(g => (1L to 100L).count(_ % 7 == g) >= 14))
    // the view sees table WRITES made after its creation (no staleness)
    (101L to 110L).map(k => (k, 0L)).toDF("k", "g")
      .createOrReplaceTempView("cv_more")
    spark.sql("INSERT INTO gcv.ns.base SELECT * FROM cv_more")
    assert(spark.sql("SELECT sum(n) FROM gcv.ns.sums").head.getLong(0) == 110L)
    // SHOW VIEWS lists it; tables and views don't collide
    val shown = spark.sql("SHOW VIEWS IN gcv.ns").collect().map(_.getString(1))
    assert(shown.toSet == Set("sums", "tops"))
    assert(!spark.sql("SHOW TABLES IN gcv.ns").collect()
      .map(_.getString(1)).contains("sums"))
    intercept[Exception] {
      spark.sql("CREATE TABLE gcv.ns.sums (k BIGINT)") // name held by a view
    }
    intercept[Exception] {
      spark.sql("CREATE VIEW gcv.ns.base AS SELECT 1 AS one") // held by a table
    }
    // ALTER VIEW properties round-trip
    spark.sql("ALTER VIEW gcv.ns.sums SET TBLPROPERTIES('owner.team'='ml')")
    assert(spark.sql("SHOW TBLPROPERTIES gcv.ns.sums").collect()
      .exists(r0 => r0.getString(0) == "owner.team" && r0.getString(1) == "ml"))
    spark.sql("ALTER VIEW gcv.ns.sums UNSET TBLPROPERTIES('owner.team')")
    assert(!spark.sql("SHOW TBLPROPERTIES gcv.ns.sums").collect()
      .exists(_.getString(0) == "owner.team"))
    // RENAME and DROP
    spark.sql("ALTER VIEW gcv.ns.tops RENAME TO gcv.ns.tops2")
    assert(spark.sql("SELECT count(*) FROM gcv.ns.tops2").head.getLong(0) >= 0)
    intercept[Exception] { spark.sql("SELECT * FROM gcv.ns.tops").collect() }
    spark.sql("DROP VIEW gcv.ns.tops2")
    spark.sql("DROP VIEW gcv.ns.sums")
    assert(spark.sql("SHOW VIEWS IN gcv.ns").collect().isEmpty)
    // dropping a missing view with IF EXISTS is quiet; without, loud
    spark.sql("DROP VIEW IF EXISTS gcv.ns.sums")
    intercept[Exception] { spark.sql("DROP VIEW gcv.ns.sums") }
  }

  test("views: definer semantics, column aliases, cycle refusal") {
    import spark.implicits._
    wh: Unit
    (1L to 30L).map(k => (k, k * 2)).toDF("k", "v")
      .createOrReplaceTempView("cv_src3")
    spark.sql("CREATE TABLE gcv.ns.dt AS SELECT * FROM cv_src3")
    // create the view FROM the graft catalog context with a RELATIVE
    // table name — the stored definition must capture the context
    val prevCat = spark.catalog.currentCatalog()
    spark.sql("USE gcv.ns")
    spark.sql("CREATE VIEW rel_v AS SELECT k, v FROM dt WHERE k <= 10")
    spark.sql(s"USE $prevCat")
    // read it from a DIFFERENT current catalog: the relative name 'dt'
    // must still mean gcv.ns.dt (definer semantics), not fail or bind
    // to the reader's context
    assert(spark.catalog.currentCatalog() == prevCat)
    assert(spark.sql("SELECT sum(k) FROM gcv.ns.rel_v").head.getLong(0) ==
      (1L to 10L).sum)
    // declared column aliases apply positionally
    spark.sql("CREATE VIEW gcv.ns.al_v (key, dbl) AS SELECT k, v FROM gcv.ns.dt")
    assert(spark.table("gcv.ns.al_v").columns.toSeq == Seq("key", "dbl"))
    assert(spark.sql("SELECT sum(dbl) FROM gcv.ns.al_v").head.getLong(0) ==
      (1L to 30L).map(_ * 2).sum)
    // a view cycle refuses loudly instead of looping the analyzer:
    // a -> b, then REPLACE b -> a
    spark.sql("CREATE VIEW gcv.ns.cyc_b AS SELECT k FROM gcv.ns.dt")
    spark.sql("CREATE VIEW gcv.ns.cyc_a AS SELECT k FROM gcv.ns.cyc_b")
    spark.sql("CREATE OR REPLACE VIEW gcv.ns.cyc_b AS SELECT k FROM gcv.ns.cyc_a")
    val e = intercept[Exception] { spark.sql("SELECT * FROM gcv.ns.cyc_a").collect() }
    assert(e.getMessage.toLowerCase.contains("recursive"), e.getMessage)
    // CTE names shadow views on bare references
    spark.sql("USE gcv.ns")
    val cte = spark.sql(
      "WITH rel_v AS (SELECT 99L AS k) SELECT sum(k) FROM rel_v").head.getLong(0)
    spark.sql(s"USE $prevCat")
    assert(cte == 99L, "a WITH-bound name must shadow the same-named view")
  }
}
