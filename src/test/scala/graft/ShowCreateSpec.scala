package graft

/** SHOW CREATE TABLE / DESCRIBE round-trips for catalog tables: the
  * emitted DDL must re-create an equivalent table (schema, partitioning,
  * layout properties) — the survivability contract for "dump my
  * warehouse's DDL and rebuild it elsewhere". */
class ShowCreateSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_showcreate")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gshc", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gshc.warehouse", d.toString)
    d.toString
  }

  test("SHOW CREATE TABLE emits DDL that rebuilds an equivalent table") {
    wh: Unit
    spark.sql("""CREATE TABLE gshc.ns.t (
                |  k BIGINT, ts TIMESTAMP_NTZ, v BIGINT
                |) PARTITIONED BY (bucket(8, k))
                |TBLPROPERTIES ('write.target-file-size'='1048576')""".stripMargin)
    val ddl = spark.sql("SHOW CREATE TABLE gshc.ns.t").head.getString(0)
    assert(ddl.contains("bucket(8, k)"), ddl)
    assert(ddl.contains("write.target-file-size"), ddl)
    // the emitted DDL re-creates an equivalent table under a new name
    val ddl2 = ddl.replace("gshc.ns.t", "gshc.ns.t2")
    spark.sql(ddl2)
    assert(spark.table("gshc.ns.t2").schema == spark.table("gshc.ns.t").schema)
    val p2 = spark.sql("SHOW CREATE TABLE gshc.ns.t2").head.getString(0)
    assert(p2.contains("bucket(8, k)") && p2.contains("write.target-file-size"))
    // DESCRIBE shows the partitioning
    val desc = spark.sql("DESCRIBE TABLE gshc.ns.t").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("k") && desc.contains("ts"))
  }

  test("SHOW CREATE TABLE carries hidden transforms and write.order") {
    wh: Unit
    spark.sql("CREATE TABLE gshc.ns.ht (id BIGINT, d DATE) PARTITIONED BY (days(d))")
    val ddl = spark.sql("SHOW CREATE TABLE gshc.ns.ht").head.getString(0)
    assert(ddl.contains("days(d)"), ddl)
    spark.sql("CREATE TABLE gshc.ns.wo (k BIGINT) TBLPROPERTIES ('write.order'='k')")
    val ddl2 = spark.sql("SHOW CREATE TABLE gshc.ns.wo").head.getString(0)
    assert(ddl2.contains("write.order") && ddl2.contains("'k'"), ddl2)
  }
}
