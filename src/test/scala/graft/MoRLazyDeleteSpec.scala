package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestTable
import graft.sources.v2.MoRDeleteKeyLoader

/** The over-ceiling equality-delete path (r16): when the footer-estimated
  * delete-key count exceeds the driver ceiling, the merge-on-read scan
  * ships delete FILE PATHS instead of collected rows and each executor
  * JVM loads + caches the key set once — the Iceberg posture. The
  * ceiling is a test-overridable system property; below it the eager
  * (driver-collected, broadcast) path is byte-identical to before. */
class MoRLazyDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_mld_wh").toString
    spark.conf.set("spark.sql.catalog.gmld", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmld.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmld.ns")
    d
  }

  test("over-ceiling equality deletes load executor-side, once per JVM, identical to the eager read") {
    wh: Unit
    spark.sql("CREATE TABLE gmld.ns.t (k BIGINT, grp STRING, v BIGINT)")
    val dir = s"$wh/ns/t"
    ManifestTable.commit((1L to 400L).map(i => (i, s"g${i % 7}", i * 3))
      .toDF("k", "grp", "v"), dir, append = true): Unit
    // two delete commits → a key chain with two applicable-suffix groups
    ManifestTable.delete((1L to 60L).filter(_ % 4 == 0).toDF("k"), dir, "k")
    ManifestTable.commit(Seq((1001L, "gx", 1L)).toDF("k", "grp", "v"),
      dir, append = true): Unit
    ManifestTable.delete((100L to 200L).filter(_ % 3 == 0).toDF("k"), dir, "k")
    val expected = ManifestTable.read(spark, dir)
      .select($"k", $"grp", $"v").as[(Long, String, Long)].collect().toSet
    assert(expected.nonEmpty)

    // the eager path first (default ceiling): baseline answer
    val eager = spark.sql("SELECT k, grp, v FROM gmld.ns.t")
      .as[(Long, String, Long)].collect().toSet
    assert(eager == expected)

    // force the over-ceiling path: every equality delete now ships as
    // file paths; executors load once per (files, key cols) set
    val l0 = MoRDeleteKeyLoader.loads.get()
    sys.props("graft.mor.maxDeleteKeys") = "8"
    try {
      val lazyRead = spark.sql("SELECT k, grp, v FROM gmld.ns.t")
        .as[(Long, String, Long)].collect().toSet
      assert(lazyRead == expected,
        "the executor-loaded delete sets must serve the same rows as " +
          "the driver-collected path")
      val loadsAfter = MoRDeleteKeyLoader.loads.get() - l0
      assert(loadsAfter >= 1 && loadsAfter <= 2,
        s"each distinct (files, key cols) set must load at most once per " +
          s"JVM regardless of partition count (got $loadsAfter)")
      // a second scan hits the process cache — zero further loads
      spark.sql("SELECT count(*) FROM gmld.ns.t").collect()
      assert(MoRDeleteKeyLoader.loads.get() - l0 == loadsAfter,
        "a repeat scan must reuse the cached executor-side key sets")
      // pushed filters + aggregates still correct on the lazy path
      val filtered = spark.sql(
        "SELECT count(*) AS n, sum(v) AS s FROM gmld.ns.t WHERE k <= 200")
        .as[(Long, Long)].head()
      val expFiltered = (
        expected.count(_._1 <= 200).toLong,
        expected.filter(_._1 <= 200).map(_._3).sum)
      assert((filtered._1, filtered._2) == expFiltered)
    } finally sys.props.remove("graft.mor.maxDeleteKeys"): Unit
  }
}
