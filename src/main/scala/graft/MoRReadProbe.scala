package graft

import org.apache.spark.sql.SparkSession

/** Columnar merge-on-read read-throughput probe: a 5M-row keyed table
  * with a small delta chain, then repeated aggregate scans — the
  * delete-carrying read path isolated from commit costs. Catalog-only
  * (no library imports) so the identical class can run against
  * pre/post-columnar builds of the engine. */
object MoRReadProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 5000000L
    val wh = s"${sys.props("java.io.tmpdir")}/morprobe_${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("mor-read-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.gmrp", "graft.sources.v2.GraftCatalog")
      .config("spark.sql.catalog.gmrp.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE TABLE gmrp.ns.t (k BIGINT, v BIGINT, s STRING) " +
      "TBLPROPERTIES ('write.key'='k')")
    spark.sql(s"INSERT INTO gmrp.ns.t " +
      s"SELECT id, id * 7, repeat('x', 40) FROM range($rows)")
    // a realistic small delta chain: 3 mutations touching 0.1% each
    (1 to 3).foreach { i =>
      spark.sql(s"UPDATE gmrp.ns.t SET v = v + 1 WHERE k % 1000 = $i")
    }
    def scanOnce(): Long = {
      val t0 = System.nanoTime()
      spark.sql("SELECT count(*), sum(v), sum(length(s)) FROM gmrp.ns.t " +
        "WHERE v >= 0").collect()
      (System.nanoTime() - t0) / 1000000L
    }
    (1 to 2).foreach(_ => scanOnce())               // warm
    val times = (1 to 5).map(_ => scanOnce()).sorted
    println(s"""{"probe":"mor_read","rows":$rows,"median_ms":${times(2)},"min_ms":${times.head}}""")
    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(): Unit }
    rm(new java.io.File(wh))
  }
}
