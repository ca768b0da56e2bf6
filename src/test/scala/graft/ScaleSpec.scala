package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Scale-mechanism specs: salted joins return plain-join results; bucketed
  * tables co-locate a join with NO shuffle exchange on either side.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain join results under a hot key") {
    // 90% of fact rows share key 1 (the pathological case)
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 10, i.toLong))
      .toDF("k", "v")
    val dim = (0L to 10L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"name")
    val salted = Relational.saltedJoin(fact, dim, "k", salts = 8, saltBy = $"v")
      .select($"k", $"v", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("partitioned parquet sink prunes partitions at read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables(spark, "/root/testdata/sf0.001").lineitem
      .write.partitionBy("l_returnflag", "l_linestatus").parquet(s"$tmp/li")
    // hive-style directory layout
    assert(new java.io.File(s"$tmp/li/l_returnflag=R").exists())
    val pruned = spark.read.parquet(s"$tmp/li")
      .filter($"l_returnflag" === "R" && $"l_linestatus" === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // pruned read matches the unpartitioned filter
    val expected = Tables(spark, "/root/testdata/sf0.001").lineitem
      .filter($"l_returnflag" === "R" && $"l_linestatus" === "F").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the metastore is per-JVM but table locations persist on disk — a
    // stale location from a previous test run blocks CREATE
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) { def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(d) }
    }
    Tables(spark, "/root/testdata/sf0.001").orders
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables(spark, "/root/testdata/sf0.001").lineitem
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // force the sort-merge path: with auto-broadcast on, a small dim would
    // make this assertion vacuous (broadcast joins never hash-exchange)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // co-located: the join must not introduce a shuffle on either side
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected exchange in:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
