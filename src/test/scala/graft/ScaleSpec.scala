package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, ZOrder}

/** Scale-mechanism specs: salted joins return plain-join results; bucketed
  * tables co-locate a join with NO shuffle exchange on either side;
  * z-ordered parquet prunes row groups on BOTH clustered dimensions.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Rows actually produced by the parquet scan (post row-group pruning,
    * pre Spark-side Filter) for `pred` over `path`. */
  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(path).filter(pred)
    df.collect() // drive THIS queryExecution (count() would plan a new one)
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = finalPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, s"no parquet scan leaf in:\n$finalPlan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered write prunes row groups on BOTH dimensions; 1-D sort does not") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val total = li.count()
    // same file count for a fair comparison: 16 z-run files vs 16
    // partkey-sorted files
    ZOrder.zOrderBy(li, "l_partkey", "l_suppkey", bits = 10, numPartitions = 16)
      .write.parquet(s"$tmp/z")
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.parquet(s"$tmp/s")
    val loPart = $"l_partkey" <= 12    // narrow range in dimension A
    val loSupp = $"l_suppkey" <= 1     // narrow range in dimension B
    // dimension A prunes under both layouts
    assert(scannedRows(s"$tmp/z", loPart) < total / 2,
      "z-order failed to prune on its first dimension")
    assert(scannedRows(s"$tmp/s", loPart) < total / 2,
      "plain sort failed to prune on its own sort key")
    // dimension B prunes ONLY under z-order: the 1-D sorted layout
    // scatters l_suppkey across every file, so min/max stats can't skip
    val zB = scannedRows(s"$tmp/z", loSupp)
    val sB = scannedRows(s"$tmp/s", loSupp)
    assert(zB < total / 2, s"z-order failed to prune on its second dimension ($zB of $total rows scanned)")
    assert(sB > total / 2, s"expected the 1-D layout to scan most rows for the off-key predicate (got $sB of $total)")
    assert(zB * 2 < sB, s"z-order should scan far fewer rows than 1-D sort on dim B ($zB vs $sB)")
  }

  test("approx_count_distinct stays within its 5% contract at bench scale") {
    // q28's accuracy face is evaluated inline wherever it runs; assert it
    // at sf0.1 too so the sketch is kept honest at the BENCH scale, not
    // only the sf0.01 correctness gate
    val rows = SparkEntry.queries("q28_approx_distinct")(spark, "/root/testdata/sf0.1")
      .select("within_5pct").collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(0)),
      "HLL++ approx_count_distinct drifted past 5% of exact at sf0.1")
  }

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
