package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.plans.{PrefixScan, PrefixScanExec}

/** Native prefix-scan operator (custom LogicalPlan + Strategy + SparkPlan):
  * must plan as PrefixScanExec under the extension-registered session,
  * agree row-for-row with both the composed operator and a single-partition
  * window, and keep the scan distributed (no single-partition exchange).
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1L to 1000L)
    .map(k => (k * 7919 % 1009, (k % 17) - 8)).zipWithIndex
    .map { case ((k, v), i) => (k * 10000 + i, v.toLong) }

  test("plans as PrefixScanExec via the injected strategy — no single-partition exchange") {
    val df = sample.toDF("k", "v").repartition(5)
    val out = PrefixScan.runningSum(df, Seq("k"), $"v", "ps")
    out.collect() // materialize so AQE exposes the final plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PrefixScan"),
      s"strategy did not plan the native operator:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix scan fell back to a global window shape:\n$plan")
  }

  test("agrees with the composed globalRunningSum and the window reference") {
    val df = sample.toDF("k", "v").repartition(7)
    val native = PrefixScan.runningSum(df, Seq("k"), $"v", "ps")
      .select($"k", $"ps").as[(Long, Long)].collect().toMap
    val composed = Relational.globalRunningSum(df, Seq($"k".asc), $"v", "ps")
      .select($"k", $"ps").as[(Long, Long)].collect().toMap
    val window = df.withColumn("ps",
        sum($"v").over(Window.orderBy($"k".asc))).select($"k", $"ps")
      .as[(Long, Long)].collect().toMap
    assert(native == window)
    assert(composed == window)
  }

  test("rank form matches row_number; null values count as zero") {
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
    val r = PrefixScan.rank(df, Seq("k"), "r")
      .select($"k", $"r").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val ps = PrefixScan.runningSum(df, Seq("k"), $"v", "ps")
      .select($"k", $"ps").as[(Long, Long)].collect().toMap
    assert(ps == Map(1L -> 2L, 2L -> 2L, 3L -> 7L))
  }

  test("downstream operators compose on top of the appended column") {
    val df = sample.toDF("k", "v")
    val out = PrefixScan.runningSum(df, Seq("k"), $"v", "ps")
      .filter($"ps" > 0).groupBy(lit(1)).agg(max($"ps").as("m"), count(lit(1)).as("n"))
    assert(out.count() == 1)
  }
}
