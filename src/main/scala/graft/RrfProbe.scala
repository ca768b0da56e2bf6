package graft

import org.apache.spark.sql.SparkSession

/** q386 at production query volume (VERDICT r11 item 7): drive the exact
  * rrfHybridFusion plan with |q| = 10³ instead of the gate face's 5 and
  * report the join inventory + wall time. The claim under test: the
  * lexical leg's token join and the per-candidate size join stay
  * hash-keyed (broadcast at this scale, shuffle-keyed on c_id when AQE
  * outgrows the threshold — both are the right 100 TB shape), the fusion
  * full-outer stays keyed on (q_id, c_id), and NOTHING degrades to a
  * cartesian as the query set grows 200×.
  *
  *   sbt "runMain graft.RrfProbe /root/testdata/sf0.1 1000"
  */
object RrfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = if (args.length > 1) args(1).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = graft.queries.VectorQueries.rrfHybridFusionN(spark, dir, nq)
    val rows = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val plan = df.queryExecution.executedPlan.toString
    val joins = Seq("BroadcastHashJoin", "ShuffledHashJoin", "SortMergeJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(j => j -> j.r.findAllIn(plan).length).filter(_._2 > 0)
      .map { case (j, c) => s"$j=$c" }.mkString(" ")
    println(f"[rrf-probe] nq=$nq rows=$rows elapsed=$secs%.2fs joins: $joins")
    require(rows >= nq.min(1000L), s"[rrf-probe] suspiciously few rows: $rows")
    require(!plan.contains("CartesianProduct"),
      "[rrf-probe] FAIL: a cartesian product appeared at query volume")
    println("[rrf-probe] OK")
    spark.stop()
  }
}
