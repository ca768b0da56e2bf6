package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job profiler for one declared query (optimization-round tooling).
  *
  * Runs a single SparkEntry query under the bench session config and
  * prints every Spark job it launched — duration, description/callsite —
  * sorted by cost, so a multi-phase lifecycle face can be attributed to
  * its phases before optimizing (guide §1: measure first; §7.1 job-level
  * attribution without the UI).
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <queryName> [repeats]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, desc: String, var ms: Long, start: Long)
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, Job]
    val order = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name))
          .getOrElse("?")
        jobs.put(js.jobId, Job(js.jobId, desc.linesIterator.next().take(110),
          -js.time, order.incrementAndGet())): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(j => j.ms += je.time)
    })

    val fn = SparkEntry.queries.getOrElse(qname,
      sys.error(s"unknown query $qname"))
    // warm-up pass absorbs JIT/classloader cost so the profiled pass
    // reflects steady-state job times (Bench measures warm too)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    for (r <- 1 to repeats) {
      jobs.clear(); order.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a moment to drain before reading
      Thread.sleep(300)
      val done = jobs.values.toSeq.filter(_.ms > 0)
      val sumMs = done.map(_.ms).sum
      println(f"[profile] $qname pass $r/$repeats: wall $wall%.2f s, " +
        f"${done.size} jobs, Σjob ${sumMs / 1e3}%.2f s, " +
        f"gap ${wall - sumMs / 1e3}%.2f s (driver/plan/IO between jobs)")
      for (j <- done.sortBy(-_.ms).take(40))
        println(f"[profile]   ${j.ms}%6d ms  job#${j.id}%-4d ${j.desc}")
    }
    spark.stop()
  }
}
