package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Convergence probe for [[graft.operators.Dedup.connectedComponents]] on
  * synthetic near-dup graphs at 1× and 10×:
  *
  *   - iteration count must stay within the graph diameter bound (min-label
  *     propagation moves the component min one hop per iteration, +1
  *     iteration to observe quiescence);
  *   - per-iteration wall time must stay FLAT — growth across iterations
  *     would mean the persist/checkpoint discipline is leaking lineage and
  *     each iteration recomputes the ones before it;
  *   - 10× edges must not produce >>10× total time (candidate-pair
  *     discipline, not quadratic blowup).
  *
  * Chain graphs are the worst case for label propagation: diameter = chain
  * length − 1, vs near-dup clusters in the wild which are shallow stars.
  *
  *   sbt "runMain graft.CCProbe"
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val chainLen = 7 // 6 edges per chain → diameter 6
    def chains(nChains: Int) = {
      // ids deterministically scrambled within each chain so the component
      // min sits at an arbitrary hop — worst-case propagation distance
      (0 until nChains).flatMap { c =>
        val ids = (0 until chainLen)
          .map(i => c.toLong * 1000 + (i * 31 % chainLen))
        ids.zip(ids.tail)
      }
    }

    for ((scale, nChains) <- Seq("1x" -> 500, "10x" -> 5000)) {
      val pairs = chains(nChains).toDF("id_a", "id_b")
        .repartition(32) // spread edges like a real shuffle output
      val t0 = System.nanoTime()
      val (labels, iterSecs) = graft.operators.Dedup
        .connectedComponentsStats(pairs, maxIter = 20)
      val nComponents = labels.select(countDistinct($"component")).head().getLong(0)
      val total = (System.nanoTime() - t0) / 1e9
      val iters = iterSecs.size
      println(f"[cc-probe] $scale%-4s edges=${nChains * (chainLen - 1)}%-6d " +
        f"components=$nComponents%-6d iters=$iters%-3d total=$total%6.2fs " +
        f"per-iter=[${iterSecs.map(s => f"$s%.2f").mkString(", ")}]")
      assert(nComponents == nChains,
        s"wrong component count: $nComponents != $nChains")
      assert(iters <= chainLen, // diameter (chainLen-1) + 1 quiescence pass
        s"convergence exceeded the diameter bound: $iters > $chainLen")
      // flat per-iteration cost: past the warm-up iteration, no iteration
      // may cost 3× the post-warm-up minimum (lineage growth shows up as a
      // monotone climb far beyond this)
      val steady = iterSecs.drop(1)
      assert(steady.max <= steady.min * 3 + 0.5,
        s"per-iteration cost not flat: $iterSecs")
    }
    println("[cc-probe] OK")
    spark.stop()
  }
}
