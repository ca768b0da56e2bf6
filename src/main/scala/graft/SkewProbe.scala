package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-cluster skew probe for [[graft.operators.Similarity.semanticDedup]].
  *
  * The pair stage is a shuffle join keyed on `cluster`; its in-source scale
  * note says a pathological cluster is "AQE-skew territory". This probe
  * PROVES that: it builds a corpus where ~50% of vectors collapse into one
  * cluster (half the embeddings are the same direction + quantization-level
  * noise; the rest fan out across distinct directions), forces the
  * at-scale join shape (`autoBroadcastJoinThreshold=-1` — on a real corpus
  * the assigned relation is far past broadcast size), lowers the AQE skew
  * thresholds to probe scale, and asserts that
  *   (a) the executed pair join carries `skew=true`, and
  *   (b) the pair-stage work actually split — the max tasks observed in a
  *       single stage exceeds the shuffle-partition count, i.e. the hot
  *       partition became multiple tasks instead of one straggler.
  *
  *   sbt "runMain graft.SkewProbe /root/testdata/sf0.1 5000"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val takeN = if (args.length > 1) args(1).toInt else 20000
    val parts = 32
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      // the at-scale shape: the per-vector assigned relation of a 100 TB
      // corpus never broadcasts, so the pair stage is a shuffle join
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // probe-scale skew thresholds (defaults are 256 MB / factor 5 —
      // sized for production partitions, unreachable on a 5k-row probe)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // keep the signal clean: we are probing SPLITS, not merges
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // track the widest stage: a split hot partition shows up as one stage
    // running more tasks than spark.sql.shuffle.partitions
    val maxTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasksPerStage = scala.collection.concurrent.TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val n = tasksPerStage.updateWith(t.stageId) {
          case Some(c) => Some(c + 1); case None => Some(1)
        }.get
        maxTasks.getAndUpdate(m => math.max(m, n))
      }
    })

    val dim = 64
    // half the ids share ONE direction (noise below the int8 quantization
    // step, so the hot cluster's pairs are all near-dups); the other half
    // fan out over dim-1 distinct directions → k-1 small clusters
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id").orderBy($"vec_id").limit(takeN)
      .select($"vec_id", transform(sequence(lit(0), lit(dim - 1)), j =>
        when($"vec_id" % 2 === 0,
          when(j === 0, 1.0).otherwise(pmod($"vec_id" * 31 + j, lit(7)).cast("double") * 0.001))
        .otherwise(
          when(j === pmod($"vec_id", lit(dim - 1)) + 1, 1.0).otherwise(0.0)))
        .cast("array<float>").as("embedding"))

    val nCorpus = emb.count()
    val t0 = System.nanoTime()
    val (_, dupPairs) = graft.operators.Similarity.semanticDedup(
      emb, k = 8, thrNum = 95, thrDen = 100, idCol = "vec_id", vecCol = "embedding")
    // collect() drives THIS DataFrame's queryExecution — count() would
    // plan a separate query and leave this plan unexecuted (never final)
    val pairRows = dupPairs.collect()
    val nPairs = pairRows.length.toLong
    val secs = (System.nanoTime() - t0) / 1e9

    val plan = dupPairs.queryExecution.executedPlan.toString
    if (sys.env.contains("SKEW_DEBUG")) println("[skew-plan]\n" + plan)
    val skewMarked = plan.contains("skew=true")
    val widest = maxTasks.get()
    val clusters = pairRows.groupBy(_.getLong(0)).view.mapValues(_.length)
      .toSeq.sortBy(-_._2).take(3)
      .map { case (c, n) => s"$c:$n" }.mkString(", ")
    println(f"[skew-probe] corpus=$nCorpus%d (cap $takeN%d) pairs=$nPairs%d in $secs%.2f s; top clusters (id:pairs) = $clusters")
    println(s"[skew-probe] pair join skew=true in executed plan: $skewMarked")
    println(s"[skew-probe] widest stage ran $widest tasks (shuffle.partitions=$parts)")
    val ok = skewMarked && widest > parts
    println(s"[skew-probe] ${if (ok) "PASS" else "FAIL"}: hot cluster " +
      s"${if (ok) "split across tasks by AQE skew-join" else "NOT split — straggler risk"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
