package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-count probe for the exact-similarity blocking disciplines
  * (VERDICT r9 item 2): on a corpus where blocking CAN prune (Zipf
  * vocabulary — tools/gen_zipf.py), report how many candidate pairs the
  * q322 prefix filter and the q302 df-capped rare-shingle join actually
  * generate, against the all-pairs count a naive join would verify.
  *
  *   sbt "runMain graft.ZipfProbe /tmp/zipf_5k"
  *   sbt "runMain graft.ZipfProbe /tmp/zipf_50k"
  *
  * The 100 TB argument: candidates growing ~linearly in docs (not
  * quadratically) is what makes the verification stage affordable at any
  * scale — the r9 31-word corpus could not show this (every shingle was
  * common, candidates WERE the all-pairs set). */
object ZipfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/zipf_5k")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val PF = graft.functions.ParityFunctions

    // --- q322 stage: every-10th doc, prefix-filter candidates
    val toks = Tables(spark, dir).documents
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", explode(array_distinct(PF.tokens($"text"))).as("tok"))
    val nDocs = toks.select($"doc_id").distinct().count()
    val allPairs = nDocs * (nDocs - 1) / 2
    val cands = graft.operators.Dedup.prefixCandidates(
      toks, "doc_id", "tok", positional = true).count()

    // --- q302 stage: rep-collapse + tf + df-capped rare-shingle pairs
    val docs = Tables(spark, dir).documents
      .withColumn("_h", md5($"text".cast("binary")))
      .withColumn("_rep", min($"doc_id")
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"_h")))
      .filter($"doc_id" === $"_rep").select($"doc_id", $"text")
    val nReps = docs.count()
    val tf = docs
      .select($"doc_id", explode(PF.shingleSeq(PF.tokens($"text"), 3)).as("shingle"))
      .groupBy($"doc_id", $"shingle").agg(count(lit(1)).as("tf"))
    val cap = docs.agg(greatest(lit(20L),
      least(lit(64L), count(lit(1)) * 4 / 1000)).as("df_cap"))
    val rare = tf.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(cap)).filter($"df" <= $"df_cap" && $"df" >= 2)
    val rareSh = tf.join(rare.select("shingle"), Seq("shingle"))
    val shinglePairs = rareSh.select($"shingle", $"doc_id".as("id_a"))
      .join(rareSh.select($"shingle", $"doc_id".as("id_b")), Seq("shingle"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct().count()
    val allRepPairs = nReps * (nReps - 1) / 2

    println(f"[zipf] $dir docs(q322 slice)=$nDocs allPairs=$allPairs " +
      f"prefixCandidates=$cands (${100.0 * cands / math.max(1, allPairs)}%.3f%%)")
    println(f"[zipf] $dir reps(q302)=$nReps allPairs=$allRepPairs " +
      f"rareShinglePairs=$shinglePairs (${100.0 * shinglePairs / math.max(1, allRepPairs)}%.3f%%)")
    spark.stop()
  }
}
