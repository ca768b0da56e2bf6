package graft

import org.apache.spark.sql.SparkSession

/** Scale-up probe: times the heavy dedup/text pipelines against an
  * arbitrary table directory (e.g. a synthetically enlarged corpus) —
  * used to check that candidate-pair discipline holds under 10×+ growth.
  *
  *   sbt "runMain graft.ScaleTest /tmp/sf_scaled q31_minhash_lsh q33_ngram_jaccard"
  */
object ScaleTest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q31_minhash_lsh", "q33_ngram_jaccard", "q32_simhash_signatures",
        "q54_tfidf_top_terms", "q58_dedup_clusters", "q66_pack_sequences",
        "q68_simhash_neardup", "q69_lsh_neardup", "q79_contamination",
        "q89_upsert_merge", "q91_kmeans_train",
        // round-6 heavy additions
        "q127_heavy_hitters", "q131_oov_rate", "q133_bigram_lm",
        "q134_char_entropy", "q137_rolling_active",
        // round-6 continuation: scan-family + pair-join faces
        "q153_rfm_segments", "q154_concurrency_sweep", "q159_token_pmi",
        "q160_basket_pairs", "q173_running_total", "q181_skyline",
        "q186_triangles",
        // round-6 session-2: PQ codebooks, delta-join view, PPS prefix
        // sum, proration windows, BFS frontier iteration
        "q258_pq_knn", "q259_incr_join_view", "q261_pps_sample",
        "q263_proration", "q265_bfs_levels")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"[scale] $q%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $n%d rows")
    }
    spark.stop()
  }
}
