package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity-search surface over `embeddings.embedding array<float>`:
  * brute-force cosine kNN (baseline) and a deterministic IVF-ish pruned
  * variant; plus same-label near-dup top-pairs. Cosine is rounded to 6
  * decimals before ranking with id tie-breaks, so cross-engine fp noise
  * cannot reorder results.
  */
object VectorQueries {

  private def cosSql(a: String, b: String): String =
    s"round(list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i])) / " +
      s"(sqrt(list_sum(list_transform($a, x -> x * x))) * " +
      s"sqrt(list_sum(list_transform($b, x -> x * x)))), 6)"

  // q40: brute-force top-10 cosine neighbors for query vectors vec_id < 5.
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir).embeddings
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    Similarity.knnBruteForce(queries, corpus, 10)
      .select($"q_id", $"c_id", $"sim", $"rank")
      .orderBy($"q_id", $"rank")
  }

  // q41: IVF-ish approximate kNN — candidates share the query's coarse cell
  // (argmax-|component| axis index + sign).
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir).embeddings
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    Similarity.knnIvf(queries, corpus, 5)
      .select($"q_id", $"c_id", $"sim", $"rank")
      .orderBy($"q_id", $"rank")
  }

  // q34: embedding near-dup scan — top-20 same-label pairs by cosine.
  def nearDupTopPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir).embeddings
    // norms materialized below the join (once per vector, not per pair);
    // one side broadcast so the 10-key label join doesn't bottleneck on
    // 10 shuffle partitions.
    def side(id: String, v: String, n: String) = emb
      .select($"label", $"vec_id".as(id), $"embedding".cast("array<double>").as(v))
      .withColumn(n, sqrt(aggregate(transform(col(v), x => x * x), lit(0.0), (acc, x) => acc + x)))
    // single small parquet file = one input partition — spread the stream
    // side so the pair computation parallelizes across all cores
    val a = side("id_a", "va", "_na").repartition($"id_a")
    val b = side("id_b", "vb", "_nb")
    a.join(broadcast(b), Seq("label")).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        round(Similarity.dot($"va", $"vb") / ($"_na" * $"_nb"), 6).as("sim"))
      .orderBy($"sim".desc, $"id_a", $"id_b")
      .limit(20)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_knn_brute" -> knnBrute _,
    "q41_knn_ivf" -> knnIvf _,
    "q34_embedding_neardup" -> nearDupTopPairs _
  )

  val oracles: Map[String, String] = Map(
    "q40_knn_brute" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         |sims AS (SELECT q_id, e.vec_id AS c_id, ${cosSql("qv", "v")} AS sim
         |  FROM q JOIN e ON e.vec_id <> q_id),
         |ranked AS (SELECT q_id, c_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
         |  FROM sims)
         |SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "q41_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |    list_transform(embedding, x -> abs(x)) AS la FROM embeddings),
         |cells AS (SELECT vec_id, v,
         |    list_position(la, list_aggregate(la, 'max')) AS cell_idx,
         |    v[list_position(la, list_aggregate(la, 'max'))] > 0 AS cell_sign
         |  FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, cell_idx, cell_sign FROM cells WHERE vec_id < 20),
         |sims AS (SELECT q_id, c.vec_id AS c_id, ${cosSql("qv", "v")} AS sim
         |  FROM q JOIN cells c USING (cell_idx, cell_sign) WHERE c.vec_id <> q_id),
         |ranked AS (SELECT q_id, c_id, sim,
         |  row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rank
         |  FROM sims)
         |SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "q34_embedding_neardup" ->
      s"""WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("a.v", "b.v")} AS sim
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin
  )
}
