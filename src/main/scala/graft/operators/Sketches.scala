package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable probabilistic sketches built from plain relational algebra —
  * no opaque binary state, so every sketch is inspectable, unionable
  * across shards/engines, and oracle-checkable (the count-min face q98
  * follows the same recipe in [[graft.queries.TextQueries]]).
  *
  * The Bloom filter here is the declarative sibling of Spark's own
  * runtime-injected bloom pruning (which PlanGuardSpec pins on selective
  * shuffle joins): build a bit SET from the small side's keys, broadcast
  * it, and pre-filter the big side with a pure map — the classic
  * semi-join reduction for 100 TB scans where the exact key set is too
  * large to ship but m bits are not. Hash positions are md5-derived
  * (engine-reproducible — same portability trick as the LSH planes and
  * the md5 sampling keys; a production variant would swap in xxhash64
  * for speed, at the cost of oracle checkability).
  */
object Sketches {

  /** The k bit positions of `key` in a Bloom filter of m bits:
    * position_i = first 24 bits of md5(i || ":" || key) mod m. DuckDB
    * spells one position
    * `('0x' || substr(md5(i || ':' || CAST(key AS VARCHAR)), 1, 6))::BIGINT % m`. */
  def bloomPositions(key: Column, m: Int, k: Int): Column =
    array((0 until k).map { i =>
      conv(substring(md5(concat(lit(s"$i:"), key.cast("string")).cast("binary")), 1, 6),
        16, 10).cast("long") % m
    }: _*)

  /** Build the filter: ONE row holding the sorted distinct set bits
    * (array<long>, ≤ m entries). One scan of `keys` + a tiny hash
    * distinct; the result is broadcast-sized by construction (m bits ⇒
    * ≤ m·8 bytes worst case, vs the key set's unbounded width). */
  def bloomBuild(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    keys.select(explode(bloomPositions(col(keyCol), m, k)).as("_bit"))
      .distinct()
      .agg(array_sort(collect_list(col("_bit"))).as("bits"))

  /** Tag each row of `df` with `outCol` = "might the filter contain
    * keyCol?" — a pure broadcast-map (crossJoin against the 1-row bits
    * frame, then forall/array_contains over the sorted bit array): no
    * shuffle of `df`, fully codegen. No false negatives by construction;
    * false-positive rate ≈ (1 − e^{−kn/m})^k. */
  def bloomMightContain(df: DataFrame, keyCol: String, bloom: DataFrame,
                        m: Int, k: Int, outCol: String = "might_contain"): DataFrame =
    df.crossJoin(broadcast(bloom))
      .withColumn(outCol,
        forall(bloomPositions(col(keyCol), m, k), p => array_contains(col("bits"), p)))
      .drop("bits")
}
