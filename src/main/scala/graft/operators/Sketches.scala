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

  /** The 64 single-bit masks as a literal array — variable-distance shift
    * isn't in the Scala Column API, so mask lookup is an O(1) literal-array
    * index instead. */
  private val masks: Column = typedLit(Array.tabulate(64)(1L << _).toSeq)

  /** Build the filter: ONE row holding a DENSE bitset (`array<long>` of
    * m/64 words). One scan of `keys` + a tiny hash distinct/aggregate; the
    * result is exactly m bits = m/8 bytes broadcast, however wide the key
    * set. Dense words (not a sorted position list) keep the probe O(1):
    * a position list would make every probe an O(m) array scan. */
  def bloomBuild(keys: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    require(m % 64 == 0, "bloomBuild: m must be a multiple of 64")
    keys.select(explode(bloomPositions(col(keyCol), m, k)).as("_p"))
      .distinct()
      // distinct positions within a word carry distinct masks, so SUM ≡ OR
      .groupBy(shiftright(col("_p"), 6).cast("int").as("_w"))
      .agg(sum(element_at(masks, (col("_p") % 64).cast("int") + 1)).as("_m"))
      .agg(collect_list(struct(col("_w"), col("_m"))).as("_kv"))
      // "_bloom_bits", not "bits": the probe crossJoins this frame into
      // arbitrary caller frames, so the carried column must not collide
      .select(transform(sequence(lit(0), lit(m / 64 - 1)),
        w => coalesce(element_at(map_from_entries(col("_kv")), w.cast("int")), lit(0L)))
        .as("_bloom_bits"))
  }

  /** Tag each row of `df` with `outCol` = "might the filter contain
    * keyCol?" — a pure broadcast-map (crossJoin against the 1-row bitset,
    * then per position: O(1) word index + mask AND): no shuffle of `df`,
    * fully codegen. No false negatives by construction; false-positive
    * rate ≈ (1 − e^{−kn/m})^k. */
  def bloomMightContain(df: DataFrame, keyCol: String, bloom: DataFrame,
                        m: Int, k: Int, outCol: String = "might_contain"): DataFrame =
    df.crossJoin(broadcast(bloom))
      .withColumn(outCol,
        forall(bloomPositions(col(keyCol), m, k), p =>
          element_at(col("_bloom_bits"), shiftright(p, 6).cast("int") + 1)
            .bitwiseAND(element_at(masks, (p % 64).cast("int") + 1)) =!= 0L))
      .drop("_bloom_bits")
}
