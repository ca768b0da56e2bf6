package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: deterministic sampling / splitting,
  * class balancing, sequence packing, and PII scrubbing — the corpus-prep
  * steps between "deduped documents" and "tokenized shards".
  *
  * Determinism is the design center: every operator keys its randomness off
  * `md5(id)` rather than `rand()`, so results are reproducible across runs,
  * engines, partitionings and retries — `rand()`-based sampling changes
  * under Spark task retry and can't be oracle-checked. md5-hex is identical
  * in every engine (same portability argument as [[Dedup]]).
  *
  * Scale notes (100 TB): sampling/splitting are stateless per-row filters —
  * no shuffle at all, fully pushdown-friendly. Class balancing windows only
  * within a class. Sequence packing windows within an explicit shard (a
  * global-order pack would serialize the corpus through one partition; the
  * shard column IS the parallelism unit, exactly how real pretraining
  * pipelines shard their corpus before packing).
  */
object TrainingData {

  /** Deterministic bucket in `[0, buckets)`: first 24 bits of `md5(key)`,
    * mod buckets. Portable: DuckDB spells it
    * `('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 6))::BIGINT % buckets`. */
  def hashBucket(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Keep `numerator/denominator` of rows, chosen by hash bucket — a
    * coordination-free, reproducible sample (NOT `rand()`: stable under
    * retries and re-runs, and the same rows are kept on every engine). */
  def sampleByHash(df: DataFrame, key: Column,
                   numerator: Int, denominator: Int): DataFrame =
    df.filter(hashBucket(key, denominator) < numerator)

  /** Per-stratum deterministic sampling: keep a row iff its hash bucket
    * (of `denominator`) is below its stratum's numerator — different
    * sampling rates per group (the domain/language rebalancing move in
    * every pretraining mix) while staying a STATELESS per-row filter: no
    * shuffle, no per-group state, pushdown-friendly, and the kept set for
    * a stratum never changes when other strata's rates do. Strata absent
    * from `fractions` get `defaultNumerator` (0 = drop). */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Seq[(String, Int)], denominator: Int,
                       defaultNumerator: Int = 0): DataFrame = {
    val num = fractions.foldLeft(lit(defaultNumerator)) {
      case (acc, (s, n)) => when(stratum === s, n).otherwise(acc)
    }
    df.filter(hashBucket(key, denominator) < num)
  }

  /** Assign each row a train/val/test split by hash percentile of its key.
    * Adding rows later never moves an existing row between splits. */
  def assignSplit(df: DataFrame, key: Column, trainPct: Int, valPct: Int,
                  splitCol: String = "split"): DataFrame = {
    val b = hashBucket(key, 100)
    df.withColumn(splitCol,
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic per-class downsample to at most `n` rows per class:
    * rank rows inside each class by md5(key) (a reproducible "random"
    * order) and keep the first `n`. One shuffle on the class column; the
    * per-class sort is the window's partition sort. A pathologically hot
    * class is AQE-skew territory — or pre-filter with [[sampleByHash]]
    * when n << class size to shrink the sorted set. */
  def balanceClasses(df: DataFrame, classCol: Column, key: Column,
                     n: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(classCol)
      .orderBy(md5(key.cast("string").cast("binary")).asc, key.asc)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Concat-and-chunk sequence packing: within each shard, lay documents
    * end to end (ordered by `orderKey`) and assign each to the
    * `budget`-token bin where it STARTS — `bin = floor(preceding_tokens /
    * budget)`. One window per shard; shards pack in parallel (the shard
    * count is the parallelism of the pack stage, so at 100 TB you pick
    * shards ≈ cluster cores, not 8). */
  def packSequences(df: DataFrame, shard: Column, orderKey: Column,
                    sizeCol: Column, budget: Int,
                    binCol: String = "bin"): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(orderKey.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(binCol,
      floor((sum(sizeCol).over(w) - sizeCol) / budget).cast("int"))
  }

  /** Conservative PII patterns — identical semantics in Java regex (Spark)
    * and RE2 (DuckDB): no backrefs, no lookaround. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+\\d{1,2} \\d{3} \\d{4}"

  /** Redact emails/phones; `<EMAIL>` / `<PHONE>` placeholders keep token
    * positions roughly stable. Pure codegen'd `regexp_replace` — a per-row
    * map, no shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Count pattern hits (for scrub audit trails). */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Equal-width bands of a SimHash signature: any two signatures within
    * Hamming distance `numBands - 1` share at least one band (pigeonhole),
    * so a band-equality self-join finds all such pairs while shuffling only
    * (band_idx, band_val, id) triples — the SimHash analogue of MinHash-LSH
    * banding. Band extraction is shift+mask — pure long arithmetic, because
    * signatures wider than 53 bits would lose low bits through any
    * double-typed division. */
  def simhashBands(sig: DataFrame, idCol: String,
                   hashCol: String = "simhash", bits: Int = 32,
                   numBands: Int = 4): DataFrame = {
    val bandWidth = bits / numBands
    val bandMask = (1L << bandWidth) - 1
    val bands = array((0 until numBands).map { k =>
      struct(lit(k).as("band_idx"),
        shiftright(col(hashCol), bandWidth * k).bitwiseAND(lit(bandMask))
          .as("band_val"))
    }: _*)
    sig.select(col(idCol), col(hashCol), explode(bands).as("b"))
      .select(col(idCol), col(hashCol), col("b.band_idx"), col("b.band_val"))
  }

  /** Near-dup pairs by banded SimHash, in two tiers so EXACT duplicates
    * never reach the quadratic step:
    *
    *  1. rows with identical signatures collapse to one representative
    *     (min id) via a linear hash aggregate — a corpus with a million
    *     copies of one page contributes ONE row to the band join, not
    *     10^12 pairs (scale-probed: the single-tier version emitted 31M
    *     pairs on a 10×-duplicated corpus; this shape stays flat);
    *  2. representatives sharing a band pair up and the exact Hamming
    *     distance filters to `1 <= hamming <= maxHamming`.
    *
    * Output: representative pairs (id_a, id_b, hamming), hamming >= 1.
    * Same-signature membership is recoverable by grouping on the hash
    * column. Complete for maxHamming <= numBands - 1 (pigeonhole);
    * LSH-style recall above that. */
  def simhashNearDup(sig: DataFrame, idCol: String, maxHamming: Int,
                     hashCol: String = "simhash", bits: Int = 32,
                     numBands: Int = 4): DataFrame = {
    val reps = sig.groupBy(col(hashCol)).agg(min(col(idCol)).as(idCol))
    val bands = simhashBands(reps, idCol, hashCol, bits, numBands)
    val a = bands.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_a"), col(hashCol).as("h_a"))
    val b = bands.select(col("band_idx"), col("band_val"),
      col(idCol).as("id_b"), col(hashCol).as("h_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      // hamming is per-pair deterministic, so filtering BEFORE the distinct
      // is equivalent — and shrinks the dedup shuffle by the selectivity of
      // the threshold (most band collisions are far pairs)
      .filter(col("hamming") <= maxHamming) // >= 1 holds: distinct sigs
      .distinct()
  }
}
