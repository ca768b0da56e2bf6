package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks shared by the engine's query surface.
  *
  * Scale notes (100 TB posture): every helper here is keyed/partitionable —
  * no driver-side collect. Per-group top-k uses a window (single shuffle on
  * the partition keys, no global sort); the idempotent-append anti-join
  * broadcasts the existing-key side when small (the reference's
  * `spark_streaming.py:77-84` semantics).
  */
object Relational {

  /** Multiset-difference WITNESS in one pass: rows whose multiplicities
    * differ between `a` and `b` (positional columns, exceptAll
    * semantics), with the signed count in `_bag_diff`. Empty ⇔ the two
    * frames are multiset-equal.
    *
    * The identity-pin idiom `a.exceptAll(b).isEmpty &&
    * b.exceptAll(a).isEmpty` costs TWO aggregate-shaped jobs — Spark
    * rewrites each ExceptAll into union + signed-count aggregate — so
    * every pin scans both inputs twice and shuffles twice. This is the
    * same signed-count algebra computed ONCE: each side scanned once,
    * one shuffle, one action (guide §1.2/§2.4: remove redundant passes).
    * Grouping equality matches exceptAll's (NULL == NULL, NaN == NaN,
    * -0.0 == 0.0 via NormalizeFloatingNumbers). */
  def bagDiff(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.length == b.columns.length,
      s"bagDiff: arity mismatch (${a.columns.length} vs ${b.columns.length})")
    // b's struct reuses a's field names so the union is type-compatible
    // even when the sides name their columns differently (positional,
    // like exceptAll)
    def packed(df: DataFrame, names: Array[String], sign: Long) =
      df.select(struct(df.columns.zip(names).map { case (c, n) =>
        df(c).as(n) }.toSeq: _*).as("_bag_row"), lit(sign).as("_bag_sign"))
    packed(a, a.columns, 1L).unionAll(packed(b, a.columns, -1L))
      .groupBy(col("_bag_row"))
      .agg(sum(col("_bag_sign")).as("_bag_diff"))
      .where(col("_bag_diff") =!= 0L)
  }

  /** Run independent read-only Spark actions concurrently from a small
    * driver-side pool (guide §2.6: actions are only sequential because
    * the driver calls them sequentially — overlapping lets the next
    * job's tasks back-fill cores idled by the current job's tail; FIFO
    * scheduling gives exactly that). For proof batteries over immutable
    * snapshots/checkpoints only — never for actions that commit state.
    * Failures propagate with their original exception (require messages
    * stay intact). */
  def inParallel(tasks: Seq[() => Unit], parallelism: Int = 4): Unit = {
    inParallelEval[Unit](tasks, parallelism): Unit
  }

  /** [[inParallel]] that returns each task's value, in input order. */
  def inParallelEval[T](tasks: Seq[() => T], parallelism: Int = 4): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, tasks.size)))
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } finally pool.shutdownNow(): Unit
  }

  /** Exact top-k rows per group, deterministic via the caller's orderBy
    * columns (include a unique tie-breaker for stable results).
    * One shuffle on `partitionCols`; rank prunes before any later join.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column],
                   orderCols: Seq[Column], k: Int,
                   rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Equi-depth bucketing (ntile semantics) WITHOUT a single-partition
    * global sort — the 100 TB replacement for `ntile(k) OVER (ORDER BY
    * ...)`, whose plan funnels the whole relation through one task.
    *
    * Two-pass rank: range-partition on the order columns (so partition p
    * holds a contiguous value range), rank locally inside each partition,
    * and add per-partition row-count offsets. The only driver-side state
    * is one long per partition — bytes, not data. Bucket assignment uses
    * ntile's EXACT arithmetic — with q = N div k and r = N mod k the
    * first r buckets hold q+1 rows and the rest q (the tempting identity
    * `(rank−1)·k DIV N + 1` is NOT ntile: it under-fills the early
    * buckets and shifts every boundary row up one bucket) — in integer
    * `DIV` (a double division could flip a boundary row — the q109
    * lesson).
    *
    * The ranged frame is `localCheckpoint()`ed before the two consumers
    * (count pass, rank pass): range boundaries come from SAMPLING, so two
    * independent executions could draw different boundaries and the
    * offsets would not match the data they're added to. In production the
    * checkpoint is the same "materialize the expensive shuffle once"
    * move, on a durable dir.
    *
    * `order` must be a TOTAL order (include a unique tie-breaker):
    * range partitioning may split equal keys across partitions, and only
    * a total order makes the global rank well-defined.
    */
  def distributedNtile(df: DataFrame, order: Seq[Column], k: Int,
                       out: String = "bucket"): DataFrame = {
    require(k > 0, s"distributedNtile: k must be positive, got $k " +
      "(fail fast — Spark's own ntile(0) rejects at analysis, and a " +
      "negative k would emit garbage buckets after paying the shuffle)")
    // temp names must not clobber caller columns (the round-4 join-helper
    // collision bug class): pick the first free suffix
    def fresh(base: String): String = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n) && n != out).get
    val (pidC, offC, grnC) = (fresh("_pid"), fresh("_off"), fresh("_grn"))
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(pidC, spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col(pidC)).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // row_number() is IntegerType: a partition past 2^31 rows would wrap
    // BEFORE the long cast and silently corrupt buckets — refuse loudly;
    // the fix at that scale is more range partitions, not bigger ints
    require(counts.values.forall(_ <= Int.MaxValue),
      s"distributedNtile: a range partition holds more than 2^31 rows " +
        s"(max ${counts.values.max}); raise spark.sql.shuffle.partitions " +
        s"(currently $parts) so per-partition ranks fit row_number()")
    val total = counts.values.sum
    if (total == 0L) return ranged.drop(pidC).withColumn(out, lit(null).cast("int"))
    val offsets = (0 until parts).map(p =>
      (p, (0 until p).map(counts.getOrElse(_, 0L)).sum))
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF(pidC, offC))
    val w = Window.partitionBy(col(pidC)).orderBy(order: _*)
    val q = total / k
    val r = total % k
    ranged.join(offDf, Seq(pidC))
      .withColumn(grnC, row_number().over(w).cast("long") + col(offC))
      .withColumn(out,
        when(col(grnC) <= r * (q + 1),
          expr(s"CAST(($grnC - 1) DIV ${q + 1} AS INT) + 1"))
        // max(q,1) only guards the dead branch when N < k (then every
        // rank satisfies the first predicate)
        .otherwise(expr(
          s"CAST($r + ($grnC - 1 - ${r * (q + 1)}) DIV ${math.max(q, 1L)} AS INT) + 1")))
      .drop(pidC, offC, grnC)
  }

  /** Global running sum WITHOUT a single-partition window — the 100 TB
    * replacement for `SUM(v) OVER (ORDER BY ...)`, which funnels the whole
    * relation through one task. Same two-pass shape as [[distributedNtile]]:
    * range-partition on the order columns (partition p holds a contiguous
    * key range), running-sum locally, add per-partition value-sum offsets
    * (one long per partition of driver state, bytes not data).
    *
    * `order` MUST be a total order (include a unique tie-breaker): range
    * partitioning may split equal keys across partitions, and only a total
    * order makes every row's prefix well-defined — under it the default
    * RANGE frame coincides with ROWS and the per-row value is exact and
    * engine-independent. `value` must be integral (cast to long): the
    * offsets re-associate addition across partitions, which is only exact
    * for integers.
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                       out: String): DataFrame = {
    def fresh(base: String): String = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n) && n != out).get
    val (pidC, offC, valC) = (fresh("_pid"), fresh("_off"), fresh("_val"))
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint: range boundaries come from sampling; the count pass
    // and the sum pass must see the SAME partitioning (distributedNtile's
    // reasoning, verbatim).
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(valC, value.cast("long"))
      .withColumn(pidC, spark_partition_id())
      .localCheckpoint()
    val sums = ranged.groupBy(col(pidC)).agg(sum(col(valC)).as("_s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val offsets = (0 until parts).map(p =>
      (p, (0 until p).map(sums.getOrElse(_, 0L)).sum))
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF(pidC, offC))
    val w = Window.partitionBy(col(pidC)).orderBy(order: _*)
    ranged.join(offDf, Seq(pidC))
      .withColumn(out, sum(col(valC)).over(w) + col(offC))
      .drop(pidC, offC, valC)
  }

  /** Global running MAX over a total order — [[globalRunningSum]]'s
    * shape with (max, greatest) in place of (sum, +): range partition,
    * local running max, per-partition max offsets (exclusive prefix-max,
    * Long.MinValue as identity). Same total-order requirement.
    * `inclusive = false` excludes the current row (strictly-preceding
    * max, Long.MinValue for the first row) — the skyline's dominance
    * test in ONE pass instead of rank + self-join.
    */
  def globalRunningMax(df: DataFrame, order: Seq[Column], value: Column,
                       out: String, inclusive: Boolean = true): DataFrame = {
    def fresh(base: String): String = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n) && n != out).get
    val (pidC, offC, valC) = (fresh("_pid"), fresh("_off"), fresh("_val"))
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(valC, value.cast("long"))
      .withColumn(pidC, spark_partition_id())
      .localCheckpoint()
    val maxes = ranged.groupBy(col(pidC)).agg(max(col(valC)).as("_m"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) Long.MinValue else r.getLong(1))).toMap
    val offsets = (0 until parts).map(p =>
      (p, (0 until p).map(maxes.getOrElse(_, Long.MinValue))
        .foldLeft(Long.MinValue)(math.max)))
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets).toDF(pidC, offC))
    val wBase = Window.partitionBy(col(pidC)).orderBy(order: _*)
    val w = if (inclusive) wBase
      else wBase.rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(offDf, Seq(pidC))
      .withColumn(out, greatest(
        coalesce(max(col(valC)).over(w), lit(Long.MinValue)), col(offC)))
      .drop(pidC, offC, valC)
  }

  /** Global row rank (1-based) over a TOTAL order — running count of ones
    * through [[globalRunningSum]] (same unique-tie-breaker requirement).
    */
  def globalRank(df: DataFrame, order: Seq[Column], out: String = "g_rank"): DataFrame =
    globalRunningSum(df, order, lit(1L), out)

  /** Idempotent-insert filter: drop batch rows whose key already exists
    * (reference J1, `spark_streaming.py:77-84`). `broadcastExisting` should
    * be true whenever the existing-key set fits an executor (at 100 TB the
    * existing side is projected to its key column only, so it usually does).
    */
  def idempotentAppend(batch: DataFrame, existing: DataFrame,
                       key: String, broadcastExisting: Boolean = true): DataFrame = {
    val keys = existing.select(key)
    val right = if (broadcastExisting) broadcast(keys) else keys
    batch.join(right, Seq(key), "left_anti")
  }

  /** Skew-resistant inner equi-join: the skewed (left) side's key is salted
    * with a deterministic shard derived from a stable row expression, and
    * the right side is replicated `salts`× via explode — so one hot key
    * spreads over `salts` reducers instead of one straggler task. Results
    * are identical to a plain join (spec-verified). AQE's skew handling
    * covers moderate skew at runtime; explicit salting is for the
    * pathological keys you know about.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    val l = skewed.withColumn("_salt", pmod(hash(saltBy), lit(salts)))
    val r = other.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Keyed MERGE (upsert): matched keys take the update row, unmatched
    * target rows pass through, unmatched updates insert — the write side of
    * the warehouse staple the reference approximates with insert-only
    * anti-join (`spark_streaming.py:80-88` can never update a row; this
    * can). `seq` makes within-batch conflicts deterministic (last wins).
    *
    * Scale shape: one shuffle of each side on `key` (the anti-join and the
    * union share it), no broadcast needed on either side — both may be
    * huge. With a partitioned target, filter the target to the partitions
    * present in `updates` first and rewrite only those (partition-pruned
    * merge); the row-level semantics are exactly this function.
    */
  def upsert(target: DataFrame, updates: DataFrame, key: Seq[String],
             seq: Column): DataFrame = {
    // updates may carry bookkeeping columns (the seq) — align to target
    val deduped = lastWinsByKey(updates, key, seq)
      .select(target.columns.map(col).toIndexedSeq: _*)
    // null-safe anti-join: groupBy above treats NULL keys as one group, so
    // the anti-join must too (plain = never matches NULL and a NULL-key row
    // would both survive AND re-insert, duplicating on every merge)
    val updKeys = deduped.select(key.map(k => col(k).as(s"_u_$k")): _*)
    val cond = key.map(k => target(k) <=> updKeys(s"_u_$k")).reduce(_ && _)
    target.join(updKeys, cond, "left_anti")
      .unionByName(deduped)
  }

  /** Order-aware last-wins dedup (reference A1, `kafka_stream_data.py:78-79`:
    * dict-comprehension keeps the LAST occurrence). `seq` is the explicit
    * arrival-order column — positional semantics are made explicit so the
    * result is deterministic under shuffle. Single shuffle on `key`;
    * max_by is a hash aggregate (partial map-side combine), cheaper than a
    * window sort at scale.
    */
  def lastWinsByKey(df: DataFrame, key: Seq[String], seq: Column): DataFrame = {
    val cols = df.columns.map(col)
    df.groupBy(key.map(col): _*)
      .agg(max_by(struct(cols: _*), seq).as("_row"))
      .select(col("_row.*"))
  }

  /** Spread rows across the session's full shuffle-partition count, keyed
    * by `key`. Unlike `repartition(col)` (shuffle origin
    * REPARTITION_BY_COL), an explicit count is exempt from AQE partition
    * coalescing — which otherwise sees a byte-small but CPU-heavy stage
    * (e.g. the documents table before a per-char transform) and
    * serializes it back through ONE task. Byte size is AQE's only signal;
    * when the downstream cost is CPU per row, pin the fan-out.
    */
  def spread(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key)

  /** Incremental materialized-view maintenance for distributive aggregates
    * (count / sum): [[partialAggs]] turns raw rows into per-key partials,
    * [[mergePartialAggs]] folds a new delta's partials into a prior
    * snapshot by re-summing. History is never rescanned — only the
    * snapshot (|keys| rows, typically ≪ the fact table) and the delta
    * move, which is the only refresh shape that survives a 100 TB history
    * with daily deltas. The batch analogue of streaming state-store
    * aggregation; partials are also the unit that merges across shards,
    * engines, or a backfill + live split.
    */
  def partialAggs(df: DataFrame, keys: Seq[String], cntCol: String,
                  sums: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as(cntCol) +: sums.map { case (n, c) => sum(c).as(n) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial-agg frames (same schema) into one:
    * counts and sums re-sum; the result is again a valid partial. */
  def mergePartialAggs(partials: Seq[DataFrame], keys: Seq[String],
                       cntCol: String, sumCols: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "mergePartialAggs: no inputs")
    val aggs = sum(col(cntCol)).as(cntCol) +: sumCols.map(n => sum(col(n)).as(n))
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
