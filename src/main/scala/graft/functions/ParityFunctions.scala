package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders re-expressing the reference's row-level transforms
  * (`src/kafka_client/transformations.py`) as declarative Spark expressions —
  * they stay inside whole-stage codegen instead of running per-row Python.
  */
object ParityFunctions {

  /** T3 (`transformations.py:6-21`): merge two nullable string columns with a
    * newline; empty string and NULL are both "absent"; both absent → NULL.
    * `concat_ws` skips NULLs, the outer `nullif` restores NULL-when-both-empty
    * (semantics verified against the reference, SURVEY §2a).
    */
  def mergeColumns(a: Column, b: Column): Column =
    nullif(concat_ws("\n", nullif(a, lit("")), nullif(b, lit(""))), lit(""))

  private val datePattern = "(\\d{2}/\\d{2}/\\d{4})"

  /** T4 (`transformations.py:24-41`): extract a commercialisation date range
    * from free text, with the reference's EXACT branch structure: exactly
    * two DD/MM/YYYY hits → (first, second); 3+ hits → both NULL (the
    * reference checks `len(patterns) == 2`, not `>= 2`); exactly one hit →
    * an if/elif chain, so "depuis le" wins and "jusqu" only sets the end
    * when "depuis le" is absent. Returns a 2-field struct (`start`, `end`).
    */
  def splitDateRange(text: Column): Column = {
    val hits = regexp_extract_all(text, lit(datePattern))
    val n = size(hits)
    val lowerText = lower(text)
    val start = when(n === 2, element_at(hits, 1))
      .when(n === 1 && lowerText.contains("depuis le"), element_at(hits, 1))
    val end = when(n === 2, element_at(hits, 2))
      .when(n === 1 && !lowerText.contains("depuis le") && lowerText.contains("jusqu"),
        element_at(hits, 1))
    struct(start.as("start"), end.as("end"))
  }

  /** Order-independent membership fingerprint of a grouped id column:
    * md5 over the sorted, comma-joined ids. The cross-engine contract —
    * DuckDB mirror: `md5(list_aggregate(list_sort(list(id)), 'string_agg',
    * ','))` — lives HERE in one place; the sort makes the digest
    * aggregation-order-independent, so it is shuffle-safe. Used by the
    * sampling/pipeline faces (q117/q118/q120) to pin exact sample
    * membership, not just counts. */
  def idsFingerprint(id: Column): Column =
    md5(array_join(transform(array_sort(collect_list(id)),
      _.cast("string")), ",").cast("binary"))

  /** Whitespace tokenization with lowercasing — shared by the text-analysis
    * and dedup operators. Empty tokens (from repeated spaces) are dropped.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** Distinct word n-grams (shingles) of `n` consecutive tokens, joined by a
    * single space. Built with higher-order functions only — stays codegen'd.
    *
    * Perf: callers should pass a MATERIALIZED tokens column (separate
    * projection), not `tokens(text)` inline — otherwise every array access
    * in the lambda re-runs the split. `slice` keeps it to one array
    * reference per shingle.
    */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    array_distinct(shingleSeq(ts, n))

  /** All n-token shingles IN ORDER (duplicates kept). When per-row
    * n-gram arrays run to HUNDREDS of elements (char trigrams — q104),
    * explode this raw sequence and dedup with a `.distinct()` aggregate:
    * feeding `array_distinct(...)` as a generator input measured ~12×
    * slower there than the identical expression in a plain projection,
    * and after `spread(df, id)` the distinct aggregate is partition-local
    * (`HashPartitioning(id)` satisfies the (id, shingle) clustering — no
    * exchange, and downstream `groupBy(id)` stays exchange-free). For
    * ~50-token word shingles the trade INVERTS (A/B-measured 15-25%
    * slower): the O(n²) per-row distinct is cheap at n≈50 and beats
    * per-row hash-table inserts — use [[shinglesFromTokens]] there. */
  def shingleSeq(ts: Column, n: Int): Column = {
    val cnt = size(ts) - (n - 1)
    // Guard: sequence(1, 0) would yield a DESCENDING [1, 0] in Spark.
    when(cnt >= 1,
      transform(sequence(lit(1), cnt),
        i => array_join(slice(ts, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  def wordShingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)
}
