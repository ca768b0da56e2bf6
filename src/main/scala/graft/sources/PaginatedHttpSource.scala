package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's incremental HTTP extraction (S1–S4,
  * `src/kafka_client/kafka_stream_data.py:21-98`), re-expressed with a
  * pluggable transport so it is testable without egress.
  *
  * Driver-side by design: the remote API serves at most `maxOffset` rows
  * per date window (`constants.py:6`), so a fetch is inherently ≤10k rows —
  * distributing it buys nothing. The fetched page set becomes a DataFrame
  * immediately; everything downstream (transform, dedup, sinks) is
  * distributed. A DataSource-V2 wrapper would only change where the same
  * driver loop runs.
  *
  * Semantics preserved (SURVEY §2a):
  *  - S2: remote predicate+sort pushdown — the `where date_de_publication >
  *    '{ts}' order_by ASC` is part of the page request (the source, not
  *    Spark, filters).
  *  - S1: page loop stops when a short page arrives; when offset+limit
  *    would exceed `maxOffset`, restart pagination from the last page's max
  *    date minus one day (strict `>` in the remote filter).
  *  - S3/S4: JSON-file watermark, advanced to max(date_de_publication) − 1
  *    day.
  */
object PaginatedHttpSource {

  /** transport(where, offset, limit) → page of JSON-object rows, already
    * decoded to key→value maps (a real impl would GET the reference's URL
    * template and parse `results`). */
  type Transport = (String, Int, Int) => Seq[Map[String, String]]

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def readWatermark(path: String): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) "0001-01-01"
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      "\"last_processed\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse("0001-01-01")
    }
  }

  /** S4: watermark advances to max(date) − 1 day (the remote filter is a
    * strict `>`, `kafka_stream_data.py:33-45`). */
  def writeWatermark(path: String, maxDate: String): Unit = {
    val minusOne = LocalDate.parse(maxDate, fmt).minusDays(1).format(fmt)
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, s"""{"last_processed": "$minusOne"}""".getBytes(StandardCharsets.UTF_8))
  }

  /** S1: paginate with short-page stop and offset-cap restart, mirroring
    * the reference loop exactly (`kafka_stream_data.py:48-75`): cumulative
    * count advances the offset; when count+limit would reach the cap,
    * restart from the LAST row's date − 1 day (rows arrive date-ASC) with
    * offset 0 — re-fetched rows are handled by the downstream last-wins
    * dedup. */
  def fetchAll(transport: Transport, lastProcessed: String,
               limit: Int = 100, maxOffset: Int = 10000): Seq[Map[String, String]] =
    fetchPages(transport, lastProcessed, limit, maxOffset).flatten

  /** Page-granular variant of the same loop — the DSv2 scan
    * ([[graft.sources.v2.HttpApiSource]]) plans one InputPartition per
    * returned page, so both faces share this single loop (and issue an
    * identical number of requests). */
  def fetchPages(transport: Transport, lastProcessed: String,
                 limit: Int = 100, maxOffset: Int = 10000,
                 dateCol: String = "date_de_publication"): Seq[Seq[Map[String, String]]] = {
    val out = Seq.newBuilder[Seq[Map[String, String]]]
    var where = lastProcessed
    var n = 0
    var done = false
    while (!done) {
      val page = transport(where, n, limit)
      if (page.nonEmpty) out += page
      n += page.size
      if (page.size < limit) done = true
      else if (n + limit >= maxOffset) {
        val lastDate = page.last.getOrElse(dateCol,
          sys.error(s"page row missing $dateCol"))
        where = LocalDate.parse(lastDate, fmt).minusDays(1).format(fmt)
        n = 0
      }
    }
    out.result()
  }

  /** Full S1–S4 read: fetch new rows since the watermark, last-wins dedup on
    * the business key (A1 — pagination restarts re-fetch rows), advance the
    * watermark, return a DataFrame with one string column per key seen.
    *
    * `emptySchemaCols` is the column set of the frame returned on a quiet
    * no-new-data run (default: the RAW RappelConso API columns — what a
    * data-bearing fetch of the real API yields, so the same projections
    * resolve on busy AND quiet runs; NOT the post-transform `dbFields`,
    * whose names differ from the raw ones). Without it the schema would
    * depend on WHAT the fetch returned — a run-dependent contract.
    */
  def read(spark: SparkSession, transport: Transport, watermarkPath: String,
           keyCol: String = "reference_fiche",
           limit: Int = 100, maxOffset: Int = 10000,
           emptySchemaCols: Seq[String] = graft.pipeline.RappelConso.rawApiFields): DataFrame = {
    import spark.implicits._
    val rows = fetchAll(transport, readWatermark(watermarkPath), limit, maxOffset)
    // Routine "no new data since watermark" run: short-circuit BEFORE schema
    // inference — columns are derived from returned rows, so an empty fetch
    // would otherwise produce a keyless frame the dedup can't resolve
    // (the reference guards this with `if full_data:`,
    // kafka_stream_data.py:89). Watermark stays untouched, like the reference.
    if (rows.isEmpty) {
      // .sorted matches the data-bearing path's column ordering below, so
      // positional consumers see the same layout on quiet and busy runs
      // (busy runs may still carry EXTRA columns beyond this canonical set
      // if the API returns keys outside rawApiFields — by-name access is
      // the stable contract)
      val cols = (if (emptySchemaCols.contains(keyCol)) emptySchemaCols
                  else keyCol +: emptySchemaCols).sorted
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.StringType, nullable = true))))
    }
    val columns = rows.flatMap(_.keys).distinct.sorted
    val df = rows.zipWithIndex
      .map { case (m, i) => (i.toLong, columns.map(c => m.get(c).orNull)) }
      .toDF("_seq", "_vals")
      .select(col("_seq") +: columns.zipWithIndex.map { case (c, i) =>
        col("_vals").getItem(i).as(c) }: _*)
    val deduped = graft.operators.Relational.lastWinsByKey(df, Seq(keyCol), col("_seq"))
      .drop("_seq")
    val maxDate = rows.flatMap(_.get("date_de_publication")).maxOption
    maxDate.foreach(writeWatermark(watermarkPath, _))
    deduped
  }
}
