package graft

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.pipeline.{Jobs, RappelConso}
import graft.sources.JdbcIO
import graft.sources.v2.TransportRegistry

/** Pipeline E2E over the DSv2 HTTP source: the watermark predicate pushed
  * into the transport → last-wins dedup → 31→25 transform → key-pruned
  * anti-join → Derby append, with request-count and replay-idempotence
  * assertions (the reference's EP1+EP2 composed, `spark_streaming.py:68-92`
  * + `kafka_stream_data.py:117-125`, driven end-to-end through the engine's
  * DataSource-V2 face instead of the driver-side fetch loop).
  */
class PipelineV2Spec extends SparkSpec {
  import spark.implicits._

  // Spark's built-in Derby dialect maps StringType → CLOB, so writing a
  // NULL into a VARCHAR column fails setNull(CLOB) type conversion (the
  // transform legitimately produces NULLs for absent columns). Register a
  // VARCHAR mapping; registered dialects take precedence over built-ins.
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
    new org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
        case StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(512)", java.sql.Types.VARCHAR))
        case _ => None
      }
    })

  private val url = "jdbc:derby:memory:graftv2;create=true"
  private val props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  private val rawSchema = StructType(Seq(
    StructField("reference_fiche", StringType, true),
    StructField("date_de_publication", StringType, true),
    StructField("nom_de_la_marque_du_produit", StringType, true)))

  test("DSv2 ingest: pushdown fetch → dedup → anti-join → Derby; replay adds 0") {
    val table = "rappel_v2"
    JdbcIO.createAllTextTable(url, table, RappelConso.dbFields,
      "reference_fiche", props, colType = "VARCHAR(512)")
    def row(ref: String, date: String, marque: String) = Map(
      "reference_fiche" -> ref, "date_de_publication" -> date,
      "nom_de_la_marque_du_produit" -> marque)
    // R-A appears twice (the pagination-restart re-fetch shape) — the
    // LATER occurrence must win, like the reference's dict-comprehension
    val all = Seq(
      row("R-A", "2024-03-01", "stale"),
      row("R-B", "2024-03-01", "brandB"),
      row("R-A", "2024-03-02", "fresh"))
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    TransportRegistry.register("pipev2", (where, offset, limit) => {
      calls.incrementAndGet()
      all.filter(_("date_de_publication") > where).slice(offset, offset + limit)
    })
    val wm = Files.createTempDirectory("wmv2").toString + "/wm.json"

    val run1 = Jobs.ingestV2(spark, "pipev2", rawSchema, wm, url, table, props,
      limit = 2, maxOffset = 10000)
    assert(run1.count() == 2)
    val marques = run1.select("reference_fiche", "nom_de_la_marque_du_produit")
      .as[(String, String)].collect().toMap
    assert(marques == Map("R-A" -> "fresh", "R-B" -> "brandB"))
    assert(JdbcIO.readTable(spark, url, table, props).count() == 2)
    // exactly the page loop's request count: one full page (2 rows), one
    // short page (1 row) — and the persist means ONE fetch across the
    // append + watermark actions
    val run1Calls = calls.get()
    assert(run1Calls == 2, s"expected 2 transport requests, got $run1Calls")
    // S4: watermark advanced to max(2024-03-02) − 1 day
    assert(graft.sources.PaginatedHttpSource.readWatermark(wm) == "2024-03-01")

    // replay: where=2024-03-01 re-fetches only the boundary row (remote
    // filter is a strict >), and the anti-join drops it — idempotent
    val run2 = Jobs.ingestV2(spark, "pipev2", rawSchema, wm, url, table, props,
      limit = 2, maxOffset = 10000)
    assert(run2.count() == 0)
    assert(JdbcIO.readTable(spark, url, table, props).count() == 2)
    assert(calls.get() - run1Calls == 1,
      s"replay should issue exactly one short-page request, got ${calls.get() - run1Calls}")
  }
}
