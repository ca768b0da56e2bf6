package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.sources.v2.TransportRegistry

/** DSv2 HTTP source: predicate pushdown reaches the remote transport (the
  * reference's S2 semantics as true source pushdown) and pages are planned
  * as parallel input partitions.
  */
class HttpApiSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("reference_fiche", StringType, true),
    StructField("date_de_publication", StringType, true)))

  test("date filter is pushed into the transport's where parameter") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    TransportRegistry.register("spec1", (where, offset, limit) => {
      seen.add((where, offset))
      // the remote service applies the predicate itself, like the real API
      val all = Seq(
        Map("reference_fiche" -> "a", "date_de_publication" -> "2024-01-03"),
        Map("reference_fiche" -> "b", "date_de_publication" -> "2024-01-07"),
        Map("reference_fiche" -> "c", "date_de_publication" -> "2024-01-09"))
      val filtered = all.filter(_("date_de_publication") > where)
      filtered.slice(offset, offset + limit)
    })
    val df = spark.read.format("graft.sources.v2.HttpApiSource")
      .schema(schema)
      .option("transport", "spec1")
      .option("limit", "2").option("maxOffset", "8")
      .load()
      .filter($"date_de_publication" > "2024-01-05")
    val refs = df.select("reference_fiche").as[String].collect().sorted.toSeq
    assert(refs == Seq("b", "c"))
    val calls = seen.iterator().asScala.toList
    // every page request carried the pushed predicate
    assert(calls.nonEmpty && calls.forall(_._1 == "2024-01-05"))
    // sequential page loop: full page at 0, short page at 2, STOP — no
    // fixed maxOffset/limit fan-out
    assert(calls.map(_._2) == List(0, 2))
    // the filter is fully absorbed: no post-scan Filter node in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"residual filter in:\n$plan")
  }

  test("a 2-row day issues exactly ONE transport request") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    TransportRegistry.register("spec2", (_, offset, limit) => {
      calls.incrementAndGet()
      Seq(
        Map("reference_fiche" -> "x", "date_de_publication" -> "2024-02-01"),
        Map("reference_fiche" -> "y", "date_de_publication" -> "2024-02-01"))
        .slice(offset, offset + limit)
    })
    val df = spark.read.format("graft.sources.v2.HttpApiSource")
      .schema(schema)
      .option("transport", "spec2")
      .option("limit", "100").option("maxOffset", "10000")
      .load()
    assert(df.count() == 2)
    assert(calls.get() == 1, s"expected 1 transport call, got ${calls.get()}")
  }

  test("offset-cap restart inside the scan matches the driver-side loop") {
    val rows = Seq("2024-01-01" -> "a", "2024-01-02" -> "b", "2024-01-03" -> "c",
      "2024-01-04" -> "d", "2024-01-05" -> "e")
    def transport(count: java.util.concurrent.atomic.AtomicInteger)
        : graft.sources.PaginatedHttpSource.Transport = (where, offset, limit) => {
      count.incrementAndGet()
      rows.filter(_._1 > where).map { case (d, r) =>
        Map("reference_fiche" -> r, "date_de_publication" -> d)
      }.slice(offset, offset + limit)
    }
    val dsv2Calls = new java.util.concurrent.atomic.AtomicInteger(0)
    TransportRegistry.register("spec3", transport(dsv2Calls))
    val df = spark.read.format("graft.sources.v2.HttpApiSource")
      .schema(schema)
      .option("transport", "spec3")
      .option("limit", "2").option("maxOffset", "4")
      .load()
    val got = df.select("reference_fiche").as[String].collect().sorted.toSeq

    val refCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val want = graft.sources.PaginatedHttpSource
      .fetchAll(transport(refCalls), "0001-01-01", limit = 2, maxOffset = 4)
      .map(_("reference_fiche")).sorted
    assert(got == want) // restart overlap rows included, exactly like fetchAll
    assert(dsv2Calls.get() == refCalls.get(),
      s"dsv2 issued ${dsv2Calls.get()} requests, reference loop ${refCalls.get()}")
  }
}
