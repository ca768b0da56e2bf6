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
    // pages planned as parallel partitions (offsets 0,2,4,6)
    assert(calls.map(_._2).toSet == Set(0, 2, 4, 6))
    // the filter is fully absorbed: no post-scan Filter node in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"residual filter in:\n$plan")
  }
}
