package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.sources.PaginatedHttpSource

/** Runnable end-to-end example of the reference-parity pipeline (EP1→EP2)
  * against a stub transport — demonstrates the public API without a broker
  * or egress: incremental fetch → 31→25 transform → JSON topic dir →
  * streaming ingest → idempotent parquet sink → replay shows no dupes.
  *
  *   sbt "runMain graft.pipeline.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val rows = Seq(
      Map("reference_fiche" -> "R-1", "date_de_publication" -> "2024-04-19",
        "motif_du_rappel" -> "Présence de Listéria",
        "risques_encourus_par_le_consommateur" -> "Listériose",
        "description_complementaire_du_risque" -> "Fièvre",
        "date_debut_fin_de_commercialisation" -> "depuis le 01/03/2024"),
      Map("reference_fiche" -> "R-2", "date_de_publication" -> "2024-04-20",
        "motif_du_rappel" -> "Corps étranger"))
    val transport: PaginatedHttpSource.Transport =
      (_, off, _) => if (off == 0) rows else Seq()

    val produced = Jobs.producer(spark, transport, s"$tmp/wm.json", Some(s"$tmp/topic"))
    println(s"[demo] produced=${produced.count()} watermark=" +
      PaginatedHttpSource.readWatermark(s"$tmp/wm.json"))
    Jobs.ingest(spark, s"$tmp/topic", s"$tmp/sink", s"$tmp/cp1").awaitTermination()
    println(s"[demo] sink after ingest 1: ${spark.read.parquet(s"$tmp/sink").count()}")
    Jobs.ingest(spark, s"$tmp/topic", s"$tmp/sink", s"$tmp/cp2").awaitTermination()
    println(s"[demo] sink after replay:  ${spark.read.parquet(s"$tmp/sink").count()}")
    spark.read.parquet(s"$tmp/sink")
      .select("reference_fiche", "motif_du_rappel", "risques_pour_le_consommateur",
        "date_debut_commercialisation")
      .orderBy("reference_fiche").show(false)

    // DSv2 face of the same source: date predicate pushed to the transport,
    // pages fetched as parallel partitions.
    graft.sources.v2.TransportRegistry.register("demo",
      (where, off, _) => if (off == 0) rows.filter(_("date_de_publication") > where) else Seq())
    val v2 = spark.read.format("graft.sources.v2.HttpApiSource")
      .option("transport", "demo").option("limit", "100").option("maxOffset", "200")
      .load()
      .filter(org.apache.spark.sql.functions.col("date_de_publication") > "2024-04-19")
    println(s"[demo] DSv2 rows after pushed filter: ${v2.count()} " +
      s"(plan has residual Filter: ${v2.queryExecution.executedPlan.toString.contains("Filter (")})")
    spark.stop()
  }
}
