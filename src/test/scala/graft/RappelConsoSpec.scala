package graft

import java.nio.file.Files

import graft.pipeline.{Jobs, RappelConso}
import graft.sources.PaginatedHttpSource

/** End-to-end parity with the reference pipeline: the FIXTURES §1.1 sample
  * row through the full 31→25 transform, pagination with offset-cap
  * restart, watermark advance (−1 day), and replay-idempotent ingest.
  */
class RappelConsoSpec extends SparkSpec {
  import spark.implicits._

  private val sampleRow: Map[String, String] = Map(
    "reference_fiche" -> "2024-04-0001",
    "ndeg_de_version" -> "1", "rappelguid" -> "ABC-123",
    "categorie_de_produit" -> "Alimentation",
    "sous_categorie_de_produit" -> "Produits laitiers",
    "nom_de_la_marque_du_produit" -> "Crèmerie Noël",
    "identification_des_produits" -> "Lot 42",
    "conditionnements" -> "", "temperature_de_conservation" -> "Réfrigéré",
    "zone_geographique_de_vente" -> "France entière",
    "distributeurs" -> "Épicerie Générale",
    "motif_du_rappel" -> "Présence de Listeria",
    "numero_de_contact" -> "0800000000",
    "modalites_de_compensation" -> "Remboursement",
    "risques_encourus_par_le_consommateur" -> "Listériose",
    "description_complementaire_du_risque" -> "Fièvre, maux de tête",
    "conduites_a_tenir_par_le_consommateur" -> "Ne plus consommer",
    "informations_complementaires" -> "",
    "date_debut_fin_de_commercialisation" -> "Du 01/03/2024 au 15/04/2024",
    "date_de_publication" -> "2024-04-19",
    "date_de_fin_de_la_procedure_de_rappel" -> "2024-06-19",
    "liens_vers_les_images" -> "https://img.jpg",
    "lien_vers_affichette_pdf" -> "https://a.pdf",
    "lien_vers_la_fiche_rappel" -> "https://fiche")

  private def df(rows: Seq[Map[String, String]]) = {
    val cols = rows.flatMap(_.keys).distinct.sorted
    rows.map(m => cols.map(c => m.get(c).orNull))
      .map { vs => org.apache.spark.sql.Row(vs: _*) }
      .pipe { rws =>
        spark.createDataFrame(spark.sparkContext.parallelize(rws),
          org.apache.spark.sql.types.StructType(cols.map(c =>
            org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType, true))))
      }
  }
  implicit class Piper[A](a: A) { def pipe[B](f: A => B): B = f(a) }

  test("FIXTURES sample row: full 31→25 transform matches reference semantics") {
    val out = RappelConso.transform(df(Seq(sampleRow)))
    assert(out.columns.toSeq == RappelConso.dbFields)
    val r = out.head()
    def v(c: String): Option[String] = Option(r.getString(out.columns.indexOf(c)))
    assert(v("reference_fiche").contains("2024-04-0001"))
    assert(v("risques_pour_le_consommateur").contains("Listeriose\nFievre, maux de tete"))
    assert(v("recommandations_sante").contains("Ne plus consommer"))
    assert(v("informations_complementaires").isEmpty) // both sides falsy
    assert(v("date_debut_commercialisation").contains("01/03/2024"))
    assert(v("date_fin_commercialisation").contains("15/04/2024"))
    assert(v("nom_de_la_marque_du_produit").contains("Cremerie Noel"))
    assert(v("conditionnements").isEmpty)              // empty → NULL (T2 falsy rule)
    assert(v("noms_des_modeles_ou_references").isEmpty) // absent input column → NULL
  }

  test("pagination: short-page stop, offset-cap restart, last-wins dedup") {
    // limit=2, maxOffset=4: pages of 2; at offset+limit>=4 restart with new where.
    def row(ref: String, date: String, payload: String) =
      Map("reference_fiche" -> ref, "date_de_publication" -> date, "p" -> payload)
    var calls = Seq.empty[(String, Int)]
    val transport: PaginatedHttpSource.Transport = (where, offset, limit) => {
      calls :+= (where, offset)
      (where, offset) match {
        // full page + cap (n+limit=4 >= 4) → restart from 2024-01-03 − 1d
        case ("2024-01-01", 0) => Seq(row("a", "2024-01-02", "old"), row("b", "2024-01-03", "x"))
        // re-fetches b (dedup keeps the later payload) + c; cap again
        case ("2024-01-02", 0) => Seq(row("b", "2024-01-03", "x2"), row("c", "2024-01-04", "y"))
        // short page → stop
        case ("2024-01-03", 0) => Seq(row("c", "2024-01-04", "y2"))
        case other => fail(s"unexpected call $other")
      }
    }
    val tmp = Files.createTempDirectory("wm").toString + "/wm.json"
    PaginatedHttpSource.writeWatermark(tmp, "2024-01-02") // → last_processed 2024-01-01
    val out = PaginatedHttpSource.read(spark, transport, tmp, limit = 2, maxOffset = 4)
    val got = out.select("reference_fiche", "p").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "old", "b" -> "x2", "c" -> "y2"))
    // watermark advanced to max(2024-01-04) − 1 day
    assert(PaginatedHttpSource.readWatermark(tmp) == "2024-01-03")
    assert(calls.size == 3)
  }

  test("empty fetch returns the FULL canonical schema (stable across runs)") {
    val transport: PaginatedHttpSource.Transport = (_, _, _) => Seq()
    val tmp = Files.createTempDirectory("wm_empty").toString + "/wm.json"
    PaginatedHttpSource.writeWatermark(tmp, "2024-01-02")
    val out = PaginatedHttpSource.read(spark, transport, tmp)
    // the quiet-run contract: the RAW API columns — what a data-bearing
    // run returns — so the same projections (incl. merge-source columns
    // like risques_encourus_par_le_consommateur) resolve on EVERY run
    assert(out.columns.toSeq.sorted == RappelConso.rawApiFields.sorted)
    assert(out.select("date_de_publication", "reference_fiche",
      "risques_encourus_par_le_consommateur").count() == 0)
    // and the transform accepts the quiet frame unchanged
    assert(RappelConso.transform(out).columns.toSeq == RappelConso.dbFields)
    // watermark untouched, like the reference's `if full_data:` guard
    assert(PaginatedHttpSource.readWatermark(tmp) == "2024-01-01")
  }

  test("ingest job: replay adds no rows (reference EP2 idempotence)") {
    val tmp = Files.createTempDirectory("ingest").toString
    val src = s"$tmp/src"
    val transformed = RappelConso.transform(df(Seq(
      sampleRow, sampleRow.updated("reference_fiche", "2024-04-0002"))))
    graft.sources.KafkaIO.toJsonValue(transformed).write.text(src)
    Jobs.ingest(spark, src, s"$tmp/sink", s"$tmp/cp1").awaitTermination()
    assert(spark.read.parquet(s"$tmp/sink").count() == 2)
    Jobs.ingest(spark, src, s"$tmp/sink", s"$tmp/cp2").awaitTermination()
    val sink = spark.read.parquet(s"$tmp/sink")
    assert(sink.count() == 2)
    assert(sink.columns.toSeq.sorted == RappelConso.dbFields.sorted)
  }

  test("producer job end-to-end: fetch → transform → JSON sink") {
    val tmp = Files.createTempDirectory("producer").toString
    val transport: PaginatedHttpSource.Transport = (_, offset, _) =>
      if (offset == 0) Seq(sampleRow) else Seq()
    val out = Jobs.producer(spark, transport, s"$tmp/wm.json", Some(s"$tmp/out"))
    assert(out.count() == 1)
    val line = spark.read.text(s"$tmp/out").head().getString(0)
    assert(line.contains("\"reference_fiche\":\"2024-04-0001\""))
    assert(line.contains("Listeriose\\nFievre"))
  }
}
