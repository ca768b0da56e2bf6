package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.functions.{ParityFunctions => PF, StripAccents}

/** The reference pipeline's data model and row transform, re-expressed as a
  * single declarative Spark projection.
  *
  * Schema: 25 nullable string columns (reference `src/constants.py:24-57`,
  * `src/spark_pgsql/spark_streaming.py:57-59`). Transform: the reference's
  * `transform_row` (`src/kafka_client/transformations.py:64-85`) — T1
  * column-subset passthrough, T2 accent-normalize on 12 columns, T3
  * conditional merge ×3, T4 regex date-range split — which there runs as
  * per-row Python in the producer; here it is ONE `select` of codegen'd
  * column expressions, distributed over however many partitions the source
  * has (the 100 TB posture: no per-row driver work).
  */
object RappelConso {

  val columnsToKeep: Seq[String] = Seq(
    "reference_fiche",
    "liens_vers_les_images",
    "lien_vers_la_liste_des_produits",
    "lien_vers_la_liste_des_distributeurs",
    "lien_vers_affichette_pdf",
    "lien_vers_la_fiche_rappel",
    "date_de_publication",
    "date_de_fin_de_la_procedure_de_rappel")

  val columnsToNormalize: Seq[String] = Seq(
    "categorie_de_produit",
    "sous_categorie_de_produit",
    "nom_de_la_marque_du_produit",
    "noms_des_modeles_ou_references",
    "identification_des_produits",
    "conditionnements",
    "temperature_de_conservation",
    "zone_geographique_de_vente",
    "distributeurs",
    "motif_du_rappel",
    "numero_de_contact",
    "modalites_de_compensation")

  val newColumns: Seq[String] = Seq(
    "risques_pour_le_consommateur",
    "recommandations_sante",
    "date_debut_commercialisation",
    "date_fin_commercialisation",
    "informations_complementaires")

  /** The 25-column sink field list, in the reference's order
    * (`constants.py:57`: KEEP ++ NORMALIZE ++ NEW). */
  val dbFields: Seq[String] = columnsToKeep ++ columnsToNormalize ++ newColumns

  /** All-nullable-string sink schema (`spark_streaming.py:57-59`). */
  val schema: StructType =
    StructType(dbFields.map(f => StructField(f, StringType, nullable = true)))

  /** Merge-source column pairs (`transformations.py:67-81`). */
  private val mergePairs: Seq[(String, String, String)] = Seq(
    ("risques_pour_le_consommateur",
      "risques_encourus_par_le_consommateur", "description_complementaire_du_risque"),
    ("recommandations_sante",
      "preconisations_sanitaires", "conduites_a_tenir_par_le_consommateur"),
    ("informations_complementaires",
      "informations_complementaires", "informations_complementaires_publiques"))

  /** The RAW API column set the transform consumes (the ~31 upstream
    * columns minus the two dropped version-control ones): passthrough +
    * normalize inputs + the six merge SOURCES + the composite date-range
    * column. This — not [[dbFields]] — is the stable schema of a quiet
    * (empty-fetch) read: a data-bearing fetch of the real API returns
    * these raw names, so only this set keeps caller projections resolving
    * on every run. */
  val rawApiFields: Seq[String] =
    (columnsToKeep ++ columnsToNormalize ++
      mergePairs.flatMap { case (_, a, b) => Seq(a, b) } :+
      "date_debut_fin_de_commercialisation").distinct

  private def rawCol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast(StringType)

  /** The full 31→25-column transform (T1∘T2, T3×3, T4) as one projection.
    * Missing input columns behave like the reference's `dict.get` → NULL.
    */
  def transform(raw: DataFrame): DataFrame = {
    // T2 with the reference's falsy rule: empty string in → NULL out
    // (`transformations.py:46-48`: `if not text: return None`).
    def normalized(c: Column): Column =
      when(c.isNull || c === "", lit(null).cast(StringType))
        .otherwise(StripAccents.stripAccents(c))
    val dates = PF.splitDateRange(rawCol(raw, "date_debut_fin_de_commercialisation"))
    val byName: Map[String, Column] =
      columnsToKeep.map(n => n -> rawCol(raw, n)).toMap ++
      columnsToNormalize.map(n => n -> normalized(rawCol(raw, n))).toMap ++
      mergePairs.map { case (out, a, b) =>
        out -> normalized(PF.mergeColumns(rawCol(raw, a), rawCol(raw, b)))
      }.toMap ++
      Map("date_debut_commercialisation" -> dates.getField("start"),
          "date_fin_commercialisation" -> dates.getField("end"))
    raw.select(dbFields.map(n => byName(n).as(n)): _*)
  }
}
