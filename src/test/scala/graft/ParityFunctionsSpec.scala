package graft

import org.apache.spark.sql.functions._
import graft.functions.{ParityFunctions => PF, StripAccents}

/** Edge-case parity with the reference's transforms (semantics verified in
  * SURVEY §2a / FIXTURES §1): T2 accent strip, T3 merge, T4 date split. */
class ParityFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("T2: strip accents matches unidecode on the French corpus") {
    assert(StripAccents.strip("Crèmerie Noël") == "Cremerie Noel")
    assert(StripAccents.strip("Épicerie Générale") == "Epicerie Generale")
    assert(StripAccents.strip("Réfrigéré à -18°C") == "Refrigere a -18°C")
    assert(StripAccents.strip("plain ascii") == "plain ascii")
    assert(StripAccents.strip("") == "")
  }

  test("T2: expression handles NULL and runs inside a projection") {
    val df = Seq(Some("Présence de Listeria"), None).toDF("s")
      .select(StripAccents.stripAccents($"s").as("out"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Presence de Listeria"), None))
  }

  test("T3: merge branch table from the reference") {
    val rows = Seq(
      ("Listériose", "Fièvre"),   // both → joined with \n
      ("Ne plus consommer", ""),  // one-sided
      ("", "only b"),             // other side
      ("", ""),                   // both empty → NULL
      (null, null)                // both null → NULL
    ).toDF("a", "b")
    val out = rows.select(PF.mergeColumns($"a", $"b").as("m"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("Listériose\nFièvre"), Some("Ne plus consommer"),
      Some("only b"), None, None))
  }

  test("T4: date split branches (two hits / depuis / jusqu / none)") {
    val rows = Seq(
      "Du 01/03/2024 au 15/04/2024",
      "depuis le 28/05/1997",
      "jusqu'au 02/09/1999",
      "sans date",
      "Le 01/02/2020 seulement" // one hit, no keyword → (null, null)
    ).toDF("t")
    val out = rows.select(PF.splitDateRange($"t").as("r"))
      .select($"r.start", $"r.end")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq
    assert(out == Seq(
      (Some("01/03/2024"), Some("15/04/2024")),
      (Some("28/05/1997"), None),
      (None, Some("02/09/1999")),
      (None, None),
      (None, None)))
  }

  test("word shingles: short docs yield empty, no descending-sequence garbage") {
    val out = Seq("one two", "a b c d").toDF("t")
      .select(PF.wordShingles($"t", 3).as("sh"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(out == Seq(Seq(), Seq("a b c", "b c d")))
  }
}
