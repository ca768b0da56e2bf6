package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("report counts violations per check; row-level checks share one scan") {
    val dim = Seq(10L, 20L).toDF("d_k")
    val df = Seq(
      (Some(1L), Some(10L), 5.0, "O"),   // clean
      (Some(1L), Some(20L), -1.0, "F"),  // dup key + below range
      (Some(2L), None, 50.0, "X"),       // null fk + bad domain
      (Some(3L), Some(99L), 1e9, "P")    // orphan fk + above range
    ).toDF("k", "fk", "price", "status")
    val rep = Quality.report(df, Seq(
      Quality.Unique("k_unique", Seq("k")),
      Quality.NotNull("fk_not_null", "fk"),
      Quality.InRange("price_range", "price", 0.0, 100.0),
      Quality.Satisfies("status_domain", $"status".isin("O", "F", "P")),
      Quality.ForeignKey("fk_valid", "fk", dim, "d_k")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == Map(
      "k_unique" -> (1L, 4L),      // 1, 1, 2, 3 → one dup
      "fk_not_null" -> (1L, 4L),
      "price_range" -> (2L, 4L),   // -1.0 and 1e9
      "status_domain" -> (1L, 4L), // "X"
      "fk_valid" -> (1L, 4L)))     // 99 (NULL fk is NOT an fk violation)
  }

  test("row-level-only report plans exactly ONE scan of the input (structural, not exchange-reuse)") {
    val df = Seq((Some(1L), 5.0), (None, -1.0), (Some(3L), 1e9)).toDF("fk", "price")
    val rep = Quality.report(df, Seq(
      Quality.NotNull("fk_not_null", "fk"),
      Quality.InRange("price_range", "price", 0.0, 100.0),
      Quality.Satisfies("price_pos", $"price" > 0)))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan ".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, plan:\n$plan")
    assert(rep.collect().map(_.getString(0)).sorted ===
      Array("fk_not_null", "price_pos", "price_range"))
  }

  test("Satisfies counts NULL predicate results as violations") {
    val df = Seq(Some("a"), None).toDF("c")
    val rep = Quality.report(df, Seq(
      Quality.Satisfies("c_is_a", $"c" === "a")))
      .head()
    assert(rep.getLong(1) == 1L) // the NULL row: predicate NULL → violation
  }

  test("Unique groups NULL keys like values; a lone NULL is no duplicate") {
    val df = Seq(Some(1L), None, None).toDF("k")
    val rep = Quality.report(df, Seq(Quality.Unique("u", Seq("k")))).head()
    // key groups: {1}×1, {NULL}×2 → exactly one duplicate beyond the first
    assert(rep.getLong(1) == 1L && rep.getLong(2) == 3L)
    val lone = Quality.report(Seq(Some(1L), None).toDF("k"),
      Seq(Quality.Unique("u", Seq("k")))).head()
    assert(lone.getLong(1) == 0L) // countDistinct would have flagged the NULL
  }

  test("empty table reports zero violations, not NULL; empty check list rejected") {
    val empty = Seq.empty[(Long, String)].toDF("k", "c")
    val rep = Quality.report(empty, Seq(
      Quality.NotNull("c_nn", "c"), Quality.Unique("k_u", Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("c_nn" -> 0L, "k_u" -> 0L))
    intercept[IllegalArgumentException] {
      Quality.report(empty, Seq.empty)
    }
  }
}
