package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Relational.globalRunningSum / globalRank — the distributed prefix-scan
  * (range partition + per-partition offsets) must agree row-for-row with
  * the single-partition window it replaces.
  */
class GlobalScanSpec extends SparkSpec {
  import spark.implicits._

  private def refRunningSum(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    // reference: sequential scan in (key) order; key is unique
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
  }

  test("globalRunningSum matches a sequential prefix scan on a total order") {
    val data = (1L to 997L).map(k => (k * 7919 % 1000, (k % 13) - 6)) // mixed-sign deltas
      .map { case (k, v) => (k, v) }
    // keys from k*7919%1000 collide; make unique via zipWithIndex
    val uniq = data.zipWithIndex.map { case ((k, v), i) => (k * 10000 + i, v) }
    val df = uniq.toDF("k", "v").repartition(7)
    val got = Relational.globalRunningSum(df, Seq($"k".asc), $"v", "ps")
      .select($"k", $"ps").as[(Long, Long)].collect().toMap
    assert(got == refRunningSum(uniq.map { case (k, v) => (k, v.toLong) }))
  }

  test("globalRank matches row_number over the same total order") {
    val df = (1 to 500).map(i => (i * 37 % 501, i)).toDF("a", "id")
    val got = Relational.globalRank(df, Seq($"a".asc, $"id".asc), "r")
      .select($"id", $"r").as[(Int, Long)].collect().toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy($"a".asc, $"id".asc)).cast("long"))
      .select($"id", $"r").as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRunningSum survives an empty input and a 1-row input") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Relational.globalRunningSum(empty, Seq($"k"), $"v", "ps").count() == 0)
    val one = Seq((5L, 42L)).toDF("k", "v")
    val r = Relational.globalRunningSum(one, Seq($"k"), $"v", "ps")
      .select($"ps").as[Long].collect()
    assert(r.toSeq == Seq(42L))
  }

  test("globalRunningMax matches a sequential prefix max (mixed signs, desc order)") {
    val data = (1L to 499L).map(k => (k * 7919 % 1000 * 1000 + k, (k % 23) - 11))
    val df = data.toDF("k", "v").repartition(6)
    val got = Relational.globalRunningMax(df, Seq($"k".desc), $"v", "rm")
      .select($"k", $"rm").as[(Long, Long)].collect().toMap
    var acc = Long.MinValue
    val want = data.sortBy(-_._1).map { case (k, v) =>
      acc = math.max(acc, v); k -> acc
    }.toMap
    assert(got == want)
  }

  test("globalRunningSum does not clobber caller columns named like temps") {
    val df = Seq((1L, 2L, 9L), (2L, 3L, 8L)).toDF("k", "v", "_pid")
    val out = Relational.globalRunningSum(df, Seq($"k"), $"v", "ps")
    assert(out.columns.toSet == Set("k", "v", "_pid", "ps"))
    assert(out.orderBy($"k").select($"ps").as[Long].collect().toSeq == Seq(2L, 5L))
  }
}
