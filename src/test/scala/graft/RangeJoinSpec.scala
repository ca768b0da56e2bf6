package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("binned range join == naive range join, without a nested-loop plan") {
    val events = Seq.tabulate(200)(i => (i.toLong, d(f"2024-${i % 12 + 1}%02d-${i % 28 + 1}%02d")))
      .toDF("ev_id", "ts")
    val windows = Seq(
      (1L, d("2024-01-10"), d("2024-01-24")),
      (2L, d("2024-03-01"), d("2024-03-15")),
      (3L, d("2024-06-20"), d("2024-07-04")), // straddles a month boundary
      (4L, d("2024-12-01"), d("2024-12-15")))
      .toDF("w_id", "w_start", "w_end")

    val binned = RangeJoin.binned(events, windows, "ts", "w_start", "w_end", 14)
      .select($"ev_id", $"w_id")
    val naive = events.join(windows,
        $"ts" >= $"w_start" && $"ts" <= $"w_end")
      .select($"ev_id", $"w_id")
    assert(binned.collect().toSet == naive.collect().toSet)
    assert(naive.collect().nonEmpty)

    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join must not nest-loop:\n$plan")
  }

  test("intervals longer than the bin width still match completely") {
    val events = Seq((1L, d("2024-01-01")), (2L, d("2024-01-20")), (3L, d("2024-02-10")))
      .toDF("ev_id", "ts")
    val windows = Seq((9L, d("2023-12-25"), d("2024-02-20"))).toDF("w_id", "w_start", "w_end")
    val out = RangeJoin.binned(events, windows, "ts", "w_start", "w_end", 7)
      .select($"ev_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }
}
