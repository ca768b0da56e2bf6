package graft

import graft.operators.{Scored, TopKAggregator}

class TopKAggregatorSpec extends SparkSpec {

  private val agg = new TopKAggregator(3)

  private def ref(xs: Seq[Scored], k: Int = 3): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("reduce keeps a sorted k-bounded buffer equal to the brute-force top-k") {
    val xs = Seq(5.0 -> 1L, 2.0 -> 2L, 9.0 -> 3L, 9.0 -> 0L, 7.0 -> 4L,
      1.0 -> 5L, 9.0 -> 9L).map { case (s, i) => Scored(s, i) }
    val got = xs.foldLeft(agg.zero)(agg.reduce)
    assert(got == ref(xs))
    // ties resolve by id asc: both 9.0s with smaller ids beat id=9
    assert(got.map(_.id) == Seq(0L, 3L, 9L))
  }

  test("merge of partials is associative and equals top-k of the union") {
    val a = Seq(Scored(8, 1), Scored(6, 2), Scored(4, 3))
    val b = Seq(Scored(9, 7), Scored(6, 0), Scored(5, 5))
    val c = Seq(Scored(7, 8))
    val m1 = agg.merge(agg.merge(a, b), c)
    val m2 = agg.merge(a, agg.merge(b, c))
    assert(m1 == m2)
    assert(m1 == ref(a ++ b ++ c))
    assert(agg.merge(agg.zero, a) == a && agg.merge(a, agg.zero) == a)
  }

  test("typed Dataset aggregation matches the window spelling") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 200L).map(i => ((i % 7).toString, Scored((i * 37 % 101).toDouble, i)))
    val ds = rows.toDS()
    val viaAgg = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAggregator(3).toColumn.name("top"))
      .flatMap { case (g, top) => top.map(s => (g, s.score, s.id)) }
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = ds.map { case (g, s) => (g, s.score, s.id) }.toDF("g", "score", "id")
      .withColumn("rnk", row_number().over(w)).filter($"rnk" <= 3)
      .select($"g", $"score", $"id").as[(String, Double, Long)]
      .collect().toSet
    assert(viaAgg == viaWindow)
  }
}
