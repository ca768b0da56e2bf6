package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Relational}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("lastWinsByKey keeps the highest-seq row per key (reference A1)") {
    val df = Seq((1L, "k1", "old"), (2L, "k1", "new"), (3L, "k2", "only"))
      .toDF("seq", "key", "payload")
    val out = Relational.lastWinsByKey(df, Seq("key"), $"seq")
      .orderBy($"key").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("k1", "new"), ("k2", "only")))
  }

  test("idempotentAppend drops existing keys; appending twice adds nothing") {
    val existing = Seq(1L, 2L).toDF("k")
    val batch = Seq((1L, "dup"), (3L, "fresh")).toDF("k", "v")
    val first = Relational.idempotentAppend(batch, existing, "k")
    assert(first.select("k").as[Long].collect().toSeq == Seq(3L))
    // replay: now 3 exists too → empty
    val second = Relational.idempotentAppend(batch, existing.union(first.select("k")), "k")
    assert(second.count() == 0)
  }

  test("upsert: matched keys update, new keys insert, conflicts last-win") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq(
      (2L, "B_stale", 0L), (2L, "B", 1L), // in-batch conflict — seq 1 wins
      (4L, "d", 2L))                      // fresh key — insert
      .toDF("k", "v", "_seq")
    val out = Relational.upsert(target, updates, Seq("k"), $"_seq")
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // idempotent: re-applying the same updates changes nothing
    val again = Relational.upsert(out.toDF("k", "v"), updates, Seq("k"), $"_seq")
      .orderBy($"k").as[(Long, String)].collect().toSeq
    assert(again == out)
  }

  test("upsert treats NULL keys as one key (null-safe anti-join, no dup growth)") {
    val target = Seq((Some(1L), "a"), (None, "n0")).toDF("k", "v")
    val updates = Seq((Option.empty[Long], "n1", 1L)).toDF("k", "v", "_seq")
    val once = Relational.upsert(target, updates, Seq("k"), $"_seq")
    assert(once.count() == 2) // NULL row UPDATED, not duplicated
    assert(once.filter($"k".isNull).select("v").as[String].collect().toSeq == Seq("n1"))
    // re-applying must not grow the NULL group either
    val twice = Relational.upsert(once, updates, Seq("k"), $"_seq")
    assert(twice.count() == 2)
  }

  test("asof join picks latest right row at-or-before each left ts") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, 100L, ts(10)), (2L, 100L, ts(20)), (3L, 200L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(10), 77L), (100L, ts(15), 88L), (200L, ts(30), 99L))
      .toDF("user_id", "ts", "purchase_id")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("purchase_id"),
        leftOuter = true)
      .orderBy($"event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    // event 1 @10 → purchase @10 (>= semantics); event 2 @20 → @15; event 3 @5 → none
    assert(out == Seq((1L, Some(77L)), (2L, Some(88L)), (3L, None)))
  }

  test("asof join inner mode drops left rows with no prior right row") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val left = Seq((1L, 100L, ts(10)), (3L, 200L, ts(5))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(8), 77L)).toDF("user_id", "ts", "purchase_id")
    val out = AsofJoin.asof(left, right, Seq("user_id"), "ts", Seq("purchase_id"))
      .select("event_id").as[Long].collect().toSeq
    assert(out == Seq(1L)) // user 200 has no prior purchase → dropped
  }

  test("sortWithinPartitions sorts per partition and keeps partition count") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v").repartition(4, $"k")
    val sorted = df.sortWithinPartitions($"v")
    assert(sorted.rdd.getNumPartitions == 4)
    val perPartition = sorted.rdd
      .mapPartitions(it => Iterator(it.map(_.getInt(1)).toSeq)).collect()
    assert(perPartition.forall(s => s == s.sorted))
  }

  test("LastWinsAggregator (typed) matches lastWinsByKey semantics") {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("last_wins", udaf(graft.operators.LastWinsAggregator))
    val df = Seq((1L, "k1", "old"), (5L, "k1", "new"), (3L, "k2", "only"))
      .toDF("seq", "key", "payload")
    df.createOrReplaceTempView("lw_t")
    val out = spark.sql(
        "SELECT key, last_wins(seq, payload) AS p FROM lw_t GROUP BY key ORDER BY key")
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("k1", "new"), ("k2", "only")))
  }

  test("topKPerGroup is deterministic with tie-breaker") {
    val df = Seq(("g", 5, 1), ("g", 5, 2), ("g", 3, 3)).toDF("grp", "score", "id")
    val out = Relational.topKPerGroup(df, Seq($"grp"), Seq($"score".desc, $"id".asc), 2)
      .select($"id").as[Int].collect().toSeq
    assert(out == Seq(1, 2))
  }

  test("distributedNtile == ntile for non-divisible N, and survives empty input") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // N=107, k=10: first 7 buckets get 11 rows, the rest 10 — the ragged
    // case where a wrong bucket identity shows; values deliberately
    // unsorted and with near-ties broken by the id column
    val rows = (1 to 107).map(i => ((i * 37) % 50, i))
    val df = rows.toDF("v", "id")
    val viaOp = Relational.distributedNtile(df, Seq($"v", $"id"), 10, "b")
      .select($"v", $"id", $"b").as[(Int, Int, Int)].collect().toSet
    val viaNtile = df.withColumn("b", ntile(10).over(Window.orderBy($"v", $"id")))
      .select($"v", $"id", $"b").as[(Int, Int, Int)].collect().toSet
    assert(viaOp == viaNtile)
    val empty = Relational.distributedNtile(
      df.filter($"v" < -1), Seq($"v", $"id"), 10, "b")
    assert(empty.count() == 0 && empty.columns.contains("b"))
    // caller columns named like the operator's temps must survive intact
    val clash = df.withColumn("_pid", $"id" * 2).withColumn("_grn", $"id" * 3)
    val kept = Relational.distributedNtile(clash, Seq($"v", $"id"), 10, "b")
      .select($"id", $"_pid", $"_grn").as[(Int, Int, Int)].collect()
    assert(kept.forall { case (id, p, g) => p == id * 2 && g == id * 3 },
      "temp-name collision clobbered caller columns")
    intercept[IllegalArgumentException] {
      Relational.distributedNtile(df, Seq($"v", $"id"), 0, "b")
    }
  }

  test("partialAggs + mergePartialAggs equals a full recompute (incremental view maintenance)") {
    import org.apache.spark.sql.functions._
    val rows = (1 to 100).map(i => (i % 7, i.toLong, i * 1.5))
    val df = rows.toDF("k", "n", "x")
    val (oldHalf, delta) = (df.filter($"n" <= 60), df.filter($"n" > 60))
    val parts = Seq(oldHalf, delta).map(d =>
      Relational.partialAggs(d, Seq("k"), "cnt", Seq("sx" -> $"x".cast("decimal(18,2)"))))
    val merged = Relational.mergePartialAggs(parts, Seq("k"), "cnt", Seq("sx"))
      .select($"k", $"cnt".cast("long").as("cnt"), $"sx".cast("double").as("sx"))
      .as[(Int, Long, Double)].collect().toSet
    val full = df.groupBy($"k")
      .agg(count(lit(1)).as("cnt"), sum($"x".cast("decimal(18,2)")).cast("double").as("sx"))
      .as[(Int, Long, Double)].collect().toSet
    assert(merged == full)
  }

  test("bagDiff: empty iff multiset-equal, exceptAll semantics (r16 pins)") {
    val a = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val bSame = Seq((2L, "y"), (1L, "x"), (1L, "x")).toDF("kk", "vv") // names differ: positional
    assert(Relational.bagDiff(a, bSame).isEmpty)
    // multiplicity mismatch is a difference even when the SET is equal
    val bOnce = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val d = Relational.bagDiff(a, bOnce).collect()
    assert(d.length == 1 && d.head.getLong(1) == 1L) // (1,x) has +1 surplus in a
    assert(!Relational.bagDiff(bOnce, a).isEmpty)
    // NULL == NULL and NaN == NaN, like exceptAll
    val n1 = Seq[(java.lang.Long, java.lang.Double)]((null, Double.NaN)).toDF("k", "x")
    val n2 = Seq[(java.lang.Long, java.lang.Double)]((null, Double.NaN)).toDF("k", "x")
    assert(Relational.bagDiff(n1, n2).isEmpty)
    assert(n1.exceptAll(n2).isEmpty) // the semantics bagDiff replaces
    // empty vs empty and empty vs non-empty
    assert(Relational.bagDiff(a.limit(0), bOnce.limit(0)).isEmpty)
    assert(!Relational.bagDiff(a.limit(0), bOnce).isEmpty)
    // arity mismatch refuses loudly (exceptAll would too)
    intercept[IllegalArgumentException] {
      Relational.bagDiff(a, a.select($"k")): Unit
    }
  }

  test("inParallelEval returns task values in input order; failures propagate") {
    val out = Relational.inParallelEval(Seq(
      () => spark.range(10).count(),
      () => spark.range(5).count(),
      () => 42L))
    assert(out == Seq(10L, 5L, 42L))
    val boom = intercept[IllegalArgumentException] {
      Relational.inParallel(Seq(
        () => (),
        () => require(false, "battery pin message survives")))
    }
    assert(boom.getMessage.contains("battery pin message survives"))
  }
}
