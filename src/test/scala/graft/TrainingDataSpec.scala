package graft

import org.apache.spark.sql.functions._
import graft.operators.{TrainingData => TD}

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket is deterministic and independent of partitioning") {
    val a = spark.range(0, 1000).select($"id", TD.hashBucket($"id", 100).as("b"))
    val b = spark.range(0, 1000).repartition(7)
      .select($"id", TD.hashBucket($"id", 100).as("b"))
    assert(a.collect().toSet == b.collect().toSet)
    val buckets = a.select("b").as[Int].collect()
    assert(buckets.forall(x => x >= 0 && x < 100))
  }

  test("sampleByHash keeps roughly the requested fraction, reproducibly") {
    val df = spark.range(0, 10000).toDF("id")
    val s1 = TD.sampleByHash(df, $"id", 10, 100).as[Long].collect().sorted
    val s2 = TD.sampleByHash(df, $"id", 10, 100).as[Long].collect().sorted
    assert(s1 sameElements s2) // same rows every run, not a rand() sample
    assert(math.abs(s1.length - 1000) < 150, s"got ${s1.length} of ~1000")
  }

  test("assignSplit is stable under corpus growth (no row changes split)") {
    val small = TD.assignSplit(spark.range(0, 500).toDF("id"), $"id", 80, 10)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val big = TD.assignSplit(spark.range(0, 2000).toDF("id"), $"id", 80, 10)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, sp) => big(id) == sp })
    val counts = big.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("balanceClasses caps every class at n with deterministic membership") {
    val df = Seq.tabulate(300)(i => (i.toLong, i % 3)).toDF("id", "cls")
    val bal = TD.balanceClasses(df, $"cls", $"id", 20)
    val byClass = bal.groupBy($"cls").count().as[(Int, Long)].collect().toMap
    assert(byClass.values.forall(_ == 20))
    val again = TD.balanceClasses(df, $"cls", $"id", 20)
      .select("id").as[Long].collect().sorted
    assert(bal.select("id").as[Long].collect().sorted sameElements again)
  }

  test("packSequences: bin = floor(preceding tokens / budget), per shard") {
    val df = Seq((0, 1L, 300), (0, 2L, 300), (0, 3L, 300), (1, 4L, 700))
      .toDF("shard", "id", "n")
    val out = TD.packSequences(df, $"shard", $"id", $"n", 512)
      .select($"id", $"bin").as[(Long, Int)].collect().toMap
    // shard 0: starts at 0, 300, 600 -> bins 0, 0, 1; shard 1 starts fresh
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("scrubPii redacts emails and phones, counts match") {
    val df = Seq(
      ("a@b.io and c.d+x@e-f.org wrote", 2, 0),
      ("call +1 555 0100 or +33 555 0200", 0, 2),
      ("no pii here", 0, 0)).toDF("text", "ne", "np")
    val out = df.select(
      TD.scrubPii($"text").as("clean"),
      TD.countMatches($"text", TD.emailPattern).as("ge"),
      TD.countMatches($"text", TD.phonePattern).as("gp"),
      $"ne", $"np").collect()
    out.foreach { r =>
      assert(r.getInt(1) == r.getInt(3) && r.getInt(2) == r.getInt(4), r.toString)
      val clean = r.getString(0)
      assert(!clean.matches(s".*${TD.emailPattern}.*"))
      assert(!clean.matches(s".*${TD.phonePattern}.*"))
    }
  }

  test("simhashNearDup finds ALL pairs within Hamming 3 (pigeonhole bound)") {
    // signatures crafted around 0xABCD1234 with 0-3 flipped bits spread
    // across different bands, plus one far-away signature
    val base = 0xABCD1234L
    val sigs = Seq(
      (1L, base), (2L, base ^ 1L), (3L, base ^ (1L << 9)),
      (4L, base ^ ((1L << 5) | (1L << 13) | (1L << 27))), // hamming 3
      (5L, 0x0F0F0F0FL))
      .toDF("doc_id", "simhash")
    val pairs = TD.simhashNearDup(sigs, "doc_id", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // every pair among {1,2,3,4} is within hamming <= 6 of each other but
    // only those within 3 of EACH OTHER must appear; 1-2 (1 bit), 1-3
    // (1 bit), 1-4 (3 bits), 2-3 (2 bits) are guaranteed by pigeonhole
    assert(Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).subsetOf(pairs))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("simHash rejects bit widths whose top term would overflow a long") {
    // pow(2.0, bits-1).cast("long") clamps silently past 63 bits — the
    // guard must refuse anything above 60 (largest 4-multiple that is
    // exact AND matches the 4×15-bit band layout)
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.simHash(docs, "doc_id", "text", bits = 64)
    }
    // existing callers' widths stay accepted
    assert(graft.operators.Dedup.simHash(docs, "doc_id", "text", bits = 60)
      .columns.contains("simhash"))
  }

  test("simhashNearDup collapses identical signatures before the band join") {
    val base = 0xABCD1234L
    // 100 exact copies of one signature + one near signature: the copies
    // must contribute a single representative (min id), not C(100,2) pairs
    val sigs = ((1L to 100L).map(_ -> base) :+ (200L -> (base ^ 2L)))
      .toDF("doc_id", "simhash")
    val pairs = TD.simhashNearDup(sigs, "doc_id", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 200L)))
  }

  test("stratifiedSample: per-stratum rates, absent strata dropped, strata independent") {
    val df = (1L to 300L).map(i => (i, Seq("A", "B", "C")((i % 3).toInt))).toDF("id", "g")
    def kept(fr: Seq[(String, Int)]) =
      TD.stratifiedSample(df, $"g", $"id", fr, 100)
        .as[(Long, String)].collect().toSet
    val k1 = kept(Seq("A" -> 100, "B" -> 50))
    assert(k1.filter(_._2 == "A").size == 100, "rate 100/100 keeps the whole stratum")
    assert(k1.forall(_._2 != "C"), "stratum absent from fractions is dropped")
    val bIds = df.filter($"g" === "B" && TD.hashBucket($"id", 100) < 50)
      .select($"id").as[Long].collect().toSet
    assert(k1.filter(_._2 == "B").map(_._1) == bIds, "B keeps exactly its sub-threshold hash buckets")
    // changing B's rate must not move any A row (stratum independence)
    val k2 = kept(Seq("A" -> 100, "B" -> 90))
    assert(k1.filter(_._2 == "A") == k2.filter(_._2 == "A"))
  }
}
