package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{ParityFunctions => PF, StripAccents}
import graft.operators.Relational

/** Property-based invariants (SURVEY §5): T3 merge laws with nulls/empties,
  * dedup idempotence, and the idempotent-append invariant
  * (`anti-join(append(x)) = ∅`, the reference's core guarantee).
  * Raw ScalaCheck generators sampled over fixed seeds (the scalatest
  * bridge artifact isn't available offline).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val maybeStr: Gen[Option[String]] =
    Gen.oneOf(Gen.const(None), Gen.const(Some("")),
      Gen.alphaNumStr.map(s => Some(s.take(8))))

  test("bottom-k hash sample (q358) is merge-associative and partition-independent") {
    // the sketch's load-bearing claim: bottom-k by a row-keyed uniform
    // hash over a UNION equals the k smallest of the concatenated
    // per-shard bottom-k lists, for any sharding — pure Scala model of
    // the distributed merge, randomized over shardings and k
    val gen = Gen.zip(Gen.listOfN(400, Gen.choose(0L, 1L << 40)),
      Gen.choose(2, 7), Gen.choose(8, 64))
    samples(gen, 8).foreach { case (keys0, nShards, k) =>
      val keys = keys0.distinct
      def h(x: Long): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(x.toString.getBytes("UTF-8"))
        d.map(b => f"$b%02x").mkString
      }
      val global = keys.sortBy(h).take(k)
      val shards = keys.groupBy(x => math.abs(x % nShards)).values.toSeq
      val merged = shards.flatMap(_.sortBy(h).take(k)).sortBy(h).take(k)
      assert(merged == global, s"k=$k shards=$nShards")
    }
  }

  test("global scan family: random data, random partitioning ≡ sequential reference") {
    import org.apache.spark.sql.functions._
    val gen = Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(-50L, 50L))
    samples(Gen.zip(Gen.listOfN(300, gen), Gen.choose(1, 11)), 6).foreach {
      case (pairs, parts) =>
        // unique keys (total order requirement)
        val rows = pairs.zipWithIndex.map { case ((k, v), i) => (k * 1000 + i, v) }
        val df = rows.toDF("k", "v").repartition(parts)
        val sorted = rows.sortBy(_._1)
        // running sum
        val ps = Relational.globalRunningSum(df, Seq($"k".asc), $"v", "o")
          .select($"k", $"o").as[(Long, Long)].collect().toMap
        var acc = 0L
        sorted.foreach { case (k, v) => acc += v; assert(ps(k) == acc, s"sum@$k") }
        // running max, inclusive and exclusive
        val im = Relational.globalRunningMax(df, Seq($"k".asc), $"v", "o")
          .select($"k", $"o").as[(Long, Long)].collect().toMap
        val em = Relational.globalRunningMax(df, Seq($"k".asc), $"v", "o",
          inclusive = false).select($"k", $"o").as[(Long, Long)].collect().toMap
        var mx = Long.MinValue
        sorted.foreach { case (k, v) =>
          assert(em(k) == mx, s"exclusive max@$k")
          mx = math.max(mx, v)
          assert(im(k) == mx, s"inclusive max@$k")
        }
        // ntile ≡ Spark's own ntile arithmetic
        val nt = Relational.distributedNtile(df, Seq($"k".asc), 7, "b")
          .select($"k", $"b").as[(Long, Int)].collect().toMap
        val n = sorted.size; val q = n / 7; val r = n % 7
        sorted.zipWithIndex.foreach { case ((k, _), i) =>
          val want = if (i < r * (q + 1)) i / (q + 1) + 1
            else r + (i - r * (q + 1)) / math.max(q, 1) + 1
          assert(nt(k) == want, s"ntile@$k")
        }
    }
  }

  test("T3 merge: None iff both sides falsy; contains both sides when both truthy") {
    samples(Gen.listOfN(24, Gen.zip(maybeStr, maybeStr)), 8).foreach { pairs =>
      val df = pairs.map { case (a, b) => (a.orNull, b.orNull) }.toDF("a", "b")
      val out = df.select(PF.mergeColumns($"a", $"b")).collect().map(r => Option(r.getString(0)))
      pairs.zip(out).foreach { case ((a, b), m) =>
        val aT = a.exists(_.nonEmpty); val bT = b.exists(_.nonEmpty)
        assert(m.isDefined == (aT || bT))
        if (aT && bT) assert(m.get == a.get + "\n" + b.get)
        else if (aT) assert(m.get == a.get)
        else if (bT) assert(m.get == b.get)
      }
    }
  }

  test("strip accents is idempotent and length-preserving on precomposed Latin") {
    samples(Gen.listOfN(12, Gen.oneOf("é", "à", "ü", "ñ", "ç", "x", " ", "Å")), 20)
      .foreach { chars =>
        val s = chars.mkString
        val once = StripAccents.strip(s)
        assert(StripAccents.strip(once) == once)
        assert(once.length == s.length) // NFC input: one mark removed per composed char
      }
  }

  test("lastWinsByKey is idempotent and keeps exactly one row per key") {
    samples(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 1000L))), 6)
      .foreach { rows =>
        val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("seq", "key", "v")
        val once = Relational.lastWinsByKey(df, Seq("key"), $"seq")
        assert(once.count() == rows.map(_._1).distinct.size)
        val twice = Relational.lastWinsByKey(once, Seq("key"), $"seq")
        assert(twice.orderBy("key").collect().toSeq == once.orderBy("key").collect().toSeq)
      }
  }

  test("distributedNtile == ntile over random (N, k) incl. N < k and heavy ties") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the ragged-bucket space: N mod k != 0 is where a wrong bucket
    // identity shows (caught one already — see Relational.distributedNtile)
    val cases = samples(Gen.zip(Gen.choose(1, 200), Gen.choose(1, 12)), 8)
    cases.foreach { case (n, k) =>
      // values drawn from a SMALL domain so range partitions split ties
      val df = (1 to n).map(i => ((i * 31) % 7, i)).toDF("v", "id")
      val viaOp = Relational.distributedNtile(df, Seq($"v", $"id"), k, "b")
        .select($"id", $"b").as[(Int, Int)].collect().toMap
      val viaNtile = df
        .withColumn("b", ntile(k).over(Window.orderBy($"v", $"id")))
        .select($"id", $"b").as[(Int, Int)].collect().toMap
      assert(viaOp == viaNtile, s"mismatch at N=$n k=$k")
    }
  }

  test("idempotent append invariant: re-appending the same batch adds nothing") {
    samples(Gen.listOfN(20, Gen.choose(0L, 15L)), 6).foreach { keys =>
      val existing = Seq.empty[Long].toDF("k")
      val batch = keys.distinct.toDF("k")
      val appended = Relational.idempotentAppend(batch, existing, "k")
      val replay = Relational.idempotentAppend(batch, appended, "k")
      assert(replay.count() == 0)
    }
  }

  test("q237 Spearman: identity permutation → ρ=1, reversal → ρ=−1 (exact)") {
    import org.apache.spark.sql.functions._
    // a synthetic orders table where revenue rank == order-count rank
    // (perfect monotone) and one where it's exactly reversed
    val n = 40
    val asc = (1 to n).flatMap(c => (1 to c).map(_ =>
      (c.toLong, 1000.0))) // customer c: c equal-value orders → cents ∝ c
    // order-count rank asc == custkey asc; revenue rank: cents = c*1000
    val df = asc.toDF("o_custkey", "o_totalprice")
    val per = df.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    def rho(ranked: org.apache.spark.sql.DataFrame): Double = {
      val rx = Relational.globalRank(ranked, Seq($"n_orders".desc, $"o_custkey"), "rx")
      val both = Relational.globalRank(rx, Seq($"cents".desc, $"o_custkey"), "ry")
      val r = both.select((($"rx" - $"ry") * ($"rx" - $"ry")).as("d2"))
        .agg(count(lit(1)).as("n"), sum($"d2").as("sd2"))
        .select(lit(1.0) - (lit(6.0) * $"sd2") /
          ($"n".cast("double") * ($"n" * $"n" - lit(1.0)))).as[Double]
      r.collect().head
    }
    // identity: more orders ⇒ proportionally more cents (ties broken the same)
    assert(math.abs(rho(per) - 1.0) < 1e-12, s"identity rho != 1")
    // reversal: cents = -order count ⇒ ranks exactly reversed
    val rev = per.withColumn("cents", -$"cents")
    assert(math.abs(rho(rev) + 1.0) < 1e-12, s"reversed rho != -1")
  }

  test("merge-on-read SQL ≡ library read ≡ reference map under random delta-mutation sequences") {
    import spark.implicits._
    import graft.sources.ManifestTable
    // the adversarial scenario for the delete-scope grouping: a RANDOM
    // interleaving of inserts, keyed updates, and deletes, where every
    // intermediate snapshot must agree across (a) the catalog's MoR scan,
    // (b) ManifestTable.read's anti-join assembly, and (c) a plain
    // in-memory reference map — any scope-boundary error (a delete
    // erasing its own commit's re-inserts, a group mapped to the wrong
    // delete sets) diverges one of the three.
    val wdir = java.nio.file.Files.createTempDirectory("graft_mor_prop")
    spark.conf.set("spark.sql.catalog.gprop", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gprop.warehouse", wdir.toString)
    spark.sql("CREATE TABLE gprop.ns.m (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('write.key'='k')")
    val dir = s"$wdir/ns/m"
    val ref = scala.collection.mutable.Map.empty[Long, Long]
    val rnd = new scala.util.Random(sys.env.getOrElse("GRAFT_PROP_SEED", "4242").toLong)
    def syncInsert(rows: Seq[(Long, Long)]): Unit = {
      rows.toDF("k", "v").createOrReplaceTempView("prop_src")
      spark.sql("INSERT INTO gprop.ns.m SELECT * FROM prop_src")
      rows.foreach { case (k, v) => ref(k) = v }
    }
    syncInsert((1L to 40L).map(k => (k, k)))
    // the value column's CURRENT logical name — the rename step changes
    // it mid-chain (storage stays `v`, the birth name, in every file)
    var vName = "v"
    var renameId = 0
    (1 to 16).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => // keyed UPDATE of a random residue class
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          spark.sql(s"UPDATE gprop.ns.m SET $vName = $vName + 1000 WHERE k % $m = $r")
          ref.keys.toSeq.filter(_ % m == r).foreach(k => ref(k) = ref(k) + 1000)
        case 1 => // DELETE of a random window
          val lo = 1 + rnd.nextInt(45)
          val hi = lo + rnd.nextInt(8)
          spark.sql(s"DELETE FROM gprop.ns.m WHERE k BETWEEN $lo AND $hi")
          (lo.toLong to hi.toLong).foreach(ref.remove)
        case 2 => // INSERT (may re-create previously deleted keys)
          val base = 1 + rnd.nextInt(60)
          val fresh = (base.toLong until (base + 5).toLong)
            .filterNot(ref.contains).map(k => (k, k * 7 + step))
          if (fresh.nonEmpty) syncInsert(fresh)
        case 3 => // POSITION delete via a VALUE predicate on the live
          // view — mixes P| entries into the equality chain (the r10
          // session-3 unified scan's adversarial surface: both delete
          // kinds interleaved in random order)
          val m = 3 + rnd.nextInt(4)
          val r = rnd.nextInt(m)
          ManifestTable.deleteWhere(spark, dir,
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.col("v"),
              org.apache.spark.sql.functions.lit(m.toLong)) === r.toLong)
          ref.filter(_._2 % m == r).keys.toSeq.foreach(ref.remove)
        case 4 => // RENAME the value column mid-chain: pure metadata;
          // every later verb (delta UPDATE, MoR SELECT) translates,
          // while the library read keeps serving the physical name
          renameId += 1
          val nn = s"w$renameId"
          spark.sql(s"ALTER TABLE gprop.ns.m RENAME COLUMN $vName TO $nn")
          vName = nn
      }
      val sqlRows = spark.sql(s"SELECT k, $vName FROM gprop.ns.m")
        .as[(Long, Long)].collect().sorted.toSeq
      val libRows = ManifestTable.read(spark, dir).select($"k", $"v")
        .as[(Long, Long)].collect().sorted.toSeq
      val refRows = ref.toSeq.sorted
      assert(sqlRows == refRows,
        s"step $step: SQL MoR diverged from reference\nsql=$sqlRows\nref=$refRows")
      assert(libRows == refRows,
        s"step $step: library read diverged from reference")
    }
    // and the whole history stays time-travelable
    assert(spark.sql("SELECT count(*) FROM gprop.ns.m VERSION AS OF 1")
      .head.getLong(0) == 40)
  }

  test("storage-partitioned join ≡ shuffled join on random co-bucketed data (incl. empty buckets)") {
    import spark.implicits._
    // random keys with gaps (some buckets empty on one side), random
    // duplication — the partition-alignment edge cases: SPJ must produce
    // bit-identical results to the shuffled plan on every draw
    val wdir = java.nio.file.Files.createTempDirectory("graft_spj_prop")
    spark.conf.set("spark.sql.catalog.gspjp", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gspjp.warehouse", wdir.toString)
    spark.sql("CREATE TABLE gspjp.ns.a (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE gspjp.ns.b (k BIGINT, w BIGINT) PARTITIONED BY (bucket(8, k))")
    val rnd = new scala.util.Random(777)
    // side A: keys 0..199 with random dups; side B: a sparse subset
    // hitting only SOME buckets
    val aRows = (0 until 300).map(_ => { val k = rnd.nextInt(200).toLong; (k, k * 3) })
    val bRows = (0 until 60).map(_ => { val k = (rnd.nextInt(25) * 8).toLong; (k, k + 1) })
    aRows.toDF("k", "v").createOrReplaceTempView("spj_a")
    bRows.toDF("k", "w").createOrReplaceTempView("spj_b")
    spark.sql("INSERT INTO gspjp.ns.a SELECT * FROM spj_a")
    spark.sql("INSERT INTO gspjp.ns.b SELECT * FROM spj_b")
    def run(bucketing: Boolean): Seq[(Long, Long, Long)] = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", bucketing.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.sql(
        """SELECT a.k, a.v, b.w FROM gspjp.ns.a a
          |JOIN gspjp.ns.b b ON a.k = b.k""".stripMargin)
        .as[(Long, Long, Long)].collect().sorted.toSeq
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      }
    }
    val spj = run(bucketing = true)
    val shuffled = run(bucketing = false)
    assert(spj == shuffled, s"SPJ diverged: ${spj.size} vs ${shuffled.size} rows")
    // reference recompute
    val ref = for ((ka, va) <- aRows; (kb, wb) <- bRows if ka == kb)
      yield (ka, va, wb)
    assert(spj == ref.sorted, "SPJ diverged from the in-memory reference")
  }

  test("q222 PageRank: scaled mass is conserved up to floor-division loss, ranks positive") {
    import org.apache.spark.sql.functions._
    val ranks = SparkEntry.queries("q222_pagerank")(spark, "/root/testdata/sf0.001")
      .select($"rank_scaled".cast("long")).as[Long].collect()
    val total = 1000000000000L
    val sum = ranks.sum
    assert(ranks.forall(_ > 0), "non-positive rank")
    // every floor division loses < 1 unit per (edge, iteration) on the
    // contribution path and <1 per node on the teleport term; with 15%
    // retained per hop the mass can only shrink, never grow
    assert(sum <= total, s"mass grew: $sum > $total")
    assert(sum >= (total * 80) / 100, s"mass collapsed: $sum")
  }
}
