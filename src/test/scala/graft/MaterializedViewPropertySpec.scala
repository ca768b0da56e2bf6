package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestTable
import graft.sources.v2.GraftMaterializedViews

/** Property net for the incremental-view algebra (r14, grown r15):
  * random interleavings of keyed merges (including GROUP MIGRATIONS —
  * the merge may re-home a key's group), GDPR deletes, fresh appends,
  * feed-invisible BINPACK maintenance, and DIM RE-HOMING (fact rows
  * migrate bands through the snowflake chain), with incremental
  * refreshes at random points — after every refresh, ALL THREE
  * registered shapes (avg-declared distributive agg, the min/max+avg
  * touched-group shape, and the 2-table snowflake chain) must serve the
  * rewrite AND equal the from-base recompute, both exceptAll
  * directions. ~1 in 8 of the agg shapes' values are NULL, soaking the
  * r15 sum/avg/cnt NULL folds. The fixed-test suite pins each
  * transition once; the random walk pins their COMPOSITIONS (the
  * drifted-counter / stale-extremum / missed-migration IVM bug classes
  * compound across steps — one wrong fold poisons every later
  * identity). Committed seeds are fixed (never runtime-random) so a
  * failure replays. */
class MaterializedViewPropertySpec extends SparkSpec {
  import spark.implicits._

  private def recompute(baseDir: String, minmax: Boolean) = {
    val base = ManifestTable.read(spark, baseDir)
    if (minmax)
      base.groupBy($"grp").agg(count(lit(1)).as("n_rows"),
        sum($"v").as("sum_v"), min($"v").as("min_v"), max($"v").as("max_v"),
        avg($"v").as("avg_v"), count($"v").as("cnt_v"))
    else
      base.groupBy($"grp").agg(count(lit(1)).as("n_rows"),
        sum($"v").as("sum_v"), avg($"v").as("avg_v"), count($"v").as("cnt_v"))
  }

  private def recomputeSnow(baseDir: String, dimDir: String) =
    ManifestTable.read(spark, baseDir)
      .join(ManifestTable.read(spark, dimDir), Seq("grp"))
      .groupBy($"band").agg(count(lit(1)).as("n_rows"), sum($"w").as("sum_w"))

  test("random mutate/maintain/refresh walks: incremental ≡ recompute for both shapes") {
    // committed seeds are fixed; GRAFT_MVP_SEEDS widens the sweep for
    // offline soak runs (r13's evolution-spec pattern)
    val seeds = sys.env.get("GRAFT_MVP_SEEDS")
      .map(_.split(',').toSeq.map(_.trim.toLong))
      .getOrElse(Seq(42L, 1337L))
    for (seed <- seeds) {
      // a GraftCatalog instance caches its warehouse at first resolution
      // — one catalog name per seed (the q348-family spec discipline)
      val cat = s"gmvp$seed"
      val wh = java.nio.file.Files.createTempDirectory(s"graft_mvp_$seed").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      val tbl = s"t$seed"
      // w is NEVER null: the snowflake view sums it WITHOUT a count
      // partial, and a bare sum's delete-last-non-null NULL edge is a
      // documented approximation the walk must not trip by design
      spark.sql(s"CREATE TABLE $cat.ns.$tbl (k BIGINT, grp STRING, v BIGINT, w BIGINT)")
      val rnd = new scala.util.Random(seed)
      var nextId = 1L
      var live = Set.empty[Long]
      // ~1 in 8 values NULL: both agg shapes declare v in avgCols, so
      // the walk soaks the avg = sum/cnt derivation on top of the
      // NULL-exact sum fold (since r16 EVERY sum column carries a
      // count(c) partial, so the delete-last-non-null edge is exact
      // even for bare sums — the fixed suite pins that edge directly)
      def drawV(): java.lang.Long =
        if (rnd.nextInt(8) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong)
      def freshRows(n: Int): Seq[(Long, String, java.lang.Long, Long)] = {
        val rows = (0 until n).map { _ =>
          val r = (nextId, s"g${rnd.nextInt(6)}", drawV(),
            rnd.nextInt(1000).toLong)
          nextId += 1; r
        }
        live ++= rows.map(_._1)
        rows
      }
      val baseDir = s"$wh/ns/$tbl"
      freshRows(30).toDF("k", "grp", "v", "w")
        .createOrReplaceTempView(s"mvp_src_$seed")
      spark.sql(s"INSERT INTO $cat.ns.$tbl SELECT * FROM mvp_src_$seed")
      val aggSql = GraftMaterializedViews.registerAgg(spark, s"mvp_agg_$seed",
        s"$cat.ns.$tbl", baseDir, Seq("grp"), Seq("v"), s"$wh/ns/_mv_a",
        avgCols = Seq("v"))
      val mmSql = GraftMaterializedViews.registerAgg(spark, s"mvp_mm_$seed",
        s"$cat.ns.$tbl", baseDir, Seq("grp"), Seq("v"), s"$wh/ns/_mv_m",
        minCols = Seq("v"), maxCols = Seq("v"), avgCols = Seq("v"))
      // a dim the base chains through — the SNOWFLAKE shape soaks the
      // telescoping fold under the same random interleavings (r15);
      // op 4 re-homes dim rows so fact rows MIGRATE bands mid-walk
      spark.sql(s"CREATE TABLE $cat.ns.d$tbl (grp STRING, band STRING)")
      spark.sql(s"INSERT INTO $cat.ns.d$tbl " +
        (0 until 6).map(g => s"SELECT 'g$g', 'b${g % 3}'")
          .mkString(" UNION ALL "))
      val dimDir = s"$wh/ns/d$tbl"
      val snowSql = GraftMaterializedViews.registerSnowflakeAgg(spark,
        s"mvp_sn_$seed",
        Seq(s"$cat.ns.$tbl" -> baseDir, s"$cat.ns.d$tbl" -> dimDir),
        Seq("grp"), Seq("band"), Seq("w"), s"$wh/ns/_mv_s")
      def sample(n: Int): Seq[Long] =
        rnd.shuffle(live.toSeq.sorted).take(n)
      (1 to 18).foreach { step =>
        rnd.nextInt(5) match {
          case 0 => // keyed merge — may MIGRATE keys to a different group
            val ks = sample(1 + rnd.nextInt(5))
            if (ks.nonEmpty)
              ManifestTable.merge(ks.map(k =>
                  (k, s"g${rnd.nextInt(6)}", drawV(),
                    rnd.nextInt(1000).toLong))
                .toDF("k", "grp", "v", "w"), baseDir, "k"): Unit
          case 1 => // GDPR delete (live set stays non-empty)
            val ks = sample(math.min(4, live.size - 5))
            if (ks.nonEmpty) {
              ManifestTable.delete(ks.toDF("k"), baseDir, "k")
              live --= ks
            }
          case 2 => // fresh ingest
            ManifestTable.commit(freshRows(2 + rnd.nextInt(4))
              .toDF("k", "grp", "v", "w"), baseDir, append = true): Unit
          case 3 => // feed-invisible maintenance: binpack everything small
            ManifestTable.compactSmall(spark, baseDir, Long.MaxValue): Unit
          case 4 => // dim re-home: a random grp migrates to another band
            ManifestTable.merge(
              Seq((s"g${rnd.nextInt(6)}", s"b${rnd.nextInt(3)}"))
                .toDF("grp", "band"), dimDir, "grp"): Unit
        }
        if (step % 4 == 0 || step == 18) {
          GraftMaterializedViews.refreshIncremental(spark, s"mvp_agg_$seed")
          GraftMaterializedViews.refreshIncremental(spark, s"mvp_mm_$seed")
          GraftMaterializedViews.refreshIncremental(spark, s"mvp_sn_$seed")
          for ((name, sql, expect) <- Seq(
              (s"mvp_agg_$seed", aggSql, recompute(baseDir, minmax = false)),
              (s"mvp_mm_$seed", mmSql, recompute(baseDir, minmax = true)),
              (s"mvp_sn_$seed", snowSql, recomputeSnow(baseDir, dimDir)))) {
            val h = GraftMaterializedViews.hits(name)
            val served = spark.sql(sql).localCheckpoint()
            assert(GraftMaterializedViews.hits(name) == h + 1,
              s"seed $seed step $step: '$name' must serve after refresh")
            assert(served.exceptAll(expect).isEmpty &&
              expect.exceptAll(served).isEmpty,
              s"seed $seed step $step: '$name' incremental state diverged " +
                "from the from-base recompute")
          }
        }
      }
      GraftMaterializedViews.drop(s"mvp_agg_$seed")
      GraftMaterializedViews.drop(s"mvp_mm_$seed")
      GraftMaterializedViews.drop(s"mvp_sn_$seed")
    }
  }
}
