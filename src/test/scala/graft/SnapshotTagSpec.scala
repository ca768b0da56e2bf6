package graft

import graft.sources.ManifestTable

/** Snapshot tags (q383's spec half): immutability, the numeric-name
  * guard (a tag must never shadow `VERSION AS OF <n>`), and the
  * drop-then-reclaim lifecycle that q383 leaves pinned. */
class SnapshotTagSpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tags")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gtag", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtag.warehouse", d.toString)
    d.toString
  }

  test("tag lifecycle: pin survives expire, drop releases, guards refuse") {
    wh: Unit
    val T = "gtag.ns.t"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1), (2)")          // v1
    val dir = s"$wh/ns/t"

    // guards: numeric and grammar-colliding names refuse; duplicates too
    intercept[Exception] { ManifestTable.createTag(dir, "123") }
    intercept[Exception] { ManifestTable.createTag(dir, "a|b") }
    assert(spark.sql(s"CALL gtag.system.create_tag('ns.t', 'audited')")
      .head.getLong(0) == 1L)
    intercept[Exception] { ManifestTable.createTag(dir, "audited") }

    spark.sql(s"INSERT INTO $T VALUES (3)")               // v2 (append)
    // v3 REWRITES every file: the `%` condition defeats stats pruning,
    // so the group copy-on-write replaces the whole snapshot and v1's
    // files are from here on referenced ONLY through the tag pin
    spark.sql(s"UPDATE $T SET a = a + 4 WHERE a % 2 = 1") // v3: (5),(2),(7)
    // keep=1 would normally leave only v3; the tag pins v1, v2 dies
    val (nv, _) = ManifestTable.expire(dir, 1)
    assert(nv == 1, s"expected exactly v2 reclaimed, removed $nv")
    assert(spark.sql(s"SELECT sum(a) FROM $T VERSION AS OF 'audited'")
      .head.getLong(0) == 3L, "the tagged snapshot must serve bit-exact")
    assert(spark.sql(s"SELECT sum(a) FROM $T").head.getLong(0) == 14L)

    // drop the tag: the NEXT expire reclaims the pinned version + files
    assert(spark.sql(s"CALL gtag.system.drop_tag('ns.t', 'audited')")
      .head.getLong(0) == 1L)
    val (nv2, nf2) = ManifestTable.expire(dir, 1)
    assert(nv2 == 1 && nf2 >= 1,
      s"dropping the tag must release v1 and its files, got ($nv2, $nf2)")
    intercept[Exception] {
      spark.sql(s"SELECT sum(a) FROM $T VERSION AS OF 'audited'").collect()
    }
    assert(spark.sql(s"SELECT * FROM $T.tags").collect().isEmpty)
  }

  test("concurrent tag mutations never lose a tag (read-validate-claim CAS)") {
    wh: Unit
    spark.sql("CREATE TABLE gtag.ns.cc (a BIGINT)")
    spark.sql("INSERT INTO gtag.ns.cc VALUES (1)")
    val dir = s"$wh/ns/cc"
    // ADVICE r10: the old read-modify-write over one tags file let two
    // concurrent operations silently lose one pin — after which expire()
    // could reclaim a version the user believed retention-pinned. The
    // generation CAS makes every mutation a create-no-overwrite claim.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (1 to 16).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { ManifestTable.createTag(dir, s"pin$i"); () }
        })
      }
      futs.foreach(_.get())
    } finally pool.shutdown()
    val m = ManifestTable.tags(dir)
    assert(m.keySet == (1 to 16).map(i => s"pin$i").toSet,
      s"all 16 concurrent tags must survive, got ${m.keySet.toSeq.sorted}")
    assert(m.values.forall(_ == 1))

    // duplicate create under contention: exactly one winner, loud losers
    val pool2 = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val outcomes = (1 to 4).map { _ =>
        pool2.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try { ManifestTable.createTag(dir, "dup"); true }
            catch { case _: Exception => false }
        })
      }.map(_.get())
      assert(outcomes.count(identity) == 1,
        s"exactly one duplicate-create must win, got $outcomes")
    } finally pool2.shutdown()
    assert(ManifestTable.tags(dir).contains("dup"))

    // concurrent drops: each tag dropped exactly once, none resurrected
    val pool3 = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      (1 to 16).map { i =>
        pool3.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { ManifestTable.dropTag(dir, s"pin$i"); () }
        })
      }.foreach(_.get())
    } finally pool3.shutdown()
    assert(ManifestTable.tags(dir).keySet == Set("dup"))
  }

  test("expire() never touches branch manifests or branch tags (retention guard, r11 handoff #3)") {
    import spark.implicits._
    wh: Unit
    val T = "gtag.ns.bg"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1)")                              // main v1
    val dir = s"$wh/ns/bg"
    spark.sql(s"CALL gtag.system.create_branch('ns.bg', 'keepme')")
    Seq(2L).toDF("a").writeTo(T).option("branch", "keepme").append()     // branch v2
    spark.sql(s"CALL gtag.system.create_branch_tag('ns.bg', 'keepme', 'pin')")
    spark.sql(s"INSERT INTO $T VALUES (3)")                              // main v2
    spark.sql(s"INSERT INTO $T VALUES (4)")                              // main v3
    // aggressive main-line retention: branch manifests live in their own
    // namespace and are reclaimed ONLY by drop_branch — if branch expire
    // is ever added, it MUST honor branch tags; this spec is the tripwire
    ManifestTable.expire(dir, 1): Unit
    assert(ManifestTable.branchTags(dir, "keepme") == Map("pin" -> 2),
      "main-line expire must never consume branch tags")
    assert(spark.read.option("branch", "keepme").option("branchVersion", "pin")
      .table(T).count() == 2L,
      "the tagged branch version must survive main-line expire")
    assert(ManifestTable.listBranches(dir).map(_._1) == Seq("keepme"))
  }

  test("tag GC marks generations instead of deleting — a stale claim can NEVER re-win (ADVICE r11)") {
    wh: Unit
    spark.sql("CREATE TABLE gtag.ns.gc (a BIGINT)")
    spark.sql("INSERT INTO gtag.ns.gc VALUES (1)")
    val dir = s"$wh/ns/gc"
    // 24 mutations → generations g1..g24; the GC horizon is gen-16, so
    // g1..g7 are reclaimed by the time g24 lands
    (1 to 12).foreach { i =>
      ManifestTable.createTag(dir, s"t$i")
      ManifestTable.dropTag(dir, s"t$i")
    }
    val md = java.nio.file.Paths.get(dir, "_manifests")
    // the lost-update window (a writer stalled 17+ mutations re-claiming
    // a DELETED generation number and silently losing its mutation) is
    // closed structurally: reclaimed generations remain as `#gc` marker
    // files, so create-no-overwrite refuses FOREVER
    val g2 = md.resolve("tags.g2")
    assert(java.nio.file.Files.exists(g2),
      "GC'd generations must survive as marker files, never be deleted")
    assert(java.nio.file.Files.readAllLines(g2).get(0).startsWith("#gc"))
    val tmp = md.resolve(".stale.tmp")
    java.nio.file.Files.write(tmp, java.util.List.of("stale|1"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.createLink(g2, tmp)
    }
    java.nio.file.Files.delete(tmp)
    // markers land by ATOMIC RENAME (r13): an in-place truncate-write
    // would hand a straggler an EMPTY file mid-write, which parseTags
    // must accept as a legitimate map — the drop of t12 above leaves the
    // HEAD generation legitimately empty, pinned by the isEmpty read
    // below, so "treat empty as GC'd" was never an option. No rename
    // temp files may linger.
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(md).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(".gc.")).toSeq
    assert(leftovers.isEmpty, s"GC rename temps must not linger: $leftovers")
    // the live head still reads clean through the marker prefix
    assert(ManifestTable.tags(dir).isEmpty)
    ManifestTable.createTag(dir, "live")
    assert(ManifestTable.tags(dir) == Map("live" -> 1))
    // '#' names are reserved for the marker grammar
    intercept[Exception] { ManifestTable.createTag(dir, "#gc") }
  }

  test("resolveBranchVersion: empty and over-long numeric refs raise the descriptive error (ADVICE r11)") {
    import spark.implicits._
    wh: Unit
    val T = "gtag.ns.rbv"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1)")
    val dir = s"$wh/ns/rbv"
    spark.sql(s"CALL gtag.system.create_branch('ns.rbv', 'b')")
    Seq(2L).toDF("a").writeTo(T).option("branch", "b").append()
    assert(ManifestTable.resolveBranchVersion(dir, "b", "2") == 2)
    // before the guard: "" and >Int-range digit runs threw a raw
    // NumberFormatException out of `ref.toInt`
    val e1 = intercept[Exception] {
      ManifestTable.resolveBranchVersion(dir, "b", "")
    }
    assert(e1.getMessage.contains("no tag"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      ManifestTable.resolveBranchVersion(dir, "b", "99999999999999999999")
    }
    assert(e2.getMessage.contains("no tag"), s"got: ${e2.getMessage}")
  }

  test("branch tags pin mid-lineage versions; the reader resolves them (r11)") {
    import spark.implicits._
    wh: Unit
    val T = "gtag.ns.bt"
    spark.sql(s"CREATE TABLE $T (a BIGINT)")
    spark.sql(s"INSERT INTO $T VALUES (1), (2)")                     // main v1
    val dir = s"$wh/ns/bt"
    spark.sql(s"CALL gtag.system.create_branch('ns.bt', 'exp')")
    Seq(3L).toDF("a").writeTo(T).option("branch", "exp").append()    // exp v2
    assert(spark.sql(s"CALL gtag.system.create_branch_tag('ns.bt', 'exp', 'mid')")
      .head.getLong(0) == 2L)
    Seq(4L).toDF("a").writeTo(T).option("branch", "exp").append()    // exp v3
    // head read vs the tagged mid-lineage read
    assert(spark.read.option("branch", "exp").table(T).count() == 4L)
    assert(spark.read.option("branch", "exp").option("branchVersion", "mid")
      .table(T).count() == 3L)
    assert(spark.read.option("branch", "exp").option("branchVersion", "2")
      .table(T).count() == 3L)
    // main tags and branch tags are separate namespaces
    assert(ManifestTable.tags(dir).isEmpty)
    assert(ManifestTable.branchTags(dir, "exp") == Map("mid" -> 2))
    // guards: duplicates, numeric names, unknown refs
    intercept[Exception] { ManifestTable.createBranchTag(dir, "exp", "mid") }
    intercept[Exception] { ManifestTable.createBranchTag(dir, "exp", "123") }
    intercept[Exception] {
      spark.read.option("branch", "exp").option("branchVersion", "nope")
        .table(T).count()
    }
    assert(spark.sql(s"CALL gtag.system.drop_branch_tag('ns.bt', 'exp', 'mid')")
      .head.getLong(0) == 2L)
    assert(ManifestTable.branchTags(dir, "exp").isEmpty)
  }
}
