package graft

import scala.collection.mutable

/** Randomized DDL-evolution property test: a seeded interleaving of
  * ADD/DROP COLUMN (with and without DEFAULTs), SET/UNSET write.order,
  * CHECK add/drop, and INSERT batches against one catalog table, with an
  * in-memory reference model checked after every step — schema names,
  * row count, and per-column sums (NULL-aware) must agree exactly, and
  * the guard matrix (tombstone resurrection, load-bearing drops) must
  * refuse exactly when the model says so. */
class EvolutionPropertySpec extends SparkSpec {
  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_evoprop")
    d.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gevo", "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gevo.warehouse", d.toString)
    d.toString
  }

  // committed seeds stay 42/7/1337 for suite speed; offline hunts append
  // more via GRAFT_EVO_SEEDS=5,99,31415 (the round ritual whenever the
  // step vocabulary or a commit-path implementation changes — both r11
  // latent bugs came from draws the committed seeds never produce)
  private val seeds = Seq(42, 7, 1337) ++ sys.env.get("GRAFT_EVO_SEEDS")
    .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map(_.toInt)
  for (seed <- seeds)
  test(s"63-step random DDL/DML/overwrite/rename/delete interleaving tracks the reference model exactly (seed $seed)") {
    wh: Unit
    val rnd = new scala.util.Random(seed)
    val T = s"gevo.ns.evo$seed"
    spark.sql(s"CREATE TABLE $T (c0 BIGINT)")
    val dir = s"$wh/ns/evo$seed"

    // the model: live columns in order (name -> default), dropped names,
    // declared order column, and every row as name->Option[Long]
    val cols = mutable.LinkedHashMap[String, Option[Long]]("c0" -> None)
    val dropped = mutable.Set.empty[String]     // PHYSICAL names (tombstones)
    val physOf = mutable.Map.empty[String, String] // logical -> physical
    var orderCol: Option[String] = None
    val rows = mutable.Buffer.empty[Map[String, Option[Long]]]
    var nextId = 1
    var inserted = false
    var posOutstanding = false // library position deletes in the snapshot

    def checkAgainstModel(step: Int): Unit = {
      val t = spark.table(T)
      assert(t.columns.toSeq == cols.keys.toSeq,
        s"step $step: schema ${t.columns.toSeq} != model ${cols.keys.toSeq}")
      // zero-IO COUNT(*) must stay exact through EVERY mutation — the
      // invariant that catches a stale P| line double-subtracting after
      // a copy-on-write materialized its deletions (ADVICE r10 high)
      if (graft.sources.ManifestTable.currentVersion(dir) > 0) {
        val cs = graft.sources.ManifestTable.countStar(dir)
        assert(cs.contains(rows.length.toLong),
          s"step $step: countStar $cs != model ${rows.length}")
      }
      val agg = spark.sql(
        s"SELECT count(*) ${cols.keys.map(c => s", sum($c)").mkString} FROM $T")
        .head
      assert(agg.getLong(0) == rows.length,
        s"step $step: count ${agg.getLong(0)} != ${rows.length}")
      cols.keys.zipWithIndex.foreach { case (c, i) =>
        val want = rows.flatMap(_.getOrElse(c, None))
        val got = if (agg.isNullAt(i + 1)) None else Some(agg.getLong(i + 1))
        val expect = if (want.isEmpty) None else Some(want.sum)
        if (got != expect) {
          println(s"ENGINE rows: " + spark.table(T).collect().toSeq
            .map(_.toSeq.mkString("(", ",", ")")).sorted.mkString(" "))
          println(s"MODEL rows: " + rows
            .map(r => cols.keys.map(k => r.getOrElse(k, None).map(_.toString)
              .getOrElse("null")).mkString("(", ",", ")")).sorted.mkString(" "))
        }
        assert(got == expect, s"step $step: sum($c) $got != $expect")
      }
    }

    def sqlL(q: String): org.apache.spark.sql.DataFrame = spark.sql(q)
    for (step <- 1 to 63) {
      rnd.nextInt(12) match {
        case 0 => // ADD COLUMN, half the time with a DEFAULT
          val name = s"c$nextId"; nextId += 1
          if (rnd.nextBoolean()) {
            val d = rnd.nextInt(100).toLong
            sqlL(s"ALTER TABLE $T ADD COLUMNS ($name BIGINT DEFAULT $d)")
            cols(name) = Some(d)
            // EXISTS_DEFAULT back-fills every pre-ALTER row
            rows.indices.foreach(i => rows(i) = rows(i) + (name -> Some(d)))
          } else {
            sqlL(s"ALTER TABLE $T ADD COLUMNS ($name BIGINT)")
            cols(name) = None
            rows.indices.foreach(i => rows(i) = rows(i) + (name -> None))
          }
        case 1 => // DROP COLUMN — refuses on the order column, else drops
          val victim = cols.keys.toSeq(rnd.nextInt(cols.size))
          if (orderCol.contains(victim) || cols.size == 1) {
            intercept[Exception] {
              sqlL(s"ALTER TABLE $T DROP COLUMN $victim")
            }
          } else {
            sqlL(s"ALTER TABLE $T DROP COLUMN $victim")
            cols.remove(victim)
            dropped += physOf.getOrElse(victim, victim) // tombstones are physical
            physOf -= victim
            rows.indices.foreach(i => rows(i) = rows(i) - victim)
          }
        case 2 => // tombstone resurrection must refuse
          if (dropped.nonEmpty) {
            val name = dropped.toSeq(rnd.nextInt(dropped.size))
            intercept[Exception] {
              sqlL(s"ALTER TABLE $T ADD COLUMNS ($name BIGINT)")
            }
          }
        case 3 => // SET / UNSET write.order
          if (orderCol.isDefined && rnd.nextBoolean()) {
            sqlL(s"ALTER TABLE $T UNSET TBLPROPERTIES ('write.order')")
            orderCol = None
          } else {
            val c = cols.keys.toSeq(rnd.nextInt(cols.size))
            if (physOf.contains(c)) {
              // renamed columns refuse becoming load-bearing (the guard
              // matrix's second direction)
              intercept[Exception] {
                sqlL(s"ALTER TABLE $T SET TBLPROPERTIES ('write.order'='$c')")
              }
            } else {
              sqlL(s"ALTER TABLE $T SET TBLPROPERTIES ('write.order'='$c')")
              orderCol = Some(c)
            }
          }
        case 4 => // CHECK constraint round-trip (trivially-true predicate)
          val cn = s"ck$step"
          val c = cols.keys.head
          sqlL(s"ALTER TABLE $T ADD CONSTRAINT $cn " +
            s"CHECK ($c IS NULL OR $c > -1000000)")
          sqlL(s"ALTER TABLE $T DROP CONSTRAINT $cn")
        case 5 => // INSERT a batch of full-width rows
          val n = 1 + rnd.nextInt(4)
          val batch = (1 to n).map { _ =>
            cols.keys.map(c => c -> Some(rnd.nextInt(1000).toLong)).toMap
          }
          // cols.keys is a SET — mapping key->value over it would
          // DEDUPLICATE equal values within a row (a latent one-in-a-
          // thousand width bug seed 7 found); render through a Seq
          val values = batch.map(r =>
            cols.keys.toSeq.map(c => r(c).get).mkString("(", ", ", ")"))
            .mkString(", ")
          sqlL(s"INSERT INTO $T VALUES $values")
          rows ++= batch
          inserted = true
        case 6 => // DYNAMIC OVERWRITE: delete-matching + append, one commit
          import org.apache.spark.sql.functions.col
          val c = cols.keys.toSeq(rnd.nextInt(cols.size))
          val x = rnd.nextInt(1000).toLong
          val n = 1 + rnd.nextInt(3)
          val batch = (1 to n).map { _ =>
            cols.keys.map(k => k -> Some(rnd.nextInt(1000).toLong)).toMap
          }
          val values = batch.map(r =>
            cols.keys.toSeq.map(k => r(k).get).mkString("(", ", ", ")"))
            .mkString(", ")
          val w = sqlL(s"SELECT * FROM VALUES $values AS " +
            cols.keys.mkString("t(", ", ", ")"))
            .writeTo(T)
          if (posOutstanding) {
            // overwriteWhere refuses under outstanding row-level delete
            // entries (a rewrite would shift positions) — model the
            // refusal: loud error, snapshot untouched
            intercept[Exception] { w.overwrite(col(c) >= x) }
          } else {
            w.overwrite(col(c) >= x)
            // NULL never matches `>= x`, so NULL-valued rows survive
            val kept = rows.filterNot(_.getOrElse(c, None).exists(_ >= x))
            rows.clear(); rows ++= kept ++= batch
          }
        case 7 => // RENAME COLUMN: pure metadata over committed data
          val victim = cols.keys.toSeq(rnd.nextInt(cols.size))
          if (orderCol.contains(victim)) {
            // load-bearing names refuse rename (guard matrix)
            intercept[Exception] {
              sqlL(s"ALTER TABLE $T RENAME COLUMN $victim TO zz$step")
            }
          } else {
            val nn = s"r$nextId"; nextId += 1
            sqlL(s"ALTER TABLE $T RENAME COLUMN $victim TO $nn")
            val phys = physOf.getOrElse(victim, victim)
            physOf -= victim; physOf(nn) = phys
            val entries = cols.toSeq.map { case (k, v) =>
              (if (k == victim) nn else k, v) }
            cols.clear(); entries.foreach { case (k, v) => cols(k) = v }
            rows.indices.foreach { i =>
              rows(i) = rows(i).map { case (k, v) =>
                (if (k == victim) nn else k, v) } }
            // the STORAGE name stays reserved: committed files carry it
            intercept[Exception] {
              sqlL(s"ALTER TABLE $T ADD COLUMNS ($phys BIGINT)")
            }
          }
        case 8 => // SQL DELETE (metadata fast path; row-level plan when
          // the snapshot carries position deletes — canDeleteWhere
          // refuses there and the group CoW + reconcile serves it)
          val c = cols.keys.toSeq(rnd.nextInt(cols.size))
          val x = rnd.nextInt(1000).toLong
          sqlL(s"DELETE FROM $T WHERE $c >= $x")
          // NULL never matches `>= x` (SQL three-valued logic)
          val kept = rows.filterNot(_.getOrElse(c, None).exists(_ >= x))
          rows.clear(); rows ++= kept
        case 9 => // LIBRARY POSITION DELETE (merge-on-read, zero rewrites)
          // — restricted to the birth column c0: it exists PHYSICALLY in
          // every committed file, so the library view (raw file bytes,
          // no EXISTS_DEFAULT overlay) and the catalog view agree on it
          import org.apache.spark.sql.functions.col
          val c0Logical = cols.keys.find(k => physOf.getOrElse(k, k) == "c0")
          if (c0Logical.isDefined && rows.nonEmpty &&
              graft.sources.ManifestTable.currentVersion(dir) > 0) {
            val x = rnd.nextInt(1000).toLong
            graft.sources.ManifestTable.deleteWhere(spark, dir,
              col("c0") >= x): Unit
            val kept = rows.filterNot(
              _.getOrElse(c0Logical.get, None).exists(_ >= x))
            rows.clear(); rows ++= kept
          }
        case 10 => // SQL UPDATE (group copy-on-write; under outstanding
          // position deletes this reads merge-on-read and the commit
          // reconciles the P| lines — the r11 fix's exact surface)
          val a = cols.keys.toSeq(rnd.nextInt(cols.size))
          val b = cols.keys.toSeq(rnd.nextInt(cols.size))
          val x = rnd.nextInt(1000).toLong
          if (graft.sources.ManifestTable.currentVersion(dir) > 0) {
            sqlL(s"UPDATE $T SET $a = $a + 1 WHERE $b >= $x")
            rows.indices.foreach { i =>
              if (rows(i).getOrElse(b, None).exists(_ >= x))
                rows(i) = rows(i) + (a -> rows(i).getOrElse(a, None).map(_ + 1))
            }
          }
        case 11 => // CALL compact: materialize merge-on-read state —
          // the maintenance loop that clears position deletes and
          // restores every delete-refusing verb
          if (rows.nonEmpty &&
              graft.sources.ManifestTable.currentVersion(dir) > 0) {
            sqlL(s"CALL gevo.system.compact('ns.evo$seed', 2)").collect(): Unit
          }
      }
      checkAgainstModel(step)
      // every 16 steps: ZERO-COPY CLONE identity at whatever evolution
      // state the interleaving landed on — renames, defaults, drops,
      // outstanding position deletes, post-compact. Fixed steps (not a
      // random case) so the committed seeds' draw sequences are
      // untouched. Library-view comparison: both sides read raw files,
      // so any clone bug (lost delete, mis-sequenced line, un-carried
      // sidecar changing the merge view) breaks row equality.
      if (step % 16 == 0 && rows.nonEmpty &&
          graft.sources.ManifestTable.currentVersion(dir) > 0) {
        val cd = java.nio.file.Files.createTempDirectory("gevo_clone")
        cd.toFile.deleteOnExit()
        val cdir = cd.toString + "/t"
        graft.sources.ManifestTable.cloneTable(spark, dir, cdir)
        val a = graft.sources.ManifestTable.read(spark, dir)
        val b = graft.sources.ManifestTable.read(spark, cdir)
        assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
          s"step $step: clone must read identically to its source")
      }
      // every 16 steps (offset 8): CALL binpack at an everything-is-small
      // threshold — the r13 DELETE-TOLERANT small-file merge must
      // preserve content under whatever evolution state the interleaving
      // produced (ALTER-added defaults, renames, drops, outstanding
      // deletes of both kinds). Fixed step, no rnd draws — committed
      // seeds' sequences untouched; checkAgainstModel re-verifies the
      // whole table after the rewrite.
      if (step % 16 == 8 && rows.nonEmpty &&
          graft.sources.ManifestTable.currentVersion(dir) > 0) {
        val sizes = graft.sources.ManifestTable.filesTable(spark, dir)
          .select("path").collect()
          .map(r => new java.io.File(r.getString(0)).length())
        if (sizes.length >= 2) {
          sqlL(s"CALL gevo.system.binpack('ns.evo$seed', ${sizes.max + 1}L)")
            .collect(): Unit
          checkAgainstModel(step)
        }
      }
      posOutstanding = {
        val v = graft.sources.ManifestTable.currentVersion(dir)
        v > 0 && graft.sources.ManifestTable.sqlEntriesAt(dir, v)
          .exists(_.posDelete)
      }
    }
    // the END state may legitimately be empty (delete-heavy tails) —
    // what must hold is that the run EXERCISED the surfaces
    assert(inserted && (dropped.nonEmpty || physOf.nonEmpty),
      "the interleaving must have exercised inserts and drops-or-renames")
  }
}
