package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC scan/append (reference J2/W1/D1, `src/spark_pgsql/spark_streaming
  * .py:73-87`, `scripts/create_table.py:29-45`).
  *
  * Scale posture: the reference reads the FULL existing table just to
  * anti-join on one key (`spark_streaming.py:73-75`). `readKeys` prunes the
  * scan to the key column and can partition it; at 100 TB the key set is
  * what gets broadcast, never the table.
  */
object JdbcIO {

  /** Monitoring: how many FULL sink key scans ([[readKeys]]) have run.
    * The CDC-out path must stay delta-bounded ([[probeExistingKeys]]) —
    * spec-pinned to never bump this. */
  private[graft] val fullKeyScans = new java.util.concurrent.atomic.AtomicLong(0L)

  def props(user: String, password: String,
            driver: String = "org.postgresql.Driver"): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("driver", driver)
    p
  }

  /** J2 with column pruning: select only the anti-join key.
    *
    * With `numPartitions > 1` and a numeric `partitionExpr` (a DB-side SQL
    * expression over the row — a numeric id column, or e.g.
    * `abs(hashtext(key))` on postgres for an all-text table), the scan is
    * split into range predicates so it runs over `numPartitions` parallel
    * JDBC connections instead of serializing through one. Bounds are
    * fetched with a single scalar min/max query when not supplied.
    */
  def readKeys(spark: SparkSession, url: String, table: String, key: String,
               properties: Properties, numPartitions: Int = 1,
               partitionExpr: Option[String] = None,
               bounds: Option[(Long, Long)] = None): DataFrame = {
    fullKeyScans.incrementAndGet(): Unit
    partitionExpr match {
      case Some(expr) if numPartitions > 1 =>
        // MIN/MAX over an empty table (or all-NULL partitionExpr) is SQL
        // NULL, which getLong silently reads as 0 — degenerate (0, 0)
        // bounds. Detect via wasNull and fall back to the single-partition
        // scan instead of feeding spark.read.jdbc garbage.
        val fetched = bounds.orElse {
          val conn = java.sql.DriverManager.getConnection(url, properties)
          try {
            val rs = conn.createStatement()
              .executeQuery(s"SELECT MIN($expr), MAX($expr) FROM $table")
            rs.next()
            val lo = rs.getLong(1)
            val loNull = rs.wasNull()
            val hi = rs.getLong(2)
            if (loNull || rs.wasNull()) None else Some((lo, hi))
          } finally conn.close()
        }
        fetched match {
          case Some((lo, hi)) =>
            val pruned = s"(SELECT $key, $expr AS graft_pt FROM $table) AS ${table}_keys"
            spark.read.jdbc(url, pruned, "graft_pt", lo, hi, numPartitions, properties)
              .drop("graft_pt")
          case None =>
            spark.read.jdbc(url, s"(SELECT $key FROM $table) AS ${table}_keys", properties)
        }
      case _ =>
        spark.read.jdbc(url, s"(SELECT $key FROM $table) AS ${table}_keys", properties)
    }
  }

  /** Which of `keys` already exist in the sink — probed DISTRIBUTED and
    * DELTA-BOUNDED: each partition sends one ORDINAL-TAGGED batch of
    * indexed point lookups per `batchSize` keys
    * (`SELECT 0 FROM t WHERE k = ? UNION SELECT 1 … WHERE k = ?`), so the
    * cost is O(|keys|) index probes regardless of sink size — the sink's
    * key set is never scanned into Spark, let alone broadcast. The match
    * decision is the DATABASE's own typed `=` on the bound parameter —
    * exactly how the value compared when it was inserted — never a
    * string rendering on the Spark side: DECIMAL scale
    * ('123.000000000000000000' vs '123'), timestamp, UUID-case, and
    * binary representations cannot mark a present key absent (which
    * would break the anti-join idempotence a replayed [[syncFromFeed]]
    * relies on). NULL keys are absent by definition (SQL `k = NULL`
    * never holds, and the PRIMARY-KEY sink cannot hold one); callers
    * that must re-insert-safely reject them loudly instead. Returns the
    * subset of `keys` rows (original Spark values, one column) the sink
    * already holds. */
  def probeExistingKeys(keys: DataFrame, url: String, table: String,
                        key: String, properties: Properties,
                        batchSize: Int = 256): DataFrame = {
    // 500 is the floor of the engines' compound-select limits (SQLite's
    // default SQLITE_MAX_COMPOUND_SELECT is 500; parser/term ceilings on
    // other engines sit higher) — a larger batch would fail only at the
    // sink, at runtime, on the biggest replay
    require(batchSize >= 1 && batchSize <= 500,
      s"probeExistingKeys: batchSize $batchSize not in [1, 500] " +
        "(500 = the smallest common compound-SELECT limit, SQLite's)")
    val spark = keys.sparkSession
    val kdf = keys.select(key)
      .where(org.apache.spark.sql.functions.col(key).isNotNull).distinct()
    val schema = kdf.schema
    val rdd = kdf.rdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        val conn = java.sql.DriverManager.getConnection(url, properties)
        try {
          rows.grouped(batchSize).foreach { batch =>
            // one round trip per batch; every branch is an indexed point
            // lookup returning its ordinal. UNION ALL, not UNION: a
            // duplicate ordinal (non-unique sink key) is harmless —
            // BitSet.set is idempotent — and ALL spares the engine a
            // needless dedup sort across branches
            val ps = conn.prepareStatement(batch.indices
              .map(i => s"SELECT $i FROM $table WHERE $key = ?")
              .mkString(" UNION ALL "))
            try {
              batch.zipWithIndex.foreach { case (r, i) =>
                ps.setObject(i + 1, r.get(0)) }
              val rs = ps.executeQuery()
              val found = new java.util.BitSet(batch.size)
              while (rs.next()) found.set(rs.getInt(1))
              rs.close()
              // emit the PROBED row — output types stay the input schema's
              out ++= batch.zipWithIndex.collect {
                case (r, i) if found.get(i) => r }
            } finally ps.close()
          }
        } finally conn.close()
        out.iterator
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  def readTable(spark: SparkSession, url: String, table: String,
                properties: Properties): DataFrame =
    spark.read.jdbc(url, table, properties)

  /** W1: append. */
  def append(df: DataFrame, url: String, table: String, properties: Properties): Unit =
    df.write.mode("append").jdbc(url, table, properties)

  /** Row-level DELETE by key, executed distributed: each partition opens
    * one connection and runs a single prepared-statement batch. The
    * delete half of the CDC-out path — Spark's JDBC writer has no
    * delete mode, and collecting keys to the driver would bound the verb
    * at driver memory. */
  def deleteKeys(keys: DataFrame, url: String, table: String, key: String,
                 properties: Properties): Unit = {
    keys.select(key).distinct().foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val conn = java.sql.DriverManager.getConnection(url, properties)
          try {
            conn.setAutoCommit(false)
            val ps = conn.prepareStatement(s"DELETE FROM $table WHERE $key = ?")
            try {
              rows.foreach { r => ps.setObject(1, r.get(0)); ps.addBatch() }
              ps.executeBatch()
              conn.commit()
            } finally ps.close()
          } finally conn.close()
        }
    }
  }

  /** CDC-OUT (r13): replay a manifest table's change feed
    * `(fromVersion, toVersion]` into a JDBC table — the lake-native
    * successor of the reference's Kafka→Postgres hop: the WAREHOUSE
    * TABLE is the replayable stream, and the serving database follows it
    * by key. One source version at a time, deletes before inserts within
    * a version (the keyed-merge commit shape carries both and its
    * re-inserts must survive its own deletes); inserts are IDEMPOTENT by
    * the J1 anti-join against the keys [[probeExistingKeys]] finds in
    * the sink — batched point lookups bounded by the DELTA, so a crashed
    * or repeated sync re-applies safely — deletes of absent keys no-op,
    * duplicate inserts anti-join away. Rewrite commits
    * (compact/binpack/rewrite_deletes) contribute zero events by the
    * feed's marker contract, so serving-DB sync and table maintenance
    * stay decoupled. O(|delta| × index probe) per version — the sink's
    * size never enters the bound. The sink table MUST be
    * indexed on `key` (PRIMARY KEY): the delete batches are per-key
    * statements, and an unindexed sink turns each into a full table
    * scan — O(|deletes| × |sink|) row touches. Returns the source head
    * replayed to. */
  def syncFromFeed(spark: SparkSession, srcDir: String, url: String,
                   table: String, key: String, properties: Properties,
                   fromVersion: Int, toVersion: Int = -1): Int = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import graft.sources.ManifestTable
    val to = if (toVersion > 0) toVersion
             else ManifestTable.currentVersion(srcDir)
    require(fromVersion >= 1 && fromVersion <= to,
      s"syncFromFeed: fromVersion $fromVersion not in [1, $to]")
    (fromVersion + 1 to to).foreach { v =>
      // one version's delta is consulted up to five times below (empty
      // gate, deletes, inserts, null-key check, probe input) — persist
      // the O(|delta|) frame once per version instead of re-planning the
      // change-feed scan per pass (guide §5: cache what is reused)
      val feed = ManifestTable.changeFeed(spark, srcDir, v - 1, v)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
      if (!feed.isEmpty) {
        val dels = feed.filter(col("_change_type") === "delete")
          .select(col(key)).distinct()
        if (!dels.isEmpty) deleteKeys(dels, url, table, key, properties)
        val ins = feed.filter(col("_change_type") === "insert")
          .drop("_change_type")
        if (!ins.isEmpty) {
          // a NULL key can never sync idempotently: the probe's `k = ?`
          // cannot see it (SQL three-valued logic), so every replay
          // would re-insert it — and the PRIMARY-KEY sink refuses it
          // anyway. Reject loudly at the source (delta-bounded check).
          require(ins.filter(col(key).isNull).isEmpty,
            s"syncFromFeed: NULL '$key' in the insert delta of $srcDir " +
              s"v$v — null keys can neither land in the PRIMARY-KEY sink " +
              "nor replay idempotently; filter or repair them upstream")
          // idempotence stays DELTA-BOUNDED: probe only the incoming
          // keys against the indexed sink (per-key point lookups) — a
          // 100 TB sink's key set is never scanned, and the broadcast
          // frame is ≤ |delta| rows by construction
          val existing = probeExistingKeys(ins.select(col(key)), url,
            table, key, properties).toDF("_sink_k")
          val fresh = ins.join(broadcast(existing),
            col(key) === col("_sink_k"), "left_anti")
          if (!fresh.isEmpty) append(fresh, url, table, properties)
        }
      }
      } finally feed.unpersist(): Unit
    }
    to
  }

  /** D1: CREATE TABLE with all-text columns and a primary key, issued over
    * plain JDBC (the reference's psycopg2 DDL). `colType` defaults to
    * postgres `text`; embedded engines without it (e.g. Derby in tests)
    * pass a VARCHAR. */
  def createAllTextTable(url: String, table: String, fields: Seq[String],
                         primaryKey: String, properties: Properties,
                         colType: String = "text"): Unit = {
    val cols = fields.map { f =>
      if (f == primaryKey) s"$f $colType PRIMARY KEY" else s"$f $colType"
    }.mkString(", ")
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      // existence check via metadata — `IF NOT EXISTS` isn't universal
      // (Derby lacks it); identifiers may come back case-folded.
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      var exists = false
      while (rs.next() && !exists)
        exists = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      rs.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.execute(s"CREATE TABLE $table ($cols)")
        finally st.close()
      }
    } finally conn.close()
  }
}
