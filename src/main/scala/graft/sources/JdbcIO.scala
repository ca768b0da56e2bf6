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
               bounds: Option[(Long, Long)] = None): DataFrame =
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

  def readTable(spark: SparkSession, url: String, table: String,
                properties: Properties): DataFrame =
    spark.read.jdbc(url, table, properties)

  /** W1: append. */
  def append(df: DataFrame, url: String, table: String, properties: Properties): Unit =
    df.write.mode("append").jdbc(url, table, properties)

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
