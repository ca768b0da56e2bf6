package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** DSv2 batch-write contracts: staged files are invisible until the
  * driver-side manifest publish, append/overwrite map to the manifest
  * commit modes, and the parquet the example-Group writer produces is
  * read back faithfully by Spark's own reader. */
class ManifestWriteSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.v2.ManifestWriteSource"

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dsv2_write")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  test("append and overwrite commits publish atomically; read-back is faithful") {
    import spark.implicits._
    val dir = freshDir()
    val df1 = (1L to 100L).toDF("k")
      .select($"k", ($"k" * 2).cast("int").as("i"), ($"k" / 4.0).as("d"),
        concat(lit("row-"), $"k").as("s"), ($"k" % 2 === 0).as("b"))
    df1.repartition(4).write.format(Fmt).option("path", dir).mode("append").save()
    assert(ManifestTable.currentVersion(dir) == 1)
    // multi-task write: one file per non-empty partition, all in manifest
    assert(ManifestTable.fileCount(dir) > 1)

    val r1 = ManifestTable.read(spark, dir)
    assert(r1.count() == 100)
    assert(r1.agg(sum($"k")).head.getLong(0) == 5050L)
    assert(r1.agg(sum($"i".cast("long"))).head.getLong(0) == 10100L)
    assert(r1.filter($"b").count() == 50)
    assert(r1.filter($"s" === "row-7").count() == 1)
    // dtypes survive the Group writer round trip
    assert(r1.schema("k").dataType.typeName == "long")
    assert(r1.schema("i").dataType.typeName == "integer")
    assert(r1.schema("d").dataType.typeName == "double")
    assert(r1.schema("s").dataType.typeName == "string")
    assert(r1.schema("b").dataType.typeName == "boolean")

    // append composes with the existing snapshot
    (101L to 120L).toDF("k")
      .select($"k", ($"k" * 2).cast("int").as("i"), ($"k" / 4.0).as("d"),
        concat(lit("row-"), $"k").as("s"), ($"k" % 2 === 0).as("b"))
      .write.format(Fmt).option("path", dir).mode("append").save()
    assert(ManifestTable.currentVersion(dir) == 2)
    assert(ManifestTable.read(spark, dir).count() == 120)
    // v1 time travel unaffected
    assert(ManifestTable.read(spark, dir, 1).count() == 100)

    // overwrite starts a new file set (TRUNCATE capability)
    Seq((42L, 1, 0.5, "only", true)).toDF("k", "i", "d", "s", "b")
      .write.format(Fmt).option("path", dir).mode("overwrite").save()
    assert(ManifestTable.read(spark, dir).count() == 1)
    assert(ManifestTable.read(spark, dir, 2).count() == 120)

    // no staging residue after successful commits
    val staging = new java.io.File(s"$dir/_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      "staging directories must be cleaned up on commit")
  }

  test("nullable columns round-trip NULLs, and DSv2-written tables accept manifest deletes") {
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val r = ManifestTable.read(spark, dir)
    assert(r.filter($"s".isNull).select($"k").as[Long].collect().sameElements(Array(2L)))
    // the DSv2-written files participate in the ordinary delete path
    ManifestTable.delete(Seq(1L).toDF("k"), dir, "k")
    assert(ManifestTable.read(spark, dir).select($"k").as[Long].collect().sorted
      .sameElements(Array(2L, 3L)))
  }
}
