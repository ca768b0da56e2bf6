package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** The versioned-table contracts q270 relies on: manifest-scoped reads,
  * append composition, overwrite isolation, and time travel. */
class ManifestTableSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_manifest_spec")
    d.toFile.deleteOnExit()
    d.toString + "/tbl"
  }

  test("append commits compose; overwrite starts a new file set; time travel reads history") {
    import spark.implicits._
    val dir = freshDir()
    assert(ManifestTable.currentVersion(dir) == 0)

    val v1 = ManifestTable.commit((1L to 10L).toDF("k"), dir, append = false)
    val v2 = ManifestTable.commit((11L to 15L).toDF("k"), dir, append = true)
    val v3 = ManifestTable.commit((100L to 101L).toDF("k"), dir, append = false)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(ManifestTable.currentVersion(dir) == 3)

    assert(ManifestTable.read(spark, dir, 1).count() == 10)
    assert(ManifestTable.read(spark, dir, 2).count() == 15) // v1 files ∪ delta
    assert(ManifestTable.read(spark, dir, 3).count() == 2)  // overwrite
    assert(ManifestTable.read(spark, dir).count() == 2)     // latest = v3
    // the v2 snapshot is the exact union, not a re-read of live state
    assert(ManifestTable.read(spark, dir, 2).agg(sum($"k")).head.getLong(0)
      == (1L to 15L).sum)
  }

  test("snapshot isolation: a dataframe planned at v1 is untouched by later commits") {
    import spark.implicits._
    val dir = freshDir()
    ManifestTable.commit((1L to 4L).toDF("k"), dir, append = false)
    val readerAtV1 = ManifestTable.read(spark, dir) // resolves v1's manifest NOW
    ManifestTable.commit((5L to 9L).toDF("k"), dir, append = true)
    ManifestTable.commit(Seq(42L).toDF("k"), dir, append = false)
    // the old reader still sees exactly v1 — files were never mutated
    assert(readerAtV1.count() == 4)
    assert(ManifestTable.read(spark, dir).count() == 1)
  }
}
