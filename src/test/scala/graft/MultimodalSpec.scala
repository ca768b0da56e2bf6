package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = Seq((0L, "aaaabbbb", 8L), (1L, "zzzz", 4L), (2L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
    Multimodal.mediaFromDocuments(docs)
  }

  test("media table has binary payload + typed metadata struct") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.filter($"media_id" === 0).head()
    assert(r.getAs[String]("kind") == "image")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "aaaabbbb")
  }

  test("partition-batched feature extraction produces fixed-width normalized features") {
    val f = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val feats0 = f(0).getSeq[Float](3)
    assert(feats0.length == Multimodal.FakeDecoder.featureDim)
    assert(math.abs(feats0.sum - 1.0f) < 1e-6) // L1-normalized
    // 'a'(97) and 'b'(98) both land in bin 6 → single bin holds everything
    assert(feats0(97 * 16 / 256) == 1.0f)
    assert(f(2).getInt(2) == 0 && f(2).getSeq[Float](3).sum == 0f) // empty payload
  }

  test("frame sampling slices payload into stride-spaced fixed chunks") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 0), 2, 2)
      .orderBy("frame_idx").collect()
    // payload "aaaabbbb" (8 bytes), frame=2 → frames 0..3, stride 2 → 0, 2
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(new String(frames(0).getAs[Array[Byte]](2), "UTF-8") == "aa")
    assert(new String(frames(1).getAs[Array[Byte]](2), "UTF-8") == "bb")
  }

  test("strip_accents is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT strip_accents('Crèmerie Noël') AS s").head().getString(0)
    assert(out == "Cremerie Noel")
  }

  test("rolling_hash matches the hand-computed polynomial and handles edges") {
    GraftFunctions.register(spark)
    // ((97*31 + 98)*31 + 99) % 1000000007 = 96354
    val rows = spark.sql(
        "SELECT rolling_hash('abc'), rolling_hash(''), rolling_hash(CAST(NULL AS STRING))")
      .head()
    assert(rows.getLong(0) == 96354L)
    assert(rows.getLong(1) == 0L)
    assert(rows.isNullAt(2))
  }
}
