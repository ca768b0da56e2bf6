package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Sliding-window chunking (q393) + small-to-big retrieval (q394): the
  * window/stride invariants on a crafted fixture, and the claim the
  * parent-aggregation exists for — a long document cannot dilute its one
  * relevant passage at chunk granularity the way it does under whole-doc
  * Jaccard. */
class ChunkingSpec extends SparkSpec {

  test("q393 windows: stride-48 starts, 64-token windows, full coverage, 16-token overlap") {
    import spark.implicits._
    // lens straddling every boundary case: single window, exact window,
    // window+1 (tail chunk), exact two strides, long
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 64).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 65).map(i => s"t$i").mkString(" ")),
      (4L, (1 to 97).map(i => s"t$i").mkString(" ")),
      (5L, (1 to 200).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val ch = TextQueries.docChunks(spark, "", docs)
      .select($"doc_id", $"chunk_idx", $"n_tokens", $"ct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[String](3)))
    val byDoc = ch.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunk counts: ceil-ish by stride — 1, 2, 2, 3, 5
    assert(byDoc(1L).length == 1 && byDoc(2L).length == 2 &&
      byDoc(3L).length == 2 && byDoc(4L).length == 3 && byDoc(5L).length == 5,
      byDoc.view.mapValues(_.length).toMap.toString)
    // doc 2: 64 tokens = exactly one full window, plus the stride-48 tail
    assert(byDoc(2L)(0)._3 == 64 && byDoc(2L)(1)._3 == 16)
    // every chunk's tokens are the contiguous slice [idx*48+1, idx*48+n]
    for ((d, idx, n, ct) <- ch) {
      val start = idx * 48
      assert(ct == (start + 1 to start + n).map(i => s"t$i"),
        s"doc $d chunk $idx is not the contiguous window")
      assert(n <= 64 && n >= 1)
    }
    // coverage: the union of windows is every token, and consecutive FULL
    // windows overlap by exactly 64 - 48 = 16 tokens
    for ((_, chunks) <- byDoc) {
      val covered = chunks.flatMap { case (_, idx, n, _) =>
        (idx * 48 + 1) to (idx * 48 + n) }.toSet
      val len = chunks.map { case (_, idx, n, _) => idx * 48 + n }.max
      assert(covered == (1L to len).toSet, "windows must cover every token")
      chunks.toSeq.sliding(2).foreach {
        case Seq((_, i1, n1, _), (_, i2, _, _)) if n1 == 64 =>
          assert(i1 * 48 + 64 - i2 * 48 == 16, "full windows overlap by 16")
        case _ =>
      }
    }
  }

  test("q394 small-to-big: chunk granularity rescues a passage whole-doc Jaccard dilutes") {
    import spark.implicits._
    // the query doc's 20-token vocabulary appears VERBATIM as one passage
    // inside a 400-token haystack: whole-doc Jaccard ≈ 20/400, while the
    // passage's own window scores ≈ 20/64-ish — the dilution gap the
    // parent-aggregation pattern exists to close
    val passage = (1 to 20).map(i => s"rare$i").mkString(" ")
    val filler = (1 to 380).map(i => s"noise$i")
    val hayTokens = filler.take(190) ++ passage.split(" ") ++ filler.drop(190)
    val docs = Seq(
      (0L, passage),                      // the "query" doc
      (100L, hayTokens.mkString(" ")),    // long doc hiding the passage
      (200L, (1 to 50).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = TextQueries.docChunks(spark, "", docs)
      .select($"doc_id", $"chunk_idx", array_distinct($"ct").as("cts"))
    val qts = docs.filter($"doc_id" === 0L)
      .select(explode(array_distinct(
        graft.functions.ParityFunctions.tokens($"text"))).as("w"))
      .collect().map(_.getString(0)).toSet
    val best = chunks.filter($"doc_id" === 100L).collect().map { r =>
      val cts = r.getSeq[String](2).toSet
      val i = cts.intersect(qts).size.toDouble
      i / (qts.size + cts.size - i)
    }.max
    val hts = hayTokens.distinct.toSet
    val whole = {
      val i = hts.intersect(qts).size.toDouble
      i / (qts.size + hts.size - i)
    }
    assert(best > 4 * whole,
      f"chunk-level score $best%.4f must dominate the diluted whole-doc $whole%.4f")
    // and at least one window holds the passage with high overlap
    assert(best >= 20.0 / 64.0 - 0.08)
  }
}
