package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** AllPairs/PPJoin prefix-filter contracts (q322's candidate stage). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** A SPARSE fixture with three candidate classes:
    *  - A-pairs (0,1)…(8,9): true near-dups (7/8 tokens shared) — must
    *    survive every prune and verify;
    *  - B-pairs (100,101)…: collide on a rare token at the PREFIX EDGE
    *    of both sides (position 5 of 10), where the positional bound
    *    1+min(|x|−pa, |y|−pb) = 6 < α = 8 proves they can't reach
    *    J ≥ 3/5 — plain AllPairs still generates them;
    *  - X/Y (200,201): a 5-token doc colliding with a 20-token doc on a
    *    shared rare token — killed by the size filter alone.
    * Docs 202/203 are df-boosters for Y's tail and a genuine J = 1 pair. */
  private def sparseToks() = {
    val commons = (0 until 5).map(i => s"common_$i")
    val a = (0 until 10).map { i =>
      val pairId = i / 2
      (i.toLong, (0 until 7).map(j => s"d${pairId}_$j") :+ s"own_$i")
    }
    val b = (0 until 10).map { i =>
      ((100 + i).toLong,
        (0 until 4).map(j => s"u${i}_$j") ++ Seq(s"w_${i / 2}") ++ commons)
    }
    val x = Seq((200L, Seq("sx_0", "sx_1", "ws", commons(0), commons(1))))
    val y = Seq((201L, (0 until 8).map(j => s"sy_$j") ++ Seq("ws") ++
      (0 until 11).map(j => s"bigc_$j")))
    val boosters = Seq(202L, 203L).map(id => (id, (0 until 11).map(j => s"bigc_$j")))
    (a ++ b ++ x ++ y ++ boosters).toDF("doc_id", "toks")
      .select($"doc_id", explode($"toks").as("tok"))
  }

  private def verified(cand: org.apache.spark.sql.DataFrame,
                       toks: org.apache.spark.sql.DataFrame) = {
    val sets = toks.groupBy($"doc_id")
      .agg(sort_array(collect_set($"tok")).as("ts"), count(lit(1)).as("sz"))
    cand
      .join(sets.select($"doc_id".as("id_a"), $"ts".as("ta"), $"sz".as("sza")), Seq("id_a"))
      .join(sets.select($"doc_id".as("id_b"), $"ts".as("tb"), $"sz".as("szb")), Seq("id_b"))
      .select($"id_a", $"id_b",
        size(array_intersect($"ta", $"tb")).cast("long").as("inter"),
        ($"sza" + $"szb" - size(array_intersect($"ta", $"tb"))).as("uni"))
      .filter($"inter" * 5 >= $"uni" * 3)
      .select($"id_a", $"id_b")
  }

  test("positional filter shrinks candidates on a sparse corpus without losing a qualifying pair") {
    val toks = sparseToks().cache()
    val plain = Dedup.prefixCandidates(toks, "doc_id", "tok", positional = false)
    val ppjoin = Dedup.prefixCandidates(toks, "doc_id", "tok", positional = true)
    val (nPlain, nPos) = (plain.count(), ppjoin.count())
    assert(nPos < nPlain,
      s"positional filter must prune candidates on the sparse fixture ($nPos vs $nPlain)")
    // completeness: the VERIFIED output is identical through both paths
    val a = verified(plain, toks).as[(Long, Long)].collect().toSet
    val b = verified(ppjoin, toks).as[(Long, Long)].collect().toSet
    assert(a == b, s"positional filter dismissed qualifying pairs: ${a -- b}")
    // and the fixture's planted near-dups actually qualify
    assert(b.contains((0L, 1L)) && b.contains((2L, 3L)) && b.contains((202L, 203L)),
      s"fixture must contain its planted near-dup pairs, got $b")
    // the prune classes each fired: B-pairs (positional) and X/Y (size)
    // are plain-AllPairs candidates but not PPJoin candidates
    val plainSet = plain.as[(Long, Long)].collect().toSet
    val posSet = ppjoin.as[(Long, Long)].collect().toSet
    assert(plainSet.contains((100L, 101L)) && !posSet.contains((100L, 101L)),
      "positional bound must prune the prefix-edge collision pair")
    assert(plainSet.contains((200L, 201L)) && !posSet.contains((200L, 201L)),
      "size filter must prune the 5-vs-20-token collision pair")
    toks.unpersist()
    ()
  }

  test("prefixCandidates rejects degenerate thresholds") {
    val toks = Seq((1L, "a")).toDF("doc_id", "tok")
    intercept[IllegalArgumentException] {
      Dedup.prefixCandidates(toks, "doc_id", "tok", positional = true, tNum = 5, tDen = 5)
    }
    ()
  }
}
