package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.CdcCuts

/** The native rolling-window chunker against a direct (re-hash every
  * window) reference, plus the content-defined property that justifies
  * its existence: edits cannot move boundaries outside their own chunk. */
class CdcCutsSpec extends AnyFunSuite {

  private def reference(s: String): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    (1 to b.length - 7).filter { i =>
      var h = 0L
      (0 until 8).foreach(j => h = (h * 31 + (b(i - 1 + j) & 0xff)) % 1000000007L)
      h % 64 == 0
    }.map(_.toLong)
  }

  private def native(s: String): Seq[Long] =
    CdcCuts.cuts(UTF8String.fromString(s)).toLongArray().toSeq

  test("rolling update matches the direct per-window hash on pseudo-random text") {
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { _ =>
      val s = (0 until 40 + rnd.nextInt(400))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(native(s) == reference(s), s"mismatch on: $s")
    }
  }

  test("short and empty strings produce no cuts") {
    assert(native("") == Seq.empty)
    assert(native("1234567") == Seq.empty)
    assert(native("12345678").size <= 1)
  }

  test("content-defined property: a prefix edit shifts no boundary beyond its own window") {
    val rnd = new scala.util.Random(7)
    val s = (0 until 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "XYZ" + s
    val orig = native(s).toSet
    val shifted = native(edited).filter(_ >= 4).map(_ - 3).toSet
    // every window fully inside the shared suffix hashes identically
    assert(shifted == orig,
      "boundaries outside the edited window must be byte-stable")
  }
}
