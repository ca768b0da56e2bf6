package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftExtensions
import graft.plans.LevenshteinBandRule

class LevenshteinBandRuleSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(("kitten", "sitting"), ("red", "read"), ("ab", "xyzzyxy"))
    .toDF("a", "b")

  test("rule injects the implied length band for lev <= k (both orientations) and the thresholded form") {
    for (cond <- Seq(
      levenshtein($"a", $"b") <= 2,
      lit(2) >= levenshtein($"a", $"b"),
      levenshtein($"a", $"b") < 3,
      levenshtein($"a", $"b", 2) >= 0)) {
      val plan = df.filter(cond).queryExecution.analyzed
      val out = LevenshteinBandRule(plan).toString
      assert(out.contains("abs((length(") && out.contains(") <= 2"),
        s"no band injected for $cond in:\n$out")
    }
  }

  test("rule is fixed-point-safe and leaves negations/disjunctions alone") {
    val once = LevenshteinBandRule(
      df.filter(levenshtein($"a", $"b") <= 2).queryExecution.analyzed)
    val twice = LevenshteinBandRule(once)
    assert(once.toString == twice.toString, "rule must not stack duplicate bands")
    for (cond <- Seq(
      !(levenshtein($"a", $"b") <= 2),
      levenshtein($"a", $"b") <= 2 || $"a" === "x")) {
      val plan = df.filter(cond).queryExecution.analyzed
      assert(LevenshteinBandRule(plan).toString == plan.toString,
        s"negated/disjunctive $cond must not be rewritten")
    }
  }

  test("rule injects the band into Join conditions — direct and filter-above-join shapes") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val l = Seq("kitten", "red", "ab").toDF("x")
    val r = Seq("sitting", "read", "xyzzyxy").toDF("y")
    // direct spelling: the user writes the bound in the join condition
    val direct = l.join(r, levenshtein($"x", $"y") <= 2).queryExecution.analyzed
    val rewritten = LevenshteinBandRule(direct).toString
    assert(rewritten.contains("abs((length(") && rewritten.contains(") <= 2"),
      s"no band in the direct join condition:\n$rewritten")
    // filter-above-join: PushDownPredicates absorbs the filter into the
    // join condition in the same optimizer iteration BEFORE injected rules
    // run — so the rule must match Join, not only Filter. The shared spec
    // session registers GraftExtensions, so this optimizedPlan comes out
    // with the filter absorbed AND the band already injected by the
    // session optimizer — which is itself the end-to-end claim; re-running
    // the rule manually on that output must then be a no-op (fixed point
    // through the real optimizer pipeline, not just a synthetic plan).
    val absorbed = l.crossJoin(r).filter(levenshtein($"x", $"y") <= 2)
      .queryExecution.optimizedPlan
    val cond = absorbed.collectFirst { case Join(_, _, _, Some(c), _) => c }
    assert(cond.isDefined, s"expected the filter absorbed into a join:\n$absorbed")
    assert(cond.get.toString.contains("abs((length("),
      s"session optimizer did not inject the band into the join condition:\n${cond.get}")
    // the band is PREPENDED: the O(1) length check short-circuits before the DP
    assert(cond.get.toString.indexOf("abs((length(") < cond.get.toString.indexOf("levenshtein"),
      s"band must precede the levenshtein conjunct for short-circuit:\n${cond.get}")
    // fixed point holds for the Join case too
    assert(LevenshteinBandRule(absorbed).toString == absorbed.toString,
      "rule must not stack duplicate bands in join conditions")
  }

  test("extension-registered session plans the band and returns identical results") {
    val Sf = "/root/testdata/sf0.001"
    // parquet-backed, not a LocalRelation — the local-relation optimizer
    // would otherwise fold the whole filter away before our rule matters
    val plainRows = Tables(spark, Sf).documents
      .filter(levenshtein($"lang", $"source") <= 2)
      .select($"doc_id").as[Long].collect().toSet
    // a NEW session (shared context) picks up the extension at build time
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions().apply _)
      .getOrCreate()
    try {
      val c = org.apache.spark.sql.functions.col _
      val edf = Tables(extended, Sf).documents
        .filter(levenshtein(c("lang"), c("source")) <= 2)
      val optimized = edf.queryExecution.optimizedPlan.toString
      assert(optimized.contains("length("),
        s"extension did not inject the band into the optimized plan:\n$optimized")
      assert(edf.select(c("doc_id")).collect().map(_.getLong(0)).toSet == plainRows,
        "band injection changed query results")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
