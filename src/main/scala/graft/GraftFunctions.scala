package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CdcCuts, DotProduct, QuantizeInt8, RollingHash, StripAccents}

/** SQL-surface registration for graft's custom expressions, so
  * `spark.sql("SELECT strip_accents(c) ...")` works alongside the Column
  * API. Usable two ways:
  *  - `GraftFunctions.register(spark)` on an existing session;
  *  - `.withExtensions(new GraftExtensions)` at session build time.
  */
object GraftFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "strip_accents" -> (exprs => StripAccents(exprs.head)),
    "rolling_hash" -> (exprs => RollingHash(exprs.head)),
    "cdc_cuts" -> (exprs => CdcCuts(exprs.head)),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "quantize_int8" -> (exprs => QuantizeInt8(exprs.head)))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }

  private[graft] def inject(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()`
  * (or `spark.sql.extensions=graft.GraftExtensions`): injects the custom
  * SQL functions AND the optimizer rules
  * ([[graft.plans.LevenshteinBandRule]] — auto-derives the length-band
  * predicate implied by edit-distance filters so it can be pushed below
  * the candidate-pair join). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(e)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinBandRule)
    // SQL views over GraftCatalog: Spark ships the ViewCatalog SPI but
    // no engine integration, and ResolveSessionCatalog hard-refuses view
    // DDL on non-session catalogs IN the Resolution batch — so the rule
    // must fire earlier. The Hints batch runs before Resolution and
    // admits extension rules (see GraftViewRules for the full contract).
    e.injectHintResolutionRule(s => graft.sources.v2.GraftViewRules(s))
    // whole-operator extension: the native distributed prefix scan
    // (custom LogicalPlan + Strategy + SparkPlan, graft.plans.PrefixScan)
    e.injectPlannerStrategy(_ => graft.plans.PrefixScanStrategy)
    // materialized-view automatic rewrite: post-hoc resolution (the plan
    // is fully resolved, filters not yet pushed into scans), exact-match
    // + version-fresh only (graft.sources.v2.GraftMaterializedViews)
    e.injectPostHocResolutionRule(s => graft.sources.v2.GraftMvRewriteRule(s))
  }
}
