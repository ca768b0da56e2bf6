package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wiring guards for the driver contract: Map ++ merging would silently
  * drop a query on a duplicate name, and an oracle without a query (or a
  * dangling oracle key) would weaken the gate without failing anywhere.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val parts: Seq[(String, Map[String, _])] = Seq(
    "relational" -> graft.queries.RelationalQueries.defs,
    "relational2" -> graft.queries.RelationalQueries2.defs,
    "text" -> graft.queries.TextQueries.defs,
    "dedup" -> graft.queries.DedupQueries.defs,
    "vector" -> graft.queries.VectorQueries.defs,
    "events" -> graft.queries.EventsQueries.defs,
    "multimodal" -> graft.queries.MultimodalQueries.defs,
    "trainingdata" -> graft.queries.TrainingDataQueries.defs,
    "warehouse" -> graft.queries.WarehouseQueries.defs)

  test("no query name collides across modules (merge would drop it silently)") {
    val all = parts.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == all.size + 1) // +1 for q1 in SparkEntry
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }
}
