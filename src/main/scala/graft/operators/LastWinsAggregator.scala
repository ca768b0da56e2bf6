package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the reference's order-aware last-wins dedup
  * (A1, `kafka_stream_data.py:78-79`): keeps the payload carrying the
  * highest sequence number. The buffer is a single (seq, payload) pair, so
  * partial aggregation (map-side combine) applies — same shuffle profile as
  * `max_by`, offered as the typed/Dataset counterpart.
  *
  * Usage:
  *   ds.groupByKey(_.key).agg(LastWinsAggregator.toColumn)  // Dataset API
  *   spark.udf.register("last_wins", functions.udaf(LastWinsAggregator))
  */
object LastWinsAggregator extends Aggregator[(Long, String), (Long, String), String] {
  override def zero: (Long, String) = (Long.MinValue, null)
  override def reduce(b: (Long, String), a: (Long, String)): (Long, String) =
    if (a._1 >= b._1) a else b
  override def merge(x: (Long, String), y: (Long, String)): (Long, String) =
    if (x._1 >= y._1) x else y
  override def finish(r: (Long, String)): String = r._2
  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
