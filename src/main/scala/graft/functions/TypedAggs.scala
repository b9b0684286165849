package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.12): the
  * Dataset-native custom-aggregate API, complementing the untyped
  * `TypedImperativeAggregate` path the KMV/CMS sketches use. The
  * demonstrator is an EXACT weighted mean: inputs arrive as integer
  * (cents, weight) pairs, the buffer holds Σ(cents·weight) and
  * Σweight as exact longs (order-independent, map-side mergeable —
  * the two properties a distributed aggregate must prove), and only
  * the final division produces a double, so the result is
  * bit-reproducible across partitionings and engines.
  */
object WeightedMeanAgg
    extends Aggregator[(Long, Long), (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Long, Long)): (Long, Long) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  /** cents·weight / (100 · Σweight) — division of exact longs in
    * double, identical in the DuckDB mirror. An all-zero-weight group
    * yields NaN (0/0), surfaced rather than masked. */
  override def finish(r: (Long, Long)): Double =
    r._1.toDouble / 100.0 / r._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
