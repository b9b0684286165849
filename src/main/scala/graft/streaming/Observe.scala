package graft.streaming

import graft.tx.Splitter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `Dataset.observe` instrumentation — the zero-extra-pass audit
  * counters a production pipeline emits alongside its real work.
  *
  * The reference validates its stream by writing a separate 5-column
  * rejected-row log (K4) and eyeballing console output; `observe`
  * metrics are the engine-native upgrade: the counters ride the SAME
  * physical plan as the sink write (no second scan, no extra shuffle —
  * an `AggregatingAccumulator` fed by the operator that's already
  * running), and surface per-ACTION in batch (`Observation.get`) or
  * per-MICRO-BATCH in streaming (`StreamingQueryProgress
  * .observedMetrics`), where an alerting hook reads them.
  *
  * At 100 TB this is the difference between "the nightly audit query
  * re-scans the day" and "the write itself reports its row accounting".
  */
object Observe {

  /** Metric column set: the four validation buckets of SURVEY §2.4
    * (overlap semantics preserved — fraud rows with error text count in
    * both, exactly like the sink splits) plus exact decimal USD. */
  def bucketMetricCols: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("n_total"),
    count(when(Splitter.isError, 1)).as("n_error"),
    count(when(Splitter.isFraud, 1)).as("n_fraud"),
    count(when(Splitter.isValid, 1)).as("n_valid"),
    count(when(Splitter.isInvalid, 1)).as("n_invalid"),
    sum(col("Amount_USD").cast("decimal(18,2)")).as("usd_total"))

  /** Attach the bucket counters to a (batch or streaming) enriched
    * frame under the given observation name. The returned frame is
    * row-identical to the input; only the metrics side-channel is
    * added. */
  def bucketMetrics(enriched: DataFrame, name: String): DataFrame =
    enriched.observe(name, bucketMetricCols.head, bucketMetricCols.tail: _*)
}
