package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline STATE-STORE inspection (Spark 4 state data source) — read a
  * running or stopped streaming query's keyed state straight from its
  * checkpoint, as a DataFrame, without touching the query: the
  * operational surface a long-lived streaming deployment needs when
  * "what does the state currently say about key X?" must be answerable
  * NOW (skew hunts, watermark debugging, state-size audits, incident
  * forensics) and replaying the input is off the table at 100 TB.
  *
  * The reader scans the checkpoint's state files directly (RocksDB or
  * HDFS-backed alike), so its cost is O(state), independent of
  * everything ingested; `batchId` time-travels to any retained
  * snapshot. Rows come back as (key struct, value struct,
  * partition_id) — the same layout the operator keeps, exposed
  * read-only. */
object StateInspect {

  /** State of `operatorId` (default: the query's first stateful
    * operator) at `batchId` (default: latest committed). */
  def state(spark: SparkSession, checkpoint: String,
            operatorId: Int = 0, batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
    batchId.foreach(b => r.option("batchId", b.toString))
    r.load(checkpoint)
  }

  /** Flattened (key, value) columns of a streaming AGGREGATION's state
    * — for a `groupBy(k).agg(...)` query this is the live running
    * aggregate per key, the thing the next micro-batch will fold into. */
  def aggregationState(spark: SparkSession, checkpoint: String,
                       operatorId: Int = 0): DataFrame =
    state(spark, checkpoint, operatorId)
      .selectExpr("key.*", "value.*", "partition_id")

  /** A `transformWithState` query's NAMED state variable — the modern
    * API registers each ValueState/ListState under its own name and
    * schema, and the state source addresses them by `stateVarName`
    * (ListState rows come back flattened, one row per element). This
    * is the mid-stream forensics surface for the milestone monitor:
    * `twsState(spark, ckpt, "buf")` is the live watermark buffer,
    * `twsState(spark, ckpt, "count")` the lifetime counters —
    * StreamingStateSpec reads both between restarts. */
  def twsState(spark: SparkSession, checkpoint: String, stateVarName: String,
               operatorId: Int = 0, batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId.toString)
      .option("stateVarName", stateVarName)
    batchId.foreach(b => r.option("batchId", b.toString))
    r.load(checkpoint)
  }
}
