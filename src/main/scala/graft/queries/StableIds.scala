package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable global row-id assignment — contiguous 0..N−1 ids in total
  * sort order WITHOUT the classic anti-pattern (`row_number()` over a
  * global `Window.orderBy` funnels the whole dataset through ONE
  * reducer; at 100 TB that task never finishes). This is the id-stamping
  * step of a corpus ingest: every document gets a stable dense id the
  * rest of the pipeline keys on.
  *
  * Mechanism: range-repartition on the sort key (each partition owns a
  * contiguous key range), sort within partitions, then
  * `RDD.zipWithIndex` — the one sanctioned RDD drop-down in this
  * engine, and deliberately so: zipWithIndex runs its partition-count
  * job and its assignment pass over the SAME RDD instance, so the
  * range exchange's MAP output is reused and the sampled boundaries
  * CANNOT drift between the two jobs — a two-`DataFrame`-action
  * formulation would re-sample boundaries per action (RangePartitioner
  * seeds from the runtime RDD id) and could mis-stitch offsets. (The
  * reduce-side fetch + in-partition sort does re-execute for the
  * second job — what the shared instance pins is correctness plus the
  * map-side work, not the whole second pass; budget ~two reduce
  * passes over the data.)
  *
  * Determinism contract: `sortCols` must be a TOTAL order (add a unique
  * tie-breaker). Then ids equal the global sort rank regardless of
  * where sampled partition boundaries land, so re-runs — even with
  * different parallelism — produce identical ids (StableIdsSpec).
  *
  * Cost: one range-exchange shuffle whose reduce side (fetch + sort)
  * runs twice — zipWithIndex's count job and its assignment pass;
  * never a single-partition stage. */
object StableIds {

  /** The distributed sort `assign` stamps over — separate so the spec
    * can assert on the PRODUCTION plan (range exchange, never
    * SinglePartition), not a hand-rebuilt twin. */
  private[queries] def rangeSorted(df: DataFrame, sortCols: Seq[Column],
                                   numPartitions: Int): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
  }

  def assign(df: DataFrame, sortCols: Seq[Column],
             idName: String = "stable_id", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val sorted = rangeSorted(df, sortCols, numPartitions)
    val outSchema = sorted.schema.add(idName, LongType, nullable = false)
    // hold ONE RDD reference: both of zipWithIndex's jobs must see the
    // same lineage (see scaladoc)
    val rdd = sorted.rdd
    val withIds = rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withIds, outSchema)
  }

  /** Continuous-ingestion continuation: stamp an INCOMING delta with
    * ids that extend an already-stamped corpus — existing ids never
    * move (they're keys downstream tables already reference; a full
    * re-rank would invalidate every one), the delta gets the next
    * contiguous block in its own sort order. Offset = max existing id
    * + 1, read with a column-pruned 1-row aggregate (never a count of
    * assumptions: gaps in the existing range are preserved, not
    * reused). Cost on top of [[assign]] over the delta alone: one tiny
    * agg job over the existing id column. */
  def extend(existing: DataFrame, incoming: DataFrame, sortCols: Seq[Column],
             idName: String = "stable_id", numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit, max}
    val offset = existing
      .agg(coalesce(max(org.apache.spark.sql.functions.col(idName)), lit(-1L)))
      .head().getLong(0) + 1L
    val stamped = assign(incoming, sortCols, idName, numPartitions)
    stamped.withColumn(idName,
      (org.apache.spark.sql.functions.col(idName) + lit(offset)).cast(LongType))
  }
}
