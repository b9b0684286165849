package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering — the data-skipping layout
  * for MULTI-dimensional predicates.
  *
  * A table sorted on one column prunes scans filtering that column
  * (parquet min/max stats per file/row-group) but is useless for a
  * second dimension; interleaving the bits of two rank-normalized keys
  * puts rows close in BOTH dimensions into the same files, so a
  * `a BETWEEN … AND b BETWEEN …` predicate touches a small fraction of
  * files instead of all of them. This is the same layout trick the
  * lakehouse table formats call `OPTIMIZE ZORDER BY` — here built from
  * plain Spark: a codegen'd bit-interleave expression, one range
  * repartition on the z-value, and a sort-within-partitions write.
  *
  * Scale shape: rank normalization needs only a 1-row (min, max) agg
  * per dimension (broadcast); the single range exchange on the z-value
  * is the same shuffle any sorted write pays; no skew pitfall beyond
  * what range partitioning's sampler already handles. The locality
  * claim is measured, not assumed: ZOrderSpec counts the distinct files
  * a 2-D range predicate actually touches under this layout vs the
  * natural one.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative long
    * columns: `a`'s bit i lands at position 2i, `b`'s at 2i+1. Pure
    * column algebra (shifts/masks folded by codegen), no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Rank-normalize a numeric column to `[0, 2^bits)` buckets via its
    * (min, max) range — the cheap monotone map that makes dimensions of
    * any scale interleavable. Constant columns map to bucket 0, and so
    * do NULL values (explicitly: `least(null, …)` would otherwise skip
    * the null and silently treat missing coordinates as the TOP bucket,
    * scattering null rows across the high-end files). */
  def normalize(c: Column, minC: Column, maxC: Column, bits: Int = 16): Column = {
    val span = maxC.cast("double") - minC.cast("double")
    val buckets = math.pow(2, bits).toLong
    when(c.isNull || span <= 0, lit(0L)).otherwise(
      least(
        floor((c.cast("double") - minC.cast("double")) / span * buckets).cast("long"),
        lit(buckets - 1)))
  }

  /** Cluster `df` by the z-curve over two numeric columns into
    * `numFiles` files at `path`: rank-normalize both dims off a 1-row
    * min/max aggregate, range-repartition on the interleaved z-value,
    * sort within partitions, write parquet. Files then carry tight
    * min/max stats in BOTH dimensions. */
  def clusterWrite(df: DataFrame, colA: String, colB: String,
                   path: String, numFiles: Int, bits: Int = 16): Unit = {
    val mm = df.agg(
      min(col(colA)).as("min_a"), max(col(colA)).as("max_a"),
      min(col(colB)).as("min_b"), max(col(colB)).as("max_b"))
    val z = zValue(
      normalize(col(colA), col("min_a"), col("max_a"), bits),
      normalize(col(colB), col("min_b"), col("max_b"), bits), bits)
    df.crossJoin(broadcast(mm))
      .withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "min_a", "max_a", "min_b", "max_b")
      .write.mode("overwrite").parquet(path)
  }
}
