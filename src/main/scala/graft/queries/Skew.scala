package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: the two-phase salted group-by
  * (SURVEY "salting for skew"; VERDICT r01 watch item on hot keys).
  *
  * A plain `groupBy(key)` sends every row of a hot key to ONE reducer —
  * at 100 TB a single celebrity user/merchant can hold a stage hostage.
  * Salting splits each key into `salts` sub-groups for the first
  * (partial) aggregation, so the hot key's rows spread over `salts`
  * reducers, then merges the partials in a second, tiny aggregation over
  * (distinct keys × salts) rows.
  *
  * Only algebraic aggregates (sum/count/min/max, and avg as sum÷count)
  * can be merged this way. The salt source must be a deterministic
  * row-level expression (e.g. `xxhash64` of a unique id) — runtime
  * randomness would break retry idempotence on task re-execution.
  *
  * Note AQE's skew-join handling does NOT cover aggregations — salting
  * remains the tool for skewed group-bys.
  */
object Skew {

  /** Sum + count of `value` per `keys`, salted over `salts` partial
    * groups derived from `saltFrom`. Result is exactly equal to the
    * unsalted `groupBy(keys).agg(sum, count)` (SkewSpec property). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     saltFrom: Column, salts: Int): DataFrame = {
    require(!df.columns.contains("_salt"),
      "saltedSumCount: input already has a _salt column — it would be " +
        "overwritten and dropped, corrupting the caller's data")
    val keyCols = keys.map(col)
    df.withColumn("_salt", pmod(saltFrom, lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(value).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial_sum")).as("total"), sum(col("_partial_n")).as("n"))
  }

  /** Salted shuffle EQUI JOIN — the join-side twin of [[saltedSumCount]]
    * for the case AQE's `OptimizeSkewedJoin` cannot help: a hot fact key
    * against a dimension too large to broadcast, where one reducer would
    * receive the entire hot key's rows. The fact side gets a
    * deterministic salt in [0, salts); the dimension side is REPLICATED
    * `salts`× (one copy per salt value) so every (key, salt) bucket can
    * join locally — the hot key's rows spread over `salts` reducers at
    * the cost of a `salts`× inflation of the (much smaller) dimension.
    *
    * Result is row-for-row equal to `fact.join(dim, factKey === dimKey)`
    * (inner; SkewSpec property). The salt source must be deterministic
    * per fact row (e.g. `xxhash64` of a unique id) for retry idempotence;
    * a NULL salt coalesces to bucket 0 (a null `_salt` equality would
    * silently DROP the row, breaking plain-join equality — the null
    * rows all landing in one bucket is the fallback's only cost).
    * The dimension is hinted `shuffle_hash`: replication already priced
    * the shuffle, and a broadcast of dim×salts would defeat the point. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, saltFrom: Column, salts: Int): DataFrame = {
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "saltedEquiJoin: an input already has a _salt column — it would be " +
        "overwritten and dropped, breaking plain-join equality")
    val saltedFact =
      fact.withColumn("_salt", coalesce(pmod(saltFrom, lit(salts)), lit(0)))
    val repDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .hint("shuffle_hash")
    saltedFact
      .join(repDim, saltedFact(factKey) === repDim(dimKey) &&
        saltedFact("_salt") === repDim("_salt"))
      .drop("_salt")
  }
}
