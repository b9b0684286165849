package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable dense ids must equal the global sort rank, stay contiguous,
  * and never depend on partitioning — all without a single-partition
  * stage. */
class StableIdsSpec extends SparkSpec {

  test("ids are the exact global sort rank on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = StableIds.assign(
      docs.select(col("source"), col("doc_id")),
      Seq(col("source"), col("doc_id")), numPartitions = 4).cache()
    val n = docs.count()
    assert(got.count() === n)
    // contiguous 0..N-1
    val stats = got.agg(min("stable_id"), max("stable_id"),
      countDistinct("stable_id")).collect()(0)
    assert(stats.getLong(0) === 0L && stats.getLong(1) === n - 1 &&
      stats.getLong(2) === n)
    // equals the single-reducer window formulation (fine at test scale)
    val ref = docs.select(col("source"), col("doc_id"))
      .withColumn("stable_id",
        row_number().over(Window.orderBy(col("source"), col("doc_id")))
          .cast("long") - 1)
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("ids are identical across re-runs and different parallelism") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val a = StableIds.assign(docs, Seq(col("source"), col("doc_id")),
      numPartitions = 2)
    val b = StableIds.assign(docs, Seq(col("source"), col("doc_id")),
      numPartitions = 7)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("assignment is distributed: no single-partition stage at any point") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val got = StableIds.assign(docs, Seq(col("doc_id")), numPartitions = 4)
    assert(got.rdd.getNumPartitions === 4)
    // and the PRODUCTION sort path plans a range exchange, never
    // SinglePartition (rangeSorted is exactly what assign executes)
    val plan = StableIds.rangeSorted(docs, Seq(col("doc_id")), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-reducer stage in:\n$plan")
  }

  test("extend stamps a delta with the next contiguous block, never moving old ids") {
    val keys = Tables.documents(spark, sf).select(col("source"), col("doc_id"))
    val sort = Seq(col("source"), col("doc_id"))
    val existing = StableIds.assign(
      keys.filter(col("doc_id") % 4 =!= 0), sort).cache()
    val delta = StableIds.extend(
      existing, keys.filter(col("doc_id") % 4 === 0), sort).cache()
    val nExisting = existing.count()
    val nDelta = delta.count()
    // delta block starts exactly after the existing range, stays contiguous
    val stats = delta.agg(min("stable_id"), max("stable_id"),
      countDistinct("stable_id")).collect()(0)
    assert(stats.getLong(0) === nExisting)
    assert(stats.getLong(1) === nExisting + nDelta - 1)
    assert(stats.getLong(2) === nDelta)
    // the union is a full dense id space with zero collisions
    val all = existing.unionByName(delta)
    assert(all.select("stable_id").distinct().count() === nExisting + nDelta)
    // re-running extend never perturbs the existing assignment
    val again = StableIds.assign(keys.filter(col("doc_id") % 4 =!= 0), sort)
    assert(existing.exceptAll(again).count() === 0)
  }

  test("extend on an empty existing table starts at zero") {
    val keys = Tables.documents(spark, sf).select(col("doc_id"))
    val empty = StableIds.assign(keys.filter(col("doc_id") < 0), Seq(col("doc_id")))
    val delta = StableIds.extend(empty, keys.limit(10), Seq(col("doc_id")))
    val stats = delta.agg(min("stable_id"), max("stable_id")).collect()(0)
    assert(stats.getLong(0) === 0L && stats.getLong(1) === 9L)
  }

  test("empty input yields an empty, correctly-shaped result") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 0)
      .select(col("doc_id"))
    val got = StableIds.assign(docs, Seq(col("doc_id")))
    assert(got.columns.toSeq === Seq("doc_id", "stable_id"))
    assert(got.count() === 0)
  }
}
