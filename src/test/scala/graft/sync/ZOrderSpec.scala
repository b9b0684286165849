package graft.sync

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Gates for the z-order clustering layout: bit-interleave correctness
  * and the MEASURED data-skipping property — a 2-D range predicate over
  * the z-clustered layout must touch a fraction of the files the
  * natural (insertion-order) layout touches. */
class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    val rows = Seq((3L, 0L), (0L, 3L), (1L, 1L), (5L, 2L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a=0b11 → bits 0,2 ⇒ 5; b=0b11 → bits 1,3 ⇒ 10
    assert(rows((3L, 0L)) === 5L)
    assert(rows((0L, 3L)) === 10L)
    assert(rows((1L, 1L)) === 3L)
    // a=0b101 → bits 0,4 ⇒ 17; b=0b10 → bit 3 ⇒ 8
    assert(rows((5L, 2L)) === 25L)
  }

  test("zValue is monotone within a quadrant: higher halves sort after lower") {
    import spark.implicits._
    // every point with both coords in the upper half of a 2^4 space has
    // a larger z than every point with both in the lower half
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val zs = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lowMax = zs.filter(t => t._1 < 8 && t._2 < 8).map(_._3).max
    val highMin = zs.filter(t => t._1 >= 8 && t._2 >= 8).map(_._3).min
    assert(lowMax < highMin)
  }

  test("z-clustered layout prunes files for a 2-D range predicate; natural layout cannot") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), hour(col("ts")).as("hh"),
        col("value"))
    val base = Files.createTempDirectory("graft-z").toString
    val nFiles = 16
    // natural layout: insertion order (event_id ~ time order, user random)
    ev.repartitionByRange(nFiles, col("event_id"))
      .write.mode("overwrite").parquet(s"$base/natural")
    ZOrder.clusterWrite(ev, "user_id", "hh", s"$base/zorder", nFiles)

    val maxUser = ev.agg(max(col("user_id"))).collect()(0).getLong(0)
    def filesTouched(path: String): Long = {
      // files contributing ANY row to a quarter-range predicate on BOTH
      // dims — with per-file min/max stats this is exactly the set a
      // stats-based reader must open
      spark.read.parquet(path)
        .filter(col("user_id") <= maxUser / 4 && col("hh") <= 5)
        .select(input_file_name().as("f")).distinct().count()
    }
    val zTouched = filesTouched(s"$base/zorder")
    val natTouched = filesTouched(s"$base/natural")
    // same rows either way — layout must not change the answer
    val zRows = spark.read.parquet(s"$base/zorder")
      .filter(col("user_id") <= maxUser / 4 && col("hh") <= 5).count()
    val natRows = spark.read.parquet(s"$base/natural")
      .filter(col("user_id") <= maxUser / 4 && col("hh") <= 5).count()
    assert(zRows === natRows)
    assert(zRows > 0, "predicate must be non-vacuous")
    // the measured locality claim
    assert(zTouched * 2 <= natTouched,
      s"z-order touched $zTouched of $nFiles files vs natural $natTouched")
  }
}
