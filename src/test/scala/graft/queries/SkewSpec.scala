package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted aggregation must be a pure plan rewrite: identical results to
  * the unsalted group-by, two exchanges in the plan (partial + merge). */
class SkewSpec extends SparkSpec {

  test("salted sum/count equals the plain groupBy on a real table") {
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedSumCount(ev, Seq("user_id"),
      Relational.dec(col("value")), xxhash64(col("event_id")), salts = 8)
      .withColumn("total", col("total").cast("double"))
    val plain = ev.groupBy(col("user_id"))
      .agg(sum(Relational.dec(col("value"))).cast("double").as("total"),
        count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salting degenerates gracefully: salts=1 is the plain aggregation") {
    val ev = Tables.events(spark, sf)
    val one = Skew.saltedSumCount(ev, Seq("event_type"), col("value"),
      xxhash64(col("event_id")), salts = 1)
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
    assert(one.exceptAll(plain).count() === 0)
  }

  test("salted equi join equals the plain inner join, including a hot key") {
    import spark.implicits._
    // 1000-row hot key + singleton keys on the fact; dim covers 0..49 so
    // some fact keys (50..59) must drop, proving inner semantics survive.
    val fact = ((1 to 1000).map(i => (7L, i.toLong)) ++
      (0 to 59).map(k => (k.toLong, 10000L + k))).toDF("k", "row_id")
    val dim = (0 to 49).map(k => (k.toLong, s"dim_$k")).toDF("dk", "attr")
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk",
      xxhash64(col("row_id")), salts = 8)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    // the hot key really spreads: its fact rows land on >1 salt value
    val hotSalts = fact.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(hotSalts > 1)
  }

  test("salted equi join keeps rows whose salt source is NULL (ADVICE r05)") {
    import spark.implicits._
    val fact = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "row_id")
      // null out a third of the salt sources — before the coalesce
      // guard these rows silently vanished from the join
      .withColumn("salt_src",
        when(col("row_id") % 3 === 0, lit(null)).otherwise(xxhash64(col("row_id"))))
    val dim = (0 to 4).map(k => (k.toLong, s"d$k")).toDF("dk", "attr")
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk", col("salt_src"), salts = 8)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted equi join with salts=1 degenerates to the plain join") {
    import spark.implicits._
    val fact = (1 to 50).map(i => (i.toLong % 5, i.toLong)).toDF("k", "row_id")
    val dim = (0 to 4).map(k => (k.toLong, s"d$k")).toDF("dk", "attr")
    val one = Skew.saltedEquiJoin(fact, dim, "k", "dk",
      xxhash64(col("row_id")), salts = 1)
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(one.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(one).count() === 0)
  }
}
