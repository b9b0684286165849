package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY §5.2-3) of the split semantics over
  * adversarial generated rows — dirty amounts, short/null cards,
  * unparseable timestamps, untrimmed flags.
  *
  * Domain assumption carried from the reference: `Is Fraud?` trims to
  * exactly "Yes" or "No" (its CSV contract). The 4-bucket cover
  * property below is only guaranteed under that domain — a third flag
  * value would fall through every bucket by construction (F4 requires
  * Is_Fraud='No').
  */
class SplitterPropsSpec extends SparkSpec {

  private val cardGen: Gen[String] = Gen.oneOf(
    Gen.const(null: String),
    Gen.numStr.map(_.take(12).padTo(12, '0')), // too short
    Gen.numStr.map(_.take(16).padTo(16, '4')), // valid length
    Gen.numStr.map(_.take(19).padTo(19, '9')))
  private val amountGen: Gen[String] = Gen.oneOf(
    Gen.const(null: String),
    Gen.const("$0.00"),
    Gen.const("junk"),
    Gen.chooseNum(1, 999999).map(c => f"$$${c / 100}%,d.${c % 100}%02d"),
    Gen.chooseNum(1, 9999).map(c => f"-$$${c / 100}%d.${c % 100}%02d"))
  private val errorsGen: Gen[String] = Gen.oneOf(
    null, "", "Bad CVV", "  Bad Expiration ", "Technical Glitch")
  private val fraudGen: Gen[String] = Gen.oneOf("Yes", "No", "Yes ", " No")
  private val tsGen: Gen[String] = Gen.oneOf(
    Gen.const(null: String),
    Gen.const("not-a-timestamp"),
    for {
      d <- Gen.chooseNum(1, 28); h <- Gen.chooseNum(0, 23)
    } yield f"2024-02-$d%02dT$h%02d:30:00")

  private val rowGen: Gen[Row] = for {
    user <- Gen.option(Gen.chooseNum(0L, 50L))
    card <- cardGen; amount <- amountGen
    errors <- errorsGen; fraud <- fraudGen; ts <- tsGen
  } yield Row(user.map(Long.box).orNull, card, 2024, 2, 1, "12:00:00",
    amount, "Chip Transaction", "M", "C", "ST", "10000", "5000",
    errors, fraud, ts)

  private def enrich(rows: List[Row]) =
    Enrichment.enrich(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), TxSchema.raw),
      clock = to_timestamp(lit("2024-06-01 00:00:00")))

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: F1∪F2∪F3∪F4 covers every row except the reference's null-User/Card drop-through") {
    // The reference's F4 never tests User/Card for null (length(NULL)<16
    // is NULL), so clean rows with a null id field land in NO bucket —
    // see Splitter's DROP-THROUGH note. The cover property holds exactly
    // on the complement, and every uncovered row must be a drop-through.
    checkProp(Prop.forAll(Gen.listOfN(60, rowGen)) { rows =>
      rows.isEmpty || {
        val p = enrich(rows).cache()
        try {
          val uncovered = p.filter(!(Splitter.isError || Splitter.isFraud ||
            Splitter.isValid || Splitter.isInvalid))
          val coveredHolds = uncovered
            .filter(col("User").isNotNull && col("Card").isNotNull)
            .count() == 0L
          val dropThroughShape = uncovered.filter(!(
            (col("User").isNull || col("Card").isNull) &&
              col("Amount_USD").isNotNull && col("Amount_USD") > 0 &&
              col("is_valid_date") === true)).count() == 0L
          coveredHolds && dropThroughShape
        } finally { p.unpersist(); () }
      }
    })
  }

  test("property: the invalid bucket never overlaps error or fraud rows") {
    checkProp(Prop.forAll(Gen.listOfN(60, rowGen)) { rows =>
      rows.isEmpty || {
        val p = enrich(rows)
        Splitter.invalid(p).filter(Splitter.isError || Splitter.isFraud)
          .count() == 0L
      }
    })
  }

  test("property: one-pass conditional counts equal per-bucket filter counts") {
    checkProp(Prop.forAll(Gen.listOfN(60, rowGen)) { rows =>
      rows.isEmpty || {
        val p = enrich(rows).cache()
        try {
          val onePass = p.agg(
            count(when(Splitter.isError, 1)),
            count(when(Splitter.isFraud, 1)),
            count(when(Splitter.isValid, 1)),
            count(when(Splitter.isInvalid, 1))).collect()(0)
          (onePass.getLong(0), onePass.getLong(1), onePass.getLong(2), onePass.getLong(3)) ==
            ((Splitter.errors(p).count(), Splitter.fraud(p).count(),
              Splitter.valid(p).count(), Splitter.invalid(p).count()))
        } finally p.unpersist()
      }
    })
  }

  test("property: P3 currency clean recovers the formatted amount exactly") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.listOfN(50, Gen.chooseNum(1L, 99999999L))) { cents =>
      cents.isEmpty || {
        val df = cents.map(c => (c, f"$$${c / 100}%,d.${c % 100}%02d"))
          .toDF("cents", "Amount")
          .withColumn("usd", expr("try_cast(regexp_replace(Amount, '[$,]', '') AS double)"))
        df.filter(col("usd") =!= col("cents") / 100.0).count() == 0L
      }
    })
  }

  test("property: rollup grand total equals the sum of leaf totals") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(80,
      for { y <- Gen.chooseNum(2022, 2024); m <- Gen.chooseNum(1, 3)
            v <- Gen.chooseNum(1L, 1000L) } yield (y, m, v))
    checkProp(Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val r = rows.toDF("y", "m", "v")
          .rollup(col("y"), col("m")).agg(sum(col("v")).as("t"))
          .collect()
        val leaves = r.filter(x => !x.isNullAt(0) && !x.isNullAt(1)).map(_.getLong(2))
        val years = r.filter(x => !x.isNullAt(0) && x.isNullAt(1)).map(_.getLong(2))
        val grand = r.filter(x => x.isNullAt(0) && x.isNullAt(1)).map(_.getLong(2))
        grand.sameElements(Array(rows.map(_._3).sum)) &&
          years.sum == leaves.sum && leaves.sum == rows.map(_._3).sum
      }
    })
  }
}
