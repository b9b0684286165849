package graft.tx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 4-way validation split, F1–F4 of SURVEY.md §2.4
  * (spark_streaming_consumer.py:254–283).
  *
  * The four buckets are deliberately NOT a partition — semantics quirk
  * preserved from the reference: a fraud row with valid fields appears in
  * both `fraud` and `valid`; an error row that is also fraud appears in
  * both `errors` and `fraud`. Only `invalid` excludes error/fraud rows.
  * SplitterSpec asserts both the overlap and the cover property
  * (every row lands in ≥1 bucket).
  */
object Splitter {

  /** F1 predicate: the (trimmed) Errors column has content — regardless
    * of anything else (:255–256). */
  val isError: Column = col("Errors").isNotNull && col("Errors") =!= ""

  /** F2 predicate: fraud rows (:259–260); spec requirements.md:6–7. */
  val isFraud: Column = col("Is_Fraud") === "Yes"

  /** F3 predicate: structurally valid (:263–268). Does NOT exclude
    * fraud or error rows — the reference quirk. */
  val isValid: Column =
    col("User").isNotNull && col("Card").isNotNull &&
      length(col("Card")) >= 16 &&
      col("Amount_USD").isNotNull && col("Amount_USD") > 0 &&
      col("is_valid_date") === true

  /** F4 predicate: not error, not fraud, but structurally bad (:271–278). */
  val isInvalid: Column =
    (col("Errors").isNull || col("Errors") === "") &&
      col("Is_Fraud") === "No" &&
      (col("Amount_USD").isNull || col("Amount_USD") <= 0 ||
        length(col("Card")) < 16 || col("is_valid_date") === false)

  def errors(processed: DataFrame): DataFrame = processed.filter(isError)

  def fraud(processed: DataFrame): DataFrame = processed.filter(isFraud)

  def valid(processed: DataFrame): DataFrame = processed.filter(isValid)

  /** F4 with the derived `invalid_reason` (:279–281). */
  def invalid(processed: DataFrame): DataFrame =
    processed
      .filter(isInvalid)
      .withColumn("invalid_reason",
        when(col("is_valid_date") === false, lit("Invalid Date"))
          .otherwise(lit("Data format invalid or missing")))
}
