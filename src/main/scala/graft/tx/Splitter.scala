package graft.tx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 4-way validation split, F1–F4 of SURVEY.md §2.4
  * (spark_streaming_consumer.py:254–283).
  *
  * The four buckets are deliberately NOT a partition — semantics quirks
  * preserved from the reference:
  *  - OVERLAP: a fraud row with valid fields appears in both `fraud`
  *    and `valid`; an error row that is also fraud appears in both
  *    `errors` and `fraud`. Only `invalid` excludes error/fraud rows.
  *  - DROP-THROUGH: a row with NULL `User` or NULL `Card` whose other
  *    fields are clean lands in NO bucket at all — F3 requires the
  *    fields non-null, while F4's structural disjunction
  *    (`:274–277`) never tests them (`length(NULL) < 16` is NULL under
  *    three-valued logic), so such rows silently vanish from every
  *    sink. Behavior-compat: reproduced, not "fixed".
  * SplitterSpec asserts the overlap; SplitterPropsSpec asserts the
  * cover-except-drop-through property over generated dirty rows.
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
