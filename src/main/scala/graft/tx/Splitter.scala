package graft.tx

import org.apache.spark.sql.DataFrame
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

  /** F1: rows whose (trimmed) Errors column has content — regardless of
    * anything else (:255–256). */
  def errors(processed: DataFrame): DataFrame =
    processed.filter(col("Errors").isNotNull && col("Errors") =!= "")

  /** F2: fraud rows (:259–260); spec requirements.md:6–7 (fraud ⇒
    * unsuccessful, not processed further). */
  def fraud(processed: DataFrame): DataFrame =
    processed.filter(col("Is_Fraud") === "Yes")

  /** F3: structurally valid rows (:263–268). Does NOT exclude fraud or
    * error rows — the reference quirk. */
  def valid(processed: DataFrame): DataFrame =
    processed
      .filter(col("User").isNotNull)
      .filter(col("Card").isNotNull)
      .filter(length(col("Card")) >= 16)
      .filter(col("Amount_USD").isNotNull && col("Amount_USD") > 0)
      .filter(col("is_valid_date") === true)

  /** F4: the complement bucket — not error, not fraud, but structurally
    * bad — with the derived `invalid_reason` (:271–281). */
  def invalid(processed: DataFrame): DataFrame =
    processed
      .filter(col("Errors").isNull || col("Errors") === "")
      .filter(col("Is_Fraud") === "No")
      .filter(col("Amount_USD").isNull || col("Amount_USD") <= 0 ||
        length(col("Card")) < 16 || col("is_valid_date") === false)
      .withColumn("invalid_reason",
        when(col("is_valid_date") === false, lit("Invalid Date"))
          .otherwise(lit("Data format invalid or missing")))
}
