package graft.tx

import org.apache.spark.sql.types._

/** Schemas for the credit-card-transaction domain (SURVEY.md §1).
  *
  * Mirrors the reference's explicitly-declared streaming input schema
  * (spark_streaming_consumer.py:154-175): 16 nullable fields, `Amount`
  * deliberately StringType because values carry a `$` prefix and
  * thousands separators ("$2,500.00"), plus the producer-added ISO-8601
  * `timestamp` string (pos_simulator.py:131).
  */
object TxSchema {

  /** Raw Kafka/CSV message schema — the 15 CSV columns + producer `timestamp`. */
  val raw: StructType = StructType(Seq(
    StructField("User", LongType),
    StructField("Card", StringType),
    StructField("Year", IntegerType),
    StructField("Month", IntegerType),
    StructField("Day", IntegerType),
    StructField("Time", StringType),
    StructField("Amount", StringType), // "$125.50" — cleaned by P3
    StructField("Use Chip", StringType),
    StructField("Merchant Name", StringType),
    StructField("Merchant City", StringType),
    StructField("Merchant State", StringType),
    StructField("Zip", StringType),
    StructField("MCC", StringType),
    StructField("Errors?", StringType),
    StructField("Is Fraud?", StringType),
    StructField("timestamp", StringType) // ISO-8601, producer-added
  ))

  /** The 15-column CSV file schema (no producer timestamp). */
  val rawCsv: StructType = StructType(raw.fields.dropRight(1))
}
