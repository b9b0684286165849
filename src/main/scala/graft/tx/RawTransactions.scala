package graft.tx

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic raw-transaction-shaped view over the driver's `events`
  * table, used to exercise the enrichment pipeline + 4-way split against
  * the DuckDB oracle at sf0.01 (the driver provides no transaction
  * parquet, and we must not synthesize our own inputs).
  *
  * Every derived column is a pure function of (event_id, user_id,
  * event_type, value, ts) expressible identically in DuckDB SQL — see
  * [[TxQueries.rawCte]], which MUST stay in lockstep with this view.
  *
  * Injected dirty-data cases (all deterministic on event_id):
  *  - `% 97 == 0`  → 12-digit card (fails the length≥16 valid check)
  *  - `% 89 == 0`  → NULL Amount
  *  - `% 83 == 0`  → "$0.00" Amount (fails the >0 check)
  *  - `% 43 == 0`  → untrimmed error text "  Bad CVV " (exercises trim)
  *  - `% 37 == 0`  → fraud flag "Yes " (untrimmed; overlaps the other
  *                   buckets exactly like the reference's quirk, SURVEY §2.4)
  *  - `% 101 == 0` → unparseable timestamp (→ the Invalid-Date bucket)
  */
object RawTransactions {

  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val tsStr = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss")
    def m(k: Int) = col("event_id") % k === 0
    ev.select(
      col("user_id").as("User"),
      when(m(97), format_string("%012d", lit(453200000000L) + col("user_id")))
        .otherwise(format_string("%016d", lit(4532000000000000L) + col("user_id")))
        .as("Card"),
      year(col("ts")).as("Year"),
      month(col("ts")).as("Month"),
      dayofmonth(col("ts")).as("Day"),
      date_format(col("ts"), "HH:mm:ss").as("Time"),
      when(m(89), lit(null).cast("string"))
        .when(m(83), lit("$0.00"))
        .otherwise(concat(lit("$"), col("value").cast("decimal(18,2)").cast("string")))
        .as("Amount"),
      when(col("event_type") === "click", "Chip Transaction")
        .when(col("event_type") === "view", "Swipe Transaction")
        .when(col("event_type") === "purchase", "Online Transaction")
        .when(col("event_type") === "signup", "Chip Transaction")
        .otherwise("Online Transaction")
        .as("Use Chip"),
      concat(lit("Merchant_"), (col("event_id") % 60).cast("string")).as("Merchant Name"),
      concat(lit("City_"), (col("event_id") % 20).cast("string")).as("Merchant City"),
      concat(lit("ST"), (col("event_id") % 5).cast("string")).as("Merchant State"),
      (lit(10000) + col("event_id") % 89999).cast("string").as("Zip"),
      (lit(5000) + col("event_id") % 100).cast("string").as("MCC"),
      when(m(43), "  Bad CVV ")
        .when(col("event_type") === "error", "Technical Glitch")
        .otherwise("")
        .as("Errors?"),
      when(m(37), "Yes ").otherwise("No").as("Is Fraud?"),
      when(m(101), concat(lit("BAD-"), tsStr)).otherwise(tsStr).as("timestamp")
    )
  }
}
