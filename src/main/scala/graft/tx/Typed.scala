package graft.tx

import org.apache.spark.sql.{DataFrame, Dataset}

/** The processed transaction as a case class — the typed `Dataset[T]`
  * facade SURVEY §1.4 plans over the fixed 21-column layout.
  *
  * Field names/types mirror [[Enrichment.outputColumns]] exactly;
  * nullable numerics are Options so malformed rows survive the typed
  * boundary. Use the facade where compile-time row shape helps (user
  * code, sinks); the engine's analytics stay Column-based on purpose —
  * typed lambdas (`ds.filter(_.x > 0)`) are opaque to Catalyst and
  * forfeit pushdown + codegen, while `Column` predicates keep both.
  */
case class ProcessedTransaction(
    DateTime_Hour_Key: String, User: Option[Long], Card: String,
    Year: Option[Int], Month: Option[Int], Day: Option[Int], Hour: Option[Int],
    Day_of_Week: String, Is_Weekend: String,
    Amount_USD: Option[Double], Amount_VND: Option[Double], Exchange_Rate: Int,
    Use_Chip: String, Merchant_Name: String, Merchant_City: String,
    Merchant_State: String, Zip: String, MCC: String,
    Errors: String, Is_Fraud: String, Processed_Timestamp: String)

object Typed {

  /** Project an enriched frame to the typed 21-column dataset. */
  def processed(enriched: DataFrame): Dataset[ProcessedTransaction] = {
    val spark = enriched.sparkSession
    import spark.implicits._
    Enrichment.project(enriched).as[ProcessedTransaction]
  }
}
