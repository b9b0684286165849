package graft.rates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.util.Try
import scala.util.matching.Regex

/** S4: the USD→VND exchange-rate lookup service with the reference's
  * three-step fallback chain and per-date cache
  * (exchange_rate_service.py:24–57): primary XML API → HTML-scrape
  * fallback → constant default `25057.0`, memoized by date string.
  *
  * Transport is injected as plain `String => String` fetchers so the
  * chain is fully unit-testable offline (this container has zero
  * egress — the default fetchers always fail, which engages the
  * default-rate path exactly like the reference's offline behavior,
  * exchange_rate_service.py:54–57). A production deployment passes
  * `java.net.http`-backed fetchers; the parsing below is the same.
  *
  * Driver-side placement mirrors the reference: the rate is resolved
  * once per batch/day on the driver and enters the plan as a literal or
  * a broadcast rates-by-date dimension ([[ratesByDate]], the J6 as-of
  * join input) — never a per-row lookup.
  */
class RateService(
    apiFetch: () => String = RateService.noNetwork,
    webFetch: () => String = RateService.noNetwork) {

  private val cache = TrieMap.empty[String, Double]

  /** Resolved rate for a date (YYYY-MM-DD), with caching + fallback. */
  def rateFor(dateStr: String): Double =
    cache.getOrElseUpdate(dateStr,
      fromApi().orElse(fromWeb()).getOrElse(RateService.DefaultRate))

  /** Step 2: XML API — `<Exrate CurrencyCode="USD" Transfer="25,057"/>`
    * (exchange_rate_service.py:59–93). */
  private[rates] def fromApi(): Option[Double] =
    Try(apiFetch()).toOption.flatMap(RateService.parseApiXml)

  /** Step 3: HTML table scrape — USD row, 4th cell = transfer rate
    * (exchange_rate_service.py:95–137). */
  private[rates] def fromWeb(): Option[Double] =
    Try(webFetch()).toOption.flatMap(RateService.parseWebHtml)

  def cachedRates: Map[String, Double] = cache.toMap
  def clearCache(): Unit = cache.clear()

  /** The broadcast-ready daily-rates dimension for the J6 as-of join
    * (SURVEY §2.6): one row per date, rate resolved through the chain. */
  def ratesByDate(spark: SparkSession, dates: Seq[String]): DataFrame = {
    import spark.implicits._
    dates.map(d => (d, rateFor(d))).toDF("rate_date", "rate")
      .withColumn("rate_date", to_date(col("rate_date")))
  }
}

object RateService {

  /** Reference default rate (exchange_rate_service.py:18). */
  val DefaultRate = 25057.0

  def noNetwork(): String =
    throw new java.io.IOException("no egress in this environment")

  private val ExrateTag: Regex =
    """(?s)<Exrate\b[^>]*>""".r
  private val Attr: Regex = """(\w+)="([^"]*)"""".r

  /** Parse the VCB-style XML payload: the `Transfer` attribute of the
    * `Exrate` element whose `CurrencyCode` is USD, comma-separated
    * thousands. Plain regex — no XML lib in the offline dep set. */
  def parseApiXml(xml: String): Option[Double] =
    ExrateTag.findAllIn(xml).toSeq.iterator
      .map(tag => Attr.findAllMatchIn(tag).map(m => m.group(1) -> m.group(2)).toMap)
      .collectFirst {
        case attrs if attrs.get("CurrencyCode").contains("USD") =>
          attrs.get("Transfer").flatMap(t =>
            Try(t.replace(",", "").toDouble).toOption)
      }.flatten

  private val RowRe: Regex = """(?s)<tr[^>]*>(.*?)</tr>""".r
  private val CellRe: Regex = """(?s)<td[^>]*>(.*?)</td>""".r

  /** Parse the rate table HTML: first row whose first cell is USD,
    * rate from the 4th cell (exchange_rate_service.py:117–128). */
  def parseWebHtml(html: String): Option[Double] =
    RowRe.findAllMatchIn(html)
      .map(r => CellRe.findAllMatchIn(r.group(1))
        .map(_.group(1).replaceAll("<[^>]*>", "").trim).toSeq)
      .collectFirst {
        case cells if cells.length >= 4 && cells.head == "USD" =>
          Try(cells(3).replace(",", "").toDouble).toOption
      }.flatten
}
