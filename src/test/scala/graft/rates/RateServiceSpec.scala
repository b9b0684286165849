package graft.rates

import graft.SparkSpec

/** S4 fallback-chain and cache semantics (exchange_rate_service.py:24–57). */
class RateServiceSpec extends SparkSpec {

  private val apiXml =
    """<ExrateList><DateTime>8/12/2026</DateTime>
      |<Exrate CurrencyCode="EUR" Buy="28,000" Transfer="28,100" Sell="29,000"/>
      |<Exrate CurrencyCode="USD" Buy="25,310" Transfer="25,340.50" Sell="25,680"/>
      |</ExrateList>""".stripMargin

  private val webHtml =
    """<table id="rates"><tr><th>Code</th></tr>
      |<tr><td>EUR</td><td>x</td><td>x</td><td>28,100</td></tr>
      |<tr><td>USD</td><td>25,310</td><td>n/a</td><td>25,290</td></tr>
      |</table>""".stripMargin

  test("primary path: API XML transfer rate wins") {
    val svc = new RateService(apiFetch = () => apiXml, webFetch = () => webHtml)
    assert(svc.rateFor("2026-08-12") === 25340.50)
  }

  test("fallback 1: API failure falls through to the web scrape") {
    val svc = new RateService(webFetch = () => webHtml) // api throws
    assert(svc.rateFor("2026-08-12") === 25290.0)
  }

  test("fallback 2: both transports down engages the default 25057") {
    val svc = new RateService() // both throw (offline container)
    assert(svc.rateFor("2026-08-12") === RateService.DefaultRate)
  }

  test("unparseable payloads fall through like transport errors") {
    val svc = new RateService(
      apiFetch = () => "<ExrateList><Exrate CurrencyCode=\"EUR\" Transfer=\"1\"/></ExrateList>",
      webFetch = () => "<table><tr><td>EUR</td></tr></table>")
    assert(svc.rateFor("2026-08-12") === RateService.DefaultRate)
  }

  test("per-date cache: one resolution per date, hits served from cache") {
    var calls = 0
    val svc = new RateService(apiFetch = () => { calls += 1; apiXml })
    svc.rateFor("2026-08-11"); svc.rateFor("2026-08-11"); svc.rateFor("2026-08-11")
    assert(calls === 1)
    svc.rateFor("2026-08-12")
    assert(calls === 2)
    assert(svc.cachedRates === Map("2026-08-11" -> 25340.5, "2026-08-12" -> 25340.5))
    svc.clearCache()
    assert(svc.cachedRates.isEmpty)
  }

  test("ratesByDate builds the broadcast as-of dimension (J6 input)") {
    val svc = new RateService(apiFetch = () => apiXml)
    val df = svc.ratesByDate(spark, Seq("2026-08-11", "2026-08-12"))
    assert(df.columns.toSeq === Seq("rate_date", "rate"))
    assert(df.count() === 2)
    assert(df.schema("rate_date").dataType.typeName === "date")
  }
}
