package graft

import org.apache.spark.sql.functions._

/** SQL front-end parity: the engine is DataFrame-first, but every table
  * registers as a temp view and Spark SQL must produce frame-identical
  * results for representative queries from each family — proving a SQL
  * user gets the same engine (same Catalyst plans, same semantics), not
  * a second implementation. */
class SqlParitySpec extends SparkSpec {

  private def registerViews(): Unit = {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.documents(spark, sf).createOrReplaceTempView("documents")
    Tables.events(spark, sf).createOrReplaceTempView("events")
  }

  test("spark.sql twins equal the DataFrame queries frame-for-frame") {
    registerViews()
    val cases = Seq(
      // relational: grouped agg with computed measures (q1 family)
      queries.Relational.q1PricingSummary(spark, sf) ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          |    AS sum_disc_price,
          |  COUNT(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      // events: conditional counting + ratio (ea1 family)
      queries.EventAnalytics.ea1DailyErrorRate(spark, sf) ->
        """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
          |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
          |  COUNT(CASE WHEN event_type = 'error' THEN 1 END)
          |    * CAST(100.0 AS DOUBLE) / COUNT(*) AS error_rate_pct
          |FROM events GROUP BY CAST(ts AS DATE) ORDER BY event_date""".stripMargin,
      // text: explode + top-k (txt_term_topk family)
      llmdata.TextAnalysis.termTopK(spark, sf, 20) ->
        """SELECT term, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
          |FROM (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
          |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin)
    cases.zipWithIndex.foreach { case ((df, sql), i) =>
      val viaSql = spark.sql(sql)
      assert(df.schema.fieldNames.toSeq === viaSql.schema.fieldNames.toSeq,
        s"case $i: column names differ")
      assert(df.exceptAll(viaSql).count() === 0, s"case $i: df has extra rows")
      assert(viaSql.exceptAll(df).count() === 0, s"case $i: sql has extra rows")
    }
  }

  test("extension sketch functions are first-class in SQL: ea28 twin via qsample_*") {
    registerViews()
    val df = queries.EventAnalytics.ea28QuantileRollup(spark, sf)
    // the full stored-sketch rollup written as plain SQL — build, merge,
    // and probe are ordinary function calls for a SQL user
    val viaSql = spark.sql(
      """SELECT period,
        |  qsample_quantile(wsk, 0.5d) AS p50,
        |  qsample_quantile(wsk, 0.9d) AS p90,
        |  qsample_quantile(wsk, 0.99d) AS p99,
        |  n
        |FROM (
        |  SELECT TRUNC(day, 'week') AS period,
        |    qsample_merge(sk) AS wsk, SUM(n_p) AS n
        |  FROM (
        |    SELECT CAST(ts AS DATE) AS day,
        |      qsample_sketch(event_id, value) AS sk, COUNT(*) AS n_p
        |    FROM events GROUP BY CAST(ts AS DATE))
        |  GROUP BY TRUNC(day, 'week'))
        |ORDER BY period""".stripMargin)
    assert(df.schema.fieldNames.toSeq === viaSql.schema.fieldNames.toSeq)
    assert(df.exceptAll(viaSql).count() === 0)
    assert(viaSql.exceptAll(df).count() === 0)
  }

  test("passage chunking twin via the SQL sequence/slice surface") {
    registerViews()
    val df = llmdata.TextAnalysis.passageChunks(spark, sf)
    val viaSql = spark.sql(
      """SELECT doc_id, CAST(start / 24 AS INT) AS chunk_idx, start,
        |  LEAST(32, n - start) AS n_toks,
        |  array_join(slice(t, start + 1, 32), ' ') AS chunk
        |FROM (
        |  SELECT doc_id, t, n,
        |    explode(sequence(0, GREATEST(n - 32 + 24 - 1, 0), 24)) AS start
        |  FROM (SELECT doc_id, split(text, ' ') AS t, size(split(text, ' ')) AS n
        |        FROM documents))""".stripMargin)
    assert(df.schema.fieldNames.toSeq === viaSql.schema.fieldNames.toSeq)
    assert(df.exceptAll(viaSql).count() === 0)
    assert(viaSql.exceptAll(df).count() === 0)
  }
}
