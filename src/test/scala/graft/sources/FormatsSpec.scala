package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JSONL round-trip parity, corrupt-line quarantine, and mergeSchema
  * evolution — the corpus interchange boundary. */
class FormatsSpec extends SparkSpec {

  test("documents survive a JSONL round-trip byte-for-byte") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    Formats.writeDocumentsJsonl(docs, dir)
    val (good, quarantine) = Formats.readDocumentsJsonl(spark, dir)
    assert(quarantine.count() === 0)
    assert(good.count() === docs.count())
    assert(good.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(good).count() === 0)
  }

  test("corrupt JSONL lines quarantine instead of failing or corrupting rows") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString + "/docs"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/shard.jsonl"),
      """{"doc_id": 1, "text": "good row", "lang": "en", "source": "s", "n_chars": 8}
        |this is not json at all
        |{"doc_id": "NOT_A_NUMBER", "text": "type drift", "lang": "en", "source": "s", "n_chars": 10}
        |{"doc_id": 2, "text": "another good row", "lang": "en", "source": "s", "n_chars": 16}
        |""".stripMargin)
    val (good, quarantine) = Formats.readDocumentsJsonl(spark, dir)
    assert(good.count() === 2)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L))
    // both the non-JSON line and the type-drift line land in quarantine
    assert(quarantine.count() === 2)
    val raws = quarantine.collect().map(_.getString(0))
    assert(raws.exists(_.contains("not json")))
    assert(raws.exists(_.contains("NOT_A_NUMBER")))
  }

  test("mergeSchema reads v1+v2 shards as one table, old shards null-filling new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString + "/t"
    // v1 shard: no quality column
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    // v2 shard: adds quality
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = Formats.readMerged(spark, dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "quality"))
    assert(merged.count() === 3)
    assert(merged.filter(col("quality").isNull).count() === 2)
    assert(merged.filter(col("doc_id") === 3L).select("quality")
      .collect()(0).getDouble(0) === 0.9)
  }

  test("documents survive an ORC round-trip with pushdown reaching the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    Formats.writeDocumentsOrc(docs, dir)
    val back = Formats.readDocumentsOrc(spark, dir)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
    // predicate pushdown + column pruning must land in the ORC scan
    val q = back.filter(col("doc_id") < 100).select("doc_id", "source")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"),
      s"ORC scan lost the pushdown:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"ORC scan reads more than the projection:\n$plan")
  }
}
