package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus interchange formats beyond the parquet test tables.
  *
  * Real training corpora arrive as JSONL shards (one JSON document per
  * line — the lingua franca of every public text dataset) and leave as
  * columnar shards; the loaders here make that boundary explicit and
  * SCHEMA-DECLARED, never inferred: at 100 TB a schema-inference pass
  * is a full extra read of the corpus, and silent type drift between
  * shards (a numeric doc_id in one file, a string in the next) must
  * fail loudly at the scan, not corrupt a join three stages later.
  *
  * Malformed lines follow Spark's PERMISSIVE mode with an explicit
  * corrupt-record column so a dirty shard degrades into an auditable
  * quarantine stream instead of killing the job ([[readDocumentsJsonl]]
  * returns both streams; the caller picks its policy).
  */
object Formats {

  /** The documents-table schema, declared once (TESTDATA.md shape). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", IntegerType),
    StructField("_corrupt", StringType)))

  /** Write a documents frame as JSONL shards (one JSON object per
    * line). `coalesce` bounds the shard count like the reference's
    * sink does; compression stays splittable-friendly (none) so a
    * downstream scan parallelizes per line range. */
  def writeDocumentsJsonl(df: DataFrame, path: String, shards: Int = 1): Unit =
    df.coalesce(shards).write.mode("overwrite").json(path)

  /** Read JSONL documents with the declared schema: well-formed rows
    * and a quarantine stream of raw corrupt lines. Implemented as a
    * text scan + `from_json` rather than the json datasource: the
    * datasource's corrupt-record column cannot be filtered without
    * materializing (Spark's documented restriction), which would force
    * a full-corpus cache this reader has no business holding; the
    * text+parse form keeps both streams lazy and cache-free (the line
    * scan runs once per consumed stream — two cheap passes beat a
    * pinned copy of the corpus). */
  def readDocumentsJsonl(spark: SparkSession,
                         path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), documentsSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
    // a line the parser cannot touch at all yields a NULL struct;
    // partial failures (type drift) populate the corrupt column
    val bad = col("j").isNull || col("j").getField("_corrupt").isNotNull
    val good = parsed.filter(!bad).select(col("j.*")).drop("_corrupt")
    val quarantine = parsed.filter(bad).select(col("value").as("raw_line"))
    (good, quarantine)
  }

  /** ORC interchange — the other columnar format a warehouse boundary
    * speaks (Hive-lineage systems emit ORC the way lakehouse stacks
    * emit parquet). Spark's native ORC reader/writer keeps the same
    * scan-level virtues as the parquet path — column pruning and
    * predicate pushdown into file/stripe/row-group min-max indexes
    * (FormatsSpec asserts `PushedFilters` lands in the ORC scan) — so
    * ingesting an ORC-delivered corpus costs no plan quality. Snappy
    * block compression stays splittable: one 100 TB delivery still
    * fans out per stripe. */
  def writeDocumentsOrc(df: DataFrame, path: String, shards: Int = 1): Unit =
    df.coalesce(shards).write.mode("overwrite").orc(path)

  /** Schema-declared ORC read (same no-inference stance as the JSONL
    * reader; ORC carries its schema in the footer, but DECLARING the
    * expected one makes shard-level type drift fail at the scan). */
  def readDocumentsOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(StructType(documentsSchema.filterNot(_.name == "_corrupt")))
      .orc(path)

  /** Schema-evolution read over a partitioned/sharded parquet dir whose
    * shards were written at DIFFERENT schema versions (the v1 24-col vs
    * v2 21-col situation in the reference, generalized): `mergeSchema`
    * unions the per-file schemas at footer-read time — columns absent
    * in an older shard surface as nulls, no rewrite of old data. The
    * cost (a footer read per file at planning) is why it is opt-in
    * here and off by default in Spark. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
