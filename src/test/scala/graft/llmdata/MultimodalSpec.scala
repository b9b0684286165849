package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The multimodal plumbing around the stubbed decode: schema shape,
  * partition-parallel batched execution, and agreement between the
  * decoded features and the metadata/payload they derive from. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFrame(spark, sf).cache()

  test("media frame carries binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("format", "size_bytes", "width", "height"))
  }

  test("decode stage preserves cardinality and row identity across batches") {
    val feats = Multimodal.decodeFeatures(media, batchSize = 7).cache()
    assert(feats.count() === media.count())
    assert(feats.select("media_id").distinct().count() === media.count())
    feats.unpersist()
  }

  test("decoded features agree with the payload they were cut from") {
    val feats = Multimodal.decodeFeatures(media)
    val joined = media.join(feats.toDF(), "media_id")
    // n_bytes must equal the binary payload's length, and the metadata
    // width/height must round-trip through the decode stage
    assert(joined.filter(col("n_bytes") =!= length(col("payload"))).count() === 0)
    assert(joined.filter(col("width") =!= col("meta.width") ||
      col("height") =!= col("meta.height")).count() === 0)
  }

  test("stub checksum is deterministic and content-sensitive") {
    val f1 = Multimodal.decodeFeatures(media).select("media_id", "checksum")
    val f2 = Multimodal.decodeFeatures(media).select("media_id", "checksum")
    assert(f1.exceptAll(f2).count() === 0)
    // distinct texts → overwhelmingly distinct checksums (doc corpus has
    // no exact duplicates at this sf; tolerate rare 64-bit collisions)
    val docs = Tables.documents(spark, sf).count()
    assert(f1.select("checksum").distinct().count() >= docs - 2)
  }
}
