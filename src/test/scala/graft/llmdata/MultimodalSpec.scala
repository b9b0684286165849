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

  test("resize stub shrinks payloads and rewrites metadata dimensions") {
    val resized = Multimodal.resizeStub(media, targetW = 32, targetH = 32)
    assert(resized.columns.toSeq === media.columns.toSeq)
    val joined = media.select(col("media_id"), length(col("payload")).as("orig"))
      .join(resized.select(col("media_id"), length(col("payload")).as("small"),
        col("meta.width").as("w"), col("meta.height").as("h")), "media_id")
    assert(joined.filter(col("small") > col("orig")).count() === 0)
    assert(joined.filter(col("w") =!= 32 || col("h") =!= 32).count() === 0)
  }

  test("frame sampler emits every stride-th fixed-size frame per media row") {
    val frames = Multimodal.frameSample(media, frameBytes = 100, stride = 2).cache()
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_payload"))
    // no frame exceeds the frame size; every media row yields ≥1 frame
    assert(frames.filter(length(col("frame_payload")) > 100).count() === 0)
    assert(frames.select("media_id").distinct().count() === media.count())
    // sampled count = ceil(n_full_or_partial_frames / stride)
    val counts = media.select(col("media_id"),
      ceil((floor((length(col("payload")) - 1) / 100) + 1) / lit(2.0)).as("want"))
      .join(frames.groupBy("media_id").agg(count(lit(1)).as("got")), "media_id")
    assert(counts.filter(col("want") =!= col("got")).count() === 0)
    frames.unpersist()
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
