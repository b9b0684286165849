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
    // the doc corpus' text payloads are not images: every row must take
    // the stub path, where n_bytes equals the binary payload's length
    // and the metadata width/height round-trip through the decode stage
    assert(joined.filter(col("decoded")).count() === 0)
    assert(joined.filter(col("n_bytes") =!= length(col("payload"))).count() === 0)
    assert(joined.filter(col("width") =!= col("meta.width") ||
      col("height") =!= col("meta.height")).count() === 0)
  }

  private def encode(fmt: String, w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 1013) & 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt encoder")
    baos.toByteArray
  }

  test("real PNG/BMP payloads decode to true pixel dimensions, not metadata") {
    import spark.implicits._
    val rows = Seq(
      (1L, encode("png", 7, 5, 1), "png"),
      (2L, encode("png", 33, 9, 2), "png"),
      (3L, encode("bmp", 16, 4, 3), "bmp"),
      (4L, "definitely not an image".getBytes("UTF-8"), "txt"))
    // metadata deliberately carries WRONG dimensions (0×0): the decoder
    // must report what the pixels say, not what the metadata claims
    val frame = rows.toDF("media_id", "payload", "fmt")
      .select(col("media_id"), col("payload"),
        struct(col("fmt").as("format"), length(col("payload")).cast("long").as("size_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val feats = Multimodal.decodeFeatures(frame, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).width === 7 && feats(1L).height === 5)
    assert(feats(2L).decoded && feats(2L).width === 33 && feats(2L).height === 9)
    assert(feats(3L).decoded && feats(3L).width === 16 && feats(3L).height === 4)
    assert(!feats(4L).decoded && feats(4L).width === 0)
    // pixel checksums are content-sensitive (distinct images differ) and
    // format-independent in spirit: same raster encoded as PNG vs BMP
    // must checksum identically — the feature reads pixels, not bytes
    assert(Set(feats(1L).checksum, feats(2L).checksum, feats(3L).checksum).size === 3)
    val again = Multimodal.decodeFeatures(frame, batchSize = 3)
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert((1L to 4L).forall(id => again(id) === feats(id).checksum))
    val crossFmt = Seq(
      (10L, encode("png", 11, 6, 9), "png"),
      (11L, encode("bmp", 11, 6, 9), "bmp"))
      .toDF("media_id", "payload", "fmt")
      .select(col("media_id"), col("payload"),
        struct(col("fmt").as("format"), lit(0L).as("size_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val cf = Multimodal.decodeFeatures(crossFmt).collect().map(f => f.media_id -> f).toMap
    assert(cf(10L).decoded && cf(11L).decoded)
    assert(cf(10L).checksum === cf(11L).checksum,
      "identical rasters must yield identical pixel checksums across formats")
  }

  test("channel stats: solid colors, checkerboards, and degenerates measure exactly") {
    import spark.implicits._
    def solid(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def checker(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val frame = Seq(
      (1L, solid(0xFF0000, 4, 3)),       // pure red: degenerate
      (2L, solid(0x808080, 5, 5)),       // mid gray: degenerate
      (3L, checker(4, 4)),               // black/white: high variance
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(lit("png").as("format"), lit(0L).as("size_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val s = Multimodal.channelStats(frame, batchSize = 2)
      .collect().map(c => c.media_id -> c).toMap
    assert(s(1L).decoded && s(1L).n_px === 12L)
    assert(s(1L).mean_r === 255.0 && s(1L).mean_g === 0.0 && s(1L).mean_b === 0.0)
    assert(s(1L).degenerate && s(1L).var_luma === 0.0)
    assert(s(2L).degenerate && s(2L).mean_r === 128.0 && s(2L).mean_luma === 128.0)
    // even checkerboard: half white half black, mean luma exactly 127.5
    assert(s(3L).decoded && !s(3L).degenerate)
    assert(s(3L).mean_luma === 127.5 && s(3L).var_luma === 127.5 * 127.5)
    assert(!s(4L).decoded && s(4L).n_px === 0L)
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

  test("real WAV payloads decode to true sample rate / frames / duration") {
    import spark.implicits._
    def wav(sampleRate: Float, nFrames: Int, seed: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val pcm = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val v = (math.sin(i * 0.05 + seed) * 12000).toInt
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val frame = Seq(
      (1L, wav(8000f, 4000, 1)),
      (2L, wav(16000f, 1600, 2)),
      (3L, "not audio at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val feats = Multimodal.audioFeatures(frame, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).sample_rate === 8000f &&
      feats(1L).channels === 1 && feats(1L).n_frames === 4000L)
    assert(math.abs(feats(1L).duration_s - 0.5) < 1e-9)
    assert(feats(2L).decoded && feats(2L).sample_rate === 16000f &&
      feats(2L).n_frames === 1600L && math.abs(feats(2L).duration_s - 0.1) < 1e-9)
    assert(!feats(3L).decoded && feats(3L).n_bytes === 16)
  }

  test("doc-corpus payloads all take the audio stub path (no false decodes)") {
    val feats = Multimodal.audioFeatures(media)
    assert(feats.filter(col("decoded")).count() === 0)
    assert(feats.count() === media.count())
  }

  private def animatedGif(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val palette = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF, 0xFF00FF)
      for (f <- 0 until nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, palette(f % palette.length))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  test("animated GIF payloads yield real per-frame dimensions from the sampler") {
    import spark.implicits._
    val frame = Seq(
      (1L, animatedGif(9, 7, 6)),
      (2L, "plain text payload that is not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.sampleFrames(frame, stride = 2, frameBytes = 10)
      .collect().groupBy(_.media_id)
    val gifFrames = out(1L).sortBy(_.frame_idx)
    assert(gifFrames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(gifFrames.forall(f => f.decoded && f.width === 9 && f.height === 7))
    // solid-color frames from a rotating palette → distinct pixel checksums
    assert(gifFrames.map(_.checksum).distinct.length === 3)
    val stubFrames = out(2L).sortBy(_.frame_idx)
    assert(stubFrames.forall(!_.decoded))
    // 46 bytes at 10 bytes/chunk → chunks 0..4, stride 2 keeps 0,2,4
    assert(stubFrames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
  }

  test("real resize re-encodes actual pixels at the target size") {
    import spark.implicits._
    val frame = Seq(
      (1L, encode("png", 20, 10, 5), "png"),
      (2L, "not an image".getBytes("UTF-8"), "txt"))
      .toDF("media_id", "payload", "fmt")
      .select(col("media_id"), col("payload"),
        struct(col("fmt").as("format"), length(col("payload")).cast("long").as("size_bytes"),
          lit(20).as("width"), lit(10).as("height")).as("meta"))
    val resized = Multimodal.resizeImages(frame, targetW = 8, targetH = 6)
    assert(resized.columns.toSeq === Seq("media_id", "payload", "meta"))
    val rows = resized.collect().map(r => r.getLong(0) -> r).toMap
    // the image row really resized: payload decodes to an 8×6 PNG
    val pngBytes = rows(1L).getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
    assert(img != null && img.getWidth === 8 && img.getHeight === 6)
    assert(rows(1L).getStruct(2).getString(0) === "png")
    // the text row took the stub cut: format unchanged, payload shrunk
    assert(rows(2L).getStruct(2).getString(0) === "txt")
    assert(rows(2L).getAs[Array[Byte]](1).length <= "not an image".length)
    assert(rows(2L).getStruct(2).getInt(2) === 8 && rows(2L).getStruct(2).getInt(3) === 6)
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

  test("format sniff classifies real payloads by magic bytes, no decode") {
    import spark.implicits._
    def gzipped(s: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(baos)
      gz.write(s.getBytes("UTF-8")); gz.close()
      baos.toByteArray
    }
    def wav(nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](nFrames * 2)), fmt,
        nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val rows = Seq(
      (1L, encode("png", 5, 4, 1), "png"),
      (2L, encode("jpg", 6, 3, 2), "jpeg"),
      (3L, encode("gif", 4, 4, 3), "gif"),
      (4L, encode("bmp", 3, 3, 4), "bmp"),
      (5L, wav(100), "wav"),
      (6L, gzipped("compressed text payload"), "gzip"),
      (7L, "plain text payload".getBytes("UTF-8"), "other"),
      (8L, Array[Byte](), "other"),
      // a RIFF header WITHOUT the WAVE tag must NOT classify as wav
      (9L, "RIFF1234AVI LIST".getBytes("UTF-8"), "other"))
    val got = rows.toDF("media_id", "payload", "expected")
      .withColumn("sniffed", Multimodal.sniffFormat(col("payload")))
    assert(got.filter(col("sniffed") =!= col("expected")).count() === 0)
    // sniffing is detection, not decoding: the gzip payload classifies
    // even though no JVM image/audio codec can open it
    assert(got.filter(col("media_id") === 6L && col("sniffed") === "gzip")
      .count() === 1)
  }

  private def noisePng(seed: Long, perturb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      var z = seed * 1000003L + y * 37L + x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      img.setRGB(x, y, (z & 0xFFFFFF).toInt)
    }
    if (perturb > 0) for (i <- 0 until perturb) {
      val px = (i * 7) % 32; val py = (i * 11) % 32
      val old = img.getRGB(px, py)
      val r = math.min(255, ((old >> 16) & 0xFF) + 3)
      img.setRGB(px, py, (r << 16) | (old & 0xFFFF))
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("dhash: perturbed copies stay near, distinct patterns land far") {
    import spark.implicits._
    val rows = Seq(
      (1L, noisePng(42L, 0)), (2L, noisePng(42L, 4)),
      (3L, noisePng(99L, 0)))
      .toDF("media_id", "payload")
    val hs = Multimodal.dHashes(rows).collect()
      .map(h => h.media_id -> h).toMap
    assert(hs.values.forall(_.decoded), "generated PNGs must decode")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L).dhash, hs(2L).dhash) <= 6,
      "a few +3-channel pixel edits must not move the gradient-sign hash far")
    assert(ham(hs(1L).dhash, hs(3L).dhash) >= 16,
      "independent patterns must land ~32 bits apart")
  }

  test("dhash stub path: deterministic byte hash, exact copies collide") {
    val hs = Multimodal.dHashes(media).collect()
    assert(hs.forall(!_.decoded), "text payloads must take the stub path")
    val again = Multimodal.dHashes(media).collect()
    assert(hs.sortBy(_.media_id).map(_.dhash).toSeq ===
      again.sortBy(_.media_id).map(_.dhash).toSeq)
  }

  test("perceptual near-dup recovers exactly the planted pattern classes") {
    val n = Tables.documents(spark, sf).count()
    val mod = math.max(8L, n / 5L)
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val expected = (for {
      a <- ids; b <- ids
      if a < b && a % mod == b % mod
    } yield (a, b)).toSet
    val got = Multimodal.imageNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    assert(got === expected,
      "same-pattern perturbed copies within maxDist, nothing across patterns")
  }

  test("audio fingerprint: gain-invariant, class-exact, stub-deterministic") {
    // volume-scaled copies of one rendered recording must collide at 0
    val n = Tables.documents(spark, sf).count()
    val mod = math.max(8L, n / 5L)
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val expected = (for {
      a <- ids; b <- ids
      if a < b && a % mod == b % mod
    } yield (a, b)).toSet
    val pairs = Multimodal.audioNearDup(spark, sf).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected,
      "same-envelope gain-varied copies in, nothing across classes")
    // gain invariance is exact: every same-class pair is Hamming 0
    assert(pairs.forall(_.getInt(2) == 0),
      "energy-gradient signs must cancel a pure volume change")
    val hs = Multimodal.audioHashes(Multimodal.audioFrame(spark, sf)).collect()
    assert(hs.forall(_.decoded), "rendered WAVs must decode")
    // stub path: text payloads, deterministic
    val stub = Multimodal.audioHashes(media).collect()
    assert(stub.forall(!_.decoded))
    val again = Multimodal.audioHashes(media).collect()
    assert(stub.sortBy(_.media_id).map(_.dhash).toSeq ===
      again.sortBy(_.media_id).map(_.dhash).toSeq)
  }

  test("wav fast path decodes byte-for-byte what AudioSystem decodes") {
    val payloads = Multimodal.audioFrame(spark, sf).limit(20)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(payloads.nonEmpty)
    payloads.foreach { case (id, bytes) =>
      val fast = Multimodal.parseWavPcm16(bytes)
      assert(fast != null, s"media $id: rendered WAV must hit the fast path")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = ais.readAllBytes()
      val ref = Array.tabulate(raw.length / 2) { i =>
        (((raw(2 * i + 1).toInt) << 8) | (raw(2 * i) & 0xFF)).toShort.toDouble
      }
      assert(fast.toSeq === ref.toSeq, s"media $id: sample mismatch")
    }
    // non-WAV bytes must fall through to null, never throw
    assert(Multimodal.parseWavPcm16("not audio at all".getBytes) == null)
    assert(Multimodal.parseWavPcm16(Array.empty[Byte]) == null)
  }

  test("stereo re-encode downmixes to its mono twin at Hamming 0") {
    // take a rendered mono recording, duplicate its samples into an
    // L/R-interleaved stereo container (both channels = the mono
    // signal), and check the fingerprint is IDENTICAL — plus a
    // channel-IMBALANCED mix (L = s + 1000, R = s − 1000: unequal
    // channels whose frame mean is exactly the mono signal)
    val monoBytes = Multimodal.audioFrame(spark, sf).limit(1)
      .collect().map(_.getAs[Array[Byte]](1)).head
    val mono = Multimodal.parseWavPcm16(monoBytes)
    assert(mono != null)
    def pcmOf(samples: Array[(Short, Short)]): Array[Byte] = {
      val out = new Array[Byte](4 * samples.length)
      samples.zipWithIndex.foreach { case ((l, r), i) =>
        out(4 * i) = (l & 0xFF).toByte
        out(4 * i + 1) = ((l >> 8) & 0xFF).toByte
        out(4 * i + 2) = (r & 0xFF).toByte
        out(4 * i + 3) = ((r >> 8) & 0xFF).toByte
      }
      out
    }
    // rendered samples are bounded at ±20000, so ±1000 never clips
    val dup = Multimodal.wavPcm16(
      pcmOf(mono.map(s => (s.toShort, s.toShort))), 8000, 2)
    val tilted = Multimodal.wavPcm16(
      pcmOf(mono.map(s => ((s + 1000).toShort, (s - 1000).toShort))), 8000, 2)
    // stereo fast path must agree with the exact channel-mean downmix
    val fastDup = Multimodal.parseWavPcm16(dup)
    assert(fastDup != null, "canonical stereo WAV must hit the fast path")
    assert(fastDup.toSeq === mono.toSeq,
      "equal-channel stereo must downmix to the mono samples exactly")
    import spark.implicits._
    val frame = Seq((1L, monoBytes), (2L, dup), (3L, tilted))
      .toDF("media_id", "payload")
    val hs = Multimodal.audioHashes(frame).collect()
      .map(h => h.media_id -> h).toMap
    assert(hs.values.forall(_.decoded), "stereo must decode, not stub-hash")
    assert(hs(1L).dhash === hs(2L).dhash,
      "stereo re-encode must fingerprint identically to its mono twin")
    assert(hs(1L).dhash === hs(3L).dhash,
      "imbalanced channels whose mean is the mono signal must collide")
  }

  test("big-endian AIFF re-encode fingerprints identically to its WAV twin") {
    // the registry fallback must honor the container's byte order: an
    // AIFF delivers BIG-endian PCM, and reading it little-endian
    // byte-swaps every sample (review r9 finding)
    val monoBytes = Multimodal.audioFrame(spark, sf).limit(1)
      .collect().map(_.getAs[Array[Byte]](1)).head
    val mono = Multimodal.parseWavPcm16(monoBytes)
    assert(mono != null)
    val be = new Array[Byte](2 * mono.length)
    mono.zipWithIndex.foreach { case (s, i) =>
      val v = s.toInt
      be(2 * i) = ((v >> 8) & 0xFF).toByte
      be(2 * i + 1) = (v & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(be), fmt, mono.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, baos)
    val aiff = baos.toByteArray
    assert(Multimodal.parseWavPcm16(aiff) == null,
      "AIFF must miss the WAV fast path and take the registry fallback")
    import spark.implicits._
    val hs = Multimodal.audioHashes(
      Seq((1L, monoBytes), (2L, aiff)).toDF("media_id", "payload"))
      .collect().map(h => h.media_id -> h).toMap
    assert(hs(2L).decoded, "AIFF must decode through the registry, not stub-hash")
    assert(hs(1L).dhash === hs(2L).dhash,
      "a big-endian re-encode of the same recording must collide at Hamming 0")
  }
}
