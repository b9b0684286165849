package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter MEMBERSHIP sketch — the fourth sketch family member
  * next to HLL++ (cardinality), [[Kmv]] (set overlap), and [[Cms]]
  * (frequency): an m-bit array with k double-hashed probes per value
  * answers "have I seen this key?" with no false negatives and a
  * bounded false-positive rate ≈ (1 − e^(−kn/m))^k. The dedup /
  * incremental-ingest primitive: a filter over yesterday's corpus
  * broadcast to today's crawl lets the overwhelming definite-miss
  * bulk skip the dedup join entirely ([[graft.llmdata.Dedup.bloomDelta]]).
  *
  * Scale: the aggregation buffer is a FIXED m/64-long bitset per
  * group; merge is bitwise OR (associative + commutative), so partial
  * aggregation combines map-side and the shuffle moves one bitset per
  * partition, not one per row. Probes are double hashing
  * `h1 + i·h2 mod m` (Kirsch–Mitzenmacher: two xxhash64 passes give k
  * independent-enough probes), deterministic end-to-end.
  *
  * Binary layout (shuffle format and final value):
  * [int32 numBits][int32 k][ceil(numBits/64) × int64 words]. The
  * membership probe reads the HEADER plus k single words straight from
  * the bytes — O(k) per tested row, never a full bitset copy.
  */
object Bloom {
  /** 2^18 bits = 32 KiB: FP < 1e-5 at 4k keys, ~8% at 50k — size m
    * ≈ 10·n bits for ~1% FP when the corpus outgrows the default. */
  val DefaultBits: Int = 1 << 18
  val DefaultHashes = 5
  private val Seed1 = 42L
  private val Seed2 = 777L

  private[plans] def hashPair(v: Any): (Long, Long) = v match {
    case l: Long => (XXH64.hashLong(l, Seed1), XXH64.hashLong(l, Seed2))
    case i: Int => (XXH64.hashLong(i.toLong, Seed1), XXH64.hashLong(i.toLong, Seed2))
    case s: UTF8String =>
      (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1),
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2))
    case other =>
      throw new IllegalArgumentException(s"bloom_sketch: unsupported value $other")
  }

  private[plans] def set(words: Array[Long], numBits: Int, k: Int, v: Any): Unit = {
    val (h1, h2) = hashPair(v)
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      words(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  /** Membership probe DIRECTLY over the serialized bytes: header + at
    * most k word loads. The per-row path of `bloom_contains` — parsing
    * the whole bitset per tested row would copy m/8 bytes per row. */
  private[plans] def mightContainBytes(bytes: Array[Byte], v: Any): Boolean = {
    val (numBits, k) = header(bytes)
    val bb = ByteBuffer.wrap(bytes)
    val (h1, h2) = hashPair(v)
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((bb.getLong(8 + 8 * (idx >>> 6)) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** [[mightContainBytes]] over a JVM String hashed exactly as the
    * expression path hashes a `StringType` value (UTF8String bytes) —
    * the probe a broadcast-variable consumer ([[graft.llmdata.Dedup
    * .streamingBloomGateBroadcast]]'s mapPartitions) runs without an
    * InternalRow in hand. */
  private[graft] def mightContainString(bytes: Array[Byte], s: String): Boolean =
    mightContainBytes(bytes, UTF8String.fromString(s))

  /** Validated (numBits, k) from serialized bytes — arbitrary binaries
    * must fail loudly, not index out of bounds (cf. [[Kmv.deserialize]]). */
  private[plans] def header(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length >= 8, s"not a bloom sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt(0)
    val k = bb.getInt(4)
    require(numBits >= 64 && k >= 1 && k <= 64 &&
      bytes.length == 8 + 8L * ((numBits + 63) >>> 6),
      s"not a bloom sketch: header bits=$numBits k=$k for ${bytes.length} bytes")
    (numBits, k)
  }

  private[plans] def serialize(numBits: Int, k: Int, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * words.length)
    bb.putInt(numBits).putInt(k)
    words.foreach(bb.putLong)
    bb.array()
  }

  private[plans] def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val (numBits, k) = header(bytes)
    val bb = ByteBuffer.wrap(bytes)
    val nw = (numBits + 63) >>> 6
    val words = new Array[Long](nw)
    var i = 0
    while (i < nw) { words(i) = bb.getLong(8 + 8 * i); i += 1 }
    (numBits, k, words)
  }
}

/** Aggregate: build the Bloom filter of a Long/Int/String column. */
case class BloomSketchAgg(
    child: Expression,
    numBits: Int = Bloom.DefaultBits,
    numHashes: Int = Bloom.DefaultHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (numBits < 64)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires numBits >= 64, got $numBits")
    else if (numHashes < 1 || numHashes > 64)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires 1 <= numHashes <= 64, got $numHashes")
    else child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires a bigint/int/string column, got ${dt.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits + 63) >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, numBits, numHashes, v)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    Bloom.serialize(numBits, numHashes, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Bloom.serialize(numBits, numHashes, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Bloom.deserialize(bytes)._3

  override def withNewMutableAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar: might `right` be a member of the `left` Bloom sketch?
  * `false` is definitive (no false negatives); `true` is "probably". */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires a bloom sketch (binary), got ${left.dataType.simpleString}")
    else right.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires a bigint/int/string value, got ${dt.simpleString}")
    }

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    Bloom.mightContainBytes(sketch.asInstanceOf[Array[Byte]], v)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
