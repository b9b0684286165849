package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Deterministic mergeable QUANTILE sketch — bottom-k uniform sampling:
  * keep the measure values of the k rows whose xxhash64(row id) is
  * smallest. Because "bottom k by a global hash order" is closed under
  * union (bottom-k of a union IS the bottom-k of the two bottom-k's),
  * merges are EXACTLY associative/commutative/idempotent — day sketches
  * rolled to a week are byte-identical to the sketch built from the
  * week's raw rows (QuantileSampleSpec asserts binary equality), which
  * neither t-digest nor DataSketches KLL gives (randomized compaction),
  * and determinism is what the engine's gates are built on.
  *
  * The sample is uniform-without-replacement over ROWS (the id hash is
  * the sampling coin, fixed seed, no runtime randomness), so the
  * sample's p-quantile estimates the population's with standard
  * binomial rank error √(p(1−p)/k) — ~3% at p=0.5, k=256; exact while
  * n ≤ k (the sketch then holds every row). The price vs KLL is error
  * ∝ 1/√k rather than KLL's tighter guarantee per byte — the engine
  * trades those bytes for bit-reproducibility, same stance as the
  * micro-quantized exact-long aggregations.
  *
  * This completes the stored-sketch family: HLL answers range UNIQUES
  * ([[graft.sync.SketchTable]]), KMV answers overlaps, CMS answers
  * frequencies, and this answers range QUANTILES (p50/p99 latency over
  * arbitrary date windows from O(#days) stored rows).
  *
  * Requires a unique row-id column (`event_id` here): duplicate ids
  * collapse to one sample slot — the id IS the sampled unit.
  *
  * Binary layout: [int32 k][int32 n][n × (int64 flippedHash,
  * float64 value)], hash-ascending. Sign-flipped hashes make signed
  * ordering equal unsigned hash ordering (the [[Kmv]] trick).
  */
object QSample {
  val DefaultK = 256

  /** Aggregation buffer: capacity + (flipped hash → value), ordered. */
  final class Buf(var k: Int,
                  val m: java.util.TreeMap[java.lang.Long, java.lang.Double])

  private[plans] def add(buf: Buf, flipped: Long, value: Double): Unit = {
    // equal-key insert (duplicate row-id, or an xxhash64 collision
    // between distinct ids, ~n²/2⁶⁴): keep the MIN value so the
    // survivor is merge-order-independent — last-write-wins would let
    // partial-aggregation order pick the winner and quietly break the
    // byte-identical-merge guarantee the sketch gates assert
    val prev = buf.m.get(flipped)
    if (prev != null) {
      if (value < prev) { buf.m.put(flipped, value); () }
    }
    else if (buf.m.size < buf.k) { buf.m.put(flipped, value); () }
    else if (flipped < buf.m.lastKey()) {
      buf.m.put(flipped, value)
      if (buf.m.size > buf.k) { buf.m.pollLastEntry(); () }
    }
  }

  private[plans] def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.m.size)
    bb.putInt(buf.k).putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey).putDouble(e.getValue)
    }
    bb.array()
  }

  private[plans] def deserialize(bytes: Array[Byte]): Buf = {
    require(bytes.length >= 8, s"not a qsample sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    // k=0 is the legal EMPTY sketch (capacity wildcard): the partial
    // stage of qsample_merge serializes it for an all-null group, and
    // an empty group's stored output must merge with any capacity later
    require(k >= 0 && n >= 0 && n <= k && bytes.length == 8 + 16L * n,
      s"not a qsample sketch: header k=$k n=$n for ${bytes.length} bytes")
    val buf = new Buf(k, new java.util.TreeMap[java.lang.Long, java.lang.Double])
    var i = 0
    while (i < n) { buf.m.put(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  private[plans] def mergeInto(buf: Buf, other: Buf): Unit = {
    // k=0 marks an uninitialized merge buffer (adopts the first real
    // capacity); beyond that, mixed capacities are an ERROR — quietly
    // degrading to the smaller k would change the error bound under
    // the caller's feet
    if (buf.k == 0) buf.k = other.k
    else if (other.k != 0 && other.k != buf.k)
      throw new IllegalArgumentException(
        s"qsample_merge: mixed capacities ${buf.k} vs ${other.k}")
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
  }

  /** Sample p-quantile, linear interpolation (percentile_cont shape). */
  private[plans] def quantile(buf: Buf, p: Double): Any = {
    val n = buf.m.size
    if (n == 0) return null
    val vs = new Array[Double](n)
    val it = buf.m.values().iterator()
    var i = 0
    while (i < n) { vs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vs)
    val h = p * (n - 1)
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, n - 1)
    vs(lo) + (vs(hi) - vs(lo)) * (h - lo)
  }
}

/** Aggregate: bottom-k sample sketch of (unique id, double measure). */
case class QSampleSketchAgg(
    id: Expression,
    value: Expression,
    k: Int = QSample.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSample.Buf] {

  override def children: Seq[Expression] = Seq(id, value)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsample_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"qsample_sketch requires k >= 1, got $k")
    else (id.dataType, value.dataType) match {
      case (LongType | IntegerType | StringType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (i, v) => TypeCheckResult.TypeCheckFailure(
        "qsample_sketch requires (bigint/int/string id, double value), got " +
          s"(${i.simpleString}, ${v.simpleString})")
    }

  override def createAggregationBuffer(): QSample.Buf =
    new QSample.Buf(k, new java.util.TreeMap[java.lang.Long, java.lang.Double])

  override def update(buf: QSample.Buf, input: InternalRow): QSample.Buf = {
    val i = id.eval(input)
    val v = value.eval(input)
    if (i != null && v != null)
      QSample.add(buf, Kmv.hashValue(i) ^ Long.MinValue,
        v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSample.Buf, other: QSample.Buf): QSample.Buf = {
    QSample.mergeInto(buf, other)
    buf
  }

  override def eval(buf: QSample.Buf): Any = QSample.serialize(buf)
  override def serialize(buf: QSample.Buf): Array[Byte] = QSample.serialize(buf)
  override def deserialize(b: Array[Byte]): QSample.Buf = QSample.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): QSampleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QSampleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QSampleSketchAgg =
    copy(id = c(0), value = c(1))
}

/** Aggregate: union of stored sketches (the range-rollup reducer). */
case class QSampleMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSample.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsample_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"qsample_merge requires a qsample sketch (binary), got ${dt.simpleString}")
  }

  // k=0 marks "capacity not yet known": adopted from the first sketch
  override def createAggregationBuffer(): QSample.Buf =
    new QSample.Buf(0, new java.util.TreeMap[java.lang.Long, java.lang.Double])

  override def update(buf: QSample.Buf, input: InternalRow): QSample.Buf = {
    val v = child.eval(input)
    if (v != null)
      QSample.mergeInto(buf, QSample.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: QSample.Buf, other: QSample.Buf): QSample.Buf = {
    QSample.mergeInto(buf, other)
    buf
  }

  // an all-null group's output stays the k=0 EMPTY sketch — a capacity
  // WILDCARD that merges with any k later (stamping a concrete default
  // here would poison downstream merges of non-default-k tables with a
  // spurious "mixed capacities" error)
  override def eval(buf: QSample.Buf): Any = QSample.serialize(buf)
  override def serialize(buf: QSample.Buf): Array[Byte] = QSample.serialize(buf)
  override def deserialize(b: Array[Byte]): QSample.Buf = QSample.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): QSampleMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QSampleMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QSampleMergeAgg =
    copy(child = c.head)
}

/** Scalar: sample p-quantile of a sketch (percentile_cont-style linear
  * interpolation; null for an empty sketch). */
case class QSampleQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsample_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "qsample_quantile requires (sketch binary, double p in [0,1])")

  override protected def nullSafeEval(sk: Any, p: Any): Any = {
    val pp = p.asInstanceOf[Double]
    require(pp >= 0.0 && pp <= 1.0, s"qsample_quantile: p=$pp outside [0,1]")
    QSample.quantile(QSample.deserialize(sk.asInstanceOf[Array[Byte]]), pp)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QSampleQuantile =
    copy(left = l, right = r)
}
