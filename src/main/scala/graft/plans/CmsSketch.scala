package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch — the mergeable FREQUENCY sketch completing the
  * sketch family (HLL++ counts distincts, KMV intersects sets, CMS
  * answers "how often does x occur" over a stream/corpus too large to
  * hold exact counts): a d×w counter matrix; each value increments one
  * counter per row (row-seeded hash); a point estimate is the MIN of
  * its d counters. Estimates NEVER undercount, and overcount by at most
  * εN (ε ≈ e/w) with probability 1−δ (δ ≈ e^−d) — the one-sided bound
  * CmsSpec asserts against exact counts.
  *
  * Scale: the buffer is a fixed d×w long matrix per group (not
  * per-value state), partial aggregation merges element-wise map-side
  * (associative + commutative), and the estimator runs on the tiny
  * aggregated binary — the shape that replaces a full term-frequency
  * shuffle when only frequency QUERIES (heavy hitters, spam scores,
  * rate limits) are needed. Deterministic end-to-end: xxhash64 with
  * fixed per-row seeds, no runtime randomness.
  *
  * Binary layout: [int32 d][int32 w][int64 total][d·w × int64 counters,
  * row-major].
  */
object Cms {
  val DefaultDepth = 4
  val DefaultWidth = 512

  private[plans] def hashValue(v: Any, seed: Long): Long = v match {
    case l: Long => XXH64.hashLong(l, seed)
    case i: Int => XXH64.hashLong(i.toLong, seed)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
    case other =>
      throw new IllegalArgumentException(s"cms_sketch: unsupported value $other")
  }

  private[plans] def col(v: Any, row: Int, w: Int): Int =
    (math.floorMod(hashValue(v, row.toLong + 1L), w.toLong)).toInt

  /** Buffer: [0]=d, [1]=w, [2]=total, [3..] counters row-major. Flat
    * longs so serialize is a bulk copy. */
  private[plans] def newBuffer(d: Int, w: Int): Array[Long] = {
    val b = new Array[Long](3 + d * w)
    b(0) = d; b(1) = w
    b
  }

  private[plans] def serialize(buf: Array[Long]): Array[Byte] = {
    val d = buf(0).toInt; val w = buf(1).toInt
    val bb = ByteBuffer.allocate(16 + 8 * d * w)
    bb.putInt(d).putInt(w).putLong(buf(2))
    var i = 0
    while (i < d * w) { bb.putLong(buf(3 + i)); i += 1 }
    bb.array()
  }

  private[plans] def deserialize(bytes: Array[Byte]): Array[Long] = {
    // validate before allocating: cms_estimate accepts any binary column
    // at analysis time, so arbitrary bytes must fail readably
    require(bytes.length >= 16, s"not a cms sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    require(d >= 1 && d <= 32 && w >= 1 && w <= (1 << 24) && bytes.length == 16 + 8L * d * w,
      s"not a cms sketch: header d=$d w=$w for ${bytes.length} bytes")
    val buf = new Array[Long](3 + d * w)
    buf(0) = d; buf(1) = w; buf(2) = bb.getLong
    var i = 0
    while (i < d * w) { buf(3 + i) = bb.getLong; i += 1 }
    buf
  }

  private[plans] def estimate(buf: Array[Long], v: Any): Long = {
    val d = buf(0).toInt; val w = buf(1).toInt
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = buf(3 + r * w + col(v, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** Aggregate: build the CMS of a Long/Int/String column. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = Cms.DefaultDepth,
    width: Int = Cms.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    // width cap keeps d·w (and the 8·d·w serialized size) far from Int
    // overflow — a 2^24-wide, 32-deep sketch is already a 4 GB buffer
    // nobody means to ask for; reject at analysis, not with a negative
    // allocation mid-job
    if (depth < 1 || depth > 32 || width < 1 || width > (1 << 24))
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires 1 <= depth <= 32 and 1 <= width <= ${1 << 24}, got d=$depth w=$width")
    else child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a bigint/int/string column, got ${dt.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = Cms.newBuffer(depth, width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf(2) += 1
      var r = 0
      while (r < depth) { buf(3 + r * width + Cms.col(v, r, width)) += 1; r += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(2) += other(2)
    var i = 0
    while (i < depth * width) { buf(3 + i) += other(3 + i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar: CMS point-frequency estimate of `value` (never an
  * undercount; ≤ εN over with high probability). */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires a cms sketch (binary), got ${left.dataType.simpleString}")
    else right.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires a bigint/int/string probe value, got ${dt.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Cms.estimate(Cms.deserialize(a.asInstanceOf[Array[Byte]]), b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
