package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct sketch — the mergeable set sketch
  * that `approx_count_distinct` (HLL++) cannot replace when SET
  * OPERATIONS are needed: two KMV sketches estimate the cardinality of
  * their INTERSECTION (retention/overlap questions, q21's sketch
  * sibling), which HLL sketches fundamentally cannot.
  *
  * Theory (standard KMV / bottom-k estimator): hash every value
  * uniformly to (0,1); keep the k smallest distinct hashes. If the k-th
  * smallest is u, the distinct count is ≈ (k-1)/u. For two sketches,
  * the k' = min(kA,kB) smallest hashes of A∪B form a uniform sample of
  * the union, so |A∩B| ≈ (fraction of that sample present in both) ×
  * |A∪B|. With fewer than k values the sketch IS the exact distinct
  * hash set. Deterministic end-to-end: xxhash64, no runtime randomness.
  *
  * Scale: the aggregation buffer is ≤ k longs per group, partial
  * aggregation merges sketches map-side (associative + commutative),
  * and the estimator expressions run on the tiny aggregated binaries —
  * the exact shape that replaces COUNT(DISTINCT) shuffles and
  * INTERSECT joins at warehouse scale.
  *
  * Binary layout (both the shuffle format and the final value):
  * [int32 k][int32 n][n × int64 ascending sign-flipped hashes].
  * Hashes are stored sign-flipped (`h ^ Long.MinValue`) so SIGNED
  * ordering equals UNSIGNED hash ordering.
  */
object Kmv {
  val DefaultK = 256
  private val Seed = 42L

  private[plans] def hashValue(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, Seed)
    case i: Int => XXH64.hashLong(i.toLong, Seed)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    case other =>
      throw new IllegalArgumentException(s"kmv_sketch: unsupported value $other")
  }

  /** Unsigned fraction in (0,1] of a sign-flipped hash. */
  private[plans] def fraction(flipped: Long): Double =
    (flipped.toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  private[plans] def serialize(k: Int, set: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * set.size)
    bb.putInt(k).putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[plans] def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    // validate the header before allocating: kmv_card/kmv_intersect
    // accept any binary column at analysis time, so arbitrary bytes must
    // fail with a clear error, not a negative/17 GB allocation
    require(bytes.length >= 8, s"not a kmv sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    require(k >= 2 && n >= 0 && bytes.length == 8 + 8L * n,
      s"not a kmv sketch: header k=$k n=$n for ${bytes.length} bytes")
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { vs(i) = bb.getLong; i += 1 }
    (k, vs)
  }

  /** Distinct-count estimate from a parsed sketch. */
  private[plans] def cardinality(k: Int, vs: Array[Long]): Long =
    if (vs.length < k) vs.length.toLong
    else math.round((k - 1).toDouble / fraction(vs(vs.length - 1)))
}

/** Aggregate: build the KMV sketch of a Long/Int/String column. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = Kmv.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2)
      // k=1 degenerates the (k-1)/u estimator and k<=0 breaks the
      // bottom-k invariant — reject at analysis, not mid-job
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch requires k >= 2, got $k")
    else child.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a bigint/int/string column, got ${dt.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    // keep only the k smallest (sign-flipped ⇒ natural order): skip
    // values beyond the current k-th once the sketch is full
    if (buf.size < k) { buf.add(flipped); () }
    else if (flipped < buf.last()) {
      buf.add(flipped)
      if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, Kmv.hashValue(v) ^ Long.MinValue)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    Kmv.serialize(k, buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    Kmv.serialize(k, buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val (_, vs) = Kmv.deserialize(bytes)
    val set = new java.util.TreeSet[java.lang.Long]()
    vs.foreach(v => set.add(v))
    set
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar: distinct-count estimate of one sketch (exact below k). */
case class KmvCardinality(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_card"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_card requires a kmv sketch (binary), got ${dt.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val (k, vs) = Kmv.deserialize(a.asInstanceOf[Array[Byte]])
    Kmv.cardinality(k, vs)
  }

  override protected def withNewChildInternal(c: Expression): KmvCardinality =
    copy(child = c)
}

/** Scalar: estimated |A ∩ B| from two sketches. Exact when both
  * sketches are below capacity (they then hold every distinct hash). */
case class KmvIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kmv_intersect requires two kmv sketches (binary)")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, va) = Kmv.deserialize(a.asInstanceOf[Array[Byte]])
    val (kb, vb) = Kmv.deserialize(b.asInstanceOf[Array[Byte]])
    val sa = va.toSet
    val sb = vb.toSet
    if (va.length < ka && vb.length < kb) {
      // both exact: the hash sets are complete, so intersect directly
      (sa & sb).size.toLong
    } else {
      // bottom-k' of the union is a uniform sample of A∪B
      val kk = math.min(ka, kb)
      val union = (va ++ vb).distinct.sorted.take(kk)
      val inBoth = union.count(v => sa.contains(v) && sb.contains(v))
      val unionEst =
        if (union.length < kk) union.length.toLong
        else math.round((kk - 1).toDouble / Kmv.fraction(union(union.length - 1)))
      math.round(inBoth.toDouble / union.length * unionEst)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersect =
    copy(left = newLeft, right = newRight)
}
