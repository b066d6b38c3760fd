package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Mergeable theta-style set-overlap sketch — the FIFTH sketch next to
  * `Hll` (distincts), `Qsk` (quantiles), `Cms` (frequencies), and `Bf`
  * (membership): it answers the one question the family still
  * couldn't — "how many keys do corpus A and corpus B SHARE" — without
  * an exact join. That is the first triage a 100 TB contamination or
  * cross-corpus dedup pass runs (`docs_contamination` is the exact
  * broadcast-probe version; this sketch is the 32 KB pre-screen that
  * decides whether to run it at all).
  *
  * Design — bottom-k (KMV) signature, not a HyperLogLog
  * inclusion-exclusion: the signature keeps the K smallest DISTINCT
  * internally-rehashed values of the key set. The retained set is a
  * pure function of the key SET (membership is value-intrinsic — the
  * same order-free posture as `Qsk`, chosen over arrival-order-
  * dependent alternatives per §2.3), so one-shot build, any merge
  * tree, and any partitioning serialize byte-identically (ThetaSpec
  * pins 2- and 7-partition merge trees). Estimators: with U the k-th
  * smallest value of the COMBINED signature mapped to (0,1),
  * |A∪B| ≈ (k-1)/U, and |A∩B| ≈ (|S ∩ sigA ∩ sigB| / k)·|A∪B| —
  * the standard KMV Jaccard route. Signatures smaller than K are
  * EXACT (the whole set's hashes are present), so small-set overlaps
  * degrade to exact intersection counts, not noisy estimates.
  *
  * Layout: magic "THS1" (persistable-blob convention, [[Qsk.Magic]]),
  * exact row count n (long), m (int), then m sorted (unsigned asc)
  * longs; K = 4096 → ≤ 32 KB a sketch, relative error ~1/√K ≈ 1.6%
  * on the union and √(J(1-J)/K)·|A∪B| on the intersection. Items
  * enter pre-hashed to a long (pass `xxhash64(cols…)`); the sketch
  * re-hashes internally with a fixed seed so non-uniform caller
  * hashes (e.g. raw ids) cannot skew the order statistics.
  */
object Theta {
  val K: Int = 4096
  private val Seed: Long = 0x7E7A_5EEDL
  val Magic: Int = 0x54485331
  private val Header: Int = 4 + 8 + 4 // magic + n + m

  private val unsignedOrd: Ordering[Long] =
    (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b)

  final class State(var n: Long,
                    val set: scala.collection.mutable.TreeSet[Long]) {
    def add(item: Long): Unit = {
      n += 1
      val v = XXH64.hashLong(item, Seed)
      if (set.size < K) set += v
      else if (unsignedOrd.lt(v, set.last)) {
        if (set.add(v)) set -= set.last
      }
    }
    def mergeFrom(oN: Long, values: Iterator[Long]): Unit = {
      n += oN
      values.foreach { v =>
        if (set.size < K) set += v
        else if (unsignedOrd.lt(v, set.last)) {
          if (set.add(v)) set -= set.last
        }
      }
    }
  }

  def emptyState(): State =
    new State(0L, scala.collection.mutable.TreeSet.empty[Long](unsignedOrd))

  def serialize(st: State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Header + 8 * st.set.size)
    bb.putInt(Magic)
    bb.putLong(st.n)
    bb.putInt(st.set.size)
    st.set.foreach(bb.putLong) // TreeSet iterates in unsigned asc order
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = wrapChecked(bytes)
    val n = bb.getLong
    val m = bb.getInt
    val st = emptyState()
    st.n = n
    var i = 0
    while (i < m) { st.set += bb.getLong; i += 1 }
    st
  }

  /** The signature values without TreeSet overhead — estimator path. */
  def values(bytes: Array[Byte]): Array[Long] = {
    val bb = wrapChecked(bytes)
    bb.getLong
    val m = bb.getInt
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = bb.getLong; i += 1 }
    out
  }

  def count(bytes: Array[Byte]): Long = wrapChecked(bytes).getLong

  private def wrapChecked(bytes: Array[Byte]): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length >= Header && bb.getInt(0) == Magic &&
        bytes.length == Header + 8L * bb.getInt(12),
      s"not a theta v1 sketch (${bytes.length} bytes) — rebuild the " +
        "sketch with this engine version")
    bb.position(4)
    bb
  }

  /** Hash value mapped to (0, 1): top 53 bits as a double, +1 ulp so
    * u is never exactly zero. */
  private def u(v: Long): Double =
    ((v >>> 11).toDouble + 1.0) / (1L << 53).toDouble

  /** Estimated distinct count: exact when the signature holds the
    * whole set (m < K), else the KMV order statistic (K-1)/u_K. */
  def distinctEst(sig: Array[Long]): Double =
    if (sig.length < K) sig.length.toDouble
    else (K - 1).toDouble / u(sig(K - 1))

  /** (estimated |A∪B|, estimated |A∩B|) from two signatures: the k
    * smallest of the combined signature estimate the union; the
    * fraction of them present in BOTH inputs estimates the Jaccard.
    * Exact (not estimated) when both signatures are exact and their
    * union stays under K. */
  def unionIntersectEst(a: Array[Long], b: Array[Long]): (Double, Double) = {
    val combined = (a ++ b).distinct.sorted(unsignedOrd)
    val k = math.min(K, combined.length)
    if (k == 0) return (0.0, 0.0)
    val aSet = a.toSet
    val bSet = b.toSet
    var inBoth = 0
    var i = 0
    while (i < k) {
      val v = combined(i)
      if (aSet.contains(v) && bSet.contains(v)) inBoth += 1
      i += 1
    }
    val unionEst =
      if (combined.length < K && a.length < K && b.length < K)
        combined.length.toDouble // both signatures exact
      else (k - 1).toDouble / u(combined(k - 1))
    (unionEst, inBoth.toDouble / k * unionEst)
  }

  def register(s: SparkSession): Unit = {
    Register.once(s,
      "theta_sketch", (args: Seq[Expression]) => ThetaSketchAgg(args.head))
    Register.once(s,
      "theta_merge", (args: Seq[Expression]) => ThetaMergeAgg(args.head))
    Register.once(s,
      "theta_distinct", (args: Seq[Expression]) => ThetaDistinctExpr(args.head))
    Register.once(s,
      "theta_union_est",
      (args: Seq[Expression]) => ThetaUnionExpr(args(0), args(1)))
    Register.once(s,
      "theta_intersect_est",
      (args: Seq[Expression]) => ThetaIntersectExpr(args(0), args(1)))
    Register.once(s,
      "theta_count", (args: Seq[Expression]) => ThetaCountExpr(args.head))
  }
}

/** `theta_sketch(itemHashCol)` → binary bottom-K signature per group;
  * pass items pre-hashed with `xxhash64(cols…)`. */
case class ThetaSketchAgg(
    item: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Theta.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Theta.State = Theta.emptyState()

  override def update(buf: Theta.State, input: InternalRow): Theta.State = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Theta.State, other: Theta.State): Theta.State = {
    buf.mergeFrom(other.n, other.set.iterator)
    buf
  }

  override def eval(buf: Theta.State): Any = Theta.serialize(buf)
  override def serialize(buf: Theta.State): Array[Byte] = Theta.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Theta.State =
    Theta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren.head)
}

/** `theta_merge(sketchCol)` → binary: bottom-K union of stored
  * signatures. */
case class ThetaMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Theta.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_merge"

  override def createAggregationBuffer(): Theta.State = Theta.emptyState()

  override def update(buf: Theta.State, input: InternalRow): Theta.State = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      buf.mergeFrom(Theta.count(bytes), Theta.values(bytes).iterator)
    }
    buf
  }

  override def merge(buf: Theta.State, other: Theta.State): Theta.State = {
    buf.mergeFrom(other.n, other.set.iterator)
    buf
  }

  override def eval(buf: Theta.State): Any = Theta.serialize(buf)
  override def serialize(buf: Theta.State): Array[Byte] = Theta.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Theta.State =
    Theta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `theta_distinct(sketch)` → double: estimated distinct count (exact
  * below K). */
case class ThetaDistinctExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_distinct"
  override def nullSafeEval(input: Any): Any =
    Theta.distinctEst(Theta.values(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `theta_union_est(a, b)` → double: estimated |A∪B|. */
case class ThetaUnionExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_union_est"
  override def nullSafeEval(a: Any, b: Any): Any =
    Theta.unionIntersectEst(
      Theta.values(a.asInstanceOf[Array[Byte]]),
      Theta.values(b.asInstanceOf[Array[Byte]]))._1
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `theta_intersect_est(a, b)` → double: estimated |A∩B| (exact when
  * both signatures are exact). */
case class ThetaIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_est"
  override def nullSafeEval(a: Any, b: Any): Any =
    Theta.unionIntersectEst(
      Theta.values(a.asInstanceOf[Array[Byte]]),
      Theta.values(b.asInstanceOf[Array[Byte]]))._2
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `theta_count(sketch)` → bigint: exact inserted-row count carried
  * through builds and merges. */
case class ThetaCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_count"
  override def nullSafeEval(input: Any): Any =
    Theta.count(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
