package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable count-min sketch — the third leg of the sketch family
  * next to `Hll` (distinct counts) and `Qsk` (quantiles): approximate
  * per-item FREQUENCIES, the primitive behind heavy-hitter / top-k
  * reports over 100 TB telemetry. Like the other two it is built as
  * first-class binary VALUES: per-shard sketches persist, travel
  * through shuffles, and re-merge with `cms_merge` without rescanning
  * the input.
  *
  * Design note — why count-min, not SpaceSaving/Misra-Gries: the
  * classic heavy-hitter summaries evict counters based on ARRIVAL
  * ORDER, so two partitionings give different candidate sets and
  * different bytes — a §2.3 violation (the same reason Qsk rejects
  * KLL). A count-min sketch is a D×W grid of SUMS: addition commutes,
  * so any accumulation order, merge tree, or partitioning produces
  * byte-identical state (CmsSpec proves it at 2 and 7 partitions).
  * Candidates then come from an exact pass (or any external list);
  * the sketch answers point frequency queries with the one-sided
  * guarantee exact ≤ estimate ≤ exact + εN, ε = e/W (w.h.p. over the
  * D row-hash seeds).
  *
  * Layout: n (long), then D×W longs row-major; D=4, W=2048 → 64 KB a
  * sketch. Items enter PRE-HASHED to a long (pass `xxhash64(cols…)`):
  * the sketch then estimates the pre-hashed item's count, and a
  * 64-bit pre-hash collision (~2⁻⁶⁴ per pair) is the accepted noise
  * floor — far below εN.
  */
object Cms {
  val D: Int = 4
  val W: Int = 2048
  /** One-sided overestimate bound: P[est > exact + (e/W)·n] ≤ e^-D. */
  val Epsilon: Double = math.E / W

  private val Seeds: Array[Long] =
    Array(0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL,
          0x165667B19E3779F9L, 0x27D4EB2F165667C5L)

  /** Format marker ("CMS1") — same persistable-blob convention as
    * [[Qsk.Magic]]: a foreign or stale blob fails loudly instead of
    * misparsing. */
  val Magic: Int = 0x434D5331
  private val Header: Int = 4 + 8 // magic + n

  final class State(var n: Long, val grid: Array[Long]) {
    def add(item: Long): Unit = {
      n += 1
      var i = 0
      while (i < D) {
        val h = XXH64.hashLong(item, Seeds(i))
        grid(i * W + ((h % W + W) % W).toInt) += 1L
        i += 1
      }
    }
    def mergeFrom(oN: Long, oGrid: Array[Long]): Unit = {
      n += oN
      var i = 0
      while (i < grid.length) { grid(i) += oGrid(i); i += 1 }
    }
  }

  def emptyState(): State = new State(0L, new Array[Long](D * W))

  def serialize(st: State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Header + 8 * st.grid.length)
    bb.putInt(Magic)
    bb.putLong(st.n)
    st.grid.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = wrapChecked(bytes)
    val n = bb.getLong
    val grid = new Array[Long]((bytes.length - Header) / 8)
    var i = 0
    while (i < grid.length) { grid(i) = bb.getLong; i += 1 }
    new State(n, grid)
  }

  /** Merge a serialized sketch straight into `st` — the re-merge path
    * runs per input row, so skipping the intermediate 64 KB State
    * halves its allocation (same posture as [[Bf.mergeBytesInto]]). */
  def mergeBytesInto(st: State, bytes: Array[Byte]): Unit = {
    val bb = wrapChecked(bytes)
    st.n += bb.getLong
    var i = 0
    while (i < st.grid.length) { st.grid(i) += bb.getLong; i += 1 }
  }

  private def wrapChecked(bytes: Array[Byte]): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length == Header + 8 * D * W && bb.getInt == Magic,
      s"not a cms v1 sketch (${bytes.length} bytes) — rebuild the sketch " +
        "with this engine version")
    bb
  }

  /** Point frequency estimate: min over the D row counters. */
  def estimate(bytes: Array[Byte], item: Long): Long = {
    val bb = wrapChecked(bytes)
    bb.getLong // n
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val h = XXH64.hashLong(item, Seeds(i))
      val c = bb.getLong(Header + 8 * (i * W + ((h % W + W) % W).toInt))
      if (c < best) best = c
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def count(bytes: Array[Byte]): Long =
    wrapChecked(bytes).getLong

  def register(s: SparkSession): Unit = {
    Register.once(s,
      "cms_sketch", (args: Seq[Expression]) => CmsSketchAgg(args.head))
    Register.once(s,
      "cms_merge", (args: Seq[Expression]) => CmsMergeAgg(args.head))
    Register.once(s,
      "cms_estimate", (args: Seq[Expression]) => CmsEstimateExpr(args(0), args(1)))
    Register.once(s,
      "cms_count", (args: Seq[Expression]) => CmsCountExpr(args.head))
  }
}

/** `cms_sketch(itemHashCol)` → binary: 64 KB count-min grid per
  * group; pass items pre-hashed with `xxhash64(cols…)`. */
case class CmsSketchAgg(
    item: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Cms.State = Cms.emptyState()

  override def update(buf: Cms.State, input: InternalRow): Cms.State = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Cms.State, other: Cms.State): Cms.State = {
    buf.mergeFrom(other.n, other.grid)
    buf
  }

  override def eval(buf: Cms.State): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.State): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.State =
    Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren.head)
}

/** `cms_merge(sketchCol)` → binary: element-wise sum of stored
  * sketches — the re-aggregation half of persist-then-merge. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Cms.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge"

  override def createAggregationBuffer(): Cms.State = Cms.emptyState()

  override def update(buf: Cms.State, input: InternalRow): Cms.State = {
    val v = child.eval(input)
    if (v != null) Cms.mergeBytesInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Cms.State, other: Cms.State): Cms.State = {
    buf.mergeFrom(other.n, other.grid)
    buf
  }

  override def eval(buf: Cms.State): Any = Cms.serialize(buf)
  override def serialize(buf: Cms.State): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Cms.State =
    Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, itemHash)` → bigint point-frequency estimate
  * (exact ≤ est ≤ exact + εN w.h.p.). Runs once per probed item —
  * CodegenFallback keeps the surrounding stage codegen'd. */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullSafeEval(sk: Any, item: Any): Any =
    Cms.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cms_count(sketch)` → bigint: the EXACT item count carried through
  * builds and merges. */
case class CmsCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_count"
  override def nullSafeEval(input: Any): Any =
    Cms.count(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
