package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Mergeable Bloom filter as a first-class VALUE — the fourth sketch
  * next to `Hll` (distincts), `Qsk` (quantiles), and `Cms`
  * (frequencies): set MEMBERSHIP with no false negatives, the
  * primitive behind semi-join pruning at 100 TB. Spark's own
  * `InjectRuntimeFilter` builds exactly this internally per query
  * (proven by `join_runtime_bloom`); this surface makes the filter a
  * PERSISTABLE artifact — build once over a dim's keys, store the
  * 32 KB blob, and every later scan prefilters against it without
  * re-reading the dim (`join_bloom_prefilter` composes it with an
  * exact verify so results stay exact).
  *
  * Determinism: the filter is a bitwise OR of per-row bit sets with
  * FIXED seeds — OR commutes, so any accumulation order, merge tree,
  * or partitioning yields byte-identical blobs (BfSpec pins it), and
  * the false-positive SET itself is a pure function of the key
  * multiset. Layout: n (long), then M/64 longs; M = 2^18 bits
  * (32 KB), K = 5 probes → FP ≈ (1 - e^(-Kn/M))^K, ~0.1% at n = 10k.
  * Items enter pre-hashed to a long (pass `xxhash64(cols…)`).
  */
object Bf {
  val MBits: Int = 1 << 18
  val K: Int = 5
  private val Words: Int = MBits / 64
  /** Format marker ("BFS1") — same persistable-blob convention as
    * [[Qsk.Magic]]: a stored blob from a different layout fails with a
    * clear message instead of silently misparsing. */
  val Magic: Int = 0x42465331
  private val Header: Int = 4 + 8 // magic + n

  private val Seeds: Array[Long] =
    Array(0xA076_1D64_78BD_642FL, 0xE703_7ED1_A0B4_28DBL,
          0x8EBC_6AF0_9C88_C6E3L, 0x5899_65CC_7537_4CC3L,
          0x1D8E_4E27_C47D_124FL)

  final class State(var n: Long, val words: Array[Long]) {
    def add(item: Long): Unit = {
      n += 1
      var i = 0
      while (i < K) {
        val bit = ((XXH64.hashLong(item, Seeds(i)) % MBits + MBits) % MBits).toInt
        words(bit >> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    def mergeFrom(oN: Long, oWords: Array[Long]): Unit = {
      n += oN
      var i = 0
      while (i < words.length) { words(i) |= oWords(i); i += 1 }
    }
  }

  def emptyState(): State = new State(0L, new Array[Long](Words))

  def serialize(st: State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(Header + 8 * st.words.length)
    bb.putInt(Magic)
    bb.putLong(st.n)
    st.words.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = wrapChecked(bytes)
    val n = bb.getLong
    val words = new Array[Long]((bytes.length - Header) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    new State(n, words)
  }

  /** Merge a serialized filter straight into `st` without
    * materializing an intermediate State — the re-merge path
    * (`bf_merge` over stored blobs) runs once per input ROW, so a
    * 32 KB copy per row would double its allocation for nothing. */
  def mergeBytesInto(st: State, bytes: Array[Byte]): Unit = {
    val bb = wrapChecked(bytes)
    st.n += bb.getLong
    var i = 0
    while (i < st.words.length) { st.words(i) |= bb.getLong; i += 1 }
  }

  private def wrapChecked(bytes: Array[Byte]): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bytes.length == Header + 8 * Words &&
        bb.getInt == Magic,
      s"not a bf v1 sketch (${bytes.length} bytes) — rebuild the filter " +
        "with this engine version")
    bb
  }

  /** Membership probe: true iff all K bits are set (never a false
    * negative; false positives at the documented rate). */
  def contains(bytes: Array[Byte], item: Long): Boolean = {
    val bb = wrapChecked(bytes)
    var i = 0
    while (i < K) {
      val bit = ((XXH64.hashLong(item, Seeds(i)) % MBits + MBits) % MBits).toInt
      if ((bb.getLong(Header + 8 * (bit >> 6)) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def count(bytes: Array[Byte]): Long =
    wrapChecked(bytes).getLong

  def register(s: SparkSession): Unit = {
    Register.once(s,
      "bf_sketch", (args: Seq[Expression]) => BfSketchAgg(args.head))
    Register.once(s,
      "bf_merge", (args: Seq[Expression]) => BfMergeAgg(args.head))
    Register.once(s,
      "bf_contains", (args: Seq[Expression]) => BfContainsExpr(args(0), args(1)))
    Register.once(s,
      "bf_count", (args: Seq[Expression]) => BfCountExpr(args.head))
  }
}

/** `bf_sketch(itemHashCol)` → binary: 32 KB Bloom filter per group;
  * pass items pre-hashed with `xxhash64(cols…)`. */
case class BfSketchAgg(
    item: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bf.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bf_sketch"

  override def createAggregationBuffer(): Bf.State = Bf.emptyState()

  override def update(buf: Bf.State, input: InternalRow): Bf.State = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Bf.State, other: Bf.State): Bf.State = {
    buf.mergeFrom(other.n, other.words)
    buf
  }

  override def eval(buf: Bf.State): Any = Bf.serialize(buf)
  override def serialize(buf: Bf.State): Array[Byte] = Bf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bf.State =
    Bf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BfSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BfSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren.head)
}

/** `bf_merge(sketchCol)` → binary: bitwise-OR union of stored
  * filters. */
case class BfMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bf.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bf_merge"

  override def createAggregationBuffer(): Bf.State = Bf.emptyState()

  override def update(buf: Bf.State, input: InternalRow): Bf.State = {
    val v = child.eval(input)
    if (v != null) Bf.mergeBytesInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Bf.State, other: Bf.State): Bf.State = {
    buf.mergeFrom(other.n, other.words)
    buf
  }

  override def eval(buf: Bf.State): Any = Bf.serialize(buf)
  override def serialize(buf: Bf.State): Array[Byte] = Bf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bf.State =
    Bf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BfMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BfMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bf_contains(sketch, itemHash)` → boolean membership probe (no
  * false negatives). CodegenFallback keeps the stage codegen'd. */
case class BfContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bf_contains"
  override def nullSafeEval(sk: Any, item: Any): Any =
    Bf.contains(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `bf_count(sketch)` → bigint: exact inserted-item count carried
  * through builds and merges. */
case class BfCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bf_count"
  override def nullSafeEval(input: Any): Any =
    Bf.count(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
