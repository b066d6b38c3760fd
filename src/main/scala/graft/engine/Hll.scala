package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable HyperLogLog sketches as first-class VALUES (SURVEY.md
  * §4.3-3) — the piece `approx_count_distinct` hides: its sketch never
  * leaves the aggregate, so it cannot be persisted per partition/day
  * and re-merged later. At 100 TB that merge path is the whole game: a
  * distinct-count over the corpus is computed as per-partition
  * sketches (4 KB each, written with any artifact), then `hll_merge` +
  * `hll_estimate` over just the sketch rows — no re-scan of the data.
  *
  * Layout: dense HLL, p=12 → m=4096 single-byte registers; standard
  * bias-corrected estimator with linear counting on the small range
  * (Flajolet et al., and the HLL surveys in PAPERS.md). Hashing is
  * XXH64(seed=42) of the input long — fully deterministic, so sketches
  * are reproducible across runs and partitionings (§2.3), but they are
  * engine-internal values: the declared key is no-oracle (like
  * distinct_approx) with a ±5%-of-exact scalatest bound.
  */
object Hll {
  val P: Int = 12
  val M: Int = 1 << P // 4096 registers
  private val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  private val Seed: Long = 42L

  /** Register index + rank update for one hashed value. */
  def add(regs: Array[Byte], value: Long): Unit = {
    val h = XXH64.hashLong(value, Seed)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank =
      if (w == 0L) (64 - P + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
  }

  /** Bytewise max — the HLL merge (associative, commutative,
    * idempotent: safe under partial aggregation, retries, and
    * any merge tree shape). */
  def mergeInto(into: Array[Byte], other: Array[Byte]): Unit = {
    require(into.length == other.length,
      s"hll_merge: sketch sizes differ (${into.length} vs ${other.length})")
    var i = 0
    while (i < into.length) {
      if ((other(i) & 0xff) > (into(i) & 0xff)) into(i) = other(i)
      i += 1
    }
  }

  /** Bias-corrected cardinality estimate, rounded to a long. */
  def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = regs(i) & 0xff
      invSum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / invSum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.rint(corrected).toLong
  }

  def register(s: SparkSession): Unit = {
    Register.once(s,
      "hll_sketch", (args: Seq[Expression]) => HllSketchAgg(args.head))
    Register.once(s,
      "hll_merge", (args: Seq[Expression]) => HllMergeAgg(args.head))
    Register.once(s,
      "hll_estimate", (args: Seq[Expression]) => HllEstimateExpr(args.head))
    Register.once(s,
      "hll_merge2", (args: Seq[Expression]) =>
        HllMerge2Expr(args(0), args(1)))
  }
}

/** `hll_merge2(a, b)` → binary: the SCALAR two-sketch union (bytewise
  * register max) — what lets a prefix-merge combine a slice-local
  * running sketch with its predecessor-slices offset sketch row-wise,
  * the exactPrefixSum offset-attach step applied to sketches. Either
  * side null (e.g. the first slice's empty offset) passes the other
  * through unchanged — the merge identity. Runs once per OUTPUT row
  * of an aggregated frame, so interpreted eval is fine
  * (CodegenFallback, the hll_estimate posture). */
case class HllMerge2Expr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "hll_merge2"
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null) return b
    if (b == null) return a
    val ab = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    require(ab.length == Hll.M && bb.length == Hll.M,
      s"hll_merge2: expected ${Hll.M}-byte dense sketches, " +
        s"got ${ab.length}/${bb.length} bytes")
    val out = ab.clone()
    Hll.mergeInto(out, bb)
    out
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `hll_sketch(longCol)` → binary: one 4 KB dense sketch per group.
  * Constant-size state regardless of group cardinality; partial
  * aggregation merges map-side like any other TypedImperativeAggregate. */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_merge(sketchCol)` → binary: bytewise-max union of stored
  * sketches — the re-aggregation half of the persist-then-merge path. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Hll.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buf, other); buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_estimate(sketch)` → bigint. Runs once per GROUP (not per row),
  * so interpreted eval is fine — CodegenFallback keeps the surrounding
  * stage codegen'd. */
case class HllEstimateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    require(bytes.length == Hll.M,
      s"hll_estimate: expected a ${Hll.M}-byte dense sketch, " +
        s"got ${bytes.length} bytes")
    Hll.estimate(bytes)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
