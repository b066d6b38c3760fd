package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Mergeable quantile sketches as first-class VALUES — the approximate
  * companion to `agg_percentiles` (SURVEY.md §4.3-3 posture, same as
  * `Hll`): per-partition/day sketches are persisted as binary columns,
  * then re-merged with `qsk_merge` + probed with `qsk_quantile`
  * without rescanning the data. That persist-then-merge path is what a
  * 100 TB telemetry rollup needs and what `percentile_approx` cannot
  * do (its summary never leaves the aggregate).
  *
  * Design note — why hash-threshold sampling, not KLL/GK: both KLL and
  * Greenwald-Khanna are ARRIVAL-ORDER-dependent (their compactions
  * depend on which items are resident when a buffer fills), so two
  * runs over different partitionings give different sketch bytes and
  * different estimates — a direct §2.3 violation (this engine
  * guarantees byte-identical results across partition counts, and
  * QueriesSpec enforces it on every key). This sketch instead keeps
  * the rows whose row-hash has ≥ L trailing zero bits, raising L until
  * at most K rows survive: the retained set is a pure function of the
  * row MULTISET (membership is row-intrinsic; raising L only filters),
  * so one-shot build, any merge tree, and any partitioning produce the
  * SAME canonical sketch — proven byte-identical in QskSpec. The cost
  * is sample-quantile error O(1/√K) (~1% at K=4096) instead of KLL's
  * O(1/K) per byte — the right trade under a determinism contract.
  * Estimates are engine-internal sketch outputs: no-oracle key (like
  * `agg_distinct_hll`) with an in-repo rank-error bound test.
  *
  * Layout: level L (int), exact n (long), m (int), then m sorted
  * (rowHash: long, value: double, weight: long) triples; K = 4096 →
  * ≤ 96 KB a sketch. Every retained ROW has the same inclusion
  * probability 2^-L; exact duplicates of one (rowKey, value) pair
  * share a hash (kept or dropped together), and are COLLAPSED into one
  * weighted entry, so K bounds DISTINCT pairs — a degenerate input of
  * millions of copies of one value keeps level 0 and yields that value
  * as every quantile, instead of sampling itself to an empty sketch.
  * The weighted sample quantile equals the plain order statistic over
  * the expansion, so near-unique row keys (the common case — pass a
  * primary key or `xxhash64(cols…)`) behave exactly as unweighted.
  */
object Qsk {
  val K: Int = 4096
  private val Seed: Long = 77L
  /** Format marker ("QSK2" — v2 = weighted 24-byte triples). Sketches
    * are advertised as persistable binary values, so a stored v1 blob
    * (16-byte pairs, no marker) must fail loudly in deserialize, not
    * misparse or throw a raw BufferUnderflowException. */
  val Magic: Int = 0x51534B32

  /** Row hash: mixes the caller's row key with the value bits so
    * non-unique keys still separate distinct rows; duplicates of a
    * full (key, value) pair stay correlated (kept or dropped
    * together), which leaves the estimator unbiased — each row is
    * retained with probability exactly 2^-L. */
  def rowHash(key: Long, value: Double): Long =
    XXH64.hashLong(key ^ java.lang.Double.doubleToLongBits(value), Seed)

  private def keepAt(h: Long, level: Int): Boolean =
    level == 0 || java.lang.Long.numberOfTrailingZeros(h) >= level

  /** Mutable accumulation state. Invariants: every entry's hash has
    * >= level trailing zeros; entries.size <= 2K between adds (the
    * hysteresis bound — collapse runs at 2K so an adversarial stream
    * of exactly-K distinct duplicated pairs costs amortized O(1) per
    * row, not O(K)); serialize() canonicalizes to <= K DISTINCT
    * (hash, value) entries. */
  final class State(var level: Int, var n: Long,
                    val hs: scala.collection.mutable.ArrayBuffer[Long],
                    val vs: scala.collection.mutable.ArrayBuffer[Double],
                    val ws: scala.collection.mutable.ArrayBuffer[Long]) {

    def add(h: Long, v: Double): Unit = {
      n += 1
      if (keepAt(h, level)) {
        hs += h; vs += v; ws += 1L
        if (hs.length > 2 * K) shrinkTo(K)
      }
    }

    def mergeFrom(oLevel: Int, oN: Long, oHs: Array[Long],
                  oVs: Array[Double], oWs: Array[Long]): Unit = {
      n += oN
      if (oLevel > level) { level = oLevel; refilter() }
      var i = 0
      while (i < oHs.length) {
        if (keepAt(oHs(i), level)) { hs += oHs(i); vs += oVs(i); ws += oWs(i) }
        i += 1
      }
      if (hs.length > 2 * K) shrinkTo(K)
    }

    private def refilter(): Unit = {
      var w = 0
      var i = 0
      while (i < hs.length) {
        if (keepAt(hs(i), level)) {
          hs(w) = hs(i); vs(w) = vs(i); ws(w) = ws(i); w += 1
        }
        i += 1
      }
      hs.remove(w, hs.length - w)
      vs.remove(w, vs.length - w)
      ws.remove(w, ws.length - w)
    }

    /** Merge exact-duplicate (hash, value) entries by summing weights.
      * The collapsed multiset is a pure function of the uncollapsed
      * one, so canonical bytes are unaffected by WHEN this runs. */
    private def collapse(): Unit = {
      if (hs.length <= 1) return
      val seen = new scala.collection.mutable.HashMap[(Long, Long), Int]()
      var w = 0
      var i = 0
      while (i < hs.length) {
        val key = (hs(i), java.lang.Double.doubleToLongBits(vs(i)))
        seen.get(key) match {
          case Some(j) => ws(j) += ws(i)
          case None =>
            if (w != i) { hs(w) = hs(i); vs(w) = vs(i); ws(w) = ws(i) }
            seen(key) = w
            w += 1
        }
        i += 1
      }
      hs.remove(w, hs.length - w)
      vs.remove(w, vs.length - w)
      ws.remove(w, ws.length - w)
    }

    /** Collapse duplicates, then raise the level until at most
      * `target` DISTINCT pairs survive. Because duplicates collapse
      * FIRST, a heavily duplicated input can never force the level
      * past its pairs' trailing-zero count (the pre-weights failure
      * mode: > K copies of one value raised the level until the whole
      * retained set vanished). */
    private[Qsk] def shrinkTo(target: Int): Unit = {
      collapse()
      while (hs.length > target) { level += 1; refilter() }
    }
  }

  def emptyState(): State =
    new State(0, 0L,
      new scala.collection.mutable.ArrayBuffer[Long](64),
      new scala.collection.mutable.ArrayBuffer[Double](64),
      new scala.collection.mutable.ArrayBuffer[Long](64))

  /** Canonical bytes: duplicates collapsed, level settled to the
    * minimal L with <= K distinct survivors, entries sorted by
    * (hash, value) — equal row multisets serialize identically
    * whatever the accumulation or merge order. */
  def serialize(st: State): Array[Byte] = {
    st.shrinkTo(K)
    val m = st.hs.length
    val idx = Array.range(0, m).sortBy(i => (st.hs(i), st.vs(i)))
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 4 + 24 * m)
    bb.putInt(Magic)
    bb.putInt(st.level); bb.putLong(st.n); bb.putInt(m)
    idx.foreach { i =>
      bb.putLong(st.hs(i)); bb.putDouble(st.vs(i)); bb.putLong(st.ws(i))
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    checkMagic(bb)
    val level = bb.getInt; val n = bb.getLong; val m = bb.getInt
    require(bytes.length == 4 + 4 + 8 + 4 + 24 * m,
      s"qsk blob truncated: ${bytes.length} bytes for m=$m entries")
    val st = new State(level, n,
      new scala.collection.mutable.ArrayBuffer[Long](m),
      new scala.collection.mutable.ArrayBuffer[Double](m),
      new scala.collection.mutable.ArrayBuffer[Long](m))
    var i = 0
    while (i < m) {
      st.hs += bb.getLong; st.vs += bb.getDouble; st.ws += bb.getLong
      i += 1
    }
    st
  }

  /** Lower sample quantile over the retained values; null on empty. */
  def quantile(bytes: Array[Byte], q: Double): Any = {
    val qs = quantiles(bytes, Array(q))
    if (qs == null) null else qs(0)
  }

  /** All requested quantiles in ONE deserialize + sort pass — a probe
    * of several percentiles per group pays the 64 KB decode once, not
    * once per percentile. Null on an empty sketch. */
  def quantiles(bytes: Array[Byte], qs: Array[Double]): Array[Double] = {
    val st = deserialize(bytes)
    val m = st.vs.length
    if (m == 0) null
    else {
      // Weighted lower quantile: with all weights 1 this is exactly the
      // plain order statistic at index ceil(q*m)-1; with collapsed
      // duplicates it is the same statistic over the expanded multiset.
      val idx = Array.range(0, m).sortBy(st.vs(_))
      var total = 0L
      st.ws.foreach(total += _)
      qs.map { q =>
        val target = math.min(total,
          math.max(1L, math.ceil(q * total).toLong))
        var cum = 0L
        var i = 0
        var out = st.vs(idx(m - 1))
        var found = false
        while (i < m && !found) {
          cum += st.ws(idx(i))
          if (cum >= target) { out = st.vs(idx(i)); found = true }
          i += 1
        }
        out
      }
    }
  }

  def count(bytes: Array[Byte]): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    checkMagic(bb)
    bb.getInt
    bb.getLong
  }

  private def checkMagic(bb: java.nio.ByteBuffer): Unit = {
    require(bb.remaining >= 4, "qsk blob too short to hold a format marker")
    val m = bb.getInt
    require(m == Magic,
      f"not a qsk v2 sketch: format marker 0x$m%08X (expected 0x$Magic%08X)" +
        " — rebuild the sketch with this engine version")
  }

  def register(s: SparkSession): Unit = {
    Register.once(s,
      "qsk_sketch", (args: Seq[Expression]) => QskSketchAgg(args(0), args(1)))
    Register.once(s,
      "qsk_merge", (args: Seq[Expression]) => QskMergeAgg(args.head))
    Register.once(s,
      "qsk_quantile", (args: Seq[Expression]) => QskQuantileExpr(args(0), args(1)))
    Register.once(s,
      "qsk_quantiles", (args: Seq[Expression]) => QskQuantilesExpr(args(0), args(1)))
    Register.once(s,
      "qsk_count", (args: Seq[Expression]) => QskCountExpr(args.head))
  }
}

/** `qsk_sketch(valueCol, rowKeyCol)` → binary: bounded (≤64 KB)
  * deterministic quantile sketch per group. */
case class QskSketchAgg(
    value: Expression,
    rowKey: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Qsk.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(value, rowKey)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsk_sketch"

  override def createAggregationBuffer(): Qsk.State = Qsk.emptyState()

  override def update(buf: Qsk.State, input: InternalRow): Qsk.State = {
    val v = value.eval(input)
    val k = rowKey.eval(input)
    if (v != null && k != null)
      buf.add(Qsk.rowHash(k.asInstanceOf[Long], v.asInstanceOf[Double]),
              v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: Qsk.State, other: Qsk.State): Qsk.State = {
    buf.mergeFrom(other.level, other.n, other.hs.toArray, other.vs.toArray,
                  other.ws.toArray)
    buf
  }

  override def eval(buf: Qsk.State): Any = Qsk.serialize(buf)

  override def serialize(buf: Qsk.State): Array[Byte] = Qsk.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Qsk.State =
    Qsk.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QskSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QskSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), rowKey = newChildren(1))
}

/** `qsk_merge(sketchCol)` → binary: union + re-threshold of stored
  * sketches — the re-aggregation half of the persist-then-merge path.
  * Same canonical result for any merge tree shape. */
case class QskMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Qsk.State]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qsk_merge"

  override def createAggregationBuffer(): Qsk.State = Qsk.emptyState()

  override def update(buf: Qsk.State, input: InternalRow): Qsk.State = {
    val v = child.eval(input)
    if (v != null) {
      val o = Qsk.deserialize(v.asInstanceOf[Array[Byte]])
      buf.mergeFrom(o.level, o.n, o.hs.toArray, o.vs.toArray, o.ws.toArray)
    }
    buf
  }

  override def merge(buf: Qsk.State, other: Qsk.State): Qsk.State = {
    buf.mergeFrom(other.level, other.n, other.hs.toArray, other.vs.toArray,
                  other.ws.toArray)
    buf
  }

  override def eval(buf: Qsk.State): Any = Qsk.serialize(buf)

  override def serialize(buf: Qsk.State): Array[Byte] = Qsk.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Qsk.State =
    Qsk.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QskMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QskMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `qsk_quantile(sketch, q)` → double (null on an empty sketch). Runs
  * once per GROUP — interpreted eval is fine, CodegenFallback keeps
  * the surrounding stage codegen'd. */
case class QskQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "qsk_quantile"
  // an empty sketch yields null even when both children are non-null
  override def nullable: Boolean = true
  override def nullSafeEval(sk: Any, q: Any): Any =
    Qsk.quantile(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `qsk_quantiles(sketch, array(q1, q2, …))` → array<double>: every
  * probe shares one deserialize + sort (the multi-percentile form a
  * reporting query wants). Null on an empty sketch. */
case class QskQuantilesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, org.apache.spark.sql.types.ArrayType(DoubleType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "qsk_quantiles"
  // an empty sketch yields null even when both children are non-null
  override def nullable: Boolean = true
  override def nullSafeEval(sk: Any, qs: Any): Any = {
    val probes = qs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    val out = Qsk.quantiles(sk.asInstanceOf[Array[Byte]], probes)
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `qsk_count(sketch)` → bigint: the EXACT row count carried through
  * builds and merges (sums are order-free), so the sketch doubles as a
  * count accumulator. */
case class QskCountExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "qsk_count"
  override def nullSafeEval(input: Any): Any =
    Qsk.count(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
