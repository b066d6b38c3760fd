package graft.engine

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** One-pass 64-bit SimHash signature aggregate.
  *
  * Input per row: `bands` = array<int> of 4×16-bit hash chunks for one
  * token (md5-derived, engine-portable), `cnt` = the token's weight.
  * Buffer: 64 signed counters (+cnt where the token's bit is 1, −cnt
  * where 0). Output: array<bigint> of 4 band values, bit i of band j
  * set iff counter[16j+i] > 0 — exactly the relational formulation the
  * DuckDB oracle uses, so signatures match bit-for-bit.
  *
  * Why an aggregate: the relational spelling explodes every (doc,
  * token) row into 64 (band, bit) rows and re-groups twice — ~10M
  * intermediate rows at sf0.1 (~3 s). This does one hash-agg pass over
  * the (doc, token) rows with map-side partial merge; at 100 TB the
  * signature state is 64 ints per doc regardless of document size.
  */
case class SimHashAgg(
    bandsExpr: Expression,
    cntExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(bandsExpr, cntExpr)
  /** update() unboxes arr.getInt / Long directly — require the exact
    * shapes at analysis so SQL misuse casts (or fails) readably. */
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "simhash_bands"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bands = bandsExpr.eval(input)
    val cnt = cntExpr.eval(input)
    if (bands != null && cnt != null) {
      val arr = bands.asInstanceOf[ArrayData]
      val c = cnt.asInstanceOf[Long]
      var j = 0
      while (j < 4) {
        val v = arr.getInt(j)
        var i = 0
        while (i < 16) {
          if (((v >> i) & 1) == 1) buf(16 * j + i) += c
          else buf(16 * j + i) -= c
          i += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val bands = new Array[Any](4)
    var j = 0
    while (j < 4) {
      var v = 0L
      var i = 0
      while (i < 16) {
        if (buf(16 * j + i) > 0) v |= (1L << i)
        i += 1
      }
      bands(j) = v
      j += 1
    }
    new GenericArrayData(bands)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bandsExpr = newChildren(0), cntExpr = newChildren(1))
}

object SimHashAgg {
  def register(s: SparkSession): Unit = {
    Register.once(s,
      "simhash_bands",
      (args: Seq[Expression]) => SimHashAgg(args(0), args(1)))
    // Same bounded ObjectHashAggregate tuning as TopK.register (the
    // 128-group sort fallback is a measured cliff; 128k groups × 256 B
    // SimHash state ≈ 32 MB worst case per task).
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
               "131072")
  }
}
