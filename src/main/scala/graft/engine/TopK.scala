package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs under the
  * total order (score DESC, id ASC) and emits them as a sorted
  * array<struct<score:double, id:bigint>>.
  *
  * This is the scale-path replacement for `row_number() OVER
  * (PARTITION BY g ORDER BY score DESC) <= k` on huge groups: a window
  * shuffles and sorts ALL n rows per group; this aggregate does
  * map-side partial aggregation, so only n_groups × k tuples cross the
  * wire — on the brute-force knn that is 4M rows → 10k tuples.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  /** Analysis-time contract: update() blindly unboxes Double/Long, so
    * narrower numerics (float score, int id) must be cast here — via
    * the SQL surface `topk_by_score(float_col, int_col, 5)` would
    * otherwise pass analysis and ClassCastException at execution. */
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_by_score"

  /** Buffer invariant: sorted by (score DESC, id ASC), size <= k. */
  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)],
                     e: (Double, Long)): Unit = {
    if (buf.size >= k && !better(e, buf.last)) return
    var i = buf.size
    while (i > 0 && better(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      insert(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n + 1)
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopK {
  /** Registers `topk_by_score(score double, id bigint, k int const)`.
    * Use as an aggregate: `expr("topk_by_score(cos_sim, neighbor_id, 5)")`. */
  def register(s: SparkSession): Unit = {
    Register.once(s,
      "topk_by_score",
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_score k must be an int literal, got $other")
        }
        TopKByScore(args(0), args(1), k)
      })
    // ObjectHashAggregate's default sort-fallback (128 distinct groups)
    // is a measured perf cliff for this aggregate: every topk grouping
    // here has >>128 groups, and the sort-based path re-sorts the full
    // input per partition. 128k hash-map entries keeps the hash path
    // for every realistic group count while bounding worst-case typed
    // aggregate state: the engine's largest many-group k is the
    // hot-bucket cap (k=256, ~4 KB/group → ≤ ~512 MB per task before
    // fallback); the k=4096 LSH site has ≤ 256 groups total and never
    // nears the threshold. NOTE the conf is session-wide, so it also
    // governs other object-hash aggregates (collect_list) that run
    // after any TopK/SimHash key — the bound is chosen to stay safe
    // for those too. Centralized HERE so call sites stop mutating the
    // session conf ad hoc with unbounded values.
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
               "131072")
  }
}
