package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Custom Catalyst surface (SURVEY.md §4.3): one performance-mandatory
  * expression. Stock higher-order-function cosine over a 64-dim float
  * array is interpreted per element inside codegen'd stages and made
  * `emb_knn_bruteforce` the measured perf cliff (26.7 s vs a 5.2 s
  * DuckDB floor at sf0.1 — BASELINE.md). This expression emits a
  * primitive double loop via `doGenCode`, stays inside whole-stage
  * codegen, and is the declared proof of the Expression extension
  * point (`expr_native_cosine`).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float>/array<double> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Each side independently float or double (a trained codebook is
    * double, raw embeddings float); floats widen to double exactly, so
    * arithmetic is double throughout either way. */
  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDoubleArr(left), isDoubleArr(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isDoubleArr(left)) s"$a.getDouble($i)"
                 else s"(double) $a.getFloat($i)"
      val getY = if (isDoubleArr(right)) s"$b.getDouble($i)"
                 else s"(double) $b.getFloat($i)"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = $getX;
        |  double $yi = $getY;
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two equal-role bit-signature arrays
  * (array<bigint>): Σ Long.bitCount(a_i ^ b_i). The SimHash verify
  * primitive — a primitive long loop in whole-stage codegen instead of
  * four element_at + bit_count + xor expression nodes per pair.
  * Unequal array lengths fail loudly: a band-count mismatch between
  * signature producers means the signatures are incomparable, and
  * truncating to the common prefix would underreport distance (making
  * unrelated docs look like near-dups). */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_dist expects two array<bigint> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"hamming_dist: signature arrays differ in length " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var h = 0; var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
    }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  throw new IllegalArgumentException(
        |    "hamming_dist: signature arrays differ in length (" +
        |    $a.numElements() + " vs " + $b.numElements() + ")");
        |}
        |int $n = $a.numElements();
        |int $h = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** NFC Unicode normalization as a codegen'd scalar — the standard
  * C4/CCNet text-cleaning first stage (compose e + U+0301 into é, so
  * visually identical strings hash/dedup identically). Spark has no
  * built-in normalizer; a Scala UDF would fall out of whole-stage
  * codegen on the hottest corpus column, so this is a native
  * UnaryExpression whose generated code is one static JVM call. The
  * isNormalized fast path skips allocation for the (dominant) already-
  * NFC case. */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string column, got $t")
    }

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.nfc(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.engine.NfcNormalizeExpr$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Bit-interleave (Morton / Z-order) helpers, shared by the
  * interpreted eval and the generated code. */
object ZOrder {
  /** Spreads the low 16 bits of `v` to the even bit positions 0..30. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
  /** 32-bit Morton code: x's bits at even positions, y's at odd. */
  def interleave(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** N-way Morton code: bit i of value c lands at position i·N + c.
    * `bits` low bits of each value participate; callers size
    * bits·N ≤ 62 (rewriteClusteredN uses min(16, 62/N)). A plain
    * double loop — this runs once per row in a LAYOUT job, never in a
    * query's hot path. */
  def interleaveN(vs: Array[Long], bits: Int): Long = {
    val n = vs.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var c = 0
      while (c < n) {
        out |= ((vs(c) >>> i) & 1L) << (i * n + c)
        c += 1
      }
      i += 1
    }
    out
  }
}

/** `zordern(x1, …, xk)` → bigint k-way Morton code over each key's
  * low ⌊62/k⌋ (≤16) bits — the N-column generalization of `zorder2`
  * behind `rewriteClusteredN` (r11 verdict #5). Null in any key →
  * null (a layout job maps nulls to a sentinel ordinal first).
  * CodegenFallback by design: this evaluates once per row inside a
  * one-off LAYOUT (maintenance) job, never in a query's hot path —
  * zorder2 keeps the codegen'd two-key fast path. */
case class ZOrderNExpr(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("zordern expects >= 2 args")
    else if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zordern expects bigint args, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zordern"

  private def bits: Int = math.min(16, 62 / children.size)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var c = 0
    while (c < children.size) {
      val v = children(c).eval(input)
      if (v == null) return null
      vs(c) = v.asInstanceOf[Long]
      c += 1
    }
    ZOrder.interleaveN(vs, bits)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** `zorder2(x, y)` → bigint Morton code of the two keys' low 16 bits —
  * the multi-dimensional clustering key behind `scan_zorder_skip`:
  * sorting by the interleaved code gives row groups that are tight in
  * BOTH dimensions at once, so min/max stats skip data for a band
  * predicate on EITHER column (a single-column sort only serves its
  * own column). A layout job computes this once per row — the codegen
  * body is five shift-mask lines per key, fully inside whole-stage
  * codegen. Callers mask/shift their values into 16 bits (e.g. day
  * offsets, bucketed ids); bits above 15 are ignored by design. */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two bigint args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.engine.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Exprs {
  /** Idempotently registers the custom scalar expressions in the
    * session's function registry so plans can call them through
    * `expr("cosine_sim(a, b)")` — the public, non-internal spelling. */
  def register(s: SparkSession): Unit = {
    Register.once(s,
      "cosine_sim",
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1)))
    Register.once(s,
      "hamming_dist",
      (args: Seq[Expression]) => HammingDistExpr(args(0), args(1)))
    Register.once(s,
      "nfc_normalize",
      (args: Seq[Expression]) => NfcNormalizeExpr(args.head))
    Register.once(s,
      "zorder2",
      (args: Seq[Expression]) => ZOrderExpr(args(0), args(1)))
    Register.once(s,
      "zordern",
      (args: Seq[Expression]) => ZOrderNExpr(args))
  }
}
