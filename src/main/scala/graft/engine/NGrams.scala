package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams_gen(text, n)` — a TRUE lateral table function: a custom
  * Catalyst [[Generator]] that plans as a `Generate` node (SURVEY.md
  * §4.3 item 2, the one extension point the explode spelling of
  * `udtf_generator_ngrams` left unexercised). One input row fans out
  * to its word n-grams as `(pos, ngram)` rows, `pos` 1-based at the
  * n-gram's first word.
  *
  * Why a Generator and not explode-of-transform: the array spelling
  * MATERIALIZES every document's full n-gram array before exploding
  * it — at 100 TB that is a transient per-row allocation proportional
  * to document length. The generator streams rows out of an iterator,
  * so peak memory per input row is one n-gram. Results are pinned
  * hash-identical to the explode spelling (`udtf_ngrams_native` vs
  * `udtf_generator_ngrams` share one oracle; PlanSpec asserts the
  * physical `GenerateExec` carries THIS class). CodegenFallback is the
  * documented Generator posture: GenerateExec itself stays whole-stage
  * in the enclosing plan only for supported collection generators, and
  * fanout cost dominates either way.
  */
case class NGramsGenerator(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"ngrams_gen expects a string column, got ${child.dataType.simpleString}")
    else if (!n.foldable || n.dataType != IntegerType || n.eval() == null ||
             n.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        "ngrams_gen expects a positive int literal n-gram size")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val size: Int = n.eval().asInstanceOf[Int]

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      val m = words.length - size + 1
      if (m <= 0) Nil
      else (0 until m).iterator.map { i =>
        InternalRow(i + 1,
          UTF8String.fromString(words.slice(i, i + size).mkString(" ")))
      }
    }
  }

  override def prettyName: String = "ngrams_gen"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

object NGrams {
  def register(s: SparkSession): Unit =
    Register.once(s,
      "ngrams_gen",
      (args: Seq[Expression]) => NGramsGenerator(args(0), args(1)))
}
