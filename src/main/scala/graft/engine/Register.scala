package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-idempotent temp-function registration (r13 verdict #2).
  *
  * Query builders call `X.register(s)` defensively at every site that
  * needs a custom function, so a full Bench/Verify run re-registers
  * each name hundreds of times — and every re-register makes
  * `SimpleFunctionRegistry` WARN "The function X replaced a previously
  * registered function", flooding the exact stderr artifact the
  * driver parses. The fix is a probe-first register: skip when the
  * name already exists in THIS session's registry. Safe because every
  * name's builder is a stable top-level function (same behavior on
  * every call), and per-session because the registry itself is —
  * a fresh session still registers cleanly.
  */
object Register {
  def once(s: SparkSession, name: String,
           builder: Seq[Expression] => Expression): Unit = {
    val fr = s.sessionState.functionRegistry
    // benign check-then-act: a concurrent first registration just
    // means one replaced-function WARN, never wrong behavior
    if (!fr.functionExists(FunctionIdentifier(name)))
      fr.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
