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
  * driver parses. The fix is a register-once guard keyed on a
  * SESSION-CONF MARKER (r14 ADVICE #2): the first call per session
  * registers through createOrReplaceTempFunction — so the ENGINE's
  * builder wins even if a test mock, a user registration, or a future
  * Spark built-in already occupies the name (the pre-r13 guarantee,
  * which the earlier registry-probe spelling silently gave up) — and
  * sets `graft.registered.<name>` in the session conf; later calls
  * see the marker and skip, keeping stderr WARN-free. Per-session by
  * construction (conf and registry share the session's lifetime); a
  * user who deliberately replaces the function AFTER the engine
  * registered keeps their replacement (we never re-clobber).
  */
object Register {
  def once(s: SparkSession, name: String,
           builder: Seq[Expression] => Expression): Unit = {
    val key = s"graft.registered.$name"
    // benign check-then-act: a concurrent first registration just
    // means one replaced-function WARN, never wrong behavior
    if (!s.conf.getOption(key).contains("true")) {
      s.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
      s.conf.set(key, "true")
    }
  }
}
