package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the engine's custom expressions to
  * SQL. Activate with
  * `spark.sql.extensions=graft.expr.GraftExtensions` (spark-submit) or
  * [[GraftExtensions.register]] on a live session (tests / Verify).
  *
  * SQL surface:
  *   graft_hmac_sha256_hex(data, key) — deterministic blind index (F4)
  *   graft_array_dot(a, b)            — codegen'd vector dot product
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private val injected: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_hmac_sha256_hex",
      new ExpressionInfo(classOf[HmacSha256Hex].getName, "graft_hmac_sha256_hex"),
      (args: Seq[Expression]) => HmacSha256Hex(args(0), args(1))),
    ("graft_array_dot",
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_array_dot"),
      (args: Seq[Expression]) => ArrayDotProduct(args(0), args(1))))

  /** Register on an already-running session (FunctionRegistry injection). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injected.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
