package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 31-polynomial rolling
  * hash mod 2^31−1 (SURVEY.md §2.9's "codegen'd Expression" escape
  * hatch, exercised): semantically identical to the column-math
  * version in [[graft.text.TextOps.rollingHash]] (split + transform +
  * aggregate) but one tight generated loop — no per-char string
  * allocation, stays inside whole-stage codegen.
  */
object RollingHash {
  val M: Long = (1L << 31) - 1

  /** Shared kernel: interpreted eval and the generated code both call
    * this (the loop is branch-free; JIT inlines it). Iterates code
    * points to match `ascii()` over single-char splits on BMP text. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % M
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API: `rolling_hash(col)` (Spark 4's Column is
    * connect-agnostic — the classic bridge converts to/from catalyst
    * Expressions). */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      RollingHashExpr(org.apache.spark.sql.GraftBridge.expression(c)))
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"rolling_hash needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : RollingHashExpr = copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}
