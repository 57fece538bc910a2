package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingle hashes: for a single-space-tokenized text,
  * returns the rolling hash (31-polynomial mod 2^31−1, identical to
  * [[RollingHash]]) of every k-consecutive-token window — i.e. exactly
  * `transform(shingles(text,k), s -> rollingHash(s))` without
  * materializing any shingle string or dispatching per-element
  * lambdas. MinHash/LSH over a 100 TB corpus is bounded by this
  * primitive, so it gets the native loop. */
object ShingleHashes {
  val M: Long = (1L << 31) - 1

  def hashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    // token boundaries on single spaces (Spark split(text, ' ')
    // semantics: consecutive spaces yield empty tokens — the fold then
    // contributes just the separator, matching the column-math twin)
    val tokenStarts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') tokenStarts += i + 1
      i += 1
    }
    val n = tokenStarts.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var w = 0
    while (w <= n - k) {
      val from = tokenStarts(w)
      val to =
        if (w + k < n) tokenStarts(w + k) - 2 // end of last token - 1
        else str.length - 1
      var acc = 0L
      var p = from
      while (p <= to) {
        val cp = str.codePointAt(p)
        acc = (acc * 31 + cp) % M
        p += Character.charCount(cp)
      }
      out(w) = acc
      w += 1
    }
    new GenericArrayData(out)
  }

  def shingle_hashes(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(ShingleHashesExpr(
      org.apache.spark.sql.GraftBridge.expression(c), k))
}

case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"shingle_hashes needs STRING and k>=1")

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashesExpr = copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}
