package graft.plans

import graft.functions.{ArrayDotExpr, RollingHashExpr, ShingleHashesExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EqualTo, Expression, ExpressionInfo, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Engine extension point (SURVEY.md §2.9 / builder mandate item (c)):
  * registered with `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `builder.withExtensions`), so a spark-submit user gets the
  * engine's native kernels with zero code — both as SQL functions and
  * as a transparent optimizer rewrite.
  *
  * 1. SQL functions `rolling_hash(text)`, `shingle_hashes(text, k)`,
  *    `array_dot(a, b)` — the native codegen'd expressions behind
  *    fingerprinting (q35), MinHash/LSH (q16/q22) and ANN (q23/q45),
  *    callable from `spark.sql` / views / thriftserver sessions.
  * 2. [[NativeDotRewrite]]: rewrites the column-math dot-product fold
  *    `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
  *    into the native [[ArrayDotExpr]] loop wherever it appears, so
  *    hand-written SQL gets kernel speed without knowing the kernel
  *    exists.
  *
  * No planner strategy / custom physical node is injected by design:
  * every operator in SURVEY.md §2 lowers to stock exchanges +
  * whole-stage codegen (SURVEY §4) — a strategy would only replace
  * plans Catalyst already picks correctly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getCanonicalName,
        "rolling_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => RollingHashExpr(c)
        case _ => throw new IllegalArgumentException(
          "rolling_hash(text) takes exactly 1 argument")
      }))

    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getCanonicalName,
        "shingle_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(k: Int, IntegerType)) =>
          ShingleHashesExpr(c, k)
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text, k) needs a text column and a literal INT k")
      }))

    ext.injectFunction((FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotExpr].getCanonicalName,
        "array_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => ArrayDotExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "array_dot(a, b) takes exactly 2 arguments")
      }))

    ext.injectOptimizerRule(_ => NativeDotRewrite)
  }
}

/** Rewrites the canonical dot-product fold to [[ArrayDotExpr]].
  *
  * Semantics-preserving by construction:
  *  - only fires on `array<double>` with `containsNull = false` (a
  *    null element would null the fold, which the native loop can't);
  *  - `zip_with` null-pads when lengths differ, the null products
  *    null the whole fold, and null input arrays null every step — so
  *    the original is exactly null unless both arrays are non-null
  *    and equal-length; the rewrite keeps that contract as
  *    `If(size(a) = size(b), native, NULL)` (leaving the original
  *    fold on the else branch would re-match forever in the
  *    fixed-point optimizer batch);
  *  - `Add`/`Multiply` are IEEE-commutative, so either operand order
  *    matches; the fold order itself (index-ascending) is identical,
  *    keeping doubles bit-equal (the DuckDB oracle relies on this).
  *
  * Disable with `spark.graft.nativeDotRewrite=false` (used by the
  * native-vs-twin parity spec to keep both sides honest).
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  private def varPair(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (sameVar(l, a) && sameVar(r, b)) || (sameVar(l, b) && sameVar(r, a))

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = conf.getConfString("spark.graft.nativeDotRewrite",
      "true").toBoolean
    if (!enabled) plan
    else plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fb: NamedLambdaVariable,
              Seq(fa: NamedLambdaVariable), _))
          if agg.resolved && a.deterministic && b.deterministic &&
            nonNullDoubleArray(a) && nonNullDoubleArray(b) &&
            varPair(ml, mr, zx, zy) && varPair(al, ar, acc, el) &&
            fb.exprId == fa.exprId =>
        If(EqualTo(Size(a), Size(b)), ArrayDotExpr(a, b),
          Literal(null, DoubleType))
    }
  }
}
