package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule (the §2.10 custom-surface tier beyond expressions:
  * a `Rule[LogicalPlan]` injected via `GraftExtensions` /
  * `spark.experimental.extraOptimizations`): rewrites the idiomatic
  * HOF norm² spelling
  *
  *   aggregate(zip_with(a, a, (x, y) => x * y), 0.0, (s, x) => s + x)
  *
  * (what `ArrayOps.dot(a, a)` / `ArrayOps.l2Norm(a)` build) into the
  * native allocation-free `DotExpr(a, a)` kernel — users write the
  * declarative HOF form, the optimizer swaps in the codegen'd loop.
  *
  * The match is deliberately CONSERVATIVE, firing only when the
  * rewrite is provably semantics-preserving:
  *  - both zip_with sides are the SAME attribute (`semanticEquals`):
  *    equal lengths are guaranteed (zip_with's null-padding for the
  *    shorter side can never trigger) and duplicating the expression
  *    into DotExpr's two children cannot double-evaluate anything
  *    expensive or nondeterministic — an attribute is a column read;
  *  - the element type is ARRAY<DOUBLE NOT NULL>: a null element makes
  *    the HOF form yield NULL while the primitive kernel would read
  *    garbage, so nullable elements (e.g. raw parquet list columns)
  *    are left untouched. Typed Dataset schemas (`Seq[Double]`
  *    encoders) are exactly the non-null case, so the typed surface
  *    gets the kernel for free (RewriteSpec pins fire/no-fire and
  *    bit-equality).
  */
object DotRewrite extends Rule[LogicalPlan] {

  private def isIdentityLambda(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  private def usesExactly(body2: (Expression, Expression),
      args: Seq[NamedLambdaVariable]): Boolean = (body2, args) match {
    case ((u: NamedLambdaVariable, v: NamedLambdaVariable), Seq(x, y)) =>
      Set(u.exprId, v.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(m1, m2, _), mArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(s1, s2, _), sArgs, _),
            finish)
          if a.isInstanceOf[Attribute] && a.semanticEquals(b) &&
            nonNullDoubleArray(a) &&
            usesExactly((m1, m2), mArgs.collect { case v: NamedLambdaVariable => v }) &&
            usesExactly((s1, s2), sArgs.collect { case v: NamedLambdaVariable => v }) &&
            isIdentityLambda(finish) =>
        DotExpr(a, b)
    }
}
