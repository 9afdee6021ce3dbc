package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Optimizer rule (the §2.9 `Rule[LogicalPlan]` surface, registered via
  * SparkSessionExtensions): rewrites the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen `vec_dot(a, b)` expression. Higher-order-function
  * lambdas evaluate interpreted — one boxed call per element — so a user
  * writing the natural declarative form silently pays ~2× on similarity
  * queries; after this rule they get the compiled loop for free.
  *
  * Soundness: fires only when both arrays are `array<double not null>`
  * (VecDot's type contract), the zip lambda is exactly a product of its
  * two variables, the fold lambda exactly a sum of its two, and the
  * finish lambda the identity. Operand ORDER within * and + may be
  * either way — both are bit-exact under IEEE commutativity (it is
  * reassociation that changes results, and the sequential fold order is
  * preserved: VecDot accumulates left-to-right exactly like
  * ArrayAggregate). Idempotent — the rewritten tree no longer matches.
  *
  * RAGGED ARRAYS: zip_with pads the shorter array with NULLs, so the HOF
  * form returns NULL whenever the lengths differ (the null element nulls
  * the product, which nulls the running sum), while bare vec_dot would
  * return the min-length prefix dot. The rewrite therefore emits the
  * guarded form `IF(size(l) = size(r), vec_dot(l, r), NULL)` — exactly
  * the HOF semantics for every input, including NULL arrays (size(NULL)
  * is NULL ⇒ the IF falls through to NULL, as the HOF does). The rule is
  * injected into EVERY session via GraftExtensions, so this equivalence
  * has to hold for arbitrary user data, not just this catalog's
  * fixed-width embeddings.
  *
  * Two further guards the general contract needs: the operands must be
  * DETERMINISTIC — the guarded form evaluates l and r twice (Size +
  * VecDot), which would run a non-deterministic array expression under
  * the size check and a DIFFERENT draw under the dot — and the fold seed
  * must be bit-exactly +0.0 (`doubleToRawLongBits` compare): Scala's
  * boxed `== 0.0` also accepts a -0.0 literal, whose HOF result on empty
  * arrays is -0.0 while VecDot starts from +0.0.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def commutes(l: Expression, r: Expression,
      a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(ax, ay, _),
            Seq(aa: NamedLambdaVariable, ab: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero.isInstanceOf[Double] &&
          java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) ==
            java.lang.Double.doubleToRawLongBits(0.0) &&
          l.deterministic && r.deterministic &&
          nonNullDoubleArray(l) && nonNullDoubleArray(r) &&
          commutes(mx, my, zx, zy) && commutes(ax, ay, aa, ab) &&
          isVar(fin, fv) =>
        If(EqualTo(Size(l), Size(r)), VecDot(l, r),
          Literal(null, DoubleType: DataType))
    }
}
