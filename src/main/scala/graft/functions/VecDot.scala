package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double not null>` columns —
  * the hot scalar of every vector-similarity query (64 multiplies + adds
  * per candidate pair).
  *
  * Why it exists: the declarative form `aggregate(zip_with(a, b, *), 0d,
  * +)` is a higher-order function, and Catalyst evaluates HOF lambdas
  * INTERPRETED (one boxed lambda call per element, outside whole-stage
  * codegen). At |candidates| × 64 elements that interpretation dominates
  * the ANN queries' runtime. This expression compiles to a tight primitive
  * loop inside whole-stage codegen.
  *
  * Semantics: sequential left-to-right accumulation `acc += a[i] * b[i]`
  * over the common prefix (min length) — the IDENTICAL operation order of
  * the HOF fold and of DuckDB's list_dot_product loop, so results are
  * bit-for-bit the values the oracles already check. Nullable ELEMENTS are
  * rejected at type-check (a null would read as 0.0 silently); callers pin
  * non-null elements with an explicit coalesce, as with point_in_polygon.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == ArrayType(DoubleType, containsNull = false) &&
      right.dataType == ArrayType(DoubleType, containsNull = false)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double not null>, array<double not null>), " +
        s"got ${children.map(_.dataType.simpleString)}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($xs.numElements(), $ys.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xs.getDouble($i) * $ys.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
