package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must turn the declarative HOF dot product into the
  * codegen vec_dot expression — and must NOT fire when the pattern isn't
  * a dot product or the arrays could hold nulls. */
class VecDotRewriteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def nonNull(c: String) =
    transform(col(c), x => coalesce(x.cast("double"), lit(Double.NaN)))

  test("HOF dot-product pattern rewrites to vec_dot and agrees") {
    // parquet-backed (a local Seq would constant-fold to a LocalRelation
    // before the rewrite is observable)
    val df = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(nonNull("embedding").as("a"), nonNull("embedding").as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), s"rule did not fire:\n$optimized")
    val direct = df.select(call_function("vec_dot", col("a"), col("b")).as("d"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ===
      direct.collect().map(_.getDouble(0)).toSeq)
  }

  test("ragged arrays keep the HOF's NULL semantics after the rewrite") {
    // zip_with pads the shorter side with NULLs → the HOF dot is NULL on
    // unequal lengths; the rewritten guarded form must agree (not return
    // vec_dot's min-length prefix product).
    val df = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(nonNull("embedding").as("a"),
        slice(nonNull("embedding"), 1, 63).as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), s"rule did not fire:\n$optimized")
    val rows = hof.collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(0)),
      "unequal-length arrays must yield NULL, as the unrewritten HOF does")
  }

  test("non-dot-product folds are left alone") {
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(nonNull("a").as("a"), nonNull("b").as("b"))
    // sum of sums, not a product — must NOT rewrite
    val notDot = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(!notDot.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(notDot.collect().head.getDouble(0) === 10.0)
  }

  test("non-deterministic operands are left alone (double-eval hazard)") {
    // the guarded form evaluates the operand twice (size + dot); on a
    // non-deterministic array that computes the size of one draw and the
    // dot of another — the rule must not fire. The shuffle() must be
    // INLINE in the aggregate (one select): behind an attribute from a
    // child Project it is safe, since CollapseProject never inlines a
    // non-deterministic expression into multiple references.
    val df = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = df.select(
      aggregate(zip_with(shuffle(nonNull("embedding")),
          nonNull("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      "rule must not duplicate a non-deterministic operand")
  }

  test("a -0.0 fold seed is left alone (bit-exactness contract)") {
    // HOF with seed -0.0 returns -0.0 on empty arrays; vec_dot returns
    // +0.0 — only the bit-exact +0.0 seed may rewrite
    val df = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(slice(nonNull("embedding"), 1, 0).as("a"),
        slice(nonNull("embedding"), 1, 0).as("b"))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(-0.0), (acc, x) => acc + x).as("d"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      "rule must not fire on a -0.0 seed")
    val out = hof.collect().map(_.getDouble(0))
    assert(out.nonEmpty && out.forall(d =>
      java.lang.Double.doubleToRawLongBits(d) ==
        java.lang.Double.doubleToRawLongBits(-0.0)),
      "empty-array HOF with -0.0 seed must keep the -0.0 result")
  }

  test("nullable-element arrays are left alone (type contract)") {
    import s.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // plain double arrays from Seq have nullable elements in the schema
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val planStr = hof.queryExecution.optimizedPlan.toString
    if (df.schema("a").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull) {
      assert(!planStr.contains("vec_dot"))
    }
    assert(hof.collect().head.getDouble(0) === 11.0)
  }
}
