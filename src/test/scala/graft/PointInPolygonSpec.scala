package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PointInPolygon

/** Unit tests for the point_in_polygon codegen expression (SURVEY §5.4):
  * hand-checkable triangle cases, agreement between interpreted eval and
  * the SQL/codegen path, and the closing-edge semantics. */
class PointInPolygonSpec extends AnyFunSuite {

  private def pip(px: Double, py: Double,
      xs: Array[Double], ys: Array[Double]): Boolean =
    PointInPolygon(
      Literal(px), Literal(py),
      Literal.create(xs, ArrayType(DoubleType, containsNull = false)),
      Literal.create(ys, ArrayType(DoubleType, containsNull = false)))
      .eval(null).asInstanceOf[Boolean]

  private val triX = Array(0.0, 1.0, 0.0)
  private val triY = Array(0.0, 0.0, 1.0)

  test("unit triangle: interior and exterior points") {
    assert(pip(0.25, 0.25, triX, triY))
    assert(!pip(0.75, 0.75, triX, triY))
    assert(!pip(-0.1, 0.5, triX, triY))
    assert(!pip(0.5, -0.1, triX, triY))
    assert(pip(0.1, 0.1, triX, triY))
  }

  test("closing edge v[n-1]->v[0] is honored (square without repeat)") {
    // Open vertex list: (0,0),(1,0),(1,1),(0,1) — containment of the left
    // half requires the implicit closing edge (0,1)->(0,0).
    val sqX = Array(0.0, 1.0, 1.0, 0.0)
    val sqY = Array(0.0, 0.0, 1.0, 1.0)
    assert(pip(0.1, 0.5, sqX, sqY))
    assert(pip(0.9, 0.5, sqX, sqY))
    assert(!pip(1.1, 0.5, sqX, sqY))
    assert(!pip(-0.1, 0.5, sqX, sqY))
  }

  test("SQL/codegen path agrees with interpreted eval on a 3x3 grid") {
    val s = TestSpark.spark
    import s.implicits._
    val pts = for { y <- 0 until 3; x <- 0 until 3 }
      yield (x * 0.5 - 0.25, y * 0.5 - 0.25)
    val df = pts.toDF("px", "py")
      .selectExpr("px", "py",
        "point_in_polygon(px, py, array(0.0D, 1.0D, 0.0D), " +
          "array(0.0D, 0.0D, 1.0D)) AS inside")
    val got = df.collect().map(r =>
      (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    pts.foreach { case (px, py) =>
      assert(got((px, py)) === pip(px, py, triX, triY),
        s"mismatch at ($px,$py)")
    }
  }

  test("degenerate horizontal edges do not crash or miscount") {
    // Rectangle with a collinear extra vertex on the top edge.
    val xs = Array(0.0, 2.0, 2.0, 1.0, 0.0)
    val ys = Array(0.0, 0.0, 1.0, 1.0, 1.0)
    assert(pip(1.0, 0.5, xs, ys))
    assert(!pip(3.0, 0.5, xs, ys))
  }
}
