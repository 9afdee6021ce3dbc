package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PointInPolygon
import graft.queries.Poster

/** Property-based invariants (SURVEY §5.3), scalacheck over the pure
  * expression surface plus range checks over the fixture pipeline. */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def pip(px: Double, py: Double,
      xs: Array[Double], ys: Array[Double]): Boolean =
    PointInPolygon(
      Literal(px), Literal(py),
      Literal.create(xs, ArrayType(DoubleType, containsNull = false)),
      Literal.create(ys, ArrayType(DoubleType, containsNull = false)))
      .eval(null).asInstanceOf[Boolean]

  // Star-shaped polygon around the origin — the blob family's shape class.
  private val polyGen: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(5, 24)
    radii <- Gen.listOfN(n, Gen.choose(0.5, 1.5))
  } yield {
    val rs = radii.toArray
    val xs = Array.tabulate(n)(i => rs(i) * math.cos(2 * math.Pi * i / n))
    val ys = Array.tabulate(n)(i => rs(i) * math.sin(2 * math.Pi * i / n))
    (xs, ys)
  }
  private val pointGen: Gen[(Double, Double)] = for {
    x <- Gen.choose(-2.0, 2.0); y <- Gen.choose(-2.0, 2.0)
  } yield (x, y)

  test("PIP parity is invariant under vertex-list rotation") {
    check(Prop.forAll(polyGen, pointGen, Gen.choose(1, 23)) {
      case ((xs, ys), (px, py), k) =>
        val r = k % xs.length
        val rx = xs.drop(r) ++ xs.take(r)
        val ry = ys.drop(r) ++ ys.take(r)
        pip(px, py, xs, ys) == pip(px, py, rx, ry)
    })
  }

  test("PIP: polygon centroid-ward points are inside, far points outside") {
    check(Prop.forAll(polyGen) { case (xs, ys) =>
      pip(0.0, 0.0, xs, ys) && !pip(10.0, 10.0, xs, ys)
    })
  }

  test("poster cells: alpha in [0,1], shade >= 0.3, rgb in [0,1]") {
    val bad = Poster.queries("q22_poster_cells")(TestSpark.spark, "")
      .where(col("a") < 0 || col("a") > 1
        || col("shade") < 0.3
        || col("r") < 0 || col("r") > 1
        || col("g") < 0 || col("g") > 1
        || col("b") < 0 || col("b") > 1)
      .count()
    assert(bad === 0L)
  }

  test("normalized light in [0,1] across the grid") {
    val bad = Poster.queries("q19_shading")(TestSpark.spark, "")
      .where(col("lightn") < 0 || col("lightn") > 1)
      .count()
    assert(bad === 0L)
  }

  // q99's quantizer law: round-half-up to the grid 1/qs never moves a
  // value by more than half a step — for ANY vector and ANY positive
  // scale derived from its absmax (not just the fixture embeddings).
  test("int8 quantizer: per-element reconstruction error ≤ half a step") {
    val vecGen = for {
      n <- Gen.choose(1, 96)
      xs <- Gen.listOfN(n, Gen.choose(-10.0, 10.0))
      if xs.exists(x => math.abs(x) > 1e-9)
    } yield xs.toArray
    check(Prop.forAll(vecGen) { xs =>
      val qs = 127.0 / xs.map(math.abs).max
      val halfStep = 0.5 / qs
      xs.forall { x =>
        val xhat = math.floor(x * qs + 0.5) / qs
        math.abs(x - xhat) <= halfStep * (1 + 1e-12)
      }
    })
  }
}
