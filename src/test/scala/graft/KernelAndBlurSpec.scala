package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Poster

/** Kernel construction and separable-blur semantics (SURVEY §5.3/§5.4):
  * normalization, symmetry, fixture agreement, hand-computed 5-tap
  * convolution including the zero-pad edge, and mass conservation. */
class KernelAndBlurSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("q13 kernel: 37 taps, sums to 1, symmetric, matches fixture") {
    val rows = Poster.queries("q13_kernel")(s, "")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.size === 37)
    assert(math.abs(rows.values.sum - 1.0) < 1e-9)
    (1 to 18).foreach(o => assert(rows(o.toLong) === rows(-o.toLong)))
    val fx = s.read.parquet(s"${Poster.FX}/kernel_sigma6.parquet")
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
    rows.foreach { case (o, w) => assert(math.abs(w - fx(o)) < 1e-11) }
  }

  test("5-tap 1-D convolution of a point mass, zero-pad edge semantics") {
    import s.implicits._
    // mask: single cell at x=0 on a 5-wide row; kernel [.1,.2,.4,.2,.1]
    val mask = Seq((0L, 0L, 0L)).toDF("blob_id", "y", "x")
    val kernel = Seq((-2, 0.1), (-1, 0.2), (0, 0.4), (1, 0.2), (2, 0.1))
      .toDF("offset", "weight")
    val out = mask.crossJoin(broadcast(kernel))
      .select(col("blob_id"), col("y"),
        (col("x") - col("offset").cast("long")).as("x"), col("weight"))
      .where(col("x").between(0, 4))
      .groupBy("blob_id", "y", "x").agg(sum("weight").as("v1"))
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    // np.convolve([1,0,0,0,0], k, mode="same") = [.4, .2, .1, 0, 0]:
    // left taps fall off the zero-padded edge and are simply absent.
    assert(out === Map(0L -> 0.4, 1L -> 0.2, 2L -> 0.1))
  }

  test("separable 2-D blur conserves mass (64-grid fixtures)") {
    val blur = Poster.queries("q21_blur_sep2d")(s, "")
      .groupBy("blob_id").agg(sum("v2").as("mass"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mask = Poster.queries("q17_point_in_polygon")(s, "")
      .where(col("inside"))
      .groupBy("blob_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blur.keySet === mask.keySet)
    blur.foreach { case (b, m) =>
      assert(math.abs(m - mask(b)) < 1e-4,
        s"blob $b: blurred mass $m vs mask ${mask(b)}")
    }
  }
}
