package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** vec_dot ≡ the declarative HOF fold it replaces, bit-for-bit — both
  * accumulate left-to-right, so every double is identical, not just
  * close. Also pins the length (common prefix) and empty-array rules. */
class VecDotSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("vec_dot equals aggregate(zip_with(...)) exactly on real vectors") {
    import s.implicits._
    graft.functions.GraftExtensions.ensureRegistered(s)
    val e = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform(col("embedding"),
        x => coalesce(x.cast("double"), lit(Double.NaN))).as("e"))
    val cmp = e.select(
      call_function("vec_dot", col("e"), col("e")).as("native"),
      aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    // bitwise equality via cast to long bits would need a UDF; === on
    // doubles is exact equality here (no tolerance)
    assert(cmp.where(not(col("native") === col("hof"))).count() === 0L)
  }

  test("empty and length-mismatched arrays") {
    import s.implicits._
    graft.functions.GraftExtensions.ensureRegistered(s)
    val df = Seq(
      (Array.empty[Double], Array.empty[Double], 0.0),
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0), 14.0) // common prefix: 1*4+2*5
    ).toDF("a", "b", "expect")
    val bad = df.select(call_function("vec_dot", col("a"), col("b"))
      .as("got"), col("expect"))
      .where(not(col("got") === col("expect"))).count()
    assert(bad === 0L)
  }
}
