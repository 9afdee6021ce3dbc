package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed Aggregator (SURVEY §2.9 surface): 64-bit SimHash of a
  * document from its per-token 64-bit hashes.
  *
  * Classic Charikar sketch: each token hash votes +1/−1 on every bit
  * position; the fingerprint sets bit b iff the net vote is positive.
  * Near-duplicate docs differ in few fingerprint bits (small Hamming
  * distance), so banding the fingerprint gives an LSH join key.
  *
  * Scale: the buffer is a fixed 64-int array regardless of document size,
  * merges are associative/commutative (map-side partial aggregation works),
  * and the output is 8 bytes per doc — the sketch shape you want at 100 TB.
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      if (((tokenHash >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  // ExpressionEncoder keeps the 64-int buffer on the codegen'd
  // serialization path — Encoders.kryo would force generic object
  // serialization for every partial-aggregate merge.
  override def bufferEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
