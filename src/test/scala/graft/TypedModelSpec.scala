package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Tables.{Edge, Vertex}

/** Exercises the typed Dataset[T] core model (SURVEY §7.1): the vertex →
  * closed-edge construction expressed over case-class Encoders must agree
  * edge-for-edge with the oracle-checked window/lead DataFrame form
  * (q16_blob_edges). Type safety buys compile-checked field access in the
  * per-group closure; the DataFrame form stays the declarative reference.
  */
class TypedModelSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("typed Dataset edge construction matches the window/lead form") {
    import s.implicits._
    val vs = s.read.parquet("/root/repo/fixtures/blob_vertices.parquet")
      .select(col("blob_id").as("blobId"), col("idx"),
        col("x"), col("y")).as[Vertex]
    val typedEdges = vs.groupByKey(_.blobId)
      .flatMapGroups { (b: Long, it: Iterator[Vertex]) =>
        val sorted = it.toIndexedSeq.sortBy(_.idx)
        val n = sorted.size
        sorted.indices.map { i =>
          val v = sorted(i); val w = sorted((i + 1) % n)
          Edge(b, v.x, v.y, w.x, w.y)
        }
      }
    val typed = typedEdges.collect()
      .map(e => (e.blobId, e.x1, e.y1, e.x2, e.y2)).toSet

    val declarative = SparkEntry.queries("q16_blob_edges")(s, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSet

    assert(typed.nonEmpty)
    assert(typed === declarative)
  }

  test("typed BlobParams carry the reference's documented parameter ranges") {
    import s.implicits._
    import graft.model.Tables.BlobParams
    val params = s.read.parquet("/root/repo/fixtures/blob_params.parquet")
      .select(col("blob_id").as("blobId"), col("radius"), col("wobble"),
        col("cx"), col("cy"), col("depth")).as[BlobParams]
      .collect()
    assert(params.length === 14)
    // app.py:138-141,144: r∈[0.1,0.26], wobble∈[0.08,0.22], c∈[0.12,0.88],
    // depth = i/(n-1) ∈ [0,1]
    params.foreach { p =>
      assert(p.radius >= 0.1 && p.radius <= 0.26)
      assert(p.wobble >= 0.08 && p.wobble <= 0.22)
      assert(p.cx >= 0.12 && p.cx <= 0.88 && p.cy >= 0.12 && p.cy <= 0.88)
      assert(p.depth >= 0.0 && p.depth <= 1.0)
    }
  }
}
