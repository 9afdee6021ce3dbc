package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Components

/** q172's BFS layers on hand graphs: multi-seed min distance, an
  * unreachable component staying absent, and the usual edge-list
  * normalization abuse. */
class BfsLayersSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("layers are min hop distance to the NEAREST seed; unreachable absent") {
    import s.implicits._
    // seeds (mod 10): 10 and 20. Path 10-1-2-3 gives 0,1,2,3; node 7
    // touches both seeds (min = 1); component {5,6} has no seed and
    // must be ABSENT, not infinite; reversed dup + self-loop ignored.
    val edges = Seq(
      (10L, 1L), (1L, 2L), (2L, 3L),
      (10L, 7L), (7L, 20L),
      (5L, 6L),
      (1L, 10L), (5L, 5L)).toDF("u", "v")
    val got = Components.bfsLayers(edges, seedMod = 10L, cap = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 20L -> 0L, 1L -> 1L, 7L -> 1L,
      2L -> 2L, 3L -> 3L))
  }

  test("a graph whose nodes carry no seed yields an empty layer set") {
    import s.implicits._
    val got = Components.bfsLayers(
      Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), seedMod = 10L, cap = 30)
    assert(got.isEmpty)
  }
}
