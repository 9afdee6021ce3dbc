package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.BuildOnceMemo

/** Pins the BuildOnceMemo concurrency contract (VERDICT r12 "what's
  * wrong" #3): a first-touch race must run the build EXACTLY once. The
  * memo stores lazy holders, so TrieMap.getOrElseUpdate racing two
  * callers can at worst instantiate two free holders — every caller
  * forces the one stored holder, whose lazy val serializes the build.
  * Before the fix this test flaked (build count 2 under the latch
  * barrier); now the count is deterministic. */
class BuildOnceMemoSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("concurrent first touch builds exactly once, all callers share it") {
    val memo = new BuildOnceMemo[String]("memospec")
    val builds = new AtomicInteger(0)
    val n = 8
    val ready = new CountDownLatch(n)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futs = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            ready.countDown(); go.await()
            memo.getOrBuild(s, "/dev/null/same-dir") {
              // deliberately slow build so racers overlap the window
              Thread.sleep(50)
              s"artifact-${builds.incrementAndGet()}"
            }
          }
        })
      }
      assert(ready.await(10, TimeUnit.SECONDS))
      go.countDown()
      val results = futs.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() === 1, "build ran more than once under the race")
      assert(results.distinct === Seq("artifact-1"),
        "some caller observed a non-winning artifact")
    } finally pool.shutdownNow()
  }

  test("distinct dirs build independently; repeat access hits the memo") {
    val memo = new BuildOnceMemo[String]("memospec2")
    val builds = new AtomicInteger(0)
    def get(dir: String) =
      memo.getOrBuild(s, dir)(s"a-${builds.incrementAndGet()}")
    assert(get("d1") === "a-1")
    assert(get("d2") === "a-2")
    assert(get("d1") === "a-1") // memo hit, no rebuild
    assert(builds.get() === 2)
  }

  test("nextPath is unique per build even for the same dir") {
    val memo = new BuildOnceMemo[String]("memospec3")
    val p1 = memo.nextPath("d")
    val p2 = memo.nextPath("d")
    assert(p1 !== p2)
  }
}
