package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import graft.ops.SessionLru

/** Pins the global cache-build counter's SEMANTICS (ADVICE r12): Bench
  * attributes `cache_build` cost from this counter, so a tick must mean
  * "a timed run executed a builder whose value was actually installed".
  * Two phantom-tick shapes the old code had:
  *
  *  - a builder that THROWS ticked before running — the failed run
  *    counted as a build although nothing was cached;
  *  - an insert-race LOSER ticked for a value that was immediately
  *    discarded — two concurrent first-touches counted twice for one
  *    installed entry.
  */
class SessionLruSpec extends SparkTestBase {

  test("a throwing builder neither ticks the counter nor inserts; " +
      "the retry counts once") {
    val lru = new SessionLru[String](8, _ => (), releaseOnRaceLoss = true)
    val before = SessionLru.buildsSoFar
    intercept[RuntimeException] {
      lru.getOrBuild(spark, "t-throw")(
        throw new RuntimeException("builder boom"))
    }
    assert(SessionLru.buildsSoFar == before,
      "a failed builder ticked the global build counter")
    assert(lru.liveCount(spark) == 0, "a failed builder left an entry")
    assert(lru.getOrBuild(spark, "t-throw")("ok") == "ok")
    assert(SessionLru.buildsSoFar == before + 1,
      "the successful retry did not count exactly once")
    lru.invalidate(spark, "t-throw")
  }

  test("insert-race loser does not tick; its value is released, the " +
      "winner's survives") {
    val released = new ConcurrentLinkedQueue[String]()
    val lru = new SessionLru[String](8, released.add(_),
      releaseOnRaceLoss = true)
    // both threads must be INSIDE their builder before either inserts,
    // so exactly one putIfAbsent wins and the other is a true race loss
    val bothBuilding = new CountDownLatch(2)
    val before = SessionLru.buildsSoFar
    val results = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val threads = (0 to 1).map { i =>
      new Thread(() => results.put(i, lru.getOrBuild(spark, "t-race") {
        bothBuilding.countDown()
        assert(bothBuilding.await(10, TimeUnit.SECONDS), "latch timeout")
        s"value-$i"
      }))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(results.size == 2, "a racer did not finish")
    assert(results.get(0) == results.get(1),
      s"racers saw different values: $results")
    assert(SessionLru.buildsSoFar == before + 1,
      "an insert race ticked the counter more than once")
    assert(released.size == 1 && !released.contains(results.get(0)),
      s"race-loss release wrong: released=$released kept=${results.get(0)}")
    lru.invalidate(spark, "t-race")
  }

  test("a cache hit never ticks") {
    val lru = new SessionLru[String](8, _ => (), releaseOnRaceLoss = false)
    lru.getOrBuild(spark, "t-hit")("v")
    val before = SessionLru.buildsSoFar
    assert(lru.getOrBuild(spark, "t-hit")("v2") == "v")
    assert(SessionLru.buildsSoFar == before, "a cache hit ticked")
    lru.invalidate(spark, "t-hit")
  }
}
