package graft.ext

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** [[Memo]] — the bounded serving-state LRU. Round-11 advisor findings
  * pinned here: (1) a build must not hold the map-wide monitor, so a
  * caller for a DIFFERENT key proceeds while another key builds;
  * (2) eviction releases state and is observable; (3) a failed build is
  * not cached — waiters retry. */
class MemoSpec extends AnyFunSuite {

  test("same-key build runs once; second caller gets the first value") {
    val memo = Memo.unmanaged[Int]
    var builds = 0
    val a = memo("k") { builds += 1; 41 }
    val b = memo("k") { builds += 1; 42 }
    assert(a == 41 && b == 41 && builds == 1)
  }

  test("a slow build does NOT block a different key's caller") {
    val memo = Memo.unmanaged[String]
    val aStarted = new CountDownLatch(1)
    val aRelease = new CountDownLatch(1)
    val t = new Thread(() => {
      memo("slow") { aStarted.countDown(); aRelease.await(); "slow-v" }
      ()
    })
    t.start()
    assert(aStarted.await(5, TimeUnit.SECONDS), "slow build never started")
    // while 'slow' is mid-build, 'fast' must complete on this thread —
    // under the round-10 map-wide-monitor Memo this deadlocks until
    // aRelease fires, so a timely return IS the assertion
    val fastDone = new CountDownLatch(1)
    val t2 = new Thread(() => { memo("fast") { "fast-v" }; fastDone.countDown() })
    t2.start()
    assert(fastDone.await(5, TimeUnit.SECONDS),
      "different-key build blocked behind an in-flight build")
    aRelease.countDown()
    t.join(5000); t2.join(5000)
    assert(memo("slow")(fail("should be memoized")) == "slow-v")
  }

  test("same-key concurrent callers wait for the one build") {
    val memo = Memo.unmanaged[Int]
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var second = -1
    val t = new Thread(() => {
      memo("k") { started.countDown(); release.await(); 7 }; ()
    })
    t.start()
    assert(started.await(5, TimeUnit.SECONDS))
    val t2 = new Thread(() => { second = memo("k") { 99 } })
    t2.start()
    Thread.sleep(50) // t2 should now be parked on the slot latch
    assert(second == -1, "second caller did not wait for the in-flight build")
    release.countDown()
    t.join(5000); t2.join(5000)
    assert(second == 7, "waiter saw its own build instead of the winner's")
  }

  test("eviction at the bound releases the evicted value") {
    var released = List.empty[Int]
    val memo = new Memo[Int](v => released ::= v, max = 1, name = "spec")
    memo("a") { 1 }
    memo("b") { 2 } // bound 1: 'a' must evict and release
    assert(released == List(1))
    var rebuilds = 0
    memo("a") { rebuilds += 1; 1 } // thrash path: rebuild after eviction
    assert(rebuilds == 1 && released == List(2, 1))
  }

  test("an in-flight eldest does not shield younger completed entries; completion re-checks the bound") {
    // round-12 advisor: the removeEldestEntry form bailed when the
    // ELDEST slot was mid-build, shielding every younger completed
    // entry, and nothing re-checked until the next insert. The sweep
    // must (1) keep deferring only while NO completed victim exists,
    // and (2) re-enforce when a build completes, without another put.
    var released = List.empty[Int]
    val memo = new Memo[Int](v => released ::= v, max = 1, name = "spec")
    val aStarted = new CountDownLatch(1)
    val aRelease = new CountDownLatch(1)
    val t = new Thread(() => {
      memo("a") { aStarted.countDown(); aRelease.await(); 1 }; ()
    })
    t.start()
    assert(aStarted.await(5, TimeUnit.SECONDS))
    // 'a' is mid-build (never evictable); 'b' completes over the bound
    assert(memo("b") { 2 } == 2)
    assert(released.isEmpty,
      "neither the building eldest nor the just-built value may release yet")
    // when 'a' completes, its completion path must sweep: 'b' (the only
    // completed non-spare entry) evicts WITHOUT any further insert
    aRelease.countDown()
    t.join(5000)
    assert(released == List(2),
      "completion re-check must evict the completed-over-bound entry")
    var rebuiltA = false
    assert(memo("a") { rebuiltA = true; -1 } == 1)
    assert(!rebuiltA, "the completing builder's value must survive the sweep")
  }

  test("a failed build is not cached; waiters and retries rebuild") {
    val memo = Memo.unmanaged[Int]
    intercept[RuntimeException](memo("k") { sys.error("boom") })
    assert(memo("k") { 5 } == 5)
  }

  test("drop releases a completed value and forgets the key") {
    var released = 0
    val memo = new Memo[Int](_ => released += 1, max = 4, name = "spec")
    memo("k") { 3 }
    memo.drop("k")
    assert(released == 1)
    var rebuilt = false
    memo("k") { rebuilt = true; 4 }
    assert(rebuilt)
  }
}
