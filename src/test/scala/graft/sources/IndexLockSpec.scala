package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkFunSuite

/** The single-writer index mutex in isolation: thread-level mutual
  * exclusion (flock + acquire retry), per-thread reentrancy (a locked
  * compaction calls the locking publish internally), and key
  * separation (different indexes never contend).
  */
class IndexLockSpec extends SparkFunSuite {

  test("mutual exclusion across threads; reentrant within a thread") {
    val s = spark
    val inside = new AtomicInteger
    val maxInside = new AtomicInteger
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      try IndexLock.withWriterLock(s, "ilk_test_key") {
        val n = inside.incrementAndGet()
        maxInside.updateAndGet(m => math.max(m, n))
        Thread.sleep(100)
        // nested acquisition of the SAME key must run, not deadlock
        IndexLock.withWriterLock(s, "ilk_test_key") { () }
        inside.decrementAndGet()
      } catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"lock contention errored: ${errs.peek()}")
    assert(maxInside.get() == 1,
      s"${maxInside.get()} writers inside the critical section at once")
  }

  test("distinct keys do not contend; equal slugs with different keys get distinct files") {
    val s = spark
    // two keys whose sanitized slugs collide ('a/b' vs 'a.b') must not
    // share a lock file — the hash suffix separates them, so holding
    // one never blocks the other
    val t0 = System.nanoTime()
    IndexLock.withWriterLock(s, "idx/a/b") {
      IndexLock.withWriterLock(s, "idx.a.b") { () } // would deadlock if shared
    }
    assert((System.nanoTime() - t0) < 60e9)
  }
}
