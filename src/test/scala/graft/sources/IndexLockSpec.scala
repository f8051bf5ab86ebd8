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

  test("lock identity is physical: spelling variants share one lock (ADVICE r18)") {
    val s = spark
    val dir = tmpDir("ilk_canon")
    // the same physical index dir addressed four ways must hash to ONE
    // canonical key — different spellings previously got different
    // lock files, so two writers could both hold 'the' lock
    val abs = IndexLock.canonicalKey(s, dir)
    assert(IndexLock.canonicalKey(s, s"file:$dir") == abs, s"file: URI: $abs")
    assert(IndexLock.canonicalKey(s, dir + "/sub") != abs,
      "distinct subpath keys must remain distinct")
    // relative spelling of a path under the CWD qualifies to the same
    // absolute identity as the absolute spelling
    val cwd = new java.io.File(".").getCanonicalPath
    val rel = "ilk_rel_probe/sub"
    assert(IndexLock.canonicalKey(s, rel) ==
      IndexLock.canonicalKey(s, s"$cwd/$rel"))
    // catalog keys are case-insensitive, matching Spark's resolution
    assert(IndexLock.canonicalKey(s, "graft_test.Band_IDX") ==
      IndexLock.canonicalKey(s, "graft_test.band_idx"))
    // and the reentrancy set recognizes a nested acquire under a
    // DIFFERENT spelling — this would flock-deadlock if the two
    // spellings mapped to one file but distinct reentrancy keys
    IndexLock.withWriterLock(s, dir) {
      IndexLock.withWriterLock(s, s"file:$dir") { () }
    }
    // a colon-bearing NON-path key (unknown scheme) falls back to its
    // verbatim identity instead of throwing
    assert(IndexLock.canonicalKey(s, "myindex:v2") == "myindex:v2")
    IndexLock.withWriterLock(s, "myindex:v2") { () }
  }

  test("bare single-segment dir keys canonicalize as PATHS: all four documented spellings share one lock (VERDICT r19)") {
    val s = spark
    // 'idx' is NOT a db.table identifier pair, so it is a relative dir
    // key and must qualify like './idx' — pre-r20 the bare spelling
    // took the catalog branch (lower-cased verbatim) and got its OWN
    // lock file: the under-locking corner the r19 advisory flagged
    val cwd = new java.io.File(".").getCanonicalPath
    val bare = IndexLock.canonicalKey(s, "ilk_bare_probe")
    assert(bare == IndexLock.canonicalKey(s, "./ilk_bare_probe"), bare)
    assert(bare == IndexLock.canonicalKey(s, s"$cwd/ilk_bare_probe"), bare)
    assert(bare == IndexLock.canonicalKey(s, s"file:$cwd/ilk_bare_probe"),
      bare)
    // bare-key canonicalization must not leak case-folding: a dir name
    // is case-SENSITIVE, unlike a catalog identifier
    assert(IndexLock.canonicalKey(s, "Ilk_Bare_Probe") != bare,
      "dir keys must stay case-sensitive")
    // nested acquire across the bare and dotted-relative spellings
    IndexLock.withWriterLock(s, "ilk_bare_probe") {
      IndexLock.withWriterLock(s, "./ilk_bare_probe") { () }
    }
    // multi-part catalog identifiers still take the catalog branch
    assert(IndexLock.canonicalKey(s, "Graft_Test.Band_IDX") ==
      "graft_test.band_idx")
  }
}
