package graft.orchestrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class TableLockSpec extends AnyFunSuite {

  private def freshDir = Files.createTempDirectory("lock").toString

  test("release leaves the lock file in place (flock is the mutex)") {
    val dir = freshDir
    val lock = new TableLock(dir, "db", "t")
    assert(lock.acquire())
    lock.release()
    assert(Files.exists(lock.path))
    // and the path is immediately re-acquirable
    assert(lock.acquire())
    lock.release()
  }

  test("stale lock file from a dead pid is garbage-collected by the probe") {
    val dir = freshDir
    val lock = new TableLock(dir, "db", "t")
    Files.createDirectories(lock.path.getParent)
    // pid far above any live process (kernel pid_max default 4M)
    Files.write(lock.path,
      """{"pid": 999999999, "time": 0}""".getBytes(StandardCharsets.UTF_8))
    assert(!lock.isLocked)
    assert(!Files.exists(lock.path), "stale file should be removed")
    assert(lock.acquire(), "acquisition proceeds after GC")
    lock.release()
  }

  test("unparseable lock file content is treated as stale and removed") {
    val dir = freshDir
    val lock = new TableLock(dir, "db", "t")
    Files.createDirectories(lock.path.getParent)
    Files.write(lock.path, "garbage".getBytes(StandardCharsets.UTF_8))
    assert(!lock.isLocked)
    assert(!Files.exists(lock.path))
  }

  test("live-pid leftover file is NOT garbage-collected") {
    val dir = freshDir
    val lock = new TableLock(dir, "db", "t")
    assert(lock.acquire())
    lock.release() // file remains, records OUR (live) pid
    assert(!lock.isLocked)
    assert(Files.exists(lock.path), "file with a live pid must survive the probe")
  }

  test("probe does not steal a held lock and reports it locked") {
    val dir = freshDir
    val holder = new TableLock(dir, "db", "t")
    val prober = new TableLock(dir, "db", "t")
    assert(holder.acquire())
    assert(prober.isLocked)
    assert(Files.exists(holder.path))
    holder.release()
    assert(!prober.isLocked)
  }
}
