package graft.orchestrate

import java.nio.ByteBuffer
import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Per-table process lock.
  *
  * Reference: clickhouse_migrator/utils/lock.py — fcntl.flock(LOCK_EX |
  * LOCK_NB) on `./locks/{db}_{table}.lock` with pid+timestamp content,
  * 3600 s acquire timeout polling every 5 s (lock.py:27-57), plus an
  * `is_locked` probe that garbage-collects stale lock files left by dead
  * pids (lock.py:76-101). The live reference code acquires without a
  * finally-release (SURVEY.md A39 quirk); here [[withLock]] guarantees
  * release (designed fix).
  *
  * Unlink-race safety: the classic flock pitfall is deleting the lock
  * file while a waiter still holds the old inode — a third process can
  * create and lock a fresh file at the same path, leaving two "holders".
  * Two measures close it:
  *  - [[release]] leaves the file in place (the flock is the mutex; the
  *    file is reusable and its pid+timestamp is refreshed per acquire);
  *  - [[acquire]] re-verifies, after tryLock succeeds, that the path
  *    still names the inode it locked (by probing for the JVM's own
  *    `OverlappingFileLockException` on a second open), retrying if the
  *    file was unlinked and recreated underneath it. This makes the
  *    stale-file GC in [[isLocked]] safe.
  */
final class TableLock(lockDir: String, db: String, table: String,
    timeoutSec: Double = 3600.0, retrySec: Double = 5.0) {

  val path: Path = Paths.get(lockDir, s"${db}_${table}.lock")
  @volatile private var channel: FileChannel = _
  @volatile private var lock: FileLock = _

  /** Non-blocking probe, like the reference's `is_locked` (lock.py:76-101).
    * As in the reference, a probe that finds the lock file unheld checks
    * the recorded pid and garbage-collects the file if that process is
    * dead (or the content is unreadable), so crash leftovers don't carry
    * stale pid/timestamp diagnostics forever.
    */
  def isLocked: Boolean = {
    if (!Files.exists(path)) return false
    val ch =
      try FileChannel.open(path, StandardOpenOption.WRITE, StandardOpenOption.READ)
      catch { case _: java.nio.file.NoSuchFileException => return false }
    try {
      val l = try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
      if (l == null) true
      else {
        try {
          if (isStale(ch)) Files.deleteIfExists(path)
        } finally l.release()
        false
      }
    } finally ch.close()
  }

  /** The recorded pid is dead or the content is unparseable
    * (reference: lock.py:84-99 — dead pid or invalid content → remove).
    * A live pid (e.g. a clean release leaves the file behind) is not
    * stale: the flock, not the file, is the mutex.
    */
  private def isStale(ch: FileChannel): Boolean = {
    try {
      val buf = ByteBuffer.allocate(math.min(ch.size(), 4096L).toInt)
      ch.read(buf, 0L)
      val text = new String(buf.array(), 0, buf.position(), StandardCharsets.UTF_8)
      """"pid"\s*:\s*(\d+)""".r.findFirstMatchIn(text) match {
        case Some(m) =>
          val owner = ProcessHandle.of(m.group(1).toLong)
          !(owner.isPresent && owner.get().isAlive)
        case None => true // unreadable content → treat as stale
      }
    } catch { case _: Exception => true }
  }

  /** Acquire with timeout/retry (lock.py:27-57). Returns false on timeout. */
  def acquire(): Boolean = {
    Files.createDirectories(path.getParent)
    val deadline = System.nanoTime() + (timeoutSec * 1e9).toLong
    while (true) {
      val ch = FileChannel.open(path,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      val l = try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
      if (l != null && pathStillNamesLockedFile()) {
        val info = s"""{"pid": ${ProcessHandle.current().pid()}, "time": ${System.currentTimeMillis() / 1000}}"""
        ch.truncate(0)
        ch.write(ByteBuffer.wrap(info.getBytes(StandardCharsets.UTF_8)), 0L)
        ch.force(true)
        channel = ch
        lock = l
        return true
      }
      if (l != null) l.release() // locked an orphaned inode — retry fresh
      ch.close()
      // Deadline applies to EVERY retry path. The orphaned-inode branch
      // can recur (another process may keep unlinking/recreating the
      // file), so without this check it could spin past the configured
      // timeout; a short backoff keeps the spin from being a busy loop
      // while staying much faster than the contended-path pacing.
      if (System.nanoTime() > deadline) return false
      if (l == null) Thread.sleep((retrySec * 1000).toLong) // contended
      else Thread.sleep(10L) // orphan retry: brief backoff
    }
    false
  }

  /** After tryLock succeeded on our channel, confirm the path still names
    * the locked inode: a second open+tryLock on the same file throws
    * `OverlappingFileLockException` (we already hold it); succeeding or
    * blocking instead means the file was unlinked and recreated.
    */
  private def pathStillNamesLockedFile(): Boolean = {
    val probe =
      try FileChannel.open(path, StandardOpenOption.WRITE)
      catch { case _: java.nio.file.NoSuchFileException => return false }
    try {
      val l2 = try probe.tryLock()
      catch { case _: OverlappingFileLockException => return true }
      if (l2 != null) l2.release()
      false
    } finally probe.close()
  }

  /** Release the flock; the file stays behind (see class doc — deleting
    * it here is the unlink race the reference's release+unlink had,
    * lock.py:59-74).
    */
  def release(): Unit = {
    if (lock != null) { lock.release(); lock = null }
    if (channel != null) { channel.close(); channel = null }
  }

  /** Scoped acquire/release — the finally the reference forgot. */
  def withLock[A](body: => A): A = {
    if (!acquire())
      throw new IllegalStateException(s"timeout acquiring lock for $db.$table")
    try body finally release()
  }
}
