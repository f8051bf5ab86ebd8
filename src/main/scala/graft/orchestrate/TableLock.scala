package graft.orchestrate

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Per-table process lock.
  *
  * Reference: clickhouse_migrator/utils/lock.py — fcntl.flock(LOCK_EX |
  * LOCK_NB) on `./locks/{db}_{table}.lock` with pid+timestamp content,
  * 3600 s acquire timeout polling every 5 s (lock.py:27-57). The live
  * reference code acquires without a finally-release (SURVEY.md A39 quirk);
  * here [[withLock]] guarantees release (designed fix).
  */
final class TableLock(lockDir: String, db: String, table: String,
    timeoutSec: Double = 3600.0, retrySec: Double = 5.0) {

  val path: Path = Paths.get(lockDir, s"${db}_${table}.lock")
  @volatile private var channel: FileChannel = _
  @volatile private var lock: FileLock = _

  /** Non-blocking probe, like the reference's `is_locked` (lock.py:76-101). */
  def isLocked: Boolean = {
    if (!Files.exists(path)) return false
    val ch = FileChannel.open(path, StandardOpenOption.WRITE)
    try {
      val l = try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
      if (l == null) true else { l.release(); false }
    } finally ch.close()
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
      if (l != null) {
        val info = s"""{"pid": ${ProcessHandle.current().pid()}, "time": ${System.currentTimeMillis() / 1000}}"""
        ch.truncate(0)
        ch.write(java.nio.ByteBuffer.wrap(info.getBytes(StandardCharsets.UTF_8)))
        ch.force(true)
        channel = ch
        lock = l
        return true
      }
      ch.close()
      if (System.nanoTime() > deadline) return false
      Thread.sleep((retrySec * 1000).toLong)
    }
    false
  }

  /** Release and remove the lock file (lock.py:59-74). */
  def release(): Unit = {
    if (lock != null) { lock.release(); lock = null }
    if (channel != null) { channel.close(); channel = null }
    Files.deleteIfExists(path)
  }

  /** Scoped acquire/release — the finally the reference forgot. */
  def withLock[A](body: => A): A = {
    if (!acquire())
      throw new IllegalStateException(s"timeout acquiring lock for $db.$table")
    try body finally release()
  }
}
