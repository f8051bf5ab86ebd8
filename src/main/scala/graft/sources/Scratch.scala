package graft.sources

/** Session-scoped scratch directories for query-local materialized
  * state (loop-invariant relations, on-disk index builds).
  *
  * Naming contract: `graft_<tag>_<sha256(key)₆₄ᵇ>_<jvm-nonce>` under
  * `java.io.tmpdir`.
  *  - The KEY is digested with a 64-bit slice of SHA-256, not
  *    `String.hashCode` — two distinct dataset dirs colliding on a
  *    32-bit hash would silently share (and clobber) one scratch
  *    location.
  *  - The NONCE is per-JVM: concurrent processes over the same dataset
  *    never interleave one process's overwrite with another's read,
  *    while repeat runs inside one JVM (bench runs every query twice)
  *    land on the same path and overwrite in place instead of
  *    accreting tmp dirs.
  *
  * Local-mode note: `java.io.tmpdir` is correct for `local[*]` where
  * driver and executors share a filesystem. On a real cluster the
  * root must be cluster-visible — point [[root]] (the
  * `graft.scratch.dir` system property) at the job's shared scratch
  * (HDFS/S3 staging), exactly where `spark.sql.warehouse.dir` or the
  * checkpoint dir would live.
  */
object Scratch {

  private val nonce: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  private def root: String =
    sys.props.getOrElse("graft.scratch.dir", sys.props("java.io.tmpdir"))

  // Everything issued is nonce-exclusive to this JVM, so it can (and
  // should) die with it: repeated bench/verify processes must not
  // accrete scratch dirs in tmp or index files in the shared warehouse.
  private val issued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(); ()
  }

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      issued.forEach { p =>
        try rm(new java.io.File(p)) catch { case _: Exception => () }
      }))
    true
  }

  /** Recursively delete a nonce-scoped scratch path NOW. Loop hygiene
    * for iterative operators that land per-round files: a long
    * convergence run would otherwise accrete a |V|-sized directory per
    * round until JVM shutdown. Only ever call with paths this JVM
    * issued and can no longer read.
    */
  def purge(path: String): Unit = {
    try rm(new java.io.File(path)) catch { case _: Exception => () }
    issued.remove(path); ()
  }

  /** Register a path for recursive deletion at JVM exit. Only ever
    * call with nonce-scoped paths — nothing another process could be
    * reading.
    */
  def track(path: String): String = {
    require(hookInstalled)
    issued.add(path)
    path
  }

  /** Deterministic-within-JVM scratch NAME for (tag, key) — a valid
    * identifier, usable as a catalog table name as well as a path
    * segment (catalog tables land in the shared warehouse dir, so they
    * need the same digest + nonce protection as tmp paths).
    */
  def name(tag: String, key: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    s"graft_${tag}_${d}_$nonce"
  }

  /** Deterministic-within-JVM scratch path for (tag, key), deleted
    * recursively at JVM exit.
    */
  def dir(tag: String, key: String): String =
    track(new java.io.File(root, name(tag, key)).toString)
}
