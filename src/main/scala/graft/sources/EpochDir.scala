package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Epoch layout for directory-backed standing indexes (the IVF/IVFPQ
  * cell and code stores): data lives in immutable-path epoch
  * subdirectories `<base>/e<N>` and readers always open the HIGHEST
  * COMMITTED epoch (the parquet `_SUCCESS` marker is the commit
  * record). Rebuilds and compactions write a NEW epoch beside the live
  * one and never move or delete a file a concurrent reader could have
  * planned against — the fix for the rename-swap publish, whose
  * live-dir rename invalidated every file path an in-flight search had
  * already listed (rename-based swaps can strand a reader between
  * plan and task execution; epoch dirs cannot).
  *
  * Visibility contract: a search that opened epoch N keeps reading
  * epoch N's files even while epoch N+1 publishes — it returns the
  * pre-compaction result; the next open resolves N+1. [[publish]]
  * retains ONE superseded epoch as grace (deletes only ≤ N−1), so a
  * reader is stranded only if it lags TWO publishes — at 100 TB run an
  * OPTIMIZE cadence longer than your slowest query, or raise the
  * retention. Crash safety is free: an epoch missing `_SUCCESS` (died
  * mid-write) is invisible to the resolver and overwritten by the next
  * publish; there is no pointer file to tear because the commit marker
  * lives inside the epoch itself.
  *
  * Appends do NOT create epochs: batch growth lands new files inside
  * the live epoch (an append is already reader-safe — a concurrent
  * plan sees pre- or post-append listing, both valid corpus states).
  * Compaction vs writer races remain excluded by the OPTIMIZE
  * contract (quiesced writers), as before.
  */
object EpochDir {

  private val EpochName = "^e(\\d+)$".r

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (epoch, path) of every COMMITTED epoch under `base`, ascending. */
  private def committed(spark: SparkSession,
      base: String): Seq[(Long, Path)] = {
    val f = fs(spark, base)
    val basePath = new Path(base)
    if (!f.exists(basePath)) Nil
    else f.listStatus(basePath).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case EpochName(n)
            if f.exists(new Path(st.getPath, "_SUCCESS")) =>
            Some((n.toLong, st.getPath))
          case _ => None
        }
    }.flatten.sortBy(_._1)
  }

  /** The live (highest committed) epoch path — what every reader and
    * every in-place append opens.
    */
  def live(spark: SparkSession, base: String): String = {
    val cs = committed(spark, base)
    require(cs.nonEmpty, s"EpochDir: no committed epoch under $base " +
      "(index missing or its initial write never finished)")
    cs.last._2.toString
  }

  /** Write a new epoch via `write(targetPath)` (the write must finish
    * with a `_SUCCESS` marker — every Spark parquet save does), then
    * purge epochs older than the one just superseded. Used by both the
    * initial build (epoch 0) and every rebuild/compaction.
    */
  def publish(spark: SparkSession, base: String)
      (write: String => Unit): Unit = {
    val before = committed(spark, base)
    val next = before.lastOption.map(_._1 + 1).getOrElse(0L)
    write(s"$base/e$next")
    // grace: keep the superseded epoch for in-flight readers; drop
    // everything older (plus any uncommitted debris below `next`)
    val f = fs(spark, base)
    val keep = Set(next, next - 1)
    f.listStatus(new Path(base)).foreach { st =>
      st.getPath.getName match {
        case EpochName(n) if !keep(n.toLong) => f.delete(st.getPath, true)
        case _ => ()
      }
    }
  }
}
