package graft.copy

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

import graft.model.PartitionId
import graft.operators.Partitions

/** The data-movement layer: partition-targeted copy, partition delete, and
  * a safe table swap.
  *
  * Reference mapping:
  *  - Filtered copy `INSERT INTO backup SELECT * FROM src WHERE <pred>`
  *    (reference: clickhouse_migrator/services/migration.py:471-477) →
  *    [[copyPartition]]: a predicate-pruned scan written to one partition
  *    subdirectory with OVERWRITE semantics, so a crashed-and-retried
  *    partition is idempotent (the reference's re-INSERT duplicates rows —
  *    SURVEY.md §3.4; designed divergence).
  *  - `ALTER TABLE … DROP PARTITION` (migration.py:498-503) →
  *    [[dropPartitionDir]].
  *  - `DROP src; RENAME backup TO src` — two non-atomic statements
  *    (migration.py:520-524) → [[publish]]: write-audit-publish via a
  *    staging directory; the destructive step happens only after the
  *    validation gate, and the data always exists in at least one complete
  *    location (SURVEY.md §7.5 hard part 3).
  *
  * Scale notes: the copy never moves rows through the driver; each
  * partition copy is a distributed job whose input is pruned by the typed
  * partition predicate (shows as PushedFilters/partition pruning in
  * `.explain`). At 100 TB, per-partition jobs bound memory and make
  * checkpoint granularity = partition, exactly like the reference.
  */
object CopyService {

  /** Partition subdirectory name: `k1=v1/k2=v2` (Hive layout, so the
    * destination is readable as a partitioned table by any engine).
    *
    * Values are escaped exactly as Spark's own `partitionBy` writer does
    * (`ExternalCatalogUtils.escapePathName`), so a value containing `/`,
    * `=`, or a literal `%XX` sequence round-trips through partition
    * discovery unchanged instead of corrupting the directory tree. A null
    * value renders as the Hive default-partition sentinel, matching what
    * `partitionBy` would have produced for it.
    */
  def partitionDir(keys: Seq[String], part: PartitionId): String =
    keys.zip(part.values).map { case (k, v) =>
      val rendered =
        if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(v)
      s"${ExternalCatalogUtils.escapePathName(k)}=$rendered"
    }.mkString("/")

  /** Copy one partition of `src` into `destRoot/<hive-dirs>/`, overwriting
    * any previous (possibly partial) copy of the same partition. Hive
    * layout: the partition key columns live in the directory name only and
    * are dropped from the data files (no per-row constant columns — they
    * are reconstituted on read via partition inference).
    */
  def copyPartition(
      src: DataFrame,
      keys: Seq[String],
      part: PartitionId,
      partExprs: Seq[Column],
      destRoot: String): Unit = {
    // Null-safe equality: a null partition value must select the rows
    // whose key IS NULL (plain === null is never-true → empty copy).
    val pred = keys.zip(partExprs).zip(part.values)
      .map { case ((_, expr), v) =>
        if (v == null) expr.isNull else expr === v
      }
      .reduce(_ && _)
    src.filter(pred)
      .drop(keys.filter(src.columns.contains): _*)
      .write.mode("overwrite")
      .parquet(s"$destRoot/${partitionDir(keys, part)}")
  }

  /** Count rows in an already-copied partition directory. */
  def countPartitionDir(
      spark: SparkSession,
      destRoot: String,
      keys: Seq[String],
      part: PartitionId): Long = {
    val p = s"$destRoot/${partitionDir(keys, part)}"
    spark.read.parquet(p).count()
  }

  /** Delete one partition directory (the DROP PARTITION analog — only ever
    * invoked after the per-partition validation gate passes).
    */
  def dropPartitionDir(
      spark: SparkSession,
      root: String,
      keys: Seq[String],
      part: PartitionId): Boolean = {
    val p = new HPath(s"$root/${partitionDir(keys, part)}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Write-audit-publish: atomically promote a fully-validated staging
    * directory to the final location. On a posix FS rename is atomic; on
    * object stores this maps to a catalog location re-point — the key
    * property either way is that `audit` ran BEFORE anything is exposed
    * or destroyed (unlike the reference's DROP-then-RENAME window,
    * migration.py:522-523).
    */
  def publish(spark: SparkSession, stagingRoot: String, finalRoot: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val staging = new HPath(stagingRoot)
    val dest = new HPath(finalRoot)
    val fs = staging.getFileSystem(conf)
    if (fs.exists(dest)) {
      val trash = new HPath(finalRoot + ".replaced." + System.nanoTime())
      if (!fs.rename(dest, trash))
        throw new IllegalStateException(s"cannot stash existing $finalRoot")
      if (!fs.rename(staging, dest)) {
        fs.rename(trash, dest) // roll back
        throw new IllegalStateException(s"cannot publish $stagingRoot → $finalRoot")
      }
      fs.delete(trash, true)
    } else {
      val parent = dest.getParent
      if (parent != null) fs.mkdirs(parent)
      if (!fs.rename(staging, dest))
        throw new IllegalStateException(s"cannot publish $stagingRoot → $finalRoot")
    }
  }

  /** One-shot partitioned write of a whole table (the no-checkpoint path;
    * also what a fresh load would use). Dynamic partition overwrite keeps
    * retries idempotent per partition.
    */
  def writePartitioned(
      df: DataFrame,
      keys: Seq[String],
      destRoot: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(keys: _*)
      .parquet(destRoot)

  /** Validate whole-table counts between two locations with one scan each
    * (replaces the reference's 2N+3 scalar count queries, SURVEY.md §6).
    */
  def validateCounts(
      src: DataFrame,
      dst: DataFrame,
      srcKeys: Seq[Column],
      dstKeys: Seq[Column],
      keyNames: Seq[String]): Map[PartitionId, (Long, Long)] = {
    val s = Partitions.countsByPartition(
      src.select(srcKeys.zip(keyNames).map { case (c, n) => c.as(n) }: _*), keyNames)
    val d = Partitions.countsByPartition(
      dst.select(dstKeys.zip(keyNames).map { case (c, n) => c.as(n) }: _*), keyNames)
    (s.keySet ++ d.keySet).map { pid =>
      pid -> (s.getOrElse(pid, 0L), d.getOrElse(pid, 0L))
    }.toMap
  }
}
