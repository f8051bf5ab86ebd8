package graft.orchestrate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.copy.CopyService
import graft.model._
import graft.operators.Partitions
import graft.resume.Checkpoint

/** The migration state machine — the reference's core
  * (reference: clickhouse_migrator/services/migration.py:372-541, live
  * definition) re-expressed for path-based parquet tables on a Spark
  * cluster.
  *
  * Lifecycle per table (mirrors SURVEY.md §3.1):
  *   lock → skip-check → enumerate partitions → resume-diff →
  *   per-partition [copy → throttle → validate → checkpoint] →
  *   full validation gate → publish (write-audit-publish) →
  *   optional source drop → report.
  *
  * Deliberate divergences from the reference (SURVEY.md §7.5):
  *  - per-partition copy is OVERWRITE → crash-retry is idempotent
  *    (the reference's re-INSERT duplicates rows, §3.4);
  *  - the swap is write-audit-publish via a staging dir instead of the
  *    non-atomic DROP+RENAME (migration.py:522-523);
  *  - source data is deleted only after the full-table gate passes
  *    (the reference drops each source partition mid-flight,
  *    migration.py:498-503 — recoverable only via the backup table);
  *  - the lock is released in a finally (the reference leaks it, A39).
  *
  * Scale design: the driver never holds row data — partition enumeration
  * collects only distinct key tuples, validation uses one
  * `groupBy(keys).count()` pass per side instead of the reference's 2N+3
  * scalar counts, and each partition copy is an independent distributed
  * job (bounded work unit = checkpoint unit, same as the reference).
  */
final class Migrator(
    spark: SparkSession,
    checkpoint: Checkpoint,
    lockDir: String = "locks",
    insertIntervalSec: Double = 0.0,
    lockTimeoutSec: Double = 3600.0,
    checksumValidation: Boolean = false,
    maxConcurrentPartitions: Int = 1) {
  require(maxConcurrentPartitions >= 1, "maxConcurrentPartitions must be >= 1")

  /** Migrate one source table.
    *
    * @param table    logical identity for checkpoint/report/lock keys
    * @param src      source data
    * @param keys     partition key column names (derived columns allowed)
    * @param keyExprs expressions producing each key from `src` columns —
    *                 the analog of a ClickHouse PARTITION BY expression
    * @param destRoot final destination root (published only after audit)
    * @param dropSource delete the source path after successful publish
    */
  def migrateTable(
      table: TableRef,
      src: DataFrame,
      keys: Seq[String],
      keyExprs: Seq[Column],
      destRoot: String,
      srcPathToDrop: Option[String] = None,
      dropSource: Boolean = false): TableResult = {
    val lock = new TableLock(lockDir, table.db, table.table, lockTimeoutSec)
    // Lock-timeout is NOT a migration failure: another process owns this
    // table, and its checkpoint entries are live. Writing Failed here
    // would race the owner's markPartition/markStatus (the checkpoint
    // file is only lock-holder-serialized), so report Locked and leave
    // the checkpoint alone.
    if (!lock.acquire())
      return TableResult(table, TableStatus.Locked, 0, 0, 0L, Nil,
        Some(s"timeout acquiring lock for ${table.qualified}"))
    try {
      doMigrate(table, src, keys, keyExprs, destRoot, srcPathToDrop, dropSource)
    } catch {
      case e: Exception =>
        // Thrown while HOLDING the lock → safe to stamp Failed.
        checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
        TableResult(table, TableStatus.Failed, 0, 0, 0L, Nil, Some(e.getMessage))
    } finally lock.release()
  }

  private def doMigrate(
      table: TableRef,
      src: DataFrame,
      keys: Seq[String],
      keyExprs: Seq[Column],
      destRoot: String,
      srcPathToDrop: Option[String],
      dropSource: Boolean): TableResult = {
    // Skip-if-already-migrated (A19 analog): table checkpointed complete.
    if (checkpoint.tableProgress(table.db, table.table)
        .exists(_.status == TableStatus.Completed)) {
      return TableResult(table, TableStatus.Skipped, 0, 0, 0L, Nil)
    }

    val staging = destRoot + ".staging"
    // Materialize derived partition keys once; Catalyst prunes to the
    // needed source columns for enumeration/counting.
    val withKeys = keys.zip(keyExprs).foldLeft(src) {
      case (df, (k, e)) => df.withColumn(k, e.cast("string"))
    }

    val allParts = Partitions.enumeratePartitions(withKeys, keys)
    checkpoint.initTable(table.db, table.table)

    // No-partition fast path (reference: migration.py:432-441).
    if (allParts.isEmpty) {
      CopyService.writePartitioned(withKeys.limit(0), keys, staging)
      CopyService.publish(spark, staging, destRoot)
      checkpoint.markStatus(table.db, table.table, TableStatus.Completed)
      return TableResult(table, TableStatus.Completed, 0, 0, 0L, Nil)
    }

    val work = checkpoint.uncompleted(table.db, table.table, allParts)
    if (work.isEmpty && allParts.nonEmpty) {
      // Everything already checkpointed: fall through to final gate+publish.
    }

    // ONE-pass source counts for all partitions (replaces 2N scalar queries).
    val srcCounts = Partitions.countsByPartition(withKeys.select(keys.map(col): _*), keys)

    var migratedRows = 0L
    var checks = Vector.empty[PartitionCheck]
    val partCols = keys.map(col)

    def copyAndCheck(part: graft.model.PartitionId): PartitionCheck = {
      val t0 = System.nanoTime()
      CopyService.copyPartition(withKeys, keys, part, partCols, staging)
      val srcCount = srcCounts.getOrElse(part, 0L)
      val dstCount = CopyService.countPartitionDir(spark, staging, keys, part)
      val cost = (System.nanoTime() - t0) / 1e9
      PartitionCheck(part.render, srcCount, dstCount, srcCount == dstCount, cost)
    }

    // Per-partition loop, K partitions in flight (reference is strictly
    // sequential — migration.py:466-508; K>1 is the scale upgrade: each
    // partition copy is an independent Spark job, so K concurrent jobs
    // keep a large cluster busy while the driver-serialized loop would
    // idle it). Work proceeds in groups of K; a failed check aborts
    // before the next group is scheduled. Passed partitions are
    // checkpointed in work-list order; a failed partition is never
    // checkpointed (gate semantics A35 preserved).
    val pool =
      if (maxConcurrentPartitions > 1)
        Some(java.util.concurrent.Executors.newFixedThreadPool(maxConcurrentPartitions))
      else None
    try {
      val groups = work.grouped(maxConcurrentPartitions)
      for (group <- groups) {
        val groupChecks: Seq[PartitionCheck] = pool match {
          case Some(p) if group.size > 1 =>
            import scala.concurrent.{Await, ExecutionContext, Future}
            import scala.concurrent.duration.Duration
            implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(p)
            // Each future is wrapped in Try so the Await completes only
            // after EVERY sibling copy has finished (success or failure).
            // Failing fast here would release the table lock while orphan
            // copies were still writing into staging — a retrying process
            // could then acquire the lock and race those writes in the
            // same partition dirs. The first failure rethrows AFTER the
            // whole wave has quiesced.
            Await.result(
              Future.sequence(group.map(part =>
                Future(scala.util.Try(copyAndCheck(part))))),
              Duration.Inf).map(_.get)
          case _ => group.map(copyAndCheck)
        }
        checks ++= groupChecks
        group.zip(groupChecks).foreach { case (part, chk) =>
          if (chk.passed) {
            migratedRows += chk.srcCount
            checkpoint.markPartition(table.db, table.table, part)
          }
        }
        groupChecks.find(!_.passed).foreach { bad =>
          // Validation gate (A35): abort, do NOT checkpoint, source intact.
          checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
          return TableResult(table, TableStatus.Failed, allParts.size,
            checks.count(_.passed), migratedRows, checks,
            Some(s"count mismatch for partition ${bad.partition}: " +
              s"src=${bad.srcCount} dst=${bad.dstCount}"))
        }
        // The reference throttles once per partition insert
        // (migration.py:505-507). With K partitions per scheduling wave
        // the sleep scales by the wave size, preserving the configured
        // per-partition insert rate regardless of concurrency.
        if (insertIntervalSec > 0)
          Thread.sleep((insertIntervalSec * 1000 * group.size).toLong)
      }
    } finally pool.foreach(_.shutdown())

    // Full-table validation gate (migration.py:510-518) — one scan per side.
    val totalSrc = srcCounts.values.sum
    val totalDst = spark.read
      .option("basePath", staging).parquet(staging).count()
    if (totalDst != totalSrc) {
      checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
      return TableResult(table, TableStatus.Failed, allParts.size,
        checks.count(_.passed), migratedRows, checks,
        Some(s"full-table count mismatch: src=$totalSrc dst=$totalDst"))
    }

    // Optional content-checksum gate (upgrade of the count-only A35 —
    // SURVEY.md §7.4): per-partition bit_xor(xxhash64(row)) on both
    // sides; catches value corruption that equal counts miss. One extra
    // column-pruned scan per side.
    if (checksumValidation) {
      val dataCols = src.columns.toSeq.filterNot(keys.contains)
      val srcSums = graft.operators.Validate.checksumByPartition(
        withKeys, keys, dataCols)
      // Explicit schema pins the partition key columns to STRING: default
      // partition-column type inference would re-parse a value like '01'
      // or '1e3' as numeric and re-render it as '1', diverging from the
      // source-side keys and tripping a spurious checksum mismatch.
      val dataFields = src.schema.fields.filterNot(f => keys.contains(f.name))
      val stagingSchema = org.apache.spark.sql.types.StructType(
        dataFields ++ keys.map(k =>
          org.apache.spark.sql.types.StructField(k, org.apache.spark.sql.types.StringType)))
      val dstSums = graft.operators.Validate.checksumByPartition(
        spark.read.option("basePath", staging).schema(stagingSchema).parquet(staging)
          .select((keys ++ dataCols).map(col): _*),
        keys, dataCols)
      if (!graft.operators.Validate.checksumsMatch(srcSums, dstSums)) {
        checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
        val bad = (srcSums.keySet ++ dstSums.keySet)
          .filter(p => srcSums.get(p) != dstSums.get(p)).map(_.render)
        return TableResult(table, TableStatus.Failed, allParts.size,
          checks.count(_.passed), migratedRows, checks,
          Some(s"checksum mismatch for partitions: ${bad.mkString(", ")}"))
      }
    }

    // Audit passed → publish (the safe swap).
    CopyService.publish(spark, staging, destRoot)

    if (dropSource) srcPathToDrop.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }

    checkpoint.markStatus(table.db, table.table, TableStatus.Completed)
    TableResult(table, TableStatus.Completed, allParts.size,
      allParts.size, migratedRows, checks)
  }

  /** Incremental re-sync of an already-published destination: detect the
    * partitions that DRIFTED since the last run (count + xxhash64
    * bit_xor checksum per partition, ONE column-pruned scan per side —
    * the orchestration twin of the oracle-checked `m_delta_detect`
    * query) and re-copy only those, partition-overwrite-idempotent,
    * directly into the published hive layout. Orphaned partitions
    * (present only at the destination) are dropped when `dropOrphans`,
    * else left untouched — destination-only data is never destroyed
    * implicitly.
    *
    * This is the answer to "the checkpoint says Completed but the
    * source moved on": where [[migrateTable]] would skip (A19),
    * resync re-copies exactly the drift. Copy work — and cluster time —
    * is proportional to changed data, not table size; the detection
    * cost is two aggregate scans producing O(partitions) driver rows.
    * An empty destination degrades to a full copy (every partition
    * classifies as missing).
    */
  def resyncTable(
      table: TableRef,
      src: DataFrame,
      keys: Seq[String],
      keyExprs: Seq[Column],
      destRoot: String,
      dropOrphans: Boolean = false): TableResult = {
    val lock = new TableLock(lockDir, table.db, table.table, lockTimeoutSec)
    if (!lock.acquire())
      return TableResult(table, TableStatus.Locked, 0, 0, 0L, Nil,
        Some(s"timeout acquiring lock for ${table.qualified}"))
    try {
      val withKeys = keys.zip(keyExprs).foldLeft(src) {
        case (df, (k, e)) => df.withColumn(k, e.cast("string"))
      }
      val dataCols = src.columns.toSeq.filterNot(keys.contains)
      val dataFields = src.schema.fields.filterNot(f => keys.contains(f.name))
      val srcState = graft.operators.Validate.checksumByPartition(
        withKeys, keys, dataCols)
      val destPath = new org.apache.hadoop.fs.Path(destRoot)
      val destFs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Schema gate BEFORE any data compare: a drifted data-column set
      // or type makes per-partition checksums meaningless (and a
      // partial re-copy would leave a mixed-schema destination), so
      // structural drift fails fast with the diff instead of surfacing
      // as a confusing read/checksum error. Partition key columns are
      // excluded — they are strings in the hive layout by design.
      //
      // EXCEPT benign evolution: a column ADDED at the source
      // auto-migrates. The destination is read with the SOURCE schema,
      // so untouched partitions surface the new column as NULL (parquet
      // schema projection backfills missing columns — file-source reads
      // force nullability regardless of the declared field), the
      // checksum compare then re-copies exactly the partitions whose
      // content differs (non-null values in the new column, or any
      // other drift), and partitions where the new column is all-NULL
      // keep their old files — readable as nulls forever. A
      // non-nullable addition needs no special case: its values are
      // non-null in every row, so every partition drifts and re-copies
      // through the same path. Removed or type-changed columns stay
      // fatal — their checksums would compare different value spaces.
      if (destFs.exists(destPath)) {
        // Nullability is normalized away: parquet round-trips don't
        // preserve it faithfully (readers mark columns nullable), so
        // only name/type drift is a real incompatibility here.
        def dataSchema(fields: Seq[org.apache.spark.sql.types.StructField]) =
          org.apache.spark.sql.types.StructType(
            fields.filterNot(f => keys.contains(f.name))
              .map(_.copy(nullable = true)))
        val drift = graft.sources.CatalogOps.schemaDiff(
          dataSchema(src.schema.fields.toSeq),
          dataSchema(spark.read.option("basePath", destRoot)
            .parquet(destRoot).schema.fields.toSeq))
        val breaking = drift.filterNot(_._2 == "added")
        if (breaking.nonEmpty) {
          checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
          return TableResult(table, TableStatus.Failed, 0, 0, 0L, Nil,
            Some("schema drift vs destination (full re-migration " +
              "required): " + breaking.map { case (c, kind, s, d) =>
                s"$c $kind" +
                  (if (s.nonEmpty || d.nonEmpty) s" (src=$s dst=$d)" else "")
              }.mkString("; ")))
        }
      }
      val dstState: Map[PartitionId, (Long, Long)] =
        if (!destFs.exists(destPath)) Map.empty
        else {
          // Pin partition columns to STRING on read: type inference
          // would re-render '01' as '1' and diverge from source keys
          // (same pitfall as the checksum gate in doMigrate). Data
          // columns are pinned to the SOURCE fields — this is also what
          // backfills a benignly-added column as NULL on the dest side.
          val destSchema = org.apache.spark.sql.types.StructType(
            dataFields ++ keys.map(k => org.apache.spark.sql.types
              .StructField(k, org.apache.spark.sql.types.StringType)))
          graft.operators.Validate.checksumByPartition(
            spark.read.option("basePath", destRoot).schema(destSchema)
              .parquet(destRoot).select((keys ++ dataCols).map(col): _*),
            keys, dataCols)
        }
      val drifted = srcState.keys.toSeq
        .filter(p => !dstState.get(p).contains(srcState(p)))
        .sortBy(_.render)
      val orphans = (dstState.keySet -- srcState.keySet).toSeq.sortBy(_.render)
      checkpoint.initTable(table.db, table.table)
      val partCols = keys.map(col)
      var migratedRows = 0L
      var checks = Vector.empty[PartitionCheck]
      for (part <- drifted) {
        val t0 = System.nanoTime()
        CopyService.copyPartition(withKeys, keys, part, partCols, destRoot)
        val (srcCount, srcCk) = srcState(part)
        // Validate the re-copied partition by CONTENT, not just count:
        // recompute the same sorted-column xxhash64/bit_xor checksum on
        // the freshly written partition dir and compare against the
        // already-collected source state — a "changed" partition with
        // equal counts whose overwrite silently failed would pass a
        // count-only gate while still serving stale rows.
        val (dstCount, dstCk) = graft.operators.Validate.checksumAll(
          spark.read
            .schema(org.apache.spark.sql.types.StructType(dataFields))
            .parquet(s"$destRoot/${CopyService.partitionDir(keys, part)}"),
          dataCols)
        val chk = PartitionCheck(part.render, srcCount, dstCount,
          srcCount == dstCount && srcCk == dstCk,
          (System.nanoTime() - t0) / 1e9)
        checks :+= chk
        if (!chk.passed) {
          checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
          return TableResult(table, TableStatus.Failed, drifted.size,
            checks.count(_.passed), migratedRows, checks,
            Some(s"count/checksum mismatch for partition ${part.render}: " +
              s"src=($srcCount, $srcCk) dst=($dstCount, $dstCk)"))
        }
        migratedRows += srcCount
        checkpoint.markPartition(table.db, table.table, part)
        if (insertIntervalSec > 0)
          Thread.sleep((insertIntervalSec * 1000).toLong)
      }
      if (dropOrphans) orphans.foreach(p =>
        CopyService.dropPartitionDir(spark, destRoot, keys, p))
      checkpoint.markStatus(table.db, table.table, TableStatus.Completed)
      TableResult(table, TableStatus.Completed, drifted.size,
        checks.count(_.passed), migratedRows, checks)
    } catch {
      case e: Exception =>
        checkpoint.markStatus(table.db, table.table, TableStatus.Failed)
        TableResult(table, TableStatus.Failed, 0, 0, 0L, Nil, Some(e.getMessage))
    } finally lock.release()
  }

  /** Migrate a CATALOG table by name, resolving a VIEW indirection
    * first — the reference's Distributed→local dispatch (A8,
    * migration.py:277-306: a Distributed table is an indirection layer;
    * the migration targets the local table it fronts) re-expressed in
    * catalog terms: a name bound to a VIEW resolves through
    * CatalogOps.resolveToBaseTable to the single base table its plan
    * reads, the indirection is logged, and the migration runs under the
    * RESOLVED table's identity so checkpoint/lock/report keys land on
    * the physical table (two views over one base share one migration).
    */
  def migrateCatalogTable(
      name: TableRef,
      keys: Seq[String],
      keyExprs: Seq[Column],
      destRoot: String): TableResult = {
    val base = graft.sources.CatalogOps.resolveToBaseTable(spark, name)
    if (base != name)
      System.err.println(s"[graft] ${name.qualified} is a view over " +
        s"${base.qualified}; migrating the base table")
    migrateTable(base, spark.table(base.qualified), keys, keyExprs, destRoot)
  }

  /** Full-database mode (reference: migration.py:544-563): sequential
    * per-table migration, log-and-continue on failure.
    */
  def migrateAll(
      tables: Seq[(TableRef, DataFrame, Seq[String], Seq[Column], String)],
      mode: String = "full",
      db: String = ""): MigrationReport = {
    val results = tables.map { case (ref, src, keys, exprs, dest) =>
      try migrateTable(ref, src, keys, exprs, dest)
      catch {
        case e: Exception =>
          TableResult(ref, TableStatus.Failed, 0, 0, 0L, Nil, Some(e.getMessage))
      }
    }
    MigrationReport(mode, db, results)
  }
}
