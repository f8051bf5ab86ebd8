package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.TableRef
import graft.orchestrate.{ConfigResolver, Migrator, ReportService}
import graft.resume.Checkpoint

/** CLI entry point — the analog of the reference's console script
  * (reference: clickhouse_migrator/cli.py:5-21 and orchestrator.py:21-89):
  * resolve config → connect → migrate → report → exit code 0/1.
  *
  * Example:
  * {{{
  * runMain graft.MigrateCli --mode single --db testdb --table lineitem \
  *   --source /root/testdata/sf0.001/lineitem.parquet \
  *   --dest /tmp/out/lineitem \
  *   --partition-expr month:l_shipdate \
  *   --checkpoint /tmp/out/progress.json --lock-dir /tmp/out/locks \
  *   --report-dir /tmp/out/reports
  * }}}
  *
  * `--partition-expr` supports `month:<tsCol>`, `date:<tsCol>`, or a plain
  * column name — the stand-in for a ClickHouse PARTITION BY expression.
  */
object MigrateCli {

  def main(argv: Array[String]): Unit = {
    val args = ConfigResolver.parseArgs(argv)
    val cfg = ConfigResolver.resolve(args)
    require(cfg.sourcePath.nonEmpty, "--source is required")
    require(cfg.destPath.nonEmpty, "--dest is required")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-migrate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val start = System.currentTimeMillis()
    try {
      val src = spark.read.parquet(cfg.sourcePath)
      val (keyName, keyExpr) = args.getOrElse("partition-expr", "") match {
        case s if s.startsWith("month:") =>
          val c = s.stripPrefix("month:")
          (s"${c}_month", date_format(col(c), "yyyy-MM"))
        case s if s.startsWith("date:") =>
          val c = s.stripPrefix("date:")
          (s"${c}_date", date_format(col(c), "yyyy-MM-dd"))
        case "" => throw new IllegalArgumentException("--partition-expr is required")
        case plain => (plain, col(plain))
      }

      val ckpt = new Checkpoint(cfg.checkpointPath)
      val mig = new Migrator(spark, ckpt, cfg.lockDir, cfg.insertIntervalSec)
      val result = mig.migrateTable(
        TableRef(cfg.db, cfg.table), src, Seq(keyName), Seq(keyExpr), cfg.destPath)

      val report = graft.model.MigrationReport(cfg.mode, cfg.db, Seq(result))
      val reportPath = ReportService.write(
        report, args.getOrElse("report-dir", "reports"), start)
      // console summary (reference: report.py:85-124)
      println(s"[graft] table=${cfg.db}.${cfg.table} status=${result.status.name} " +
        s"partitions=${result.completedPartitions}/${result.totalPartitions} " +
        s"rows=${result.migratedRows} report=$reportPath")
      result.error.foreach(e => System.err.println(s"[graft] error: $e"))
      spark.stop()
      if (report.anyFailed) sys.exit(1)
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] fatal: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }
}
