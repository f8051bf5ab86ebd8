package graft.orchestrate

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.model.{PartitionId, TableRef, TableStatus}
import graft.resume.Checkpoint
import graft.sources.Sources

/** End-to-end migration from a LIVE JDBC source — the reference's actual
  * job shape (clickhouse_migrator/services/migration.py:372-524 drives a
  * database reached over the network, not files). MigratorSpec proves the
  * state machine over parquet inputs; this spec proves it is
  * source-agnostic by running the full lifecycle (enumerate → copy →
  * validate → checkpoint → publish, then kill-and-resume) from an
  * embedded Derby database to hive-partitioned parquet. ClickHouse itself
  * is unreachable offline; Derby exercises the same Spark JDBC machinery
  * (partitioned fan-out, pushdown) in-process.
  */
class JdbcMigrationSpec extends SparkFunSuite {

  private val url = "jdbc:derby:memory:migdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val nRows = 2000

  private lazy val seeded: Unit = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE orders_src (id BIGINT NOT NULL, region INT, amount DOUBLE)")
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO orders_src VALUES (?, ?, ?)")
      (0 until nRows).foreach { i =>
        ps.setLong(1, i.toLong); ps.setInt(2, i % 5)
        ps.setDouble(3, i * 0.25); ps.addBatch()
      }
      ps.executeBatch(); conn.commit()
    } finally conn.close()
  }

  // Partitioned fan-out read: 4 parallel range scans, the shape a real
  // ClickHouse extraction would use so the copy stage is distributed on
  // the READ side too, not just the write.
  private def source = Sources.clickhouseJdbc(spark, url, "orders_src",
    partitionColumn = Some(("id", 0L, nRows.toLong, 4)),
    props = Map("driver" -> driver))

  private val keys = Seq("region_key")
  private def keyExprs = Seq(col("region"))

  private def freshEnv() = {
    val dir = Files.createTempDirectory("jdbcmig")
    val ckpt = new Checkpoint(dir.resolve("progress.json"))
    val mig = new Migrator(spark, ckpt, lockDir = dir.resolve("locks").toString,
      checksumValidation = true)
    (dir, ckpt, mig)
  }

  test("full lifecycle from live JDBC source to published parquet") {
    seeded
    val (dir, ckpt, mig) = freshEnv()
    val dest = s"$dir/dest/orders"
    val res = mig.migrateTable(
      TableRef("derbydb", "orders_src"), source, keys, keyExprs, dest)
    assert(res.status == TableStatus.Completed, res.error)
    assert(res.migratedRows == nRows.toLong)
    assert(res.totalPartitions == 5 && res.checkResults.forall(_.passed))
    // published layout: one hive partition per region, contents intact
    val back = spark.read.option("basePath", dest).parquet(dest)
    assert(back.count() == nRows.toLong)
    assert(back.select("region_key").distinct().count() == 5)
    assert(back.agg(sum("amount")).head().getDouble(0)
      == (0 until nRows).map(_ * 0.25).sum)
    assert(ckpt.tableProgress("derbydb", "orders_src").get.status
      == TableStatus.Completed)
  }

  test("kill-and-resume from JDBC source: checkpointed partitions not re-copied") {
    seeded
    val (dir, ckpt, mig) = freshEnv()
    val dest = s"$dir/dest/orders"
    val ref = TableRef("derbydb", "orders_src")
    // simulate a prior run that finished regions 0 and 1 then died:
    // pre-copy those partitions into staging and checkpoint them.
    val withKey = source.withColumn("region_key", keyExprs.head.cast("string"))
    val pre = Seq(PartitionId.single("0"), PartitionId.single("1"))
    pre.foreach { p =>
      graft.copy.CopyService.copyPartition(
        withKey, keys, p, keys.map(col), s"$dest.staging")
      ckpt.markPartition(ref.db, ref.table, p)
    }
    val res = mig.migrateTable(ref, source, keys, keyExprs, dest)
    assert(res.status == TableStatus.Completed, res.error)
    // the resumed run copied only regions 2..4...
    assert(res.checkResults.forall(c =>
      c.partition != "'0'" && c.partition != "'1'"))
    // ...and the published table is complete and value-correct anyway
    // (checksumValidation=true re-verified every partition's content).
    val back = spark.read.option("basePath", dest).parquet(dest)
    assert(back.count() == nRows.toLong)
    assert(back.agg(sum("amount")).head().getDouble(0)
      == (0 until nRows).map(_ * 0.25).sum)
  }
}
