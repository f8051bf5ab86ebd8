package graft.orchestrate

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkFunSuite
import graft.model.{TableRef, TableStatus}
import graft.operators.Partitions
import graft.resume.Checkpoint

/** The checksum gate must catch a same-count value corruption that the
  * count-only gate (and hence the reference) would let through.
  */
class ChecksumGateSpec extends SparkFunSuite {

  test("checksum gate blocks a same-count corrupted staging copy") {
    val dir = Files.createTempDirectory("mig_chk")
    val ckpt = new Checkpoint(dir.resolve("progress.json"))
    val mig = new Migrator(spark, ckpt, lockDir = s"$dir/locks",
      checksumValidation = true)
    val dest = s"$dir/dest/lineitem"
    val ref = TableRef("testdb", "lineitem")
    val keys = Seq("l_month")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val withKey = li.withColumn("l_month",
      date_format(col("l_shipdate"), "yyyy-MM").cast("string"))

    // simulate a fully-copied-and-checkpointed run whose staging data was
    // corrupted in flight: one partition has every quantity bumped — same
    // row COUNT, different content.
    val allParts = Partitions.enumeratePartitions(withKey, keys)
    val victim = allParts.head.values.head
    val corrupted = withKey.withColumn("l_quantity",
      when(col("l_month") === victim, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    allParts.foreach { p =>
      graft.copy.CopyService.copyPartition(
        corrupted, keys, p, keys.map(col), s"$dest.staging")
      ckpt.markPartition(ref.db, ref.table, p)
    }

    val res = mig.migrateTable(ref, li, keys,
      Seq(date_format(col("l_shipdate"), "yyyy-MM")), dest)
    assert(res.status == TableStatus.Failed)
    assert(res.error.exists(_.contains("checksum mismatch")))
    assert(res.error.exists(_.contains(victim)))
    assert(!Files.exists(Paths.get(dest))) // nothing published

    // control: a faithful staging copy passes the checksum gate
    val dir2 = Files.createTempDirectory("mig_chk_ok")
    val ckpt2 = new Checkpoint(dir2.resolve("progress.json"))
    val mig2 = new Migrator(spark, ckpt2, lockDir = s"$dir2/locks",
      checksumValidation = true)
    val res2 = mig2.migrateTable(ref, li, keys,
      Seq(date_format(col("l_shipdate"), "yyyy-MM")), s"$dir2/dest/lineitem")
    assert(res2.status == TableStatus.Completed, res2.error)
  }

  test("checksum gate: numeric-looking string keys ('01', '1e3') round-trip") {
    // Default partition-column type inference would re-parse '01' as 1
    // and '1e3' as 1000.0 on the staging read-back, diverging from the
    // source-side keys → spurious mismatch on CORRECT data (ADVICE).
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("mig_chk_inf")
    val ckpt = new Checkpoint(dir.resolve("progress.json"))
    val mig = new Migrator(spark, ckpt, lockDir = s"$dir/locks",
      checksumValidation = true)
    val df = Seq(
      (1L, "01", "a"), (2L, "01", "b"), (3L, "1e3", "c"), (4L, "007", "d")
    ).toDF("id", "k", "v")
    val res = mig.migrateTable(
      TableRef("testdb", "inf"), df, Seq("k"), Seq(col("k")), s"$dir/dest/inf")
    assert(res.status == TableStatus.Completed,
      s"spurious checksum mismatch on correct data: ${res.error}")
  }
}
