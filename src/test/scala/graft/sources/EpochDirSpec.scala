package graft.sources

import graft.SparkFunSuite

/** EpochDir lifecycle edges beyond CompactionSpec's happy path: the
  * legacy flat-layout read + adoption, the `_SUCCESS` commit-record
  * verification (the marksuccessfuljobs=false failure mode), and the
  * configurable grace retention.
  */
class EpochDirSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def writeEpoch(target: String, ids: Seq[Long]): Unit =
    ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(target)

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).as[Long].collect().toSet

  private def epochDirs(base: String): Set[String] =
    new java.io.File(base).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("e\\d+"))
      .map(_.getName).toSet

  test("legacy flat index stays readable and the first publish adopts it as e0") {
    val base = tmpDir("epoch_legacy") + "/idx"
    // pre-epoch layout: parquet files + _SUCCESS directly under base
    writeEpoch(base, Seq(1L, 2L, 3L))
    assert(new java.io.File(base, "_SUCCESS").exists())
    // readers resolve the flat dir itself — no migration required
    assert(EpochDir.live(spark, base) == base)
    assert(readIds(EpochDir.live(spark, base)) == Set(1L, 2L, 3L))
    // first publish adopts: legacy content becomes e0 (the grace
    // epoch), the new write lands as e1 and is live
    EpochDir.publish(spark, base)(t => writeEpoch(t, Seq(4L, 5L)))
    assert(EpochDir.live(spark, base).endsWith("/e1"))
    assert(readIds(EpochDir.live(spark, base)) == Set(4L, 5L))
    assert(epochDirs(base) == Set("e0", "e1"))
    assert(readIds(s"$base/e0") == Set(1L, 2L, 3L),
      "the adopted legacy content must serve as the grace epoch")
    assert(!new java.io.File(base, "_SUCCESS").exists(),
      "the flat commit marker must move into e0 with the data")
  }

  test("epoch-pinned reads: epochs() lists snapshots, at() resolves them, purged pins fail loud") {
    val base = tmpDir("epoch_pinned") + "/idx"
    for (i <- 0 to 2)
      EpochDir.publish(spark, base, retain = 2)(t =>
        writeEpoch(t, Seq(i.toLong)))
    // retain=2 beside live e2: epochs 0,1,2 all committed and pinnable
    assert(EpochDir.epochs(spark, base) == Seq(0L, 1L, 2L))
    assert(readIds(EpochDir.at(spark, base, 0)) == Set(0L))
    assert(readIds(EpochDir.at(spark, base, 1)) == Set(1L))
    assert(EpochDir.at(spark, base, 2) == EpochDir.live(spark, base))
    // the reproducible-run protocol: a run pins epoch 1 at start; a
    // publish lands meanwhile; the pinned read is UNCHANGED while the
    // live read moved
    val pinned = EpochDir.at(spark, base, 1)
    EpochDir.publish(spark, base, retain = 2)(t =>
      writeEpoch(t, Seq(3L)))
    assert(readIds(pinned) == Set(1L),
      "a pinned snapshot must survive a concurrent publish")
    assert(readIds(EpochDir.live(spark, base)) == Set(3L))
    // epoch 0 fell out of the retain window: pinning it fails loud
    // with the committed list and the retain hint
    val e = intercept[IllegalArgumentException](EpochDir.at(spark, base, 0))
    assert(e.getMessage.contains("retain"))
    assert(EpochDir.epochs(spark, base) == Seq(1L, 2L, 3L))
  }

  test("publish fails loud (and purges nothing) when the write leaves no _SUCCESS") {
    val base = tmpDir("epoch_nomarker") + "/idx"
    EpochDir.publish(spark, base)(t => writeEpoch(t, Seq(1L)))
    EpochDir.publish(spark, base)(t => writeEpoch(t, Seq(2L)))
    assert(epochDirs(base) == Set("e0", "e1"))
    // a writer configured with marksuccessfuljobs=false: files land,
    // no commit marker — the epoch is invisible to every reader, so
    // publishing must throw instead of purging the live index
    val e = intercept[IllegalStateException] {
      EpochDir.publish(spark, base) { t =>
        writeEpoch(t, Seq(3L))
        new java.io.File(t, "_SUCCESS").delete()
      }
    }
    assert(e.getMessage.contains("marksuccessfuljobs"))
    // the pre-publish epochs survived untouched and e1 is still live
    assert(epochDirs(base).intersect(Set("e0", "e1")) == Set("e0", "e1"))
    assert(readIds(EpochDir.live(spark, base)) == Set(2L))
  }

  test("retain widens the grace window for lagging readers") {
    val base = tmpDir("epoch_retain") + "/idx"
    for (i <- 0 to 3)
      EpochDir.publish(spark, base, retain = 2)(t =>
        writeEpoch(t, Seq(i.toLong)))
    // retain=2: epochs 1 and 2 survive as grace beside live e3
    assert(epochDirs(base) == Set("e1", "e2", "e3"))
    // a reader that resolved two publishes ago can still finish
    assert(readIds(s"$base/e1") == Set(1L))
    assert(readIds(EpochDir.live(spark, base)) == Set(3L))
    // default retain=1 on the next publish shrinks the window back
    EpochDir.publish(spark, base)(t => writeEpoch(t, Seq(4L)))
    assert(epochDirs(base) == Set("e3", "e4"))
  }
}
