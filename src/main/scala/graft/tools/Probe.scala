package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage-level profiler for expensive operators (dev tool, not part
  * of the query surface). Times each intermediate of the MinHash-LSH
  * pipeline separately so regressions can be attributed to a stage.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val rel = Dedup.shingleRelation(docs, "doc_id", "text").persist(MEMORY_AND_DISK)
    time("rel.count")(rel.count())
    val bandsDf = Dedup.bandsFromRelation(rel, 6, 2).persist(MEMORY_AND_DISK)
    time("bands.count")(bandsDf.count())
    val cand = Dedup.lshCandidates(bandsDf)
    time("cand.count")(cand.count())
    val verified = Dedup.jaccardForCandidates(rel, cand, 0.5)
    time("verify.count")(verified.count())
    rel.unpersist(); bandsDf.unpersist()

    // end-to-end as the bench sees it (cold plan, includes localCheckpoint)
    time("e2e.minhashNearDups")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.5).count())
    time("e2e.repeat")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
