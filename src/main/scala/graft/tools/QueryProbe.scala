package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query wall profiler (dev tool, not part of the query
  * surface): runs each named query `SPARK_GRAFT_PROBE_RUNS` (default 3)
  * times in one warm JVM and prints every sample — exposes
  * first-run-vs-warm splits (standing-index builds) and run-to-run
  * noise that Bench's min-of-2 hides.
  *
  * Usage: SPARK_GRAFT_QUERIES=g_hits[,more] [SPARK_GRAFT_SF_DIR=…]
  *        sbt "runMain graft.tools.QueryProbe"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "g_hits").split(",")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        // the query's own plan, all columns materialized (Bench's protocol)
        graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        println(f"PROBE $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
