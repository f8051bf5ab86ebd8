package graft

/** The bench failure contract (a query that throws must surface, not
  * record its time-to-fail as a legitimate sample): a deliberately
  * broken query — injected via the SPARK_GRAFT_INJECT_FAIL test hook —
  * must produce a nonzero exit code and a per-query `errors` entry in
  * the emitted artifact, while a clean run of the same queries exits 0
  * with an empty error map. Runs graft.Bench as a child JVM (its own
  * isolated-run mechanics) because the main exits via sys.exit.
  */
class BenchErrorSpec extends SparkFunSuite {

  private def runBench(queries: String,
      injectFail: Option[String],
      extraEnv: Map[String, String] = Map.empty): (Int, String) = {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempFile("graft_bench_err", ".json")
    try {
      val javaBin = java.nio.file.Paths
        .get(sys.props("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala
        .filter(a => a.startsWith("--add-opens") ||
          a.startsWith("--add-exports") || a.startsWith("-Xmx"))
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sf0001)
      pb.environment().put("SPARK_GRAFT_CPUS", "2")
      pb.environment().put("SPARK_GRAFT_QUERIES", queries)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.toString)
      injectFail.foreach(pb.environment().put("SPARK_GRAFT_INJECT_FAIL", _))
      extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
      pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val proc = pb.start()
      assert(proc.waitFor(5, java.util.concurrent.TimeUnit.MINUTES),
        "bench child timed out")
      (proc.exitValue(), java.nio.file.Files.readString(out))
    } finally java.nio.file.Files.deleteIfExists(out)
  }

  test("a throwing query yields rc!=0 and an errors entry; a clean run rc==0") {
    val (rcBad, jsonBad) =
      runBench("m_partition_count,q1_pricing", Some("m_partition_count"))
    assert(rcBad != 0, s"broken query must fail the bench run: $jsonBad")
    assert(jsonBad.contains(""""rc":1"""), jsonBad)
    assert(jsonBad.contains(
      """"m_partition_count":"java.lang.RuntimeException: injected failure"""),
      jsonBad)
    // the healthy query's timing still records — the artifact stays
    // complete for triage even when a sibling breaks
    assert(jsonBad.contains(""""q1_pricing":"""), jsonBad)

    val (rcOk, jsonOk) = runBench("m_partition_count,q1_pricing", None)
    assert(rcOk == 0, s"clean run must exit 0: $jsonOk")
    assert(jsonOk.contains(""""errors":{}""") &&
      jsonOk.contains(""""rc":0"""), jsonOk)
    // filtered children default to NO control group (auto mode)
    assert(jsonOk.contains(""""control":{}""") &&
      jsonOk.contains(""""control_factor":null"""), jsonOk)
  }

  test("control group: forced on, the artifact carries all five controls and a numeric factor") {
    val (rc, json) = runBench("q1_pricing", None,
      extraEnv = Map("SPARK_GRAFT_CONTROL" -> "on"))
    assert(rc == 0, json)
    Seq("ctl_agg", "ctl_join", "ctl_window", "ctl_sort", "ctl_string")
      .foreach(n => assert(json.contains("\"" + n + "\":"), json))
    val cf = raw""""control_factor":([0-9.]+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toDouble)
    assert(cf.isDefined, s"control_factor must be numeric: $json")
    // sane window factor: the child runs on 2 cpus vs the 32-cpu
    // anchors, so allow a wide but bounded band — the point is it
    // PARSES and is in a plausible range, not its exact value
    assert(cf.get > 0.1 && cf.get < 100, s"implausible factor: $cf")
  }
}
