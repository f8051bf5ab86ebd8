package graft

/** Classpath shipping for `local-cluster[...]` masters (single-machine
  * multi-JVM runs). Worker-launched executor processes start with only
  * the Spark jars, so the driver ships its own `java.class.path` as
  * `spark.executor.extraClassPath` — but entries in that property can be
  * RELATIVE to the launching JVM's CWD (a bare
  * `java -cp target/scala-2.13/classes:...` launch). An executor runs
  * from its own work directory, where a relative entry silently resolves
  * to nothing; the application's classes then fail to load on the
  * executor, surfacing as a deferred ClassNotFoundException that
  * Java deserialization re-reports as a
  * `SerializedLambda cannot be cast to Function3` ClassCastException in
  * whichever task first deserializes an app-class closure. sbt forks
  * with absolute paths, which masked this until the scaling harness
  * launched the mains with bare `java` (round-20 third-decade runs).
  * Absolutize every entry against the driver's CWD before shipping.
  */
object SparkLaunch {
  def executorClasspath: String =
    sys.props("java.class.path")
      .split(java.io.File.pathSeparator)
      .filter(_.nonEmpty)
      .map(e => new java.io.File(e).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
}
