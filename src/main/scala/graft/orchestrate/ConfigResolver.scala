package graft.orchestrate

import graft.model.MigrationConfig

/** Config resolution with precedence CLI > env > default.
  *
  * The reference documents CLI > env > file but the YAML file is loaded
  * and never consulted, and `or`-based merging lets falsy CLI values fall
  * through (reference: clickhouse_migrator/config.py:107-130; SURVEY.md
  * A45 quirks). Here the chain is explicit `Option` precedence, so empty
  * strings and zeros supplied on the CLI are respected.
  */
object ConfigResolver {

  val EnvPrefix = "GRAFT_"

  def resolve(
      args: Map[String, String],
      env: Map[String, String] = sys.env): MigrationConfig = {
    def pick(key: String, default: String): String =
      args.get(key)
        .orElse(env.get(EnvPrefix + key.toUpperCase.replace('-', '_')))
        .getOrElse(default)

    MigrationConfig(
      mode = pick("mode", "single"),
      db = pick("db", "default"),
      table = pick("table", ""),
      sourcePath = pick("source", ""),
      destPath = pick("dest", ""),
      partitionKeys = pick("keys", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      insertIntervalSec = pick("insert-interval", "0").toDouble,
      resume = pick("resume", "true").toBoolean,
      checkpointPath = pick("checkpoint", "migration_progress.json"),
      lockDir = pick("lock-dir", "locks"))
  }

  /** `--key value` pairs → map (unknown keys rejected). */
  def parseArgs(argv: Array[String]): Map[String, String] = {
    val known = Set("mode", "db", "table", "source", "dest", "keys",
      "insert-interval", "resume", "checkpoint", "lock-dir", "report-dir",
      "partition-expr")
    argv.grouped(2).map {
      case Array(k, v) if k.startsWith("--") =>
        val key = k.stripPrefix("--")
        if (!known.contains(key))
          throw new IllegalArgumentException(s"unknown option --$key")
        key -> v
      case other =>
        throw new IllegalArgumentException(
          s"expected --key value pairs, got: ${other.mkString(" ")}")
    }.toMap
  }
}
