package graft.orchestrate

import java.io.StringReader
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Properties

import scala.jdk.CollectionConverters._

import graft.model.MigrationConfig

/** Config resolution with precedence CLI > env > file > default.
  *
  * The reference documents CLI > env > file (reference:
  * clickhouse_migrator/config.py:107-130) but ships two bugs: the YAML
  * file is loaded at config.py:110 and then never consulted in the merge,
  * and `or`-based merging lets falsy CLI values (port 0, empty password)
  * silently fall through to env defaults (SURVEY.md A45 quirks). Here the
  * documented semantics are implemented rather than the buggy ones: the
  * file layer is a real precedence tier (java.util.Properties `key=value`
  * format instead of YAML — no extra dependency; same flat keys as the
  * CLI flags), and the chain is explicit `Option` precedence, so empty
  * strings and zeros supplied on the CLI are respected.
  */
object ConfigResolver {

  val EnvPrefix = "GRAFT_"

  /** Load a `key = value` properties config file. Keys use the same
    * spelling as the CLI flags (e.g. `insert-interval`). Missing path →
    * error; no file configured → empty layer (handled by [[resolve]]).
    */
  def loadConfigFile(path: String): Map[String, String] = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val props = new Properties()
    props.load(new StringReader(text))
    props.asScala.toMap
  }

  def resolve(
      args: Map[String, String],
      env: Map[String, String] = sys.env): MigrationConfig = {
    // The file layer's own location is CLI > env resolvable (a file can't
    // name itself): --config on the CLI or GRAFT_CONFIG in the env.
    val fileVals: Map[String, String] =
      args.get("config").orElse(env.get(EnvPrefix + "CONFIG"))
        .map(loadConfigFile)
        .getOrElse(Map.empty)

    def pick(key: String, default: String): String =
      args.get(key)
        .orElse(env.get(EnvPrefix + key.toUpperCase.replace('-', '_')))
        .orElse(fileVals.get(key))
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
      "partition-expr", "config")
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
