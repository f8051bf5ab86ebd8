package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain groups; each group
  * carries its own DuckDB oracle SQL. Name collisions across groups are
  * a bug — guarded in SparkEntrySpec.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q1_pricing")(spark, "/root/testdata/sf0.001")

  private[graft] def groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (MigrationQueries.defs, MigrationQueries.oracles),
      (RelationalQueries.defs, RelationalQueries.oracles),
      (WindowQueries.defs, WindowQueries.oracles),
      (FunctionQueries.defs, FunctionQueries.oracles),
      (EventQueries.defs, EventQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (DedupQueries.defs, DedupQueries.oracles),
      (SimilarityQueries.defs, SimilarityQueries.oracles),
      (AdvancedQueries.defs, AdvancedQueries.oracles),
      (GraphQueries.defs, GraphQueries.oracles),
      (SketchQueries.defs, SketchQueries.oracles),
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
