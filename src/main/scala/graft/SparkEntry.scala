package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q06_kvstore_join(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VersionedQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ VectorQueries.queries ++
      LifecycleQueries.queries ++ TableQueries.queries ++ FormatQueries.queries ++
      MultimodalQueries.queries ++ RewriterQueries.queries ++ CliQueries.queries ++ TemporalQueries.queries ++ SketchQueries.queries ++ BpeQueries.queries ++ LexicalQueries.queries ++ CurationQueries.queries ++ UnigramQueries.queries ++ DsirQueries.queries ++ WordPieceQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ VersionedQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++ VectorQueries.oracleSql ++
      LifecycleQueries.oracleSql ++ TableQueries.oracleSql ++ FormatQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ RewriterQueries.oracleSql ++ CliQueries.oracleSql ++ TemporalQueries.oracleSql ++ SketchQueries.oracleSql ++ BpeQueries.oracleSql ++ LexicalQueries.oracleSql ++ CurationQueries.oracleSql ++ UnigramQueries.oracleSql ++ DsirQueries.oracleSql ++ WordPieceQueries.oracleSql
}
