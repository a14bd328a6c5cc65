package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
  /** oracleSql plus the data-dependent generated oracles (trained-model
    * exports, corpus-sized LSH constants) — Verify dumps THIS map, so the
    * emitted SQL always matches the corpus the driver compares against. */
  def oracleSqlFor(spark: SparkSession, dir: String,
                   only: Set[String] = Set.empty): Map[String, String] =
    Queries.oracleSqlFor(spark, dir, only)
}
