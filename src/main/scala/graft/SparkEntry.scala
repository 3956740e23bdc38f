package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, ExtendedQueries, PipelineQueries, Q, RankingQueries, Relational, StatsQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one query here; the
  * driver runs each against the DuckDB oracle (when `oracleSql` has the same
  * key) at sf0.01 and benchmarks the set at sf0.1.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    Relational.all ++ TextQueries.all ++ PipelineQueries.all ++ AdvancedQueries.all ++ ExtendedQueries.all ++ RankingQueries.all ++ StatsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
