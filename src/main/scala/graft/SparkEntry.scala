package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, CoreQueries, CorpusQueries, LlmQueries, SearchQueries, StatefulQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 is exercised by one entry
  * in [[queries]]; [[oracleSql]] holds the DuckDB-equivalent SQL for the
  * driver's differential correctness gate.
  */
object SparkEntry {

  private val all: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracle),
      (StatefulQueries.queries, StatefulQueries.oracle),
      (WindowQueries.queries, WindowQueries.oracle),
      (LlmQueries.queries, LlmQueries.oracle),
      (AnalyticQueries.queries, AnalyticQueries.oracle),
      (CorpusQueries.queries, CorpusQueries.oracle),
      (SearchQueries.queries, SearchQueries.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.map(_._2).reduce(_ ++ _)
}
