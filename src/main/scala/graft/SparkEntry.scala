package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.queries contributes a Map[String, Q]; a Q is a
  * (SparkSession, sfDir) => DataFrame plus, when SQL-expressible, the
  * equivalent DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  /** All oracle-checkable queries, grouped by module. */
  def registry: Map[String, Q] =
    Relational.qs ++ ScalarFns.qs ++ FormatScans.qs ++
      Dedup.qs ++ TextOps.qs ++ PipelineOps.qs ++ Similarity.qs ++
      MultimodalQ.qs ++ StreamingQ.qs ++ Sessionize.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("rel_join_star_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.view.mapValues(_.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
