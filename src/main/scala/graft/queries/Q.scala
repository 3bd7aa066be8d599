package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable query: the Spark plan plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs through DuckDB on the same
  * parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name before hashing values.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object Q {
  /** `spark.read.parquet` over one driver-generated testdata table.
    * Pins session UTC so timestamp-derived results (date_format,
    * date_trunc, string-vs-timestamp filters) cannot depend on whatever
    * session the harness hands us — the oracle always evaluates in UTC. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.read.parquet(s"$dir/$name.parquet")
  }
}
