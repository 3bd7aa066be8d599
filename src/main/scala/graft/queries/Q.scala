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
    * session the harness hands us — the oracle always evaluates in UTC.
    *
    * NOTE: this is a deliberate session-level side effect, acceptable
    * only because every query in this registry assumes UTC. If these
    * queries are extracted into a standalone library, drop this line and
    * pin `spark.sql.session.timeZone=UTC` at SparkSession build instead —
    * a library function must not silently rewrite its caller's session. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.read.parquet(s"$dir/$name.parquet")
  }
}
