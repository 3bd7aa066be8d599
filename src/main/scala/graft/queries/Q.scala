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
    *
    * Timestamp-derived results (date_format, date_trunc,
    * string-vs-timestamp filters) assume `spark.sql.session.timeZone =
    * UTC`, pinned at SparkSession BUILD by every entry point (Verify,
    * Bench, SparkTestSession) — not here: a library function must not
    * silently rewrite its caller's session. Entries that manage their
    * own streaming sessions still pin explicitly where they also set
    * other session state. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Materialize-once + lineage-truncation barrier. Reliable checkpoint
    * when the session has a checkpoint dir configured (survives executor
    * loss / dynamic-allocation decommission — the fault-tolerance
    * contract a 100 TB run wants), localCheckpoint otherwise (gate and
    * bench: executor-local blocks, no DFS round-trip; an executor loss
    * costs a job retry, acceptable in a single-machine harness). */
  def barrier(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
