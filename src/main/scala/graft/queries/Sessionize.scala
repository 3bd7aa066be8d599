package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization of the events stream via the typed
  * KeyValueGroupedDataset API — arbitrary per-group logic (the batch
  * sibling of flatMapGroupsWithState; at unbounded scale the same
  * function body moves into the streaming variant with state timeouts).
  * Each user's events are sorted in-executor and split on >30-minute
  * gaps. The oracle re-derives sessions relationally (lag + running
  * sum over a window), proving the imperative and declarative
  * formulations agree row-for-row.
  */
object Sessionize {

  private val GapMicros: Long = 30L * 60 * 1000 * 1000

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class Session(user_id: Long, sid: Int, session_start_us: Long,
                           n_events: Long, sum_value_cents: Long)

  val qs: Map[String, Q] = Map(
    "stream_sessionize" -> Q(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        import s.implicits._
        val ev = Q.t(s, dir, "events")
          .selectExpr("user_id", "ts div 1000 AS ts_us", "value")
          .as[Ev]
        val sessions = ev.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
          val evs = it.toArray.sortBy(e => (e.ts_us, e.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var sid = -1
          var start = 0L
          var n = 0L
          var cents = 0L
          var prev = Long.MinValue
          def flush(): Unit = if (n > 0) out += Session(uid, sid, start, n, cents)
          evs.foreach { e =>
            if (prev == Long.MinValue || e.ts_us - prev > GapMicros) {
              flush(); sid += 1; start = e.ts_us; n = 0; cents = 0
            }
            // exact cents (value has 2 decimals) keep sums engine-exact
            n += 1; cents += math.round(e.value * 100); prev = e.ts_us
          }
          flush()
          out
        }
        sessions.toDF()
          .select(col("user_id"), col("sid"),
            date_format(timestamp_micros(col("session_start_us")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("n_events"),
            (col("sum_value_cents").cast(DecimalType(18, 0)) / 100).cast(DecimalType(18, 2))
              .cast("double").as("sum_value"))
          .orderBy("user_id", "sid")
      },
      Some("""WITH m AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value)
                      > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) IS NULL
                 THEN 1 ELSE 0 END AS new_s
          FROM events),
        g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sid
              FROM m)
        SELECT user_id, CAST(sid AS INTEGER) AS sid,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          count(*) AS n_events,
          CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        FROM g GROUP BY user_id, sid ORDER BY user_id, sid"""))
  )
}
