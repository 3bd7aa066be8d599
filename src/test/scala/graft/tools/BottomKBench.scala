package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the custom bottom_k_by_key TypedImperativeAggregate vs the
  * row_number-window formulation of the same deterministic per-group
  * sample, on synthetic data big enough for the shuffle difference to
  * dominate. Run:
  *
  *   sbt 'Test/runMain graft.tools.BottomKBench [rows] [groups] [k] [passes]'
  *
  * Results recorded in BENCH_NOTES.md. The aggregate's partial buffers
  * cap at k pairs per (group, partition) so the exchange carries
  * O(groups * k * partitions) rows; the window shuffles and sorts ALL
  * rows. Expect the gap to widen with rows-per-group.
  */
object BottomKBench {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val passes = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)

    // cache the input so the timing isolates aggregate-vs-window cost
    // (the md5 keying is identical work on both paths)
    val input = spark.range(rows)
      .selectExpr(s"id % $groups AS g", "id",
        "cast(conv(substr(md5(cast(id as string)), 1, 15), 16, 10) as bigint) AS hk")
      .persist()
    input.count()
    input.createOrReplaceTempView("bkb")

    def time(label: String, sql: String): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bottomk] $label%-10s ${ts.sorted.apply(ts.size / 2)}%.2f s (passes: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // warm-up both paths
    time("warmup-agg", s"SELECT g, bottom_k_by_key(hk, id, $k) FROM bkb GROUP BY g")
    time("aggregate", s"SELECT g, explode(bottom_k_by_key(hk, id, $k)) AS id FROM bkb GROUP BY g")
    time("window", s"""SELECT g, id FROM (
        SELECT g, id, row_number() OVER (PARTITION BY g ORDER BY hk, id) AS rn
        FROM bkb) WHERE rn <= $k""")
    spark.stop()
  }
}
