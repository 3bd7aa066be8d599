package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Skew evidence at tier scale (round-9 verdict ask #5): run the
  * skew-sensitive operators on a uniform replica tier and on a
  * MakeTier-skewed twin (one hot chromosome / one hot doc domain at
  * ~30% mass — `MakeTier src out K 0.3`), report wall per entry on
  * each, and inspect the skew tier's AQE-final plans for engaged skew
  * handling (`skew=true` on shuffle reads / join markers).
  *
  *   sbt "Test/runMain graft.tools.SkewTierProbe /tmp/graft-sf1 /tmp/graft-sf1skew"
  *
  * What "holds" means per family: the interval joins are equi-joins on
  * (chrom, bin) — the bin key keeps the hot chromosome's intervals
  * spread over thousands of bins, so no single task owns the hot mass
  * even before AQE; dedup's banded joins hash on (band, signature)
  * where a hot dup family concentrates, which is exactly where AQE's
  * skew split (sort-merge path) or the salted formulations take over;
  * source_cap's two-level salted top-K was BUILT for the hot-domain
  * shape — level one splits each domain across 16 salt shards.
  */
object SkewTierProbe {

  private val Entries = Seq(
    "rel_interval_bin_join", "rel_interval_window_join",
    "dedup_components", "dedup_minhash_lsh", "pipe_source_cap")

  def main(args: Array[String]): Unit = {
    val uniform = args.headOption.getOrElse("/tmp/graft-sf1")
    val skewed = args.lift(1).getOrElse("/tmp/graft-sf1skew")
    val entries = args.lift(2).map(_.split(",").toSeq).getOrElse(Entries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, dir: String): (Double, String) = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      val df2 = SparkEntry.queries(name)(spark, dir)
      df2.write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, df2.queryExecution.executedPlan.toString)
    }

    entries.foreach { name =>
      val (tu, _) = run(name, uniform)
      val (ts, plan) = run(name, skewed)
      val skewSplits = "skew=true".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      println(f"[skewtier] $name%-28s uniform=$tu%6.2f s  skewed=$ts%6.2f s  " +
        f"ratio=${ts / tu}%4.2f  skew_splits=$skewSplits smj=$smj bhj=$bhj")
    }

    // AQE's skew-join split never fires at this tier with default
    // thresholds (256 MB skewed-partition floor vs MB-scale partitions
    // here) — skew_splits=0 above is expected, the operators hold via
    // key design (bin spreading, banding, salting). To prove the AQE
    // rescue DOES engage on the real operator when a partition is
    // genuinely outsized relative to its siblings, rerun the
    // sort-merge-bearing entry with the thresholds scaled to the tier.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      entries.foreach { name =>
        val (ts, plan) = run(name, skewed)
        val skewSplits = "skew=true".r.findAllIn(plan).length
        if (skewSplits > 0)
          println(f"[skewtier] $name%-28s scaled-threshold rerun: " +
            f"skew_splits=$skewSplits wall=$ts%6.2f s (AQE split engaged)")
      }
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
    spark.stop()
  }
}
