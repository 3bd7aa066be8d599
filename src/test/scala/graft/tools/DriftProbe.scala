package graft.tools

import org.apache.spark.sql.SparkSession

/** Quiet-run attribution probe for the r6->r7 bench drift (VERDICT r7
  * ask #3): the dozen entries that moved 1.5-4x between point captures
  * while the suite TOTAL fell, suspected co-tenant contention. This
  * runs exactly those entries back-to-back for N passes on one tree
  * and prints min/median/max — if an entry's r6->r7 delta sits inside
  * its own same-code run-to-run band, the drift was noise, not a code
  * change; an entry whose band is tight but whose captured delta is
  * far outside it would implicate code. Run on a quiet machine:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.tools.DriftProbe 7"
  */
object DriftProbe {

  val drifted: Seq[String] = Seq(
    "pipe_decontam_bloom", "rel_window_ranks", "rel_rollup",
    "rel_agg_pricing", "dedup_minhash_lsh", "dedup_winnowing",
    "dedup_semantic_probe2", "dedup_incremental", "dedup_filtered_corpus",
    "pipe_decontaminate", "pipe_contamination_report", "dedup_components")

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(7)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup pass (JIT + codegen caches), not recorded
    drifted.foreach(n => graft.SparkEntry.queries(n)(spark, dir).count())

    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { p =>
      drifted.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        times(n) = times(n) :+ sec
      }
      println(f"[drift] pass $p done")
    }
    println(f"[drift] ${"entry"}%-26s ${"min"}%7s ${"med"}%7s ${"max"}%7s  band(max/min)")
    drifted.foreach { n =>
      val v = times(n).sorted
      val (mn, md, mx) = (v.head, v(v.size / 2), v.last)
      println(f"[drift] $n%-26s $mn%7.2f $md%7.2f $mx%7.2f  ${mx / mn}%5.2fx")
    }
    spark.stop()
  }
}
