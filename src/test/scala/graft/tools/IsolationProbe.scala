package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolation-cost vs machine-band A/B (round-11 verdict ask #5).
  *
  * Round 11's Bench added per-entry isolation (cache-manager clear +
  * unpersist + GC after each timed region), and the 404 entries common
  * with round 10 read 1.73x slower in the driver capture. Two causes
  * were claimed but not separated: (a) entries now measure COLD cost
  * instead of riding predecessors' retained blocks, and (b) the
  * capture ran on a loaded evening (pass spread +/-23%). This probe
  * separates them IN ONE SESSION by interleaving whole passes of a
  * fixed 20-entry slice with isolation ON and OFF (A B A B ...):
  *
  *   - cold-measure x (per entry) = median(iso passes) /
  *     median(warm passes) — machine band cancels because the modes
  *     interleave minutes apart;
  *   - band x = max/min across same-mode passes — what the machine
  *     alone does to identical code.
  *
  * The slice mirrors the families that moved most in the r11 diff:
  * the mm_* image entries (2.5-4x, cached-decode loss suspected), the
  * dedup/pipe heavyweights, and a flat control group (scans, aggs)
  * whose cold cost should equal warm cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.tools.IsolationProbe [passesPerMode]"
  * Results recorded in BENCH_NOTES.md.
  */
object IsolationProbe {

  val slice: Seq[String] = Seq(
    // image/media family (largest r11 movers)
    "mm_real_frames", "mm_frame_diff_energy", "mm_ahash_pairs",
    "mm_gradient_energy", "mm_image_exposure_bins", "mm_real_decode",
    // dedup/pipe heavyweights (barrier + broadcast retention)
    "dedup_minhash_lsh", "dedup_components", "dedup_semantic",
    "dedup_incremental", "dedup_winnowing", "pipe_decontam_bloom",
    "pipe_decontaminate", "pipe_c4_filter",
    // control group: single-pass scans/aggs with nothing to retain
    "rel_rollup", "rel_window_ranks", "text_bm25_topk",
    "text_tfidf_top_terms", "fmt_vcf_scan", "fmt_bam_scan")

  def main(args: Array[String]): Unit = {
    val passesPerMode = args.headOption.map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }

    // warmup (JIT + codegen + file staging), then a clean slate
    slice.foreach(n => graft.SparkEntry.queries(n)(spark, dir)
      .write.mode("overwrite").format("noop").save())
    isolate()

    val iso = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val warm = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // interleave whole passes: iso, warm, iso, warm, ... so slow
    // co-tenant windows hit both modes equally
    for (p <- 1 to passesPerMode; mode <- Seq("iso", "warm")) {
      slice.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (mode == "iso") { iso(n) = iso(n) :+ sec; isolate() }
        else warm(n) = warm(n) :+ sec
      }
      // reset retention before the next iso pass so each iso pass
      // starts cold and each warm pass starts from one full suite of
      // retained state (the r10 bench's steady state)
      if (mode == "warm") isolate()
      println(s"[isoprobe] pass $p/$passesPerMode mode=$mode done")
    }

    def med(v: Vector[Double]): Double = v.sorted.apply(v.size / 2)
    println(f"[isoprobe] ${"entry"}%-26s ${"iso_med"}%8s ${"warm_med"}%9s ${"cold_x"}%7s ${"iso_band"}%9s ${"warm_band"}%10s")
    var isoTot = 0.0; var warmTot = 0.0
    slice.foreach { n =>
      val (i, w) = (iso(n), warm(n))
      isoTot += med(i); warmTot += med(w)
      println(f"[isoprobe] $n%-26s ${med(i)}%8.2f ${med(w)}%9.2f ${med(i) / med(w)}%7.2f ${i.max / i.min}%8.2fx ${w.max / w.min}%9.2fx")
    }
    println(f"[isoprobe] TOTAL iso=${isoTot}%.1f s warm=${warmTot}%.1f s cold-measure x=${isoTot / warmTot}%.2f")
    spark.stop()
  }
}
