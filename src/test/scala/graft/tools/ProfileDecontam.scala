package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-time attribution for pipe_decontam_bloom (round-11 verdict ask
  * #6): the entry was 61% of the sf10 coreSet decade capture, so its
  * wall deserves a breakdown before any tuning. Mirrors the
  * bloomContaminated pipeline stage by stage, forcing each stage with a
  * count/noop and reporting deltas:
  *
  *   1. eval-gram build: explode + distinct over the eval split
  *   2. bloom build: df.stat.bloomFilter tree aggregate over eval grams
  *   3. train gram explode + map-side bloom probe (survivor count)
  *   4. exact verify: semi-join survivors against eval grams + distinct
  *
  *   SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.ProfileDecontam /tmp/graft-sf10"
  *
  * Stages share scan/explode work by construction (3 includes the train
  * explode that 4 reuses via the plan, not via a cache), so the deltas
  * are attribution evidence, not an additive identity with the gate
  * entry's wall.
  */
object ProfileDecontam {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
      r
    }

    // identical shape to PipelineOps.bloomContaminated / the gate entry
    val gram5 = "transform(sequence(0, size(w) - 5), i -> " +
      "concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def withGrams(df: DataFrame) =
      df.withColumn("w", split(col("text"), " ")).where(size(col("w")) >= 5)
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val evalDocs = docs.where(col("doc_id") % 97 === 0)

    val evalGrams = timed("1 eval-gram build (distinct)") {
      val g = withGrams(evalDocs)
        .select(explode(expr(gram5)).as("g")).distinct().localCheckpoint()
      println(s"[profile]   eval grams: ${g.count()}")
      g
    }
    val bf = timed("2 bloom tree-aggregate build") {
      evalGrams.stat.bloomFilter("g", 1000L * 1000L, 0.01)
    }
    println(s"[profile]   bloom bits: ${bf.bitSize()} (${bf.bitSize() / 8 / 1024} KiB)")
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bfB.value.mightContain(g))

    val trainGrams = withGrams(train)
      .select(col("doc_id"), col("source"), explode(expr(gram5)).as("g"))
    timed("3a train gram explode (count only)") {
      println(s"[profile]   train grams: ${trainGrams.count()}")
    }
    val survivors = trainGrams.where(mightContain(col("g")))
    timed("3b explode + bloom probe (survivors)") {
      println(s"[profile]   bloom survivors: ${survivors.count()}")
    }
    timed("4 exact verify join + distinct + agg") {
      val out = survivors.join(evalGrams, Seq("g"), "left_semi")
        .select("doc_id", "source").distinct()
        .groupBy("source").agg(count(lit(1)).as("n"), sum("doc_id").as("ck"))
      out.write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
