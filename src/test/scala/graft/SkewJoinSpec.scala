package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling is delegated to AQE (SCALE.md): a hot join key gets its
  * partition split at runtime instead of serializing one task. Forced
  * here with tiny thresholds over a deliberately skewed build side.
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on one hot key + a sprinkle of others; keep the
      // payload column through the join so the hot partition stays big
      val skewed = spark.range(200000)
        .select(when(col("id") % 100 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id"), lit("x" * 64)).as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k")
        .groupBy().agg(count(lit(1)).as("n"), sum(length(col("v"))).as("bytes"))
      val n = joined.collect()(0).getLong(0)
      assert(n > 190000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split join in plan:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
