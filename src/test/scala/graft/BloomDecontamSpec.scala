package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom-prefilter decontamination path (pipe_decontam_bloom) makes
  * two claims the oracle alone can't check: (1) the Bloom phase is a
  * PREFILTER, not the answer — false positives must be killed by the
  * exact verify join, so the final rows equal the plain semi-join
  * plan's; (2) the prefilter actually prunes — the candidate gram count
  * after the Bloom must be a small fraction of the train grams, else
  * the map-only phase isn't buying anything at scale.
  */
class BloomDecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val SF = "/root/testdata/sf0.001"

  test("bloom + exact verify equals the pure semi-join answer") {
    val bloom = graft.SparkEntry.queries("pipe_decontam_bloom")(spark, SF).collect()
    val exact = graft.SparkEntry.queries("pipe_decontaminate")(spark, SF).collect()
    assert(bloom.toSeq == exact.toSeq)
  }

  test("bloom prefilter prunes the gram stream (map-side selectivity)") {
    val docs = spark.read.parquet(s"$SF/documents.parquet")
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 5)
    val gram5 =
      "transform(sequence(0, size(w) - 5), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))"
    val evalGrams = docs.where(col("doc_id") % 97 === 0)
      .select(explode(expr(gram5)).as("g")).distinct()
    val bf = evalGrams.stat.bloomFilter("g", 1000L * 1000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((g: String) => g != null && bfB.value.mightContain(g))
    val train = docs.where(col("doc_id") % 97 =!= 0)
      .select(explode(expr(gram5)).as("g"))
    val total = train.count()
    val candidates = train.where(mightContain(col("g"))).count()
    val trueHits = train.join(evalGrams, Seq("g"), "left_semi").count()
    // no false negatives ever; false positives bounded by fpp + slack
    assert(candidates >= trueHits)
    assert(candidates - trueHits <= (total * 0.02).toLong + 10,
      s"bloom passed $candidates of $total grams but only $trueHits are real")
  }
}
