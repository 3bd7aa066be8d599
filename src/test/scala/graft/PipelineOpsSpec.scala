package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the pipeline ops that the DuckDB oracle can't express:
  * LSH-ANN recall against the brute-force baseline. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val SF = "/root/testdata/sf0.001"

  test("LSH ANN results appear in the brute-force top-10 with decent recall") {
    val brute = SparkEntry.queries("ann_bruteforce_topk")(spark, SF)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("ann_lsh_bucketed")(spark, SF)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.nonEmpty, "LSH should produce candidates")
    val hits = lsh.count(brute.contains)
    assert(hits.toDouble / lsh.length >= 0.4,
      s"LSH precision vs brute-force top-10 too low: $hits/${lsh.length}")
  }

  test("every query name is unique and every query has an oracle") {
    val total = SparkEntry.queries.size
    val withOracle = SparkEntry.oracleSql.size
    assert(total == SparkEntry.registry.size)
    assert(withOracle == total, s"$withOracle/$total oracles")
  }
}
