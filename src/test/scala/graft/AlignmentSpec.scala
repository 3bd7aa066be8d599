package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Pins the reference's test_align.test goldens. */
class AlignmentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def one(sql: String): Any = {
    GraftFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql").collect()(0).get(0)
  }

  test("golden: ('AACC','AAACC') -> '2M1D2M' across arities") {
    assert(one("alignment_string_wfa_gap_affine('AACC','AAACC')") == "2M1D2M")
    assert(one("alignment_string_wfa_gap_affine('AACC','AAACC', -1, 1, 2, 3, 'memory_low')") == "2M1D2M")
    assert(one("alignment_string_wfa_gap_affine('AACC','AAACC', 1, 1, 1, 'memory_low')") == "2M1D2M")
    assert(one("alignment_string('AACC','AAACC')") == "2M1D2M")
  }

  test("positive match penalty is a bind error (7-arg form)") {
    GraftFunctions.registerAll(spark)
    assertThrows[Exception](
      spark.sql("SELECT alignment_string_wfa_gap_affine('AACC','AAACC', 1, 1, 1, 1, 'memory_low')").collect())
  }

  test("golden: identical strings score 0.0") {
    assert(one("alignment_score_wfa_gap_affine('AACC','AACC')") == 0.0f)
    assert(one("alignment_score('AACC','AACC')") == 0.0f)
  }

  test("perfect-alignment score is +0.0, not -0.0 (sign bit clear)") {
    // -0.0f == 0.0f is true, so compare representations: 1/-0.0 = -Inf.
    val v = one("alignment_score('AACC','AACC')").asInstanceOf[Float]
    assert(1.0f / v > 0.0f, s"score must be +0.0, got ${java.lang.Float.floatToRawIntBits(v).toHexString}")
    val direct = graft.functions.Aligner.score("AACC", "AACC", graft.functions.Aligner.Penalties())
    assert(1.0f / direct > 0.0f)
  }

  test("score reflects penalties (one mismatch = -4 by default)") {
    assert(one("alignment_score('AACC','AACT')") == -4.0f)
    assert(one("alignment_score('AACC','AAACC')") == -8.0f) // open 6 + ext 2
  }

  test("mismatches/gaps compress correctly") {
    assert(one("alignment_string('ACGT','ACGT')") == "4M")
    assert(one("alignment_string('AAAA','AATAA')") == "2M1D2M")
    assert(one("alignment_string('AATAA','AAAA')") == "2M1I2M")
  }
}
