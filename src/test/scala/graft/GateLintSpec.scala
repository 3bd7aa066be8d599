package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The dtype-trap lint (round-8 verdict ask #2): every gate entry's
  * output schema must be sortable/hashable by the driver's pandas
  * checker — no nested top-level columns. Runs the whole registry at
  * sf0.001 (streaming entries execute a micro-batch during construction;
  * everything else is analysis-only).
  */
class GateLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("lint rejects a deliberately-nested gate output") {
    import spark.implicits._
    val bad = Seq((1, Seq("a", "b"))).toDF("id", "extra")
    val e = intercept[IllegalArgumentException] {
      GateLint.assertCheckerSafe("fixture_bad_entry", bad.schema)
    }
    assert(e.getMessage.contains("fixture_bad_entry"))
    assert(e.getMessage.contains("extra"))
    // struct + map columns are equally unhashable for pandas lexsort
    val bad2 = new StructType()
      .add("k", StringType)
      .add("m", MapType(StringType, LongType))
      .add("s", new StructType().add("x", LongType))
    assert(GateLint.uncheckableColumns(bad2).size == 2)
    // a raw DECIMAL top-level column is the other dtype-trap class:
    // decimal-computed entries must cast the final value to BIGINT
    val bad3 = new StructType()
      .add("k", StringType)
      .add("d", DecimalType(38, 0))
    assert(GateLint.uncheckableColumns(bad3) === Seq("d: decimal(38,0)"))
    // the decimal branch must advise the decimal fix (CAST to BIGINT),
    // not the nested-column rendering advice
    val e3 = intercept[IllegalArgumentException] {
      GateLint.assertCheckerSafe("fixture_decimal_entry", bad3)
    }
    assert(e3.getMessage.contains("CAST decimal columns"))
    assert(!e3.getMessage.contains("array_join"))
  }

  test("coreSet names only live registry entries") {
    val dead = SparkEntry.coreSet -- SparkEntry.registry.keySet
    assert(dead.isEmpty, s"coreSet references unknown entries: $dead")
  }

  test("every registry entry dumps a checker-safe (all-scalar) schema") {
    val offending = SparkEntry.registry.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = GateLint.uncheckableColumns(q.fn(spark, sf).schema)
        if (bad.isEmpty) Nil else Seq(s"$name -> ${bad.mkString(", ")}")
    }
    assert(offending.isEmpty,
      s"\nnested gate outputs (driver checker would die):\n  ${offending.mkString("\n  ")}")
  }
}
