package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one-line wiring path: spark.sql.extensions=graft.GraftExtensions
  * makes every scalar function and TVF available with no further code
  * (the reference's `LOAD exon`). */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions inject scalar functions and TVFs into a fresh session") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s.sql("SELECT complement('ATGC')").collect()(0).getString(0) == "TACG")
      assert(s.sql(
        "SELECT count(*) FROM read_fasta('src/test/resources/fixtures/fasta/test.fasta')")
        .collect()(0).getLong(0) == 2L)
      assert(s.sql("SELECT exondb_version()").collect()(0).getString(0) == "0.3.9")
    } finally () // keep shared context; session reuses the test JVM's SparkContext
  }
}
