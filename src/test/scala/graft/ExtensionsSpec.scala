package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one-line wiring path: spark.sql.extensions=graft.GraftExtensions
  * makes every scalar function and TVF available with no further code
  * (the reference's `LOAD exon`). */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions inject scalar functions and TVFs into a fresh session") {
    // getOrCreate() would return the suite-shared session (extensions
    // only apply at session construction) — force a new session over
    // the same SparkContext
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions works on a reused SparkContext; the equivalent
    // spark.sql.extensions=graft.GraftExtensions is a static conf and
    // applies when the context itself is launched with it
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s.sql("SELECT complement('ATGC')").collect()(0).getString(0) == "TACG")
      assert(s.sql(
        "SELECT count(*) FROM read_fasta('src/test/resources/fixtures/fasta/test.fasta')")
        .collect()(0).getLong(0) == 2L)
      assert(s.sql("SELECT exondb_version()").collect()(0).getString(0) == "0.3.9")
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
