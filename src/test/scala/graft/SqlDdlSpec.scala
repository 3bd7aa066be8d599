package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL DDL over the DSv2 providers: persistent tables declared with
  * USING <format> — the catalog-integrated way to expose a genomic file
  * as a named table. */
class SqlDdlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = new java.io.File("src/test/resources/fixtures").getAbsolutePath

  test("CREATE TABLE USING fasta + SELECT") {
    spark.sql("DROP TABLE IF EXISTS reads")
    spark.sql(s"CREATE TABLE reads USING fasta OPTIONS (path '$F/fasta/test.fasta')")
    try {
      val got = spark.sql("SELECT id, sequence FROM reads WHERE id = 'r1'").collect()
      assert(got.map(_.toSeq).toSeq == Seq(Seq("r1", "ATCGATCGGGCC")))
      assert(spark.sql("SELECT count(*) FROM reads").collect()(0).getLong(0) == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS reads")
  }

  test("CREATE TABLE USING vcf keeps the header-driven schema") {
    spark.sql("DROP TABLE IF EXISTS calls")
    spark.sql(s"CREATE TABLE calls USING vcf OPTIONS (path '$F/vcf/test.vcf.gz')")
    try {
      assert(spark.sql("SELECT info.dp FROM calls WHERE pos = 205").collect()(0).getInt(0) == 14)
    } finally spark.sql("DROP TABLE IF EXISTS calls")
  }
}
