package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** VCF writing: `parse ∘ write = id` at the record level (values, not
  * bytes — the header is reconstructed from the Spark schema), sample
  * columns and typed genotypes survive the round trip, and a
  * bgzf+tabix write is region-queryable through its own sidecar. */
class VcfWriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "src/test/resources/fixtures/vcf"

  private def rows(df: DataFrame, cols: String*): Seq[String] =
    df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq

  test("plain VCF round trip preserves every record value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vcfw").toString
    val orig = GraftIO.read_vcf_file_records(spark, s"$F/test.vcf")
    orig.write.mode("overwrite").format("vcf").save(dir)
    val back = GraftIO.read_vcf_file_records(spark, dir)
    val cols = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter",
      "info.indel", "info.dp", "info.af")
    assert(rows(back, cols: _*) == rows(orig, cols: _*))
    assert(back.count() == 5)
  }

  test("sample columns and typed genotypes survive the round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vcfw2").toString
    val orig = GraftIO.read_vcf_file_records(spark, s"$F/samples.vcf")
    orig.write.mode("overwrite").format("vcf").save(dir)
    val back = GraftIO.read_vcf_file_records(spark, dir)
    val cols = Seq("chrom", "pos", "ref", "format", "genotypes",
      "genotypes_typed[0].gt", "genotypes_typed[1].gq")
    assert(rows(back, cols: _*) == rows(orig, cols: _*))
    // the reconstructed header re-declares FORMAT fields: the typed
    // schema must exist on read-back, derived from genotypes_typed
    assert(back.schema.fieldNames.contains("genotypes_typed"))
  }

  test("bgzf + tabix VCF write is region-queryable through its own sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vcfw3").toString
    GraftIO.read_vcf_file_records(spark, s"$F/indexed.vcf.gz")
      .repartition(1).sortWithinPartitions("chrom", "pos")
      .write.mode("overwrite")
      .option("compression", "bgzf").option("index", "tabix")
      .format("vcf").save(dir)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".vcf.gz.tbi")), files.toSeq)
    val dataFile = dir + "/" + files.find(_.endsWith(".vcf.gz")).get
    val full = GraftIO.read_vcf_file_records(spark, dataFile)
    for (region <- Seq("1:100000-500000", "2:1-2000", "1", "1:1596930-1596930")) {
      val (chr, lo, hi) = graft.sources.VcfFormat.parseRegion(region)
      val want = rows(full.where(s"chrom = '$chr' AND pos >= $lo AND pos <= $hi"),
        "chrom", "pos", "ref", "info.dp")
      val got = rows(GraftIO.vcf_query(spark, dataFile, region),
        "chrom", "pos", "ref", "info.dp")
      assert(got == want, region)
    }
  }

  test("ragged genotype arrays fail the write loudly, not as a corrupt file") {
    // dropping one sample from one record would render a row whose
    // sample-column count disagrees with the header's #CHROM line — a
    // file htslib rejects; the writer must refuse at write time
    val dir = java.nio.file.Files.createTempDirectory("graft-vcfw5").toString
    val orig = GraftIO.read_vcf_file_records(spark, s"$F/samples.vcf")
    val ragged = orig.withColumn("genotypes",
      when(col("pos") === orig.selectExpr("max(pos)").first().getLong(0),
        expr("slice(genotypes, 1, size(genotypes) - 1)"))
        .otherwise(col("genotypes")))
    val e = intercept[org.apache.spark.SparkException] {
      ragged.repartition(1).write.mode("overwrite").format("vcf").save(dir)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("disagrees with")), messages(e).mkString("|"))
  }

  test("an empty write still produces a parseable headered file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vcfw4").toString
    val orig = GraftIO.read_vcf_file_records(spark, s"$F/test.vcf")
    orig.where("pos < 0").write.mode("overwrite").format("vcf").save(dir)
    val back = GraftIO.read_vcf_file_records(spark, dir)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.take(8).toSeq ==
      Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info"))
  }
}
