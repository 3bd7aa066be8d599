package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftTableFunctions

/** SQL TVF surface: the reference's `SELECT * FROM read_x(...)` shape. */
class TableFunctionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "src/test/resources/fixtures"

  private def sqlRows(q: String) = {
    GraftTableFunctions.registerAll(spark)
    spark.sql(q).collect()
  }

  test("read_fasta TVF with WHERE pushback") {
    val rows = sqlRows(s"SELECT id, sequence FROM read_fasta('$F/fasta/test.fasta') WHERE id = 'a' OR id = 'r2'")
    assert(rows.map(_.toSeq).toSeq == Seq(Seq("r2", "TTTTACGT")))
  }

  test("read_fasta TVF with compression named argument") {
    assert(sqlRows(s"SELECT count(*) AS n FROM read_fasta('$F/fasta/test_forced.fasta.gzip', compression => 'gzip')")
      .head.getLong(0) == 2)
  }

  test("count over every scan TVF") {
    val cases = Seq(
      s"read_fastq('$F/fastq/test.fastq')" -> 2,
      s"read_gff('$F/gff/test.gff')" -> 2,
      s"read_gtf('$F/gtf/test.gtf')" -> 2,
      s"read_bed_file('$F/bed/test3.bed')" -> 3,
      s"read_sam_file_records('$F/sam/example.sam')" -> 3,
      s"read_bam_file_records('$F/bam/test.bam')" -> 3,
      s"read_vcf_file_records('$F/vcf/test.vcf.gz')" -> 5,
      s"read_genbank('$F/genbank/test.gb')" -> 2,
      s"read_mzml('$F/mzml/test.mzML')" -> 2,
      s"read_hmm_dom_tbl_out('$F/hmm/test.domtblout')" -> 2,
      s"read_warc('$F/warc/test.warc')" -> 2,
      s"read_chain_file('$F/chain/test.chain')" -> 5,
      s"read_wig('$F/wig/test.wig')" -> 8,
      s"read_paf('$F/paf/test.paf')" -> 3,
      s"read_gfa('$F/gfa/test.gfa')" -> 7,
      s"read_stockholm('$F/stockholm/test.sto')" -> 4,
      s"read_maf('$F/maf/test.maf')" -> 4,
      s"read_embl('$F/embl/test.embl')" -> 2)
    cases.foreach { case (tvf, n) =>
      assert(sqlRows(s"SELECT count(*) AS n FROM $tvf").head.getLong(0) == n.toLong, tvf)
    }
  }

  test("region query TVFs") {
    assert(sqlRows(s"SELECT count(*) AS n FROM vcf_query('$F/vcf/test.vcf.gz', '1')").head.getLong(0) == 3)
    assert(sqlRows(s"SELECT count(*) AS n FROM bam_query('$F/bam/test.bam', 'ref1')").head.getLong(0) == 2)
  }

  test("fasta_query TVF fetches subsequences through the .fai") {
    // copy the fixture so the sidecar lands in a temp dir, not the repo
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-fai")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$F/fasta/test.fasta"), dir.resolve("test.fasta"))
    val rows = sqlRows(
      s"SELECT name, sequence FROM fasta_query('${dir.resolve("test.fasta")}', 'r1:3-8', 'r2')")
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(("r1", "CGATCG"), ("r2", "TTTTACGT")))
  }

  test("read_twobit / twobit_query TVFs over a staged .2bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-2bit")
    val path = dir.resolve("g.2bit").toString
    graft.sources.TwoBit.write(Seq(("c1", "ACGTNNacgt"), ("c2", "TTTTGGGG")),
      path, spark.sessionState.newHadoopConf())
    assert(sqlRows(s"SELECT count(*) AS n FROM read_twobit('$path')").head.getLong(0) == 2)
    val rows = sqlRows(
      s"SELECT name, sequence FROM twobit_query('$path', 'c1:3-8', 'c2')")
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq(("c1", "GTNNac"), ("c2", "TTTTGGGG")))
  }

  test("read_auto dispatches by extension, excluding BED/GTF") {
    assert(sqlRows(s"SELECT count(*) AS n FROM read_auto('$F/fasta/test.fasta.gz')").head.getLong(0) == 2)
    assertThrows[Exception](sqlRows(s"SELECT count(*) FROM read_auto('$F/bed/test3.bed')"))
  }
}
