package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** Golden scans over this repo's synthetic fixtures (shapes mirror the
  * reference's corpus as recorded in FIXTURES.md). */
class FormatScanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "src/test/resources/fixtures"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("fasta scan: plain, gz auto, zst auto, forced .gzip, multi-line sequence") {
    val want = Seq(
      Seq("r1", "first record", "ATCGATCGGGCC"),
      Seq("r2", null, "TTTTACGT"))
    for (p <- Seq("test.fasta", "test.fasta.gz", "test.fasta.zst", "test_forced.fasta.gzip")) {
      val df = GraftIO.read_fasta(spark, s"$F/fasta/$p").orderBy("id")
      assert(rows(df) == want, p)
    }
  }

  test("fasta directory scan (gzipped members)") {
    val df = GraftIO.read_fasta(spark, s"$F/fasta_dir")
    assert(df.count() == 4)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq ==
      Seq("d1", "d2", "d3", "d4"))
  }

  test("multi-path load unions the files") {
    val df = spark.read.format("fasta")
      .load(s"$F/fasta_dir/a.fasta.gz", s"$F/fasta_dir/b.fasta.gz")
    assert(df.count() == 4)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq ==
      Seq("d1", "d2", "d3", "d4"))
  }

  test("fasta filter pushdown still returns exact rows") {
    val df = GraftIO.read_fasta(spark, s"$F/fasta/test.fasta").where("id = 'r2'")
    assert(rows(df) == Seq(Seq("r2", null, "TTTTACGT")))
  }

  test("bare-path auto dispatch (replacement-scan analog)") {
    assert(GraftIO.read_auto(spark, s"$F/fasta/test.fasta.gz").count() == 2)
    assert(GraftIO.read_auto(spark, s"$F/fastq/test.fastq").count() == 2)
    // BED and GTF are deliberately NOT auto-dispatched (reference parity).
    assertThrows[Exception](GraftIO.read_auto(spark, s"$F/bed/test3.bed").count())
  }

  test("fastq scan") {
    val want = Seq(
      Seq("q1", "read one", "GATTACAGATTACA", "IIIIIIIIIIIIII"),
      Seq("q2", null, "ACGTACGTACGTAC", "!!##%%%%++55??"))
    for (p <- Seq("test.fastq", "test.fastq.gz")) {
      assert(rows(GraftIO.read_fastq(spark, s"$F/fastq/$p").orderBy("name")) == want, p)
    }
  }

  test("gff scan incl. attributes map") {
    val df = GraftIO.read_gff(spark, s"$F/gff/test.gff").orderBy("seqname")
    val got = df.selectExpr("seqname", "source", "type", "start", "end", "score",
      "strand", "phase", "attributes['gene_id'][0]", "attributes['gene_name']").collect()
    assert(got(0).toSeq == Seq("sq0", "graft", "gene", 8L, 13L, null, "+", null, "g1", Seq("alpha")))
    assert(got(1).toSeq == Seq("sq1", "graft", "gene", 8L, 14L, 0.1f, "+", "0", "g2", Seq("alpha", "beta")))
  }

  test("gff attribute values are percent-decoded (GFF3 escapes)") {
    val d = java.nio.file.Files.createTempDirectory("graft-pct")
    val p = d.resolve("pct.gff")
    java.nio.file.Files.writeString(p,
      "sq0\tg\tgene\t1\t5\t.\t+\t.\tnote=a%2Cb%3Bc;plain=x%ZZ\n")
    val got = GraftIO.read_gff(spark, p.toString)
      .selectExpr("attributes['note'][0]", "attributes['plain'][0]").collect()(0)
    assert(got.getString(0) == "a,b;c")   // %2C -> ',' ; %3B -> ';'
    assert(got.getString(1) == "x%ZZ")    // invalid escape passes through
  }

  test("gtf scan: frame column + quoted attributes") {
    val df = GraftIO.read_gtf(spark, s"$F/gtf/test.gtf")
    assert(df.columns.toSeq.contains("frame"))
    val got = df.selectExpr("seqname", "type", "start", "end", "frame",
      "attributes['gene_id'][0]", "attributes['transcript_id'][0]").orderBy("start").collect()
    assert(got(0).toSeq == Seq("chr1", "exon", 11869L, 12227L, null, "G0001", "T0001"))
    assert(got(1).toSeq == Seq("chr1", "exon", 12613L, 12721L, null, "G0001", "T0002"))
  }

  test("bed scan: 1-based shift, dot/zero -> NULL, BED3 padding") {
    val b12 = rows(GraftIO.read_bed_file(spark, s"$F/bed/test12.bed"))
    assert(b12 == Seq(Seq("sq0", 8L, 13L, null, null, null, 8L, 13L, null, 2L, "2,1", "0,3")))
    val b3 = GraftIO.read_bed_file(spark, s"$F/bed/test3.bed").orderBy("reference_sequence_name")
    assert(rows(b3.select("reference_sequence_name", "start", "end")) ==
      Seq(Seq("chr1", 101L, 200L), Seq("chr2", 151L, 250L), Seq("chr3", 1L, 50L)))
  }

  test("sam scan: end from CIGAR span, '=' mate resolution, 255 mapq -> NULL") {
    val got = rows(GraftIO.read_sam_file_records(spark, s"$F/sam/example.sam").orderBy("name"))
    assert(got == Seq(
      Seq("r001", 99, "ref1", 1L, 10L, "0", "10M", "ref1", "CGAGCTCGGT", "!!!!!!!!!!"),
      Seq("r002", 147, "ref1", 25L, 32L, "30", "5M2I3M", "ref1", "ACGTACGTAC", "IIIIIIIIII"),
      Seq("r003", 4, null, null, null, null, null, null, "AAAA", null)))
  }

  test("hmm domtblout scan") {
    val df = GraftIO.read_hmm_dom_tbl_out(spark, s"$F/hmm/test.domtblout")
    assert(df.count() == 2)
    val r = df.orderBy("target_name").collect()(0)
    assert(r.getAs[String]("target_name") == "t1")
    assert(r.getAs[String]("target_accession") == "PF00001.1")
    assert(r.getAs[Long]("tlen") == 120L)
    assert(r.getAs[Double]("evalue") == 1.2e-10)
    assert(r.getAs[Double]("accuracy") == 0.91)
    assert(r.getAs[String]("description") == "first target")
  }

  test("fmt_mzml_split_scan gate entry matches its golden aggregate") {
    val df = SparkEntry.registry("fmt_mzml_split_scan").fn(spark, "unused")
    val r = df.head()
    assert(r.getLong(0) == 150L)   // 120 spectra + 30 chromatograms
    assert(r.getLong(1) == 360L)   // 3 m/z values per spectrum
    assert(r.getDouble(2) == 57780.0)
    assert(r.getDouble(3) == 29160.0)
    assert(r.getDouble(4) == 1080.0)
    assert(r.getBoolean(5), "expected >5 input partitions via maxSplitBytes")
  }

  test("column pruning reaches the scan") {
    val df = GraftIO.read_fasta(spark, s"$F/fasta/test.fasta").select("id")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("id"))
  }
}
