package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftIO

/** VCF / GenBank / mzML / BAM golden scans over synthetic fixtures. */
class BinaryFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val F = "src/test/resources/fixtures"

  test("vcf: header-driven info struct, typed fields, flag semantics") {
    for (p <- Seq("test.vcf", "test.vcf.gz")) {
      val df = GraftIO.read_vcf_file_records(spark, s"$F/vcf/$p")
      assert(df.schema("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("indel", "dp", "af"))
      val got = df.selectExpr("chrom", "pos", "id", "ref", "alt", "qual", "filter",
        "info.indel", "info.dp", "info.af").orderBy("chrom", "pos").collect()
      assert(got.length == 5)
      assert(got(0).toSeq == Seq("1", 101L, null, "G", Seq("<*>"), 0.0f, null, null, 1, null))
      assert(got(1).toSeq == Seq("1", 205L, "rs77", "A", Seq("C", "T"), 29.5f, "PASS", null, 14, Seq(0.5f, 0.25f)))
      assert(got(2).toSeq == Seq("1", 990L, null, "T", Seq("TA"), 12.0f, null, true, 7, null))
    }
  }

  test("vcf with samples: format + raw genotype columns from #CHROM header") {
    val df = GraftIO.read_vcf_file_records(spark, s"$F/vcf/samples.vcf")
    assert(df.columns.takeRight(3).toSeq == Seq("format", "genotypes", "genotypes_typed"))
    val got = df.selectExpr("pos", "format", "genotypes[0]", "genotypes[1]").orderBy("pos").collect()
    assert(got(0).toSeq == Seq(100L, "GT:GQ", "0/1:99", "1/1:42"))
    assert(got(1).toSeq == Seq(200L, "GT:GQ", "0/0:10", "0/1:77"))
    // sample-less files keep the 8-column schema
    assert(!GraftIO.read_vcf_file_records(spark, s"$F/vcf/test.vcf").columns.contains("genotypes"))
  }

  test("typed genotypes: ##FORMAT-driven structs, identical across VCF and BCF") {
    for (p <- Seq("samples.vcf", "samples.bcf")) {
      val df =
        if (p.endsWith(".bcf")) GraftIO.read_bcf_file_records(spark, s"$F/vcf/$p")
        else GraftIO.read_vcf_file_records(spark, s"$F/vcf/$p")
      val et = df.schema("genotypes_typed").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(et.fieldNames.toSeq == Seq("gt", "gq"), p)
      assert(et("gq").dataType == org.apache.spark.sql.types.IntegerType, p)
      val got = df.selectExpr("pos", "genotypes_typed[0].gt", "genotypes_typed[0].gq",
        "genotypes_typed[1].gt", "genotypes_typed[1].gq").orderBy("pos").collect()
      assert(got(0).toSeq == Seq(100L, "0/1", 99, "1/1", 42), p)
      assert(got(1).toSeq == Seq(200L, "0/0", 10, "0/1", 77), p)
    }
  }

  test("runtime parse pruning: narrow projections skip decode work but keep values exact") {
    // these exercise the split.needs() skip paths (info / genotype /
    // seq+qual decode elision) — values must be identical to full reads
    assert(GraftIO.read_vcf_file_records(spark, s"$F/vcf/samples.vcf")
      .select("pos").orderBy("pos").collect().map(_.getLong(0)).toSeq == Seq(100L, 200L))
    assert(GraftIO.read_bcf_file_records(spark, s"$F/vcf/samples.bcf")
      .select("pos").orderBy("pos").collect().map(_.getLong(0)).toSeq == Seq(100L, 200L))
    val bam = GraftIO.read_bam_file_records(spark, s"$F/bam/test.bam")
      .selectExpr("name", "flag").orderBy("name").collect()
    assert(bam.length == 3 && bam.forall(r => r.getString(0).nonEmpty))
    // projecting ONLY the expensive columns still decodes them
    val gq = GraftIO.read_bcf_file_records(spark, s"$F/vcf/samples.bcf")
      .selectExpr("genotypes_typed[1].gq AS gq").orderBy("gq").collect().map(_.getInt(0))
    assert(gq.toSeq == Seq(42, 77))
    val sq = GraftIO.read_bam_file_records(spark, s"$F/bam/test.bam")
      .selectExpr("sequence").where("sequence IS NOT NULL").count()
    assert(sq > 0)
  }

  test("nested-field-only projection reads the right struct ordinal") {
    // regression: nested schema pruning narrowed `info` to one field but
    // the parser emitted the full struct, shifting ordinals
    val got = GraftIO.read_vcf_file_records(spark, s"$F/vcf/test.vcf")
      .selectExpr("info.dp").where("pos = 205").collect()
    assert(got(0).getInt(0) == 14)
  }

  test("vcf_query region semantics") {
    assert(GraftIO.vcf_query(spark, s"$F/vcf/test.vcf.gz", "1").count() == 3)
    assert(GraftIO.vcf_query(spark, s"$F/vcf/test.vcf.gz", "2").count() == 2)
    assert(GraftIO.vcf_query(spark, s"$F/vcf/test.vcf", "1:200-999").count() == 2)
  }

  test("genbank: stateful record parse, features, lowercase sequence") {
    val df = GraftIO.read_genbank(spark, s"$F/genbank/test.gb").orderBy("accession")
    val got = df.selectExpr("name", "accession", "topology", "definition", "sequence",
      "size(features)", "features[0].kind", "features[0].location",
      "features[0].qualifiers['organism']").collect()
    assert(got.length == 2)
    assert(got(0).toSeq == Seq("GRAFT001", "GRAFT001", "circular",
      "synthetic test record one for the graft parser.",
      "gttaacgtacgtacgtacgtacgt", 2, "source", "1..24", "synthetic construct"))
    assert(got(1).getAs[String]("topology") == "linear")
    assert(got(1).getAs[String]("sequence") == "acgtacgtacgt")
  }

  test("mzml: spectrum + chromatogram with base64 64-bit arrays") {
    val df = GraftIO.read_mzml(spark, s"$F/mzml/test.mzML").orderBy("id")
    val got = df.selectExpr("id", "mz.mz", "intensity.intensity", "wavelength.wavelength").collect()
    assert(got.length == 2)
    assert(got(0).toSeq == Seq("chromatogram=0", null, null, Seq(0.0, 7.0, 14.0)))
    assert(got(1).toSeq == Seq("declaration=0 collection=0 scan=0",
      Seq(100.0, 200.0, 300.5), Seq(15.0, 10.0, 1.0), null))
  }

  test("bam: BGZF multi-member + binary record decode matches SAM semantics") {
    val got = GraftIO.read_bam_file_records(spark, s"$F/bam/test.bam")
      .orderBy("name").collect().map(_.toSeq)
    assert(got(0) == Seq("b001", 99, "ref1", 1L, 10L, "0", "10M", "ref1", "CGAGCTCGGT", "!!!!!!!!!!"))
    assert(got(1) == Seq("b002", 147, "ref1", 25L, 32L, "30", "5M2I3M", "ref1", "ACGTACGTAC", "IIIIIIIIII"))
    assert(got(2) == Seq("b003", 83, "chr1", 12203704L, 12217173L, "60", "55M13394N21M", "chr1",
      "A" * 76, "I" * 76))
  }

  test("bam_query region overlap (N-skip spans count toward end)") {
    assert(GraftIO.bam_query(spark, s"$F/bam/test.bam", "chr1").count() == 1)
    assert(GraftIO.bam_query(spark, s"$F/bam/test.bam", "ref1").count() == 2)
    // overlap via CIGAR span: read starts 12203704, ends 12217173
    assert(GraftIO.bam_query(spark, s"$F/bam/test.bam", "chr1:12210000-12210010").count() == 1)
    assert(GraftIO.bam_query(spark, s"$F/bam/test.bam", "chr1:1-100").count() == 0)
  }

  test("bcf: typed-encoding decode matches the VCF golden rows") {
    val df = GraftIO.read_bcf_file_records(spark, s"$F/vcf/test.bcf")
    assert(df.schema("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("indel", "dp", "af"))
    val got = df.selectExpr("chrom", "pos", "id", "ref", "alt", "qual", "filter",
      "info.indel", "info.dp", "info.af").orderBy("chrom", "pos").collect()
    assert(got.length == 5)
    assert(got(0).toSeq == Seq("1", 101L, null, "G", Seq("<*>"), 0.0f, null, null, 1, null))
    assert(got(1).toSeq == Seq("1", 205L, "rs77", "A", Seq("C", "T"), 29.5f, "PASS", null, 14, Seq(0.5f, 0.25f)))
    assert(got(2).toSeq == Seq("1", 990L, null, "T", Seq("TA"), 12.0f, null, true, 7, null))
    assert(got(3).toSeq == Seq("2", 55L, null, "C", Seq("G"), 8.0f, "q10", null, 3, null))
  }

  test("bcf_query region semantics") {
    assert(GraftIO.bcf_query(spark, s"$F/vcf/test.bcf", "1").count() == 3)
    assert(GraftIO.bcf_query(spark, s"$F/vcf/test.bcf", "1:200-999").count() == 2)
  }

  test("bare-path dispatch covers the new formats") {
    assert(GraftIO.read_auto(spark, s"$F/vcf/test.vcf.gz").count() == 5)
    assert(GraftIO.read_auto(spark, s"$F/genbank/test.gb").count() == 2)
    assert(GraftIO.read_auto(spark, s"$F/bam/test.bam").count() == 3)
    assert(GraftIO.read_auto(spark, s"$F/mzml/test.mzML").count() == 2)
  }
}
